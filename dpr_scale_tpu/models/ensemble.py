"""Ensemble encoders: SPAR dense+lexical concatenation and DrBoost.

Parity targets:
  * ``SalientPhraseAwareDenseRetrieverTask`` (dpr_scale/task/spar_task.py:25-58)
    — two trained bi-encoders; query vectors concat with ``lexical_weight``
    applied to the SECOND (lexical) model's queries only; context vectors
    concat unweighted;
  * ``DrBoostTask`` (task/drboost_task.py:22-59) — inference-time concat of
    N weak encoders' embeddings.

These are parameter compositions, not linen modules: each component keeps
its own param tree and jitted apply; the concat happens on the embeddings.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class ConcatEncoders:
    """N (model, params) pairs -> concatenated embeddings.

    query_weights[i] scales component i's QUERY embeddings (SPAR semantics:
    base weight 1.0, lexical model weighted; DrBoost: all 1.0).
    """

    def __init__(
        self,
        components: Sequence[Tuple[object, dict]],
        query_weights: Optional[Sequence[float]] = None,
    ):
        assert components, "need at least one encoder"
        self.components = list(components)
        self.query_weights = (
            list(query_weights)
            if query_weights is not None
            else [1.0] * len(self.components)
        )
        assert len(self.query_weights) == len(self.components)

        def encode(which: str):
            def fn(params_list, input_ids, attention_mask):
                outs = []
                for (model, _p), params, w in zip(
                    self.components, params_list, self.query_weights
                ):
                    method = getattr(model, which)
                    emb = model.apply(
                        {"params": params}, input_ids, attention_mask, method=method
                    )
                    if which == "encode_query" and w != 1.0:
                        emb = emb * w
                    outs.append(emb)
                return jnp.concatenate(outs, axis=-1)

            return jax.jit(fn)

        self._encode_q = encode("encode_query")
        self._encode_c = encode("encode_context")
        self._params_list = [p for _m, p in self.components]

    def encode_queries(self, input_ids, attention_mask=None):
        return self._encode_q(self._params_list, input_ids, attention_mask)

    def encode_contexts(self, input_ids, attention_mask=None):
        return self._encode_c(self._params_list, input_ids, attention_mask)
