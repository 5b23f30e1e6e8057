"""Device->host transfer warmup for tunneled TPU attachments.

Measured behavior of the axon TPU tunnel in this environment (r4 probes):

* **cold** device->host fetches cost ~3 s EACH regardless of size (a 4 KB
  fetch and a 2 MB fetch both take seconds), i.e. ~0.1-0.45 MB/s — and
  parallelism does NOT help while cold (32 parallel 1 MB fetches complete
  serially, ~90-200 s total);
* after ~30-60 fetches (~1.5-3 min of sustained demand) the downlink flips
  to a fast path and stays there across >=2 min of idle: **35-60 MB/s even
  for single serial fetches**;
* host->device (upload) is always fast (~50-130 MB/s) and unaffected.

That 150x asymmetry decides feasibility of anything that pulls real data
off the chip: a bert-base TrainState checkpoint (~1.3 GB params+opt state)
is ~80 min cold but ~30 s warm. This module makes the warm state a
deliberate, cheap step instead of an accident of traffic patterns.

The reference has no analog (local CUDA devices don't have this failure
mode); this is TPU-deployment plumbing in the same spirit as its SLURM
requeue config (reference dpr_scale/conf/trainer/slurm.yaml).
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

_WARMED = False
_LOCK = threading.Lock()


def _is_tunneled_tpu() -> bool:
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # the slow-start downlink is a property of the axon tunnel; real
    # PCIe/pod-attached TPUs and CPU meshes don't need (or want) warmup
    return platform in ("axon", "tpu") and len(jax.devices()) >= 1


def warm_device_to_host(
    budget_s: float = 240.0,
    chunk_mb: int = 1,
    n_chunks: int = 48,
    target_mb_s: float = 10.0,
    verbose: bool = False,
) -> Optional[float]:
    """Drive parallel dummy fetches until the downlink probe exceeds
    ``target_mb_s`` (or the budget runs out). Returns the final probe
    rate in MB/s, or None if skipped (non-tunneled platform / already
    warm this process).

    Idempotent per process; thread-safe.
    """
    global _WARMED
    with _LOCK:
        if _WARMED:
            return None
        if not _is_tunneled_tpu():
            _WARMED = True
            return None
        import jax
        import jax.numpy as jnp

        make = jax.jit(
            lambda k: jax.random.normal(k, (chunk_mb * 256 * 1024,)),
            static_argnums=(),
        )
        chunks = [make(jax.random.PRNGKey(i)) for i in range(n_chunks)]
        for c in chunks:
            jax.block_until_ready(c)
        probe = make(jax.random.PRNGKey(10_000))
        jax.block_until_ready(probe)

        t0 = time.time()
        rate = 0.0
        with ThreadPoolExecutor(max_workers=32) as ex:
            while time.time() - t0 < budget_s:
                list(ex.map(jax.device_get, chunks))
                tp = time.time()
                jax.device_get(probe)
                rate = chunk_mb / max(time.time() - tp, 1e-9)
                if verbose:
                    print(
                        f"[transfer-warmup] t={time.time()-t0:5.1f}s "
                        f"probe {rate:6.1f} MB/s",
                        flush=True,
                    )
                if rate >= target_mb_s:
                    break
        _WARMED = True
        return rate


def warm_device_to_host_async(**kwargs) -> threading.Thread:
    """Fire-and-forget warmup thread: call at trainer/bench start so the
    slow-start window overlaps with compilation and the first training
    steps (which only dispatch uphill) instead of gating the first
    checkpoint save or result fetch."""
    t = threading.Thread(
        target=warm_device_to_host, kwargs=kwargs, daemon=True, name="xfer-warmup"
    )
    t.start()
    return t
