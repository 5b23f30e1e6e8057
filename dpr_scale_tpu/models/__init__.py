from dpr_scale_tpu.models.transformer import TransformerConfig, TransformerEncoder
from dpr_scale_tpu.models.encoder import DenseEncoder, BiEncoder

__all__ = [
    "TransformerConfig",
    "TransformerEncoder",
    "DenseEncoder",
    "BiEncoder",
]
