from dpr_scale_tpu.train.loss import (
    contrastive_loss,
    rank_metrics,
    similarity_scores,
)
from dpr_scale_tpu.train.schedule import linear_warmup_decay
from dpr_scale_tpu.train.task import DenseRetrieverTask, TrainState

__all__ = [
    "similarity_scores",
    "contrastive_loss",
    "rank_metrics",
    "linear_warmup_decay",
    "DenseRetrieverTask",
    "TrainState",
]
