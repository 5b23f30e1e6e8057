from dpr_scale_tpu.eval.qa_eval import SimpleTokenizer, evaluate_retrieval, has_answers
from dpr_scale_tpu.eval.msmarco import compute_metrics_from_files, trec_metrics

__all__ = [
    "SimpleTokenizer",
    "has_answers",
    "evaluate_retrieval",
    "compute_metrics_from_files",
    "trec_metrics",
]
