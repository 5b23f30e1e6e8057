from dpr_scale_tpu.retrieve.writers import write_dpr_json, write_trec_run
from dpr_scale_tpu.retrieve.retrieval import retrieve

__all__ = ["write_dpr_json", "write_trec_run", "retrieve"]
