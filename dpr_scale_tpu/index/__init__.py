from dpr_scale_tpu.index.mips import MipsIndex, merge_topk_batched

__all__ = ["MipsIndex", "merge_topk_batched"]
