from dpr_scale_tpu.index.mips import MipsIndex, merge_topk_batched
from dpr_scale_tpu.index.store import (
    build_int8_store,
    load_int8_store,
    store_is_current,
)

__all__ = [
    "MipsIndex",
    "merge_topk_batched",
    "build_int8_store",
    "load_int8_store",
    "store_is_current",
]
