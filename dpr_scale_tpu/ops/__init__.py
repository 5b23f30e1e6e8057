from dpr_scale_tpu.ops.mips_kernels import count_above_kernel, tile_max_scores

__all__ = ["count_above_kernel", "tile_max_scores"]
