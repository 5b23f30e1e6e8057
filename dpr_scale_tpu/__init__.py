"""dpr_scale_tpu — a TPU-native dense-retrieval framework (JAX/Flax/pjit/Pallas).

A ground-up rebuild of the capabilities of facebookresearch/dpr-scale
(DPR bi-encoder training, corpus encoding, exact MIPS retrieval,
multi-vector retrievers, SPAR, distillation, rerankers, eval harnesses)
designed TPU-first:

  * compute path: Flax encoders under ``jax.jit`` over a ``jax.sharding.Mesh``;
    global in-batch negatives fall out of GSPMD sharding instead of manual
    NCCL all_gather + gradient-splicing tricks.
  * retrieval: sharded exact MIPS with a Pallas fused matmul + streaming
    top-k kernel instead of FAISS.
  * IO: memory-mapped datasets with a native C++ offset scanner; host-side
    tokenization feeding fixed-shape device batches.
"""

__version__ = "0.1.0"
