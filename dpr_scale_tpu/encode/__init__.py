from dpr_scale_tpu.encode.embeddings import (
    CorpusEncoder,
    load_embedding_shard,
    load_embedding_shards,
    save_embedding_shard,
)

__all__ = [
    "CorpusEncoder",
    "save_embedding_shard",
    "load_embedding_shard",
    "load_embedding_shards",
]
