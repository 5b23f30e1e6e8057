from dpr_scale_tpu.data.datasets import (
    CSVDataset,
    IDCSVDataset,
    IDMemoryMappedDataset,
    MemoryMappedDataset,
    MultiSourceDataset,
    QueryCSVDataset,
    QueryTRECDataset,
    QueryTSVDataset,
    TRECCandidateDataset,
)
from dpr_scale_tpu.data.tokenize import HFTokenizer
from dpr_scale_tpu.data.example import DPRExampleBuilder
from dpr_scale_tpu.data.batching import DPRBatcher, TextBatcher

__all__ = [
    "MemoryMappedDataset",
    "MultiSourceDataset",
    "CSVDataset",
    "QueryCSVDataset",
    "QueryTSVDataset",
    "IDMemoryMappedDataset",
    "IDCSVDataset",
    "QueryTRECDataset",
    "TRECCandidateDataset",
    "HFTokenizer",
    "DPRExampleBuilder",
    "DPRBatcher",
    "TextBatcher",
]
