from .dataset import (
    BaseDataset,
    VideoCentricDataset,
    VideoCentricCLIPDataset,
    VideoCentricCLIPTwoFeatDataset,
    make_dataset,
    DATASETS,
)
from .batching import (
    batchify_train,
    batchify_eval,
    bucket_pow2,
    pe_interp_arrays,
    reference_padded_len,
    bucket_length,
    bucket_queries,
    min_chunk_size,
    pad_axis,
)
from .loader import DataLoader
from .synthetic import make_synthetic_dataset, apply_synthetic_cfg
from .tokenizer import GloVeTokenizer, make_tokenizer, basic_english_tokenize

__all__ = [
    "BaseDataset",
    "VideoCentricDataset",
    "VideoCentricCLIPDataset",
    "VideoCentricCLIPTwoFeatDataset",
    "make_dataset",
    "DATASETS",
    "batchify_train",
    "batchify_eval",
    "bucket_pow2",
    "pe_interp_arrays",
    "reference_padded_len",
    "bucket_length",
    "bucket_queries",
    "min_chunk_size",
    "pad_axis",
    "DataLoader",
    "make_synthetic_dataset",
    "apply_synthetic_cfg",
    "GloVeTokenizer",
    "make_tokenizer",
    "basic_english_tokenize",
]
