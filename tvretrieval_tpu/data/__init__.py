from tvretrieval_tpu.data.features import (
    FeatureSource,
    MemoryFeatureSource,
    H5FeatureSource,
)
from tvretrieval_tpu.data.datasets import (
    CorpusIndex,
    ExampleBuilder,
    StartEndBatch,
    train_st_ed_label,
    eval_st_ed_label,
    tef_features,
)
from tvretrieval_tpu.data.pipeline import BatchIterator, DevicePrefetcher
from tvretrieval_tpu.data.synthetic import make_synthetic_world, SyntheticWorld

__all__ = [
    "FeatureSource",
    "MemoryFeatureSource",
    "H5FeatureSource",
    "CorpusIndex",
    "ExampleBuilder",
    "StartEndBatch",
    "train_st_ed_label",
    "eval_st_ed_label",
    "tef_features",
    "BatchIterator",
    "DevicePrefetcher",
    "make_synthetic_world",
    "SyntheticWorld",
]
