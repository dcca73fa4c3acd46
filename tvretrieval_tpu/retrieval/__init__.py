from tvretrieval_tpu.retrieval.engine import (
    RetrievalConfig,
    CorpusCache,
    arrays_to_submission,
    encode_corpus,
    retrieve,
)
from tvretrieval_tpu.retrieval.streaming import (
    HostCorpusCache,
    host_cache_from_device,
    streaming_score_query_batch,
)

__all__ = [
    "RetrievalConfig", "CorpusCache", "arrays_to_submission",
    "encode_corpus", "retrieve",
    "HostCorpusCache", "host_cache_from_device", "streaming_score_query_batch",
]
