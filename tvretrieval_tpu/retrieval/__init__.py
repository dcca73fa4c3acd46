from tvretrieval_tpu.retrieval.engine import (
    RetrievalConfig,
    CorpusCache,
    encode_corpus,
    retrieve,
)

__all__ = ["RetrievalConfig", "CorpusCache", "encode_corpus", "retrieve"]
