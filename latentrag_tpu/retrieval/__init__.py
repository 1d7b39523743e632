from .base import BaseRetriever, DenseSearchAPI
from .bm25 import BM25Retriever, tokenize
from .dense import DenseRetriever, make_fingerprint
from .dpr import DPRRetriever
from .embedder import EmbeddingCompressor
from .factory import build_retriever, load_retriever
from .filtering import compile_filter_mask

__all__ = [
    "compile_filter_mask",
    "BaseRetriever",
    "DenseSearchAPI",
    "BM25Retriever",
    "tokenize",
    "DenseRetriever",
    "make_fingerprint",
    "DPRRetriever",
    "EmbeddingCompressor",
    "build_retriever",
    "load_retriever",
]
