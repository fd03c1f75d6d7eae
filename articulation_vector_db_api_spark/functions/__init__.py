from .chunking import CHUNK_SIZE, OVERLAP, STRIDE, chunk_documents
from .embedding import EMBEDDING_DIM, hash_embedding, hash_embedding_py
from .vector import cosine, dot, l2_norm

__all__ = [
    "CHUNK_SIZE",
    "OVERLAP",
    "STRIDE",
    "chunk_documents",
    "EMBEDDING_DIM",
    "hash_embedding",
    "hash_embedding_py",
    "cosine",
    "dot",
    "l2_norm",
]
