from .chunker import chunk_documents, split_sentences

__all__ = ["chunk_documents", "split_sentences"]
