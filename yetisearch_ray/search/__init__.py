from .bm25 import K1, B, idf, bm25_term_score
from .engine import SearchEngine, SearchActor, open_index

__all__ = ["K1", "B", "idf", "bm25_term_score", "SearchEngine", "SearchActor", "open_index"]
