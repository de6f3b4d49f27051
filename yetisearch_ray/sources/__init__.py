from .corpus import generate_code_corpus, corpus_path
from .parquet_source import read_parquet_with_doc_ids, assign_doc_ids_by_sort

__all__ = [
    "generate_code_corpus",
    "corpus_path",
    "read_parquet_with_doc_ids",
    "assign_doc_ids_by_sort",
]
