from .corpus import generate_code_corpus, corpus_path
from .parquet_source import read_parquet_with_doc_ids, assign_doc_ids_by_sort
from .text_sources import (read_any_with_doc_ids, read_csv_with_doc_ids,
                           read_jsonl_with_doc_ids)

__all__ = [
    "generate_code_corpus",
    "corpus_path",
    "read_parquet_with_doc_ids",
    "assign_doc_ids_by_sort",
    "read_jsonl_with_doc_ids",
    "read_csv_with_doc_ids",
    "read_any_with_doc_ids",
]
