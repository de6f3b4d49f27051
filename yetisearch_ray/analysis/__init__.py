from .tokenizer import fold_text, tokenize, tokenize_batch, token_count
from .analyzer import StandardAnalyzer
from .stopwords import STOPWORDS

__all__ = [
    "fold_text",
    "tokenize",
    "tokenize_batch",
    "token_count",
    "StandardAnalyzer",
    "STOPWORDS",
]
