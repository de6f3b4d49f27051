from .stemmer import stem
from .similarity import (
    levenshtein,
    levenshtein_within,
    jaro_winkler,
    trigram_similarity,
    keyboard_proximity,
    phonetic_similarity,
)

__all__ = [
    "stem",
    "levenshtein",
    "levenshtein_within",
    "jaro_winkler",
    "trigram_similarity",
    "keyboard_proximity",
    "phonetic_similarity",
]
