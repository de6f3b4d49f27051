"""unicode61-equivalent tokenizer.

The authoritative tokenizer of the reference engine is SQLite FTS5's
``unicode61`` (configured at reference ``src/Storage/SqliteStorage.php:261``):
a token is a maximal run of Unicode alphanumeric codepoints, case-folded,
with diacritics removed (``remove_diacritics=1``).  Underscore is NOT a token
character (it is punctuation in Unicode), which matters a lot for source
code: ``parse_config`` tokenizes to ``["parse", "config"]``.

We reproduce that publicly-documented behavior with:

1. NFKD normalization + removal of combining marks (category ``Mn``) —
   the standard diacritic-stripping recipe,
2. ``str.casefold()``,
3. maximal runs of ``[^\\W_]`` (Unicode alphanumerics minus underscore).

An ASCII fast path (``bytes.lower`` + precompiled ASCII regex) covers the
overwhelming majority of source-code text.

Positions are token ordinals (0-based), matching FTS5 position semantics.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

# Unicode alphanumeric runs, underscore excluded (unicode61 semantics).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
_ASCII_TOKEN_RE = re.compile(r"[0-9a-z]+")
_COMBINING = None  # lazily built frozenset of combining codepoints is overkill; use unicodedata


def fold_text(text: str) -> str:
    """Lowercase + strip diacritics, unicode61-style.

    unicode61 applies SIMPLE case folding (``ß`` stays ``ß``, unlike
    ``str.casefold`` which expands it to ``ss``) — we use ``str.lower``
    accordingly.
    """
    if text.isascii():
        return text.lower()
    decomposed = unicodedata.normalize("NFKD", text)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.lower()


def tokenize(text: str) -> list[str]:
    """Tokenize one string into unicode61-style terms."""
    if text.isascii():
        return _ASCII_TOKEN_RE.findall(text.lower())
    return _TOKEN_RE.findall(fold_text(text))


def token_count(text: str) -> int:
    return len(tokenize(text))


def tokenize_batch(texts, doc_ids=None):
    """Tokenize a column of strings; returns flat numpy-friendly arrays.

    Parameters
    ----------
    texts : iterable of str (or None)
    doc_ids : optional array of per-row ids to repeat per token

    Returns
    -------
    (terms, row_index_or_doc_ids, positions, counts)
      terms:    list[str]   — every token, in order
      rows:     np.ndarray  — doc_ids (if given) else row ordinal, per token
      positions: np.ndarray uint32 — token ordinal within its row
      counts:   np.ndarray int64 — tokens per input row (the per-row length)
    """
    all_tokens: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            counts[i] = 0
            continue
        toks = (
            _ASCII_TOKEN_RE.findall(t.lower())
            if t.isascii()
            else _TOKEN_RE.findall(fold_text(t))
        )
        counts[i] = len(toks)
        all_tokens.extend(toks)
    if doc_ids is not None:
        rows = np.repeat(np.asarray(doc_ids), counts)
    else:
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    # positions: 0..count-1 within each row, computed vectorized
    total = int(counts.sum())
    positions = np.arange(total, dtype=np.uint32)
    if len(counts):
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        positions -= starts.astype(np.uint32)
    return all_tokens, rows, positions, counts
