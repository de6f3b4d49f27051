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


_FOLD_TABLE: dict[int, str] = {}


def _fold_char(c: str) -> str:
    decomposed = unicodedata.normalize("NFKD", c)
    return "".join(ch for ch in decomposed if not unicodedata.combining(ch)).lower()


def fold_text(text: str) -> str:
    """Lowercase + strip diacritics, unicode61-style.

    unicode61 applies SIMPLE case folding (``ß`` stays ``ß``, unlike
    ``str.casefold`` which expands it to ``ss``) — we use ``str.lower``
    accordingly.  Non-ASCII chars fold through a lazily-built per-char
    NFKD table so the whole string never pays an NFKD pass
    (``str.translate`` is C-speed; per-char NFKD ≡ whole-string NFKD for
    the mark-stripping transform).
    """
    if text.isascii():
        return text.lower()
    # lower FIRST so the fold table (keyed on lowercase chars) always
    # applies, then fold to a fixpoint — the result is independent of how
    # warm the table is (identity entries keep ß-likes / CJK)
    out = text.lower()
    for _ in range(4):
        if out.isascii():
            return out
        for c in set(out):
            o = ord(c)
            if o > 127 and o not in _FOLD_TABLE:
                _FOLD_TABLE[o] = _fold_char(c)
        new = out.translate(_FOLD_TABLE)
        if new == out:
            break
        out = new
    return out


def tokenize(text: str) -> list[str]:
    """Tokenize one string into unicode61-style terms."""
    if text.isascii():
        return _ASCII_TOKEN_RE.findall(text.lower())
    return _TOKEN_RE.findall(fold_text(text))


def token_count(text: str) -> int:
    return len(tokenize(text))


def tokenize_batch_dict(arr, doc_ids=None):
    """Dictionary-coded Arrow tokenization — the ingest hot path.

    Never materializes per-token Python strings: ASCII rows go through
    ``utf8_lower`` → ``split_pattern_regex`` → ``dictionary_encode`` (all
    C); only the UNIQUE terms surface as Python strings.  Rows containing
    non-ASCII take the exact Python unicode61 path and are spliced in via
    a dictionary union.

    Returns (codes int64, uniq_terms object-ndarray, rows, positions
    uint32, counts int64) where ``codes`` indexes ``uniq_terms``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    arr = pc.fill_null(arr, "")
    orig = arr
    n = len(arr)
    ascii_np = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    bad_rows = np.flatnonzero(~ascii_np)
    if bad_rows.size:
        # fold non-ascii rows (C-speed translate) and run them through the
        # SAME Arrow pipeline; rows still non-ascii after folding (rare:
        # ß-likes, CJK) take the exact Python path below
        folded = [fold_text(s) for s in orig.take(pa.array(bad_rows)).to_pylist()]
        scatter = [None] * n
        still_bad = []
        for j, i in enumerate(bad_rows):
            if folded[j].isascii():
                scatter[i] = folded[j]
            else:
                still_bad.append(i)
        arr = pc.if_else(pc.is_null(pa.array(scatter, pa.string())),
                         pc.if_else(pa.array(ascii_np), arr, ""),
                         pa.array(scatter, pa.string()))
        bad_rows = np.asarray(still_bad, dtype=np.int64)
        ascii_np = np.ones(n, dtype=bool)
        ascii_np[bad_rows] = False
    low = pc.utf8_lower(arr)
    split = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
    flat = split.flatten()
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    ne = nonempty.astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(ne)))
    counts = cs[offsets[1:]] - cs[offsets[:-1]]
    flat_ok = flat.filter(pa.array(nonempty))
    d = flat_ok.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    if bad_rows.size:
        bad_texts = orig.take(pa.array(bad_rows)).to_pylist()
        index_map = {t: i for i, t in enumerate(uniq)}
        new_terms: list[str] = []
        bad_code_rows: list[list[int]] = []
        for s in bad_texts:
            toks = _TOKEN_RE.findall(fold_text(s or ""))
            rc = []
            for tk in toks:
                ci = index_map.get(tk)
                if ci is None:
                    ci = len(uniq) + len(new_terms)
                    index_map[tk] = ci
                    new_terms.append(tk)
                rc.append(ci)
            bad_code_rows.append(rc)
        if new_terms:
            uniq = np.concatenate([uniq, np.asarray(new_terms, dtype=object)])
        counts_fast = counts
        final_counts = counts_fast.copy()
        final_counts[bad_rows] = [len(rc) for rc in bad_code_rows]
        total = int(final_counts.sum())
        out = np.empty(total, dtype=np.int64)
        dst0 = np.cumsum(final_counts) - final_counts
        src0 = np.cumsum(counts_fast) - counts_fast
        g_rows = np.flatnonzero(ascii_np & (counts_fast > 0))
        if g_rows.size:
            g_len = counts_fast[g_rows]
            tg = int(g_len.sum())
            within = np.arange(tg, dtype=np.int64)
            within -= np.repeat(np.cumsum(g_len) - g_len, g_len)
            out[np.repeat(dst0[g_rows], g_len) + within] = codes[
                np.repeat(src0[g_rows], g_len) + within]
        for i, rc in zip(bad_rows, bad_code_rows):
            out[dst0[i] : dst0[i] + len(rc)] = rc
        codes, counts = out, final_counts
    row_ids = np.repeat(
        np.asarray(doc_ids) if doc_ids is not None else np.arange(n, dtype=np.int64),
        counts,
    )
    total = int(counts.sum())
    positions = np.arange(total, dtype=np.uint32)
    if n:
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        positions -= starts.astype(np.uint32)
    return codes, uniq, row_ids, positions, counts


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
