"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All are single-pass ``map_batches`` transforms (no shuffle); the
heuristics are deliberately simple + fully deterministic so each has an
exact DuckDB SQL oracle.  Language-ID uses per-language stopword hit
counts (the classic cheap heuristic); quality scoring mirrors the usual
pretraining filters (length, stopword ratio, mean word length).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analysis.stopwords import STOPWORDS

# fixed, ordered subsets so the SQL oracle can embed identical lists
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "for", "with", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
    "es": ("el", "la", "los", "las", "de", "y", "que", "en", "un", "una"),
}
_LANG_ORDER = ("en", "fr", "de", "es")

_EN_STOP = STOPWORDS["en"]


# GPT-2-style pretokenizer shape, restricted to ASCII classes so the
# Python `re` count and the DuckDB RE2 oracle count are identical:
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs.  The whitespace class is spelled out as RE2's \s
# (= [\t\n\f\r ]) because Python re's \s ALSO matches \x0b and unicode
# whitespace — with a bare \s the two engines disagree on any text
# containing a vertical tab (caught by the Hypothesis property suite).
BPE_ISH_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                   r"| ?[^\t\n\f\r A-Za-z0-9]+")


def token_counts(ds, *, text_col="text", id_col="doc_id"):
    """(id, n_tokens, n_subwords) — whitespace word count plus a BPE-ish
    pretokenizer count (the cheap budget proxy an LLM-data pipeline
    tracks before real tokenization)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        # Token = run of non-whitespace, RE2 semantics (\s is ASCII
        # [\t\n\f\r ]) — identical to the DuckDB oracle's
        # string_split_regex(text,'\s+') + non-empty filter.  Both
        # engines are RE2, so NBSP/U+2028 corpora agree too.
        n_tok = pc.count_substring_regex(arr, pattern=r"\S+")
        # Non-overlapping matches of the BPE-ish alternation, again
        # RE2-on-RE2 with the oracle's regexp_extract_all.
        sub = pc.count_substring_regex(arr, pattern=BPE_ISH_PATTERN)
        return pa.table({id_col: t[id_col],
                         "n_tokens": pc.cast(n_tok, pa.int64()),
                         "n_subwords": pc.cast(sub, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _split_tokens(col: pa.ChunkedArray):
    """Whitespace-tokenize a string column with Arrow kernels; returns
    (flat token StringArray, int64 doc offsets into it).  Matches Python
    ``str.split()``: any Unicode whitespace, empties elided.

    utf8_split_whitespace keeps empty strings for leading/trailing
    whitespace (and yields [''] for an empty input), so the flat array
    is re-filtered to non-empty tokens and the offsets rebuilt from the
    per-doc surviving counts — otherwise n_tokens/ratios are wrong for
    any text with a trailing newline."""
    import pyarrow.compute as pc

    arr = pc.fill_null(col, "").combine_chunks()
    splits = pc.utf8_split_whitespace(arr)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    values = splits.flatten()
    offs = np.asarray(splits.offsets, dtype=np.int64)
    offs = offs - offs[0]
    nonempty = np.asarray(pc.not_equal(values, "")).astype(np.int64)
    keep_counts = _seg_sum(nonempty, offs)
    values = values.filter(pa.array(nonempty.astype(bool)))
    new_offs = np.concatenate([[0], np.cumsum(keep_counts, dtype=np.int64)])
    return arr, values, new_offs


def _seg_sum(flat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document sums of a flat per-token array (cumsum trick — safe
    for empty documents, unlike ``np.add.reduceat``)."""
    cs = np.concatenate([[0], np.cumsum(flat, dtype=np.int64)])
    return cs[offs[1:]] - cs[offs[:-1]]


def _ws_split_re2(col):
    """RE2-``\\s+`` (ASCII ``[\\t\\n\\f\\r ]+``) split of a string
    column via Arrow kernels — the dedup/oracle tokenization, fully
    vectorized.  Returns (flat non-empty token StringArray, int64 doc
    offsets into it); identical tokens to ``dedup._ws_tokens`` per doc
    (empties from leading/trailing whitespace elided, offsets rebuilt
    from surviving counts)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col, "")
    split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    offs = np.asarray(split.offsets, dtype=np.int64)
    offs = offs - offs[0]
    nonempty = np.asarray(pc.not_equal(flat, ""), dtype=np.int64)
    keep_counts = _seg_sum(nonempty, offs)
    values = flat.filter(pa.array(nonempty.astype(bool)))
    new_offs = np.concatenate([[0], np.cumsum(keep_counts, dtype=np.int64)])
    return values, new_offs


def _doc_term_tf(ids: np.ndarray, values: pa.Array, offs: np.ndarray):
    """Vectorized (doc_id, term, tf) explode over a flat token array:
    dictionary-encode the tokens once, pack (doc index, term code) into
    one int64 key, and a single ``np.unique(return_counts)`` yields the
    per-document term frequencies — no per-doc Python loop or pandas
    ``value_counts`` per document (round-4 verdict item #3).  Returns
    (doc_id int64 ndarray, term StringArray, tf int64 ndarray)."""
    if len(values) == 0:
        return (np.empty(0, np.int64),
                pa.array([], pa.string()),
                np.empty(0, np.int64))
    d = values.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vsize = len(d.dictionary)
    doc_idx = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                        np.diff(offs))
    key, tf = np.unique(doc_idx * vsize + codes, return_counts=True)
    out_ids = np.asarray(ids, dtype=np.int64)[key // vsize]
    terms = d.dictionary.take(pa.array(key % vsize, pa.int64()))
    return out_ids, terms, tf.astype(np.int64)


def _ws_bigram_grams(col):
    """Adjacent-bigram grams (``w1\\x1fw2``) over RE2-whitespace tokens
    via Arrow kernels: one regex split, shifted slices masked to
    same-document positions — no per-doc Python loop.  Returns
    (per-doc bigram counts int64 ndarray, gram StringArray)."""
    import pyarrow.compute as pc

    values, offs = _ws_split_re2(col)
    n_tok = np.diff(offs)
    n_bi = np.maximum(n_tok - 1, 0)
    if len(values) < 2 or int(n_bi.sum()) == 0:
        return n_bi, pa.array([], pa.string())
    doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
    same = pa.array(doc_idx[:-1] == doc_idx[1:])
    w1 = values.slice(0, len(values) - 1).filter(same)
    w2 = values.slice(1).filter(same)
    return n_bi, pc.cast(pc.binary_join_element_wise(w1, w2, "\x1f"),
                         pa.string())


def _md5_bucket_codes(grams: pa.Array, buckets: int) -> np.ndarray:
    """md5-low-64 bucket per gram, hashing each UNIQUE gram once
    (dictionary-encode, md5 the dictionary, gather by code) — the md5
    itself must stay per-string for DuckDB ``md5_number_lower``
    parity, so dedup-before-hash is the vectorization."""
    from .dedup import _md5_u64_tokens

    if len(grams) == 0:
        return np.empty(0, np.int64)
    d = grams.dictionary_encode()
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    hu = (_md5_u64_tokens(uniq) % buckets).astype(np.int64)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return hu[codes]


def _value_counts_table(col, key_name: str, count_name: str = "c"):
    """Arrow ``value_counts`` of a string column/array as a two-column
    table — the map-side combine partial of the wordcount shuffles,
    without a pandas round-trip."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vc = pc.value_counts(col)
    return pa.table({key_name: vc.field("values"),
                     count_name: pc.cast(vc.field("counts"), pa.int64())})


def quality_scores(ds, *, text_col="text", id_col="doc_id"):
    """Pretraining-style quality features + a composite score.

    n_tokens, n_chars, stopword_ratio (en), mean_token_len, and
    quality = round(min(1, n_tokens/100) * (1 - stopword_ratio) , 6).
    Tokenization, length and stopword membership are Arrow/numpy
    kernels; only the final 6-digit rounding is Python (``round`` is the
    oracle's exact semantics — DuckDB agrees with it value-for-value,
    and the driver hash compare needs bit-identical floats).
    """
    import pyarrow.compute as pc

    stop_set = pa.array(sorted(_EN_STOP), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        arr, values, offs = _split_tokens(t[text_col])
        n_tok = np.diff(offs)
        n_chr = np.asarray(pc.utf8_length(arr), dtype=np.int64)
        is_stop = np.asarray(pc.is_in(values, value_set=stop_set))
        sw = _seg_sum(is_stop.astype(np.int64), offs)
        tok_len = np.asarray(pc.utf8_length(values), dtype=np.int64)
        char_sum = _seg_sum(tok_len, offs)
        nz = np.maximum(n_tok, 1)
        sr = np.where(n_tok > 0, sw / nz, 0.0)
        ml = np.where(n_tok > 0, char_sum / nz, 0.0)
        q = np.minimum(1.0, n_tok / 100.0) * (1.0 - sr)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_chars": pa.array(n_chr, pa.int64()),
            "stopword_ratio": pa.array([round(x, 6) for x in sr.tolist()],
                                       pa.float64()),
            "mean_token_len": pa.array([round(x, 6) for x in ml.tolist()],
                                       pa.float64()),
            "quality": pa.array([round(x, 6) for x in q.tolist()],
                                pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def language_id(ds, *, text_col="text", id_col="doc_id"):
    """Predicted language by stopword-marker hits; ties broken by the
    fixed order en > fr > de > es; zero hits → 'und'.  One ``is_in``
    per language over the flat token array + segmented sums; argmax
    keeps the first (order-priority) maximum, matching the scalar
    strictly-greater loop."""
    import pyarrow.compute as pc

    marker_arrs = {lang: pa.array(list(ws), pa.string())
                   for lang, ws in LANG_MARKERS.items()}

    def fn(t: pa.Table) -> pa.Table:
        _, values, offs = _split_tokens(t[text_col])
        counts = np.stack([
            _seg_sum(np.asarray(
                pc.is_in(values, value_set=marker_arrs[lang])
            ).astype(np.int64), offs)
            for lang in _LANG_ORDER
        ])  # (4, ndocs)
        best = np.argmax(counts, axis=0)
        langs = np.array(_LANG_ORDER, dtype=object)
        preds = np.where(counts.max(axis=0) > 0, langs[best], "und")
        return pa.table({id_col: t[id_col],
                         "pred_lang": pa.array(preds.tolist(), pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds, *, text_col="text", id_col="doc_id"):
    """Gopher-style repetition signals (Rae et al. 2021, App. A1.1):
    per-doc fraction of duplicate lines and fraction of duplicate word
    2-grams — the classic boilerplate/spam filters a pretraining
    pipeline gates on.  Vectorized pandas (explode + drop_duplicates,
    C-speed); tokens use RE2 \\s semantics so the DuckDB oracle agrees
    exactly.  Returns (id, dup_line_frac, dup_ngram_frac), round-6."""
    import pandas as pd

    from .dedup import _WS_RE as ws_re  # ONE RE2-parity tokenizer source

    def fn(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pylist()).fillna("")
        # ---- duplicate lines (split on \n, empties count, like SQL
        # string_split(text, chr(10)))
        lines = texts.str.split("\n")
        n_lines = lines.str.len().to_numpy()
        ex = lines.explode()
        n_distinct = (ex.reset_index().drop_duplicates()
                      .groupby("index").size()
                      .reindex(range(len(texts)), fill_value=0).to_numpy())
        with np.errstate(invalid="ignore"):
            dup_line = np.where(n_lines > 0,
                                (n_lines - n_distinct) / np.maximum(n_lines, 1),
                                0.0)
        # ---- duplicate word 2-grams (RE2 \s tokens, non-empty)
        toks = texts.map(lambda s: [w for w in ws_re.split(s) if w])
        n_tok = toks.str.len().to_numpy()
        total = np.maximum(n_tok - 1, 0)
        ex_t = toks.explode()
        s = ex_t.astype(object)
        nxt = s.groupby(level=0).shift(-1)
        grams = (s + "\x1f" + nxt).dropna()
        gd = (grams.reset_index().drop_duplicates()
              .groupby("index").size()
              .reindex(range(len(texts)), fill_value=0).to_numpy())
        with np.errstate(invalid="ignore"):
            dup_gram = np.where(total > 0,
                                (total - gd) / np.maximum(total, 1), 0.0)
        return pa.table({
            id_col: t[id_col],
            "dup_line_frac": pa.array(np.round(dup_line, 6), pa.float64()),
            "dup_ngram_frac": pa.array(np.round(dup_gram, 6), pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(ds, *, text_col="text", id_col="doc_id"):
    """Stable document fingerprint: md5 of the whitespace-normalized
    token stream (SQL oracle: md5(array_to_string(...)))."""

    def fn(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join((s or "").split()).encode("utf-8")).hexdigest()
            for s in t[text_col].to_pylist()
        ]
        return pa.table({id_col: t[id_col], "fingerprint": pa.array(fps, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprint(ds, *, text_col="text", id_col="doc_id", window=8):
    """Winnowing-style rolling-hash fingerprint set (min hash per window
    of token 64-bit hashes) — the near-dup-grade fingerprint; rows-only
    (hash function not SQL-replicable)."""

    def fn(t: pa.Table) -> pa.Table:
        # Vectorized (round 4): one Arrow whitespace split over the
        # batch, blake2b once per UNIQUE token (dictionary-encode +
        # gather — the hash itself must stay per-string), then all
        # window minima at once via sliding_window_view masked to
        # windows that stay inside one document; per-doc sorted-unique
        # sets fall out of one lexsort + adjacent-dedupe.  Exactly the
        # old per-doc loop's output (pinned by test) — including the
        # \x1c-\x1f file/group/record/unit separators, which Python's
        # str.split() treats as whitespace but Unicode White_Space
        # (hence utf8_split_whitespace) does not: normalize them to
        # spaces first so the token stream matches (round-4 ADVICE).
        ids = t[id_col]
        n_rows = t.num_rows
        import pyarrow.compute as _pc
        col = _pc.replace_substring_regex(
            _pc.fill_null(t[text_col], ""), "[\\x1c-\\x1f]", " ")
        values, offs = _split_tokens(col)[1:]
        n_tok = np.diff(offs)
        d = values.dictionary_encode() if len(values) else None
        out_lists: list[list[int]] = [[] for _ in range(n_rows)]
        if d is not None and len(values):
            uniq = d.dictionary.to_pylist()
            hu = np.fromiter(
                (int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(),
                    "little") for w in uniq),
                dtype=np.uint64, count=len(uniq))
            codes = d.indices.to_numpy(zero_copy_only=False)
            h = hu[codes]
            doc_idx = np.repeat(np.arange(n_rows), n_tok)
            # short docs (1 <= n <= window): fingerprint = [doc min]
            short = (n_tok > 0) & (n_tok <= window)
            if short.any():
                seg_min = np.minimum.reduceat(
                    h, offs[:-1].clip(0, max(len(h) - 1, 0)))
                for i in np.flatnonzero(short):
                    out_lists[i] = [int(seg_min[i])]
            if len(h) >= window:
                sw = np.lib.stride_tricks.sliding_window_view(
                    h, window).min(axis=1)
                valid = doc_idx[: len(sw)] == doc_idx[window - 1:]
                wdoc = doc_idx[: len(sw)][valid]
                wmin = sw[valid]
                if wmin.size:
                    order = np.lexsort((wmin, wdoc))
                    wdoc, wmin = wdoc[order], wmin[order]
                    keep = np.concatenate(
                        [[True], (wdoc[1:] != wdoc[:-1])
                         | (wmin[1:] != wmin[:-1])])
                    wdoc, wmin = wdoc[keep], wmin[keep]
                    starts = np.flatnonzero(np.concatenate(
                        [[True], wdoc[1:] != wdoc[:-1]]))
                    bounds = np.concatenate([starts, [len(wdoc)]])
                    for j, s in enumerate(starts):
                        out_lists[int(wdoc[s])] = \
                            wmin[s:bounds[j + 1]].tolist()
        return pa.table({id_col: ids,
                         "fingerprints": pa.array(out_lists,
                                                  pa.list_(pa.uint64()))})

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_keywords(ds, *, text_col="text", id_col="doc_id", limit=5):
    """Per-doc top keywords via the analyzer chain + stemming (the
    reference's extractKeywords — analyze path, §2.2)."""
    from ..analysis.analyzer import StandardAnalyzer

    class KeywordStage:
        def __init__(self):
            self.analyzer = StandardAnalyzer()

        def __call__(self, t: pa.Table) -> pa.Table:
            kws = [
                [k for k, _ in self.analyzer.extract_keywords(s or "",
                                                              limit=limit)]
                for s in t[text_col].to_pylist()
            ]
            return pa.table({id_col: t[id_col],
                             "keywords": pa.array(kws, pa.list_(pa.string()))})

    return ds.map_batches(KeywordStage, batch_format="pyarrow", concurrency=2)


def tfidf_topk(ds, *, text_col="text", id_col="doc_id", k=5,
               num_partitions=None, round_to=6, as_dataset=False):
    """Distributed TF-IDF: the top-k highest-scoring terms per document,
    with document frequencies computed over the whole corpus — the
    classic keyword/feature-extraction pass of a text pipeline.

    Scale design — no vocabulary table is ever broadcast or collected:

    - one pass explodes docs into (doc_id, term, tf) rows (a doc never
      spans blocks, so per-batch tf IS global tf),
    - document frequency is a map-side-combined wordcount shuffle
      (per-batch value_counts, then ``groupby(term).sum`` — identical
      shape to :func:`bigram_lm_scores`),
    - scoring is one big-big hash join (``Dataset.join`` on the term
      key): exploded pairs ⋈ df — both sides shuffle by term, nothing
      lands anywhere whole,
    - per-doc top-k uses the map-side-combiner idiom of
      ``relational.grouped_topk``: each block keeps at most k rows per
      doc before the final ``groupby(doc_id).map_groups`` ranking.

    tfidf = round(tf * ln(N / df), ``round_to``); ranking/tie-break is
    (tfidf DESC, term ASC) over the ROUNDED score so the DuckDB oracle's
    row_number() agrees bit-for-bit.  Tokens are RE2 ``\\s+`` splits
    (ASCII whitespace, empties elided), matching the oracle's
    string_split_regex.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _default_join_partitions, _strip_meta

    num_partitions = _default_join_partitions(num_partitions)
    base = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], text_col:
                            pc.fill_null(t[text_col], "")}),
        batch_format="pyarrow")
    n_docs = float(base.count())

    def explode_tf(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        values, offs = _ws_split_re2(t[text_col])
        out_ids, terms, tf = _doc_term_tf(ids, values, offs)
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "term": pc.cast(terms, pa.string()),
            "tf": pa.array(tf, pa.int64()),
        })

    # materialize + guard: a corpus with zero tokens yields empty-schema
    # shuffle blocks that crash the pyarrow hash join ("no match for key
    # field") — return the typed empty result instead
    pairs = _strip_meta(base.map_batches(explode_tf, batch_format="pyarrow")
                        ).materialize()
    if pairs.count() == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "term": pd.Series([], dtype=object),
                             "tf": pd.Series([], dtype="int64"),
                             "tfidf": pd.Series([], dtype="float64"),
                             "term_rank": pd.Series([], dtype="int64")})

    # df(term): pairs already hold one row per (doc, term), so a
    # map-side per-batch count + keyed sum is the full doc frequency.
    def df_partial(t: pa.Table) -> pa.Table:
        return _value_counts_table(t["term"], "term")

    dfreq = _strip_meta(pairs.map_batches(df_partial, batch_format="pyarrow")
                        .groupby("term").aggregate(Sum("c", alias_name="df")))

    joined = pairs.join(dfreq, join_type="inner",
                        num_partitions=num_partitions, on=("term",))

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_ = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.round(tf * np.log(n_docs / df_), round_to)
        return pa.table({id_col: t[id_col], "term": t["term"],
                         "tf": t["tf"], "tfidf": pa.array(s, pa.float64())})

    scored = joined.map_batches(score, batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas().sort_values([id_col, "tfidf", "term"],
                                        ascending=[True, False, True])
        out = pa.Table.from_pandas(df_.groupby(id_col, sort=False).head(k),
                                   preserve_index=False)
        return out.replace_schema_metadata(None)

    # Final ranking groups by a BUCKET of docs (doc_id % nparts), not
    # per doc: map_groups invokes its fn once per group, so grouping by
    # doc would be one Python call per document (a per-doc loop at the
    # reduce).  A hash bucket contains whole docs by construction, and
    # each call ranks its whole bucket with one vectorized pandas
    # groupby — N/nparts docs per call instead of 1.
    def bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column("_bkt", pa.array(ids % num_partitions,
                                                pa.int64()))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "tfidf", "term"],
                          ascending=[True, False, True])
        g = g.groupby(id_col, sort=False).head(k)
        g["term_rank"] = (g.groupby(id_col, sort=False).cumcount()
                          + 1).astype(np.int64)
        return g.drop(columns=["_bkt"]).reset_index(drop=True)

    out = (scored.map_batches(partial_topk, batch_format="pyarrow")
           .map_batches(bucket, batch_format="pyarrow")
           .groupby("_bkt").map_groups(final_topk, batch_format="pandas"))
    if as_dataset:
        # streaming contract for the 100 TB path: arrowified, ordered,
        # column-pinned Dataset the caller can write_parquet
        def tidy(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t[id_col].cast(pa.int64()),
                "term": t["term"].cast(pa.string()),
                "tf": t["tf"].cast(pa.int64()),
                "tfidf": t["tfidf"].cast(pa.float64()),
                "term_rank": t["term_rank"].cast(pa.int64()),
            })
        return (out.map_batches(tidy, batch_format="pyarrow")
                .sort([id_col, "term_rank"]))
    pdf = out.to_pandas().sort_values([id_col, "term_rank"])
    pdf["term_rank"] = pdf["term_rank"].astype("int64")
    return pdf.reset_index(drop=True)[[id_col, "term", "tf", "tfidf",
                                       "term_rank"]]


def bigram_lm_scores(ds, *, text_col="text", id_col="doc_id",
                     alpha=0.1, num_partitions=None, round_to=4,
                     as_dataset=False):
    """CCNet-style n-gram language-model quality scoring, fully
    distributed: score every document by its mean bigram log-probability
    under an add-alpha-smoothed bigram LM **fit on the corpus itself**
    (the standard self-perplexity signal a pretraining pipeline uses to
    rank text quality; Wenzek et al. 2020 use a KenLM 5-gram — this is
    the same shape with n=2 so the oracle stays exact).

    Scale design — NO count table is ever broadcast or collected:

    - one pass explodes docs into (doc_id, w1, bigram) rows,
    - bigram and unigram counts are map-side-combined then keyed
      groupby-sums (the classic wordcount shuffle),
    - scoring is two big-big hash joins (``Dataset.join``): exploded
      bigrams ⋈ bigram counts on the bigram key, then ⋈ unigram counts
      on w1 — both sides shuffle by key, nothing lands anywhere whole,
    - the per-doc mean reduces with a final groupby(doc_id).

    P(w2|w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V) with c(w1) the
    corpus occurrence count and V the distinct-unigram count.  Returns
    (doc_id, n_bigrams, avg_logp) for docs with >= 1 bigram.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    from .dedup import _default_join_partitions, _strip_meta

    num_partitions = _default_join_partitions(num_partitions)

    base = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], text_col:
                            pc.fill_null(t[text_col], "")}),
        batch_format="pyarrow")

    def explode_bigrams(t: pa.Table) -> pa.Table:
        # Vectorized: one Arrow regex split, then adjacent (w1, w2)
        # pairs via shifted slices masked to same-document positions —
        # no per-doc Python loop (round-4 verdict item #3).
        ids = t[id_col].to_numpy(zero_copy_only=False)
        values, offs = _ws_split_re2(t[text_col])
        n_tok = np.diff(offs)
        n_bi = np.maximum(n_tok - 1, 0)
        if len(values) < 2 or int(n_bi.sum()) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "big": pa.array([], pa.string())})
        doc_idx = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        same = pa.array(doc_idx[:-1] == doc_idx[1:])
        w1 = values.slice(0, len(values) - 1).filter(same)
        w2 = values.slice(1).filter(same)
        big = pc.binary_join_element_wise(w1, w2, "\x1f")
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_bi), pa.int64()),
            "w1": pc.cast(w1, pa.string()),
            "big": pc.cast(big, pa.string()),
        })

    # materialize + guard: a corpus with zero bigrams yields empty-schema
    # shuffle blocks that crash the pyarrow hash join
    bigrams = base.map_batches(explode_bigrams,
                               batch_format="pyarrow").materialize()
    if bigrams.count() == 0:
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "n_bigrams": pd.Series([], dtype="int64"),
                              "avg_logp": pd.Series([], dtype="float64")})
        if as_dataset:
            return rd.from_arrow(
                pa.Table.from_pandas(empty, preserve_index=False
                                     ).replace_schema_metadata(None))
        return empty

    def _counts(src, key_fn, key_name):
        """Map-side combine (per-batch Arrow value_counts) then keyed
        sum — no pandas round-trip."""
        def partial(t: pa.Table) -> pa.Table:
            vals = key_fn(t)
            if len(vals) == 0:
                return pa.table({key_name: pa.array([], pa.string()),
                                 "c": pa.array([], pa.int64())})
            return _value_counts_table(vals, key_name)
        return (src.map_batches(partial, batch_format="pyarrow")
                .groupby(key_name).aggregate(Sum("c", alias_name="cnt")))

    def uni_tokens(t: pa.Table):
        values, _ = _ws_split_re2(t[text_col])
        return values

    cb = _strip_meta(_counts(bigrams, lambda t: t["big"], "big"))
    cu = _strip_meta(_counts(base, uni_tokens, "w1")).materialize()
    v = cu.count()  # distinct unigrams (cu already has one row per token)

    joined = (_strip_meta(bigrams)
              .join(cb, join_type="inner", num_partitions=num_partitions,
                    on=("big",))
              .join(cu.rename_columns({"cnt": "cu_cnt"}), join_type="inner",
                    num_partitions=num_partitions, on=("w1",)))

    def logp(t: pa.Table) -> pa.Table:
        num = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        den = t["cu_cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log((num + alpha) / (den + alpha * v))
        return pa.table({id_col: t[id_col], "lp": pa.array(lp)})

    grouped = (joined.map_batches(logp, batch_format="pyarrow")
               .groupby(id_col)
               .aggregate(Count(alias_name="n_bigrams"),
                          Mean("lp", alias_name="avg_logp")))

    def _round(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": t["n_bigrams"].cast(pa.int64()),
            "avg_logp": pa.array(
                np.round(t["avg_logp"].to_numpy(zero_copy_only=False),
                         round_to), pa.float64()),
        })

    out = grouped.map_batches(_round, batch_format="pyarrow")
    if as_dataset:
        return out
    pdf = out.to_pandas().sort_values(id_col).reset_index(drop=True)
    return pdf[[id_col, "n_bigrams", "avg_logp"]]


def entropy_stats(ds, *, text_col="text", id_col="doc_id", round_to=6):
    """Per-doc Shannon entropy of the character and word unigram
    distributions — the classic gibberish/boilerplate quality signals
    (low char entropy = repeated chars/spam, low word entropy =
    templated text).  Zero-shuffle vectorized scan; entropy is computed
    from per-doc value counts as ``-Σ (c/n)·ln(c/n)`` with the terms
    accumulated per distinct symbol (same grouped form as the SQL
    oracle), rounded to ``round_to``.  Characters are Unicode
    codepoints; words are RE2 ``\\s+`` tokens (empties elided)."""
    import pandas as pd

    from .dedup import _WS_RE as ws_re

    def _entropy(series_of_lists) -> np.ndarray:
        s = series_of_lists.explode().dropna()
        if s.empty:
            return np.zeros(len(series_of_lists))
        cnt = s.groupby([s.index, s]).size()
        n = cnt.groupby(level=0).sum()
        p = cnt.to_numpy() / n.reindex(
            cnt.index.get_level_values(0)).to_numpy()
        terms = pd.Series(-(p * np.log(p)),
                          index=cnt.index.get_level_values(0))
        ent = terms.groupby(level=0).sum()
        return ent.reindex(range(len(series_of_lists)),
                           fill_value=0.0).to_numpy()

    def fn(t: pa.Table) -> pa.Table:
        texts = pd.Series(t[text_col].to_pylist()).fillna("")
        chars = texts.map(list)
        words = texts.map(lambda s: [w for w in ws_re.split(s) if w])
        n_ch = chars.str.len().to_numpy(np.int64)
        n_wd = words.str.len().to_numpy(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_chars": pa.array(n_ch, pa.int64()),
            "n_words": pa.array(n_wd, pa.int64()),
            "char_entropy": pa.array(np.round(_entropy(chars), round_to),
                                     pa.float64()),
            "word_entropy": pa.array(np.round(_entropy(words), round_to),
                                     pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort(id_col)


def dsir_logweights(ds, *, target_source="src0", text_col="text",
                    id_col="doc_id", group_col="source",
                    buckets=1024, round_to=4):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    the log-likelihood ratio of a hashed-bigram unigram model fit on a
    TARGET slice (here ``group_col == target_source``) vs the RAW
    corpus.  log w(x) = Σ_i [ ln p̂(b_i) − ln q̂(b_i) ] over the doc's
    bigram instances, with add-1 smoothing over ``buckets`` hash
    buckets: p̂(b) = (t_b + 1)/(T + B), q̂(b) = (r_b + 1)/(R + B).

    Scale shape: bigrams hash into a FIXED number of buckets, so the
    only aggregates are two B-row bucket-count tables (map-side
    combined, then broadcast into the scoring scan as plain numpy
    arrays) — no vocabulary shuffle, no join; scoring is one
    zero-shuffle pass.  Bucket = md5 low-64 of ``w1 \\x1f w2`` mod B,
    exactly DuckDB's ``md5_number_lower(...) % B`` so the oracle agrees.

    Returns (id, n_bigrams, logw) for ALL docs (docs with no bigram get
    logw = 0), rounded to ``round_to``.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _strip_meta

    base = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col],
                            group_col: t[group_col],
                            text_col: pc.fill_null(t[text_col], "")}),
        batch_format="pyarrow")

    def explode_buckets(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        srcs = t[group_col].combine_chunks() \
            if isinstance(t[group_col], pa.ChunkedArray) else t[group_col]
        n_bi, grams = _ws_bigram_grams(t[text_col])
        b = _md5_bucket_codes(grams, buckets)
        rep = pa.array(np.repeat(np.arange(len(n_bi)), n_bi), pa.int64())
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_bi), pa.int64()),
            group_col: srcs.take(rep),
            "b": pa.array(b, pa.int64()),
        })

    bi = _strip_meta(base.map_batches(explode_buckets,
                                      batch_format="pyarrow"))

    def _bucket_counts(src) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            u, c = np.unique(t["b"].to_numpy(zero_copy_only=False),
                             return_counts=True)
            return pa.table({"b": pa.array(u.astype(np.int64)),
                             "c": pa.array(c.astype(np.int64))})
        rows = (src.map_batches(partial, batch_format="pyarrow")
                .groupby("b").aggregate(Sum("c", alias_name="cnt"))
                .take_all())
        out = np.zeros(buckets, np.int64)
        for r in rows:
            out[int(r["b"])] = int(r["cnt"])
        return out

    tgt = bi.filter(expr=f"{group_col} == '{target_source}'")
    t_cnt = _bucket_counts(tgt)          # B rows reach the driver — tiny
    r_cnt = _bucket_counts(bi)
    lp = np.log((t_cnt + 1.0) / (float(t_cnt.sum()) + buckets))
    lq = np.log((r_cnt + 1.0) / (float(r_cnt.sum()) + buckets))
    diff = lp - lq                        # broadcast into the scan below

    def score(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n_bi, grams = _ws_bigram_grams(t[text_col])
        if len(grams):
            b = _md5_bucket_codes(grams, buckets)
            per = diff[b]
            cs = np.concatenate([[0.0], np.cumsum(per)])
            offs = np.concatenate([[0], np.cumsum(n_bi)])
            logw = cs[offs[1:]] - cs[offs[:-1]]
        else:
            logw = np.zeros(len(ids))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "logw": pa.array(np.round(logw, round_to), pa.float64()),
        })

    return base.map_batches(score, batch_format="pyarrow").sort(id_col)


def ccnet_ppl_buckets(ds, *, text_col="text", id_col="doc_id",
                      alpha=0.1, num_partitions=None, round_to=4,
                      as_dataset=False):
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.3): score every doc with the corpus-fit bigram LM
    (:func:`bigram_lm_scores`), then split the corpus into thirds by
    the score's exact tertiles — ``head`` = most fluent third (highest
    avg log-prob), ``tail`` = least.

    Fully composed from distributed pieces: the LM scoring Dataset is
    materialized once (one row per doc), the two tertile thresholds are
    computed with the EXACT distributed percentile_disc sketch
    (``sketches.quantiles_disc`` — log-pass bracketing, never collects
    the column), and assignment is a zero-shuffle scan against the two
    broadcast scalars.  Bucket edges use ``avg_logp <= t`` on the
    round-4 scores, identical to the SQL oracle's CASE.
    """
    from .sketches import quantiles_disc

    scores = bigram_lm_scores(
        ds, text_col=text_col, id_col=id_col, alpha=alpha,
        num_partitions=num_partitions, round_to=round_to,
        as_dataset=True).materialize()
    qdf = quantiles_disc(scores, "avg_logp", qs=(1 / 3, 2 / 3),
                         round_to=round_to)
    t1, t2 = float(qdf.value.iloc[0]), float(qdf.value.iloc[1])

    def assign(t: pa.Table) -> pa.Table:
        lp = t["avg_logp"].to_numpy(zero_copy_only=False)
        b = np.where(lp <= t1, "tail", np.where(lp <= t2, "middle", "head"))
        return t.append_column("ppl_bucket", pa.array(b.tolist(),
                                                      pa.string()))

    bucketed = scores.map_batches(assign, batch_format="pyarrow")
    if as_dataset:
        return bucketed
    pdf = bucketed.to_pandas().sort_values(id_col).reset_index(drop=True)
    return pdf[[id_col, "n_bigrams", "avg_logp", "ppl_bucket"]]


def source_token_stats(ds, *, text_col="text", id_col="doc_id",
                       group_col="source", round_to=6):
    """Per-source tokenizer/corpus report: doc count, whitespace-token
    and BPE-ish-subword totals, fertility (subwords per word — the
    metric a tokenizer team tracks per domain), distinct-term count and
    type-token ratio.

    Shapes: the totals are a map-side-combined groupby over one row per
    (batch, source); the distinct-term count is a two-stage keyed
    dedup — per-batch distinct (source, term) pairs, then
    ``groupby([source, term]).count()`` (the global dedup shuffle, keyed
    so nothing lands whole) reduced to a per-source count.  Output is
    one row per source.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .dedup import _strip_meta

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col].cast(pa.string()), "")
        n_tok = pc.count_substring_regex(arr, r"\S+").cast(pa.int64())
        n_sub = pc.count_substring_regex(arr, BPE_ISH_PATTERN).cast(pa.int64())
        df = pd.DataFrame({group_col: t[group_col].to_pylist(),
                           "n_tokens": n_tok.to_numpy(zero_copy_only=False),
                           "n_subwords": n_sub.to_numpy(zero_copy_only=False)})
        g = df.groupby(group_col).agg(n_docs=("n_tokens", "size"),
                                      n_tokens=("n_tokens", "sum"),
                                      n_subwords=("n_subwords", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False
                                    ).replace_schema_metadata(None)

    totals = (_strip_meta(ds.map_batches(partial, batch_format="pyarrow"))
              .groupby(group_col)
              .aggregate(Sum("n_docs", alias_name="n_docs"),
                         Sum("n_tokens", alias_name="n_tokens"),
                         Sum("n_subwords", alias_name="n_subwords")))

    def pairs(t: pa.Table) -> pa.Table:
        # Vectorized batch-distinct (source, term) pairs: dict-encode
        # source and token, one packed-key np.unique.  Emitting
        # BATCH-distinct (vs the old per-doc set()) is a strictly
        # stronger map-side dedupe and leaves the downstream
        # groupby-distinct result unchanged.
        srcs = t[group_col]
        if isinstance(srcs, pa.ChunkedArray):
            srcs = srcs.combine_chunks()
        values, offs = _ws_split_re2(t[text_col])
        if len(values) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "term": pa.array([], pa.string())})
        sd = srcs.dictionary_encode()
        scodes = np.repeat(
            sd.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            np.diff(offs))
        td = values.dictionary_encode()
        tcodes = td.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vsize = len(td.dictionary)
        key = np.unique(scodes * vsize + tcodes)
        return pa.table({
            group_col: pc.cast(
                sd.dictionary.take(pa.array(key // vsize)), pa.string()),
            "term": pc.cast(
                td.dictionary.take(pa.array(key % vsize)), pa.string()),
        })

    distinct = (_strip_meta(ds.map_batches(pairs, batch_format="pyarrow"))
                .groupby([group_col, "term"]).count()
                .map_batches(lambda t: pa.table(
                    {group_col: t[group_col]}), batch_format="pyarrow")
                .groupby(group_col)
                .aggregate(Count(alias_name="distinct_terms")))

    tdf = totals.to_pandas().set_index(group_col)
    ddf = distinct.to_pandas().set_index(group_col)
    out = tdf.join(ddf).reset_index().sort_values(group_col)
    out["fertility"] = (out.n_subwords / out.n_tokens).round(round_to)
    out["type_token_ratio"] = (out.distinct_terms
                               / out.n_tokens).round(round_to)
    for c in ("n_docs", "n_tokens", "n_subwords", "distinct_terms"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)[
        [group_col, "n_docs", "n_tokens", "n_subwords", "fertility",
         "distinct_terms", "type_token_ratio"]]


def regex_scan(ds, pattern: str, *, text_col="text", id_col="doc_id",
               k=100):
    """Distributed grep: per-doc RE2 match counts for ``pattern``, docs
    with >= 1 match ranked by (count DESC, id ASC), top ``k``.

    One vectorized scan (``pc.count_substring_regex`` — RE2, the same
    engine DuckDB uses, so the oracle counts are identical), per-block
    top-k prune inside the map stage, then a final sort over the pruned
    remainder (<= k rows per block, not the corpus).  The 100 TB shape
    of "find the files matching this pattern": no shuffle of full rows,
    the only exchange is the pruned (id, count) pairs.
    """
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t[text_col], pattern),
                    pa.int64())
        out = pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                        "n_matches": n})
        out = out.filter(pc.greater(n, 0))
        if out.num_rows > k:  # per-block prune: keep only possible top-k
            idx = pc.select_k_unstable(
                out, k, [("n_matches", "descending"), (id_col, "ascending")])
            out = out.take(idx)
        return out

    pruned = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    pruned = pruned.sort_values(["n_matches", id_col],
                                ascending=[False, True], kind="stable")
    return pruned.head(k).reset_index(drop=True)


def collocations(ds, *, text_col="text", k=20, min_count=5, round_to=6):
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information (classic corpus analytics; an LLM-data extension beyond
    the reference's keyword extraction, ``src/Analyzers``):

        pmi(a,b) = ln( (n_ab / N_bi) / ((n_a / N_tok) * (n_b / N_tok)) )

    over RE2-whitespace tokens (the dedup/textstats tokenization, so
    the DuckDB ``\\s+`` oracle sees identical tokens).  Pairs with
    ``n_ab < min_count`` are dropped; ties (pmi desc, a asc, b asc).

    Distributed shape: ONE corpus pass; each batch emits map-side
    COMBINED partial counts (unique bigram and unigram rows, tagged so
    a single groupby serves both); the aggregate output is vocabulary-
    bounded, not corpus-bounded, and only that table reaches the
    driver for the final PMI arithmetic.  At open-web vocabulary the
    post-aggregate min_count prune would ride a distributed filter +
    ``sort.limit`` instead of the driver collect."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        offs = np.asarray(split.offsets, dtype=np.int64)
        offs = offs - offs[0]
        nonempty = np.asarray(pc.not_equal(flat, ""), dtype=bool)
        keep_counts = _seg_sum(nonempty.astype(np.int64), offs)
        toks = flat.filter(pa.array(nonempty))
        if len(toks) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8())})
        d = toks.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        V = len(uniq)
        row_id = np.repeat(np.arange(len(keep_counts)), keep_counts)
        # unigram partials
        ucodes, ucnt = np.unique(codes, return_counts=True)
        # adjacent bigrams within a row
        same = row_id[:-1] == row_id[1:] if len(codes) > 1 else \
            np.zeros(0, dtype=bool)
        a = codes[:-1][same]
        b = codes[1:][same]
        out_a = [uniq[ucodes], ]
        out_b = [np.full(len(ucodes), "", dtype=object)]
        out_n = [ucnt.astype(np.int64)]
        out_k = [np.zeros(len(ucodes), dtype=np.int8)]
        if a.size:
            key, cnt = np.unique(a * V + b, return_counts=True)
            out_a.append(uniq[(key // V).astype(np.int64)])
            out_b.append(uniq[(key % V).astype(np.int64)])
            out_n.append(cnt.astype(np.int64))
            out_k.append(np.ones(len(key), dtype=np.int8))
        return pa.table({
            "a": pa.array(np.concatenate(out_a), pa.string()),
            "b": pa.array(np.concatenate(out_b), pa.string()),
            "n": pa.array(np.concatenate(out_n), pa.int64()),
            "kind": pa.array(np.concatenate(out_k), pa.int8()),
        })

    import pandas as pd

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["kind", "a", "b"]).sum("n").to_pandas())
    agg = agg.rename(columns={"sum(n)": "n"})
    uni = agg[agg["kind"] == 0].set_index("a")["n"]
    bi = agg[agg["kind"] == 1][["a", "b", "n"]].copy()
    n_tok = float(uni.sum())
    n_bi = float(bi["n"].sum())
    bi = bi[bi["n"] >= min_count]
    if not len(bi):
        return pd.DataFrame({"a": pd.array([], dtype=str),
                             "b": pd.array([], dtype=str),
                             "n_ab": pd.array([], dtype="int64"),
                             "pmi": pd.array([], dtype="float64")})
    pa_ = bi["a"].map(uni).to_numpy(dtype=np.float64) / n_tok
    pb_ = bi["b"].map(uni).to_numpy(dtype=np.float64) / n_tok
    pab = bi["n"].to_numpy(dtype=np.float64) / n_bi
    pmi = np.log(pab / (pa_ * pb_))
    out = pd.DataFrame({"a": bi["a"].to_numpy(),
                        "b": bi["b"].to_numpy(),
                        "n_ab": bi["n"].astype("int64").to_numpy(),
                        "pmi": [round(float(x), round_to) for x in pmi]})
    return (out.sort_values(["pmi", "a", "b"],
                            ascending=[False, True, True], kind="mergesort")
            .head(k).reset_index(drop=True))


def vocab_stats(ds, *, text_col="text"):
    """One-row corpus vocabulary diagnostics (Zipf/Heaps-style health
    checks a pretraining pipeline tracks): total tokens, distinct
    terms, hapax count (terms seen once), and type-token ratio, over
    RE2-whitespace tokens.

    Distributed shape: per-batch unique (term, count) partials (the
    same map-side combine as ``collocations``), one vocabulary-bounded
    groupby, then four scalars — the corpus never reaches the driver."""
    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        toks = flat.filter(pc.not_equal(flat, ""))
        if len(toks) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = toks.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"term": pa.array(uniq[u], pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("term").sum("n").to_pandas())
    n = agg["sum(n)"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    vocab = int(len(n))
    hapax = int((n == 1).sum())
    return pd.DataFrame({
        "n_tokens": pd.array([total], dtype="int64"),
        "n_terms": pd.array([vocab], dtype="int64"),
        "n_hapax": pd.array([hapax], dtype="int64"),
        "type_token_ratio": pd.array(
            [round(vocab / total, 6) if total else 0.0], dtype="float64"),
    })


def zipf_fit(ds, *, text_col="text", top_n=1000):
    """Zipf-law fit over the term-frequency distribution: least-squares
    slope/intercept of ln(freq) ~ ln(rank) for the ``top_n``
    most-frequent RE2-whitespace terms (rank order freq DESC, term ASC).
    A healthy natural-language corpus sits near slope -1; the slope is
    a cheap corpus-drift / synthetic-text alarm a pretraining pipeline
    tracks next to ``vocab_stats``.

    Distributed shape: the same map-side-combined unigram partials and
    vocabulary-bounded groupby as ``vocab_stats``, then a distributed
    (freq, term) sort + ``limit(top_n)`` — only the fitted head reaches
    the driver, never the vocabulary.  One row
    (n_fit, slope, intercept)."""
    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        toks = flat.filter(pc.not_equal(flat, ""))
        if len(toks) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = toks.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"term": pa.array(uniq[u], pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    head = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("term").sum("n")
            .sort(["sum(n)", "term"], descending=[True, False])
            .limit(top_n).to_pandas())
    f = head["sum(n)"].to_numpy(dtype=np.float64)
    x = np.log(np.arange(1, f.size + 1, dtype=np.float64))
    y = np.log(f)
    # closed-form simple regression (matches SQL regr_slope/intercept)
    mx, my = x.mean(), y.mean()
    slope = float(((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum())
    intercept = float(my - slope * mx)
    return pd.DataFrame({
        "n_fit": pd.array([int(f.size)], dtype="int64"),
        "slope": pd.array([round(slope, 6)], dtype="float64"),
        "intercept": pd.array([round(intercept, 6)], dtype="float64"),
    })


def doc_similarity_topk(ds, *, text_col="text", id_col="doc_id", k=3,
                        maxdf_ratio=1.0, round_to=6):
    """All-pairs sparse TF-IDF cosine similarity, top-``k`` neighbours
    per document — the batch "more-like-this" / similarity-join shape
    (reference analog: SearchEngine::moreLikeThis per doc, here over
    the whole corpus at once).

    Model: w(d,t) = tf · ln(N/df_t) over RE2-whitespace terms with
    df_t ≤ maxdf_ratio·N (the standard maxdf cap — THE scale knob: a
    term of document frequency f generates O(f²) partial products, so
    the cap bounds the pair exchange; dropped terms are the stopword
    head, which carries ~no idf weight anyway).  Cosine = dot of
    L2-normalized vectors; ranking by ROUNDED cosine (``round_to``)
    DESC then neighbour id ASC, so float summation order cannot flip
    ranks between engines.

    Distributed shape: pass 1 = one tokenization → vocabulary-bounded
    (term, df) aggregate, broadcast as an idf dict; pass 2 =
    re-tokenize, emit L2-normalized (term, id, w) postings map-side;
    pair stage = term-keyed groupby emitting per-term partial products
    (id_a < id_b) whose volume the maxdf cap bounds; one pair-keyed
    sum groupby; mirror + per-doc top-k on the (bounded) pair
    aggregate.  The corpus itself never reaches the driver.
    Columns (doc_a, doc_b, cosine, rank)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def tf_partial(t: pa.Table) -> pa.Table:
        # Vectorized dict-encode + packed-key unique (see _doc_term_tf)
        # instead of a pandas object-string groupby per batch.
        ids = t[id_col].to_numpy(zero_copy_only=False)
        values, offs = _ws_split_re2(t[text_col])
        out_ids, terms, tf = _doc_term_tf(ids, values, offs)
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "term": pc.cast(terms, pa.string()),
                         "tf": pa.array(tf, pa.int64())})

    tf = ds.map_batches(tf_partial, batch_format="pyarrow")
    n_docs = int(ds.count())
    dfs = tf.groupby("term").count().to_pandas()  # vocabulary-bounded
    dfs = dfs[dfs["count()"] <= maxdf_ratio * n_docs]
    idf = {t: float(np.log(n_docs / c))
           for t, c in zip(dfs["term"], dfs["count()"])}
    idf_ref = ray.put(idf)

    def weigh(t: pa.Table) -> pa.Table:
        # vectorized: same (doc, term, tf) derivation as tf_partial,
        # then a dict-map idf join + per-doc L2 norm via groupby
        # transform — no per-row Python
        idf_map = ray.get(idf_ref)
        g = tf_partial(t).to_pandas()
        g["idf"] = g["term"].map(idf_map)
        g = g.dropna(subset=["idf"])
        if g.empty:
            return pa.table({"term": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        g["w"] = g["tf"].to_numpy(np.float64) * g["idf"].to_numpy()
        w2 = g["w"] * g["w"]
        nz = np.sqrt(w2.groupby(g[id_col]).transform("sum").to_numpy())
        g = g[nz > 0.0]
        wn = g["w"].to_numpy() / nz[nz > 0.0]
        return pa.table({"term": pa.array(g["term"], pa.string()),
                         id_col: pa.array(g[id_col].to_numpy(np.int64)),
                         "w": pa.array(wn, pa.float64())})

    postings = ds.map_batches(weigh, batch_format="pyarrow")

    # Pair stage groups by a term BUCKET, not per term: map_groups is
    # one Python call per group, so per-term grouping pays Ray slicing
    # + a pandas frame per term.  Bucketing (hash of the term mod
    # nbuckets) keeps every posting list whole and lets one call sweep
    # many terms; inside, pairs expand segment-by-segment with numpy
    # triu — Python iterates segments, never rows.
    nbuckets = 64

    def bucket_terms(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        d = terms.dictionary_encode()
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        hb = (pd.util.hash_array(uniq, hash_key="0123456789123456")
              % nbuckets).astype(np.int64)
        codes = d.indices.to_numpy(zero_copy_only=False)
        return t.append_column("_bkt", pa.array(hb[codes], pa.int64()))

    def term_pairs(g: pd.DataFrame) -> pa.Table:
        # NB: returns an ARROW table — this stage feeds the pair-keyed
        # aggregate, and pandas-format blocks entering a Ray Data
        # shuffle are ~20x slower than Arrow blocks (measured 95.6 s vs
        # 4.4 s on a 343k-row groupby-sum at 32 CPUs).
        g = g.sort_values(["term", id_col], kind="mergesort")
        ids = g[id_col].to_numpy(np.int64)
        w = g["w"].to_numpy(np.float64)
        terms = g["term"].to_numpy()
        empty = pa.table({"pair": pa.array([], pa.int64()),
                          "p": pa.array([], pa.float64())})
        if ids.size < 2:
            return empty
        starts = np.flatnonzero(
            np.concatenate([[True], terms[1:] != terms[:-1]]))
        sizes = np.diff(np.concatenate([starts, [len(terms)]]))
        pair_out, p_out = [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, 1)
            seg_ids = ids[s:s + n]
            seg_w = w[s:s + n]
            # pack (doc_a, doc_b) into ONE int64 shuffle key (doc ids
            # are 32-bit here; the packed key halves the exchange width
            # and the groupby hashes one column instead of two — same
            # trick as dedup.dedup_paragraphs); ids ascend within the
            # segment, so a < b holds by construction
            pair_out.append((seg_ids[iu] << 32) | seg_ids[ju])
            p_out.append(seg_w[iu] * seg_w[ju])
        if not pair_out:
            return empty
        return pa.table({"pair": pa.array(np.concatenate(pair_out)),
                         "p": pa.array(np.concatenate(p_out))})

    dots = (postings.map_batches(bucket_terms, batch_format="pyarrow")
            .groupby("_bkt")
            .map_groups(term_pairs, batch_format="pandas")
            .groupby("pair").aggregate(Sum("p", alias_name="dot")))

    def mirror(t: pa.Table) -> pa.Table:
        pair = t["pair"].to_numpy(zero_copy_only=False)
        a = (pair >> 32).astype(np.int64)
        b = (pair & 0xFFFFFFFF).astype(np.int64)
        cos = pc.round(t["dot"], ndigits=round_to).combine_chunks()
        return pa.table({
            "doc_a": pa.concat_arrays([pa.array(a), pa.array(b)]),
            "doc_b": pa.concat_arrays([pa.array(b), pa.array(a)]),
            "cosine": pa.concat_arrays([cos] * 2),
        })

    # Per-doc top-k, bucketed for the same reason as the pair stage
    # (one vectorized pandas groupby per bucket of docs, not one call
    # per doc).
    def bucket_docs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        return t.append_column("_bkt", pa.array(a % nbuckets, pa.int64()))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_a", "cosine", "doc_b"],
                          ascending=[True, False, True])
        g = g.groupby("doc_a", sort=False).head(k)
        g["rank"] = (g.groupby("doc_a", sort=False).cumcount()
                     + 1).astype(np.int64)
        return g.drop(columns=["_bkt"]).reset_index(drop=True)

    out = (dots.map_batches(mirror, batch_format="pyarrow")
           .map_batches(bucket_docs, batch_format="pyarrow")
           .groupby("_bkt").map_groups(topk, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "cosine": pd.array([], dtype="float64"),
                             "rank": pd.array([], dtype="int64")})
    out["doc_a"] = out["doc_a"].astype("int64")
    out["doc_b"] = out["doc_b"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return (out[["doc_a", "doc_b", "cosine", "rank"]]
            .sort_values(["doc_a", "rank"]).reset_index(drop=True))


def ngram_novelty(ds, *, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id",
                  num_partitions: int | None = None):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams whose corpus-wide first occurrence (min doc_id) is the
    doc itself — the "how much new text does this doc add" curation
    signal (the dup-fraction complement used alongside exact-substring
    dedup in RefinedWeb/Lee-et-al-style pipelines).

    Distributed shape: gram construction is fully VECTORIZED — one flat
    whitespace-token array per batch, n shifted zero-copy slices joined
    with ``binary_join_element_wise``, windows crossing doc boundaries
    masked with one numpy compare — no per-row Python.  Per-batch
    distinct (doc_id, gram) pairs shuffle ONCE keyed by gram for the
    min-doc_id first-occurrence aggregate; novel counts per doc then
    hash-join back onto per-doc distinct-gram totals, which are
    computed map-side with NO shuffle (a doc lives in one row, so
    per-batch distinct is exact).  Grams shuffle as strings for oracle
    identity; at 100 TB swap the key for a 128-bit hash to cut exchange
    bytes (collision odds negligible).
    Columns (doc_id, n_grams, n_novel, novelty); docs with fewer than
    ``n`` tokens produce no grams and are excluded (both sides)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    from .dedup import _default_join_partitions, _join_ready

    num_partitions = _default_join_partitions(num_partitions)

    def _gram_pairs(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        counts = np.diff(split.offsets.to_numpy(zero_copy_only=False))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(ids, counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            doc_idx = doc_idx[keep]
        m = len(flat)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "gram": pa.array([], pa.string())})
        if m < n:
            return empty
        parts = [flat.slice(k, m - n + 1) for k in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = doc_idx[: m - n + 1] == doc_idx[n - 1:]
        if not valid.any():
            return empty
        tb = pa.table({
            "doc_id": pa.array(doc_idx[: m - n + 1][valid], pa.int64()),
            "gram": grams.filter(pa.array(valid)),
        })
        return tb.group_by(["doc_id", "gram"]).aggregate([])

    def _totals(t: pa.Table) -> pa.Table:
        g = _gram_pairs(t)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(u, pa.int64()),
                         "n_grams": pa.array(c.astype(np.int64), pa.int64())})

    gram_ds = ds.map_batches(_gram_pairs, batch_format="pyarrow")
    # a corpus with ZERO grams (every doc shorter than n tokens) leaves
    # only empty blocks, which the hash join cannot type — detect with a
    # streaming limit(1) probe (early-stops on the first nonempty block,
    # so the common case pays ~one batch of recompute)
    if gram_ds.limit(1).count() == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "n_grams": pd.Series(dtype="int64"),
            "n_novel": pd.Series(dtype="int64"),
            "novelty": pd.Series(dtype="float64")})
    novel = _join_ready(
        gram_ds.groupby("gram")
        .aggregate(Min("doc_id", alias_name="fd"))
        .groupby("fd").aggregate(Count(alias_name="n_novel")),
        num_partitions)
    totals = _join_ready(ds.map_batches(_totals, batch_format="pyarrow"),
                         num_partitions)
    j = totals.join(novel, join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("doc_id",), right_on=("fd",))

    def fix(t: pa.Table) -> pa.Table:
        nn = pc.coalesce(t["n_novel"], pa.scalar(0, t["n_novel"].type))
        nn = pc.cast(nn, pa.int64())
        ng = t["n_grams"]
        nov = pc.round(pc.divide(pc.cast(nn, pa.float64()),
                                 pc.cast(ng, pa.float64())), ndigits=6)
        return pa.table({"doc_id": t["doc_id"], "n_grams": ng,
                         "n_novel": nn, "novelty": nov})

    out = j.map_batches(fix, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_grams"] = out["n_grams"].astype("int64")
    out["n_novel"] = out["n_novel"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def langid_confusion(ds, *, text_col="text", id_col="doc_id",
                     lang_col="lang"):
    """Language-ID evaluation: confusion matrix of the corpus's labeled
    ``lang`` column vs the marker-based predictor — the
    quality-monitoring report every lang-filter stage ships with.

    Distributed shape: one vectorized predict pass (the same ``is_in``
    + segmented-sum kernel as ``language_id``) carrying the true label
    through the batch, then one (true, pred)-keyed shuffle-aggregate
    bounded by |langs|^2.  Columns (lang, pred_lang, n)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    marker_arrs = {lang: pa.array(list(ws), pa.string())
                   for lang, ws in LANG_MARKERS.items()}

    def fn(t: pa.Table) -> pa.Table:
        _, values, offs = _split_tokens(t[text_col])
        counts = np.stack([
            _seg_sum(np.asarray(
                pc.is_in(values, value_set=marker_arrs[lang])
            ).astype(np.int64), offs)
            for lang in _LANG_ORDER
        ])
        best = np.argmax(counts, axis=0)
        langs = np.array(_LANG_ORDER, dtype=object)
        preds = np.where(counts.max(axis=0) > 0, langs[best], "und")
        return pa.table({"lang": t[lang_col],
                         "pred_lang": pa.array(preds.tolist(), pa.string())})

    out = (ds.map_batches(fn, batch_format="pyarrow")
           .groupby(["lang", "pred_lang"])
           .aggregate(Count(alias_name="n")).to_pandas())
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["lang", "pred_lang"])
            .reset_index(drop=True))


def fertility_by_lang(ds, *, text_col="text", lang_col="lang"):
    """Tokenizer-fertility report: per language, total whitespace words,
    total BPE-ish subword pieces, and fertility = subwords/word — the
    multilingual-tokenizer health metric (high fertility = the language
    is being shredded and pays more sequence length per word).

    Distributed shape: both counts are single-regex Arrow kernels per
    batch (the ``token_counts`` kernels) with the lang label carried
    through; one |langs|-row shuffle-aggregate of the sums.
    Columns (lang, n_tokens, n_subwords, fertility)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(arr, pattern=r"\S+"),
                        pa.int64())
        n_sub = pc.cast(pc.count_substring_regex(arr,
                                                 pattern=BPE_ISH_PATTERN),
                        pa.int64())
        return pa.table({"lang": t[lang_col], "n_tokens": n_tok,
                         "n_subwords": n_sub})

    out = (ds.map_batches(fn, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                      Sum("n_subwords", alias_name="n_subwords"))
           .to_pandas())
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_subwords"] = out["n_subwords"].astype("int64")
    out["fertility"] = (out["n_subwords"] / out["n_tokens"]).round(6)
    return out.sort_values("lang").reset_index(drop=True)


def ttr_by_source(ds, *, text_col="text", src_col="source"):
    """Lexical diversity per source: distinct terms, total tokens, and
    type-token ratio per source bucket — the source-quality diagnostic
    (low TTR = templated/boilerplate feeds).

    Distributed shape: per-batch distinct (source, term) partials (the
    vocabulary-bounded map-side combine), one (source, term)-keyed
    groupby for the global distinct, a |sources|-row count rollup, and
    an independent token-count aggregate — text never shuffles, terms
    do once.  Columns (source, n_terms, n_tokens, ttr)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def pairs(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        counts = np.diff(split.offsets.to_numpy(zero_copy_only=False))
        src = np.repeat(
            np.asarray(t[src_col].to_pylist(), dtype=object), counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tb = pa.table({"source": pa.array(src[keep], pa.string()),
                       "term": flat.filter(pa.array(keep))})
        return tb.group_by(["source", "term"]).aggregate([])

    terms = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby(["source", "term"]).aggregate(Count(alias_name="_n"))
             .groupby("source").aggregate(Count(alias_name="n_terms"))
             .to_pandas())

    def tok_counts(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        n = pc.cast(pc.count_substring_regex(arr, pattern=r"\S+"),
                    pa.int64())
        return pa.table({"source": t[src_col], "n_tok": n})

    toks = (ds.map_batches(tok_counts, batch_format="pyarrow")
            .groupby("source").aggregate(Sum("n_tok", alias_name="n_tokens"))
            .to_pandas())
    out = terms.merge(toks, on="source")
    out["n_terms"] = out["n_terms"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["ttr"] = (out["n_terms"] / out["n_tokens"]).round(6)
    return out.sort_values("source").reset_index(drop=True)


def charclass_by_lang(ds, *, text_col="text", lang_col="lang",
                      round_to: int = 6):
    """Character-class profile per language: total chars, ASCII-letter
    ratio, digit ratio, whitespace ratio — the encoding/garbage
    detector run per language bucket before filtering decisions.

    Distributed shape: three vectorized regex-count kernels per batch,
    one |langs|-row aggregate of the sums.
    Columns (lang, n_chars, ascii_ratio, digit_ratio, ws_ratio)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        total = pc.cast(pc.utf8_length(arr), pa.int64())
        letters = pc.cast(pc.count_substring_regex(arr, pattern="[A-Za-z]"),
                          pa.int64())
        digits = pc.cast(pc.count_substring_regex(arr, pattern="[0-9]"),
                         pa.int64())
        ws = pc.cast(pc.count_substring_regex(arr, pattern="[\\t\\n\\f\\r ]"),
                     pa.int64())
        return pa.table({"lang": t[lang_col], "n": total, "a": letters,
                         "d": digits, "w": ws})

    agg = (ds.map_batches(fn, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n", alias_name="n"), Sum("a", alias_name="a"),
                      Sum("d", alias_name="d"), Sum("w", alias_name="w"))
           .to_pandas())
    out = pd.DataFrame({
        "lang": agg["lang"],
        "n_chars": agg["n"].astype("int64"),
        "ascii_ratio": (agg["a"] / agg["n"]).round(round_to),
        "digit_ratio": (agg["d"] / agg["n"]).round(round_to),
        "ws_ratio": (agg["w"] / agg["n"]).round(round_to),
    })
    return out.sort_values("lang").reset_index(drop=True)


def source_vocab_overlap(ds, *, text_col="text", src_col="source",
                         round_to: int = 6):
    """Cross-source vocabulary overlap: for every source pair (a < b),
    the shared-term count and Jaccard similarity of their vocabularies
    — the redundancy map that tells a curation pipeline which feeds are
    re-publishing the same material.

    Distributed shape: distinct (source, term) pairs shuffle once
    (vocabulary-bounded); terms then group by a HASH BUCKET and one
    pandas self-merge per bucket emits every term's
    <= C(|sources|, 2) source pairs at once, pre-counted per bucket
    (round 5 — was one Python call per term, untenable at web-corpus
    vocabulary sizes); one pair-keyed Sum and a broadcast of the
    |sources|-row vocab sizes finish.  Columns (source_a, source_b,
    n_shared, jaccard); zero-overlap pairs are omitted."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def pairs(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        counts = np.diff(split.offsets.to_numpy(zero_copy_only=False))
        src = np.repeat(
            np.asarray(t[src_col].to_pylist(), dtype=object), counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tb = pa.table({"source": pa.array(src[keep], pa.string()),
                       "term": flat.filter(pa.array(keep))})
        return tb.group_by(["source", "term"]).aggregate([])

    tok = (ds.map_batches(pairs, batch_format="pyarrow")
           .groupby(["source", "term"]).aggregate(Count(alias_name="_n")))
    vocab = (tok.groupby("source").aggregate(Count(alias_name="nv"))
             .to_pandas())
    nv = dict(zip(vocab["source"], vocab["nv"].astype(int)))

    buckets = 64

    def bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["term"].to_pylist(), dtype=object))
        return pa.table({
            "source": t["source"], "term": t["term"],
            "_bkt": pa.array((h % buckets).astype(np.int64), pa.int64()),
        })

    def combos(g: pd.DataFrame) -> pa.Table:
        d = g[["term", "source"]]
        m = d.merge(d, on="term")
        m = m[m["source_x"] < m["source_y"]]
        c = (m.groupby(["source_x", "source_y"]).size()
             .reset_index(name="n"))
        return pa.table({
            "source_a": pa.array(c["source_x"], pa.string()),
            "source_b": pa.array(c["source_y"], pa.string()),
            "n": pa.array(c["n"].to_numpy(np.int64), pa.int64()),
        })

    sh = (tok.map_batches(bucket, batch_format="pyarrow")
          .groupby("_bkt").map_groups(combos, batch_format="pandas")
          .groupby(["source_a", "source_b"])
          .aggregate(Sum("n", alias_name="n_shared")).to_pandas())
    sh["n_shared"] = sh["n_shared"].astype("int64")
    union = (sh["source_a"].map(nv) + sh["source_b"].map(nv)
             - sh["n_shared"])
    sh["jaccard"] = (sh["n_shared"] / union).round(round_to)
    return (sh.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def readability(ds, *, text_col="text", id_col="doc_id",
                round_to: int = 6):
    """Deterministic readability proxy per doc: sentence count
    (non-empty ``[.!?]+`` segments), words per sentence, chars per
    word, and an FK-style grade proxy
    ``0.39 * wps + 11.8 * cpw - 15.59`` (chars-per-word standing in
    for syllables so both engines agree exactly) — the readability
    gate of a text-quality pipeline.

    Distributed shape: two vectorized RE2 counts per batch, no
    shuffle.  Columns (doc_id, n_sentences, wps, cpw, fk_proxy); docs
    with zero sentences or zero words are excluded (both sides)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        # sentences = segments containing a non-terminator char,
        # counted as runs of [^.!?]+ that hold at least one \S
        sent = pc.count_substring_regex(
            arr, pattern=r"[^.!?]*[^.!?\s][^.!?]*")
        words = pc.count_substring_regex(arr, pattern=r"\S+")
        # chars = non-whitespace chars (so cpw >= 1 exactly like the
        # SQL length(regexp_replace(text, '\s', '', 'g')))
        chars = pc.count_substring_regex(arr, pattern=r"\S")
        ns = np.asarray(sent, dtype=np.int64)
        nw = np.asarray(words, dtype=np.int64)
        nc = np.asarray(chars, dtype=np.int64)
        keep = (ns > 0) & (nw > 0)
        wps = nw[keep] / ns[keep]
        cpw = nc[keep] / nw[keep]
        fk = 0.39 * wps + 11.8 * cpw - 15.59
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "n_sentences": pa.array(ns[keep], pa.int64()),
            "wps": pa.array(np.round(wps, round_to), pa.float64()),
            "cpw": pa.array(np.round(cpw, round_to), pa.float64()),
            "fk_proxy": pa.array(np.round(fk, round_to), pa.float64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def source_js_divergence(ds, *, src_a: str = "src0", src_b: str = "src1",
                         text_col="text", src_col="source",
                         round_to: int = 6):
    """Distribution-shift report: Jensen–Shannon divergence (natural
    log) between two sources' unigram term distributions — the drift
    metric run when a new feed joins a training mix.

    Distributed shape: per-source term counts shuffle once
    (vocabulary-bounded, sources pre-filtered map-side); the JS sum
    runs over the joint |vocab|-row aggregate.
    Columns (source_a, source_b, n_terms, js_div)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[src_col], value_set=pa.array([src_a, src_b]))
        f = t.filter(keep)
        if f.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        arr = pc.fill_null(f[text_col], "").combine_chunks()
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        cnt = np.diff(split.offsets.to_numpy(zero_copy_only=False))
        src = np.repeat(np.asarray(f[src_col].to_pylist(), dtype=object),
                        cnt)
        keep2 = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tb = pa.table({"source": pa.array(src[keep2], pa.string()),
                       "term": flat.filter(pa.array(keep2))})
        g = tb.group_by(["source", "term"]).aggregate([("term", "count")])
        return pa.table({"source": g["source"], "term": g["term"],
                         "n": pc.cast(g["term_count"], pa.int64())})

    agg = (ds.map_batches(counts, batch_format="pyarrow")
           .groupby(["source", "term"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    piv = agg.pivot_table(index="term", columns="source", values="n",
                          fill_value=0)
    a = piv.get(src_a, pd.Series(0, index=piv.index)).to_numpy(np.float64)
    b = piv.get(src_b, pd.Series(0, index=piv.index)).to_numpy(np.float64)
    p = a / a.sum()
    q = b / b.sum()
    m = 0.5 * (p + q)

    def kl(x, y):
        mask = x > 0
        return float((x[mask] * np.log(x[mask] / y[mask])).sum())

    js = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return pd.DataFrame({
        "source_a": [src_a], "source_b": [src_b],
        "n_terms": pd.array([len(piv)], dtype="int64"),
        "js_div": [round(js, round_to)],
    })


def wordlen_histogram(ds, *, text_col="text", max_len: int = 30):
    """Global token-length histogram (lengths above ``max_len`` clamp
    into the top bucket) — the tokenizer-health diagnostic that shows
    concatenation bugs as a long-length hump.

    Distributed shape: per-batch vectorized ``utf8_length`` + bincount
    partials (one (max_len)-wide row per batch), one tiny aggregate.
    Columns (token_len, n)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        split = pc.split_pattern_regex(arr, pattern="[\\t\\n\\f\\r ]+")
        flat = split.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        ln = np.minimum(
            np.asarray(pc.utf8_length(flat), dtype=np.int64), max_len)
        bc = np.bincount(ln, minlength=max_len + 1)
        cols = {f"b{i}": pa.array([np.int64(bc[i])], pa.int64())
                for i in range(1, max_len + 1)}
        return pa.table(cols)

    aggs = [Sum(f"b{i}", alias_name=f"b{i}")
            for i in range(1, max_len + 1)]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    lens = list(range(1, max_len + 1))
    ns = [int(row[f"b{i}"]) for i in lens]
    out = pd.DataFrame({"token_len": pd.array(lens, dtype="int64"),
                        "n": pd.array(ns, dtype="int64")})
    return out[out["n"] > 0].reset_index(drop=True)


def stopword_density_by_source(ds, *, text_col="text",
                               source_col="source",
                               high_thresh: float = 0.4,
                               round_to: int = 6):
    """Per-source stopword-density report: mean per-doc (en) stopword
    ratio and the fraction of docs above ``high_thresh`` — the
    boilerplate/navigational-text detector run per crawl source before
    mixing (a source whose docs are mostly stopwords is template
    chrome, not prose).

    Distributed shape: tokenization + membership are the same Arrow
    kernels as ``quality_scores`` (``_split_tokens`` + ``pc.is_in``);
    per-batch per-source partial sums shuffle (source, sums) rows
    only.  Columns (source, n_docs, mean_stop_ratio, high_frac)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    stop_set = pa.array(sorted(_EN_STOP), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        _, values, offs = _split_tokens(t[text_col])
        n_tok = np.diff(offs)
        is_stop = np.asarray(pc.is_in(values, value_set=stop_set))
        sw = _seg_sum(is_stop.astype(np.int64), offs)
        ratio = np.where(n_tok > 0, sw / np.maximum(n_tok, 1), 0.0)
        src = t[source_col].to_numpy(zero_copy_only=False)
        u, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(u.astype(str)),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
            "ratio_sum": pa.array(np.bincount(inv, weights=ratio),
                                  pa.float64()),
            "n_high": pa.array(
                np.bincount(inv, weights=(ratio > high_thresh)
                            .astype(np.float64)).astype(np.int64),
                pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("ratio_sum", alias_name="rs"),
                      Sum("n_high", alias_name="nh")).to_pandas())
    out = pd.DataFrame({
        "source": agg["source"],
        "n_docs": agg["n_docs"].astype("int64"),
        "mean_stop_ratio": (agg["rs"] / agg["n_docs"]).round(round_to),
        "high_frac": (agg["nh"] / agg["n_docs"]).round(round_to),
    })
    return out.sort_values("source").reset_index(drop=True)


def heaps_curve(ds, *, text_col="text", id_col="doc_id",
                thresholds=(1000, 2000, 5000, 10000, 20000, 50000,
                            100000, 200000, 500000, 1000000),
                range_size: int = 512):
    """Heaps-law vocabulary-growth curve: distinct terms seen within
    the first N tokens of the corpus (stream order = (doc_id, token
    position)) for each budget N — the vocabulary-scaling diagnostic a
    pretraining pipeline reads next to ``zipf_fit``/``vocab_stats``.

    Distributed shape (no global sort): global token positions come
    from a two-pass PREFIX SUM over fixed doc-id ranges (the
    ``pack_token_bins`` pattern — per-range token counts to the driver,
    cumulative offsets broadcast back, per-range local enumerate), the
    first occurrence of each term is a vocabulary-bounded
    ``groupby(term).min(gpos)``, and the curve is a |thresholds|-bin
    histogram + driver cumsum.  Block-boundary-independent by
    construction.  Columns (budget, n_distinct_terms)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min, Sum

    from .dedup import _strip_meta

    def count_tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, offs = _ws_split_re2(t[text_col])
        return pa.table({
            "_rng": pa.array(ids // range_size, pa.int64()),
            "n": pa.array(np.diff(offs), pa.int64()),
        })

    base = _strip_meta(ds.map_batches(
        lambda t: pa.table({id_col: t[id_col], text_col:
                            pc.fill_null(t[text_col].cast(pa.string()),
                                         "")}),
        batch_format="pyarrow")).materialize()
    sums = (base.map_batches(count_tag, batch_format="pyarrow")
            .groupby("_rng").aggregate(Sum("n", alias_name="s"))
            .to_pandas().sort_values("_rng"))
    offsets = dict(zip(sums["_rng"].astype(int),
                       (sums["s"].cumsum() - sums["s"]).astype(int)))
    ref = ray.put(offsets)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_rng", pa.array(ids // range_size,
                                                pa.int64()))

    def emit_first(g: pd.DataFrame) -> pa.Table:
        off = ray.get(ref)[int(g["_rng"].iloc[0])]
        g = g.sort_values(id_col, kind="mergesort")
        col = pa.array(g[text_col].tolist(), pa.string())
        values, offs = _ws_split_re2(col)
        if len(values) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "gpos": pa.array([], pa.int64())})
        gpos = off + np.arange(len(values), dtype=np.int64)
        # map-side combine: per-range first occurrence per term
        d = values.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        first = order[np.concatenate(
            [[True], codes[order][1:] != codes[order][:-1]])]
        return pa.table({
            "term": pc.cast(d.dictionary.take(
                pa.array(codes[first], pa.int64())), pa.string()),
            "gpos": pa.array(gpos[first], pa.int64()),
        })

    firsts = (base.map_batches(tag, batch_format="pyarrow")
              .groupby("_rng").map_groups(emit_first,
                                          batch_format="pandas"))
    fp = (_strip_meta(firsts).groupby("term")
          .aggregate(Min("gpos", alias_name="fp")))

    thr = np.asarray(sorted(thresholds), dtype=np.int64)

    def hist(t: pa.Table) -> pa.Table:
        f = t["fp"].to_numpy(zero_copy_only=False)
        # bin b = first threshold index with fp < thr[b]
        b = np.searchsorted(thr, f, side="right")
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hg = (fp.map_batches(hist, batch_format="pyarrow")
          .groupby("b").aggregate(Sum("c", alias_name="c")).to_pandas())
    counts = np.zeros(thr.size + 1, np.int64)
    for b, c in zip(hg["b"].astype(int), hg["c"].astype(int)):
        counts[b] = c
    cum = np.cumsum(counts)
    return pd.DataFrame({
        "budget": pd.array(thr, dtype="int64"),
        "n_distinct_terms": pd.array(cum[:thr.size], dtype="int64"),
    })


def term_burstiness(ds, *, text_col="text", id_col="doc_id", k=50,
                    round_to=6):
    """Per-term BURSTINESS (Fano factor Var(tf)/Mean(tf) over the docs
    containing the term) for the ``k`` highest-df terms — the classic
    content-vs-function-word signal (bursty terms concentrate in few
    docs; function words spread evenly), a corpus diagnostic next to
    ``zipf_fit``.

    Distributed shape: the vectorized (doc, term, tf) explode
    (:func:`_doc_term_tf`) feeds map-side per-term moment partials
    (count, Σtf, Σtf²), one vocabulary-bounded groupby-sum, then a
    distributed (df DESC, term) ``sort.limit(k)`` — only the fitted
    head reaches the driver.  Population variance, rounded to
    ``round_to`` like the SQL.  Columns (term, df, mean_tf,
    burstiness)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _strip_meta

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        values, offs = _ws_split_re2(t[text_col])
        _, terms, tf = _doc_term_tf(ids, values, offs)
        tff = tf.astype(np.float64)
        return pa.table({
            "term": pc.cast(terms, pa.string()),
            "n": pa.array(np.ones(len(tf), np.int64)),
            "s1": pa.array(tff, pa.float64()),
            "s2": pa.array(tff * tff, pa.float64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        # map-side per-batch moment combine before the shuffle
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        d = terms.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        n = np.bincount(codes, weights=t["n"].to_numpy(
            zero_copy_only=False).astype(np.float64))
        s1 = np.bincount(codes, weights=t["s1"].to_numpy(
            zero_copy_only=False))
        s2 = np.bincount(codes, weights=t["s2"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "term": pc.cast(d.dictionary, pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "s1": pa.array(s1, pa.float64()),
            "s2": pa.array(s2, pa.float64()),
        })

    agg = (_strip_meta(ds.map_batches(explode, batch_format="pyarrow")
                       .map_batches(combine, batch_format="pyarrow"))
           .groupby("term")
           .aggregate(Sum("n", alias_name="df"),
                      Sum("s1", alias_name="s1"),
                      Sum("s2", alias_name="s2"))
           .sort(["df", "term"], descending=[True, False])
           .limit(k).to_pandas())
    n = agg["df"].to_numpy(np.float64)
    s1 = agg["s1"].to_numpy(np.float64)
    s2 = agg["s2"].to_numpy(np.float64)
    mean = s1 / n
    var = s2 / n - mean * mean
    return pd.DataFrame({
        "term": agg["term"],
        "df": agg["df"].astype("int64"),
        "mean_tf": np.round(mean, round_to),
        "burstiness": np.round(var / mean, round_to),
    })
