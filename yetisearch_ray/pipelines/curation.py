"""Corpus-curation operators: per-group quotas (domain caps), sequence
packing (token-bin assignment), PII scanning/redaction, and
deterministic hash splits.

Scale shapes are the point here: quotas bound the shuffle by the quota
(map-side partial top-n per group), not by the hot domain's size; the
packing prefix sum runs over fixed ID ranges so the only driver-side
table is one row per range and results never depend on Ray block
boundaries; PII scan/redact and hash-split are embarrassingly parallel
``map_batches`` with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_token_bins(ds, *, budget: int = 2048, id_col: str = "doc_id",
                    tok_col: str = "n_tokens", range_size: int = 4096):
    """Greedy contiguous sequence packing: assign each doc (ordered by
    id) to token bin ``floor(prefix_sum_before / budget)`` — the sample
    packing step that turns a curated corpus into ~budget-token training
    sequences.

    Distributed prefix sum, two passes over fixed ID RANGES (not Ray
    blocks, so the result is independent of block boundaries):
    pass 1 computes per-range token sums (one tiny row per
    ``range_size`` ids — the only driver-side table, N/range_size rows;
    raise range_size at scale), whose cumsum gives each range's global
    offset, broadcast via ``ray.put``; pass 2 is a per-range
    ``map_groups`` local cumsum + offset.  Returns (id, bin_id) sorted
    by id; SQL equivalent is a window prefix sum.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def tag(t: pa.Table) -> pa.Table:
        rng = (t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
               // range_size)
        return t.append_column("_rng", pa.array(rng, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    sums = (tagged.groupby("_rng").aggregate(Sum(tok_col, alias_name="s"))
            .to_pandas().sort_values("_rng"))
    offsets = dict(zip(sums["_rng"].astype(int),
                       (sums["s"].cumsum() - sums["s"]).astype(int)))
    off_ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bin_id": pa.array([], pa.int64())})
        off = ray.get(off_ref)[int(t["_rng"][0].as_py())]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = t[tok_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        csum_before = np.cumsum(toks[order]) - toks[order]
        bins = (off + csum_before) // budget
        return pa.table({id_col: pa.array(ids[order].astype(np.int64), pa.int64()),
                         "bin_id": pa.array(bins, pa.int64())})

    out = tagged.groupby("_rng").map_groups(assign, batch_format="pyarrow")
    return out.sort(id_col)


def quota_per_group(ds, *, group_col: str = "source", n: int = 5,
                    id_col: str = "doc_id"):
    """Keep the first ``n`` rows per group (ordered by ``id_col``) —
    deterministic domain-quota sampling.

    Equivalent SQL: ``QUALIFY row_number() OVER (PARTITION BY group
    ORDER BY id) <= n``.  Returns (id, group) sorted by id.
    """

    # Ray's sort-based groupby cannot compare None with str, so NULL
    # groups ride a non-null sentinel key (kept out of the output);
    # SQL's PARTITION BY treats NULLs as one partition, and so does this.
    _NULL_KEY = "\x00<null-group>"

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([id_col, group_col]).to_pandas()
        df["_gkey"] = df[group_col].fillna(_NULL_KEY)
        df = (df.sort_values(["_gkey", id_col], kind="stable")
              .groupby("_gkey", sort=False).head(n))
        return pa.Table.from_pandas(df, preserve_index=False)\
            .replace_schema_metadata(None)

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().drop(columns=["_gkey"])
              .sort_values(id_col, kind="stable").head(n))
        return pa.Table.from_pandas(df, preserve_index=False)\
            .replace_schema_metadata(None)

    cands = ds.map_batches(partial, batch_format="pyarrow")
    kept = cands.groupby("_gkey").map_groups(final, batch_format="pyarrow")
    return kept.sort(id_col)


# ------------------------------------------------------------------ PII
#
# RE2 patterns shared verbatim by the Arrow kernels AND the DuckDB
# oracles (both engines are RE2-based, so non-overlapping leftmost
# match counts and global replacement agree exactly).  Kept simple on
# purpose: the point is the distributed scan/redact plumbing; a
# production deployment swaps in its own pattern registry.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}",
}


def seed_pii_column(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministically append synthetic PII to a fraction of docs
    (keyed on ``id_col`` residues) so PII operators have non-trivial
    ground truth over the digit-free synthetic corpus.  The identical
    injection is expressible in SQL (string concat on the same
    residues), which is what makes the PII entries oracle-checkable.
    Test/benchmark seeding only — not part of the production pipeline.
    """

    def seed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        txt = t[text_col].to_pylist()
        out = []
        for i, s in zip(ids, txt):
            s = s or ""
            i = int(i)
            if i % 7 == 0:
                s += f" contact{i}@example.com"
            if i % 11 == 0:
                s += f" host 10.{i % 200}.0.{i % 250}"
            if i % 13 == 0:
                s += f" call +1-555-{100 + i % 900}-{1000 + i % 9000}"
            out.append(s)
        return t.set_column(t.column_names.index(text_col), text_col,
                            pa.array(out, pa.string()))

    return ds.map_batches(seed, batch_format="pyarrow")


def pii_scan(ds, *, text_col: str = "text", id_col: str = "doc_id",
             patterns: dict | None = None):
    """Per-doc PII match counts — one ``pc.count_substring_regex``
    (RE2, vectorized, zero-copy Arrow) per pattern, no shuffle.
    Returns (id, n_<kind>..., has_pii) sorted by id.
    """
    pats = patterns or PII_PATTERNS

    def scan(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        total = None
        # null-typed blocks (all-null text) need an explicit string cast
        # before the regex kernel; null rows must scan as 0 matches
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        for kind, pat in pats.items():
            n = pc.count_substring_regex(txt, pat).cast(pa.int64())
            cols[f"n_{kind}"] = n
            total = n if total is None else pc.add(total, n)
        cols["has_pii"] = pc.cast(pc.greater(total, 0), pa.int64())
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow").sort(id_col)


def pii_redact(ds, *, text_col: str = "text", id_col: str = "doc_id",
               patterns: dict | None = None):
    """Global PII redaction: each pattern's matches replaced with
    ``[<KIND>]`` via ``pc.replace_substring_regex`` (RE2 global
    replace).  Returns (id, text_redacted, redacted_md5) sorted by id —
    the md5 column lets an oracle pin the full redacted text without
    shipping it through the compare."""
    import hashlib

    pats = patterns or PII_PATTERNS

    def redact(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col].cast(pa.string()), "")
        for kind, pat in pats.items():
            s = pc.replace_substring_regex(s, pat, f"[{kind.upper()}]")
        md5s = [hashlib.md5((v or "").encode("utf-8")).hexdigest()
                for v in s.to_pylist()]
        return pa.table({id_col: t[id_col], "text_redacted": s,
                         "redacted_md5": pa.array(md5s, pa.string())})

    return ds.map_batches(redact, batch_format="pyarrow").sort(id_col)


# ----------------------------------------------------------- hash split


def hash_split(ds, *, id_col: str = "doc_id",
               fractions: tuple = (0.8, 0.1, 0.1),
               names: tuple = ("train", "val", "test"),
               buckets: int = 1000):
    """Deterministic train/val/test assignment: bucket =
    ``md5_u64(str(id)) % buckets`` (the repo's DuckDB-replicable
    ``md5_number_lower`` idiom, see dedup._md5_u64_tokens), split by
    cumulative fraction thresholds.  Stable across runs, machines and
    block boundaries — the property random_shuffle-based splits lack.
    Zero shuffle; returns (id, bucket, split) sorted by id.
    """
    import numpy as np

    from .dedup import _md5_u64_tokens

    edges = []
    acc = 0.0
    for f in fractions:
        acc += f
        edges.append(int(round(acc * buckets)))
    edges[-1] = buckets  # close rounding gaps

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = (_md5_u64_tokens(np.array([str(int(i)) for i in ids],
                                      dtype=object)) % buckets).astype(np.int64)
        split = np.empty(b.size, dtype=object)
        lo = 0
        for name, hi in zip(names, edges):
            split[(b >= lo) & (b < hi)] = name
            lo = hi
        return pa.table({id_col: t[id_col],
                         "bucket": pa.array(b, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow").sort(id_col)


# ------------------------------------------------------ composed pipeline


def curate_corpus(ds, *, lang: str | None = "en", min_quality: float = 0.3,
                  minhash_threshold: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id", num_partitions: int | None = None,
                  loser_broadcast_threshold: int = 1_000_000):
    """The composed curation pipeline a pre-training corpus runs
    end-to-end: language filter → quality gate → exact-dedup survivors
    → near-dup (MinHash) cluster survivors.  Returns the surviving full
    rows sorted by id.

    Composition of the individually-oracled operators, with the scale
    shapes they already carry: the lang filter is a pushdown-friendly
    predicate, the quality gate is a vectorized scan + id semi-join,
    exact dedup shuffles (hash, id) pairs only.  The near-dup survivor
    filter is size-switched like :func:`..dedup.connected_components`:
    below ``loser_broadcast_threshold`` loser ids it broadcasts the set
    (``ray.put`` once + vectorized ``np.isin`` per batch); above it —
    web-scale corpora lose 30-50% of docs to near-dup, so the loser set
    is O(N) — it runs a distributed ``left_anti`` hash join on the id
    (the :func:`..dedup.exact_dedup_incremental` shape), so no O(N)
    array ever reaches the driver or rides every task.  One materialize
    pins the deduped set so the cluster pass and the final filter don't
    recompute it.
    """
    import ray

    from . import dedup as dd
    from .textstats import quality_scores

    if lang is not None:
        ds = ds.filter(expr=f"lang == '{lang}'")
    keep = (quality_scores(ds, text_col=text_col, id_col=id_col)
            .filter(expr=f"quality >= {min_quality}")
            .select_columns([id_col]))
    nparts = dd._default_join_partitions(num_partitions)
    gated = dd._strip_meta(ds).join(dd._join_ready(keep, nparts),
                                    "left_semi", nparts, on=(id_col,))
    deduped = dd.exact_dedup_rows(gated, text_col=text_col, id_col=id_col,
                                  num_partitions=nparts).materialize()
    clusters = dd.minhash_dedup_clusters(
        deduped, threshold=minhash_threshold,
        text_col=text_col, id_col=id_col)

    def losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["doc_id"], t["cluster_id"]))
        return pa.table({id_col: t["doc_id"]})

    import numpy as np

    # Loser set is output-bounded (subset of verified pair members), so
    # pinning it is cheap; count() decides broadcast vs anti-join.
    losers_ds = (clusters.map_batches(losers, batch_format="pyarrow")
                 .materialize())
    n_losers = losers_ds.count()
    if n_losers == 0:
        return deduped.sort(id_col)
    if n_losers > loser_broadcast_threshold:
        out = deduped.join(dd._join_ready(losers_ds, nparts),
                           "left_anti", nparts, on=(id_col,))
        return out.sort(id_col)

    loser_ids = np.sort(
        losers_ds.to_pandas()[id_col].to_numpy(np.int64))
    ref = ray.put(loser_ids)

    def drop(t: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, bad), pa.bool_()))

    return deduped.map_batches(drop, batch_format="pyarrow").sort(id_col)


def stratified_sample(ds, *, rates: dict, default_rate: float = 1.0,
                      group_col: str = "source", id_col: str = "doc_id",
                      buckets: int = 10_000):
    """Deterministic per-group Bernoulli sampling — the source-reweighting
    step of corpus mixing: keep a row iff ``md5_u64(str(id)) % buckets <
    rate(group) * buckets``.  Same md5 idiom as :func:`hash_split`, so
    membership is stable across runs/machines/block boundaries and
    SQL-oracle-checkable; zero shuffle (the rate table is a tiny closure
    constant).  Returns surviving full rows sorted by id.
    """
    import numpy as np

    from .dedup import _md5_u64_tokens

    thresholds = {g: int(round(r * buckets)) for g, r in rates.items()}
    default_thr = int(round(default_rate * buckets))

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = _md5_u64_tokens(np.array([str(int(i)) for i in ids],
                                     dtype=object)) % buckets
        thr = np.array([thresholds.get(g, default_thr)
                        for g in t[group_col].to_pylist()], np.int64)
        return t.filter(pa.array(b < thr, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow").sort(id_col)


def rebalance_mix(ds, *, targets: dict, group_col: str = "source",
                  id_col: str = "doc_id", buckets: int = 10_000):
    """Rebalance the corpus to TARGET source proportions (the domain-mix
    step of pretraining data curation, cf. The Pile / DoReMi mixture
    weights): measure per-group counts, find the largest feasible total
    ``T = min_g(count_g / p_g)`` that achieves the exact mix without
    upsampling, then keep each group at rate ``p_g * T / count_g`` via
    the deterministic md5-bucket Bernoulli (same idiom as
    :func:`hash_split` — stable across runs/machines/block splits and
    SQL-replicable).  Groups absent from ``targets`` are dropped.

    Phase 1 is a tiny groupby (one row per group reaches the driver);
    phase 2 is a zero-shuffle vectorized scan filter.  Returns
    surviving full rows sorted by id.
    """
    import numpy as np

    from .dedup import _md5_u64_tokens

    counts = {r[group_col]: int(r["count()"]) for r in
              ds.groupby(group_col).count().take_all()}
    # largest total that achieves the exact mix without upsampling
    t_feasible = min(counts[g] / p for g, p in targets.items()
                     if p > 0 and g in counts)
    thresholds = {g: int(np.floor(p * t_feasible / counts[g]
                                  * buckets + 0.5))
                  for g, p in targets.items() if g in counts}

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = _md5_u64_tokens(np.array([str(int(i)) for i in ids],
                                     dtype=object)) % buckets
        thr = np.array([thresholds.get(g, 0)
                        for g in t[group_col].to_pylist()], np.int64)
        return t.filter(pa.array(b < thr, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow").sort(id_col)


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", Appendix A1.1 quality heuristics) — fixed so the SQL
# oracle can embed identical values.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that",
                         "have", "with")
GOPHER_MIN_REQUIRED = 2
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3


def gopher_rules(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 min_required: int = GOPHER_MIN_REQUIRED):
    """Gopher quality-filter rules (Rae et al. 2021 App. A1.1) as one
    vectorized zero-shuffle scan: per-doc word count bounds, mean word
    length bounds, symbol-to-word ratio ('#' and '...'), fraction of
    words containing an alphabetic character, presence of >= 2 required
    English stopwords, and bullet/ellipsis line-ratio caps.  Returns the
    measured features plus per-rule booleans and the overall
    ``gopher_pass``.

    Everything is Arrow/numpy kernels over RE2-compatible ASCII-\\s+
    tokens and chr(10) lines, so the DuckDB oracle
    (:data:`oracles.GOPHER_RULES_SQL`) reproduces every intermediate
    bit-for-bit (ratios are IEEE divisions compared raw — no rounding
    enters the rule outcomes).
    """
    import numpy as np

    from .textstats import _seg_sum

    req_set = pa.array(sorted(GOPHER_REQUIRED_WORDS), pa.string())

    def _split(col, pattern):
        arr = pc.fill_null(col, "").combine_chunks()
        parts = pc.split_pattern_regex(arr, pattern=pattern)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        values = parts.flatten()
        offs = np.asarray(parts.offsets, dtype=np.int64)
        offs = offs - offs[0]
        return arr, values, offs

    def fn(t: pa.Table) -> pa.Table:
        # --- words: RE2 \s+ split, empties elided (re-segment like
        # textstats._split_tokens)
        arr, words, offs = _split(t[text_col], r"\s+")
        nonempty = np.asarray(pc.not_equal(words, "")).astype(np.int64)
        n_words = _seg_sum(nonempty, offs)
        words = words.filter(pa.array(nonempty.astype(bool)))
        offs = np.concatenate([[0], np.cumsum(n_words, dtype=np.int64)])

        wl = np.asarray(pc.utf8_length(words), dtype=np.int64)
        char_sum = _seg_sum(wl, offs)
        nz = np.maximum(n_words, 1)
        mean_len = np.where(n_words > 0, char_sum / nz, 0.0)

        has_alpha = np.asarray(
            pc.match_substring_regex(words, "[a-zA-Z]")).astype(np.int64)
        alpha_ratio = np.where(n_words > 0, _seg_sum(has_alpha, offs) / nz,
                               0.0)

        lower = pc.utf8_lower(words)
        is_req = np.asarray(pc.is_in(lower, value_set=req_set))
        req_idx = np.asarray(
            pc.index_in(lower, value_set=req_set).fill_null(-1),
            dtype=np.int64)
        # distinct required words per doc: scatter per-doc bitmask
        doc_of = np.repeat(np.arange(len(n_words)), n_words)
        masks = np.zeros(len(n_words), np.int64)
        hit = is_req & (req_idx >= 0)
        np.bitwise_or.at(masks, doc_of[hit], np.int64(1) << req_idx[hit])
        n_required = np.array([bin(m).count("1") for m in masks.tolist()],
                              np.int64)

        # symbols: non-overlapping '#' and '...' occurrences in raw text
        n_hash = np.asarray(pc.count_substring(arr, "#"), dtype=np.int64)
        n_ell = np.asarray(pc.count_substring_regex(arr, r"\.\.\."),
                           dtype=np.int64)
        symbol_ratio = np.where(n_words > 0, (n_hash + n_ell) / nz, 0.0)

        # --- lines: chr(10) split, keep empties (both engines agree)
        _, lines, loffs = _split(t[text_col], r"\n")
        n_lines = np.diff(loffs)
        lnz = np.maximum(n_lines, 1)
        is_bullet = np.asarray(
            pc.match_substring_regex(lines, r"^\s*(-|•)")
        ).astype(np.int64)
        ends_ell = np.asarray(
            pc.match_substring_regex(lines, r"\.\.\.$")).astype(np.int64)
        bullet_ratio = _seg_sum(is_bullet, loffs) / lnz
        ellipsis_ratio = _seg_sum(ends_ell, loffs) / lnz

        ok_words = ((n_words >= GOPHER_MIN_WORDS)
                    & (n_words <= GOPHER_MAX_WORDS))
        ok_mean = ((mean_len >= GOPHER_MIN_MEAN_LEN)
                   & (mean_len <= GOPHER_MAX_MEAN_LEN))
        ok_symbol = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
        ok_alpha = alpha_ratio >= GOPHER_MIN_ALPHA_RATIO
        ok_required = n_required >= min_required
        ok_bullet = bullet_ratio <= GOPHER_MAX_BULLET_RATIO
        ok_ellipsis = ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO
        gpass = (ok_words & ok_mean & ok_symbol & ok_alpha & ok_required
                 & ok_bullet & ok_ellipsis)

        def f64(x):
            return pa.array(x, pa.float64())

        def b(x):
            return pa.array(x, pa.bool_())

        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": f64(mean_len),
            "symbol_ratio": f64(symbol_ratio),
            "alpha_word_ratio": f64(alpha_ratio),
            "n_required_words": pa.array(n_required, pa.int64()),
            "bullet_ratio": f64(bullet_ratio),
            "ellipsis_ratio": f64(ellipsis_ratio),
            "ok_words": b(ok_words), "ok_mean_len": b(ok_mean),
            "ok_symbol": b(ok_symbol), "ok_alpha": b(ok_alpha),
            "ok_required": b(ok_required), "ok_bullet": b(ok_bullet),
            "ok_ellipsis": b(ok_ellipsis), "gopher_pass": b(gpass),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort(id_col)


# seeded lines for the C4 cleaner — the synthetic corpus has no
# newlines/punctuation, so (like seed_pii_column) we deterministically
# append structured lines keyed on doc_id residues; the identical
# injection is expressible in SQL, which makes the entry oracle-checkable.
C4_SEED_LINES = (
    (2, "Even documents receive an extra terminal sentence here."),
    (3, "This supplementary sentence ends with a period."),
    (4, "Another properly terminated seeded sentence appears here!"),
    (5, "short line."),
    (7, "no terminal punctuation in this seeded line"),
    (11, "this javascript line would be removed by the filter."),
    (13, "Lorem ipsum dolor sit amet consectetur adipiscing."),
    (17, "config = { render(); }"),
)


def seed_lines_column(ds, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Deterministically restructure docs into multi-line text with
    varied punctuation (keyed on ``id_col`` residues) so the C4 line
    cleaner has non-trivial ground truth.  Odd ids get a terminal '.'
    on the base line; residue classes append the fixed
    :data:`C4_SEED_LINES`.  Test/benchmark seeding only."""

    def seed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out = []
        for i, s in zip(ids, t[text_col].to_pylist()):
            s = s or ""
            i = int(i)
            if i % 2 == 1:
                s += "."
            for mod, line in C4_SEED_LINES:
                if i % mod == 0:
                    s += "\n" + line
            out.append(s)
        return t.set_column(t.column_names.index(text_col), text_col,
                            pa.array(out, pa.string()))

    return ds.map_batches(seed, batch_format="pyarrow")


def c4_line_clean(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  min_words: int = 5, min_kept_lines: int = 3):
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as one vectorized
    zero-shuffle scan: retain only lines that end in a terminal
    punctuation mark (``. ! ? "``), contain >= ``min_words`` RE2-\\s+
    words, and do not contain the word ``javascript`` (case-folded,
    word-bounded); drop the whole page if it contains ``lorem ipsum``
    (case-folded), a curly brace ``{``, or fewer than ``min_kept_lines``
    retained lines.  Returns (id, n_lines, n_kept, doc_keep, clean_md5)
    where clean_md5 hashes the newline-joined retained lines (compact,
    hash-comparable contract — same as dedup.line_dedup).

    Line splitting, filtering and re-joining are Arrow kernels
    (``split_pattern`` → boolean masks → ``ListArray`` rebuild →
    ``binary_join``); only the final md5 is per-doc Python (16-byte
    digest over the already-reduced clean text).
    """
    import hashlib

    import numpy as np

    from .textstats import _seg_sum

    def fn(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col].cast(pa.string()), "").combine_chunks()
        parts = pc.split_pattern(arr, "\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        lines = parts.flatten()
        offs = np.asarray(parts.offsets, dtype=np.int64)
        offs = offs - offs[0]
        n_lines = np.diff(offs)

        low = pc.utf8_lower(lines)
        endp = np.asarray(pc.match_substring_regex(lines, r'[.!?"]$'))
        nw = np.asarray(pc.count_substring_regex(lines, r"\S+"),
                        dtype=np.int64)
        js = np.asarray(pc.match_substring_regex(low, r"\bjavascript\b"))
        keep_line = endp & (nw >= min_words) & ~js

        kept_vals = lines.filter(pa.array(keep_line))
        n_kept = _seg_sum(keep_line.astype(np.int64), offs)
        new_offs = np.concatenate([[0],
                                   np.cumsum(n_kept, dtype=np.int64)])
        la = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                      kept_vals)
        clean = pc.binary_join(la, "\n")

        lorem = np.asarray(pc.match_substring(pc.utf8_lower(arr),
                                              "lorem ipsum"))
        brace = np.asarray(pc.match_substring(arr, "{"))
        doc_keep = ~lorem & ~brace & (n_kept >= min_kept_lines)
        md5 = [hashlib.md5(s.encode()).hexdigest()
               for s in clean.to_pylist()]
        return pa.table({
            id_col: t[id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "doc_keep": pa.array(doc_keep, pa.bool_()),
            "clean_md5": pa.array(md5, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort(id_col)


def export_training_sequences(ds, *, seq_len: int = 128,
                              vocab_size: int = 65535,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              range_size: int = 4096,
                              seqs_per_bucket: int = 256,
                              out_dir: str | None = None):
    """The terminal step of an LLM data pipeline: turn curated docs into
    fixed-length token-ID training sequences (GPT-2/Megatron style).
    Docs are tokenized with the BPE-ish pretokenizer
    (:data:`textstats.BPE_ISH_PATTERN`), mapped to ids via the hashing
    trick (md5 low-64 mod ``vocab_size``; id ``vocab_size`` is the
    reserved EOD appended after every doc), concatenated in doc-id
    order, and chunked into ``seq_len``-token sequences (trailing
    partial dropped).

    Scale shape (block-boundary independent, same fixed-ID-range
    prefix-sum idiom as :func:`pack_token_bins`): pass 1 aggregates one
    token-count row per ``range_size``-id range (the only driver-side
    table) whose cumsum gives each range's global token offset,
    broadcast via ``ray.put``; pass 2 re-tokenizes per range and packs
    its (seq_id, pos, tid) tokens into ONE Arrow-IPC blob per
    ``seqs_per_bucket``-sequence BUCKET (tokens of a range are
    contiguous in global position, so a range touches only a
    contiguous run of buckets) — the exchange moves O(blob) rows, not
    O(tokens) tuples (the ``index/build.py`` combine idiom); pass 3 is
    a ``groupby(bucket)`` assembly that unpacks, lexsorts and hashes
    ALL of a bucket's sequences in one vectorized call (the
    ``events.time_weighted_avg`` bucket idiom).  Each token still
    crosses the exchange exactly once.  Returns (seq_id, first_tid,
    tokens_md5) — md5 of the comma-joined ids, the compact
    hash-comparable contract — sorted by seq_id; with ``out_dir`` the
    rows are also written as partitioned parquet.
    """
    import re

    import numpy as np
    import ray

    from .dedup import _md5_u64_tokens
    from .textstats import BPE_ISH_PATTERN

    bpe = re.compile(BPE_ISH_PATTERN)
    eod = np.int64(vocab_size)

    def _range_tids(texts: list) -> "np.ndarray":
        # Per-doc findall is the pure-Python floor (tokens must not
        # cross doc boundaries); everything after it — the md5 token
        # hashing and the EOD interleave — is ONE vectorized pass over
        # the whole range instead of a per-doc loop.
        tok_lists = [bpe.findall(s or "") for s in texts]
        counts = np.array([len(l) + 1 for l in tok_lists], np.int64)
        total = int(counts.sum())
        out = np.full(total, eod, np.int64)
        flat = [tok for l in tok_lists for tok in l]
        if flat:
            ids = (_md5_u64_tokens(np.array(flat, object))
                   % vocab_size).astype(np.int64)
            mask = np.ones(total, bool)
            mask[np.cumsum(counts) - 1] = False  # EOD slots
            out[mask] = ids
        return out

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        arr = _pc.fill_null(t[text_col].cast(pa.string()), "")
        # +1: the EOD token after every doc
        n = pc.add(pc.count_substring_regex(arr, BPE_ISH_PATTERN), 1)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         text_col: arr,
                         "_rng": pa.array(ids // range_size, pa.int64()),
                         "_ntok": n.cast(pa.int64())})

    from ray.data.aggregate import Sum

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    sums = (tagged.groupby("_rng").aggregate(Sum("_ntok", alias_name="s"))
            .to_pandas().sort_values("_rng"))
    offsets = dict(zip(sums["_rng"].astype(int),
                       (sums["s"].cumsum() - sums["s"]).astype(int)))
    off_ref = ray.put(offsets)

    tok_schema = pa.schema([("seq_id", pa.int64()),
                            ("pos", pa.int64()),
                            ("tid", pa.int64())])

    def emit(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names or t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "blob": pa.array([], pa.large_binary())})
        off = ray.get(off_ref)[int(t["_rng"][0].as_py())]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        texts = t[text_col].to_pylist()
        tids = _range_tids([texts[i] for i in order])
        gpos = off + np.arange(tids.size, dtype=np.int64)
        toks = pa.table({"seq_id": pa.array(gpos // seq_len, pa.int64()),
                         "pos": pa.array(gpos % seq_len, pa.int64()),
                         "tid": pa.array(tids, pa.int64())},
                        schema=tok_schema)
        # MAP-SIDE COMBINE: one IPC blob per bucket (gpos is sorted,
        # so buckets form contiguous runs — slice, don't group).
        buck = (gpos // seq_len) // seqs_per_bucket
        bstarts = np.flatnonzero(np.r_[True, buck[1:] != buck[:-1]])
        bends = np.append(bstarts[1:], buck.size)
        bucks, blobs = [], []
        for s, e in zip(bstarts, bends):
            sl = toks.slice(s, e - s)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, tok_schema) as w:
                w.write_table(sl)
            bucks.append(int(buck[s]))
            blobs.append(sink.getvalue().to_pybytes())
        return pa.table({"bucket": pa.array(bucks, pa.int64()),
                         "blob": pa.array(blobs, pa.large_binary())})

    import hashlib

    def assemble(g: pa.Table) -> pa.Table:
        tabs = [pa.ipc.open_stream(b.as_py()).read_all()
                for b in g["blob"]]
        t = pa.concat_tables(tabs)
        seq = t["seq_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        tid = t["tid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, seq))
        seq, tid = seq[order], tid[order]
        starts = np.flatnonzero(np.r_[True, seq[1:] != seq[:-1]])
        ends = np.append(starts[1:], seq.size)
        full = (ends - starts) == seq_len  # trailing partial dropped
        strs = tid.astype(np.str_)  # vectorized int→decimal
        md5s = [hashlib.md5(",".join(strs[s:e]).encode()).hexdigest()
                for s, e, f in zip(starts, ends, full) if f]
        return pa.table({
            "seq_id": pa.array(seq[starts[full]], pa.int64()),
            "first_tid": pa.array(tid[starts[full]], pa.int64()),
            "tokens_md5": pa.array(md5s, pa.string()),
        })

    from .dedup import _strip_meta

    out = _strip_meta(
        tagged.groupby("_rng").map_groups(emit, batch_format="pyarrow")
        .groupby("bucket").map_groups(assemble, batch_format="pyarrow")
    ).sort("seq_id")
    if out_dir is not None:
        out.write_parquet(out_dir)
    return out


def curate_corpus_v2(ds, *, targets: dict | None = None,
                     min_required: int = 1, minhash_threshold: float = 0.5,
                     seq_len: int = 1024, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_partitions: int | None = None,
                     return_docs: bool = False,
                     loser_broadcast_threshold: int = 1_000_000):
    """The modern LLM curation DAG, end-to-end on Ray Data: Gopher rule
    gate (Rae et al. 2021) → CCNet perplexity-tail drop (Wenzek et al.
    2020) → MinHash near-dup clusters with QUALITY-argmax survivors →
    domain-mix rebalance (optional) → fixed-length training-sequence
    export.  Composition of the individually-SQL-oracled operators;
    the composition itself is pinned by a pytest that replays the
    stages through the public API.

    Scale shapes preserved from the pieces: the Gopher gate and CCNet
    bucket filters are id semi-joins of flag scans (both sides shuffle
    by id, nothing collects); the near-dup LOSER set (cluster members
    minus quality winners) is computed as a distributed left_anti and
    size-switched like :func:`curate_corpus` — broadcast below
    ``loser_broadcast_threshold`` ids, distributed left_anti drop
    above it, so no O(N) array ever reaches the driver at web scale
    where near-dup losers are 30-50% of docs; rebalance is a
    zero-shuffle Bernoulli
    scan; the export's only driver table is one count row per id range.
    Returns the sequence table (or the surviving doc rows when
    ``return_docs``).
    """
    import numpy as np

    from . import dedup as dd
    from .textstats import ccnet_ppl_buckets

    nparts = dd._default_join_partitions(num_partitions)

    gop = (gopher_rules(ds, text_col=text_col, id_col=id_col,
                        min_required=min_required)
           .filter(expr="gopher_pass == True")
           .select_columns([id_col]))
    # materialize between stages: each stage's JoinOperator spawns its
    # own hash-shuffle aggregator pool, and chaining 3-4 joins into ONE
    # streaming plan can starve the pools of CPUs on small sessions
    # (observed livelock at num_cpus=4); stage boundaries also give the
    # DAG resumable checkpoints.
    gated = (dd._strip_meta(ds)
             .join(dd._join_ready(gop, nparts), "left_semi", nparts,
                   on=(id_col,))
             .materialize())

    ok = (ccnet_ppl_buckets(gated, text_col=text_col, id_col=id_col,
                            as_dataset=True)
          .filter(expr="ppl_bucket != 'tail'")
          .select_columns([id_col]))
    fluent = (dd._strip_meta(gated)
              .join(dd._join_ready(ok, nparts), "left_semi", nparts,
                    on=(id_col,))
              .materialize())

    clusters_ds = dd.minhash_dedup_clusters(
        fluent, threshold=minhash_threshold,
        text_col=text_col, id_col=id_col).materialize()
    winners_ds = dd.best_survivors(
        fluent, threshold=minhash_threshold, id_col=id_col,
        num_partitions=nparts, clusters=clusters_ds, as_dataset=True)

    # Losers = cluster members minus the per-cluster quality winners —
    # computed as a distributed left_anti on the id, never collected.
    def member_ids(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["doc_id"]})

    def winner_ids(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col]})

    losers_ds = (clusters_ds.map_batches(member_ids,
                                         batch_format="pyarrow")
                 .join(dd._join_ready(
                     winners_ds.map_batches(winner_ids,
                                            batch_format="pyarrow"),
                     nparts), "left_anti", nparts, on=(id_col,))
                 .materialize())

    import ray

    # Same size switch as curate_corpus: web-scale near-dup loses
    # 30-50% of docs, so the loser set is O(N) — broadcast only below
    # the threshold, else a distributed left_anti drop.
    n_losers = losers_ds.count()
    if n_losers == 0:
        kept = fluent
    elif n_losers > loser_broadcast_threshold:
        kept = dd._strip_meta(fluent).join(
            dd._join_ready(losers_ds, nparts), "left_anti", nparts,
            on=(id_col,))
    else:
        loser_ids = np.sort(
            losers_ds.to_pandas()[id_col].to_numpy(np.int64))
        ref = ray.put(loser_ids)

        def drop(t: pa.Table) -> pa.Table:
            bad = ray.get(ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(ids, bad), pa.bool_()))

        kept = fluent.map_batches(drop, batch_format="pyarrow")
    if targets:
        kept = rebalance_mix(kept, targets=targets, id_col=id_col)
    if return_docs:
        return kept.sort(id_col)
    return export_training_sequences(kept, seq_len=seq_len,
                                     text_col=text_col, id_col=id_col)


def quality_prune(ds, *, q: float = 0.7, text_col="text",
                  id_col="doc_id"):
    """Quality-quantile pruning: keep only docs whose composite quality
    score reaches the corpus's exact ``q``-th percentile — the
    keep-the-top-(1-q) curation gate, with the threshold computed
    EXACTLY and distributedly (histogram-narrowing percentile_disc, no
    global sort) rather than from a sample.

    Distributed shape: the vectorized quality pass feeds
    ``sketches.quantiles_disc`` for the threshold (log-pass narrowing),
    then a map-side filter re-streams the scored docs — the corpus
    never sorts and only surviving (doc_id, quality) rows leave.
    Columns (doc_id, quality)."""
    import pyarrow.compute as pc

    from .textstats import quality_scores
    from .sketches import quantiles_disc

    scored = quality_scores(ds, text_col=text_col, id_col=id_col)
    thr = float(quantiles_disc(scored, "quality", qs=(q,),
                               round_to=12)["value"].iloc[0])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t["quality"], thr)
        f = t.filter(m)
        return pa.table({id_col: f[id_col], "quality": f["quality"]})

    out = scored.map_batches(keep, batch_format="pyarrow").to_pandas()
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def datasheet(ds, *, text_col="text", id_col="doc_id"):
    """One-row corpus DATASHEET (the "datasheets for datasets" summary a
    training-data release ships): document count, language/source
    cardinalities, total whitespace tokens, exact-duplicate group
    count, and mean composite quality.

    Distributed shape: three aggregate-sized passes — (1) one
    vectorized count/token pass with map-side partials, (2) an
    md5-keyed dup groupby (hashes shuffle, never text), (3) the quality
    kernel reduced by one Mean — nothing but scalars reaches the
    driver.  Columns (n_docs, n_langs, n_sources, total_tokens,
    dup_groups, mean_quality)."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    from .textstats import quality_scores

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t[text_col], "").combine_chunks()
        ntok = pc.cast(pc.count_substring_regex(arr, pattern=r"\S+"),
                       pa.int64())
        return pa.table({"lang": t["lang"], "source": t["source"],
                         "n_tok": ntok})

    base = ds.map_batches(partial, batch_format="pyarrow")
    n_docs = base.count()
    total_tokens = int(base.sum("n_tok"))
    n_langs = base.groupby("lang").aggregate(Count(alias_name="_n")).count()
    n_sources = (base.groupby("source")
                 .aggregate(Count(alias_name="_n")).count())

    def hashes(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5((x or "").encode()).hexdigest()
              for x in t[text_col].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string())})

    dup_groups = int(
        ds.map_batches(hashes, batch_format="pyarrow")
        .groupby("h").aggregate(Count(alias_name="n"))
        .filter(expr="n > 1").count())
    mq = quality_scores(ds, text_col=text_col, id_col=id_col) \
        .aggregate(Mean("quality", alias_name="mq"))["mq"]
    return pd.DataFrame({
        "n_docs": pd.array([n_docs], dtype="int64"),
        "n_langs": pd.array([n_langs], dtype="int64"),
        "n_sources": pd.array([n_sources], dtype="int64"),
        "total_tokens": pd.array([total_tokens], dtype="int64"),
        "dup_groups": pd.array([dup_groups], dtype="int64"),
        "mean_quality": [round(float(mq), 6)],
    })


def dup_rate_by_source(ds, *, text_col="text", src_col="source",
                       round_to: int = 6):
    """Exact-duplicate rate per source: docs whose text also occurs
    elsewhere IN THE SAME SOURCE, as a fraction of that source's docs —
    the feed-health metric that tells you which upstream is
    re-publishing.

    Distributed shape: (source, md5) pairs shuffle once (hashes, never
    text); group sizes > 1 mark duplicates; a |sources|-row rollup
    finishes.  Columns (source, n_docs, n_dup_docs, dup_rate)."""
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def hashes(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5((x or "").encode()).hexdigest()
              for x in t[text_col].to_pylist()]
        return pa.table({"source": t[src_col],
                         "h": pa.array(hs, pa.string())})

    groups = (ds.map_batches(hashes, batch_format="pyarrow")
              .groupby(["source", "h"]).aggregate(Count(alias_name="n")))

    def mark(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t["source"],
            "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            "n_dup": pa.array(np.where(n > 1, n, 0).astype(np.int64),
                              pa.int64()),
        })

    agg = (groups.map_batches(mark, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_dup", alias_name="n_dup_docs")).to_pandas())
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_dup_docs"] = agg["n_dup_docs"].astype("int64")
    agg["dup_rate"] = (agg["n_dup_docs"] / agg["n_docs"]).round(round_to)
    return agg.sort_values("source").reset_index(drop=True)


def weighted_sample(ds, *, k: int = 50, id_col: str = "doc_id",
                    weight_col: str = "n_chars", round_to: int = 12):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): each row draws key = ln(u)/w with u a DETERMINISTIC
    md5-uniform of its id, and the global top-k keys are the sample —
    P(selection) proportional to weight, reproducible across runs,
    machines and block boundaries (no RNG state), which is what a
    quality-weighted corpus subsample needs for auditability.

    Distributed shape: zero shuffle — each batch prunes to its local
    top-k candidates (vectorized argpartition), the driver merges the
    bounded (blocks x k) candidate set.  Keys are rounded to
    ``round_to`` digits BEFORE ranking, ties broken by id, so the
    DuckDB oracle (same md5-uniform, same ln-key) is bit-identical.
    Columns (doc_id, weight, key), best key first."""
    import numpy as np
    import pandas as pd

    from .dedup import _md5_u64_tokens

    TWO64 = 18446744073709551616.0

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = w > 0
        ids, w = ids[ok], w[ok]
        h = _md5_u64_tokens(np.array([str(int(i)) for i in ids],
                                     dtype=object))
        u = (h.astype(np.float64) + 1.0) / TWO64
        key = np.round(np.log(u) / w, round_to)
        if key.size > k:
            top = np.argpartition(-key, k - 1)[:k]
            ids, w, key = ids[top], w[top], key[top]
        return pa.table({
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "weight": pa.array(w, pa.float64()),
            "key": pa.array(key, pa.float64()),
        })

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["key", id_col],
                            ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def group_sample_k(ds, *, k: int = 5, group_col: str = "source",
                   id_col: str = "doc_id"):
    """Uniform k-sample PER GROUP, deterministic: rank rows within each
    group by the md5 of their id (a fixed random permutation — the
    batch-mode equivalent of per-group reservoir sampling, but stable
    across runs/machines/block boundaries and SQL-replicable) and keep
    the k smallest.

    Distributed shape: the md5 rank key is computed map-side; a
    map-side combiner keeps at most k rows per group per block (the
    ``grouped_topk`` idiom), so the shuffle moves <= k rows x groups x
    blocks, never the corpus; one bucketed ``map_groups`` finishes the
    ranking vectorized.  Returns (group, id, sample_rank) sorted by
    (group, sample_rank)."""
    import pandas as pd

    from .dedup import _md5_u64_tokens, _strip_meta

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = _md5_u64_tokens(np.array([str(int(i)) for i in ids],
                                     dtype=object))
        return pa.table({
            group_col: t[group_col],
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "_h": pa.array(h, pa.uint64()),
        })

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([group_col, "_h", id_col])
        out = pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k),
            preserve_index=False)
        return out.replace_schema_metadata(None)

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([group_col, "_h", id_col], kind="mergesort")
        g = g.groupby(group_col, sort=False).head(k)
        rank = g.groupby(group_col, sort=False).cumcount() + 1
        return pa.table({
            group_col: pa.array(g[group_col], pa.string()),
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "sample_rank": pa.array(rank.to_numpy(np.int64), pa.int64()),
        })

    # group cardinality is tiny (sources), so one map_groups call per
    # group is fine here; the map-side combiner already bounded the rows
    out = (_strip_meta(ds.map_batches(keyed, batch_format="pyarrow"))
           .map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).map_groups(final, batch_format="pandas"))
    pdf = out.to_pandas()
    return (pdf.sort_values([group_col, "sample_rank"])
            .reset_index(drop=True))
