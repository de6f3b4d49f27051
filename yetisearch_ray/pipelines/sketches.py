"""Mergeable-sketch and distributed-selection operators.

Two primitives every warehouse / training-data pipeline needs that Ray
Data does not ship natively, both expressed as map-side partials plus a
tiny keyed combine (no global sort, no driver materialization):

- **Exact discrete quantiles** (`quantiles_disc`): the SQL
  ``percentile_disc(q) WITHIN GROUP`` shape via iterative histogram
  refinement (distributed selection).  Each pass is one streaming
  ``map_batches`` over the column emitting a fixed-size per-bracket
  histogram row; a ``groupby(bracket)`` combine reduces blocks×brackets
  rows to brackets rows.  The bracket containing the target rank
  shrinks by the bin factor every pass, so 2–3 passes bound the
  candidate set regardless of data size, and only that bounded set is
  ever collected.  A full ``ds.sort`` would shuffle every row; this
  moves a few KB per block per pass.

- **HyperLogLog distinct count** (`hll_distinct`): the classic
  mergeable cardinality sketch (Flajolet et al. 2007, with the
  HLL++-style small-range linear counting fallback).  Per-batch
  register maxima are computed fully vectorized (splitmix64 in uint64
  numpy, ``np.maximum.at``), salted into a 32-way keyed combine, and
  only 32 register rows reach the driver.  Error ~1.04/sqrt(2^p).

An exact distributed COUNT(DISTINCT) (`distinct_count`) accompanies the
sketch as its SQL-oracled ground truth: per-batch dedup first (map-side
combine), then a value-keyed shuffle of the already-thinned stream.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["quantiles_disc", "hll_distinct", "distinct_count",
           "heavy_hitters"]


# --------------------------------------------------------------------------
# Exact discrete quantiles (distributed selection by histogram refinement)
# --------------------------------------------------------------------------

def _minmax_count(ds, column: str):
    """One streaming pass → (N, min, max); per-batch rows are 3 scalars."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"cnt": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"cnt": pa.array([v.size], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(rows.cnt.sum()), float(rows.lo.min()), float(rows.hi.max())


def quantiles_disc(ds, column: str, qs=(0.5, 0.9, 0.99), *,
                   bins: int = 4096, max_candidates: int = 100_000,
                   max_iters: int = 6, round_to: int = 4) -> pd.DataFrame:
    """Exact ``percentile_disc`` over a numeric Dataset column.

    Semantics match ANSI ``percentile_disc(q)``: the smallest value v
    with cume_dist(v) >= q, i.e. the 1-indexed rank ``ceil(q*N)``
    element of the sorted column (rank 1 for q=0).

    Returns a DataFrame ``(q, value)`` with one row per requested
    quantile, values rounded to ``round_to`` for oracle comparison.
    """
    n, gmin, gmax = _minmax_count(ds, column)
    if n == 0:
        return pd.DataFrame({"q": list(qs), "value": [float("nan")] * len(qs)})

    ranks = [max(1, int(math.ceil(q * n))) for q in qs]
    # per-quantile bracket: (lo, hi, n_below) with n_below = #rows < lo
    brackets = {q: (gmin, gmax, 0) for q in qs}

    for _ in range(max_iters):
        # unique open brackets whose candidate count may still exceed cap
        uniq: list[tuple[float, float]] = []
        seen = {}
        for q, r in zip(qs, ranks):
            lo, hi, below = brackets[q]
            if lo == hi:
                continue
            key = (lo, hi)
            if key not in seen:
                seen[key] = len(uniq)
                uniq.append(key)
        if not uniq:
            break
        edges = [np.linspace(lo, hi, bins + 1) for (lo, hi) in uniq]

        def hist_partial(t: pa.Table, _edges=edges) -> pa.Table:
            v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
            bids, counts = [], []
            for bi, e in enumerate(_edges):
                w = v[(v >= e[0]) & (v <= e[-1])]
                idx = np.clip(np.searchsorted(e, w, side="right") - 1,
                              0, len(e) - 2)
                h = np.bincount(idx, minlength=len(e) - 1).astype(np.int64)
                bids.append(bi)
                counts.append(h)
            return pa.table({
                "bid": pa.array(bids, pa.int64()),
                "h": pa.array([c for c in counts], pa.list_(pa.int64())),
            })

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            tot = np.sum(np.stack(g["h"].to_numpy()), axis=0)
            return pd.DataFrame({"bid": [int(g["bid"].iloc[0])],
                                 "h": [tot.tolist()]})

        hs = (ds.map_batches(hist_partial, batch_format="pyarrow")
              .groupby("bid").map_groups(combine, batch_format="pandas")
              .to_pandas())
        hist_of = {int(r.bid): np.asarray(r.h, dtype=np.int64)
                   for r in hs.itertuples()}

        all_small = True
        for q, r in zip(qs, ranks):
            lo, hi, below = brackets[q]
            if lo == hi:
                continue
            bi = seen[(lo, hi)]
            h, e = hist_of[bi], edges[bi]
            cum = below + np.cumsum(h)
            j = int(np.searchsorted(cum, r, side="left"))
            new_below = below + (int(cum[j - 1] - below) if j > 0 else 0)
            brackets[q] = (float(e[j]), float(e[j + 1]), new_below)
            if int(h[j]) > max_candidates:
                all_small = False
        if all_small:
            break

    # final pass: collect the bounded candidate sets, pick exact ranks
    finals = {q: brackets[q] for q in qs}
    uniq = sorted({(lo, hi) for (lo, hi, _) in finals.values()})
    lo_arr = np.array([u[0] for u in uniq])
    hi_arr = np.array([u[1] for u in uniq])

    def cand_partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        bids, vals = [], []
        for bi in range(len(lo_arr)):
            w = v[(v >= lo_arr[bi]) & (v <= hi_arr[bi])]
            bids.append(np.full(w.size, bi, dtype=np.int64))
            vals.append(w)
        return pa.table({"bid": pa.array(np.concatenate(bids) if bids
                                         else np.array([], np.int64)),
                         "v": pa.array(np.concatenate(vals) if vals
                                       else np.array([], np.float64))})

    cands = (ds.map_batches(cand_partial, batch_format="pyarrow")
             .to_pandas())
    out = []
    for q, r in zip(qs, ranks):
        lo, hi, below = finals[q]
        if lo == hi:
            out.append((q, round(lo, round_to)))
            continue
        bi = uniq.index((lo, hi))
        vs = np.sort(cands.loc[cands.bid == bi, "v"].to_numpy())
        out.append((q, round(float(vs[r - below - 1]), round_to)))
    return pd.DataFrame(out, columns=["q", "value"])


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (numpy wraps mod 2^64)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_column(arr: pa.ChunkedArray) -> np.ndarray:
    """64-bit hashes of an int or string column, vectorized."""
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return _splitmix64(v.view(np.uint64))
    # strings: stable per-value digest via pandas' 64-bit hashing
    s = pd.Series(arr.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)


def hll_distinct(ds, column: str, *, p: int = 12, salt_ways: int = 32):
    """HyperLogLog distinct-count estimate over a Dataset column.

    Returns ``(estimate, m)``.  Registers merge by elementwise max, so
    the combine is associative: per-batch rows → 32 salted groups →
    driver.  At any scale only ``salt_ways`` register rows (2^p bytes
    each) reach the driver.
    """
    if not 11 <= p <= 18:
        # wbits = 64-p must stay <= 53 for the exact frexp bit_length
        raise ValueError("hll_distinct supports p in [11, 18]")
    m = 1 << p
    wbits = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        """Stateless batch fn; the combine salt is content-derived so the
        stage needs no actor state (and the result is deterministic
        regardless of block/batch split)."""
        h = _hash_column(t[column])
        regs = np.zeros(m, dtype=np.uint8)
        salt = 0
        if h.size:
            idx = (h >> np.uint64(wbits)).astype(np.int64)
            w = h & np.uint64((1 << wbits) - 1)
            # exact bit_length via frexp (wbits<=53 → float64 exact)
            _, exp = np.frexp(w.astype(np.float64))
            rho = np.where(w == 0, wbits + 1, wbits - exp + 1)\
                .astype(np.uint8)
            np.maximum.at(regs, idx, rho)
            salt = int(h[0] % np.uint64(salt_ways))
        return pa.table({
            "salt": pa.array([salt], pa.int64()),
            "regs": pa.array([regs], pa.list_(pa.uint8())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.max(np.stack([np.asarray(r, dtype=np.uint8)
                                for r in g["regs"]]), axis=0)
        return pd.DataFrame({"salt": [int(g["salt"].iloc[0])],
                             "regs": [regs.tolist()]})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("salt").map_groups(merge, batch_format="pandas")
            .to_pandas())
    regs = np.max(np.stack([np.asarray(r, dtype=np.uint8)
                            for r in rows["regs"]]), axis=0)

    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:          # linear counting fallback
        est = m * math.log(m / zeros)
    return float(est), m


def distinct_count(ds, column: str) -> int:
    """Exact distributed COUNT(DISTINCT column).

    Map-side combine (per-batch dedup) thins the stream before the
    value-keyed shuffle; the groupby output is never collected — only
    its row count is."""
    def uniq(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks()
        u = col.unique() if isinstance(col, pa.Array) \
            else pa.chunked_array([col]).unique()
        return pa.table({column: u})

    thinned = ds.map_batches(uniq, batch_format="pyarrow")
    return int(thinned.groupby(column).count().count())

# --------------------------------------------------------------------------
# Exact heavy hitters (two-pass Misra-Gries: sketch -> candidate recount)
# --------------------------------------------------------------------------

def _value_counts(t: pa.Table, column: str, tokens: bool) -> pd.Series:
    """Per-block exact frequency table (the map-side combine).

    ``tokens=True`` splits the string column on RE2-parity ASCII
    whitespace (dedup._ws_tokens) so the operator and the DuckDB
    ``string_split_regex(text, '\\s+')`` oracle see identical terms.
    Nulls contribute no values in either mode."""
    if tokens:
        from yetisearch_ray.pipelines.dedup import _ws_tokens

        vals = [tok for s in t[column].to_pylist() for tok in _ws_tokens(s)]
        return pd.Series(vals, dtype="object").value_counts()
    return t[column].to_pandas().value_counts()


def heavy_hitters(ds, column: str, *, k: int = 100, capacity: int = 4096,
                  tokens: bool = False,
                  max_candidates: int = 100_000) -> pd.DataFrame:
    """EXACT top-``k`` most frequent values without shuffling the full
    vocabulary — the 100 TB path for "top terms over the corpus".

    A plain ``groupby(term).count()`` exchanges one row per distinct
    term per block (web-scale text: millions of distinct tokens per
    block).  This operator instead runs the classic two-pass scheme:

    1. **Misra-Gries sketch pass** (Misra & Gries 1982 / the
       space-saving family): each block reduces to at most
       ``capacity`` ``(term, est)`` rows via the frequent-items
       decrement, plus its decremented mass ``err``.  Only
       ``blocks x capacity`` rows enter the ``groupby(term)`` combine,
       and the merged sketch guarantees ``true - B <= est <= true``
       with ``B = sum(err)`` (any term absent from the sketch has
       ``true <= B``).
    2. **Candidate recount pass**: every term that could still reach
       the top-k (``est >= est_k - B``) is recounted EXACTLY in one
       streaming pass (per-block ``value_counts`` filtered to the
       broadcast candidate set -> tiny keyed combine).

    If the k-th recounted frequency exceeds ``B`` the result is
    *provably* the exact top-k (ties broken ``count DESC, term ASC``).
    Otherwise — pathologically flat distributions or an undersized
    ``capacity`` — it falls back to the full exact groupby so the
    answer is always exact; the sketch path is purely a shuffle-volume
    optimization.  Zipf-shaped term frequencies prove exact with
    ``capacity`` a few multiples of ``k``.

    Returns a DataFrame ``(term, cnt)``, the exact top-k.
    """
    ds = ds.select_columns([column])
    empty = pd.DataFrame({"term": pd.array([], dtype="object"),
                          "cnt": pd.array([], dtype="int64")})

    def mg_partial(t: pa.Table) -> pa.Table:
        vc = _value_counts(t, column, tokens)
        if vc.empty:
            return pa.table({"term": pa.array([], pa.string()),
                             "est": pa.array([], pa.int64()),
                             "err": pa.array([], pa.int64())})
        n_block = int(vc.sum())
        if len(vc) > capacity:
            dec = int(vc.iloc[capacity])        # (capacity+1)-th largest
            vc = (vc.iloc[:capacity] - dec)
            vc = vc[vc > 0]
            err = n_block - int(vc.sum())       # decremented + dropped mass
        else:
            err = 0
        terms = [str(x) for x in vc.index]
        ests = [int(x) for x in vc.to_numpy()]
        errs = [err] + [0] * (len(terms) - 1) if terms else [err]
        if not terms:                            # fully decremented block
            terms, ests = [""], [0]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "est": pa.array(ests, pa.int64()),
                         "err": pa.array(errs, pa.int64())})

    merged = (ds.map_batches(mg_partial, batch_format="pyarrow")
              .groupby("term").sum(["est", "err"])).materialize()
    if merged.count() == 0:
        return empty
    bound = int(merged.sum("sum(err)") or 0)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["sum(est)", "term"],
                               ascending=[False, True]).head(k))

    # post-groupby blocks hold DISJOINT terms, so the global top-k of
    # est is the top-k of the per-block top-k rows (bounded collect)
    tops = (merged.map_batches(local_top, batch_format="pandas")
            .to_pandas())
    tops = tops.sort_values(["sum(est)", "term"],
                            ascending=[False, True]).head(k)

    if bound == 0:                 # no block overflowed: ests ARE exact
        out = tops.rename(columns={"sum(est)": "cnt"})[["term", "cnt"]]
        return out.astype({"cnt": "int64"}).reset_index(drop=True)

    est_k = int(tops["sum(est)"].iloc[-1])
    cutoff = est_k - bound

    def cand_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["sum(est)"], cutoff))

    cand = (merged.map_batches(cand_filter, batch_format="pyarrow")
            .to_pandas())
    proven = len(cand) <= max_candidates
    if proven:
        cand_set = frozenset(cand["term"])

        def exact_partial(t: pa.Table) -> pa.Table:
            vc = _value_counts(t, column, tokens)
            vc.index = vc.index.astype(str)   # term keys are strings
            vc = vc[vc.index.isin(cand_set)]
            return pa.table({"term": pa.array([str(x) for x in vc.index],
                                              pa.string()),
                             "cnt": pa.array([int(x) for x in vc.to_numpy()],
                                             pa.int64())})

        exact = (ds.map_batches(exact_partial, batch_format="pyarrow")
                 .groupby("term").sum("cnt").to_pandas()
                 .rename(columns={"sum(cnt)": "cnt"})
                 .sort_values(["cnt", "term"], ascending=[False, True]))
        # provably complete iff even an unseen term (true <= bound)
        # could not displace the k-th recounted candidate
        proven = len(exact) >= k and int(exact["cnt"].iloc[k - 1]) > bound
    if proven:
        return (exact.head(k)[["term", "cnt"]].astype({"cnt": "int64"})
                .reset_index(drop=True))

    # exactness not provable at this capacity: full exact fallback
    # (map-side combine, then the full-vocabulary keyed shuffle the
    # sketch path exists to avoid)
    def full_partial(t: pa.Table) -> pa.Table:
        vc = _value_counts(t, column, tokens)
        return pa.table({"term": pa.array([str(x) for x in vc.index],
                                          pa.string()),
                         "cnt": pa.array([int(x) for x in vc.to_numpy()],
                                         pa.int64())})

    full = (ds.map_batches(full_partial, batch_format="pyarrow")
            .groupby("term").sum("cnt"))

    def local_top_cnt(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["sum(cnt)", "term"],
                               ascending=[False, True]).head(k))

    out = (full.map_batches(local_top_cnt, batch_format="pandas").to_pandas()
           .rename(columns={"sum(cnt)": "cnt"})
           .sort_values(["cnt", "term"], ascending=[False, True]).head(k))
    return out[["term", "cnt"]].astype({"cnt": "int64"}).reset_index(drop=True)


def group_hll_distinct(ds, group_col: str, column: str, *, p: int = 12):
    """Per-GROUP HyperLogLog distinct estimate + the ±3σ bound verdict
    against the engine's own exact per-group distinct count — the
    grouped mergeable-sketch pattern: each batch emits one register row
    per group it contains (a map-side combine), the per-group merge is
    an elementwise max, and at any scale only |groups| × |blocks|
    register rows (2^p bytes each) cross the exchange while the column
    itself never leaves its partitions.  The exact side is the
    two-level distinct groupby (value-keyed thinning first).

    The fixed splitmix64 hash makes each group's estimate a pure
    function of its value set, so "estimate within ±3·1.04/√m of the
    exact count" is a deterministic, SQL-checkable claim (the
    agg_hll_distinct bound-oracle idiom, per group).
    Columns (group, n_distinct_exact, registers, within_3sigma)."""
    import pandas as pd
    from ray.data.aggregate import Count

    from yetisearch_ray.pipelines.dedup import _strip_meta

    if not 11 <= p <= 18:
        raise ValueError("group_hll_distinct supports p in [11, 18]")
    m = 1 << p
    wbits = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        groups = t[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        h = _hash_column(t[column])
        gnp = groups.to_numpy(zero_copy_only=False)
        out_g, out_r = [], []
        for gval in pd.unique(gnp):
            mask = gnp == gval
            hg = h[mask]
            regs = np.zeros(m, dtype=np.uint8)
            idx = (hg >> np.uint64(wbits)).astype(np.int64)
            w = hg & np.uint64((1 << wbits) - 1)
            _, exp = np.frexp(w.astype(np.float64))
            rho = np.where(w == 0, wbits + 1, wbits - exp + 1)\
                .astype(np.uint8)
            np.maximum.at(regs, idx, rho)
            out_g.append(gval)
            out_r.append(regs)
        return pa.table({
            group_col: pa.array(out_g, pa.string()),
            "regs": pa.array([r.tolist() for r in out_r],
                             pa.list_(pa.uint8())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.max(np.stack([np.asarray(r, dtype=np.uint8)
                                for r in g["regs"]]), axis=0)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.count_nonzero(regs == 0))
        if est <= 2.5 * m and zeros > 0:      # linear counting fallback
            est = m * math.log(m / zeros)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "est": [float(est)]})

    ests = (_strip_meta(ds.map_batches(partial, batch_format="pyarrow"))
            .groupby(group_col).map_groups(merge, batch_format="pandas")
            .to_pandas())

    def thin(t: pa.Table) -> pa.Table:
        tt = pa.table({group_col: t[group_col], column: t[column]})
        return tt.group_by([group_col, column]).aggregate([])

    exact = (_strip_meta(ds.map_batches(thin, batch_format="pyarrow"))
             .groupby([group_col, column]).count()
             .select_columns([group_col])
             .groupby(group_col)
             .aggregate(Count(alias_name="n_distinct_exact"))
             .to_pandas())

    out = ests.merge(exact, on=group_col)
    band = 3 * 1.04 / (m ** 0.5)
    out["within_3sigma"] = (
        (out["est"] / out["n_distinct_exact"] - 1.0).abs() <= band
    ).astype("int64")
    out["n_distinct_exact"] = out["n_distinct_exact"].astype("int64")
    out["registers"] = np.int64(m)
    return (out.sort_values(group_col).reset_index(drop=True)
            [[group_col, "n_distinct_exact", "registers",
              "within_3sigma"]])
