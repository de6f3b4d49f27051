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

__all__ = ["quantiles_disc", "hll_distinct", "distinct_count"]


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
