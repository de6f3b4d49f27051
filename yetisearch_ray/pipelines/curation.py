"""Corpus-curation operators: per-group quotas (domain caps) and
sequence packing (token-bin assignment).

Scale shapes are the point here: quotas bound the shuffle by the quota
(map-side partial top-n per group), not by the hot domain's size; the
packing prefix sum runs over fixed ID ranges so the only driver-side
table is one row per range and results never depend on Ray block
boundaries.
"""

from __future__ import annotations

import pyarrow as pa


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
