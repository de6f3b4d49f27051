"""Corpus-curation operators: per-group quotas (domain caps).

A pretraining mix caps how many documents any one source/domain may
contribute.  The scale shape matters: naively `groupby(source)` pulls
every row of a hot domain into one task.  Instead each batch emits at
most ``n`` candidate rows per group it contains (map-side partial), so
the shuffle moves O(n x groups-per-batch) rows — bounded by the quota,
not by the domain size — and the final per-group selection runs over
those candidates only.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def quota_per_group(ds, *, group_col: str = "source", n: int = 5,
                    id_col: str = "doc_id"):
    """Keep the first ``n`` rows per group (ordered by ``id_col``) —
    deterministic domain-quota sampling.

    Equivalent SQL: ``QUALIFY row_number() OVER (PARTITION BY group
    ORDER BY id) <= n``.  Returns (id, group) sorted by id.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([id_col, group_col]).to_pandas()
        # dropna=False: a NULL group is still one partition, matching
        # SQL's PARTITION BY semantics
        df = (df.sort_values([group_col, id_col], kind="stable")
              .groupby(group_col, sort=False, dropna=False).head(n))
        return pa.Table.from_pandas(df, preserve_index=False)\
            .replace_schema_metadata(None)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(id_col, kind="stable").head(n)
        return pa.Table.from_pandas(df, preserve_index=False)\
            .replace_schema_metadata(None)

    cands = ds.map_batches(partial, batch_format="pyarrow")
    kept = cands.groupby(group_col).map_groups(final, batch_format="pyarrow")
    return kept.sort(id_col)
