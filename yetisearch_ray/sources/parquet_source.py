"""Parquet sources that assign deterministic dense uint64 doc_ids.

YetiSearch's external-content schema keys documents by an integer
``doc_id`` assigned by SQLite (``src/Storage/SqliteStorage.php:200-212``).
For a distributed build, doc_ids must be deterministic across runs,
resumes and cluster sizes (SURVEY.md §7 "hard parts"), so they can never
depend on execution order.  Two strategies:

1. ``read_parquet_with_doc_ids`` — METADATA-OFFSET assignment: list the
   input files in sorted order, read only their parquet FOOTERS
   driver-side (row counts per row group — cheap even for millions of
   files, and parallelizable), and give each row-group task its global
   row offset.  ``doc_id = offset + ordinal``.  Requires the corpus files
   to be globally ordered (file order × in-file order is the document
   order) — true for our generator, which writes rows sorted by
   ``(repo, path, commit)``.  No shuffle at all; fully streaming.

2. ``assign_doc_ids_by_sort`` — for unsorted input: ``ds.sort(keys)``
   (one all-to-all), then zip dense ids onto the sorted blocks via their
   block row offsets (small raw-Ray step — the Dataset API has no
   zipWithIndex; this is the documented exception where we drop to
   ``ray.remote``).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return files


def read_parquet_with_doc_ids(path: str, *, columns: list[str] | None = None,
                              id_column: str = "doc_id"):
    """Ordered read with metadata-offset doc_id assignment (strategy 1)."""
    import ray.data as rd

    files = _list_files(path)
    tasks = []
    offset = 0
    for f in files:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            nrows = md.row_group(rg).num_rows
            tasks.append({"file": f, "rg": rg, "offset": offset, "nrows": nrows})
            offset += nrows

    def read_task(b: pa.Table) -> pa.Table:
        f = b["file"][0].as_py()
        rg = b["rg"][0].as_py()
        off = b["offset"][0].as_py()
        t = pq.ParquetFile(f).read_row_group(rg, columns=columns)
        ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64), pa.uint64())
        return t.append_column(id_column, ids)

    # batch_size=1: one task per row group → blocks sized by row groups,
    # read parallelism = row-group count
    out = rd.from_items(tasks).map_batches(read_task, batch_size=1, batch_format="pyarrow")
    # total row count and the row-group task list are already known from
    # the footers — advertise both so downstream passes (hot-term sketch)
    # can size their sampling rate without a counting execution and read
    # only sampled row groups instead of the whole corpus
    out._ys_row_count = offset
    out._ys_tasks = tasks
    return out


def assign_doc_ids_by_sort(ds, sort_keys: list[str], id_column: str = "doc_id"):
    """Sort + zip dense ids (strategy 2 — one all-to-all exchange)."""
    import ray

    sorted_ds = ds.sort(sort_keys)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.cumsum([0] + counts[:-1])

    @ray.remote
    def _with_ids(t: pa.Table, off: int) -> pa.Table:
        ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64), pa.uint64())
        return t.append_column(id_column, ids)

    import ray.data as rd

    out_refs = [_with_ids.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
