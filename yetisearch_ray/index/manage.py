"""Index management: delete (tombstones), clear, drop, stats, optimize.

Maps the reference's SQLite mutations onto the immutable-segment world:

- ``delete_docs`` / ``delete_by_prefix`` (reference
  ``SqliteStorage::delete`` :703-763 / ``deleteByIdPrefix`` :775-856) →
  TOMBSTONES in the manifest, applied at query time; physical removal
  happens at ``optimize``.
- ``clear_index`` / ``drop_index`` (:1543-1572 / :329-344) → directory
  truncation / removal.
- ``index_stats`` (``getIndexStats`` :1397-1436) → docstore aggregates.
- ``optimize_index`` (``SqliteStorage::optimize`` :1383-1395, the FTS
  'optimize' + VACUUM analogue) → per-partition segment compaction: a
  Ray job that rewrites every posting segment with tombstoned docs
  removed, rewrites doclens/docstore, refreshes stats, clears the
  tombstone list.  Per-partition tasks, idempotent atomic writes — the
  same resumability story as the build.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import Manifest
from .postings import decode_postings, encode_postings


# ---------------------------------------------------------------- create


def create_empty_index(index_dir: str, cfg) -> "Manifest":
    """Create a committed EMPTY index (reference CLI ``create-index``,
    ``bin/yetisearch:81-90`` — createIndex writes the empty table
    schema).  Searches return 0 rows; later builds append into it
    (``build_index(..., append=True)`` / facade ``index_batch``).

    Writes the manifest plus a zero-row doclens file with the
    append-compatible schema so readers that eagerly load doc lengths
    see a well-typed empty table rather than a missing directory."""
    if Manifest.exists(index_dir):
        raise FileExistsError(f"index already exists at {index_dir}")
    dl_dir = os.path.join(index_dir, "doclens")
    os.makedirs(dl_dir, exist_ok=True)
    os.makedirs(os.path.join(index_dir, "docs"), exist_ok=True)
    os.makedirs(os.path.join(index_dir, "postings"), exist_ok=True)
    empty_dl = pa.table({"doc_id": pa.array([], pa.uint64()),
                         "dl": pa.array([], pa.int64())})
    pq.write_table(empty_dl, os.path.join(dl_dir, "part=empty-g000.parquet"),
                   compression="zstd")
    man = Manifest.new(index_dir, cfg.as_dict(), input_fingerprint="empty")
    man.data["stats"] = {"n_docs": 0, "total_dl": 0, "avgdl": 0.0}
    man.data["status"] = "committed"
    man.save()
    return man


# ---------------------------------------------------------------- deletes


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone documents (applied at query time; physical at optimize)."""
    man = Manifest.load(index_dir)
    tomb = set(man.data.get("tombstones", []))
    before = len(tomb)
    tomb.update(int(d) for d in doc_ids)
    man.data["tombstones"] = sorted(tomb)
    man.data["tombstone_version"] = man.data.get("tombstone_version", 0) + 1
    man.save()
    return len(tomb) - before


def delete_by_prefix(index_dir: str, column: str, prefix: str) -> int:
    """Delete every doc whose ``column`` starts with ``prefix`` (the
    reference's id-prefix purge used for stale chunk cleanup)."""
    docs_dir = os.path.join(index_dir, "docs")
    man = Manifest.load(index_dir)
    id_col = man.config["id_column"]
    t = pq.read_table(docs_dir, columns=[id_col, column])
    import pyarrow.compute as pc

    mask = pc.starts_with(pc.cast(t[column], pa.string()), prefix)
    ids = t.filter(mask)[id_col].to_pylist()
    if ids:
        delete_docs(index_dir, ids)
    return len(ids)


def tombstones(index_dir: str) -> set[int]:
    man = Manifest.load(index_dir)
    return set(man.data.get("tombstones", []))


# ---------------------------------------------------------------- lifecycle


def clear_index(index_dir: str) -> None:
    """Remove all data but keep the index dir + manifest shell."""
    man = Manifest.load(index_dir)
    for sub in ("postings", "docs", "doclens"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    man.data["partitions"] = {}
    man.data["tombstones"] = []
    man.data["stats"] = {"n_docs": 0, "total_dl": 0, "avgdl": 0.0}
    man.data["status"] = "cleared"
    man.save()


def drop_index(index_dir: str) -> None:
    if Manifest.exists(index_dir):
        shutil.rmtree(index_dir)


def index_stats(index_dir: str, by: str | None = None):
    """Doc count (+ optional per-column value counts, reference
    getIndexStats groups by language/type)."""
    man = Manifest.load(index_dir)
    out = {
        "n_docs": man.stats.get("n_docs", 0),
        "avgdl": man.stats.get("avgdl", 0.0),
        "total_dl": man.stats.get("total_dl", 0),
        "partitions": len(man.data.get("partitions", {})),
        "tombstones": len(man.data.get("tombstones", [])),
    }
    if by:
        t = pq.read_table(os.path.join(index_dir, "docs"),
                          columns=[by])
        import pandas as pd

        counts = pd.Series(t[by].to_pylist()).value_counts().to_dict()
        out[f"by_{by}"] = counts
    return out


# ---------------------------------------------------------------- optimize


def _compact_segment(path: str, dead: np.ndarray) -> tuple[int, int]:
    """Rewrite one posting segment without tombstoned docs.
    Returns (terms_kept, rows_removed)."""
    t = pq.read_table(path)
    out = {c: [] for c in ("term", "field", "df", "cf", "docs", "tfs", "pos")}
    removed = 0
    for i in range(t.num_rows):
        d, f, p = decode_postings(t["docs"][i].as_py(), t["tfs"][i].as_py(),
                                  t["pos"][i].as_py())
        keep = ~np.isin(d, dead)
        if not keep.any():
            removed += d.size
            continue
        removed += int((~keep).sum())
        if p is not None:
            tf64 = f.astype(np.int64)
            starts = np.cumsum(tf64) - tf64
            sel = np.concatenate([
                np.arange(starts[j], starts[j] + tf64[j])
                for j in np.flatnonzero(keep)
            ]) if keep.any() else np.empty(0, np.int64)
            p = p[sel]
        d, f = d[keep], f[keep]
        db, tb, pb = encode_postings(d, f, p)
        out["term"].append(t["term"][i].as_py())
        out["field"].append(t["field"][i].as_py())
        out["df"].append(d.size)
        out["cf"].append(int(f.sum()))
        out["docs"].append(db)
        out["tfs"].append(tb)
        out["pos"].append(pb)
    seg = pa.table({
        "term": pa.array(out["term"], pa.string()),
        "field": pa.array(out["field"], pa.int8()),
        "df": pa.array(out["df"], pa.uint32()),
        "cf": pa.array(out["cf"], pa.uint64()),
        "docs": pa.array(out["docs"], pa.binary()),
        "tfs": pa.array(out["tfs"], pa.binary()),
        "pos": pa.array(out["pos"], pa.binary()),
    })
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".opt-")
    os.close(fd)
    pq.write_table(seg, tmp, row_group_size=4096, compression="zstd")
    os.replace(tmp, path)
    return len(out["term"]), removed


def _filter_parquet_dir(dir_path: str, id_col: str, dead: np.ndarray) -> int:
    """Drop tombstoned rows from every parquet file in a dir (atomic)."""
    n_dropped = 0
    for f in sorted(glob.glob(os.path.join(dir_path, "*.parquet"))):
        t = pq.read_table(f)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, dead)
        if keep.all():
            continue
        n_dropped += int((~keep).sum())
        fd, tmp = tempfile.mkstemp(dir=dir_path, prefix=".opt-")
        os.close(fd)
        pq.write_table(t.filter(pa.array(keep)), tmp, compression="zstd")
        os.replace(tmp, f)
    return n_dropped


def _merge_partition_files(files: list[str], dead: np.ndarray,
                           out_path: str) -> int:
    """K-way merge of one partition's generation files into a single
    segment: group rows by (term, field), merge postings positions-
    preserving, drop tombstoned docs, write atomically.  Returns terms
    kept."""
    from .postings import merge_postings

    groups: dict[tuple, list] = {}
    order: list[tuple] = []
    for f in files:
        t = pq.read_table(f)
        for i in range(t.num_rows):
            key = (t["term"][i].as_py(), t["field"][i].as_py())
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(decode_postings(
                t["docs"][i].as_py(), t["tfs"][i].as_py(), t["pos"][i].as_py()))
    order.sort()
    out = {c: [] for c in ("term", "field", "df", "cf", "docs", "tfs", "pos")}
    for term, fid in order:
        d, f, p = merge_postings(groups[(term, fid)])
        if dead.size:
            keep = ~np.isin(d, dead)
            if not keep.all():
                if p is not None:
                    tf64 = f.astype(np.int64)
                    starts = np.cumsum(tf64) - tf64
                    kept_rows = np.flatnonzero(keep)
                    sel = np.concatenate(
                        [np.arange(starts[j], starts[j] + tf64[j]) for j in kept_rows]
                    ) if kept_rows.size else np.empty(0, np.int64)
                    p = p[sel]
                d, f = d[keep], f[keep]
        if d.size == 0:
            continue
        db, tb, pb = encode_postings(d, f, p)
        out["term"].append(term)
        out["field"].append(fid)
        out["df"].append(d.size)
        out["cf"].append(int(f.sum()))
        out["docs"].append(db)
        out["tfs"].append(tb)
        out["pos"].append(pb)
    seg = pa.table({
        "term": pa.array(out["term"], pa.string()),
        "field": pa.array(out["field"], pa.int8()),
        "df": pa.array(out["df"], pa.uint32()),
        "cf": pa.array(out["cf"], pa.uint64()),
        "docs": pa.array(out["docs"], pa.binary()),
        "tfs": pa.array(out["tfs"], pa.binary()),
        "pos": pa.array(out["pos"], pa.binary()),
    })
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path), prefix=".opt-")
    os.close(fd)
    pq.write_table(seg, tmp, row_group_size=4096, compression="zstd")
    os.replace(tmp, out_path)
    for f in files:
        if os.path.abspath(f) != os.path.abspath(out_path):
            os.remove(f)
    return len(out["term"])


def optimize_index(index_dir: str) -> dict:
    """Segment compaction (the reference's optimize() analogue): merge all
    segment generations per partition into one file, physically apply
    tombstones, refresh stats.  One Ray task per partition — idempotent
    atomic writes, same resumability story as the build."""
    import collections
    import re as _re

    import ray

    man = Manifest.load(index_dir)
    dead = np.array(sorted(man.data.get("tombstones", [])), dtype=np.uint64)
    seg_files = sorted(glob.glob(os.path.join(index_dir, "postings", "*.parquet")))
    by_part: dict[int, list] = collections.defaultdict(list)
    for f in seg_files:
        m = _re.search(r"part=(\d+)", os.path.basename(f))
        if m:
            by_part[int(m.group(1))].append(f)

    @ray.remote
    def compact(part: int, files: list, dead_arr: np.ndarray):
        out_path = os.path.join(index_dir, "postings",
                                f"part={part:05d}-g000.parquet")
        return _merge_partition_files(files, dead_arr, out_path)

    dead_ref = ray.put(dead)
    results = ray.get([
        compact.remote(p, fs, dead_ref) for p, fs in sorted(by_part.items())
    ])
    # merge doclens generations: concat, drop tombstoned + duplicate ids
    dl_dir = os.path.join(index_dir, "doclens")
    dl_files = sorted(glob.glob(os.path.join(dl_dir, "*.parquet")))
    by_part_dl: dict[int, list] = collections.defaultdict(list)
    for f in dl_files:
        m = _re.search(r"part=(\d+)", os.path.basename(f))
        if m:
            by_part_dl[int(m.group(1))].append(f)
    dl_per_part: dict[int, tuple[int, int]] = {}
    for p, fs in sorted(by_part_dl.items()):
        t = pa.concat_tables([pq.read_table(f) for f in fs])
        import pandas as pd

        df = t.to_pandas().drop_duplicates("doc_id", keep="last")
        if dead.size:
            df = df[~df.doc_id.isin(dead)]
        df = df.sort_values("doc_id")
        dl_per_part[p] = (len(df), int(df.dl.sum()))
        out_path = os.path.join(dl_dir, f"part={p:05d}-g000.parquet")
        fd, tmp = tempfile.mkstemp(dir=dl_dir, prefix=".opt-")
        os.close(fd)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp,
                       compression="zstd")
        os.replace(tmp, out_path)
        for f in fs:
            if os.path.abspath(f) != os.path.abspath(out_path):
                os.remove(f)
    if dead.size:
        _filter_parquet_dir(os.path.join(index_dir, "docs"),
                            man.config["id_column"], dead)
    # refresh stats from the compacted doclens
    dl = pq.read_table(dl_dir, columns=["dl"])
    n_docs = dl.num_rows
    total_dl = int(pa.compute.sum(dl["dl"]).as_py() or 0)
    man.data["stats"] = {
        "n_docs": n_docs,
        "total_dl": total_dl,
        "avgdl": (total_dl / n_docs) if n_docs else 0.0,
    }
    # collapse partition bookkeeping to the merged generation, keeping
    # n_docs/sum_dl per partition so later appends re-derive stats right
    merged_parts = {}
    for (p, _), terms in zip(sorted(by_part.items()), results):
        nd, sd = dl_per_part.get(p, (0, 0))
        merged_parts[f"0:{p}"] = {"status": "committed", "terms": terms,
                                  "merged": True, "n_docs": nd, "sum_dl": sd}
    man.data["partitions"] = merged_parts
    man.data["tombstones"] = []
    man.data["optimized_at"] = __import__("time").time()
    man.save()
    return {"segments": len(by_part), "docs_removed": int(dead.size),
            "terms_kept": sum(results)}


def rebuild_index(index_dir: str) -> dict:
    """Rebuild postings from the stored documents (the reference's
    ``rebuildFts`` :1731-1774 / ``Indexer::rebuild`` :181-196): drops all
    segments/doclens and re-runs the full build pipeline over the
    docstore.  Doc ids, config, placement maps and stats are re-derived;
    tombstoned docs are dropped in the process."""
    from .build import IndexConfig, build_index

    man = Manifest.load(index_dir)
    cfg = IndexConfig(**{k: v for k, v in man.config.items() if k != "fields"},
                      fields=[tuple(f) for f in man.config["fields"]])
    dead = set(man.data.get("tombstones", []))

    import ray.data as rd

    docs_dir = os.path.join(index_dir, "docs")
    tmp_docs = os.path.join(index_dir, ".rebuild_docs")
    shutil.rmtree(tmp_docs, ignore_errors=True)
    os.rename(docs_dir, tmp_docs)
    for sub in ("postings", "doclens"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    ds = rd.read_parquet(tmp_docs)
    if dead:
        dead_arr = np.array(sorted(dead), dtype=np.uint64)

        def drop_dead(t: pa.Table) -> pa.Table:
            ids = t[cfg.id_column].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(ids, dead_arr)))

        ds = ds.map_batches(drop_dead, batch_format="pyarrow")
    # NOTE: content_hash_column stays set — re-hashing the stored source
    # column reproduces identical sha256 values, and clearing it would
    # silently drop the column from the rebuilt docstore and persisted
    # config (future appends would stop hashing).
    # fresh manifest + build (docstore chunks re-written from the copy)
    os.remove(os.path.join(index_dir, "manifest.json"))
    man2 = build_index(ds, index_dir, cfg, input_fingerprint="rebuild")
    shutil.rmtree(tmp_docs, ignore_errors=True)
    return {"n_docs": man2.stats["n_docs"], "dropped": len(dead)}
