"""JSONL / CSV sources with the same deterministic doc_id contract as
the parquet source.

The reference accepts arbitrary document dicts through its PHP API
(``src/Index/Indexer.php:55-116``); file-shaped corpora in the wild are
frequently newline-delimited JSON or CSV shards, so the Ray engine
reads those too.  doc_id assignment follows ``parquet_source`` strategy
1 (metadata offsets): files in sorted order, ``doc_id = file_offset +
in-file ordinal``.  Unlike parquet there is no footer row count, so the
offsets come from a distributed COUNTING parse (one Ray task per file)
before the offset read — footer-less formats inherently cost a second
parse; prefer parquet for 100 TB-scale corpora and treat these readers
as the on-ramp for external data.

Counting uses the same pyarrow parser as the read so the two passes can
never disagree on row counts (e.g. over blank lines or quoted newlines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _list_files_ext(path: str, exts: tuple[str, ...]) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if f.lower().endswith(exts)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no {'/'.join(exts)} files under {path}")
    return files


def _jsonl_table(f: str, schema: pa.Schema | None = None) -> pa.Table:
    from pyarrow import json as pa_json

    # unexpected_field_behavior="ignore": with the default "infer",
    # pyarrow APPENDS any extra field a later shard has even when
    # explicit_schema is set, re-introducing the mixed-block-schema
    # poisoning _offset_read pins the first shard's schema to prevent.
    opts = (pa_json.ParseOptions(explicit_schema=schema,
                                 unexpected_field_behavior="ignore")
            if schema is not None else None)
    try:
        return pa_json.read_json(f, parse_options=opts)
    except pa.ArrowInvalid as e:
        raise ValueError(
            f"{f}: expected NEWLINE-DELIMITED JSON (one object per line); "
            f"JSON-array documents are not supported ({e})") from e


def _csv_table(f: str, schema: pa.Schema | None = None) -> pa.Table:
    from pyarrow import csv as pa_csv

    conv = None
    if schema is not None:
        conv = pa_csv.ConvertOptions(
            column_types={fld.name: fld.type for fld in schema})
    return pa_csv.read_csv(f, convert_options=conv)


def _offset_read(files: list[str], parse, id_column: str):
    """Count rows per file (distributed), then offset-id read per file.

    The FIRST file's inferred schema is pinned and passed to every other
    file's parse: per-file type inference would otherwise let a shard
    whose column happens to look all-numeric come back with a different
    schema and poison the dataset downstream."""
    import ray
    import ray.data as rd

    first = parse(files[0])
    schema = first.schema

    @ray.remote
    def _count(f: str) -> int:
        return parse(f, schema).num_rows

    counts = [first.num_rows] + ray.get(
        [_count.remote(f) for f in files[1:]])
    tasks = []
    offset = 0
    for f, n in zip(files, counts):
        tasks.append({"file": f, "offset": offset})
        offset += int(n)

    def read_task(b: pa.Table) -> pa.Table:
        f = b["file"][0].as_py()
        off = b["offset"][0].as_py()
        t = parse(f, schema)
        ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64),
                       pa.uint64())
        return t.append_column(id_column, ids)

    out = rd.from_items(tasks).map_batches(read_task, batch_size=1,
                                           batch_format="pyarrow")
    out._ys_row_count = offset
    return out


def read_jsonl_with_doc_ids(path: str, *, id_column: str = "doc_id"):
    """Ordered newline-delimited-JSON read with dense uint64 doc_ids.

    One block per file — shard large corpora into many files (the usual
    layout) so read parallelism and block sizing follow the file layout,
    exactly like the parquet source's row groups."""
    files = _list_files_ext(path, (".jsonl", ".ndjson", ".json"))
    return _offset_read(files, _jsonl_table, id_column)


def read_csv_with_doc_ids(path: str, *, id_column: str = "doc_id"):
    """Ordered CSV read (header row per file) with dense uint64 doc_ids."""
    files = _list_files_ext(path, (".csv",))
    return _offset_read(files, _csv_table, id_column)


def read_any_with_doc_ids(path: str, *, id_column: str = "doc_id"):
    """Extension-dispatching reader: parquet / jsonl / csv."""
    import glob
    import os

    probe = path
    if os.path.isdir(path):
        all_files = sorted(glob.glob(os.path.join(path, "**", "*"),
                                     recursive=True))
        exts = {os.path.splitext(f)[1].lower() for f in all_files
                if os.path.splitext(f)[1]}
        if ".parquet" in exts:
            probe = "x.parquet"
        elif exts & {".jsonl", ".ndjson"}:
            probe = "x.jsonl"
        elif ".csv" in exts:
            probe = "x.csv"
    low = probe.lower()
    if low.endswith(".parquet"):
        from .parquet_source import read_parquet_with_doc_ids

        return read_parquet_with_doc_ids(path, id_column=id_column)
    if low.endswith((".jsonl", ".ndjson")):
        return read_jsonl_with_doc_ids(path, id_column=id_column)
    if low.endswith(".csv"):
        return read_csv_with_doc_ids(path, id_column=id_column)
    # plain .json is deliberately NOT auto-dispatched: pyarrow's reader
    # only parses newline-delimited JSON, and a JSON-array document
    # would die with an opaque parse error inside a Ray task — call
    # read_jsonl_with_doc_ids explicitly if the .json files are NDJSON
    raise ValueError(
        f"cannot infer source format for {path} "
        "(auto-dispatch supports .parquet / .jsonl / .ndjson / .csv)")
