"""JSONL / CSV sources: deterministic doc_ids, index-build parity with
the parquet source over identical content."""
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


ROWS = [
    {"repo": "r0", "path": f"src/f{i}.py", "commit": "c0", "lang": "python",
     "content": f"def handler_{i}(): return parse(buffer_{i % 7})"}
    for i in range(40)
]


def _write_shards(tmpdir, writer, ext, shards=3):
    os.makedirs(tmpdir, exist_ok=True)
    per = (len(ROWS) + shards - 1) // shards
    for s in range(shards):
        writer(ROWS[s * per:(s + 1) * per],
               os.path.join(tmpdir, f"part-{s:02d}{ext}"))


def _write_jsonl(rows, path):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _write_csv(rows, path):
    import csv

    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def _write_parquet(rows, path):
    pq.write_table(pa.Table.from_pylist(rows), path)


@pytest.mark.usefixtures("ray_session")
class TestTextSources:
    def test_jsonl_ids_dense_and_ordered(self, tmp_path):
        from yetisearch_ray.sources import read_jsonl_with_doc_ids

        d = str(tmp_path / "jl")
        _write_shards(d, _write_jsonl, ".jsonl")
        ds = read_jsonl_with_doc_ids(d)
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        ids = sorted(t["doc_id"].to_pylist())
        assert ids == list(range(len(ROWS)))
        # row ordering follows (file order x in-file order)
        srt = t.sort_by("doc_id")
        assert srt["path"][0].as_py() == "src/f0.py"
        assert ds._ys_row_count == len(ROWS)

    def test_csv_matches_jsonl(self, tmp_path):
        from yetisearch_ray.sources import (read_csv_with_doc_ids,
                                            read_jsonl_with_doc_ids)

        dj, dc = str(tmp_path / "jl"), str(tmp_path / "cs")
        _write_shards(dj, _write_jsonl, ".jsonl")
        _write_shards(dc, _write_csv, ".csv")
        tj = pa.concat_tables(
            list(read_jsonl_with_doc_ids(dj).iter_batches(batch_format="pyarrow"))
        ).sort_by("doc_id")
        tc = pa.concat_tables(
            list(read_csv_with_doc_ids(dc).iter_batches(batch_format="pyarrow"))
        ).sort_by("doc_id")
        assert tj["content"].to_pylist() == tc["content"].to_pylist()
        assert tj["doc_id"].to_pylist() == tc["doc_id"].to_pylist()

    def test_csv_schema_pinned_across_shards(self, tmp_path):
        """A shard whose column values all look numeric must not come
        back with a different inferred type than its siblings."""
        from yetisearch_ray.sources import read_csv_with_doc_ids

        d = tmp_path / "cs"
        d.mkdir()
        _write_csv([{"doc_id_src": i, "content": f"text {i}"}
                    for i in range(5)], str(d / "a.csv"))
        _write_csv([{"doc_id_src": i, "content": str(1000 + i)}  # all digits
                    for i in range(5)], str(d / "b.csv"))
        t = pa.concat_tables(list(read_csv_with_doc_ids(str(d))
                                  .iter_batches(batch_format="pyarrow")))
        assert t.schema.field("content").type == pa.string()
        assert t.num_rows == 10

    def test_json_array_clear_error(self, tmp_path):
        from yetisearch_ray.sources import read_jsonl_with_doc_ids

        p = tmp_path / "arr.json"
        p.write_text(json.dumps(ROWS[:3]))  # JSON array, not NDJSON
        with pytest.raises(ValueError, match="NEWLINE-DELIMITED"):
            read_jsonl_with_doc_ids(str(p))

    def test_any_dispatch_and_index_parity(self, tmp_path):
        """Indexes built from jsonl and parquet shards of the SAME rows
        answer queries identically."""
        from yetisearch_ray.index import IndexConfig, build_index
        from yetisearch_ray.search import SearchEngine, open_index
        from yetisearch_ray.sources import read_any_with_doc_ids

        dj, dp = str(tmp_path / "jl"), str(tmp_path / "pq")
        _write_shards(dj, _write_jsonl, ".jsonl")
        _write_shards(dp, _write_parquet, ".parquet")
        res = {}
        for name, src in [("jsonl", dj), ("parquet", dp)]:
            cfg = IndexConfig(fields=[("path", "path"), ("content", "content")],
                              language_column="lang",
                              store_columns=["repo", "path", "content"],
                              num_partitions=4)
            idx = str(tmp_path / f"idx_{name}")
            build_index(read_any_with_doc_ids(src), idx, cfg)
            eng = SearchEngine(open_index(idx), cache_ttl=0.0)
            r = eng.search("parse", limit=10, normalize=False)
            res[name] = list(zip(r["doc_id"].to_pylist(),
                                 r["score"].to_pylist()))
        assert res["jsonl"] == res["parquet"]

    def test_csv_quoted_newlines_and_unicode(self, tmp_path):
        """Embedded newlines inside quoted CSV fields and non-ASCII
        content must not desync the counting parse from the read parse
        (both use the same pyarrow parser)."""
        from yetisearch_ray.sources import read_csv_with_doc_ids

        rows = [
            {"path": "a.py", "content": "line one\nline two été"},
            {"path": "b.py", "content": 'quote " inside, and 中文'},
            {"path": "c.py", "content": "plain"},
        ]
        d = tmp_path / "csvnl"
        d.mkdir()
        _write_csv(rows, str(d / "a.csv"))
        t = pa.concat_tables(list(read_csv_with_doc_ids(str(d))
                                  .iter_batches(batch_format="pyarrow")))
        assert t.num_rows == 3
        assert sorted(t["doc_id"].to_pylist()) == [0, 1, 2]
        srt = t.sort_by("doc_id")
        assert srt["content"][0].as_py() == "line one\nline two été"
        assert "中文" in srt["content"][1].as_py()
