"""Regression tests for the round-2 ADVICE findings.

Each test pins one reviewed bug:
  1. JSONL shard schema divergence: a later shard's EXTRA field must not
     leak into the dataset (pyarrow's default unexpected_field_behavior
     ='infer' appends it even with explicit_schema set)
  2. update_document on a nonexistent / tombstoned doc_id raises
     KeyError instead of silently appending a duplicate and inflating
     the tombstone set
  3. simhash tokenization matches the DuckDB oracle's RE2 '\\s+'
     (ASCII whitespace) — Unicode whitespace like NBSP stays inside
     tokens on BOTH sides
  4. SearchActor emits a TYPED qid column even when every query in the
     batch returns zero rows (untyped pa.array([]) is null-typed →
     mixed block schemas in batch_search sinks)
  5. update_document returns the id of the doc IT appended (local
     value, not shared instance state) and appends BEFORE tombstoning
"""
import json
import os

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
class TestJsonlSchemaPinning:
    def test_extra_field_in_later_shard_is_ignored(self, tmp_path):
        d = tmp_path / "jl"
        d.mkdir()
        with open(d / "a.jsonl", "w") as f:
            f.write(json.dumps({"text": "alpha", "lang": "en"}) + "\n")
        with open(d / "b.jsonl", "w") as f:
            f.write(json.dumps({"text": "beta", "lang": "fr",
                                "surprise": 42}) + "\n")
        from yetisearch_ray.sources.text_sources import read_jsonl_with_doc_ids

        ds = read_jsonl_with_doc_ids(str(d))
        t = ds.take_all()
        cols = set(t[0].keys())
        assert cols == {"text", "lang", "doc_id"}
        assert all(set(r.keys()) == cols for r in t)

    def test_missing_field_in_later_shard_is_null(self, tmp_path):
        d = tmp_path / "jl2"
        d.mkdir()
        with open(d / "a.jsonl", "w") as f:
            f.write(json.dumps({"text": "alpha", "lang": "en"}) + "\n")
        with open(d / "b.jsonl", "w") as f:
            f.write(json.dumps({"text": "beta"}) + "\n")
        from yetisearch_ray.sources.text_sources import read_jsonl_with_doc_ids

        rows = read_jsonl_with_doc_ids(str(d)).take_all()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[0]["lang"] == "en"
        assert by_id[1]["lang"] is None


@pytest.mark.usefixtures("ray_session")
class TestUpdateDocumentContract:
    @pytest.fixture()
    def ys(self, tmp_path):
        from yetisearch_ray.facade import YetiSearchRay

        ys = YetiSearchRay(str(tmp_path / "upd"))
        ys.create_index("b", fields=["title", "content"],
                        store_columns=["title", "content"])
        ys.index_batch("b", [
            {"content": {"title": "Rocket", "content": "rocket science"}},
            {"content": {"title": "Ocean", "content": "deep ocean current"}},
        ])
        return ys

    def test_nonexistent_id_raises_and_leaves_no_tombstone(self, ys):
        from yetisearch_ray.index.manage import tombstones

        before = tombstones(ys._dir("b"))
        with pytest.raises(KeyError):
            ys.update_document("b", 999_999, {"content": {"title": "X",
                                                          "content": "y"}})
        assert tombstones(ys._dir("b")) == before
        assert ys.count_documents("b") == 2

    def test_update_on_empty_index_raises_keyerror(self, tmp_path):
        """An index with no documents yet (right after create_index)
        must raise the documented KeyError, not ArrowInvalid from
        projecting a column on an empty docstore directory."""
        from yetisearch_ray.facade import YetiSearchRay

        ys = YetiSearchRay(str(tmp_path / "empty_upd"))
        ys.create_index("b", fields=["title", "content"])
        with pytest.raises(KeyError):
            ys.update_document("b", 0, {"content": {"title": "X",
                                                    "content": "y"}})

    def test_update_replaces_and_returns_fresh_id(self, ys):
        old = ys.last_assigned_ids[0]
        new_id = ys.update_document(
            "b", old, {"content": {"title": "Rocket v2",
                                   "content": "rocket reusable booster"}})
        assert new_id != old
        assert ys.count_documents("b") == 2
        got = ys.search("b", "reusable", with_docs=True)
        assert new_id in got["doc_id"].to_pylist()
        assert old not in ys.search("b", "rocket",
                                    with_docs=True)["doc_id"].to_pylist()

    def test_double_update_rejects_tombstoned_id(self, ys):
        old = ys.last_assigned_ids[0]
        ys.update_document("b", old, {"content": {"title": "R2",
                                                  "content": "rocket two"}})
        with pytest.raises(KeyError):
            ys.update_document("b", old, {"content": {"title": "R3",
                                                      "content": "rocket три"}})


class TestSimhashTokenizerMatchesRe2:
    def test_nbsp_stays_inside_token_like_re2(self):
        import duckdb

        from yetisearch_ray.pipelines.dedup import _ws_tokens

        s = "a b c d\te "
        py = _ws_tokens(s)
        sql = duckdb.sql(
            "SELECT list_filter(string_split_regex(?, '\\s+'), "
            "x -> x <> '')", params=[s]).fetchone()[0]
        assert py == sql == ["a b", "c d", "e"]

    def test_ascii_whitespace_splits(self):
        from yetisearch_ray.pipelines.dedup import _ws_tokens

        assert _ws_tokens(" a\tb\nc\fd\re  ") == ["a", "b", "c", "d", "e"]
        assert _ws_tokens(None) == []

    def test_simhash_pairs_match_oracle_on_unicode_ws_corpus(
            self, ray_session, tmp_path):
        import duckdb
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import simhash_near_pairs
        from yetisearch_ray.pipelines.oracles import simhash_pairs_sql

        # NBSP inside tokens: docs 1/2 identical, doc 3 shares the
        # visible words but splits on plain spaces → different tokens
        rows = [
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 2, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 3, "text": "alpha beta gamma delta epsilon"},
            {"doc_id": 4, "text": "totally different words here now"},
        ]
        got = (simhash_near_pairs(rd.from_items(rows), max_hamming=3)
               .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", pa.Table.from_pylist(rows))
        want = (con.execute(simhash_pairs_sql(3)).fetch_df()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        assert got[["id_a", "id_b"]].values.tolist() == \
            want[["id_a", "id_b"]].values.tolist()
        assert (1, 2) in {tuple(p) for p in got[["id_a", "id_b"]].values}


@pytest.mark.usefixtures("ray_session")
class TestSearchActorEmptyBatchSchema:
    def test_all_empty_batch_has_typed_qid(self, built_index):
        from yetisearch_ray.search.engine import SearchActor

        actor = SearchActor(built_index)
        out = actor(pa.table({
            "qid": pa.array([7, 8], pa.int64()),
            "query": pa.array(["zzzznope qqqqnada", "xxxxnothing wwwwnone"]),
        }))
        assert out.num_rows == 0
        assert out.schema.field("qid").type == pa.int64()
        assert out.schema.field("doc_id").type == pa.uint64()


@pytest.mark.usefixtures("ray_session")
class TestSearchActorPerQueryOptions:
    """Per-row `options` JSON rides the query batch: a mixed workload
    (boosted / dis_max / field-restricted) serves from ONE actor pool —
    regression for the bench crash where `parse^2 buffer` reached the
    engine in smart mode and the term_boosts guard raised."""

    def test_options_column_routes_modes(self, built_index):
        import json

        from yetisearch_ray.search.engine import (SearchActor, SearchEngine,
                                                  open_index)

        actor = SearchActor(built_index)
        out = actor(pa.table({
            "qid": pa.array([0, 1, 2], pa.int64()),
            "query": pa.array(["parse^2 buffer", "parse buffer", "parse"]),
            "options": pa.array([json.dumps({"mode": "or"}),
                                 json.dumps({"mode": "or", "dismax": True,
                                             "tie_breaker": 0.3}),
                                 json.dumps({})]),
        }))
        assert out.num_rows > 0
        eng = SearchEngine(open_index(built_index))
        want = eng.search("parse^2 buffer", limit=10, mode="or")
        got = out.filter(pa.compute.equal(out["qid"], 0))
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()

    def test_smart_mode_boost_still_raises_without_options(self, built_index):
        from yetisearch_ray.search.engine import SearchActor

        actor = SearchActor(built_index)
        with pytest.raises(ValueError, match="term_boosts"):
            actor(pa.table({
                "qid": pa.array([0], pa.int64()),
                "query": pa.array(["parse^2 buffer"]),
            }))
