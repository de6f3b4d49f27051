"""Percolation (reverse search): registered queries vs the doc stream.

Extension beyond the reference (no reverse-search surface there; forward
path is `src/Search/SearchEngine.php:204-273`) — the Elasticsearch
percolator / Lucene Monitor shape. Ground truth is recomputed by brute
force here and by DuckDB SQL in the driver oracle."""

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _brute(docs, queries):
    hits = []
    for qid, q, mode in queries:
        terms = set(q.lower().split())
        for doc_id, text in docs:
            have = set(text.lower().replace(".", " ").split())
            ok = terms <= have if mode == "and" else bool(terms & have)
            if ok:
                hits.append((qid, doc_id))
    return sorted(hits)


class TestPercolate:
    def test_planted_docs(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.percolate import percolate

        docs = [
            (0, "alpha beta gamma"),
            (1, "alpha delta"),
            (2, "beta gamma delta"),
            (3, "nothing relevant here"),
            (4, "alpha beta"),
        ]
        pq.write_table(
            pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                      "text": [t for _, t in docs]}),
            os.path.join(tmp_path, "documents.parquet"))
        queries = [(1, "alpha beta", "and"), (2, "delta gamma", "or"),
                   (3, "missingterm", "or")]
        got = percolate(str(tmp_path), queries)
        want = pd.DataFrame(_brute(docs, queries),
                            columns=["query_id", "doc_id"])
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))

    def test_and_vs_or_on_corpus(self, ray_session):
        """On the real sf0.001 corpus: AND hits ⊆ each term's OR hits,
        and results match a pandas recomputation via the same tokenizer."""
        import pyarrow.parquet as pq

        from yetisearch_ray.analysis.tokenizer import tokenize
        from yetisearch_ray.pipelines.percolate import percolate

        queries = [(1, "merge window", "and"), (2, "merge window", "or")]
        got = percolate(SF, queries)
        t = pq.read_table(os.path.join(SF, "documents.parquet"),
                          columns=["doc_id", "text"]).to_pandas()
        want = []
        for _, row in t.iterrows():
            have = set(tokenize(row.text))
            if {"merge", "window"} <= have:
                want.append((1, row.doc_id))
            if {"merge", "window"} & have:
                want.append((2, row.doc_id))
        want = pd.DataFrame(sorted(want), columns=["query_id", "doc_id"])
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))
        and_hits = set(got[got.query_id == 1].doc_id)
        or_hits = set(got[got.query_id == 2].doc_id)
        assert and_hits <= or_hits and len(or_hits) > 0

    def test_empty_and_bad_mode(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.percolate import PercolateStage, percolate

        with pytest.raises(ValueError):
            PercolateStage([(1, "x", "not")])
        pq.write_table(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": ["plain words"]}),
                       os.path.join(tmp_path, "documents.parquet"))
        got = percolate(str(tmp_path), [(1, "absent", "and")])
        assert list(got.columns) == ["query_id", "doc_id"] and len(got) == 0
