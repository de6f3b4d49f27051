"""Tests for pipelines/sketches.py: exact distributed quantiles
(histogram-refinement selection), HyperLogLog, exact distinct count."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yetisearch_ray.pipelines import sketches


def _ds_from_numpy(vals, col, n_blocks=8):
    import ray.data as rd

    t = pa.table({col: pa.array(vals)})
    return rd.from_arrow(t).repartition(n_blocks)


class TestQuantiles:
    def test_matches_numpy_disc_semantics(self, ray_session):
        rng = np.random.default_rng(7)
        vals = rng.normal(100.0, 25.0, size=20_000)
        ds = _ds_from_numpy(vals, "x")
        qs = (0.1, 0.5, 0.9, 0.99)
        out = sketches.quantiles_disc(ds, "x", qs=qs, bins=256,
                                      max_candidates=500)
        s = np.sort(vals)
        n = s.size
        for q, got in zip(out["q"], out["value"]):
            r = max(1, int(math.ceil(q * n)))  # percentile_disc rank
            assert got == pytest.approx(round(float(s[r - 1]), 4), abs=1e-9)

    def test_heavy_duplicates_and_single_value(self, ray_session):
        # massive ties: refinement bracket can never shrink below a point
        vals = np.concatenate([np.full(5000, 3.5), np.full(5000, 7.25),
                               np.array([0.0, 100.0])])
        ds = _ds_from_numpy(vals, "x", n_blocks=4)
        out = sketches.quantiles_disc(ds, "x", qs=(0.25, 0.75), bins=64,
                                      max_candidates=100)
        s = np.sort(vals)
        for q, got in zip(out["q"], out["value"]):
            r = max(1, int(math.ceil(q * s.size)))
            assert got == round(float(s[r - 1]), 4)

    def test_extremes(self, ray_session):
        vals = np.arange(1000, dtype=np.float64)
        ds = _ds_from_numpy(vals, "x", n_blocks=3)
        out = sketches.quantiles_disc(ds, "x", qs=(0.0, 1.0), bins=32)
        assert list(out["value"]) == [0.0, 999.0]


class TestHLL:
    def test_error_within_bound_ints(self, ray_session):
        n_true = 5000
        vals = np.repeat(np.arange(n_true, dtype=np.int64), 3)
        ds = _ds_from_numpy(vals, "k", n_blocks=8)
        est, m = sketches.hll_distinct(ds, "k", p=12)
        sigma = 1.04 / math.sqrt(m)
        assert abs(est - n_true) / n_true < 4 * sigma

    def test_merge_invariance(self, ray_session):
        # the same values split across different block counts must give
        # the IDENTICAL estimate (registers merge by max = associative)
        vals = np.arange(2000, dtype=np.int64)
        e1, _ = sketches.hll_distinct(_ds_from_numpy(vals, "k", 2), "k")
        e2, _ = sketches.hll_distinct(_ds_from_numpy(vals, "k", 16), "k")
        assert e1 == pytest.approx(e2, rel=0)

    def test_strings(self, ray_session):
        vals = [f"user-{i % 800}" for i in range(4000)]
        import ray.data as rd
        ds = rd.from_arrow(pa.table({"s": pa.array(vals)})).repartition(4)
        est, m = sketches.hll_distinct(ds, "s", p=12)
        assert abs(est - 800) / 800 < 4 * (1.04 / math.sqrt(m))


class TestDistinct:
    def test_exact(self, ray_session):
        vals = np.concatenate([np.arange(1234, dtype=np.int64)] * 5)
        ds = _ds_from_numpy(vals, "k", n_blocks=8)
        assert sketches.distinct_count(ds, "k") == 1234


class TestAntiJoin:
    def test_against_pandas(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        cust = pd.DataFrame({
            "c_custkey": np.arange(200, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(200)],
            "c_acctbal": rng.uniform(0, 1000, 200).round(2),
        })
        orders = pd.DataFrame({
            "o_custkey": rng.choice(150, size=600).astype(np.int64),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "3-MEDIUM"], size=600),
        })
        cust.to_parquet(tmp_path / "customer.parquet", index=False)
        orders.to_parquet(tmp_path / "orders.parquet", index=False)

        from yetisearch_ray.pipelines.relational import (
            customers_without_orders)
        got = customers_without_orders(str(tmp_path), k=500)

        urgent = set(orders.loc[
            orders.o_orderpriority == "1-URGENT", "o_custkey"])
        want = (cust[~cust.c_custkey.isin(urgent)]
                .sort_values("c_custkey").reset_index(drop=True))
        assert list(got.c_custkey) == list(want.c_custkey)
        assert list(got.c_name) == list(want.c_name)


class TestBigramLM:
    def test_matches_local_reference(self, ray_session, tmp_path):
        import collections
        import math as m

        docs = ["the cat sat on the mat",
                "the dog sat on the log",
                "cat and dog and cat",
                "single"]
        pdf = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                            "text": docs})
        pdf.to_parquet(tmp_path / "documents.parquet", index=False)

        import ray.data as rd
        from yetisearch_ray.pipelines.textstats import bigram_lm_scores
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
        got = bigram_lm_scores(ds, alpha=0.1, num_partitions=2)

        # local reference
        toks = [d.split() for d in docs]
        cu = collections.Counter(w for tl in toks for w in tl)
        cb = collections.Counter((tl[i], tl[i + 1])
                                 for tl in toks for i in range(len(tl) - 1))
        V = len(cu)
        rows = []
        for i, tl in enumerate(toks):
            bs = [(tl[j], tl[j + 1]) for j in range(len(tl) - 1)]
            if not bs:
                continue  # docs with no bigram are excluded
            lp = [m.log((cb[b] + 0.1) / (cu[b[0]] + 0.1 * V)) for b in bs]
            rows.append((i, len(bs), round(sum(lp) / len(lp), 4)))
        want = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "avg_logp"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert 3 not in set(got.doc_id)  # the 1-token doc has no bigrams


class TestTfidfTopk:
    def test_matches_local_reference_and_duckdb(self, ray_session, tmp_path):
        import collections
        import math as m

        import duckdb

        docs = ["the cat sat on the mat",
                "the dog sat on the log log log",
                "cat and dog and cat plus a rare xylophone",
                "mat mat mat dog"]
        pdf = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                            "text": docs})
        pdf.to_parquet(tmp_path / "documents.parquet", index=False)

        import ray.data as rd
        from yetisearch_ray.pipelines import oracles
        from yetisearch_ray.pipelines.textstats import tfidf_topk
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
        got = tfidf_topk(ds, k=3, num_partitions=2)

        # local reference
        toks = [d.split() for d in docs]
        n = float(len(docs))
        df = collections.Counter(w for tl in toks for w in set(tl))
        rows = []
        for i, tl in enumerate(toks):
            tf = collections.Counter(tl)
            scored = sorted(((round(c * m.log(n / df[w]), 6), w, c)
                             for w, c in tf.items()),
                            key=lambda x: (-x[0], x[1]))[:3]
            rows += [(i, w, c, s, r + 1)
                     for r, (s, w, c) in enumerate(scored)]
        want = pd.DataFrame(rows, columns=["doc_id", "term", "tf",
                                           "tfidf", "term_rank"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        # and the SQL oracle at k=5 over the real corpus slice
        sf = "/root/testdata/sf0.001"
        ds2 = rd.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"])
        got2 = tfidf_topk(ds2, k=5)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want2 = con.execute(oracles.TFIDF_TOPK_SQL).fetchdf()
        pd.testing.assert_frame_equal(got2, want2, check_dtype=False)
        # rare term beats hot terms within its doc
        top_doc2 = got2[got2.doc_id == got2.doc_id.iloc[0]]
        assert (top_doc2.tfidf.values[:-1] >= top_doc2.tfidf.values[1:]).all()


class TestEntropyStats:
    def test_matches_local_reference_and_duckdb(self, ray_session, tmp_path):
        import collections
        import math as m

        import duckdb

        docs = ["aaaa", "abab cdcd", "the quick brown fox", "", "x x x y"]
        pdf = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                            "text": docs})
        pdf.to_parquet(tmp_path / "documents.parquet", index=False)

        import ray.data as rd
        from yetisearch_ray.pipelines import oracles
        from yetisearch_ray.pipelines.textstats import entropy_stats
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
        got = entropy_stats(ds).to_pandas().set_index("doc_id")

        def ent(items):
            c = collections.Counter(items)
            n = sum(c.values())
            return round(-sum((v / n) * m.log(v / n) for v in c.values()),
                         6) if n else 0.0

        for i, d in enumerate(docs):
            assert got.loc[i, "char_entropy"] == ent(list(d))
            assert got.loc[i, "word_entropy"] == ent(d.split())
        assert got.loc[0, "char_entropy"] == 0.0  # single-symbol doc
        assert got.loc[3, "n_chars"] == 0         # empty doc -> zeros

        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        want = con.execute(oracles.ENTROPY_STATS_SQL).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(), want,
                                      check_dtype=False)


class TestDsirLogweights:
    def test_discriminates_and_matches_duckdb(self, ray_session):
        import duckdb

        import ray.data as rd
        from yetisearch_ray.pipelines import oracles
        from yetisearch_ray.pipelines.textstats import dsir_logweights

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id", "text", "source"])
        got = dsir_logweights(ds, target_source="src0").to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = con.execute(oracles.dsir_logweights_sql("src0")).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                      check_dtype=False)
        # the importance model must rank the target slice far above the rest
        src = pd.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "source"])
        j = got.merge(src, on="doc_id")
        mean_t = j.loc[j.source == "src0", "logw"].mean()
        mean_o = j.loc[j.source != "src0", "logw"].mean()
        assert mean_t > mean_o + 5.0


class TestCcnetBuckets:
    def test_tertiles_and_duckdb(self, ray_session):
        import duckdb

        import ray.data as rd
        from yetisearch_ray.pipelines import oracles
        from yetisearch_ray.pipelines.textstats import ccnet_ppl_buckets

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"])
        got = ccnet_ppl_buckets(ds)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = con.execute(oracles.CCNET_BUCKETS_SQL).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                      check_dtype=False)
        # near-exact thirds, and bucket order matches fluency order
        sizes = got.ppl_bucket.value_counts()
        assert abs(sizes["head"] - sizes["tail"]) <= 2
        assert (got.loc[got.ppl_bucket == "head", "avg_logp"].min()
                >= got.loc[got.ppl_bucket == "middle", "avg_logp"].max())
        assert (got.loc[got.ppl_bucket == "middle", "avg_logp"].min()
                >= got.loc[got.ppl_bucket == "tail", "avg_logp"].max())


class TestSourceTokenStats:
    def test_matches_duckdb_and_local(self, ray_session, tmp_path):
        import duckdb

        import ray.data as rd
        from yetisearch_ray.pipelines import oracles
        from yetisearch_ray.pipelines.textstats import source_token_stats

        docs = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["a", "a", "b", "b", "b", "c"],
            "text": ["the cat's cat", "dog dog dog", "x y z", "x x",
                     "", "it's 42 !!"],
        })
        docs.to_parquet(tmp_path / "documents.parquet", index=False)
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
        got = source_token_stats(ds).set_index("source")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        want = con.execute(oracles.source_token_stats_sql()).fetchdf()
        pd.testing.assert_frame_equal(got.reset_index(), want,
                                      check_dtype=False)
        # hand-checked: source a has words {the, cat's, cat, dog} = 4
        # distinct; "cat's" splits into 2 BPE-ish subwords (cat + 's)
        assert got.loc["a", "distinct_terms"] == 4
        assert got.loc["a", "n_tokens"] == 6
        assert got.loc["a", "n_subwords"] == 7
        assert got.loc["a", "fertility"] == round(7 / 6, 6)
        # empty doc counts toward n_docs but adds no tokens
        assert got.loc["b", "n_docs"] == 3


class TestHeavyHitters:
    """Two-pass Misra-Gries exact top-k (sketches.heavy_hitters)."""

    def _zipf_docs(self, n_docs=1500, vocab=1200, seed=11):
        rng = np.random.default_rng(seed)
        words = np.array([f"w{i:04d}" for i in range(vocab)])
        p = 1.0 / np.arange(1, vocab + 1)
        p /= p.sum()
        return [" ".join(rng.choice(words, size=40, p=p))
                for _ in range(n_docs)]

    def _truth(self, docs, k):
        import collections

        from yetisearch_ray.pipelines.dedup import _ws_tokens

        c = collections.Counter(t for d in docs for t in _ws_tokens(d))
        return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def test_token_mode_exact_across_capacities(self, ray_session):
        import ray.data as rd

        docs = self._zipf_docs()
        ds = rd.from_items([{"text": d} for d in docs]).repartition(8)
        exp = self._truth(docs, 50)
        # cap 32 forces heavy truncation (fallback), 512 proves via the
        # MG bound, 4096 never truncates (bound == 0 fast path)
        for cap in (32, 512, 4096):
            out = sketches.heavy_hitters(ds, "text", k=50, capacity=cap,
                                         tokens=True)
            assert list(zip(out.term, out.cnt)) == exp, f"capacity={cap}"

    def test_column_mode_and_ties(self, ray_session):
        import collections

        import ray.data as rd

        # every value appears exactly 3 times -> all ties, term ASC order
        vals = [v for v in range(37) for _ in range(3)]
        ds = rd.from_items([{"x": v} for v in vals]).repartition(4)
        out = sketches.heavy_hitters(ds, "x", k=10, capacity=8)
        exp = sorted(((str(v), 3) for v in range(37)),
                     key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(out.term, out.cnt)) == exp
        assert out.cnt.dtype == np.int64

    def test_fewer_distinct_than_k(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"x": "a"}] * 5 + [{"x": "b"}] * 2)
        out = sketches.heavy_hitters(ds, "x", k=10, capacity=4)
        assert list(zip(out.term, out.cnt)) == [("a", 5), ("b", 2)]

    def test_empty_and_null_only(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"text": None}, {"text": "   "}])
        out = sketches.heavy_hitters(ds, "text", k=5, tokens=True)
        assert len(out) == 0
        assert list(out.columns) == ["term", "cnt"]
