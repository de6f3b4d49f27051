"""Unit tests for the training-data pipeline operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup_with_planted_dups(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import exact_dedup, exact_dedup_rows

        rows = [{"doc_id": i, "text": f"unique text {i}"} for i in range(10)]
        rows += [{"doc_id": 100 + i, "text": "duplicated body"} for i in range(3)]
        ds = rd.from_items(rows)
        surv = exact_dedup(ds).to_pandas()
        assert len(surv) == 11
        dup_row = surv[surv.doc_id >= 100]
        assert dup_row.doc_id.tolist() == [100]  # min doc_id survives
        full = exact_dedup_rows(ds).to_pandas()
        assert len(full) == 11 and "text" in full.columns

    def test_minhash_finds_planted_near_dups(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import minhash_dedup_pairs

        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
        near = base.replace("sigma", "sigmoid")  # one-token change
        rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": near}]
        rows += [{"doc_id": 2 + i, "text": f"totally different words here num{i} "
                                           f"foo{i} bar{i} baz{i} qux{i} quux{i}"}
                 for i in range(8)]
        pairs = minhash_dedup_pairs(rd.from_items(rows), threshold=0.5).to_pandas()
        assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))
        assert all(j >= 0.5 for j in pairs.jaccard)

    def test_simhash_exact_dups_hamming_zero(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import simhash_near_pairs

        rows = [{"doc_id": 0, "text": "the same exact document body here"},
                {"doc_id": 1, "text": "the same exact document body here"},
                {"doc_id": 2, "text": "completely unrelated other content words"}]
        pairs = simhash_near_pairs(rd.from_items(rows)).to_pandas()
        assert {(0, 1)} == set(zip(pairs.id_a, pairs.id_b))
        assert pairs.hamming.tolist() == [0]

    def test_decontaminate_planted(self, ray_session):
        """Docs sharing a 3-gram with the benchmark set are flagged with
        the exact distinct-shared-shingle count; clean docs are not."""
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import ngram_decontaminate

        bench = ["the quick brown fox jumps over the lazy dog"]
        rows = [
            {"doc_id": 0, "text": "totally unrelated words here now"},
            # shares exactly the shingles of 'quick brown fox jumps'
            {"doc_id": 1, "text": "a quick brown fox jumps away"},
            {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 3, "text": "short"},  # < n tokens -> no shingles
        ]
        df = (ngram_decontaminate(rd.from_items(rows), bench)
              .to_pandas().set_index("doc_id"))
        assert df.loc[0, "contaminated"] == 0
        assert df.loc[1, "contaminated"] == 1
        assert df.loc[1, "n_hits"] == 2   # 'quick brown fox', 'brown fox jumps'
        assert df.loc[2, "n_hits"] == 7   # all 7 benchmark shingles
        assert df.loc[3, "contaminated"] == 0

    def test_pair_parquet_sinks(self, ray_session, tmp_path):
        """Sink variants stream pair tables to parquet without a driver
        collect and agree with the collecting variants."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import (
            minhash_dedup_pairs, minhash_dedup_pairs_to_parquet,
            simhash_near_pairs, simhash_near_pairs_to_parquet)

        rows = [{"doc_id": 0, "text": "the same exact document body here ok"},
                {"doc_id": 1, "text": "the same exact document body here ok"},
                {"doc_id": 2, "text": "completely unrelated other content"}]
        ds = rd.from_items(rows)
        d1 = str(tmp_path / "mh")
        minhash_dedup_pairs_to_parquet(ds, d1, threshold=0.5)
        got = pq.read_table(d1).to_pandas().sort_values(["id_a", "id_b"])
        want = minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
        assert got[["id_a", "id_b"]].values.tolist() == \
            want[["id_a", "id_b"]].values.tolist()
        d2 = str(tmp_path / "sh")
        simhash_near_pairs_to_parquet(ds, d2)
        got2 = pq.read_table(d2).to_pandas()
        want2 = simhash_near_pairs(ds).to_pandas()
        assert set(zip(got2.id_a, got2.id_b)) == set(zip(want2.id_a, want2.id_b))

    def test_jaccard_query_self_is_top(self, docs_ds):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.dedup import ngram_jaccard_vs_query

        text0 = pq.read_table(f"{SF}/documents.parquet").to_pandas().text.iloc[0]
        top = ngram_jaccard_vs_query(docs_ds, text0, k=3).to_pandas()
        assert top.doc_id.iloc[0] == 0 and top.jaccard.iloc[0] == 1.0


class TestTextstats:
    def test_token_counts(self, docs_ds):
        from yetisearch_ray.pipelines.textstats import token_counts

        df = token_counts(docs_ds).to_pandas()
        assert (df.n_tokens > 0).all()

    def test_quality_bounds(self, docs_ds):
        from yetisearch_ray.pipelines.textstats import quality_scores

        df = quality_scores(docs_ds).to_pandas()
        assert ((df.quality >= 0) & (df.quality <= 1)).all()
        assert ((df.stopword_ratio >= 0) & (df.stopword_ratio <= 1)).all()

    def test_lang_id_deterministic(self, docs_ds):
        from yetisearch_ray.pipelines.textstats import language_id

        a = language_id(docs_ds).to_pandas().sort_values("doc_id")
        b = language_id(docs_ds).to_pandas().sort_values("doc_id")
        assert a.pred_lang.tolist() == b.pred_lang.tolist()
        assert set(a.pred_lang) <= {"en", "fr", "de", "es", "und"}

    def test_rolling_fingerprint(self, docs_ds):
        from yetisearch_ray.pipelines.textstats import rolling_fingerprint

        df = rolling_fingerprint(docs_ds).to_pandas()
        assert df.fingerprints.map(len).min() >= 1

    def test_quality_scores_whitespace_edges(self, ray_session):
        """Trailing newline / empty / whitespace-only texts: n_tokens
        and means must match Python str.split() exactly (the Arrow
        split keeps empty tokens unless re-filtered — regression)."""
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import quality_scores

        cases = ["hello world\n", "", "  ", " the and of a b ", "one"]
        rows = [{"doc_id": i, "text": s} for i, s in enumerate(cases)]
        df = (quality_scores(rd.from_items(rows)).to_pandas()
              .set_index("doc_id"))
        for i, s in enumerate(cases):
            toks = s.split()
            assert df.loc[i, "n_tokens"] == len(toks), s
            want_ml = (round(sum(map(len, toks)) / len(toks), 6)
                       if toks else 0.0)
            assert df.loc[i, "mean_token_len"] == want_ml, s

    def test_repetition_stats_planted(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import repetition_stats

        rows = [
            {"doc_id": 0, "text": "a b c\na b c\nunique line"},   # 1/3 dup lines
            {"doc_id": 1, "text": "x y x y x y"},                 # grams: 5 total, 2 distinct
            {"doc_id": 2, "text": "all distinct words here"},
            {"doc_id": 3, "text": ""},
        ]
        df = (repetition_stats(rd.from_items(rows)).to_pandas()
              .set_index("doc_id"))
        assert abs(df.loc[0, "dup_line_frac"] - 1 / 3) < 1e-6
        assert abs(df.loc[1, "dup_ngram_frac"] - 3 / 5) < 1e-6
        assert df.loc[2, "dup_line_frac"] == 0.0
        assert df.loc[2, "dup_ngram_frac"] == 0.0
        assert df.loc[3, "dup_line_frac"] == 0.0 and df.loc[3, "dup_ngram_frac"] == 0.0

    def test_token_counts_oracle_parity_edge_cases(self):
        """Vectorized counts must equal the DuckDB oracle (both RE2) on
        empties, whitespace-only, leading/trailing space, NBSP, unicode."""
        import duckdb
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import token_counts

        cases = ["", "  ", "a b", " a  b ", "a\u00a0b", "x\n\ny",
                 "héllo wörld!", "a'll b's 123 ...", "l1\u2028l2"]
        rows = [{"doc_id": i, "text": s} for i, s in enumerate(cases)]
        got = (token_counts(rd.from_items(rows)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", pa.table({
            "doc_id": pa.array(range(len(cases)), pa.int64()),
            "text": pa.array(cases, pa.string())}))
        from yetisearch_ray.pipelines.oracles import TOKEN_COUNTS_SQL
        want = (con.execute(TOKEN_COUNTS_SQL).fetchdf()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.n_tokens.tolist() == want.n_tokens.tolist()
        assert got.n_subwords.tolist() == want.n_subwords.tolist()


class TestPacking:
    def test_pack_token_bins_prefix_sum(self, ray_session):
        """bin = floor(prefix-sum-before / budget), independent of Ray
        block/range boundaries (range_size smaller than the doc count
        forces the cross-range offset path)."""
        import ray.data as rd

        rows = [{"doc_id": i, "n_tokens": 100} for i in range(20)]
        from yetisearch_ray.pipelines.curation import pack_token_bins

        got = pack_token_bins(rd.from_items(rows), budget=250,
                              range_size=4).to_pandas()
        # prefix sums 0,100,...,1900 -> bins 0,0,0,1,1,2,2,(2),3...
        want = [(i * 100) // 250 for i in range(20)]
        assert got.bin_id.tolist() == want
        assert got.doc_id.tolist() == list(range(20))


class TestRelationalJoin:
    def test_order_revenue_join_matches_duckdb(self, ray_session):
        """Native Dataset.join (hash, both sides shuffled) vs DuckDB."""
        import duckdb

        from yetisearch_ray.pipelines.oracles import ORDER_REVENUE_SQL
        from yetisearch_ray.pipelines.relational import order_revenue_topk

        got = order_revenue_topk(SF, k=10)
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(ORDER_REVENUE_SQL).fetchdf()
        assert got.l_orderkey.tolist() == want.l_orderkey.tolist()
        assert got.revenue.tolist() == want.revenue.tolist()


class TestCuration:
    def test_quota_null_group_is_one_partition(self, ray_session):
        """SQL PARTITION BY parity: NULL groups form one partition and
        must not crash Ray's sort-based groupby (None vs str compare)."""
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import quota_per_group

        rows = [{"doc_id": 0, "source": None}, {"doc_id": 1, "source": "a"},
                {"doc_id": 2, "source": None}, {"doc_id": 3, "source": "a"},
                {"doc_id": 4, "source": None}, {"doc_id": 5, "source": "b"}]
        df = quota_per_group(rd.from_items(rows), group_col="source",
                             n=2).to_pandas()
        assert df.doc_id.tolist() == [0, 1, 2, 3, 5]
        assert df[df.doc_id.isin([0, 2])].source.isna().all()
        assert "_gkey" not in df.columns

    def test_quota_per_group(self, ray_session):
        """First-n-per-group by id, with a hot group exceeding the cap;
        shuffle volume is bounded by the quota via map-side partials."""
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import quota_per_group

        rows = [{"doc_id": i, "source": "hot"} for i in range(50)]
        rows += [{"doc_id": 100 + i, "source": f"s{i}"} for i in range(4)]
        df = quota_per_group(rd.from_items(rows), group_col="source",
                             n=3).to_pandas()
        hot = df[df.source == "hot"].doc_id.tolist()
        assert hot == [0, 1, 2]
        assert len(df) == 3 + 4  # 3 from hot, all 4 singletons
        assert df.doc_id.tolist() == sorted(df.doc_id.tolist())


class TestAnn:
    def test_self_similarity_is_top(self, emb_ds):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.ann import cosine_topk

        q = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().embedding.iloc[5]
        top = cosine_topk(emb_ds, q, k=3).to_pandas()
        assert top.vec_id.iloc[0] == 5 and abs(top.cosine.iloc[0] - 1.0) < 1e-9

    def test_ivf_full_probe_equals_bruteforce(self, emb_ds):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.ann import cosine_topk, ivf_topk

        q = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().embedding.iloc[7]
        bf = cosine_topk(emb_ds, q, k=10).to_pandas()
        ivf = ivf_topk(emb_ds, q, k=10, n_clusters=8, nprobe=None).to_pandas()
        assert bf.vec_id.tolist() == ivf.vec_id.tolist()

    def test_ivf_partial_probe_subset(self, emb_ds):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.ann import cosine_topk, ivf_topk

        q = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().embedding.iloc[7]
        bf = cosine_topk(emb_ds, q, k=5).to_pandas()
        approx = ivf_topk(emb_ds, q, k=5, n_clusters=8, nprobe=3).to_pandas()
        # approximate: top-1 (the query's own cluster) must be found
        assert bf.vec_id.iloc[0] == approx.vec_id.iloc[0]

    def test_near_dup_exact_block_method(self, emb_ds):
        """Block-pair GEMM (distributed, no driver matrix) vs the O(N²)
        definition computed locally."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.ann import embedding_near_dup_pairs

        pairs = (embedding_near_dup_pairs(emb_ds, threshold=0.45,
                                          num_blocks=4)
                 .to_pandas().sort_values(["id_a", "id_b"])
                 .reset_index(drop=True))
        df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        m = np.stack(df.embedding.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ids = df.vec_id.to_numpy()
        want = sorted((int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
                      for i in range(len(ids)) for j in range(i + 1, len(ids))
                      if sims[i, j] >= 0.45)
        assert list(zip(pairs.id_a, pairs.id_b)) == want

    def test_near_dup_ivf_recall_on_planted(self, ray_session):
        """IVF-bucketed pairing finds planted high-cosine near-dups."""
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import embedding_near_dup_pairs

        rng = np.random.default_rng(7)
        base = rng.standard_normal((40, 16))
        # plant 5 near-dup pairs: tiny perturbations of rows 0..4
        planted = base[:5] + 0.01 * rng.standard_normal((5, 16))
        mat = np.vstack([base, planted])
        rows = [{"vec_id": i, "embedding": mat[i].tolist()}
                for i in range(mat.shape[0])]
        ds = rd.from_items(rows)
        got = embedding_near_dup_pairs(
            ds, threshold=0.95, method="ivf", n_clusters=6, nprobe=2,
            sample_size=45).to_pandas()
        found = set(zip(got.id_a, got.id_b))
        for i in range(5):
            assert (i, 40 + i) in found, f"planted pair {i} missed"


class TestMultimodal:
    def test_wav_decode_real_codec(self, ray_session):
        """The audio leg is a REAL stdlib-wave decoder: sample rate,
        duration and windowed RMS must match the analytic sine values."""
        import ray.data as rd

        from yetisearch_ray.pipelines.multimodal import (
            decode_wav_features, to_wav_payloads)

        rows = [{"doc_id": i} for i in range(12)]
        wavs = to_wav_payloads(rd.from_items(rows), seconds=0.25, rate=8000)
        df = decode_wav_features(wavs, n_windows=4).to_pandas()
        assert (df.sample_rate == 8000).all()
        assert (df.n_channels == 1).all()
        assert np.allclose(df.duration_sec, 0.25)
        # sine at amplitude 0.5 -> RMS ~ 0.5/sqrt(2) in every window
        rms = np.stack(df.rms_windows.to_numpy())
        assert np.allclose(rms, 0.5 * 32767 / 32768 / np.sqrt(2), atol=5e-3)

    def test_binary_payload_plumbing(self, docs_ds):
        from yetisearch_ray.pipelines.multimodal import (
            decode_features,
            frame_sample,
            to_binary_payloads,
        )

        payloads = to_binary_payloads(docs_ds, kind="image")
        sch = payloads.schema()
        assert dict(zip(sch.names, [str(t) for t in sch.types]))["payload"] == "binary"
        feats = decode_features(payloads, feature_dim=8, concurrency=2).to_pandas()
        assert feats.features.map(len).eq(8).all()
        frames = frame_sample(payloads, every_n_bytes=64, max_frames=3)
        fdf = frames.to_pandas()
        assert fdf.frame_index.max() <= 2
        assert (fdf.groupby("doc_id").size() >= 1).all()

    def test_resize_plumbing(self, docs_ds):
        from yetisearch_ray.pipelines.multimodal import (resize_images,
                                                         to_binary_payloads)

        payloads = to_binary_payloads(docs_ds.limit(20))
        out = resize_images(payloads, target_w=8, target_h=4).to_pandas()
        assert len(out) == 20
        assert (out.width == 8).all() and (out.height == 4).all()
        assert all(len(p) == 32 for p in out.payload)
        # deterministic: same input -> same bytes
        out2 = resize_images(to_binary_payloads(docs_ds.limit(20)),
                             target_w=8, target_h=4).to_pandas()
        a = out.sort_values("doc_id").payload.tolist()
        b = out2.sort_values("doc_id").payload.tolist()
        assert a == b

    def test_strict_resize_raises(self, ray_session):
        from yetisearch_ray.pipelines.multimodal import ResizeStage

        with pytest.raises(NotImplementedError):
            ResizeStage(strict=True)._resize_one(b"abc")

    def test_strict_decode_raises(self, ray_session):
        from yetisearch_ray.pipelines.multimodal import DecodeStage

        stage = DecodeStage(strict=True)
        t = pa.table({"doc_id": pa.array([1]), "payload": pa.array([b"x"], pa.binary())})
        with pytest.raises(NotImplementedError):
            stage(t)

    def test_decoder_is_deterministic(self, ray_session):
        from yetisearch_ray.pipelines.multimodal import DecodeStage

        a = DecodeStage(feature_dim=4)._decode_one(b"hello")
        b = DecodeStage(feature_dim=4)._decode_one(b"hello")
        assert np.array_equal(a, b)


class TestBatchSearchSink:
    def test_batch_search_to_parquet(self, ray_session, tmp_path):
        """Queries Dataset -> SearchActor pool -> partitioned parquet."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.index import IndexConfig, build_index
        from yetisearch_ray.pipelines.fts_documents import batch_search_to_parquet

        rows = [{"doc_id": i, "path": f"f{i}.py",
                 "content": f"alpha beta{'' if i % 2 else ' gamma'} delta{i}"}
                for i in range(50)]
        idx = str(tmp_path / "idx")
        cfg = IndexConfig(fields=[("path", "path"), ("content", "content")],
                          store_columns=["path", "content"], num_partitions=4)
        build_index(rd.from_items(rows), idx, cfg)
        qds = rd.from_items([{"qid": i, "query": q, "limit": 5}
                             for i, q in enumerate(["alpha", "gamma", "beta"])])
        out = str(tmp_path / "results")
        batch_search_to_parquet(idx, qds, out, concurrency=1, batch_size=4)
        t = pq.read_table(out)
        assert set(t.column_names) == {"qid", "doc_id", "score", "result_rank"}
        got = t.to_pandas()
        assert set(got["qid"]) == {0, 1, 2}
        # 'gamma' occurs only in even docs
        gdocs = set(got[got["qid"] == 1]["doc_id"])
        assert gdocs and all(d % 2 == 0 for d in gdocs)


class TestPpmImage:
    def test_ppm_decode_analytic_means(self, ray_session):
        """The image leg is a REAL P6 decoder: channel means must match
        the synthesized gradients exactly."""
        import ray.data as rd

        from yetisearch_ray.pipelines.multimodal import (
            decode_ppm_features, synth_ppm, _parse_ppm, to_ppm_payloads)

        rows = [{"doc_id": i} for i in range(12)]
        imgs = to_ppm_payloads(rd.from_items(rows), width=32, height=24)
        df = decode_ppm_features(imgs).to_pandas().sort_values("doc_id")
        assert (df.width == 32).all() and (df.height == 24).all()
        for i in range(12):
            img = _parse_ppm(synth_ppm(i, width=32, height=24))
            want = img.reshape(-1, 3).mean(axis=0)
            row = df[df.doc_id == i].iloc[0]
            assert np.allclose([row.mean_r, row.mean_g, row.mean_b],
                               np.round(want, 6))
            # B channel is the id-keyed constant
            assert row.mean_b == (i * 7) % 256

    def test_qoi_codec_spec_roundtrip(self):
        """REAL QOI codec (qoiformat.org): lossless round-trip over
        random and gradient images, plus the spec's chunk families
        exercised by construction (runs, index hits, diffs, luma,
        literals)."""
        from yetisearch_ray.pipelines.multimodal import (
            _parse_ppm, qoi_decode, qoi_encode, synth_ppm)

        rng = np.random.default_rng(42)
        for shape in [(1, 1, 3), (2, 3, 3), (24, 32, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(qoi_decode(qoi_encode(img)), img), shape
        # run-heavy: constant image encodes almost entirely as RUN ops
        flat = np.full((16, 16, 3), 7, np.uint8)
        enc = qoi_encode(flat)
        assert np.array_equal(qoi_decode(enc), flat)
        assert len(enc) < flat.size // 10  # compression actually happened
        # gradient (diff/luma-heavy) from the shared synth
        img = _parse_ppm(synth_ppm(5))
        assert np.array_equal(qoi_decode(qoi_encode(img)), img)

    def test_qoi_decode_stage_matches_ppm_leg(self, ray_session):
        """QOI and PPM legs synthesize the SAME image, so their decoded
        channel means must agree exactly."""
        import ray.data as rd

        from yetisearch_ray.pipelines.multimodal import (
            decode_ppm_features, decode_qoi_features, to_ppm_payloads,
            to_qoi_payloads)

        rows = [{"doc_id": i} for i in range(8)]
        qdf = (decode_qoi_features(to_qoi_payloads(rd.from_items(rows)))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pdf = (decode_ppm_features(to_ppm_payloads(rd.from_items(rows)))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for c in ("width", "height", "mean_r", "mean_g", "mean_b",
                  "brightness"):
            assert (qdf[c] == pdf[c]).all(), c
        assert (qdf["compress_ratio"] > 0).all()

    def test_ppm_parser_comments_and_tiny(self):
        from yetisearch_ray.pipelines.multimodal import _parse_ppm

        p = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
        img = _parse_ppm(p)
        assert img.shape == (2, 2, 3)
        assert img[1, 1].tolist() == [9, 10, 11]

    def test_ppm_resize_chains_into_decode(self, ray_session):
        """synth -> REAL nearest-neighbor resize -> decode chain; the
        resized payload is itself a valid PPM with exact NN pixels."""
        import ray.data as rd

        from yetisearch_ray.pipelines.multimodal import (
            _parse_ppm, decode_ppm_features, resize_ppm, synth_ppm,
            to_ppm_payloads)

        rows = [{"doc_id": i} for i in range(6)]
        imgs = to_ppm_payloads(rd.from_items(rows), width=32, height=24)
        small = resize_ppm(imgs, target_w=8, target_h=6)
        df = decode_ppm_features(small).to_pandas().sort_values("doc_id")
        assert (df.width == 8).all() and (df.height == 6).all()
        # NN-downsample of the deterministic source, computed in numpy
        src = _parse_ppm(synth_ppm(0, width=32, height=24))
        yi = (np.arange(6) * 24) // 6
        xi = (np.arange(8) * 32) // 8
        want = src[yi[:, None], xi[None, :]].reshape(-1, 3).mean(axis=0)
        row = df[df.doc_id == 0].iloc[0]
        assert np.allclose([row.mean_r, row.mean_g, row.mean_b],
                           np.round(want, 6))


class TestPQ:
    def test_pq_adc_recall_vs_exact(self, ray_session):
        """PQ/ADC top-10 must recover most of the exact cosine top-10
        (m=16 subspaces, 64 codes, normalized inputs) and be fully
        deterministic (seeded sample + seeded k-means)."""
        import pyarrow.parquet as pq_
        import ray.data as rd

        from yetisearch_ray.pipelines import ann

        sf = "/root/testdata/sf0.01"
        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        tbl = pq_.read_table(f"{sf}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        recalls = []
        for qid in (1, 2, 3):
            q = np.array(tbl["embedding"][qid].as_py())
            exact = set(ann.cosine_topk(ds, q, k=10).to_pandas().vec_id)
            approx = ann.pq_topk(ds, q, k=10, m=16, n_codes=64).to_pandas()
            again = ann.pq_topk(ds, q, k=10, m=16, n_codes=64).to_pandas()
            assert approx.vec_id.tolist() == again.vec_id.tolist()
            recalls.append(len(exact & set(approx.vec_id)) / 10)
        assert sum(recalls) / len(recalls) >= 0.7, recalls

    def test_pq_encode_shapes(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines import ann

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        cb = ann.pq_train(ds, m=8, n_codes=16)
        assert cb.shape[0] == 8 and cb.shape[1] == 16
        codes = ann.pq_encode(ds, cb).to_pandas()
        assert codes.codes.map(len).eq(8).all()
        assert codes.codes.map(max).le(15).all()

    def test_ivfpq_store_recall_and_pruning(self, ray_session, tmp_path):
        """IVF-PQ store: residual codes per centroid partition; probing
        all partitions recovers plain-PQ recall, fewer probes trade
        recall for reading fewer partitions."""
        import pyarrow.parquet as pq_
        import ray.data as rd

        from yetisearch_ray.pipelines import ann

        sf = "/root/testdata/sf0.01"
        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        out = str(tmp_path / "ivfpq")
        meta = ann.ivfpq_build(ds, out, n_clusters=16, m=16, n_codes=64)
        assert meta["n_clusters"] == 16
        tbl = pq_.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        r_full, r_probe4 = [], []
        for qid in (1, 2, 3):
            q = np.array(tbl["embedding"][qid].as_py())
            exact = set(ann.cosine_topk(ds, q, k=10).to_pandas().vec_id)
            full = ann.ivfpq_search(out, q, k=10, nprobe=None).to_pandas()
            p4 = ann.ivfpq_search(out, q, k=10, nprobe=4).to_pandas()
            r_full.append(len(exact & set(full.vec_id)) / 10)
            r_probe4.append(len(exact & set(p4.vec_id)) / 10)
        assert sum(r_full) / 3 >= 0.6, r_full
        assert sum(r_probe4) / 3 >= 0.4, r_probe4
        assert sum(r_full) >= sum(r_probe4)
        # determinism
        q = np.array(tbl["embedding"][1].as_py())
        a = ann.ivfpq_search(out, q, k=10, nprobe=4).to_pandas()
        b = ann.ivfpq_search(out, q, k=10, nprobe=4).to_pandas()
        assert a.vec_id.tolist() == b.vec_id.tolist()


class TestSubstringDedup:
    """substring_dup_stats: char-50-gram cross-doc duplication signal
    (Lee et al. 2022 suffix-dedup approximation)."""

    def test_matches_brute_force_on_planted_dups(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import substring_dup_stats

        rng = np.random.default_rng(7)
        alpha = np.array(list("abcdefghij "))
        uniq = ["".join(rng.choice(alpha, 120)) for _ in range(8)]
        boiler = "".join(rng.choice(alpha, 80))  # shared 80-char block
        texts = ([u for u in uniq]
                 + [boiler + uniq[0][:30], uniq[1][:20] + boiler]
                 + ["tiny"])                       # < 50 chars -> 0 grams
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = (substring_dup_stats(rd.from_arrow(tbl), gram_len=50)
               .to_pandas().set_index("doc_id"))

        L = 50
        from collections import Counter
        per_doc = [Counter(t[i:i + L] for i in range(max(len(t) - L + 1, 0)))
                   for t in texts]
        df = Counter()
        for c in per_doc:
            df.update(set(c))
        for d, (t, c) in enumerate(zip(texts, per_doc)):
            n_grams = max(len(t) - L + 1, 0)
            n_dup = sum(n for g, n in c.items() if df[g] >= 2)
            assert got.loc[d, "n_grams"] == n_grams, d
            assert got.loc[d, "n_dup_grams"] == n_dup, d
            assert abs(got.loc[d, "dup_frac"]
                       - round(n_dup / max(n_grams, 1), 6)) < 1e-9, d
        # the planted boilerplate must actually fire
        assert got.loc[8, "n_dup_grams"] > 0 and got.loc[9, "n_dup_grams"] > 0
        assert got.loc[10, "n_grams"] == 0 and got.loc[10, "dup_frac"] == 0.0

    def test_exact_dup_docs_are_fully_duplicated(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import substring_dup_stats

        t = "x" * 10 + "the quick brown fox jumps over the lazy dog " * 4
        tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "text": pa.array([t, t], pa.string())})
        got = substring_dup_stats(rd.from_arrow(tbl)).to_pandas()
        assert (got["dup_frac"] == 1.0).all()
        assert (got["n_dup_grams"] == got["n_grams"]).all()


class TestGroupedTopk:
    def test_combiner_survives_multi_block_split(self, ray_session, tmp_path):
        """Per-batch pruning must keep every global per-group winner even
        when a group's rows are scattered across many blocks."""
        import duckdb

        import ray.data as rd
        from yetisearch_ray.pipelines.relational import grouped_topk

        rng = np.random.default_rng(11)
        n = 3000
        tbl = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"s{i % 7}" for i in range(n)], pa.string()),
            # heavy ties to stress the doc_id tie-break
            "n_chars": pa.array(rng.integers(0, 40, n), pa.int64()),
        })
        import pyarrow.parquet as pq
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        import unittest.mock as mock
        real_read = rd.read_parquet

        def chunked_read(path, **kw):
            return real_read(path, override_num_blocks=16, **kw)

        with mock.patch.object(rd, "read_parquet", side_effect=chunked_read):
            got = grouped_topk(str(tmp_path), k=5)

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        want = con.execute("""
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS grp_rank
            FROM documents QUALIFY grp_rank <= 5
            ORDER BY source, grp_rank""").fetchdf()
        want["grp_rank"] = want["grp_rank"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want[got.columns], check_dtype=False)


class TestSignificantTerms:
    """ES-style significant_terms over the BM25-OR match set (foreground
    bounded by `candidates`, background a candidate-filtered corpus
    pass).  Oracle identity is covered by test_oracle_parity; here the
    behavioral contract."""

    def test_contract(self, ray_session):
        from yetisearch_ray.pipelines.fts_documents import significant_terms

        out = significant_terms(SF, terms=("vector", "stream"), k=15,
                                candidates=200, min_fg_df=3)
        assert list(out.columns) == ["term", "fg_df", "bg_df", "score"]
        assert len(out) <= 15 and len(out) > 0
        # query terms are excluded from the output
        assert not set(out["term"]) & {"vector", "stream"}
        # a term can't be in more foreground docs than corpus docs
        assert (out["fg_df"] <= out["bg_df"]).all()
        assert (out["fg_df"] >= 3).all()
        # sorted by (score desc, term asc)
        s = out["score"].to_numpy()
        assert (s[:-1] >= s[1:]).all()
        # over-representation: every surfaced term's fg rate exceeds its
        # bg rate (positive score by construction)
        assert (out["score"] > 0).all()

    def test_empty_match_set(self, ray_session):
        from yetisearch_ray.pipelines.fts_documents import significant_terms

        out = significant_terms(SF, terms=("zzzznotaterm",), k=5)
        assert len(out) == 0
        assert list(out.columns) == ["term", "fg_df", "bg_df", "score"]


class TestDedupParagraphs:
    """Corpus-wide exact paragraph dedup (first occurrence wins,
    short paragraphs exempt).  Oracle identity over documents.parquet is
    covered by test_oracle_parity; here the planted-duplicate contract."""

    def test_planted_duplicates(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import dedup_paragraphs

        boiler = "a very long repeated boilerplate paragraph here"
        fox = "the quick brown fox jumps over"
        docs = [
            (0, f"{fox}\nshort\n{boiler}"),
            (1, f"{boiler}\nunique second line of doc one x"),
            (2, f"short\n{fox}\nanother unique closing line for doc two"),
            (3, boiler),  # fully deduplicated -> dropped
        ]
        ds = rd.from_arrow(pa.table({"doc_id": [d[0] for d in docs],
                                     "text": [d[1] for d in docs]}))
        out = (dedup_paragraphs(ds, min_len=20, num_partitions=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # doc 3 lost its only paragraph and disappears
        assert list(out.doc_id) == [0, 1, 2]
        # doc 0 holds every first occurrence — unchanged
        assert out.loc[0, "text"] == docs[0][1]
        assert out.loc[0, "n_removed"] == 0
        # later occurrences removed, doc rebuilt in order
        assert out.loc[1, "text"] == "unique second line of doc one x"
        assert out.loc[1, "n_removed"] == 1
        # "short" (< min_len) is exempt even though it repeats
        assert out.loc[2, "text"] == (
            "short\nanother unique closing line for doc two")
        assert (out.n_kept + out.n_removed).tolist() == [3, 2, 3]

    def test_no_dups_is_identity(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import dedup_paragraphs

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        out = dedup_paragraphs(ds).to_pandas()
        src = rd.read_parquet(f"{SF}/documents.parquet").to_pandas()
        assert (out.n_removed == 0).all()
        m = out.merge(src, on="doc_id", suffixes=("", "_src"))
        assert len(m) == len(src)
        assert (m.text == m.text_src).all()


class TestCollocations:
    """Adjacent-bigram PMI collocations (oracle identity in
    test_oracle_parity; planted contract here)."""

    def test_planted_collocation_tops(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import collocations

        # "neural network" always adjacent; filler tokens independent
        rng_docs = []
        fill = ["aa", "bb", "cc", "dd", "ee", "ff"]
        for i in range(60):
            toks = [fill[i % 6], "neural", "network", fill[(i + 1) % 6],
                    fill[(i + 2) % 6], fill[(i * 5) % 6]]
            rng_docs.append(" ".join(toks))
        ds = rd.from_arrow(pa.table({"doc_id": list(range(60)),
                                     "text": rng_docs}))
        out = collocations(ds, k=5, min_count=5)
        assert len(out) >= 1
        assert (out.a.iloc[0], out.b.iloc[0]) == ("neural", "network")
        assert out.n_ab.iloc[0] == 60
        # PMI sorted descending
        s = out.pmi.to_numpy()
        assert (s[:-1] >= s[1:]).all()
        # min_count respected
        assert (out.n_ab >= 5).all()

    def test_boundary_not_crossed(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import collocations

        # "x" ends every doc and "y" starts the next — never adjacent
        # WITHIN a doc, so the pair must not appear at any min_count
        ds = rd.from_arrow(pa.table({
            "doc_id": list(range(40)),
            "text": ["q x" if i % 2 == 0 else "y q" for i in range(40)],
        }))
        out = collocations(ds, k=50, min_count=1)
        pairs = set(zip(out.a, out.b))
        assert ("x", "y") not in pairs
        assert ("q", "x") in pairs and ("y", "q") in pairs


class TestWindowedTopk:
    """Per-window top-N event types (oracle identity in
    test_oracle_parity; shape contract here)."""

    def test_shape_and_ranks(self, ray_session):
        from yetisearch_ray.pipelines.events import windowed_topk

        out = windowed_topk(SF, n=3)
        assert list(out.columns) == ["window_start", "event_type", "n", "rk"]
        # every window carries ranks 1..min(3, types present), counts
        # non-increasing within a window
        for _, g in out.groupby("window_start"):
            assert g.rk.tolist() == list(range(1, len(g) + 1))
            assert (g.n.to_numpy()[:-1] >= g.n.to_numpy()[1:]).all()
        assert (out.groupby("window_start").size() <= 3).all()


class TestVocabStats:
    def test_planted_counts(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import vocab_stats

        ds = rd.from_arrow(pa.table({
            "doc_id": [0, 1],
            "text": ["aa bb aa", "bb cc"],
        }))
        out = vocab_stats(ds)
        assert out.n_tokens.iloc[0] == 5
        assert out.n_terms.iloc[0] == 3
        assert out.n_hapax.iloc[0] == 1  # only "cc"
        assert out.type_token_ratio.iloc[0] == round(3 / 5, 6)


class TestDedupIncremental:
    """Append-time generational gate (oracle identity in
    test_oracle_parity; planted contract here)."""

    def test_planted_cross_and_internal_dups(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import exact_dedup_incremental

        base = rd.from_arrow(pa.table({
            "doc_id": [0, 1], "text": ["old news", "evergreen content"]}))
        new = rd.from_arrow(pa.table({
            "doc_id": [10, 11, 12, 13],
            "text": ["old news",           # dup of base -> dropped
                     "fresh take",         # survives
                     "fresh take",         # internal dup -> min id wins
                     "evergreen content"],  # dup of base -> dropped
        }))
        out = (exact_dedup_incremental(new, base, num_partitions=2)
               .to_pandas().sort_values("doc_id"))
        assert out.doc_id.tolist() == [11]
        assert out.text.tolist() == ["fresh take"]


class TestGroupPercentiles:
    def test_percentile_disc_semantics(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import group_percentiles

        # group g: values 1..10 -> p25=ceil(2.5)=3rd -> 3, p50 -> 5,
        # p75 -> 8, p95 -> 10
        tbl = pa.table({"lang": ["g"] * 10 + ["h"],
                        "n_chars": list(range(1, 11)) + [7]})
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        out = group_percentiles(str(tmp_path))
        g = out[out.lang == "g"].iloc[0]
        assert (g.p25, g.p50, g.p75, g.p95) == (3, 5, 8, 10)
        h = out[out.lang == "h"].iloc[0]
        assert (h.p25, h.p50, h.p75, h.p95) == (7, 7, 7, 7)


class TestDedupIncrementalBloom:
    """Bloom-pruned two-phase variant is answer-identical to the exact
    operator, and the filter actually prunes."""

    def test_identical_to_exact_and_prunes(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import (
            exact_dedup_incremental, exact_dedup_incremental_bloom)

        base = rd.from_arrow(pa.table({
            "doc_id": list(range(50)),
            "text": [f"base document number {i}" for i in range(50)]}))
        new_rows = ([f"base document number {i}" for i in range(10)]  # dups
                    + [f"fresh document {i}" for i in range(40)])
        new = rd.from_arrow(pa.table({
            "doc_id": list(range(100, 150)), "text": new_rows}))

        want = (exact_dedup_incremental(new, base, num_partitions=2)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got = (exact_dedup_incremental_bloom(
                   new, base, bloom_bits=1 << 16, num_partitions=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.doc_id.tolist() == want.doc_id.tolist()
        assert got.text.tolist() == want.text.tolist()
        assert len(got) == 40

    def test_tiny_filter_false_positives_still_exact(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import (
            exact_dedup_incremental_bloom)

        # 64-bit filter over 30 base hashes saturates -> everything is a
        # "possible member", forcing the exact verify join to do the work
        base = rd.from_arrow(pa.table({
            "doc_id": list(range(30)),
            "text": [f"b{i}" for i in range(30)]}))
        new = rd.from_arrow(pa.table({
            "doc_id": [100, 101], "text": ["b3", "genuinely new"]}))
        out = exact_dedup_incremental_bloom(
            new, base, bloom_bits=64, num_partitions=2).to_pandas()
        assert out.doc_id.tolist() == [101]


class TestFunnelAndGroupedCardinality:
    def test_funnel_matches_duckdb(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.events import funnel_counts
        from yetisearch_ray.pipelines.oracles import FUNNEL_SQL

        got = funnel_counts(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(FUNNEL_SQL).fetchdf()
        assert got.n_users.tolist() == want.n_users.tolist()
        # funnel is monotone non-increasing by construction
        assert got.n_users.is_monotonic_decreasing or len(got) < 2

    def test_funnel_strict_ordering(self, ray_session, tmp_path):
        """A user whose click precedes every view must not reach stage 2,
        and equal timestamps do not satisfy the strictly-after rule."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import funnel_counts

        ts = pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 01:00",   # u1: click before view
            "2024-01-02 00:00", "2024-01-02 00:00",   # u2: view == click ts
            "2024-01-03 00:00", "2024-01-03 01:00", "2024-01-03 02:00",  # u3 full
        ])
        t = pa.table({
            "user_id": pa.array([1, 1, 2, 2, 3, 3, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["click", "view", "view", "click",
                                    "view", "click", "purchase"]),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = funnel_counts(str(d))
        assert got.n_users.tolist() == [3, 1, 1]

    def test_distinct_users_matches_duckdb(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.events import distinct_users_per_type
        from yetisearch_ray.pipelines.oracles import GROUP_DISTINCT_SQL

        got = distinct_users_per_type(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(GROUP_DISTINCT_SQL).fetchdf()
        assert got.event_type.tolist() == want.event_type.tolist()
        assert got.n_users.tolist() == want.n_users.tolist()

    def test_priority_lines_matches_duckdb(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.oracles import PRIORITY_LINES_SQL
        from yetisearch_ray.pipelines.relational import priority_line_counts

        got = priority_line_counts(SF)
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(PRIORITY_LINES_SQL).fetchdf()
        assert got.l_returnflag.tolist() == want.l_returnflag.tolist()
        assert got.high_line_count.tolist() == want.high_line_count.tolist()
        assert got.low_line_count.tolist() == want.low_line_count.tolist()


class TestRound3LateOps:
    def test_retention_cohorts_matches_duckdb(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.events import retention_cohorts
        from yetisearch_ray.pipelines.oracles import RETENTION_COHORTS_SQL

        got = retention_cohorts(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(RETENTION_COHORTS_SQL).fetchdf()
        assert got.cohort_week.astype(str).tolist() == \
            want.cohort_week.astype(str).tolist()
        assert got.offset_weeks.tolist() == want.offset_weeks.tolist()
        assert got.n_users.tolist() == want.n_users.tolist()
        # offset-0 cell of a cohort = cohort size >= every later cell
        for cw, g in got.groupby("cohort_week"):
            assert g.n_users.iloc[0] == g.n_users.max()

    def test_moving_avg_matches_duckdb_and_warmup(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.events import daily_moving_avg
        from yetisearch_ray.pipelines.oracles import daily_moving_avg_sql

        got = daily_moving_avg(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(daily_moving_avg_sql(7)).fetchdf()
        assert np.allclose(got.ma.to_numpy(), want.ma.to_numpy(), atol=1e-6)
        # first day of each type: ma == n (min_periods=1 warm-up)
        first = got.groupby("event_type").head(1)
        assert np.allclose(first.ma.to_numpy(),
                           first.n.to_numpy().astype(float))

    def test_cooccurrence_matches_duckdb_and_bounds(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.events import (
            distinct_users_per_type, type_cooccurrence)
        from yetisearch_ray.pipelines.oracles import TYPE_COOCCURRENCE_SQL

        got = type_cooccurrence(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(TYPE_COOCCURRENCE_SQL).fetchdf()
        assert got.type_a.tolist() == want.type_a.tolist()
        assert got.type_b.tolist() == want.type_b.tolist()
        assert got.n_users.tolist() == want.n_users.tolist()
        # pair support <= min of the two marginals
        marg = dict(zip(*[distinct_users_per_type(SF)[c]
                          for c in ("event_type", "n_users")]))
        for _, r in got.iterrows():
            assert r.n_users <= min(marg[r.type_a], marg[r.type_b])

    def test_single_type_user_contributes_no_pairs(self, ray_session,
                                                   tmp_path):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import type_cooccurrence

        ts = pd.to_datetime(["2024-01-01"] * 4)
        t = pa.table({
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["view", "view", "view", "click"]),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = type_cooccurrence(str(d))
        assert got.to_dict("records") == [
            {"type_a": "click", "type_b": "view", "n_users": 1}]

    def test_late_shipments_matches_duckdb(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.oracles import \
            late_shipment_priority_sql
        from yetisearch_ray.pipelines.relational import \
            late_shipment_priority

        got = late_shipment_priority(SF)
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        want = con.execute(late_shipment_priority_sql(30)).fetchdf()
        assert got.o_orderpriority.tolist() == want.o_orderpriority.tolist()
        assert got.n_orders.tolist() == want.n_orders.tolist()

    def test_rank_eval_metric_identities(self, ray_session):
        from yetisearch_ray.pipelines.fts_documents import rank_eval

        got = rank_eval(SF)
        assert (got.hits <= 10).all() and (got.hits >= 0).all()
        assert np.allclose(got.precision_k, got.hits / 10.0)
        # rr is 0 iff no hits; ndcg in [0, 1]
        assert ((got.rr > 0) == (got.hits > 0)).all()
        assert ((got.ndcg >= 0) & (got.ndcg <= 1.0 + 1e-9)).all()
        assert (got.hits <= got.n_rel).all()


class TestDocSimilarity:
    def test_matches_duckdb_on_slice(self, ray_session):
        import duckdb

        import ray.data as rd
        from yetisearch_ray.pipelines.oracles import doc_similarity_sql
        from yetisearch_ray.pipelines.textstats import doc_similarity_topk

        ds = rd.read_parquet(f"{SF}/documents.parquet") \
            .filter(expr="doc_id < 80")
        got = doc_similarity_topk(ds, k=3)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = con.execute(
            doc_similarity_sql(k=3, where="doc_id < 80")).fetchdf()
        assert got.doc_a.tolist() == want.doc_a.tolist()
        assert got.doc_b.tolist() == want.doc_b.tolist()
        assert got["rank"].tolist() == want["rank"].tolist()
        assert np.allclose(got.cosine, want.cosine, atol=1e-6)
        # structural: ranks are 1..k per doc, no self pairs
        assert (got.doc_a != got.doc_b).all()
        assert (got.groupby("doc_a")["rank"].min() == 1).all()

    def test_duplicate_docs_are_top_neighbours(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        import ray.data as rd
        from yetisearch_ray.pipelines.textstats import doc_similarity_topk

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["red widget spins fast", "red widget spins fast",
                     "blue bolt holds tight", "green gear turns slow"],
        })
        f = tmp_path / "docs.parquet"
        pq.write_table(t, f)
        got = doc_similarity_topk(rd.read_parquet(str(f)), k=1)
        top = dict(zip(got.doc_a, got.doc_b))
        assert top[0] == 1 and top[1] == 0
        assert got[got.doc_a == 0].cosine.iloc[0] == 1.0


class TestWindowShapes:
    def test_window_self_join_strict_ordering(self, ray_session, tmp_path):
        """Equal-timestamp pairs count once (ordered by event_id); events
        exactly at the window boundary are included; cross-user pairs
        never form."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import window_self_join

        ts = pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:00",  # u1 tie pair
            "2024-01-01 00:05:00",                          # u1 boundary
            "2024-01-01 00:10:01",                          # u1 outside
            "2024-01-01 00:00:00",                          # u2 isolated
        ])
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "c", "d", "a"]),
            "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = window_self_join(str(d), within_minutes=5)
        pairs = {(r.type_a, r.type_b): r.n_pairs for r in got.itertuples()}
        # (a,b) tie pair once; a->c and b->c at the 5-min boundary;
        # c->d is 5:01 apart -> excluded; u2 isolated
        assert pairs == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}

    def test_percent_rank_tie_semantics(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.oracles import percent_rank_sql
        from yetisearch_ray.pipelines.relational import percent_rank_nchars

        got = percent_rank_nchars(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = con.execute(percent_rank_sql()).fetchdf()
        assert np.allclose(got.pr, want.pr, atol=1e-6)
        # ties share a rank: equal n_chars -> equal pr
        for _, g in got.groupby("n_chars"):
            assert g.pr.nunique() == 1
        assert got.pr.min() == 0.0 and got.pr.max() <= 1.0

    def test_transition_counts_sum(self, ray_session):
        """Total transitions = total events - number of users (each user
        contributes n_i - 1 transitions)."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import transition_matrix

        got = transition_matrix(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
        n_events = t.num_rows
        n_users = len(set(t["user_id"].to_pylist()))
        assert int(got.n.sum()) == n_events - n_users


class TestSeasonalityAndAnomaly:
    def test_hourly_profile_totals(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import hourly_profile

        got = hourly_profile(SF)
        n_events = pq.read_table(f"{SF}/events.parquet",
                                 columns=["event_id"]).num_rows
        assert int(got.n.sum()) == n_events
        assert got.hod.between(0, 23).all()
        # (type, hod) keys are unique
        assert not got.duplicated(["event_type", "hod"]).any()

    def test_zscore_anomaly_planted(self, ray_session, tmp_path):
        """A day with 10x the baseline volume is flagged; baseline days
        are not."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import zscore_anomalies

        days = pd.date_range("2024-01-01", periods=20, freq="D")
        rows = []
        eid = 0
        for i, d in enumerate(days):
            burst = 50 if i == 10 else 5
            for j in range(burst):
                rows.append((eid, d + pd.Timedelta(minutes=j), 1, "view",
                             1.0, "{}"))
                eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value", "props"])
        t = pa.Table.from_pandas(df, preserve_index=False)
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = zscore_anomalies(str(d))
        assert len(got) == 1
        assert got.n.iloc[0] == 50 and got.z.iloc[0] > 2.0

    def test_daily_ema_first_row_identity(self, ray_session):
        """The first observed day of every type has ema == n (window of
        one); every ema lies within the type's [min n, max n]."""
        from yetisearch_ray.pipelines.events import daily_ema

        got = daily_ema(SF)
        for _, g in got.groupby("event_type"):
            g = g.sort_values("day")
            assert abs(g.ema.iloc[0] - g.n.iloc[0]) < 1e-9
            assert (g.ema >= g.n.min() - 1e-9).all()
            assert (g.ema <= g.n.max() + 1e-9).all()


class TestNoveltyAndMoments:
    def test_ngram_novelty_edges(self, ray_session, tmp_path):
        """First doc is 100% novel; an exact copy later is 0% novel; a
        doc with fewer than n tokens emits no row."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import ngram_novelty

        base = "alpha beta gamma delta epsilon zeta eta theta"
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, base, "too short"], pa.string()),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "documents.parquet")
        got = ngram_novelty(rd.read_parquet(str(d / "documents.parquet")))
        by = got.set_index("doc_id")
        assert by.loc[1, "novelty"] == 1.0
        assert by.loc[2, "novelty"] == 0.0
        assert 3 not in by.index
        # 8 tokens -> 4 distinct 5-grams
        assert by.loc[1, "n_grams"] == 4

    def test_ngram_novelty_repeated_text_distinct(self, ray_session,
                                                  tmp_path):
        """Repetition inside one doc dedups: 'a b c d e a b c d e'
        yields 6 windows but only 6 DISTINCT grams? — no: windows are
        (a b c d e), (b c d e a), (c d e a b), (d e a b c), (e a b c d),
        (a b c d e) -> 5 distinct."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import ngram_novelty

        t = pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["a b c d e a b c d e"], pa.string()),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "documents.parquet")
        got = ngram_novelty(rd.read_parquet(str(d / "documents.parquet")))
        assert got.n_grams.iloc[0] == 5
        assert got.n_novel.iloc[0] == 5

    def test_skew_kurt_matches_scipy_free_reference(self, ray_session):
        """Spot-check one group's skewness against a direct numpy
        recompute of the bias-corrected formula."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import group_skew_kurt

        got = group_skew_kurt(SF)
        t = pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_returnflag", "l_extendedprice"])
        df = t.to_pandas()
        g0 = got.l_returnflag.iloc[0]
        x = df[df.l_returnflag == g0].l_extendedprice.to_numpy()
        n = x.size
        d = x - x.mean()
        m2, m3 = (d**2).mean(), (d**3).mean()
        want = (m3 / m2**1.5) * np.sqrt(n * (n - 1)) / (n - 2)
        assert abs(got.skew_price.iloc[0] - want) < 1e-4

    def test_above_avg_counts(self, ray_session):
        """Every class has 0 < n_above < class size and positive mean
        excess."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import above_class_average

        got = above_class_average(SF)
        t = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderpriority"]).to_pandas()
        sizes = t.o_orderpriority.value_counts()
        for r in got.itertuples():
            assert 0 < r.n_above < sizes[r.o_orderpriority]
            assert r.avg_excess > 0


class TestDecayAndAdjacency:
    def test_decay_changes_ranking(self, ray_session):
        """The gauss decay must actually reorder vs plain OR BM25 (docs
        near origin n_chars promoted) and never produce scores above
        the undecayed ones."""
        from yetisearch_ray.pipelines import fts_documents as ftsd

        plain = ftsd.or_topk(SF, ("vector", "stream"), k=20)
        dec = ftsd.decay_topk(SF, ("vector", "stream"), origin=300.0,
                              scale=120.0, k=20)
        assert list(dec.doc_id) != list(plain.doc_id)
        ps = dict(zip(plain.doc_id, plain.score))
        for r in dec.itertuples():
            if r.doc_id in ps:
                assert r.score <= ps[r.doc_id] + 1e-9

    def test_decay_identity_at_infinite_scale(self, ray_session):
        """With a huge scale the decay factor ~1 everywhere: ranking
        equals plain OR."""
        from yetisearch_ray.pipelines import fts_documents as ftsd

        plain = ftsd.or_topk(SF, ("vector", "stream"), k=10)
        dec = ftsd.decay_topk(SF, ("vector", "stream"), origin=300.0,
                              scale=1e9, k=10)
        assert list(dec.doc_id) == list(plain.doc_id)

    def test_adjacency_matrix_brute_force(self, ray_session):
        """Counts equal a direct tokenization of the corpus."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.fts_documents import adjacency_matrix

        got = adjacency_matrix(SF)
        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "source"]).to_pandas()
        import re as _re
        import unicodedata

        def toks(s):
            s = unicodedata.normalize("NFKD", s.lower())
            s = "".join(c for c in s if not unicodedata.combining(c))
            return set(x for x in _re.split(r"[^a-z0-9]+", s) if x)

        sets = {}
        for name, term in (("a", "vector"), ("b", "stream"),
                           ("c", "merge")):
            sets[name] = {r.doc_id for r in t.itertuples()
                          if term in toks(r.text) | toks(r.source)}
        by = dict(zip(got.key, got.doc_count))
        assert by["a"] == len(sets["a"])
        assert by.get("a&b", 0) == len(sets["a"] & sets["b"])
        assert by.get("b&c", 0) == len(sets["b"] & sets["c"])


class TestCompositeBrandRare:
    def test_composite_page_cursor_chain(self, ray_session):
        """Paging with after = last key of the previous page never
        repeats or skips buckets (the ES composite resumability
        contract)."""
        import duckdb

        from yetisearch_ray.pipelines.relational import composite_page

        all_buckets = duckdb.sql(
            f"SELECT lang, source FROM read_parquet('{SF}/documents.parquet')"
            " GROUP BY lang, source ORDER BY lang, source").fetchall()
        seen = []
        after = ("", "")
        while True:
            page = composite_page(SF, size=7, after=after)
            if len(page) == 0:
                break
            seen += [(r.lang, r.source) for r in page.itertuples()]
            after = seen[-1]
        assert seen == [(a, b) for a, b in all_buckets]

    def test_brand_suppliers_bounds(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.relational import brand_supplier_counts

        got = brand_supplier_counts(SF)
        want = duckdb.sql(
            f"SELECT p_brand, count(DISTINCT l_suppkey) FROM "
            f"read_parquet('{SF}/lineitem.parquet') li JOIN "
            f"read_parquet('{SF}/part.parquet') p ON p_partkey = l_partkey "
            f"GROUP BY 1 ORDER BY 1").fetchall()
        assert [(r.p_brand, r.n_suppliers) for r in got.itertuples()] == \
            [(a, b) for a, b in want]

    def test_rare_terms_planted_dup(self, ray_session):
        from yetisearch_ray.pipelines.fts_documents import rare_terms

        got = rare_terms(SF, max_df=100)
        assert "dup" in set(got.term)
        assert (got.df <= 100).all()


class TestOutliersSessionsFiltered:
    def test_centroid_outliers_planted(self, ray_session, tmp_path):
        """A vector far from its label's tight cluster is flagged."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import centroid_outliers

        rng = np.random.default_rng(7)
        base = rng.normal(0, 0.01, (40, 8))
        vecs = np.vstack([base, np.full((1, 8), 5.0)])
        t = pa.table({
            "vec_id": pa.array(range(41), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 41, pa.int32()),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "embeddings.parquet")
        got = centroid_outliers(rd.read_parquet(str(d / "embeddings.parquet")))
        assert 40 in set(got.vec_id)
        flagged = got.set_index("vec_id")
        assert flagged.loc[40, "z"] > 2.0

    def test_session_stats_invariants(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import (session_stats,
                                                     session_windows)

        stats = session_stats(SF)
        sw = session_windows(SF)
        assert int(stats.n_sessions.iloc[0]) == len(sw)
        assert stats.max_events.iloc[0] == sw.n_events.max()

    def test_filtered_topk_only_label(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import cosine_topk

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        import pyarrow.parquet as pq
        q = pq.read_table(f"{SF}/embeddings.parquet",
                          filters=[("vec_id", "==", 1)])["embedding"] \
            .to_pylist()[0]
        got = cosine_topk(ds.filter(expr="label == 2"), q, k=10).to_pandas()
        labels = pq.read_table(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "label"]).to_pandas()
        lab = dict(zip(labels.vec_id, labels.label))
        assert all(lab[v] == 2 for v in got.vec_id)


class TestConfusionAndSeparation:
    def test_confusion_totals_and_domain(self, ray_session):
        """Cell counts sum to the corpus size; predictions stay in the
        marker-language domain (+ 'und'); (lang, pred) keys unique.
        (The synthetic corpus text is English-ish for every label, so
        diagonal dominance is NOT expected here.)"""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import (_LANG_ORDER,
                                                        langid_confusion)

        got = langid_confusion(
            rd.read_parquet(f"{SF}/documents.parquet"))
        n_docs = pq.read_table(f"{SF}/documents.parquet",
                               columns=["doc_id"]).num_rows
        assert int(got.n.sum()) == n_docs
        assert set(got.pred_lang) <= set(_LANG_ORDER) | {"und"}
        assert not got.duplicated(["lang", "pred_lang"]).any()

    def test_label_separation_bounds_and_coverage(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import label_separation

        got = label_separation(rd.read_parquet(f"{SF}/embeddings.parquet"))
        assert (got.centroid_cosine.abs() <= 1.0 + 1e-9).all()
        assert (got.label_a < got.label_b).all()
        labels = set(got.label_a) | set(got.label_b)
        n = len(labels)
        assert len(got) == n * (n - 1) // 2


class TestTimeTravel:
    def test_snapshot_excludes_later_generation(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.fts_documents import (
            _two_gen_index_dir, time_travel_topk)
        from yetisearch_ray.search.engine import SearchEngine, open_index

        got = time_travel_topk(SF)
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        thr = (int(t["doc_id"].to_numpy().max()) + 1) // 2
        assert (got.doc_id < thr).all()
        # the unpinned reader over the same two-gen index sees BOTH halves
        eng_full = SearchEngine(open_index(_two_gen_index_dir(SF)))
        full = eng_full.search("vector stream", mode="or", limit=100,
                               normalize=False).to_pandas()
        assert (full.doc_id >= thr).any()
        # pinned stats reconstruct the snapshot corpus
        eng0 = SearchEngine(open_index(_two_gen_index_dir(SF),
                                       max_generation=0))
        assert eng0.index.n_docs < eng_full.index.n_docs

    def test_pinned_prefix_expansion(self, ray_session):
        """Dictionary scans respect the generation pin: expansions come
        only from gen-0 segments (df sums differ from the full index
        when gen 1 adds occurrences)."""
        from yetisearch_ray.pipelines.fts_documents import (
            _two_gen_index_dir, time_travel_topk)
        from yetisearch_ray.search.engine import open_index

        time_travel_topk(SF)  # ensure fixture built
        r0 = open_index(_two_gen_index_dir(SF), max_generation=0)
        rf = open_index(_two_gen_index_dir(SF))
        e0 = set(r0.expand_prefix("s", max_terms=1 << 20))
        ef = set(rf.expand_prefix("s", max_terms=1 << 20))
        assert e0 <= ef


class TestFertilityPercentileRanks:
    def test_fertility_consistent_with_token_counts(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import (fertility_by_lang,
                                                        token_counts)

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        f = fertility_by_lang(ds)
        tc = token_counts(rd.read_parquet(f"{SF}/documents.parquet")) \
            .to_pandas()
        assert int(f.n_tokens.sum()) == int(tc.n_tokens.sum())
        assert int(f.n_subwords.sum()) == int(tc.n_subwords.sum())
        assert (f.fertility >= 1.0 - 1e-9).all()  # pieces >= words

    def test_percentile_ranks_monotone(self, ray_session):
        from yetisearch_ray.pipelines.relational import percentile_ranks

        got = percentile_ranks(SF)
        assert (got.frac.diff().dropna() >= 0).all()
        assert ((got.frac >= 0) & (got.frac <= 1)).all()


class TestSynonymsNewUsers:
    def test_synonym_equals_expanded_or(self, ray_session):
        """Synonym arm == literal OR over the expanded term set."""
        from yetisearch_ray.pipelines.fts_documents import (or_topk,
                                                            synonym_topk)

        syn = synonym_topk(SF, base=("merge", "stream"),
                           synonyms={"stream": ["buffer"]}, k=20)
        orx = or_topk(SF, ("merge", "stream", "buffer"), k=20)
        assert list(syn.doc_id) == list(orx.doc_id)
        assert np.allclose(syn.score, orx.score, atol=1e-6)

    def test_new_users_total(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import new_users_daily

        got = new_users_daily(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
        n_users = len(set(t["user_id"].to_pylist()))
        assert int(got.n_new.sum()) == n_users
        assert int(got.cum_users.iloc[-1]) == n_users
        assert (got.cum_users.diff().dropna() > 0).all()


class TestRangeFrameHistogram:
    def test_range_frame_self_inclusive(self, ray_session):
        """Every row counts itself; counts never exceed the class size."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import \
            price_neighborhood_counts

        got = price_neighborhood_counts(SF, width=5000.0, k=50)
        assert (got.n_near >= 1).all()
        sizes = pq.read_table(f"{SF}/orders.parquet",
                              columns=["o_orderpriority"]).to_pandas() \
            .o_orderpriority.value_counts()
        for r in got.itertuples():
            assert r.n_near <= sizes[r.o_orderpriority]

    def test_value_histogram_totals(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import value_histogram

        got = value_histogram(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["value"])
        assert int(got.n.sum()) == t.num_rows
        v = t["value"].to_numpy()
        assert abs(got.value_sum.sum() - v.sum()) < 1e-2


class TestCubeQualityPrune:
    def test_cube_marginals_consistent(self, ray_session):
        from yetisearch_ray.pipelines.relational import pricing_cube

        got = pricing_cube(SF)
        fine = got[(got.l_returnflag != "") & (got.l_linestatus != "")]
        top = got[(got.l_returnflag == "") & (got.l_linestatus == "")]
        assert len(top) == 1
        assert abs(fine.sum_qty.sum() - top.sum_qty.iloc[0]) < 1e-6
        by_status = got[(got.l_returnflag == "") & (got.l_linestatus != "")]
        assert abs(by_status.sum_qty.sum() - top.sum_qty.iloc[0]) < 1e-6

    def test_quality_prune_keeps_top(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import quality_prune
        from yetisearch_ray.pipelines.textstats import quality_scores

        kept = quality_prune(rd.read_parquet(f"{SF}/documents.parquet"),
                             q=0.7)
        all_q = quality_scores(
            rd.read_parquet(f"{SF}/documents.parquet")).to_pandas()
        n = len(all_q)
        # kept fraction ~30% (ties at the threshold may widen it)
        assert len(kept) >= int(0.3 * n) - 1
        # every kept quality >= every dropped quality
        dropped = set(all_q.doc_id) - set(kept.doc_id)
        if dropped:
            dmax = all_q[all_q.doc_id.isin(dropped)].quality.max()
            assert (kept.quality >= dmax - 1e-9).all()


class TestBloomJoinLatest:
    def test_bloom_prunes_but_answer_exact(self, ray_session):
        """Tiny Bloom (high FP rate) must still give the exact answer —
        the semi-join removes false positives."""
        import duckdb

        from yetisearch_ray.pipelines.relational import \
            bloom_filtered_revenue

        got = bloom_filtered_revenue(SF, bloom_bits=1 << 10)  # 128 B
        want = duckdb.sql(
            f"SELECT l_returnflag, count(*), "
            f"round(sum(l_extendedprice * (1 - l_discount)), 4) FROM "
            f"read_parquet('{SF}/lineitem.parquet') li JOIN "
            f"read_parquet('{SF}/orders.parquet') o "
            f"ON o_orderkey = l_orderkey "
            f"WHERE o_orderpriority = '1-URGENT' "
            f"GROUP BY 1 ORDER BY 1").fetchall()
        assert [(r.l_returnflag, r.n) for r in got.itertuples()] == \
            [(a, b) for a, b, _ in want]
        assert np.allclose(got.revenue, [c for _, _, c in want], atol=1e-3)

    def test_latest_event_tie_break(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import latest_event_per_user

        ts = pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02"])
        t = pa.table({
            "event_id": pa.array([5, 9, 1], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = latest_event_per_user(str(d))
        by = got.set_index("user_id")
        assert by.loc[1, "event_type"] == "b"  # ts tie -> max event_id
        assert by.loc[2, "event_type"] == "c"


class TestCodeCorpusAnalytics:
    def test_lang_stats_totals(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.relational import code_lang_stats
        from yetisearch_ray.sources.corpus import corpus_path

        got = code_lang_stats(SF)
        n = duckdb.sql(
            f"SELECT count(*) FROM "
            f"read_parquet('{corpus_path(SF)}/*.parquet')").fetchone()[0]
        assert int(got.n_files.sum()) == n
        assert (got.avg_chars > 0).all()

    def test_repo_topk_ordering(self, ray_session):
        from yetisearch_ray.pipelines.relational import code_repo_topk

        got = code_repo_topk(SF, k=10)
        assert (got.n_files.diff().dropna() <= 0).all()

    def test_dir_stats_lang_bound(self, ray_session):
        from yetisearch_ray.pipelines.relational import code_dir_stats

        got = code_dir_stats(SF)
        assert (got.n_langs <= got.n_files).all()
        assert (got.n_langs >= 1).all()


class TestAsofForwardDatasheet:
    def test_forward_vs_backward_directions(self, ray_session, tmp_path):
        """Backward picks the order before, forward the one after."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import asof_join_orders

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(pd.to_datetime(["2024-06-15"]),
                           pa.timestamp("us")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }), d / "events.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array([100, 200], pa.int64()),
            "o_custkey": pa.array([7, 7], pa.int64()),
            "o_orderstatus": pa.array(["F", "F"]),
            "o_totalprice": pa.array([1.0, 2.0], pa.float64()),
            "o_orderdate": pa.array(pd.to_datetime(
                ["2024-06-01", "2024-07-01"]), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2),
        }), d / "orders.parquet")
        back = asof_join_orders(str(d))
        fwd = asof_join_orders(str(d), direction="forward")
        assert back.o_orderkey.iloc[0] == 100
        assert fwd.o_orderkey.iloc[0] == 200

    def test_datasheet_consistency(self, ray_session):
        import duckdb
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import datasheet

        got = datasheet(rd.read_parquet(f"{SF}/documents.parquet"))
        n, langs = duckdb.sql(
            f"SELECT count(*), count(DISTINCT lang) FROM "
            f"read_parquet('{SF}/documents.parquet')").fetchone()
        assert got.n_docs.iloc[0] == n
        assert got.n_langs.iloc[0] == langs
        assert 0 <= got.mean_quality.iloc[0] <= 1


class TestKnnJoinTtrPct:
    def test_knn_join_symmetry_top1(self, ray_session):
        """Each vector has exactly k neighbor rows; cosine within
        [-1, 1]; no self edges."""
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import knn_join

        got = knn_join(rd.read_parquet(f"{SF}/embeddings.parquet"), k=3)
        assert (got.vec_id != got.neighbor_id).all()
        assert got.groupby("vec_id").size().eq(3).all()
        assert got.cosine.between(-1.0 - 1e-9, 1.0 + 1e-9).all()

    def test_ttr_bounds(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import ttr_by_source

        got = ttr_by_source(rd.read_parquet(f"{SF}/documents.parquet"))
        assert (got.ttr > 0).all() and (got.ttr <= 1.0).all()
        assert (got.n_terms <= got.n_tokens).all()

    def test_pct_change_recompute(self, ray_session):
        from yetisearch_ray.pipelines.events import daily_pct_change

        got = daily_pct_change(SF)
        for _, g in got.groupby("event_type"):
            assert g.day.is_monotonic_increasing


class TestSq8SaltedJoin:
    def test_sq8_error_small(self, ray_session):
        """int8 grid error is bounded by half a quantization step."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import sq8_error

        got = sq8_error(rd.read_parquet(f"{SF}/embeddings.parquet"))
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["embedding"]).to_pandas()
        m = np.stack(t.embedding.to_numpy()).astype(np.float64)
        max_step = (m.max(axis=0) - m.min(axis=0)).max() / 255.0
        assert (got.mae <= max_step / 2 + 1e-12).all()
        assert (got.mae >= 0).all()

    def test_salted_join_equals_plain(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.relational import salted_join_revenue

        got = salted_join_revenue(SF, salt=4)
        want = duckdb.sql(
            f"SELECT o_orderpriority, count(*), "
            f"round(sum(l_extendedprice * (1 - l_discount)), 4) FROM "
            f"read_parquet('{SF}/lineitem.parquet') li JOIN "
            f"read_parquet('{SF}/orders.parquet') o "
            f"ON o_orderkey = l_orderkey GROUP BY 1 ORDER BY 1").fetchall()
        assert [(r.o_orderpriority, r.n_lines) for r in got.itertuples()] \
            == [(a, b) for a, b, _ in want]
        assert np.allclose(got.revenue, [c for _, _, c in want], atol=1e-2)


class TestCharclassConversion:
    def test_charclass_ratios_bounded(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import charclass_by_lang

        got = charclass_by_lang(rd.read_parquet(f"{SF}/documents.parquet"))
        for c in ("ascii_ratio", "digit_ratio", "ws_ratio"):
            assert got[c].between(0, 1).all()
        s = got.ascii_ratio + got.digit_ratio + got.ws_ratio
        assert (s <= 1.0 + 1e-9).all()

    def test_weekly_conversion_bounds(self, ray_session):
        from yetisearch_ray.pipelines.events import weekly_conversion

        got = weekly_conversion(SF)
        assert (got.n_both <= got.n_from).all()
        assert got.conversion.between(0, 1).all()


class TestQ10Stickiness:
    def test_returned_revenue_top1(self, ray_session):
        import duckdb

        from yetisearch_ray.pipelines.relational import returned_item_revenue

        got = returned_item_revenue(SF, k=5)
        want = duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF}/lineitem.parquet') l "
            f"JOIN read_parquet('{SF}/orders.parquet') o "
            f"ON o_orderkey = l_orderkey "
            f"JOIN read_parquet('{SF}/customer.parquet') c "
            f"ON c_custkey = o_custkey "
            f"WHERE l_returnflag = 'R' GROUP BY 1 "
            f"ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, 1 "
            f"LIMIT 5").fetchall()
        assert list(got.c_custkey) == [x for (x,) in want]

    def test_stickiness_bounds(self, ray_session):
        from yetisearch_ray.pipelines.events import stickiness

        got = stickiness(SF)
        assert (got.stickiness > 0).all()
        assert (got.stickiness <= 1.0 + 1e-9).all()
        assert (got.avg_dau <= got.mau).all()


class TestQ6NormStats:
    def test_q6_nonzero_and_bounded(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import q6_band_revenue

        got = q6_band_revenue(SF)
        total = pq.read_table(f"{SF}/lineitem.parquet",
                              columns=["l_quantity"]).num_rows
        assert 0 <= got.n_lines.iloc[0] <= total
        assert got.revenue.iloc[0] >= 0

    def test_norm_stats_positive(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.ann import norm_stats

        got = norm_stats(rd.read_parquet(f"{SF}/embeddings.parquet"))
        assert (got.norm_mean > 0).all()
        assert (got.norm_std >= 0).all()


class TestSourceOverlap:
    def test_jaccard_bounds_and_symmetric_keying(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import source_vocab_overlap

        got = source_vocab_overlap(
            rd.read_parquet(f"{SF}/documents.parquet"))
        assert (got.source_a < got.source_b).all()
        assert got.jaccard.between(0, 1).all()
        assert (got.n_shared >= 1).all()


class TestBestFields:
    def test_best_fields_vs_single_field(self, ray_session):
        """best_fields score >= each single-field score per doc (tie=0),
        and the top doc matches the better field's top doc."""
        from yetisearch_ray.pipelines.fts_documents import (best_fields_topk,
                                                            get_engine)

        got = best_fields_topk(SF, terms=("dup", "stream"), k=20)
        eng = get_engine(SF)
        f1 = eng.search("dup stream", mode="or", in_fields=["text"],
                        limit=1000, normalize=False).to_pandas()
        by1 = dict(zip(f1.doc_id.astype("int64"), f1.score.abs()))
        for r in got.itertuples():
            assert r.score >= by1.get(r.doc_id, 0.0) - 1e-4


class TestMadReadability:
    def test_mad_robust_to_outlier(self, ray_session, tmp_path):
        """MAD ignores a single extreme outlier that would wreck std."""
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.relational import group_mad

        d = tmp_path / "sf"
        d.mkdir()
        vals = [10.0] * 9 + [1e9]
        pq.write_table(pa.table({
            "l_returnflag": pa.array(["A"] * 10),
            "l_extendedprice": pa.array(vals, pa.float64()),
        }), d / "lineitem.parquet")
        got = group_mad(str(d))
        assert got.median_price.iloc[0] == 10.0
        assert got.mad_price.iloc[0] == 0.0

    def test_readability_monotone_in_sentence_length(self, ray_session,
                                                     tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import readability

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aa bb. cc dd.",
                              "aa bb cc dd ee ff gg hh."], pa.string()),
        }), d / "documents.parquet")
        got = readability(rd.read_parquet(str(d / "documents.parquet")))
        by = got.set_index("doc_id")
        assert by.loc[1, "n_sentences"] == 2
        assert by.loc[2, "n_sentences"] == 1
        assert by.loc[2, "wps"] > by.loc[1, "wps"]
        for i in (1, 2):
            want = 0.39 * by.loc[i, "wps"] + 11.8 * by.loc[i, "cpw"] - 15.59
            assert abs(by.loc[i, "fk_proxy"] - want) < 1e-4


class TestBounceDupTermsEnum:
    def test_bounce_rate_totals(self, ray_session):
        from yetisearch_ray.pipelines.events import (bounce_rate,
                                                     session_windows)

        got = bounce_rate(SF)
        sw = session_windows(SF)
        assert int(got.n_sessions.sum()) == len(sw)
        assert int(got.n_bounce.sum()) == int((sw.n_events == 1).sum())
        assert got.bounce_rate.between(0, 1).all()

    def test_dup_rate_planted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import dup_rate_by_source

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["same", "same", "uniq", "other"]),
            "source": pa.array(["a", "a", "a", "b"]),
        }), d / "documents.parquet")
        got = dup_rate_by_source(
            rd.read_parquet(str(d / "documents.parquet")))
        by = got.set_index("source")
        assert by.loc["a", "n_dup_docs"] == 2
        assert abs(by.loc["a", "dup_rate"] - 2 / 3) < 1e-6
        assert by.loc["b", "n_dup_docs"] == 0

    def test_terms_enum_prefix_and_order(self, ray_session):
        from yetisearch_ray.pipelines.fts_documents import terms_enum

        got = terms_enum(SF, prefix="s", k=20)
        assert got.term.str.startswith("s").all()
        assert (got.df.diff().dropna() <= 0).all()


class TestActivityHistogram:
    def test_totals(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import user_activity_histogram

        got = user_activity_histogram(SF)
        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
        assert int(got.total_events.sum()) == t.num_rows
        assert int(got.n_users.sum()) == len(set(t["user_id"].to_pylist()))


class TestTimeToConvertShare:
    def test_time_to_convert_planted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import time_to_convert

        d = tmp_path / "sf"
        d.mkdir()
        ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                             "2024-01-01 00:30", "2024-01-02 00:00"])
        pq.write_table(pa.table({
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["view", "purchase", "purchase",
                                    "view"]),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }), d / "events.parquet")
        got = time_to_convert(str(d))
        # user 1 converts in 3600 s; user 2's purchase precedes the view
        assert got.n_converted.iloc[0] == 1
        assert got.mean_sec.iloc[0] == 3600.0

    def test_priority_share_bounds(self, ray_session):
        from yetisearch_ray.pipelines.relational import priority_share_trend

        got = priority_share_trend(SF)
        assert (got.n_priority <= got.n_total).all()
        assert got.share.between(0, 1).all()


class TestHhiJs:
    def test_hhi_bounds(self, ray_session):
        from yetisearch_ray.pipelines.relational import customer_hhi

        got = customer_hhi(SF)
        n = got.n_customers.iloc[0]
        assert 1.0 / n - 1e-9 <= got.hhi.iloc[0] <= 1.0
        assert 0 < got.top10_share.iloc[0] <= 1.0

    def test_js_identity_and_symmetry(self, ray_session, tmp_path):
        """JS(a, a) == 0; JS in [0, ln 2]."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import source_js_divergence

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "a b c", "x y z"]),
            "source": pa.array(["s1", "s2", "s3"]),
        }), d / "documents.parquet")
        same = source_js_divergence(
            rd.read_parquet(str(d / "documents.parquet")),
            src_a="s1", src_b="s2")
        assert same.js_div.iloc[0] == 0.0
        diff = source_js_divergence(
            rd.read_parquet(str(d / "documents.parquet")),
            src_a="s1", src_b="s3")
        assert abs(diff.js_div.iloc[0] - np.log(2)) < 1e-6


class TestEntropyWordlen:
    def test_entropy_bounds(self, ray_session):
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines.events import user_type_entropy

        got = user_type_entropy(SF)
        n_types = len(set(pq.read_table(
            f"{SF}/events.parquet",
            columns=["event_type"])["event_type"].to_pylist()))
        assert (got.entropy >= 0).all()
        assert (got.entropy <= np.log(n_types) + 1e-9).all()

    def test_wordlen_totals(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import (token_counts,
                                                        wordlen_histogram)

        got = wordlen_histogram(rd.read_parquet(f"{SF}/documents.parquet"))
        tc = token_counts(rd.read_parquet(f"{SF}/documents.parquet")) \
            .to_pandas()
        # histogram token totals == whitespace-ish token totals (the
        # histogram splits on the RE2 \s class too)
        assert int(got.n.sum()) == int(tc.n_tokens.sum())


class TestTpchShapesAndBoosting:
    def test_q18_threshold_monotone(self, ray_session):
        """A higher HAVING threshold can only shrink the survivor set,
        and every reported total_qty must exceed the threshold."""
        from yetisearch_ray.pipelines import relational

        lo = relational.q18_large_orders(SF, min_qty=150.0, k=1000)
        hi = relational.q18_large_orders(SF, min_qty=200.0, k=1000)
        assert len(hi) <= len(lo)
        assert (lo.total_qty > 150.0).all()
        assert set(hi.o_orderkey) <= set(lo.o_orderkey)

    def test_q11_share_sums_below_one(self, ray_session):
        from yetisearch_ray.pipelines import relational

        out = relational.q11_value_share(SF, mult=1.5)
        assert 0 < out.share.sum() <= 1.0 + 1e-9
        assert (out.value.diff().dropna() <= 1e-6).all()  # desc order

    def test_q14_bounds(self, ray_session):
        from yetisearch_ray.pipelines import relational

        out = relational.q14_promo_share(SF)
        pct = float(out.promo_revenue_pct.iloc[0])
        assert 0.0 <= pct <= 100.0
        assert float(out.total_revenue.iloc[0]) > 0

    def test_boosting_demotes_never_excludes(self, ray_session):
        """Every plain-OR match stays in the (widened) boosted result
        set; docs containing the negative term score exactly
        negative_boost x their plain score; others are unchanged."""
        from yetisearch_ray.pipelines import fts_documents as ftsd

        plain = ftsd.or_topk(SF, ("vector", "stream"), k=1000)
        boosted = ftsd.boosting_topk(SF, ("vector", "stream"),
                                     negative="merge", negative_boost=0.4,
                                     k=1000)
        assert set(boosted.doc_id) == set(plain.doc_id)
        neg = set(ftsd.get_engine(SF).match_ids("merge").tolist())
        ps = dict(zip(plain.doc_id, plain.score))
        for r in boosted.itertuples():
            want = ps[r.doc_id] * (0.4 if r.doc_id in neg else 1.0)
            assert abs(r.score - want) < 1e-3

    def test_boosting_changes_page_order(self, ray_session):
        from yetisearch_ray.pipelines import fts_documents as ftsd

        plain = ftsd.or_topk(SF, ("vector", "stream"), k=20)
        boosted = ftsd.boosting_topk(SF, ("vector", "stream"), k=20)
        assert list(plain.doc_id) != list(boosted.doc_id)


class TestChi2Gini:
    def test_chi2_marginals_consistent(self, ray_session):
        """Observed cell counts sum to the orders row count; expected
        sums match observed sums (property of the contingency table)."""
        import ray.data as rd
        from yetisearch_ray.pipelines import relational

        out = relational.segment_priority_chi2(SF)
        n_orders = rd.read_parquet(f"{SF}/orders.parquet").count()
        assert int(out.observed.sum()) == n_orders
        assert abs(out.expected.sum() - out.observed.sum()) < 1e-2
        assert (out.chi2 >= 0).all() and out.chi2.nunique() == 1

    def test_gini_bounds_and_invariance(self, ray_session):
        """Gini lies in [0,1); bucket count must not change the exact
        result (partition-invariance of the Lorenz decomposition)."""
        from yetisearch_ray.pipelines import relational

        a = relational.revenue_gini(SF, n_buckets=16)
        b = relational.revenue_gini(SF, n_buckets=512)
        assert 0.0 <= float(a.gini.iloc[0]) < 1.0
        assert float(a.gini.iloc[0]) == float(b.gini.iloc[0])


class TestSilhouetteStopdensity:
    def test_silhouette_in_range(self, ray_session):
        import ray.data as rd
        from yetisearch_ray.pipelines import ann

        out = ann.silhouette_by_label(
            rd.read_parquet(f"{SF}/embeddings.parquet"))
        assert ((out.mean_silhouette >= -1.0)
                & (out.mean_silhouette <= 1.0)).all()
        assert int(out.n.sum()) == rd.read_parquet(
            f"{SF}/embeddings.parquet").count()

    def test_silhouette_perfect_clusters(self, ray_session):
        """Two tight, well-separated blobs => silhouette near 1."""
        import pyarrow as pa
        import ray.data as rd
        import numpy as np
        from yetisearch_ray.pipelines import ann

        rng = np.random.default_rng(7)
        a = rng.normal(0, 0.01, (50, 8)) + np.r_[10.0, [0.0] * 7]
        b = rng.normal(0, 0.01, (50, 8)) - np.r_[10.0, [0.0] * 7]
        t = pa.table({
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in
                                   np.vstack([a, b])],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 50 + [1] * 50, pa.int32()),
        })
        out = ann.silhouette_by_label(rd.from_arrow(t))
        assert (out.mean_silhouette > 0.99).all()

    def test_stopword_density_totals(self, ray_session):
        import ray.data as rd
        from yetisearch_ray.pipelines import textstats

        docs = rd.read_parquet(f"{SF}/documents.parquet")
        out = textstats.stopword_density_by_source(docs)
        assert int(out.n_docs.sum()) == docs.count()
        assert ((out.mean_stop_ratio >= 0) & (out.mean_stop_ratio <= 1)).all()
        assert ((out.high_frac >= 0) & (out.high_frac <= 1)).all()


class TestSpanFirstConstantScore:
    def test_span_first_subset_and_monotone(self, ray_session):
        """span_first results are a subset of the plain term match;
        widening max_pos only grows the allowed set."""
        from yetisearch_ray.pipelines import fts_documents as ftsd

        eng = ftsd.get_engine(SF)
        plain = set(eng.match_ids("merge").tolist())
        tight = ftsd.span_first_topk(SF, "merge", max_pos=5, k=1000)
        wide = ftsd.span_first_topk(SF, "merge", max_pos=50, k=1000)
        assert set(tight.doc_id) <= set(wide.doc_id) <= plain
        assert len(tight) < len(wide)

    def test_restrict_ids_prunes_not_rescores(self, ray_session):
        """Scores under restrict_ids equal the unrestricted scores for
        surviving docs (match-set prune, not a rescore)."""
        import numpy as np
        from yetisearch_ray.pipelines import fts_documents as ftsd

        eng = ftsd.get_engine(SF)
        full = eng.search("merge", limit=50, normalize=False).to_pandas()
        keep = full.doc_id.to_numpy()[::2]
        r = eng.search("merge", restrict_ids=keep.astype(np.uint64),
                       limit=50, normalize=False).to_pandas()
        assert set(r.doc_id) <= set(keep)
        fm = dict(zip(full.doc_id, full.score))
        for row in r.itertuples():
            assert abs(row.score - fm[row.doc_id]) < 1e-9

    def test_constant_score_flat(self, ray_session):
        from yetisearch_ray.pipelines import fts_documents as ftsd

        out = ftsd.constant_score_topk(SF, "window", boost=2.5, k=10)
        assert (out.score == 2.5).all()
        assert list(out.doc_id) == sorted(out.doc_id)


class TestChurnQuartilesPrefix:
    def test_churn_rate_bounds(self, ray_session):
        from yetisearch_ray.pipelines import events

        out = events.weekly_churn(SF)
        assert ((out.churn_rate >= 0) & (out.churn_rate <= 1)).all()
        assert (out.churned <= out.active_prev).all()

    def test_quartile_sizes_balanced(self, ray_session):
        """NTILE guarantees: totals add to the event count and tile
        sizes differ by at most |users| (one extra per user)."""
        import ray.data as rd
        from yetisearch_ray.pipelines import events

        out = events.user_value_quartiles(SF)
        n_events = rd.read_parquet(f"{SF}/events.parquet").count()
        assert int(out.n.sum()) == n_events
        assert list(out.tile) == [1, 2, 3, 4]
        assert (out.n.diff().dropna() <= 0).all()  # sizes non-increasing
        # quartiles are value-ordered, so means must rise
        assert (out.mean_value.diff().dropna() > 0).all()

    def test_prefix_clusters_planted(self, ray_session):
        """Plant 5 docs sharing a 100-char prefix: they must surface as
        one cluster of >= 5."""
        import pyarrow as pa
        import ray.data as rd
        from yetisearch_ray.pipelines import dedup

        pref = "z" * 100
        texts = [pref + f" tail {i}" for i in range(5)] + \
            [f"unique doc number {i} with own start" for i in range(20)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        out = dedup.prefix_dup_clusters(ds, min_size=2, k=10)
        assert int(out.n.max()) >= 5


class TestDriftWeightedSample:
    def test_drift_counts_partition(self, ray_session):
        from yetisearch_ray.pipelines import events

        out = events.first_last_drift(SF)
        assert int(out.n_up[0] + out.n_down[0] + out.n_flat[0]) \
            == int(out.n_users[0])

    def test_weighted_sample_deterministic_and_biased(self, ray_session):
        """Same input => identical sample; heavier docs must be
        overrepresented vs a uniform draw (statistical sanity on the
        planted two-weight corpus)."""
        import pyarrow as pa
        import ray.data as rd
        from yetisearch_ray.pipelines import curation

        n = 2000
        heavy = set(range(0, n, 10))  # 10% of docs get 50x weight
        t = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "n_chars": pa.array([5000 if i in heavy else 100
                                 for i in range(n)], pa.int64()),
        })
        a = curation.weighted_sample(rd.from_arrow(t), k=100)
        b = curation.weighted_sample(rd.from_arrow(t), k=100)
        assert list(a.doc_id) == list(b.doc_id)
        frac_heavy = sum(1 for d in a.doc_id if int(d) in heavy) / 100
        assert frac_heavy > 0.5  # 10% of ids, 50x weight -> ~0.85 expected

    def test_weighted_sample_block_invariance(self, ray_session):
        """Repartitioning must not change the sample (no RNG state)."""
        import ray.data as rd
        from yetisearch_ray.pipelines import curation

        docs = rd.read_parquet(f"{SF}/documents.parquet")
        a = curation.weighted_sample(docs, k=25)
        b = curation.weighted_sample(docs.repartition(7), k=25)
        assert list(a.doc_id) == list(b.doc_id)


class TestLorenzQ21:
    def test_lorenz_monotone_and_complete(self, ray_session):
        from yetisearch_ray.pipelines import relational

        out = relational.lorenz_deciles(SF)
        assert list(out.decile) == list(range(1, 11))
        # shares rise decile over decile (revenue-ordered tiles)
        assert (out.rev_share.diff().dropna() >= -1e-9).all()
        assert abs(float(out.cum_share.iloc[-1]) - 1.0) < 1e-4
        # ntile sizing: max size diff is 1
        assert int(out.n.max() - out.n.min()) <= 1

    def test_q21_blame_requires_coworkers(self, ray_session):
        """With an infinite grace no one is late -> empty blame set."""
        from yetisearch_ray.pipelines import relational

        out = relational.q21_supplier_blame(SF, grace_days=100000)
        assert len(out) == 0
        some = relational.q21_supplier_blame(SF, grace_days=30)
        tight = relational.q21_supplier_blame(SF, grace_days=60)
        assert int(some.n_blamed.sum()) >= 0 and len(tight) >= 0


class TestQ7Q19DimVar:
    def test_q7_excludes_local_pairs(self, ray_session):
        from yetisearch_ray.pipelines import relational

        out = relational.q7_nation_trade(SF, k=1000)
        assert (out.supp_nation != out.cust_nation).all()
        assert set(out.l_year) <= {1996, 1997}

    def test_q19_arm_monotonicity(self, ray_session):
        """Q19's revenue equals at least any single arm's contribution
        and the count is bounded by the lineitem rows."""
        from yetisearch_ray.pipelines import relational

        out = relational.q19_disjunctive_revenue(SF)
        assert float(out.revenue[0]) >= 0
        assert int(out.n_lines[0]) >= 0

    def test_dim_variance_matches_numpy(self, ray_session):
        import numpy as np
        import ray.data as rd
        from yetisearch_ray.pipelines import ann

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = ann.dim_variance_topk(ds, k=64)
        m = np.stack(ds.to_pandas()["embedding"].to_numpy()) \
            .astype(np.float64)
        ref_var = m.var(axis=0)
        for r in out.itertuples():
            assert abs(r.variance - ref_var[int(r.dim)]) < 1e-4
