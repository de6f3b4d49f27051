"""PII scan/redact, deterministic hash split, and connected-components
dedup clusters — including the distributed label-propagation path that
the small-corpus driver entries don't exercise."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from yetisearch_ray.pipelines import curation, dedup, oracles

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(ray_session):
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def test_pii_scan_matches_duckdb(docs, con):
    got = curation.pii_scan(curation.seed_pii_column(docs)).to_pandas()
    want = con.execute(oracles.pii_scan_sql(curation.PII_PATTERNS)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # non-trivial ground truth: the seeding plants every kind
    assert got.n_email.sum() > 0 and got.n_ipv4.sum() > 0 and got.n_phone.sum() > 0
    assert got.has_pii.sum() < len(got)  # and not everything matches


def test_pii_redact_matches_duckdb(docs, con):
    got = curation.pii_redact(curation.seed_pii_column(docs)).to_pandas()
    want = con.execute(oracles.pii_redact_sql(curation.PII_PATTERNS)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    assert not got.text_redacted.str.contains("@example.com").any()
    assert got.text_redacted.str.contains(r"\[EMAIL\]", regex=True).any()


def test_hash_split_matches_duckdb_and_is_stable(docs, con):
    got = curation.hash_split(docs).to_pandas()
    want = con.execute(oracles.hash_split_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    frac = got.split.value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9  # ~0.8 within md5-uniformity noise
    # rerun → identical assignment (determinism is the whole point)
    again = curation.hash_split(docs).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def _uf_expected(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for e in edges for n in e})
    return {n: find(n) for n in nodes}


PLANTED = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 7)]


@pytest.mark.parametrize("threshold", [10**9, 0])
def test_connected_components_both_paths(ray_session, threshold):
    """driver union-find (threshold huge) and distributed min-label
    propagation (threshold 0) must produce identical components —
    including a diameter-4 chain (20-21-22-23 plus 1-2-3-7)."""
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in PLANTED], pa.int64()),
        "id_b": pa.array([b for _, b in PLANTED], pa.int64())}))
    out = dedup.connected_components(
        pairs, driver_threshold=threshold).to_pandas()
    expected = _uf_expected(PLANTED)
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == expected
    # survivor semantics: min of each component labels itself
    assert got[1] == 1 and got[7] == 1 and got[23] == 20 and got[10] == 10


def test_minhash_clusters_match_sql_closure(docs, con):
    got = dedup.minhash_dedup_clusters(docs, threshold=0.5).to_pandas()
    want = con.execute(oracles.MINHASH_CLUSTERS_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # every cluster label is a member of its own cluster (canonical min)
    labels = set(got.cluster_id)
    assert labels <= set(got.doc_id)


def test_line_dedup_matches_duckdb(ray_session):
    from yetisearch_ray.sources.corpus import corpus_path
    from yetisearch_ray.sources.parquet_source import read_parquet_with_doc_ids

    glob_path = corpus_path(SF) + "/*.parquet" if not corpus_path(SF).endswith(
        ".parquet") else corpus_path(SF)
    ds = read_parquet_with_doc_ids(corpus_path(SF), columns=["content"])
    got = dedup.line_dedup(ds, text_col="content", min_docs=2).to_pandas()
    want = duckdb.connect().execute(
        oracles.line_dedup_sql(glob_path, min_docs=2)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # the scrub must actually fire on this corpus (shared boilerplate
    # lines exist) without degenerating to whole-doc deletion
    assert got.n_dropped.sum() > 0
    assert (got.n_dropped < got.n_lines).all()


def test_curate_corpus_matches_composed_sql(docs, con):
    from yetisearch_ray.analysis.stopwords import STOPWORDS

    got = curation.curate_corpus(
        docs, lang="en", min_quality=0.3, minhash_threshold=0.5).to_pandas()
    want = con.execute(oracles.curate_corpus_sql(
        STOPWORDS["en"], lang="en", min_quality=0.3,
        threshold=0.5)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # each stage must have bitten: lang filter, dedup, and cluster drop
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_en = con.execute(
        "SELECT count(*) FROM documents WHERE lang = 'en'").fetchone()[0]
    assert len(got) < n_en < n_docs
    assert (got.lang == "en").all()


def test_curate_corpus_anti_join_path_matches_broadcast(docs):
    """Survivor filter is size-switched: threshold=0 forces the
    distributed left_anti join on every loser id; both paths must
    return the identical surviving rows (round-4 verdict item #2)."""
    broadcast = curation.curate_corpus(
        docs, lang="en", min_quality=0.3, minhash_threshold=0.5,
        loser_broadcast_threshold=10**9).to_pandas()
    joined = curation.curate_corpus(
        docs, lang="en", min_quality=0.3, minhash_threshold=0.5,
        loser_broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(
        broadcast.reset_index(drop=True), joined.reset_index(drop=True),
        check_dtype=False)
    # the loser set must be non-empty or the switch wasn't exercised
    assert len(joined) > 0


def test_curate_corpus_v2_anti_join_path_matches_broadcast(docs):
    """v2's loser filter got the same size switch (round-5 verdict
    item #1): threshold=0 forces the distributed left_anti drop; both
    paths must return identical surviving rows."""
    broadcast = curation.curate_corpus_v2(
        docs, return_docs=True,
        loser_broadcast_threshold=10**9).to_pandas()
    joined = curation.curate_corpus_v2(
        docs, return_docs=True,
        loser_broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(
        broadcast.reset_index(drop=True), joined.reset_index(drop=True),
        check_dtype=False)
    assert len(joined) > 0


def test_connected_components_distributed_at_scale(ray_session):
    """Distributed min-label propagation on a 6k-edge graph with mixed
    shapes (cliques + diameter-8 chains) equals driver union-find."""
    import numpy as np

    rng = np.random.default_rng(7)
    edges = []
    base = 0
    for _ in range(300):  # 300 cliques of 5 (complete)
        ids = np.arange(base, base + 5)
        edges += [(int(a), int(b)) for i, a in enumerate(ids)
                  for b in ids[i + 1:]]
        base += 5
    for _ in range(300):  # 300 chains of 9 nodes (diameter 8)
        ids = np.arange(base, base + 9)
        edges += [(int(ids[i]), int(ids[i + 1])) for i in range(8)]
        base += 9
    perm = rng.permutation(len(edges))
    ea = np.array([edges[i][0] for i in perm], np.int64)
    eb = np.array([edges[i][1] for i in perm], np.int64)
    pairs = rd.from_arrow(pa.table({"id_a": ea, "id_b": eb})).repartition(8)
    out = dedup.connected_components(pairs, driver_threshold=0).to_pandas()
    expected = _uf_expected(edges)
    assert dict(zip(out.doc_id, out.cluster_id)) == expected


def test_stratified_sample_matches_duckdb(docs, con):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    got = curation.stratified_sample(
        docs, rates=rates, default_rate=0.25).to_pandas()
    want = con.execute(oracles.stratified_sample_sql(
        rates, default_rate=0.25)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    per = got.source.value_counts()
    assert per.get("src0", 0) > per.get("src1", 0)  # rate 1.0 beats 0.5
    assert "src2" not in per  # rate 0.0 drops everything
    # determinism: identical keep-set on rerun
    again = curation.stratified_sample(
        docs, rates=rates, default_rate=0.25).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_rebalance_mix_matches_duckdb(docs, con):
    targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    got = curation.rebalance_mix(docs, targets=targets).to_pandas()
    want = con.execute(oracles.rebalance_mix_sql(targets)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # groups not named in targets are dropped entirely
    assert set(got.source) <= set(targets)
    # achieved mix is within md5-bucket Bernoulli noise of the targets
    frac = got.source.value_counts(normalize=True)
    for g, p in targets.items():
        assert abs(frac.get(g, 0.0) - p) < 0.15
    # determinism: identical keep-set on rerun
    again = curation.rebalance_mix(docs, targets=targets).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_gopher_rules_matches_duckdb(docs, con):
    got = curation.gopher_rules(docs, min_required=1).to_pandas()
    want = con.execute(oracles.gopher_rules_sql(1)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # non-degenerate ground truth on this corpus
    assert 0 < got.gopher_pass.sum() < len(got)
    assert 0 < got.ok_words.sum() < len(got)


def test_gopher_rules_planted_failures(ray_session):
    """Constructed docs exercise every rule branch the synthetic corpus
    can't (bullets, ellipses, symbols, non-alpha words, paper's
    2-required-words default)."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "it must be of service to all that have come with us ") * 4
    rows = [
        {"doc_id": 0, "text": base},                          # passes all
        {"doc_id": 1, "text": "too short to pass."},          # n_words < 50
        {"doc_id": 2, "text": base + " ###### ## # # # # # # # # # #"
                              " # # # # # # # # # # # # #"},  # symbols
        {"doc_id": 3, "text": "\n".join("- bullet item" for _ in range(10))
                              + "\n" + base},                 # bullet ratio
        {"doc_id": 4, "text": "\n".join(f"line {i} trails off..."
                                        for i in range(10))}, # ellipsis
        {"doc_id": 5, "text": ("0101 1010 0110 " * 40)},      # alpha ratio
        {"doc_id": 6, "text": ("zzz qqq xxx vvv www " * 20)}, # no required
    ]
    out = curation.gopher_rules(
        rd.from_items(rows)).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "gopher_pass"])
    assert not out.loc[1, "ok_words"]
    assert not out.loc[2, "ok_symbol"]
    assert not out.loc[3, "ok_bullet"]
    assert not out.loc[4, "ok_ellipsis"]
    assert not out.loc[5, "ok_alpha"]
    assert not out.loc[6, "ok_required"] and out.loc[6, "n_required_words"] == 0
    assert out.loc[0, "n_required_words"] >= 2


def test_c4_line_clean_matches_duckdb(docs, con):
    got = curation.c4_line_clean(
        curation.seed_lines_column(docs)).to_pandas()
    want = con.execute(oracles.C4_LINE_CLEAN_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    assert 0 < got.doc_keep.sum() < len(got)
    assert got.n_kept.nunique() > 2  # seeding produced varied line mixes


def test_c4_line_clean_semantics(ray_session):
    """Hand-built doc pins each C4 rule: terminal punct, 5-word floor,
    javascript line, lorem-ipsum page drop, brace page drop."""
    import hashlib

    keep1 = "This line is long enough and ends with a period."
    keep2 = "Another retained line also ends with terminal punctuation!"
    keep3 = 'A third line ends with a quotation mark"'
    rows = [
        {"doc_id": 0, "text": "\n".join([
            keep1, "short one.", "no terminal punctuation here at all",
            "this JavaScript line is dropped despite ending well.",
            keep2, keep3])},
        {"doc_id": 1, "text": "\n".join([keep1, keep2, keep3,
                                         "but Lorem Ipsum kills the page."])},
        {"doc_id": 2, "text": "\n".join([keep1, keep2, keep3,
                                         "brace { kills the page."])},
        {"doc_id": 3, "text": "\n".join([keep1, keep2])},  # < 3 kept lines
    ]
    out = curation.c4_line_clean(
        rd.from_items(rows)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_kept"] == 3 and bool(out.loc[0, "doc_keep"])
    expect = hashlib.md5("\n".join([keep1, keep2, keep3]).encode()).hexdigest()
    assert out.loc[0, "clean_md5"] == expect
    assert not out.loc[1, "doc_keep"]  # lorem ipsum
    assert not out.loc[2, "doc_keep"]  # curly brace
    assert not out.loc[3, "doc_keep"]  # fewer than 3 retained lines


def test_line_dedup_no_hot_lines(ray_session):
    """min_docs above any line's doc count → nothing dropped, clean_md5
    equals the original text's md5."""
    import hashlib

    rows = [{"doc_id": i, "text": f"unique line {i}\nsecond {i}"}
            for i in range(6)]
    ds = rd.from_items(rows)
    out = dedup.line_dedup(ds, min_docs=99).to_pandas()
    assert (out.n_dropped == 0).all()
    for r, row in zip(rows, out.itertuples()):
        assert row.clean_md5 == hashlib.md5(r["text"].encode()).hexdigest()


def test_line_dedup_drops_shared_boilerplate(ray_session):
    rows = [{"doc_id": i, "text": f"LICENSE HEADER\nbody {i}"}
            for i in range(4)]
    out = dedup.line_dedup(rd.from_items(rows), min_docs=2).to_pandas()
    assert (out.n_dropped == 1).all()  # only the shared header goes
    assert (out.n_lines == 2).all()


def test_pii_scan_empty_and_null_text(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": ""},
                        {"doc_id": 1, "text": None},
                        {"doc_id": 2, "text": "a@b.co and 1.2.3.4"}])
    out = curation.pii_scan(ds).to_pandas()
    assert out.has_pii.tolist() == [0, 0, 1]
    assert out.n_email.tolist() == [0, 0, 1]
    assert out.n_ipv4.tolist() == [0, 0, 1]


def test_connected_components_empty_pairs(ray_session):
    pairs = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    out_ds = dedup.connected_components(pairs)
    assert out_ds.count() == 0
    # schema survives on the Dataset (to_pandas drops columns on
    # zero-block datasets — a Ray Data wart handled by _ensure_cols at
    # the entry layer)
    assert out_ds.schema().names == ["doc_id", "cluster_id"]


def test_training_sequences_matches_duckdb_and_block_independent(docs, con):
    got = curation.export_training_sequences(docs, seq_len=128).to_pandas()
    want = con.execute(oracles.training_sequences_sql(128)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    assert len(got) > 50  # the corpus yields a real number of sequences
    # block-boundary independence: 16-way repartition -> identical output
    again = curation.export_training_sequences(
        docs.repartition(16), seq_len=128).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_training_sequences_semantics(ray_session, tmp_path):
    """EOD placement and chunking pinned against a local reference."""
    import hashlib
    import re

    import numpy as np

    from yetisearch_ray.pipelines.dedup import _md5_u64_tokens
    from yetisearch_ray.pipelines.textstats import BPE_ISH_PATTERN

    texts = ["alpha beta gamma", "", "delta " * 40, "omega"]
    rows = [{"doc_id": i, "text": s} for i, s in enumerate(texts)]
    L, V = 16, 65535
    out = curation.export_training_sequences(
        rd.from_items(rows), seq_len=L, vocab_size=V).to_pandas()

    bpe = re.compile(BPE_ISH_PATTERN)
    stream = []
    for s in texts:
        toks = bpe.findall(s)
        if toks:
            stream += (_md5_u64_tokens(np.array(toks, object)) % V).tolist()
        stream.append(V)  # EOD after EVERY doc, even empty ones
    n_full = len(stream) // L
    assert len(out) == n_full
    for k in range(n_full):
        chunk = stream[k * L:(k + 1) * L]
        joined = ",".join(str(int(x)) for x in chunk)
        assert out.loc[k, "first_tid"] == chunk[0]
        assert out.loc[k, "tokens_md5"] == hashlib.md5(
            joined.encode()).hexdigest()
    # parquet sink writes the same rows
    curation.export_training_sequences(
        rd.from_items(rows), seq_len=L, vocab_size=V,
        out_dir=str(tmp_path / "seqs"))
    back = pd.read_parquet(tmp_path / "seqs").sort_values(
        "seq_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, out, check_dtype=False)


def test_best_survivors_matches_duckdb(docs, con):
    from yetisearch_ray.analysis.stopwords import STOPWORDS

    got = dedup.best_survivors(docs, threshold=0.5)
    want = con.execute(oracles.best_survivors_sql(STOPWORDS["en"])).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # one survivor per cluster, and it's a member of that cluster
    clusters = dedup.minhash_dedup_clusters(docs, threshold=0.5).to_pandas()
    assert len(got) == clusters.cluster_id.nunique()
    members = clusters.groupby("cluster_id").doc_id.apply(set)
    for _, row in got.iterrows():
        assert row.doc_id in members[row.cluster_id]
    # the winner has the max quality in its cluster
    from yetisearch_ray.pipelines.textstats import quality_scores
    q = quality_scores(docs).to_pandas().set_index("doc_id").quality
    joined = clusters.assign(q=clusters.doc_id.map(q))
    best = joined.groupby("cluster_id").q.max()
    assert all(abs(row.quality - best[row.cluster_id]) < 1e-12
               for _, row in got.iterrows())


def test_curate_corpus_v2_equals_staged_replay(docs, ray_session):
    """The v2 DAG must equal applying its (individually SQL-oracled)
    stages through the public API one at a time."""
    import numpy as np

    from yetisearch_ray.pipelines import textstats

    got = curation.curate_corpus_v2(
        docs, targets={"src0": 0.5, "src1": 0.5},
        return_docs=True).to_pandas()

    # stage replay
    g = curation.gopher_rules(docs, min_required=1).to_pandas()
    keep1 = set(g.loc[g.gopher_pass, "doc_id"])
    full = docs.to_pandas()
    s1 = full[full.doc_id.isin(keep1)]

    import ray.data as rd
    s1_ds = rd.from_arrow(pa.Table.from_pandas(s1, preserve_index=False)
                          .replace_schema_metadata(None))
    cc = textstats.ccnet_ppl_buckets(s1_ds)
    keep2 = set(cc.loc[cc.ppl_bucket != "tail", "doc_id"])
    s2 = s1[s1.doc_id.isin(keep2)]

    s2_ds = rd.from_arrow(pa.Table.from_pandas(s2, preserve_index=False)
                          .replace_schema_metadata(None))
    clusters_ds = dedup.minhash_dedup_clusters(
        s2_ds, threshold=0.5).materialize()
    clusters = clusters_ds.to_pandas()
    winners = dedup.best_survivors(s2_ds, threshold=0.5,
                                   clusters=clusters_ds)
    losers = set(clusters.doc_id) - set(winners.doc_id)
    s3 = s2[~s2.doc_id.isin(losers)]

    s3_ds = rd.from_arrow(pa.Table.from_pandas(s3, preserve_index=False)
                          .replace_schema_metadata(None))
    s4 = curation.rebalance_mix(
        s3_ds, targets={"src0": 0.5, "src1": 0.5}).to_pandas()

    assert list(got.doc_id) == list(s4.doc_id)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  s4.reset_index(drop=True),
                                  check_dtype=False)
    # every stage bit: each filter strictly shrank the corpus
    assert len(full) > len(s1) > len(s2) >= len(s3) > len(s4) > 0

    # and the sequence head matches exporting the staged survivors
    seq_direct = curation.curate_corpus_v2(
        docs, targets={"src0": 0.5, "src1": 0.5}, seq_len=64).to_pandas()
    seq_replay = curation.export_training_sequences(
        rd.from_arrow(pa.Table.from_pandas(s4, preserve_index=False)
                      .replace_schema_metadata(None)),
        seq_len=64).to_pandas()
    pd.testing.assert_frame_equal(seq_direct, seq_replay,
                                  check_dtype=False)
