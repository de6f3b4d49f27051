"""Property-based rank identity vs real SQLite FTS5.

Beyond the fixed goldens (test_fts5_goldens.py): a seeded random corpus
(skewed vocabulary, punctuation, repeated terms, empty-ish docs) is
indexed once by both engines, then Hypothesis drives randomized queries
across every class — single / OR / AND / phrase / smart (NEAR arm) /
weighted — asserting identical doc ids and bm25 scores each time.
"""
import sqlite3

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yetisearch_ray.search.engine import SearchEngine, open_index

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
         "rho", "sigma", "tau", "phi", "psi", "omega", "hot"]


def _make_corpus(n_docs=120, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        n_title = int(rng.integers(1, 5))
        n_body = int(rng.integers(3, 60))
        # zipf-ish skew: low vocab indices much more common; 'hot' is
        # planted in most docs
        def pick(n):
            idx = np.minimum(rng.zipf(1.6, n) - 1, len(VOCAB) - 2)
            return [VOCAB[j] for j in idx]
        title = " ".join(pick(n_title))
        body_words = pick(n_body)
        if rng.random() < 0.7:
            body_words.append("hot")
        # sprinkle punctuation so tokenization parity is exercised
        body = ""
        for w in body_words:
            sep = rng.choice([" ", " ", " ", ", ", ". ", "; ", "-"])
            body += w + str(sep)
        docs.append((i, title, body.strip()))
    return docs


@pytest.fixture(scope="module")
def prop_pair(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    from yetisearch_ray.index.build import IndexConfig, build_index

    docs = _make_corpus()
    idx_dir = str(tmp_path_factory.mktemp("prop")) + "/idx"
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.uint64()),
        "title": pa.array([d[1] for d in docs]),
        "body": pa.array([d[2] for d in docs]),
    })
    cfg = IndexConfig(fields=[("title", "title"), ("body", "body")],
                      store_columns=["title", "body"], num_partitions=4)
    build_index(rd.from_arrow(t), idx_dir, cfg, input_fingerprint="prop")
    eng = SearchEngine(open_index(idx_dir), cache_ttl=0.0)

    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE fts USING fts5"
               "(id UNINDEXED, title, body, tokenize='unicode61')")
    db.executemany("INSERT INTO fts(id, title, body) VALUES (?,?,?)", docs)
    yield eng, db
    db.close()


def _fts5(db, match, w=None, k=200):
    bm25 = ("bm25(fts, 1.0, %f, %f)" % w) if w else "bm25(fts)"
    try:
        rows = db.execute(
            f"SELECT id, {bm25} FROM fts WHERE fts MATCH ? "
            "ORDER BY 2 ASC, id ASC LIMIT ?", (match, k)).fetchall()
    except sqlite3.OperationalError:
        return None
    return [(int(i), -r) for i, r in rows]


def _assert_same(got, want, ctx):
    __tracebackhide__ = True
    assert len(got) == len(want), (ctx, len(got), len(want))
    gs = sorted(((round(s, 7), i) for i, s in got))
    ws = sorted(((round(s, 7), i) for i, s in want))
    for (s1, i1), (s2, i2) in zip(gs, ws):
        assert i1 == i2 and abs(s1 - s2) < 1e-6, (ctx, (i1, s1), (i2, s2))


terms_st = st.lists(st.sampled_from(VOCAB + ["absent", "qqq"]),
                    min_size=1, max_size=3)


@settings(max_examples=int(__import__("os").environ.get("FTS5_PROP_EXAMPLES", "50")), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms=terms_st,
       mode=st.sampled_from(["smart", "and", "or", "phrase"]),
       w=st.sampled_from([None, (3.0, 1.0), (1.0, 7.5)]))
def test_random_queries_rank_identical(prop_pair, terms, mode, w):
    eng, db = prop_pair
    q = " ".join(terms)
    uniq = list(dict.fromkeys(terms))  # reference array_unique on arms
    if mode == "phrase":
        match = '"' + " ".join(terms) + '"'
        q = match
    elif mode == "and":
        match = " AND ".join(uniq)
    elif mode == "or":
        match = " OR ".join(uniq)
    else:
        if len(terms) == 1:
            match = terms[0]
        else:
            joined = " ".join(terms)
            match = (f'"{joined}" OR NEAR({joined}, 10) OR '
                     + " OR ".join(uniq))
    want = _fts5(db, match, w=w)
    if want is None:
        return  # FTS5 rejected the expression; nothing to compare
    kw = {}
    if w:
        kw["field_weights"] = {"title": w[0], "body": w[1]}
    got = eng.search(q, limit=200, mode=mode, normalize=False, **kw)
    _assert_same(list(zip(got["doc_id"].to_pylist(),
                          got["score"].to_pylist())),
                 want, (terms, mode, w))
