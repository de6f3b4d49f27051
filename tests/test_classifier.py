"""Distributed hashed-BoW logistic regression (pipelines/classifier.py):
planted-separability, lexical-rule recovery, quality-heuristic
distillation bar, and output determinism."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from yetisearch_ray.pipelines import classifier as C

VOCAB_POS = ["alpha", "beta", "gamma", "delta", "epsilon"]
VOCAB_NEG = ["zeta", "eta", "theta", "iota", "kappa"]


def _two_class_corpus(n_per=300, words=25, seed=11):
    """Disjoint-vocabulary classes — linearly separable by construction."""
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for cls, vocab in ((1, VOCAB_POS), (0, VOCAB_NEG)):
        for _ in range(n_per):
            texts.append(" ".join(rng.choice(vocab, size=words)))
            labels.append(cls)
    perm = rng.permutation(len(texts))
    return ([texts[i] for i in perm],
            np.asarray([labels[i] for i in perm], np.int64))


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    texts, labels = _two_class_corpus()
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "label": pa.array(labels, pa.int64()),
    })
    return rd.from_arrow(t).repartition(8), t


def _make_column_labels():
    # a closure (cloudpickled by value) — a module-level function would
    # be pickled by reference to this test module, which Ray workers
    # cannot import
    return lambda t: t["label"].to_numpy(zero_copy_only=False).astype(
        np.float64)


def test_planted_separable_accuracy(planted_ds):
    ds, t = planted_ds
    w, info = C.logreg_fit_distributed(ds, _make_column_labels(), dim=1 << 12)
    assert info["n"] == t.num_rows
    # loss strictly improves from the w=0 starting point (ln 2)
    assert info["loss"][0] == pytest.approx(np.log(2.0), abs=1e-6)
    assert info["loss"][-1] < 0.1
    scores = C.logreg_score(ds, w, dim=1 << 12).to_pandas()
    merged = scores.set_index("doc_id").join(
        t.to_pandas().set_index("doc_id"))
    acc = ((merged["prob"] >= 0.5).astype(int) == merged["label"]).mean()
    assert acc >= 0.99, acc


def test_recovers_lexical_rule(planted_ds):
    """Every positive-vocab bucket must get a positive weight and every
    negative-vocab bucket a negative one — the model literally recovers
    the planted rule, not just its accuracy."""
    import pandas as pd

    from yetisearch_ray.pipelines.dedup import _HASH_KEY

    ds, _ = planted_ds
    dim = 1 << 12
    w, _ = C.logreg_fit_distributed(ds, _make_column_labels(), dim=dim)
    pos_idx = (pd.util.hash_array(np.asarray(VOCAB_POS, object),
                                  hash_key=_HASH_KEY)
               % np.uint64(dim)).astype(np.int64)
    neg_idx = (pd.util.hash_array(np.asarray(VOCAB_NEG, object),
                                  hash_key=_HASH_KEY)
               % np.uint64(dim)).astype(np.int64)
    assert (w[pos_idx] > 0).all()
    assert (w[neg_idx] < 0).all()
    assert w[pos_idx].min() > w[neg_idx].max() + 0.1


def test_quality_distillation_bar(ray_session):
    """Distilling the oracled quality heuristic over the driver corpus
    must beat the majority class by a clear margin."""
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = C.quality_classifier(ds).to_pandas()
    assert len(out) > 0
    majority = max(out["label"].mean(), 1.0 - out["label"].mean())
    agreement = (out["label"] == out["pred"]).mean()
    assert agreement >= min(0.95, majority + 0.05), (agreement, majority)


def test_output_deterministic(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = C.quality_classifier(ds, iters=3).to_pandas()
    b = C.quality_classifier(ds, iters=3).to_pandas()
    assert (a["pred"] == b["pred"]).all()
    # probs rounded to 4 dp — block-order float noise must not surface
    assert np.allclose(a["prob"], b["prob"], atol=2e-4)


def test_empty_and_null_text(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["", None, "alpha beta"], pa.string()),
    })
    ds = rd.from_arrow(t)
    w = np.zeros((1 << 12) + 1)
    out = C.logreg_score(ds, w, dim=1 << 12).to_pandas()
    assert len(out) == 3
    assert np.allclose(out["prob"], 0.5)
