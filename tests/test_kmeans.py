"""Distributed k-means (pipelines/cluster.py) vs a pure-NumPy Lloyd
reference and planted ground truth."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from yetisearch_ray.pipelines.cluster import (
    kmeans_assign,
    kmeans_cluster_sizes,
    kmeans_fit_distributed,
)


def _blobs(n_per=200, k=4, d=16, sep=30.0, seed=7):
    """k well-separated Gaussian blobs; returns (matrix, labels)."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(k, d)) * sep
    pts = np.concatenate(
        [cents[i] + rng.normal(size=(n_per, d)) for i in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(pts.shape[0])
    return pts[perm], labels[perm]


@pytest.fixture(scope="module")
def blob_ds(ray_session):
    pts, labels = _blobs()
    t = pa.table({
        "vec_id": pa.array(np.arange(pts.shape[0], dtype=np.int64)),
        "embedding": pa.array([row for row in pts], pa.list_(pa.float64())),
    })
    return rd.from_arrow(t).repartition(8), pts, labels


def test_recovers_planted_blobs(blob_ds):
    ds, pts, labels = blob_ds
    cents, info = kmeans_fit_distributed(ds, 4, iters=8, seed=3)
    asg = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    got = asg["cluster_id"].to_numpy()
    # cluster ids are arbitrary — require a bijection onto the planted
    # labels (every planted blob maps to exactly one k-means cluster)
    mapping = {}
    for lab in range(4):
        cids = np.unique(got[labels == lab])
        assert cids.size == 1, f"blob {lab} split across clusters {cids}"
        mapping[lab] = cids[0]
    assert len(set(mapping.values())) == 4


def test_matches_numpy_reference_inertia(blob_ds):
    """Same data, same final partition ⇒ inertia equals a single-machine
    Lloyd run to float tolerance (assignments are a bijection, so the
    converged inertia is partition-determined)."""
    ds, pts, labels = blob_ds
    cents, info = kmeans_fit_distributed(ds, 4, iters=10, seed=3)
    # reference: Lloyd from the CONVERGED centroids (one more step is a
    # fixed point) — checks the distributed sums/counts are exact
    d2 = ((pts * pts).sum(1)[:, None] - 2 * pts @ cents.T
          + (cents * cents).sum(1)[None, :])
    ref_inertia = float(np.maximum(d2.min(axis=1), 0).sum())
    assert info["inertia"][-1] == pytest.approx(ref_inertia, rel=1e-9)


def test_inertia_monotone_and_counts(blob_ds):
    ds, pts, labels = blob_ds
    cents, info = kmeans_fit_distributed(ds, 4, iters=6, seed=3)
    ine = info["inertia"]
    assert all(ine[i + 1] <= ine[i] + 1e-6 for i in range(len(ine) - 1))
    assert int(info["counts"].sum()) == pts.shape[0]
    assert cents.shape == (4, pts.shape[1])


def test_empty_cluster_keeps_centroid(ray_session):
    """k > distinct points: surplus centroids keep their previous
    position (no NaN, deterministic)."""
    pts = np.repeat(np.array([[0.0, 0.0], [10.0, 10.0]]), 50, axis=0)
    t = pa.table({
        "vec_id": pa.array(np.arange(100, dtype=np.int64)),
        "embedding": pa.array([row for row in pts], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t)
    cents, info = kmeans_fit_distributed(ds, 5, iters=4, seed=0)
    assert not np.isnan(cents).any()
    assert int(info["counts"].sum()) == 100
    # exactly the two distinct locations get members
    assert (info["counts"] > 0).sum() == 2


def test_cluster_sizes_rollup(blob_ds):
    ds, pts, labels = blob_ds
    sizes = kmeans_cluster_sizes(ds, 4, iters=6, seed=3).to_pandas()
    assert list(sizes.columns) == ["cluster_id", "n_vecs"]
    assert sizes["n_vecs"].sum() == pts.shape[0]
    # planted blobs are equal-sized
    assert sorted(sizes["n_vecs"]) == [200, 200, 200, 200]


# ------------------------------------------------------ SemDeDup


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    """Blobs + planted near-duplicates (tiny perturbations of members)."""
    pts, labels = _blobs(n_per=100, k=4, d=16, sep=30.0, seed=11)
    rng = np.random.default_rng(5)
    dup_src = rng.choice(pts.shape[0], size=20, replace=False)
    dups = pts[dup_src] + rng.normal(scale=1e-4, size=(20, 16))
    allpts = np.concatenate([pts, dups])
    ids = np.arange(allpts.shape[0], dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r for r in allpts], pa.list_(pa.float64())),
    })
    return rd.from_arrow(t).repartition(8), allpts, dup_src


def test_semantic_pairs_match_exact(dup_ds):
    """Same-blob near-dups land in the same k-means cluster (sep=30 ≫
    perturbation), so SemDeDup recall vs the exact all-pairs operator is
    100% here — and it must not invent pairs either."""
    from yetisearch_ray.pipelines.ann import embedding_near_dup_pairs
    from yetisearch_ray.pipelines.cluster import semantic_near_dup_pairs

    ds, allpts, dup_src = dup_ds
    exact = embedding_near_dup_pairs(ds, threshold=0.9999,
                                     method="exact").to_pandas()
    sem = semantic_near_dup_pairs(ds, threshold=0.9999, n_clusters=4,
                                  iters=6, seed=3)
    sem = sem.to_pandas()
    e = set(zip(exact["id_a"], exact["id_b"]))
    s = set(zip(sem["id_a"], sem["id_b"]))
    assert len(e) >= 20          # every planted dup found by exact
    assert s == e


def test_semantic_dedup_rows_drop_higher_ids(dup_ds):
    from yetisearch_ray.pipelines.cluster import (semantic_dedup_rows,
                                                  semantic_near_dup_pairs)

    ds, allpts, dup_src = dup_ds
    pairs = semantic_near_dup_pairs(ds, threshold=0.9999, n_clusters=4,
                                    iters=6, seed=3).to_pandas()
    surv = semantic_dedup_rows(ds, threshold=0.9999, n_clusters=4,
                               iters=6, seed=3).to_pandas()
    dropped = set(pairs["id_b"])
    assert set(surv["vec_id"]) == set(range(allpts.shape[0])) - dropped
    # survivors keep the full row schema
    assert "embedding" in surv.columns


def test_semantic_dedup_no_dups_is_identity(ray_session):
    """A corpus with no near-dup pair survives intact.  (Blob data
    can't be used here: two same-blob points at sep=30 already have
    cosine ≈ 1 − d/(2·sep²·d) ≈ 0.9994, and one seeded pair crosses
    0.9999 by chance.)  Random directions in d=64 keep every pairwise
    cosine far below threshold — verified for this seed."""
    rng = np.random.default_rng(17)
    pts = rng.normal(size=(300, 64))
    m = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, 0.0)
    assert sims.max() < 0.99  # the data really has no near-dups

    from yetisearch_ray.pipelines.cluster import semantic_dedup_rows

    t = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r for r in pts], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(6)
    surv = semantic_dedup_rows(ds, threshold=0.9999, n_clusters=4,
                               iters=4, seed=3).to_pandas()
    assert len(surv) == 300


class TestDistributedPCA:
    def test_matches_numpy_full_matrix(self, ray_session):
        import ray.data as rd

        from yetisearch_ray.pipelines.cluster import (pca_fit_distributed,
                                                      pca_project)

        rng = np.random.default_rng(5)
        # anisotropic gaussian so the spectrum has a clear order
        d, n = 16, 4000
        scales = np.linspace(4.0, 0.25, d)
        basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
        X = (rng.normal(size=(n, d)) * scales) @ basis.T + rng.normal(size=d)
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row for row in X.astype(np.float32)],
                                  pa.list_(pa.float32()))})
        ds = rd.from_arrow(tbl).repartition(16)  # force multi-block partials

        mean, comps, ev = pca_fit_distributed(ds, 4)
        Xf = X.astype(np.float32).astype(np.float64)
        C = np.cov(Xf, rowvar=False)
        w, v = np.linalg.eigh(C)
        order = np.argsort(w)[::-1][:4]
        ref = v[:, order].T
        for j in range(4):
            if ref[j, np.argmax(np.abs(ref[j]))] < 0:
                ref[j] = -ref[j]
        assert np.abs(mean - Xf.mean(0)).max() < 1e-9
        assert np.abs(ev - w[order]).max() < 1e-7
        assert np.abs(comps - ref).max() < 1e-6
        assert (np.diff(ev) <= 1e-12).all()  # descending spectrum

        got = pca_project(ds, mean, comps).to_pandas()
        Y = np.round((Xf - Xf.mean(0)) @ ref.T, 6)
        assert len(got) == n
        for j in range(4):
            assert np.abs(got[f"pc{j}"].to_numpy() - Y[:, j]).max() < 1e-4

    def test_sign_convention_deterministic(self, ray_session):
        from yetisearch_ray.pipelines.cluster import pca_fit_distributed
        import ray.data as rd

        rng = np.random.default_rng(9)
        X = rng.normal(size=(500, 8))
        tbl = pa.table({"embedding": pa.array(
            [r for r in X.astype(np.float32)], pa.list_(pa.float32()))})
        _, c1, _ = pca_fit_distributed(rd.from_arrow(tbl), 3)
        _, c2, _ = pca_fit_distributed(rd.from_arrow(tbl).repartition(8), 3)
        assert np.abs(c1 - c2).max() < 1e-7
        for j in range(3):
            assert c1[j, np.argmax(np.abs(c1[j]))] > 0


# ---------------------------------------------------------------- k-center
class TestKCenterSample:
    """Greedy farthest-point selection vs a pure-NumPy Gonzalez loop."""

    @staticmethod
    def _numpy_kcenter(pts: np.ndarray, k: int) -> list[int]:
        sel = [0]  # seeded at the minimum id (= row 0 here)
        mind = np.linalg.norm(pts - pts[0], axis=1)
        mind[0] = -1.0
        for _ in range(k - 1):
            # argmax of min-distance, ties to the smaller id
            nxt = int(np.lexsort((np.arange(len(pts)), -mind))[0])
            sel.append(nxt)
            d = np.linalg.norm(pts - pts[nxt], axis=1)
            mind = np.minimum(mind, d)
            mind[np.asarray(sel)] = -1.0
        return sel

    def test_matches_numpy_reference(self, blob_ds):
        from yetisearch_ray.pipelines.cluster import kcenter_sample

        ds, pts, _ = blob_ds
        out = kcenter_sample(ds, 10)
        assert out.columns.tolist() == ["sel_rank", "vec_id"]
        assert out.sel_rank.tolist() == list(range(10))
        assert out.vec_id.tolist() == self._numpy_kcenter(pts, 10)

    def test_covers_every_blob(self, blob_ds):
        """With k = #blobs+2 on well-separated blobs, farthest-point must
        touch every blob (the coverage property the primitive exists for)."""
        from yetisearch_ray.pipelines.cluster import kcenter_sample

        ds, _, labels = blob_ds
        out = kcenter_sample(ds, 6)
        assert set(labels[out.vec_id.to_numpy()]) == set(range(4))

    def test_k_larger_than_n(self, ray_session):
        from yetisearch_ray.pipelines.cluster import kcenter_sample

        pts = np.arange(6, dtype=np.float64).reshape(3, 2)
        t = pa.table({
            "vec_id": pa.array([5, 2, 9], pa.int64()),
            "embedding": pa.array([r for r in pts], pa.list_(pa.float64())),
        })
        out = kcenter_sample(rd.from_arrow(t), 10)
        assert len(out) == 3 and out.vec_id.tolist()[0] == 2
