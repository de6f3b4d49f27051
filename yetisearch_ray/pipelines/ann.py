"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact cosine top-k against a broadcast
  query matrix — numpy matmul per batch (the scale baseline: every batch
  task does one GEMM against the broadcast queries; a per-batch local
  top-k keeps the sort input tiny).
- ``ivf_topk``: IVF-bucketed variant — deterministic k-means (fixed seed,
  few Lloyd iterations, fit on a driver-side sample), assignment via
  map_batches, probe only ``nprobe`` nearest centroids.  With
  ``nprobe == n_clusters`` it is exact (== brute force) which is how the
  correctness oracle checks it; smaller nprobe is the scale path.
- ``lsh_bucket_topk``: random-hyperplane LSH variant (approximate,
  rows-only check).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_vectors(t: pa.Table, col: str) -> np.ndarray:
    lst = t[col]
    if lst.num_chunks == 1:
        arr = lst.chunk(0)
    else:
        arr = lst.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(ds, query_vec, *, k=10, vec_col="embedding", id_col="vec_id",
                round_to=6):
    """Exact top-k by cosine similarity to one query vector.

    Per-batch GEMM + local top-k → tiny global sort.  Returns
    (id, cosine) with deterministic tie-break by id.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    def score(t: pa.Table) -> pa.Table:
        m = _normalize(_batch_vectors(t, vec_col))
        sims = m @ q
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if sims.size > k:  # local top-k prune before the global sort
            part = np.argpartition(-sims, k)[: k * 2]
            ids, sims = ids[part], sims[part]
        return pa.table({id_col: pa.array(ids),
                         "cosine": pa.array(np.round(sims, round_to), pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cosine", id_col], descending=[True, False]).limit(k)


def kmeans_fit(sample: np.ndarray, n_clusters: int, *, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a sample (driver-side, small)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cents.shape[0]):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    return cents


def ivf_topk(ds, query_vec, *, k=10, n_clusters=8, nprobe=None,
             vec_col="embedding", id_col="vec_id", sample_size=2048,
             seed=42, round_to=6):
    """IVF: cluster → probe nearest ``nprobe`` centroids only.

    nprobe=None ⇒ all clusters ⇒ exact.  The centroid fit samples
    driver-side (bounded), assignment + scoring stream via map_batches
    with the centroid matrix broadcast (ray.put) once.
    """
    import ray

    nprobe = n_clusters if nprobe is None else min(nprobe, n_clusters)
    sample_t = ds.limit(sample_size).to_pandas()
    sample = np.stack(sample_t[vec_col].to_numpy()).astype(np.float64)
    cents = kmeans_fit(sample, n_clusters, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    # probe list: centroids nearest the query
    order = np.argsort(((cents - q) ** 2).sum(axis=1))
    probed = set(order[:nprobe].tolist())
    cents_ref = ray.put(cents)

    def score(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _batch_vectors(t, vec_col)
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        keep = np.isin(assign, list(probed))
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        mm = _normalize(m[keep])
        sims = mm @ qn
        return pa.table({id_col: pa.array(ids),
                         "cosine": pa.array(np.round(sims, round_to), pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cosine", id_col], descending=[True, False]).limit(k)


def lsh_bucket_topk(ds, query_vec, *, k=10, n_planes=12, vec_col="embedding",
                    id_col="vec_id", seed=42, round_to=6):
    """Random-hyperplane LSH: score only vectors sharing the query's sign
    bucket prefix (approximate — rows-only check)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, q.size))
    qsig = (planes @ q > 0).astype(np.uint8)

    def score(t: pa.Table) -> pa.Table:
        m = _batch_vectors(t, vec_col)
        sigs = (m @ planes.T > 0).astype(np.uint8)
        # keep vectors agreeing on >= n_planes-2 bits (multi-probe-ish)
        agree = (sigs == qsig[None, :]).sum(axis=1)
        keep = agree >= n_planes - 2
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        mm = _normalize(m[keep])
        sims = mm @ qn
        return pa.table({id_col: pa.array(ids),
                         "cosine": pa.array(np.round(sims, round_to), pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cosine", id_col], descending=[True, False]).limit(k)


def embedding_near_dup_pairs(ds, *, threshold=0.95, vec_col="embedding",
                             id_col="vec_id", round_to=6):
    """All pairs with cosine ≥ threshold.

    Test-scale implementation: normalized matrix per block × broadcast
    full matrix (the N² similarity is blocked so each task does one
    GEMM slab).  At 10^9+ vectors this becomes IVF-bucketed pairing —
    same emit schema.
    """
    import ray

    full = ds.to_pandas()
    mat = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ids_all = full[id_col].to_numpy()
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids_all)

    def pairs(t: pa.Table) -> pa.Table:
        m_all = ray.get(mat_ref)
        ids_glob = ray.get(ids_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_vectors(t, vec_col))
        sims = m @ m_all.T
        ra, rb, rc = [], [], []
        for i in range(ids.size):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                if ids[i] < ids_glob[j]:
                    ra.append(int(ids[i]))
                    rb.append(int(ids_glob[j]))
                    rc.append(round(float(sims[i, j]), round_to))
        return pa.table({"id_a": pa.array(ra, pa.int64()),
                         "id_b": pa.array(rb, pa.int64()),
                         "cosine": pa.array(rc, pa.float64())})

    return ds.map_batches(pairs, batch_format="pyarrow")
