"""Distributed k-means over an embedding column (Lloyd's algorithm).

The scale path a training-data pipeline needs for SEMANTIC clustering /
semantic dedup (SemDeDup-style): fit centroids over the full corpus with
iterative map-reduce passes, then assign every vector to its cluster.

Shape (Ray-Data-first, no driver materialization of vectors):

- **fit**: each iteration is ONE streaming pass — ``map_batches``
  computes per-block partial statistics (per-centroid vector sums,
  counts, inertia) against the BROADCAST centroid matrix (``ray.put``
  once per iteration), then a tiny ``groupby(cid)`` combine reduces
  blocks×k partial rows to k rows.  Only the k×(d+2) combined table
  ever reaches the driver; vectors never do.  At 100 TB the exchange
  moves k rows per block — negligible next to the read.
- **assign**: one ``map_batches`` GEMM pass against the broadcast
  centroids; output is (id, cluster_id, dist2) rows.

The driver-side sample k-means in ``ann.kmeans_fit`` (reference-free
IVF seeding) provides the deterministic initialization; this module
refines it over the FULL corpus, which the sample fit cannot do.

Numeric note: partial sums combine in block order, so centroid floats
can differ from a single-pass NumPy reference in the last ulps; with
any real cluster structure the ASSIGNMENTS are identical (tested on
planted blobs in tests/test_kmeans.py).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _batch_vectors, _fit_sample

__all__ = ["kmeans_fit_distributed", "kmeans_assign", "kmeans_cluster_sizes",
           "kcenter_sample",
           "semantic_near_dup_pairs", "semantic_dedup_rows"]


def _kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic (seeded) k-means++ seeding on a sample matrix."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(k, n)
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        if tot <= 0:  # all remaining points coincide with a centroid
            probs = np.full(n, 1.0 / n)
        else:
            probs = d2 / tot
        nxt = int(rng.choice(n, p=probs))
        cents.append(sample[nxt])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.stack(cents).astype(np.float64)


def _partial_stats(cents_ref, vec_col: str):
    """Per-block partial k-means statistics vs broadcast centroids."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)                       # (k, d)
        m = _batch_vectors(t, vec_col)               # (n, d)
        k, d = c.shape
        if m.shape[0] == 0:
            return pa.table({
                "cid": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "inertia": pa.array([], pa.float64()),
                "vsum": pa.array([], pa.list_(pa.float64())),
            })
        # squared euclidean via the expanded form (one GEMM, no (n,k,d))
        d2 = ((m * m).sum(axis=1)[:, None]
              - 2.0 * (m @ c.T)
              + (c * c).sum(axis=1)[None, :])
        a = d2.argmin(axis=1)
        mind = np.maximum(d2[np.arange(a.size), a], 0.0)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, a, m)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        inert = np.bincount(a, weights=mind, minlength=k)
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "inertia": pa.array(inert, pa.float64()),
            "vsum": pa.array([row for row in sums], pa.list_(pa.float64())),
        })

    return partial


def _combine(t: pa.Table) -> pa.Table:
    """Reduce one cid's partial rows to a single row."""
    if t.num_rows == 0:
        return t
    vs = t["vsum"].combine_chunks()
    flat = vs.flatten().to_numpy(zero_copy_only=False)
    d = flat.size // t.num_rows
    total = flat.reshape(t.num_rows, d).sum(axis=0)
    return pa.table({
        "cid": t["cid"].slice(0, 1),
        "cnt": pa.array([int(np.sum(t["cnt"].to_numpy(zero_copy_only=False)))],
                        pa.int64()),
        "inertia": pa.array(
            [float(np.sum(t["inertia"].to_numpy(zero_copy_only=False)))],
            pa.float64()),
        "vsum": pa.array([total], pa.list_(pa.float64())),
    })


def kmeans_fit_distributed(ds, n_clusters: int, *, vec_col: str = "embedding",
                           iters: int = 10, seed: int = 42,
                           sample_size: int = 4096, tol: float = 1e-7):
    """Full-corpus Lloyd k-means; returns ``(centroids, info)``.

    ``info`` carries per-iteration inertia (monotone non-increasing up
    to combine-order float noise), the iteration count actually run,
    and the final per-cluster counts.  An empty cluster keeps its
    previous centroid (deterministic; no reseeding randomness).

    Each iteration re-reads ``ds`` — for an iterated fit over a Dataset
    built from an expensive upstream pipeline, pass a materialized or
    parquet-backed Dataset so the per-iteration pass is a plain scan.
    """
    import ray

    # deterministic init: k-means++ on a bounded uniform sample, then a
    # few driver Lloyd steps.  (ann.kmeans_fit's uniform-random init is
    # fine for IVF bucketing but collapses blobs whenever two seeds land
    # in one cluster — ++ spreads seeds by squared distance.)
    sample = _fit_sample(ds.select_columns([vec_col]), vec_col,
                         sample_size, seed)
    cents = _kmeanspp_init(sample, n_clusters, seed)
    for _ in range(3):
        d2 = ((sample * sample).sum(axis=1)[:, None]
              - 2.0 * (sample @ cents.T)
              + (cents * cents).sum(axis=1)[None, :])
        a = d2.argmin(axis=1)
        for c in range(cents.shape[0]):
            mask = a == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    inertias: list[float] = []
    counts = None
    it_run = 0
    for it in range(iters):
        cents_ref = ray.put(cents)
        parts = ds.select_columns([vec_col]).map_batches(
            _partial_stats(cents_ref, vec_col), batch_format="pyarrow")
        comb = (parts.groupby("cid")
                .map_groups(_combine, batch_format="pyarrow")
                .to_pandas())                      # k rows — tiny
        comb = comb.sort_values("cid").reset_index(drop=True)
        k, d = cents.shape
        new = cents.copy()
        cnt = np.zeros(k, dtype=np.int64)
        for _, row in comb.iterrows():
            c = int(row["cid"])
            n = int(row["cnt"])
            cnt[c] = n
            if n > 0:
                new[c] = np.asarray(row["vsum"], dtype=np.float64) / n
        inertias.append(float(comb["inertia"].sum()))
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents, counts = new, cnt
        it_run = it + 1
        if shift < tol:
            break
    return cents, {"inertia": inertias, "iters_run": it_run,
                   "counts": counts}


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", round_to: int = 6):
    """(id, cluster_id, dist2) per vector — one broadcast GEMM pass."""
    import ray

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _batch_vectors(t, vec_col)
        d2 = ((m * m).sum(axis=1)[:, None]
              - 2.0 * (m @ c.T)
              + (c * c).sum(axis=1)[None, :])
        a = d2.argmin(axis=1)
        mind = np.maximum(d2[np.arange(a.size), a], 0.0)
        return pa.table({
            id_col: t[id_col],
            "cluster_id": pa.array(a.astype(np.int64)),
            "dist2": pa.array(np.round(mind, round_to), pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_near_dup_pairs(ds, *, threshold: float = 0.9,
                            n_clusters: int = 16,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", iters: int = 5,
                            seed: int = 42, round_to: int = 6,
                            as_dataset: bool = False):
    """SemDeDup-style near-duplicate pairs: cluster first, compare
    WITHIN clusters only (Abbas et al. 2023, arXiv:2303.09540).

    The scale contract: the O(N²) GEMM of exact near-dup becomes k
    independent O((N/k)²) GEMMs, each inside one ``map_groups`` group —
    so ``n_clusters`` must be chosen so a cluster's vectors fit one
    worker (k ≈ N·d·8 / worker_bytes).  Pairs split across clusters are
    missed by design — that is SemDeDup's recall trade; the planted-dup
    test pins recall vs the exact operator.

    Output: (id_a, id_b, cosine), id_a < id_b, sorted.
    """
    import ray

    cents, _ = kmeans_fit_distributed(ds, n_clusters, vec_col=vec_col,
                                      iters=iters, seed=seed)
    cents_ref = ray.put(cents)

    def tag(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _batch_vectors(t, vec_col)
        d2 = ((m * m).sum(axis=1)[:, None]
              - 2.0 * (m @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return pa.table({
            "cluster_id": pa.array(d2.argmin(axis=1).astype(np.int64)),
            id_col: t[id_col],
            vec_col: t[vec_col],
        })

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    def cluster_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or id_col not in g.column_names:
            return empty
        from .ann import _normalize

        m = _normalize(_batch_vectors(g, vec_col))
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ m.T
        iu = np.triu_indices(ids.size, k=1)
        hit = sims[iu] >= threshold
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({
            "id_a": pa.array(lo), "id_b": pa.array(hi),
            "cosine": pa.array(np.round(sims[iu][hit], round_to),
                               pa.float64()),
        })

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow")
    pairs = (tagged.groupby("cluster_id")
             .map_groups(cluster_pairs, batch_format="pyarrow")
             .sort(["id_a", "id_b"]))
    if as_dataset:
        return pairs
    pdf = pairs.to_pandas()
    return pa.Table.from_pandas(pdf, preserve_index=False)


def semantic_dedup_rows(ds, *, threshold: float = 0.9, n_clusters: int = 16,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        iters: int = 5, seed: int = 42,
                        num_partitions: int | None = None):
    """Surviving rows after SemDeDup pruning: within every near-dup pair
    the HIGHER id drops, so the survivor set is 'points with no lower-id
    near-neighbor in their cluster' (the deterministic greedy SemDeDup
    keeps; no randomness).

    The drop set (bounded by the number of near-dup pairs, not the
    corpus) is BROADCAST once via ``ray.put`` and each batch filters
    with a vectorized sorted-array membership test — an anti-JOIN can't
    be used because Arrow's hash join rejects ``list<double>`` non-key
    columns, and re-gathering full rows after an ids-only join would
    hit the same wall.  At extreme drop-set sizes, hash-partition both
    sides by id and co-filter per bucket instead."""
    import ray

    pairs = semantic_near_dup_pairs(ds, threshold=threshold,
                                    n_clusters=n_clusters, vec_col=vec_col,
                                    id_col=id_col, iters=iters, seed=seed,
                                    as_dataset=True)
    pair_df = pairs.select_columns(["id_b"]).to_pandas()
    # an empty Dataset loses its schema through to_pandas()
    drop_ids = (np.unique(pair_df["id_b"].to_numpy(dtype=np.int64))
                if "id_b" in pair_df.columns and len(pair_df)
                else np.array([], dtype=np.int64))
    drop_ref = ray.put(drop_ids)          # sorted (np.unique)

    def keep(t: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        if drops.size == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(drops, ids), drops.size - 1)
        return t.filter(pa.array(drops[pos] != ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def kmeans_cluster_sizes(ds, n_clusters: int, *, vec_col: str = "embedding",
                         id_col: str = "vec_id", iters: int = 5,
                         seed: int = 42):
    """Fit + assign + per-cluster size rollup: (cluster_id, n_vecs)
    sorted by cluster_id.  The driver-entry shape (stable schema;
    cluster contents depend on the data, so the entry is rows-only)."""
    cents, _ = kmeans_fit_distributed(ds, n_clusters, vec_col=vec_col,
                                      iters=iters, seed=seed)
    asg = kmeans_assign(ds, cents, vec_col=vec_col, id_col=id_col)
    sizes = (asg.groupby("cluster_id").count()
             .rename_columns({"count()": "n_vecs"})
             .sort("cluster_id"))
    return sizes


# ----------------------------------------------------------------- PCA


def pca_fit_distributed(ds, n_components: int = 4, *,
                        vec_col: str = "embedding"):
    """Distributed PCA over an embedding column: ONE streaming pass
    accumulates per-block (count, sum, Gram = X^T X) partials — 8d²+16d
    bytes per block regardless of block size — tree-combined through a
    32-way salted groupby so the driver sums at most 32 rows, then a
    d×d ``eigh`` finishes on the driver (d = embedding dim, tiny).

    Component signs are fixed so each component's largest-|coordinate|
    entry is positive, making the decomposition deterministic up to
    distributed float-sum noise.  Returns ``(mean, components,
    explained_variance)`` with components shaped (n_components, d),
    variance ddof=1 to match ``np.cov``.
    """

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_vectors(t, vec_col).astype(np.float64)
        if m.shape[0] == 0:
            return pa.table({
                "part": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.float64())),
                "g": pa.array([], pa.list_(pa.float64()))})
        # salt the combine key by content so partials spread over the
        # reducers without any driver coordination
        salt = (int(m[0].view(np.uint64)[0]) & 31) if m.size else 0
        return pa.table({
            "part": pa.array([salt], pa.int64()),
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
            "g": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64()))})

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        sflat = t["s"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        d = sflat.size // t.num_rows
        s = sflat.reshape(t.num_rows, d).sum(axis=0)
        gflat = t["g"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        g = gflat.reshape(t.num_rows, d * d).sum(axis=0)
        return pa.table({"part": t["part"].slice(0, 1),
                         "n": pa.array([n], pa.int64()),
                         "s": pa.array([s], pa.list_(pa.float64())),
                         "g": pa.array([g], pa.list_(pa.float64()))})

    comb = (ds.select_columns([vec_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(combine, batch_format="pyarrow")
            .to_pandas())                                  # <= 32 rows
    n = int(comb["n"].sum())
    s = np.sum([np.asarray(r, np.float64) for r in comb["s"]], axis=0)
    d = s.size
    g = np.sum([np.asarray(r, np.float64) for r in comb["g"]],
               axis=0).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)                     # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                              # (k, d)
    ev = evals[order]
    for j in range(comps.shape[0]):                        # sign fix
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    return mean, comps, ev


def pca_project(ds, mean: np.ndarray, components: np.ndarray, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int = 6):
    """Project every vector onto broadcast principal components:
    (id, pc0..pck-1 float64 round-``round_to``) sorted by id.  The
    (mean, components) pair rides the object store once via
    ``ray.put``; each batch is one small GEMM."""
    import ray

    ref = ray.put((np.asarray(mean, np.float64),
                   np.asarray(components, np.float64)))

    def proj(t: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        m = _batch_vectors(t, vec_col).astype(np.float64)
        y = (m - mu) @ c.T
        cols: dict = {id_col: t[id_col].combine_chunks().cast(pa.int64())}
        for j in range(c.shape[0]):
            cols[f"pc{j}"] = pa.array(np.round(y[:, j], round_to),
                                      pa.float64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow").sort(id_col)


def pca_coords(sf_dir: str, *, n_components: int = 4, round_to: int = 6):
    """Driver entry: fit PCA on the embeddings table and return every
    vector's projected coordinates."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mean, comps, _ = pca_fit_distributed(ds, n_components)
    return pca_project(ds, mean, comps, round_to=round_to)


def kcenter_sample(ds, k: int, *, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """Greedy farthest-point k-center selection (Gonzalez 1985) — the
    coverage/diversity data-selection primitive: pick the point
    farthest (euclidean, raw vectors) from everything picked so far,
    k times, starting from the minimum id.  2-approximation to the
    optimal k-center cover; used to select maximally-diverse seed sets
    for annotation / curriculum mixes.

    Shape: k streaming passes.  Each pass broadcasts the (<=k, d)
    center matrix + selected-id set (``ray.put``, a few KB) and reduces
    every block to ONE candidate row (its farthest point, tie-broken by
    min id) carrying that point's vector, so the winning center needs
    no second scan; only blocks-many (id, dist, vector) rows reach the
    driver per pass and vectors never accumulate beyond the k selected.
    Distances use the direct (x-c)^2 form, not the expanded GEMM form,
    so values match the SQL oracle's ``list_distance`` to float64
    round-off (ranking ties at that scale are measure-zero on real
    embeddings; exact duplicates are excluded by id like the oracle's
    NOT IN).

    Compute is O(k^2 N d / blocks) per worker; for the k <= 64 regime
    this targets, the per-pass scan dominates.  Returns a pandas
    DataFrame (sel_rank, vec_id) in selection order.
    """
    import pandas as pd
    import ray

    sel_ids: list[int] = []
    centers: list[np.ndarray] = []

    for r in range(k):
        state_ref = ray.put((np.asarray(centers, np.float64),
                             frozenset(sel_ids)))

        def cand(t: pa.Table) -> pa.Table:
            c, taken = ray.get(state_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _batch_vectors(t, vec_col).astype(np.float64)
            keep = ~np.isin(ids, np.fromiter(taken, np.int64, len(taken))) \
                if taken else np.ones(ids.size, bool)
            if not keep.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.float64()),
                                 "vec": pa.array([], pa.list_(pa.float64()))})
            ids, m = ids[keep], m[keep]
            if len(c) == 0:
                # pass 0: the global min id seeds the selection
                j = int(np.argmin(ids))
                d = np.inf
            else:
                # direct-form distances for oracle-grade float parity
                d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                mind = np.sqrt(d2.min(axis=1))
                j = np.lexsort((ids, -mind))[0]
                d = mind[j]
            return pa.table({id_col: pa.array([ids[j]], pa.int64()),
                             "dist": pa.array([d], pa.float64()),
                             "vec": pa.array([m[j].tolist()],
                                             pa.list_(pa.float64()))})

        cds = ds.select_columns([id_col, vec_col]).map_batches(
            cand, batch_format="pyarrow").to_pandas()
        if cds.empty:
            break
        cds = cds.sort_values(["dist", id_col],
                              ascending=[False, True], kind="mergesort")
        win = cds.iloc[0]
        sel_ids.append(int(win[id_col]))
        centers.append(np.asarray(win["vec"], np.float64))

    return pd.DataFrame({"sel_rank": np.arange(len(sel_ids), dtype=np.int64),
                         id_col: np.asarray(sel_ids, np.int64)})
