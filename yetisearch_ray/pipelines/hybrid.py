"""Hybrid retrieval: BM25 (sparse) + dense-cosine arms fused with
Reciprocal-Rank Fusion (RRF, Cormack et al. 2009: score(d) = Σ_arms
1/(rrf_k + rank_arm(d))).

The two arms are the engine's existing distributed paths — the FTS
index over ``documents`` (``fts_documents.get_engine``) and the
per-batch-GEMM cosine top-k over ``embeddings`` (``ann.cosine_topk``).
Each arm returns only its top ``k_arm`` rows, so the fusion input is
O(arms × k_arm) regardless of corpus size: fusing driver-side is
scale-honest (the arms themselves stream/distribute; only the bounded
result lists meet).

Rank assignment re-sorts each arm by its ROUNDED score (the arms round
before returning — ``fts_documents._as_result`` to 5 dp, ``ann`` to
6 dp) with id ascending as the tie-break, so ranks are reproducible
bit-for-bit by an independent SQL oracle over the same rounded values
(``oracles.hybrid_rrf_sql``).

Reference has no hybrid mode — this is a training-data-engine
extension (dense arm) composed with the reference-parity BM25 arm
(reference scoring: src/Search/SearchEngine.php BM25 path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rrf_fuse(arms, *, k: int = 10, rrf_k: int = 60,
             round_to: int = 6) -> pd.DataFrame:
    """Fuse ranked result lists with Reciprocal-Rank Fusion.

    ``arms``: iterable of (df, id_col, score_col) — each df is one
    arm's top list, scores already rounded/deterministic.  Ranks are
    assigned by (score desc, id asc) within each arm; a doc absent
    from an arm contributes 0 from it.  Returns (doc_id, rrf_score)
    best-first, ties broken by doc_id, limited to ``k`` rows.
    """
    fused: pd.DataFrame | None = None
    for i, (df, id_col, score_col) in enumerate(arms):
        a = df[[id_col, score_col]].copy()
        a = a.sort_values([score_col, id_col],
                          ascending=[False, True], kind="mergesort")
        a["doc_id"] = a[id_col].astype("int64")
        a[f"_rrf{i}"] = 1.0 / (rrf_k + np.arange(1, len(a) + 1, dtype=np.float64))
        a = a[["doc_id", f"_rrf{i}"]]
        fused = a if fused is None else fused.merge(a, on="doc_id", how="outer")
    assert fused is not None, "rrf_fuse needs at least one arm"
    cols = [c for c in fused.columns if c.startswith("_rrf")]
    # fixed left-to-right addition order — the SQL oracle sums the
    # COALESCEd arm terms in the same order, so the doubles are
    # bit-identical before rounding
    s = np.zeros(len(fused), dtype=np.float64)
    for c in cols:
        s = s + fused[c].fillna(0.0).to_numpy()
    fused["rrf_score"] = s
    out = (fused.sort_values(["rrf_score", "doc_id"],
                             ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    out["rrf_score"] = out["rrf_score"].round(round_to)
    return out[["doc_id", "rrf_score"]]


def hybrid_rrf_topk(sf_dir: str, *, terms=("vector", "stream"),
                    query_vec_id: int = 1, k: int = 10, k_arm: int = 20,
                    rrf_k: int = 60) -> pd.DataFrame:
    """BM25-OR top-``k_arm`` over ``documents`` + cosine top-``k_arm``
    over ``embeddings`` (query = embedding of ``query_vec_id``), RRF-
    fused into a single (doc_id, rrf_score) top-``k`` list.

    Ids are fused in the shared doc_id/vec_id universe of the testdata
    tables; a doc retrieved by only one arm scores that arm's
    reciprocal alone (standard RRF).
    """
    import os

    import ray.data as rd

    from . import ann
    from . import fts_documents as ftsd

    bm = ftsd.or_topk(sf_dir, terms=terms, k=k_arm)
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    # row-filtered read: only the query row leaves storage
    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "==", query_vec_id)])
    qvec = qt["embedding"].to_pylist()[0]
    dn = ann.cosine_topk(emb, qvec, k=k_arm).to_pandas()
    return rrf_fuse([(bm, "doc_id", "score"), (dn, "vec_id", "cosine")],
                    k=k, rrf_k=rrf_k)


def rerank_dense_topk(sf_dir: str, *, terms=("vector", "stream"),
                      query_vec_id: int = 1, k: int = 10,
                      k_candidates: int = 50,
                      round_to: int = 6) -> pd.DataFrame:
    """Retrieve-then-rerank: BM25-OR retrieves ``k_candidates`` doc ids,
    then the dense arm re-scores ONLY those candidates by cosine to the
    query embedding and returns the top ``k``.

    Distributed shape: the candidate id set is bounded (``k_candidates``
    rows) and rides into every batch task as a broadcast numpy array —
    a semi-join against ``embeddings`` expressed as a vectorized
    ``pc.is_in`` filter inside ``map_batches``, never a shuffle.  At
    100 TB the embeddings scan is the only big side and it streams;
    candidates from a first-stage index are always top-k-bounded.
    """
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from . import ann
    from . import fts_documents as ftsd

    bm = ftsd.or_topk(sf_dir, terms=terms, k=k_candidates)
    cand = pa.array(sorted(bm["doc_id"].astype("int64").tolist()),
                    pa.int64())

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "==", query_vec_id)])
    qvec = qt["embedding"].to_pylist()[0]

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def keep_candidates(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["vec_id"], pa.int64())
        return t.filter(pc.is_in(ids, value_set=cand))

    filtered = emb.map_batches(keep_candidates, batch_format="pyarrow")
    out = ann.cosine_topk(filtered, qvec, k=k,
                          round_to=round_to).to_pandas()
    out["doc_id"] = out["vec_id"].astype("int64")
    return out[["doc_id", "cosine"]]


def mmr_rerank_topk(sf_dir: str, *, terms=("vector", "stream"), k: int = 10,
                    k_candidates: int = 50, lam: float = 0.7,
                    round_to: int = 6) -> pd.DataFrame:
    """Maximal Marginal Relevance diversity rerank (Carbonell &
    Goldstein 1998): BM25-OR retrieves ``k_candidates`` ids, their
    embeddings are gathered (bounded-set ``pc.is_in`` filter streamed
    over ``embeddings``, same shape as ``rerank_dense_topk``), and the
    final page is selected greedily to maximize

        lam * rel(d) - (1 - lam) * max_{s in selected} cos(d, s)

    with ``rel`` the candidate set's min-max-normalized (rounded) BM25
    score.  First pick = pure relevance; ties break to the smaller
    doc_id at every step.  Candidates without an embedding row are
    dropped (they cannot be diversity-scored).  Returns
    ``(rank, doc_id, mmr_score)`` in selection order.

    Scale shape: both stages are bounded by construction — the greedy
    loop runs on a ``k_candidates x dim`` float64 matrix (a final-page
    rerank, not a corpus scan), so driver-side numpy is the honest
    design; only the embeddings gather streams the big table.
    Oracle: ``oracles.mmr_sql`` (loop unrolled into k CTE stages,
    ``list_cosine_similarity`` on DOUBLE-cast vectors)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from . import fts_documents as ftsd

    bm = ftsd.or_topk(sf_dir, terms=terms, k=k_candidates)
    cand = pa.array(sorted(bm["doc_id"].astype("int64").tolist()), pa.int64())

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def keep_candidates(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["vec_id"], pa.int64())
        return t.filter(pc.is_in(ids, value_set=cand))

    rows = (emb.map_batches(keep_candidates, batch_format="pyarrow")
            .take_all())                      # <= k_candidates rows
    if not rows:
        return pd.DataFrame({"rank": pd.array([], dtype="int64"),
                             "doc_id": pd.array([], dtype="int64"),
                             "mmr_score": pd.array([], dtype="float64")})
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                    for r in rows])
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order]
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0

    s = bm.set_index(bm["doc_id"].astype("int64"))["score"]
    rel_raw = s.reindex(ids).to_numpy(dtype=np.float64)
    mn, mx = rel_raw.min(), rel_raw.max()
    rel = np.ones_like(rel_raw) if mx == mn else (rel_raw - mn) / (mx - mn)

    n = len(ids)
    selected: list[int] = []
    scores: list[float] = []
    # max cos to the selected set — the TRUE max (cosines can be
    # negative, so a zero init would silently floor the penalty at 0)
    ms: np.ndarray | None = None
    alive = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        base = lam * rel if ms is None else lam * rel - (1 - lam) * ms
        obj = np.where(alive, base, -np.inf)
        # ties -> smaller doc_id: ids are sorted ascending and argmax
        # returns the first maximal index
        i = int(np.argmax(obj))
        selected.append(i)
        scores.append(round(float(obj[i]), round_to))
        alive[i] = False
        # direct-form cosine (dot / norms), the oracle's
        # list_cosine_similarity definition
        cos_i = (V @ V[i]) / (norms * norms[i])
        ms = cos_i if ms is None else np.maximum(ms, cos_i)
    return pd.DataFrame({
        "rank": np.arange(1, len(selected) + 1, dtype=np.int64),
        "doc_id": ids[selected],
        "mmr_score": np.asarray(scores, dtype=np.float64),
    })
