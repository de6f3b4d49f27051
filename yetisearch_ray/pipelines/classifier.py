"""Distributed quality-classifier training + scoring (fastText/CCNet
shape): logistic regression over hashed bag-of-words features.

The step every large curation pipeline has that the rule filters can't
replace: CCNet (Wenzek et al. 2020) and the FineWeb/Llama recipes train
a cheap linear classifier to *distill* an expensive or hand-built
quality signal, then score the whole corpus with it.  Reference parity
note: YetiSearch has no trainer (it is a search engine), so this module
is a training-data-pipeline extension in the same family as
``pipelines/cluster.py`` (distributed k-means) — cited there, not to a
reference file.

Shape (Ray-Data-first, mirrors ``cluster.kmeans_fit_distributed``):

- **features**: hashed bag-of-words — tokens via the same Arrow
  whitespace kernel as textstats (``_split_tokens``), token→bucket via
  the deterministic pandas siphash used by MinHash (``_HASH_KEY``),
  value = raw count (length-threshold rules stay linear), plus an
  intercept slot at index ``dim``.  Everything per batch is vectorized
  (no per-doc Python loop): token hashing is one ``hash_array`` over
  the flat token array, per-doc bucket counts come from one
  ``np.unique`` on fused (doc, bucket) codes.
- **fit**: parameter-averaged local GD — each epoch is ONE streaming
  pass: ``map_batches`` runs ``inner_steps`` local GD steps per block
  starting from the BROADCAST weight vector (``ray.put`` once per
  epoch, ~256 KB at the default dim), emits the n-weighted local
  model tagged with a deterministic group id; a tiny ``groupby(gid)``
  combine reduces blocks×(dim+1) partials to ``combine_groups`` rows
  before the driver averages them.  Texts never reach the driver; the
  driver holds only w and the ≤32 combined rows per epoch.  At 100 TB
  each epoch moves ``combine_groups`` rows through the exchange —
  negligible next to the read (the same contract as the k-means fit).
- **score**: one ``map_batches`` pass against the broadcast weights.

Numeric note: block partials combine in block order, so w can differ
from a single-pass NumPy reference in the last ulps; predictions are
thresholded and probs rounded, so outputs are stable (tested).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _HASH_KEY
from .textstats import _seg_sum, _split_tokens

__all__ = ["logreg_fit_distributed", "logreg_score", "quality_classifier"]


def _hashed_bow(t: pa.Table, text_col: str, dim: int):
    """Per-batch sparse hashed-BoW: returns (doc_idx, bucket, value)
    COO arrays plus n_docs.  value = raw token count in bucket."""
    _, values, offs = _split_tokens(t[text_col])
    n_docs = t.num_rows
    n_tok = np.diff(offs)
    if len(values) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), n_docs, n_tok)
    toks = np.asarray(values, dtype=object)
    buckets = (pd.util.hash_array(toks, hash_key=_HASH_KEY)
               % np.uint64(dim)).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
    # collapse duplicate (doc, bucket) pairs to counts without a loop
    codes = doc_idx * dim + buckets
    uniq, cnt = np.unique(codes, return_counts=True)
    # raw counts (not tf or log1p): token-count thresholds — the shape
    # of every length-based quality rule — stay LINEAR in the features
    return (uniq // dim, uniq % dim, cnt.astype(np.float64),
            n_docs, n_tok)


def _dense_scores(rows, cols, vals, n_docs, w: np.ndarray, dim: int):
    """z = Xw + b for the sparse COO batch (one scatter-add, no GEMM)."""
    z = np.full(n_docs, w[dim], dtype=np.float64)  # intercept
    if rows.size:
        np.add.at(z, rows, vals * w[cols])
    return z


def default_quality_labels(threshold: float = 0.25, text_col: str = "text"):
    """Label fn distilling the repo's own (SQL-oracled) quality
    heuristic: 1 iff min(1, n_tokens/100) * (1 - stopword_ratio_en)
    >= threshold — the CCNet setup where the trained model mimics a
    trusted source filter."""
    import pyarrow.compute as pc

    from ..analysis.stopwords import STOPWORDS

    stop_set = pa.array(sorted(STOPWORDS["en"]), pa.string())

    def labels(t: pa.Table) -> np.ndarray:
        _, values, offs = _split_tokens(t[text_col])
        n_tok = np.diff(offs)
        is_stop = np.asarray(pc.is_in(values, value_set=stop_set))
        sw = _seg_sum(is_stop.astype(np.int64), offs)
        nz = np.maximum(n_tok, 1)
        sr = np.where(n_tok > 0, sw / nz, 0.0)
        q = np.minimum(1.0, n_tok / 100.0) * (1.0 - sr)
        return (q >= threshold).astype(np.float64)

    return labels


def _local_gd(w0: np.ndarray, rows, cols, vals, y, dim: int,
              steps: int, lr: float, l2: float):
    """``steps`` full-batch GD steps on ONE block's sparse COO matrix.
    Returns (w_local, loss_at_w0).  All vectorized: each step is two
    scatter-adds + an exp over the block."""
    n = y.size
    w = w0.copy()
    loss0 = 0.0
    for s in range(steps):
        z = _dense_scores(rows, cols, vals, n, w, dim)
        p = 1.0 / (1.0 + np.exp(-z))
        if s == 0:
            pc_ = np.clip(p, 1e-12, 1.0 - 1e-12)
            loss0 = float(-(y * np.log(pc_)
                            + (1.0 - y) * np.log(1.0 - pc_)).sum())
        err = (p - y) / max(n, 1)
        g = np.zeros(dim + 1, dtype=np.float64)
        if rows.size:
            np.add.at(g, cols, vals * err[rows])
        g[dim] = err.sum()
        w = w - lr * (g + l2 * w)
    return w, loss0


def logreg_fit_distributed(ds, label_fn, *, text_col: str = "text",
                           dim: int = 1 << 15, iters: int = 8,
                           inner_steps: int = 60, lr: float = 2.0,
                           l2: float = 1e-6, combine_groups: int = 32):
    """Full-corpus logistic regression via parameter-averaged local GD
    (Zinkevich et al. 2010 "Parallelized SGD" one-shot averaging,
    iterated): each epoch broadcasts w, every block runs
    ``inner_steps`` local full-batch GD steps, and the driver takes the
    n-weighted average of the local models.  ``iters`` epochs ×
    ``inner_steps`` local steps gives fast convergence with only
    ``iters`` streaming passes over the data.

    Returns ``(w, info)``; ``w`` has ``dim + 1`` entries (last =
    intercept).  ``label_fn`` maps a pyarrow batch to a float {0,1}
    array — labels are recomputed per pass, so they must be
    deterministic functions of the batch (a column lookup or a text
    heuristic), never RNG.

    Scale notes: the driver holds only w (~256 KB at the default dim)
    and ≤``combine_groups`` combined rows per epoch; texts never leave
    the workers.  Each epoch re-reads ``ds`` — pass a parquet-backed or
    materialized Dataset so the per-epoch pass is a plain scan (same
    contract as ``kmeans_fit_distributed``).
    """
    import ray

    w = np.zeros(dim + 1, dtype=np.float64)
    losses: list[float] = []
    n = 0

    def _partial(w_ref):
        def fn(t: pa.Table) -> pa.Table:
            ww = ray.get(w_ref)
            rows, cols, vals, n_docs, _ = _hashed_bow(t, text_col, dim)
            y = np.asarray(label_fn(t), dtype=np.float64)
            wl, loss0 = _local_gd(ww, rows, cols, vals, y, dim,
                                  inner_steps, lr, l2)
            gid = (int(t["doc_id"][0].as_py()) % combine_groups
                   if "doc_id" in t.column_names and n_docs else 0)
            return pa.table({
                "gid": pa.array([gid], pa.int64()),
                "n": pa.array([n_docs], pa.int64()),
                "loss": pa.array([loss0], pa.float64()),
                "wsum": pa.array([wl * n_docs], pa.list_(pa.float64())),
            })

        return fn

    def _combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        flat = t["wsum"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        total = flat.reshape(t.num_rows, dim + 1).sum(axis=0)
        return pa.table({
            "gid": t["gid"].slice(0, 1),
            "n": pa.array([int(t["n"].to_numpy().sum())], pa.int64()),
            "loss": pa.array([float(t["loss"].to_numpy().sum())],
                             pa.float64()),
            "wsum": pa.array([total], pa.list_(pa.float64())),
        })

    for _ in range(iters):
        w_ref = ray.put(w)
        comb = (ds.map_batches(_partial(w_ref), batch_format="pyarrow")
                .groupby("gid")
                .map_groups(_combine, batch_format="pyarrow")
                .to_pandas())                              # ≤32 rows
        comb = comb.sort_values("gid").reset_index(drop=True)
        n = int(comb["n"].sum())
        if n == 0:
            break
        acc = np.zeros(dim + 1, dtype=np.float64)
        for row in comb["wsum"]:
            acc += np.asarray(row, dtype=np.float64)
        losses.append(float(comb["loss"].sum()) / n)
        w = acc / n
    return w, {"loss": losses, "iters_run": len(losses), "n": n}


def logreg_score(ds, w: np.ndarray, *, text_col: str = "text",
                 id_col: str = "doc_id", dim: int | None = None,
                 round_to: int = 4):
    """One streaming pass: (id, prob) against broadcast weights."""
    import ray

    d = (w.size - 1) if dim is None else dim
    w_ref = ray.put(np.asarray(w, np.float64))

    def score(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        rows, cols, vals, n_docs, _ = _hashed_bow(t, text_col, d)
        z = _dense_scores(rows, cols, vals, n_docs, ww, d)
        p = np.round(1.0 / (1.0 + np.exp(-z)), round_to)
        return pa.table({id_col: t[id_col],
                         "prob": pa.array(p, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def quality_classifier(ds, *, threshold: float = 0.25,
                       text_col: str = "text", id_col: str = "doc_id",
                       dim: int = 1 << 15, iters: int = 8,
                       inner_steps: int = 60, lr: float = 2.0):
    """End-to-end driver pipeline: distill the oracled quality heuristic
    into a hashed-BoW logistic model, then score every doc.

    Returns (id, label, prob, pred) sorted by id — ``label`` is the
    heuristic's verdict, ``pred`` the model's, so downstream can read
    the distillation agreement rate straight off the table."""
    label_fn = default_quality_labels(threshold, text_col)
    w, _ = logreg_fit_distributed(
        ds.select_columns([id_col, text_col]), label_fn,
        text_col=text_col, dim=dim, iters=iters,
        inner_steps=inner_steps, lr=lr)
    import ray

    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        rows, cols, vals, n_docs, _ = _hashed_bow(t, text_col, dim)
        y = label_fn(t).astype(np.int64)
        z = _dense_scores(rows, cols, vals, n_docs, ww, dim)
        p = 1.0 / (1.0 + np.exp(-z))
        return pa.table({
            id_col: t[id_col],
            "label": pa.array(y, pa.int64()),
            "prob": pa.array(np.round(p, 4), pa.float64()),
            "pred": pa.array((p >= 0.5).astype(np.int64), pa.int64()),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pyarrow").sort(id_col))
