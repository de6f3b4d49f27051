"""Percolation (reverse search): registered queries as DATA, documents
as the STREAM — the Elasticsearch percolator / Lucene Monitor shape, an
extension beyond the reference (which has no reverse-search surface;
closest is the forward path `src/Search/SearchEngine.php:204-273`).
This is the routing/alerting primitive for a continuously-ingested
corpus: "which saved searches does this new document satisfy?".

Ray design (100 TB honest):
- The query set is TINY and ships once per actor via the map_batches
  class constructor (broadcast, never per batch).
- Documents STREAM through ``map_batches(batch_format="pyarrow")`` —
  zero-copy Arrow, never materialized; the output is only (query_id,
  doc_id) hit pairs, bounded by the hit count.  For unbounded outputs
  swap the tail collect for ``write_parquet``.
- Per batch, tokenization is the same dictionary-coded Arrow kernel the
  index build hot path uses (``tokenize_batch_dict`` — one C pass; only
  UNIQUE terms surface as Python strings), and per-query evaluation is
  boolean vector algebra over term-presence columns: no per-document
  Python loop anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


class PercolateStage:
    """Actor-pool stage: compile the query set once in ``__init__``
    (per actor), evaluate every batch vectorized in ``__call__``."""

    def __init__(self, queries, text_column: str = "text"):
        from ..analysis.tokenizer import tokenize

        self.text_column = text_column
        comp = []
        for qid, q, mode in queries:
            if mode not in ("and", "or"):
                raise ValueError(f"percolate mode must be and|or: {mode}")
            terms = sorted(set(tokenize(q)))  # u61, distinct
            if terms:
                comp.append((int(qid), terms, mode))
        self.queries = comp
        self.needed = sorted({t for _, ts, _ in comp for t in ts})

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis.tokenizer import tokenize_batch_dict

        n = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        codes, uniq, rows, _pos, _cnt = tokenize_batch_dict(
            batch[self.text_column])
        code_of = {t: i for i, t in enumerate(uniq)}
        presence = {}
        for t in self.needed:
            c = code_of.get(t)
            v = np.zeros(n, dtype=bool)
            if c is not None:
                v[rows[codes == c]] = True
            presence[t] = v
        out_q, out_d = [], []
        for qid, terms, mode in self.queries:
            vecs = [presence[t] for t in terms]
            hit = (np.logical_and.reduce(vecs) if mode == "and"
                   else np.logical_or.reduce(vecs))
            d = doc_ids[hit]
            out_q.append(np.full(d.size, qid, dtype=np.int64))
            out_d.append(d.astype(np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q
                                 else np.empty(0, np.int64), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d) if out_d
                               else np.empty(0, np.int64), pa.int64()),
        })


def percolate(sf_dir: str, queries, *, text_column: str = "text",
              concurrency: int | None = None):
    """Match every document in ``{sf_dir}/documents.parquet`` against the
    registered ``queries`` ([(qid, query_string, "and"|"or")], matching
    on ``text_column`` only).  Returns a pandas frame (query_id, doc_id)
    sorted for determinism — bounded by the hit count.

    The actor pool is sized to HALF the cluster CPUs by default: a pool
    that claims every CPU starves the upstream read tasks and livelocks
    the streaming executor (the repo's join-livelock note)."""
    import ray
    import ray.data as rd

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        concurrency = min(8, max(1, cpus // 2))
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", text_column])
    out = ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={"queries": queries,
                               "text_column": text_column},
        batch_format="pyarrow", concurrency=concurrency)
    df = out.to_pandas()
    if len(df) == 0:  # all-empty blocks lose their schema through to_pandas
        import pandas as pd

        df = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                           "doc_id": pd.Series(dtype="int64")})
    return (df.sort_values(["query_id", "doc_id"])
            .reset_index(drop=True))
