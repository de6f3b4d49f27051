#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with headline timings.

Headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):

  build      — inverted-index build over the synthetic source-code corpus
               (the north-rule metric; docs/sec reported in extras)
  query_p50  — BM25 top-k latency p50 over the reference query classes
  query_pool — same query set through the map_batches actor pool
  dedup      — MinHash-LSH near-dup pass over documents
  ann        — brute-force cosine top-k over embeddings
  agg        — pricing-summary groupby over lineitem

``--scaling`` runs the build in two fresh processes (8 vs 32 CPUs by
default) on identical input and reports both throughputs plus scaling
efficiency (the north rule's two-cluster-size criterion, evidenced by
parallelism levels in this single-node sandbox).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# --scaling uses a larger corpus so compute dominates the ~2s fixed
# pipeline overhead and the efficiency number reflects the shuffle design
SCALE_DOCS = int(os.environ.get("GRAFT_SCALE_DOCS", "600000"))

QUERY_SET = [
    ("parse", {}),
    ("buffer", {}),
    ("deadline", {}),
    ("return", {}),                                   # hot term, negative idf
    ("retry backoff", {"mode": "and"}),
    ("parse buffer", {"mode": "or"}),
    ('"exponential backoff"', {}),                    # phrase
    ("module", {"field_weights": {"path": 5.0, "content": 1.0}}),
    ("return", {"language": "python"}),
    ("hash table index", {}),                         # smart compile shape
]


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def bench_build(corpus_dir: str, idx_dir: str) -> tuple[float, int]:
    from yetisearch_ray.index.build import IndexConfig, build_index
    from yetisearch_ray.sources.parquet_source import read_parquet_with_doc_ids

    if os.path.exists(idx_dir):
        shutil.rmtree(idx_dir)
    cfg = IndexConfig(
        fields=[("path", "path"), ("content", "content")],
        language_column="lang",
        store_columns=["repo", "path", "commit", "lang", "content"],
        num_partitions=64,  # IDENTICAL config at every parallelism level
        content_hash_column="content",
    )
    best = None
    n_docs = 0
    for _ in range(2):  # best-of-2: steady-state throughput, not first-run
        if os.path.exists(idx_dir):
            shutil.rmtree(idx_dir)
        os.sync()  # flush pending writeback so it doesn't stall this run
        t0 = time.perf_counter()
        man = build_index(read_parquet_with_doc_ids(corpus_dir), idx_dir, cfg,
                          input_fingerprint=corpus_dir)
        dt = time.perf_counter() - t0
        n_docs = int(man.stats["n_docs"])
        best = dt if best is None else min(best, dt)
    return best, n_docs


def bench_queries(idx_dir: str) -> dict[str, float]:
    from yetisearch_ray.search.engine import SearchEngine, open_index

    # cache_ttl=0: measure real query latency, not result-cache hits
    eng = SearchEngine(open_index(idx_dir), cache_ttl=0)
    # warm: touch postings once
    for q, kw in QUERY_SET:
        eng.search(q, limit=10, **kw)
    lat = []
    for _ in range(5):
        for q, kw in QUERY_SET:
            t0 = time.perf_counter()
            eng.search(q, limit=10, **kw)
            lat.append(time.perf_counter() - t0)
    return {
        "p50": statistics.median(lat),
        "p95": sorted(lat)[int(len(lat) * 0.95)],
        "mean": statistics.fmean(lat),
    }


def bench_query_pool(idx_dir: str) -> float:
    import ray.data as rd

    from yetisearch_ray.search.engine import SearchActor

    items = [
        {"qid": i, "query": QUERY_SET[i % len(QUERY_SET)][0], "limit": 10}
        for i in range(200)
    ]
    qds = rd.from_items(items)
    t0 = time.perf_counter()
    out = qds.map_batches(
        SearchActor,
        fn_constructor_kwargs={"index_dir": idx_dir},
        batch_format="pyarrow",
        concurrency=max(2, NUM_CPUS // 4),
        batch_size=16,
    )
    n = out.count()
    dt = time.perf_counter() - t0
    assert n > 0
    return dt


def bench_dedup() -> float:
    import ray.data as rd

    from yetisearch_ray.pipelines.dedup import minhash_dedup_pairs

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.perf_counter()
    minhash_dedup_pairs(ds, threshold=0.5,)
    return time.perf_counter() - t0


def bench_ann() -> float:
    import pyarrow.parquet as pq
    import ray.data as rd

    from yetisearch_ray.pipelines.ann import cosine_topk

    q = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas().embedding.iloc[1]
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = time.perf_counter()
    cosine_topk(ds, q, k=10).to_pandas()
    return time.perf_counter() - t0


def bench_agg() -> float:
    from yetisearch_ray.pipelines.relational import pricing_summary

    t0 = time.perf_counter()
    pricing_summary(SF_DIR)
    return time.perf_counter() - t0


def run_once() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from yetisearch_ray.sources.corpus import corpus_path, generate_code_corpus

    if os.environ.get("GRAFT_BENCH_CORPUS_DOCS"):
        nd = int(os.environ["GRAFT_BENCH_CORPUS_DOCS"])
        corpus = generate_code_corpus(nd, f"/tmp/ys_corpus/scale{nd}", num_files=16)
    else:
        corpus = corpus_path(SF_DIR)  # generated once, cached
    # warm the page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    pq.read_table(corpus)
    # warm the Ray worker pool: the first Dataset execution pays 2-3 s of
    # worker-process spawn + imports; we measure steady-state throughput
    import ray.data as rd

    rd.range(NUM_CPUS * 1000).map_batches(lambda b: b).count()

    idx_dir = f"/tmp/ys_bench/idx_{os.path.basename(SF_DIR)}_{NUM_CPUS}"
    t_build, n_docs = bench_build(corpus, idx_dir)
    qstats = bench_queries(idx_dir)
    t_pool = bench_query_pool(idx_dir)
    t_dedup = bench_dedup()
    t_ann = bench_ann()
    t_agg = bench_agg()
    ray.shutdown()

    return {
        "metric": "index-build seconds (headline) + query p50 + pipeline timings",
        "value": round(t_build, 3),
        "unit": "sec",
        "queries": {
            "build": round(t_build, 3),
            "query_p50": round(qstats["p50"], 5),
            "query_p95": round(qstats["p95"], 5),
            "query_pool_200": round(t_pool, 3),
            "dedup_minhash": round(t_dedup, 3),
            "ann_cosine": round(t_ann, 3),
            "agg_pricing": round(t_agg, 3),
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "extras": {
            "n_docs": n_docs,
            "build_docs_per_sec": round(n_docs / t_build, 1),
            "index_bytes": _dir_bytes(idx_dir),
            "postings_bytes": _dir_bytes(os.path.join(idx_dir, "postings")),
        },
    }


def run_scaling(lo: int | None = None, hi: int | None = None) -> dict:
    lo = lo or int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = hi or int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # pre-generate the scaling corpus once so neither timed child pays it
    from yetisearch_ray.sources.corpus import generate_code_corpus

    generate_code_corpus(SCALE_DOCS, f"/tmp/ys_corpus/scale{SCALE_DOCS}", num_files=16)

    def run_once_at(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_CORPUS_DOCS=str(SCALE_DOCS))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # each child already measures best-of-2 builds internally
    r_lo, r_hi = run_once_at(lo), run_once_at(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    thr_lo = r_lo["extras"]["build_docs_per_sec"]
    thr_hi = r_hi["extras"]["build_docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "index-build scaling efficiency (N vs 4N parallelism)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": SF_DIR,
        "cpus": {"lo": lo, "hi": hi},
        "build_sec": {str(lo): t_lo, str(hi): t_hi},
        "docs_per_sec": {str(lo): thr_lo, str(hi): thr_hi},
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
