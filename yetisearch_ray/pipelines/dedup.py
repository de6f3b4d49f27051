"""Deduplication operators for large-scale corpus curation.

Exact (hash-partitioned), MinHash+LSH near-dup, SimHash, n-gram Jaccard
similarity, and embedding-cosine near-dup.  The reference engine's only
dedup is query-time ``deduplicateByRoute``
(``src/Search/SearchEngine.php:1112-1169``, implemented in the search
engine); these corpus-level operators are the training-data-pipeline
extension mandated for 100 TB curation.

Scale design: every operator shuffles only SMALL key tuples
((hash, id), (band, bandhash, id)), never full documents; full-row
recovery is a broadcast semi-join.  Per-batch work is vectorized numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.tokenizer import tokenize_batch

_MERSENNE = (1 << 61) - 1


def _md5_batch(texts) -> list[str]:
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


# ------------------------------------------------------------------ exact


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor per distinct text: (id, text_hash), id = min per hash.

    Shuffle moves only (hash, id) pairs.  md5 matches DuckDB's ``md5()``
    so the operator is SQL-oracle-checkable.
    """

    def hash_batch(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "text_hash": pa.array(_md5_batch(t[text_col].to_pylist()), pa.string()),
            }
        )

    from ray.data.aggregate import Min

    pairs = ds.map_batches(hash_batch, batch_format="pyarrow")
    return pairs.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))


def exact_dedup_rows(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Full surviving rows via broadcast semi-join of survivor ids."""
    import ray

    surv = exact_dedup(ds, text_col, id_col)
    ids = set()
    for b in surv.iter_batches(batch_format="pyarrow"):
        ids.update(b[id_col].to_pylist())
    ref = ray.put(np.array(sorted(ids), dtype=np.int64))

    def keep(t: pa.Table) -> pa.Table:
        keep_ids = ray.get(ref)
        arr = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(arr, keep_ids)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ shingles


def _word_shingles(tokens: list[str], n: int = 3) -> set[str]:
    # docs shorter than n tokens have NO shingles (matches the SQL oracle's
    # range() semantics exactly)
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def _hash_shingles(sh: set[str]) -> np.ndarray:
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        )
    return out


# ------------------------------------------------------------------ minhash


class MinHasher:
    """Seeded universal-hash MinHash signatures (k permutations)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.uint64(_MERSENNE), dtype=np.uint64)
        # (k, n) permuted values mod mersenne prime
        x = shingle_hashes.astype(np.uint64)
        v = (self.a[:, None] * (x[None, :] % _MERSENNE) + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)


def minhash_lsh_candidates(ds, *, text_col="text", id_col="doc_id",
                           num_perm=64, bands=16, shingle_n=3, seed=42,
                           concurrency=2):
    """Emit LSH candidate buckets: (band, band_hash) groups with >1 doc.

    map_batches (signature per doc, vectorized hashing) →
    explode to (band, band_hash, id) rows → groupby (the only shuffle —
    tuples, not documents) → buckets with ≥2 members.

    ``concurrency`` (actor pool size) must leave CPUs free for the read
    and shuffle stages — a pool that reserves every core deadlocks the
    streaming executor on small clusters.
    """
    rows_per_band = num_perm // bands

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm, seed)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            out_band, out_hash, out_id = [], [], []
            for i, text in enumerate(t[text_col].to_pylist()):
                toks = (text or "").split()
                sig = self.mh.signature(_hash_shingles(_word_shingles(toks, shingle_n)))
                for b in range(bands):
                    chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                    out_band.append(b)
                    out_hash.append(h)
                    out_id.append(ids[i])
            return pa.table({
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                id_col: pa.array(out_id),
            })

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.string()),
                             "members": pa.array([], pa.list_(pa.int64()))})
        ids = sorted(t[id_col].to_pylist())
        return pa.table({
            "band": pa.array([t["band"][0].as_py()], pa.int32()),
            "band_hash": pa.array([t["band_hash"][0].as_py()], pa.string()),
            "members": pa.array([ids], pa.list_(pa.int64())),
        })

    sigs = ds.map_batches(Signer, batch_format="pyarrow", concurrency=concurrency)
    return sigs.groupby(["band", "band_hash"]).map_groups(bucket, batch_format="pyarrow")


def minhash_dedup_pairs(ds, *, text_col="text", id_col="doc_id", num_perm=64,
                        bands=16, shingle_n=3, threshold=0.7, seed=42):
    """Candidate pairs from LSH buckets, verified with EXACT shingle
    Jaccard (gathered via broadcast of the candidate id set)."""
    import itertools

    import ray

    buckets = minhash_lsh_candidates(ds, text_col=text_col, id_col=id_col,
                                     num_perm=num_perm, bands=bands,
                                     shingle_n=shingle_n, seed=seed)
    cand_pairs: set[tuple[int, int]] = set()
    for b in buckets.iter_batches(batch_format="pyarrow"):
        for members in b["members"].to_pylist():
            for x, y in itertools.combinations(members, 2):
                cand_pairs.add((min(x, y), max(x, y)))
    if not cand_pairs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    needed = sorted({i for p in cand_pairs for i in p})
    ref = ray.put(np.array(needed, dtype=np.int64))

    def gather(t: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        arr = t[id_col].to_numpy(zero_copy_only=False)
        return t.select([id_col, text_col]).filter(pa.array(np.isin(arr, keep)))

    small = ds.map_batches(gather, batch_format="pyarrow")
    texts: dict[int, set] = {}
    for b in small.iter_batches(batch_format="pyarrow"):
        for i, txt in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            texts[i] = _word_shingles((txt or "").split(), shingle_n)
    ra, rb, rj = [], [], []
    for x, y in sorted(cand_pairs):
        sa, sb = texts.get(x, set()), texts.get(y, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            ra.append(x)
            rb.append(y)
            rj.append(round(j, 6))
    return pa.table({"id_a": pa.array(ra, pa.int64()),
                     "id_b": pa.array(rb, pa.int64()),
                     "jaccard": pa.array(rj, pa.float64())})


# ------------------------------------------------------------------ simhash


def simhash_signatures(ds, *, text_col="text", id_col="doc_id"):
    """64-bit SimHash per doc (sign-sum of tf-weighted token hashes)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        sigs = np.empty(t.num_rows, dtype=np.uint64)
        for i, text in enumerate(t[text_col].to_pylist()):
            toks = (text or "").split()
            if not toks:
                sigs[i] = 0
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            hs = np.empty(uniq.size, dtype=np.uint64)
            for k, tok in enumerate(uniq):
                hs[k] = np.uint64(int.from_bytes(
                    hashlib.blake2b(str(tok).encode(), digest_size=8).digest(), "little"))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.flatnonzero(v > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            sigs[i] = sig
        return pa.table({id_col: ids, "simhash": pa.array(sigs, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_near_pairs(ds, *, text_col="text", id_col="doc_id", max_hamming=3):
    """Near-dup pairs by SimHash: 4-block banding (Hamming ≤3 ⇒ one 16-bit
    block equal) → groupby block value → verify Hamming distance."""
    sigs = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sg = t["simhash"].to_numpy(zero_copy_only=False)
        blocks, vals, oid, osig = [], [], [], []
        for b in range(4):
            blocks.extend([b] * ids.size)
            vals.extend(((sg >> np.uint64(16 * b)) & np.uint64(0xFFFF)).tolist())
            oid.extend(ids.tolist())
            osig.extend(sg.tolist())
        return pa.table({"block": pa.array(blocks, pa.int8()),
                         "val": pa.array(vals, pa.uint32()),
                         id_col: pa.array(oid),
                         "simhash": pa.array(osig, pa.uint64())})

    import itertools

    def pairs(t: pa.Table) -> pa.Table:
        ra, rb, rh = [], [], []
        if t.num_rows >= 2:
            ids = t[id_col].to_pylist()
            sgs = t["simhash"].to_pylist()
            for (i1, s1), (i2, s2) in itertools.combinations(
                sorted(zip(ids, sgs)), 2
            ):
                h = bin(s1 ^ s2).count("1")
                if h <= max_hamming and i1 != i2:
                    ra.append(i1)
                    rb.append(i2)
                    rh.append(h)
        return pa.table({"id_a": pa.array(ra, pa.int64()),
                         "id_b": pa.array(rb, pa.int64()),
                         "hamming": pa.array(rh, pa.int32())})

    out = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["block", "val"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    # the same pair can surface from several blocks — distinct it
    import pandas as pd

    pdf = out.to_pandas().drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ------------------------------------------------------------------ jaccard search


def ngram_jaccard_vs_query(ds, query_text: str, *, text_col="text",
                           id_col="doc_id", shingle_n=3, k=10):
    """Top-k docs by word-n-gram Jaccard similarity to a query text —
    SQL-oracle-checkable (DuckDB list ops).  Broadcast the query shingles,
    score per batch, global top-k."""
    q = sorted(_word_shingles(query_text.split(), shingle_n))
    qset = set(q)

    def score(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        sims = np.empty(t.num_rows, dtype=np.float64)
        for i, text in enumerate(t[text_col].to_pylist()):
            s = _word_shingles((text or "").split(), shingle_n)
            union = len(s | qset)
            sims[i] = (len(s & qset) / union) if union else 0.0
        return pa.table({id_col: ids, "jaccard": pa.array(np.round(sims, 6), pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["jaccard", id_col], descending=[True, False]).limit(k)
