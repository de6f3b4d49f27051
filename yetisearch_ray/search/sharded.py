"""Sharded query serving: term-partition shard actors + scatter/gather.

The index layout is already term-hash-partitioned (``part=NNNNN``
segment files + manifest hot/split placement), so the serving shard unit
is a SUBSET OF TERM PARTITIONS.  ``ShardedIndexReader`` owns a pool of
``TermShardActor``s (partition p -> shard p % N), scatters each term
read to the shard(s) owning its partition(s) and gathers/concats the raw
posting rows — byte-identical input to what the single-process reader
gets from disk, so scoring is EXACTLY the single-reader result (asserted
in tests/test_sharded.py).

On a real cluster each shard actor would be co-located with its
partition files (or read them from shared storage); the coordinator
keeps only the doc-metadata arrays (doc-length, filter columns), which
shard along the ORTHOGONAL doc axis — that second axis is the
``SearchActor`` replica pool, composable with this one.

The reference has no distributed serving (single-process SQLite,
src/Storage/SqliteStorage.php); this is the Ray-native scale path
SURVEY.md §2.3 calls for.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .engine import IndexReader, SearchEngine


@ray.remote(max_restarts=2)
class TermShardActor:
    """Owns the segment files of a subset of term partitions.

    Setup (file listing) happens once in ``__init__``; each
    ``term_rows`` call reads only the owned partitions' segment files
    with a term filter (parquet row-group predicate pushdown)."""

    def __init__(self, index_dir: str, parts: list[int]):
        self.index_dir = index_dir
        self.parts = sorted(int(p) for p in parts)
        self._files = {
            p: sorted(glob.glob(os.path.join(
                index_dir, "postings", f"part={p:05d}*.parquet")))
            for p in self.parts
        }

    def owned(self) -> list[int]:
        return self.parts

    def term_rows(self, term: str, parts: list[int]) -> pa.Table | None:
        tabs = []
        for p in parts:
            for f in self._files.get(int(p), ()):
                t = pq.read_table(f, filters=[("term", "==", term)])
                if t.num_rows:
                    tabs.append(t)
        if not tabs:
            return None
        return pa.concat_tables(tabs)


class ShardedIndexReader(IndexReader):
    """IndexReader whose posting reads scatter/gather over shard actors.

    Everything downstream of ``_read_term_rows`` (decode, merge, BM25,
    filters, facets) is inherited unchanged, which is what makes the
    sharded results identical to the local reader's."""

    def __init__(self, index_dir: str, n_shards: int = 4,
                 cache_terms: int = 4096):
        super().__init__(index_dir, cache_terms)
        self.n_shards = max(1, min(int(n_shards), self.num_partitions))
        assign: dict[int, list[int]] = {s: [] for s in range(self.n_shards)}
        for p in range(self.num_partitions):
            assign[p % self.n_shards].append(p)
        self._shards = [
            TermShardActor.remote(index_dir, assign[s])
            for s in range(self.n_shards)
        ]

    def _read_term_rows(self, term: str) -> pa.Table | None:
        parts = self._term_parts(term)
        by_shard: dict[int, list[int]] = {}
        for p in parts:
            by_shard.setdefault(p % self.n_shards, []).append(p)
        futs = [self._shards[s].term_rows.remote(term, ps)
                for s, ps in sorted(by_shard.items())]
        tabs = [t for t in ray.get(futs) if t is not None]
        if not tabs:
            return None
        return pa.concat_tables(tabs)

    def shutdown(self):
        for a in self._shards:
            ray.kill(a)
        self._shards = []


def open_sharded(index_dir: str, n_shards: int = 4,
                 **engine_kwargs) -> SearchEngine:
    """SearchEngine over a sharded reader pool."""
    return SearchEngine(ShardedIndexReader(index_dir, n_shards=n_shards),
                        **engine_kwargs)
