"""Block-max WAND top-k pruning for OR queries (the north star's
dynamic-pruning component; public algorithm: Broder et al. 2003 WAND,
Ding & Suel 2011 block-max variant).

Operates document-at-a-time over the decoded, doc_id-sorted posting
arrays.  Each term cursor carries per-block (128-doc) maxima of the
weighted term frequency; a block's score upper bound uses the dl-free
bound ``idf · (m·(k1+1)) / (m + k1·(1−b))`` (denominator minimized at
dl→0), which is sound, so the pruned result is EXACTLY the full top-k
(ties included — candidates equal to the threshold are kept and the
final cut re-sorts by (score desc, doc_id asc)).

The engine uses this automatically for multi-term OR queries with no
phrase arms / filters / fuzzy; everything else takes the exact full-scan
scorer.  At test scale the win is modest; at 10^9+-doc posting lists the
skipped blocks dominate.
"""

from __future__ import annotations

import heapq

import numpy as np

from .bm25 import B, K1

BLOCK = 128


class TermCursor:
    __slots__ = ("docs", "tfw", "idf", "n", "i", "block_ub", "ub")

    def __init__(self, docs: np.ndarray, tfw: np.ndarray, idf: float):
        self.docs = docs
        self.tfw = tfw.astype(np.float64)
        self.idf = float(idf)
        self.n = docs.size
        self.i = 0
        nblocks = (self.n + BLOCK - 1) // BLOCK
        bmax = np.zeros(nblocks)
        for bstart in range(0, self.n, BLOCK):
            bmax[bstart // BLOCK] = self.tfw[bstart : bstart + BLOCK].max()
        self.block_ub = self.idf * (bmax * (K1 + 1.0)) / (bmax + K1 * (1.0 - B))
        self.ub = float(self.block_ub.max()) if nblocks else 0.0

    def doc(self) -> int:
        return int(self.docs[self.i]) if self.i < self.n else 1 << 62

    def exhausted(self) -> bool:
        return self.i >= self.n

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (galloping via searchsorted)."""
        if self.i < self.n and int(self.docs[self.i]) < target:
            self.i += int(np.searchsorted(self.docs[self.i :], target))

    def current_block_ub(self) -> float:
        if self.i >= self.n:
            return 0.0
        return float(self.block_ub[self.i // BLOCK])


def wand_topk(cursors: list[TermCursor], dl_lookup, avgdl: float, k: int):
    """Exact top-k (score desc, doc asc) using block-max WAND pruning.

    dl_lookup(doc_ids_array) -> dl array for scoring matched docs.
    Returns (doc_ids ndarray, scores ndarray) sorted by (score desc,
    doc asc).
    """
    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of top-k
    theta = 0.0
    cursors = [c for c in cursors if c.n]
    while True:
        live = [c for c in cursors if not c.exhausted()]
        if not live:
            break
        live.sort(key=lambda c: c.doc())
        # find pivot: smallest prefix whose global ub sum exceeds theta
        acc = 0.0
        pivot_idx = -1
        for j, c in enumerate(live):
            acc += c.ub
            if acc > theta or len(heap) < k:
                pivot_idx = j
                break
        if pivot_idx < 0:
            break  # no prefix can beat theta → done
        pivot_doc = live[pivot_idx].doc()
        if live[0].doc() == pivot_doc:
            # block-max refinement: tighter bound at the current blocks
            bacc = 0.0
            for c in live:
                if c.doc() > pivot_doc:
                    break
                bacc += c.current_block_ub()
            if len(heap) >= k and bacc <= theta:
                # current blocks can't beat theta → skip past pivot_doc
                for c in live:
                    if c.doc() <= pivot_doc:
                        c.seek(pivot_doc + 1)
                continue
            # fully evaluate pivot_doc
            tfw_sum = 0.0
            contrib = 0.0
            dl = float(dl_lookup(np.array([pivot_doc], dtype=np.uint64))[0])
            denom_tail = K1 * (1.0 - B + B * dl / avgdl)
            for c in live:
                if c.doc() == pivot_doc:
                    tfw = float(c.tfw[c.i])
                    contrib += c.idf * (tfw * (K1 + 1.0)) / (tfw + denom_tail)
                    c.i += 1
            if len(heap) < k:
                heapq.heappush(heap, (contrib, -pivot_doc))
                if len(heap) == k:
                    theta = heap[0][0]
            elif contrib > theta or (contrib == theta and -pivot_doc > heap[0][1]):
                heapq.heapreplace(heap, (contrib, -pivot_doc))
                theta = heap[0][0]
        else:
            # advance pre-pivot cursors to the pivot document
            for j in range(pivot_idx):
                live[j].seek(pivot_doc)
    if not heap:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    items = sorted(((s, -nd) for s, nd in heap), key=lambda t: (-t[0], t[1]))
    return (np.array([d for _, d in items], dtype=np.uint64),
            np.array([s for s, _ in items], dtype=np.float64))
