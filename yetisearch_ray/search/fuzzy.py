"""Fuzzy matching layer: corrections, variations, suggestions.

Re-expresses the reference's fuzzy pipeline
(``src/Search/SearchEngine.php:1328-2373``) over the engine's dictionary
head: a ``FuzzyMatcher`` holds the top-``max_indexed_terms`` terms by
document frequency (the candidate source, reference §2.3) plus an LRU
memo of computed expansions (the FuzzyTermCache analogue), and exposes

- ``find_best_correction`` — staged: common-typo table → known-term
  short-circuit → prefix match → quick edit-distance-1 vs compound-split
  arbitration → full consensus scan (weighted blend of trigram /
  levenshtein / jaro-winkler / phonetic / keyboard, reference
  ``:1994-2042``: ≥2 algorithms must score > 0, ×1.1 when ≥2 ≥ 0.8),
- ``variations`` — per-algorithm candidate generation with length/bigram
  prefilters and a total budget (``fuzzy_total_max_variations``),
- ``suggest`` — per-token correction with confidence, verified against
  the index (did-you-mean).

All pure Python over in-actor state — never a per-row hot path.
"""

from __future__ import annotations

from collections import OrderedDict

from ..functions.similarity import (
    _COMMON_TYPOS,
    jaro_winkler,
    keyboard_proximity,
    levenshtein,
    levenshtein_within,
    phonetic_similarity,
    trigram_similarity,
)

CONSENSUS_WEIGHTS = {
    "trigram": 0.25,
    "levenshtein": 0.20,
    "jaro_winkler": 0.25,
    "phonetic": 0.15,
    "keyboard": 0.15,
}


def consensus_score(a: str, b: str) -> float:
    """Weighted blend of the five similarity signals (reference
    ``calculateConsensusScore``)."""
    lev = levenshtein(a, b)
    lev_sim = 1.0 - lev / max(len(a), len(b), 1)
    scores = {
        "trigram": trigram_similarity(a, b),
        "levenshtein": max(0.0, lev_sim),
        "jaro_winkler": jaro_winkler(a, b),
        "phonetic": phonetic_similarity(a, b),
        "keyboard": keyboard_proximity(a, b),
    }
    nonzero = sum(1 for v in scores.values() if v > 0)
    if nonzero < 2:
        return 0.0
    blended = sum(CONSENSUS_WEIGHTS[k] * v for k, v in scores.items())
    strong = sum(1 for v in scores.values() if v >= 0.8)
    if strong >= 2:
        blended *= 1.1
    return min(1.0, blended)


class FuzzyMatcher:
    def __init__(self, dictionary: dict[str, int], *,
                 algorithm: str = "trigram",
                 fuzziness: float = 0.4,
                 max_variations: int = 10,
                 total_max_variations: int = 30,
                 cache_size: int = 10000,
                 min_part_frequency: int = 5,
                 persistent_cache=None,
                 version: str = ""):
        # term -> df; coerce to plain int (numpy uint64 values overflow
        # under unary negation in sort keys)
        self.dict = {t: int(f) for t, f in dictionary.items()}
        self.algorithm = algorithm
        self.fuzziness = fuzziness
        self.max_variations = max_variations
        self.total_max_variations = total_max_variations
        # compound-split part gate (reference tryCompoundWordSplit
        # minPartFrequency=5; lower it for tiny corpora whose stats
        # can't reach 5)
        self.min_part_frequency = min_part_frequency
        self._cache: OrderedDict[tuple, list] = OrderedDict()
        self._cache_max = cache_size
        # optional on-disk term->variations tier (state.FuzzyTermCache,
        # reference FuzzyTermCache.php) consulted for the matcher's
        # configured algorithm/limit only — the reference keys the file
        # by bare term, so override calls bypass it
        self._persistent = persistent_cache
        # index mutation version namespaces every persistent key: the
        # dictionary these variations/corrections were computed against
        # changes whenever the index does, and an unversioned entry
        # would be served forever (stale corrections to vanished terms)
        self.version = version
        self._persist_pending = 0
        # length buckets for candidate prefiltering
        self._by_len: dict[int, list[str]] = {}
        for t in dictionary:
            self._by_len.setdefault(len(t), []).append(t)

    # ------------------------------------------------------------------
    def _candidates_near_length(self, term: str, delta: int = 2):
        for ln in range(max(1, len(term) - delta), len(term) + delta + 1):
            yield from self._by_len.get(ln, ())

    def _cached(self, key, compute):
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        val = compute()
        self._cache[key] = val
        if len(self._cache) > self._cache_max:
            self._cache.popitem(last=False)
        return val

    # ------------------------------------------------------------------
    def variations(self, term: str, algorithm: str | None = None,
                   limit: int | None = None) -> list[str]:
        """Index terms similar to ``term`` under the chosen algorithm,
        ranked by (similarity desc, df desc)."""
        algo = algorithm or self.algorithm
        limit = limit or self.max_variations
        key = (term, algo, limit)

        def compute():
            out = []
            if algo == "basic":
                # wildcard / deletion / transposition edits that exist
                cands = set()
                for i in range(len(term)):
                    cands.add(term[:i] + term[i + 1 :])  # deletion
                    if i + 1 < len(term):
                        cands.add(term[:i] + term[i + 1] + term[i] + term[i + 2 :])
                for c in cands:
                    df = self.dict.get(c)
                    if df and c != term:
                        out.append((c, 0.8, df))
            elif algo == "levenshtein":
                max_d = 1 if len(term) <= 4 else 2
                for c in self._candidates_near_length(term, max_d):
                    if c == term:
                        continue
                    # bigram prefilter (reference :1359-1474)
                    big_a = {term[i : i + 2] for i in range(len(term) - 1)}
                    big_b = {c[i : i + 2] for i in range(len(c) - 1)}
                    if big_a and big_b and not (big_a & big_b):
                        continue
                    if levenshtein_within(term, c, max_d):
                        d = levenshtein(term, c)
                        out.append((c, 1.0 - d / max(len(term), len(c)), self.dict[c]))
            elif algo == "jaro_winkler":
                thr = 1.0 - self.fuzziness * 0.5
                for c in self._candidates_near_length(term, 2):
                    s = jaro_winkler(term, c)
                    if s >= thr and c != term:
                        out.append((c, s, self.dict[c]))
            else:  # trigram (default); adaptive n=2 for short terms
                n = 2 if len(term) <= 4 else 3
                thr = max(0.2, 1.0 - self.fuzziness - 0.3)
                for c in self._candidates_near_length(term, 3):
                    s = trigram_similarity(term, c, n)
                    if s >= thr and c != term:
                        out.append((c, s, self.dict[c]))
            out.sort(key=lambda x: (-x[1], -x[2], x[0]))
            return [c for c, _, _ in out[:limit]]

        default_call = (algo == self.algorithm
                        and limit == self.max_variations)
        if self._persistent is not None and default_call:
            hit = self._cache.get(key)
            if hit is not None:
                self._cache.move_to_end(key)
                return hit
            pkey = f"{self.version}:{term}"
            disk = self._persistent.get(pkey)
            if disk is None:
                disk = compute()
                self._persistent.set(pkey, disk)
                self._persist_pending += 1
                if self._persist_pending >= 32:
                    self._persistent.save()
                    self._persist_pending = 0
            self._cache[key] = disk
            if len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
            return disk
        return self._cached(key, compute)

    # ------------------------------------------------------------------
    def _compound_split(self, term: str) -> tuple[str, str, int, int] | None:
        """``searchengine`` → ``search engine`` when both halves are known
        and sufficiently frequent (reference ``tryCompoundWordSplit``
        :1651-1699: length 6..20, parts >= 3 chars, both part frequencies
        >= minPartFrequency, score = log(f1+1)+log(f2+1))."""
        import math

        if not (6 <= len(term) <= 20):
            return None
        best, best_score = None, 0.0
        for i in range(3, len(term) - 2):
            a, b = term[:i], term[i:]
            fa = int(self.dict.get(a, 0))
            fb = int(self.dict.get(b, 0))
            if fa < self.min_part_frequency or fb < self.min_part_frequency:
                continue
            score = math.log(fa + 1) + math.log(fb + 1)
            if score > best_score:
                best, best_score = (a, b, fa, fb), score
        return best

    def _best_prefix_match(self, low: str) -> str | None:
        """Prefix completion (reference ``findBestPrefixMatch``
        :1933-1990): term length 4..10, extension 1..5 chars, scored by
        frequency damped by extension length; near-ties prefer the
        shorter extension."""
        import functools

        if not (4 <= len(low) <= 10):
            return None
        matches = []
        for c in self._candidates_near_length(low, 5):
            if len(c) > len(low) and c.startswith(low):
                extra = len(c) - len(low)
                if extra <= 5:
                    matches.append((c, int(self.dict[c]), extra))
        if not matches:
            return None

        def score(m):
            return m[1] / (1.0 + m[2] * 0.5)

        def cmp(a, b):
            sa, sb = score(a), score(b)
            if abs(sa - sb) < max(sa, sb) * 0.3:
                return a[2] - b[2]
            return (sb > sa) - (sb < sa)

        matches.sort(key=functools.cmp_to_key(cmp))
        return matches[0][0]

    def _quick_fuzzy(self, low: str) -> tuple[str, float] | None:
        """Edit-distance-1 candidate gated by trigram similarity >= 0.4,
        scored sim * (1 + log(1+freq)/10) (reference
        ``findQuickFuzzyMatchWithScore`` :1598-1649)."""
        import math

        best, best_score, best_sim = None, 0.0, 0.0
        for c in self._candidates_near_length(low, 1):
            if c == low or not levenshtein_within(low, c, 1):
                continue
            sim = trigram_similarity(low, c)
            if sim >= 0.4:
                sc = sim * (1.0 + math.log1p(int(self.dict[c])) / 10.0)
                if sc > best_score:
                    best, best_score, best_sim = c, sc, sim
        return (best, best_sim) if best is not None else None

    def find_best_correction(self, term: str) -> str | None:
        """Staged correction pipeline, faithful to the reference
        ``findBestCorrection`` (:1706-1927): common-typo table → known
        term short-circuit → PREFIX completion → quick-fuzzy vs
        compound-split arbitration (frequency balance + same-length
        high-similarity rules) → consensus scan.  Returns a replacement
        term/phrase, or None if the term is fine or uncorrectable."""
        low = term.lower()
        if len(low) <= 3:  # reference skips short terms (:1710)
            return None
        # cross-process tier: corrections stored under a "corr:" key
        # namespace beside bare-term variation lists (FuzzyTermCache is
        # the reference's "fuzzy term mappings" file — corrections are
        # the hot mapping on this engine's default fuzzy path)
        if self._persistent is not None:
            ckey = f"corr:{self.version}:{low}"
            disk = self._persistent.get(ckey)
            if disk is not None:
                return disk[0] if disk else None
            out = self._find_best_correction(low)
            self._persistent.set(ckey, [out] if out else [])
            self._persist_pending += 1
            if self._persist_pending >= 32:
                self._persistent.save()
                self._persist_pending = 0
            return out
        return self._find_best_correction(low)

    def _find_best_correction(self, low: str) -> str | None:
        # 1. common-typo table (quickPhoneticCorrection :1715)
        fixed = _COMMON_TYPOS.get(low)
        if fixed and fixed in self.dict:
            return fixed
        # 2. already a known term → no correction needed (:1752)
        if low in self.dict:
            return None
        # 3. prefix completion FIRST (:1757-1762)
        pref = self._best_prefix_match(low)
        if pref is not None:
            return pref
        # 4. quick fuzzy vs compound split arbitration (:1770-1840)
        quick = self._quick_fuzzy(low)
        split = self._compound_split(low)
        if quick is not None and split is not None:
            q, q_sim = quick
            a, b, fa, fb = split
            fuzzy_freq = int(self.dict.get(q, 0))
            min_part, max_part = min(fa, fb), max(fa, fb)
            balanced = (min_part / max_part if max_part else 0.0) >= 0.15
            high_sim_sub = len(low) == len(q) and q_sim >= 0.5
            if fuzzy_freq > min_part:
                return q
            if high_sim_sub and fuzzy_freq > 0:
                return q
            if not balanced and fuzzy_freq > 0:
                return q
            return f"{a} {b}"
        if quick is not None:
            return quick[0]
        if split is not None:
            return f"{split[0]} {split[1]}"
        # 5. full consensus scan (:1845-1915)
        best, best_score = None, 0.0
        for c in self._candidates_near_length(low, 2):
            if c == low:
                continue
            s = consensus_score(low, c)
            if s > best_score or (s == best_score and best is not None
                                  and self.dict[c] > self.dict[best]):
                best, best_score = c, s
        if best is not None and best_score >= 0.5:
            return best
        return None

    # ------------------------------------------------------------------
    def suggest_tokens(self, tokens: list[str]) -> tuple[list[str], float, bool]:
        """Per-token correction; returns (corrected tokens, confidence,
        changed?)."""
        out, confs, changed = [], [], False
        for t in tokens:
            corr = self.find_best_correction(t)
            if corr is None:
                out.append(t)
                confs.append(1.0 if t.lower() in self.dict else 0.0)
            else:
                out.append(corr)
                confs.append(consensus_score(t.lower(), corr.split()[0]))
                changed = True
        conf = sum(confs) / len(confs) if confs else 0.0
        return out, conf, changed


def fuzzy_penalty(matched_exact_phrase: bool, all_terms: bool,
                  term_ratio: float, base_penalty: float = 0.2,
                  similarity_tier: float = 1.0) -> float:
    """Score penalty for fuzzy matches (reference ``calculateFuzzyPenalty``
    ``:850-971``): exact-phrase 0.05, all-terms 0.1, ≥75 % terms 0.2,
    otherwise scaled by match ratio and similarity tier."""
    if matched_exact_phrase:
        return 0.05
    if all_terms:
        return 0.1
    if term_ratio >= 0.75:
        return 0.2
    if term_ratio > 0:
        return base_penalty * (1.0 - term_ratio * 0.5)
    return base_penalty * similarity_tier
