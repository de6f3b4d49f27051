"""BM25 query engine over the partitioned posting segments.

Mirrors the reference's serving path (``SearchEngine::search`` →
``SqliteStorage::search``, ``src/Search/SearchEngine.php:94-272`` /
``src/Storage/SqliteStorage.php:858-1273``) with FTS5-BM25 semantics
(see ``bm25.py``) and the reference's post-scoring layers: min_score,
0–100 per-page normalization, field-weight handling, dedup-by-route,
highlights.

Architecture: ``IndexReader`` is the stateful piece — manifest + corpus
stats + doc-metadata arrays resident, postings decoded on demand with an
LRU cache.  ``SearchActor`` wraps an engine as a ``map_batches`` callable
class so query serving runs as a Ray actor pool (state loaded once per
actor in ``__init__``, per reference §2.3's cache/dictionary actors).

Scale notes: one reader holds ONE index replica.  At cluster scale the
doc-metadata arrays and segments shard by partition across actors (the
term-hash partitioning is already in the layout); this process-local
reader is the per-shard unit of that design.
"""

from __future__ import annotations

import math
import os
import re
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .bm25 import K1, B, idf as _idf
from ..analysis.analyzer import StandardAnalyzer
from ..index.build import term_partition
from ..index.manifest import Manifest
from ..index.postings import decode_postings, merge_postings

MAX_RESULTS = 1000  # reference clamp (src/Search/SearchEngine.php:661)

# Lucene `term^2.5` query-time boost suffix (extension; see search())
_BOOST_RE = re.compile(r"(\S+)\^(\d+(?:\.\d+)?)")


@dataclass
class Posting:
    doc_ids: np.ndarray
    tfs: np.ndarray
    positions: np.ndarray | None  # flat; boundaries via tfs

    def pos_slices(self):
        """Yield (doc_id, positions_array) pairs."""
        if self.positions is None:
            return
        starts = np.cumsum(self.tfs.astype(np.int64)) - self.tfs.astype(np.int64)
        for i, d in enumerate(self.doc_ids):
            s = starts[i]
            yield d, self.positions[s : s + int(self.tfs[i])]


_EMPTY = Posting(np.empty(0, np.uint64), np.empty(0, np.uint64), None)


class IndexReader:
    def __init__(self, index_dir: str, cache_terms: int = 4096,
                 max_generation: int | None = None):
        self.index_dir = index_dir
        self.manifest = Manifest.load(index_dir)
        # generation-pinned (time-travel / snapshot) reads: only segment
        # files of generation <= max_generation are visible, and corpus
        # stats (N, avgdl) are reconstructed from the manifest's
        # per-(gen:part) metrics so BM25 at the snapshot is identical to
        # an index built from just those docs.  Valid until
        # optimize_index() compacts generations away.
        self.max_generation = max_generation
        cfg = self.manifest.config
        self.fields = [tuple(f) for f in cfg["fields"]]  # [(name, src_col)]
        self.nfields = len(self.fields)
        self.num_partitions = int(cfg["num_partitions"])
        self.id_column = cfg["id_column"]
        self.language_column = cfg.get("language_column")
        st = self.manifest.stats
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) if st["avgdl"] else 1.0
        if max_generation is not None:
            nd = td = 0
            for k, v in (self.manifest.data.get("partitions") or {}).items():
                gen = int(k.split(":")[0]) if ":" in k else 0
                if gen <= max_generation and v.get("status") == "committed":
                    nd += int(v.get("n_docs", 0))
                    td += int(v.get("sum_dl", 0))
            self.n_docs = nd
            self.avgdl = (td / nd) if nd else 1.0
        # tombstones: deletes are logical until optimize_index() compacts
        # (N/avgdl intentionally reflect the pre-delete corpus until then,
        # mirroring "stats lag physical state" of segment architectures)
        self.tombstones = np.array(
            sorted(self.manifest.data.get("tombstones", [])), dtype=np.uint64
        )
        # Content-derived mutation version: ANY committed change —
        # append (new partitions/stats), delete (tombstones), optimize/
        # rebuild/clear (partition set) — yields a new value, so every
        # cache tier keyed on it (query cache, persistent query cache,
        # fuzzy term/correction cache) invalidates without coordination.
        # tombstone_version alone missed appends/rebuilds.
        import hashlib as _hashlib
        import json as _json

        md = self.manifest.data
        state = _json.dumps({
            "parts": sorted((k, v.get("bytes", 0), v.get("rows", 0))
                            for k, v in (md.get("partitions") or {}).items()),
            "tombv": md.get("tombstone_version", 0),
            "ntomb": len(md.get("tombstones", [])),
            "stats": md.get("stats"),
            "maxgen": max_generation,
        }, sort_keys=True, default=str)
        self.mutation_version = _hashlib.md5(state.encode()).hexdigest()[:16]
        self._cache: OrderedDict[str, dict[int, Posting]] = OrderedDict()
        self._cache_max = cache_terms
        self._docs_dir = os.path.join(index_dir, "docs")
        self._doc_meta: dict[str, np.ndarray] | None = None
        self._meta_dense = False
        self._docs_ds = None

    # ---------------- doc metadata (lazy resident arrays) --------------
    def _load_meta(self):
        """Doc-length arrays from the ``doclens`` side-files (written by
        the posting shuffle), sorted by doc_id for searchsorted lookup.
        Needed by EVERY query (BM25 normalization), so loaded eagerly on
        first use.  Filterable docstore columns load LAZILY, one column
        on first reference (``_load_col``) — a reader serving unfiltered
        queries never pays for store-column residency.

        At cluster scale these arrays shard by doc_id range across query
        actors (the SearchActor replica axis); term-partition sharding is
        the orthogonal axis served by search/sharded.py."""
        if self._doc_meta is not None:
            return
        dl_dir = os.path.join(self.index_dir, "doclens")
        dt = pq.read_table(dl_dir, columns=["doc_id", "dl"])
        dt = dt.take(pc.sort_indices(dt["doc_id"]))
        ids = dt["doc_id"].to_numpy(zero_copy_only=False)
        self._doc_meta = {
            self.id_column: ids,
            "dl_total": dt["dl"].to_numpy(zero_copy_only=False),
        }
        # Fresh builds assign doc_ids densely (0..N-1), making id->row a
        # direct index — ~10x cheaper than searchsorted on the hot
        # scoring path.  Appends/deletes break density; then we fall
        # back to the sorted lookup.
        self._meta_dense = bool(
            ids.size and ids[0] == 0 and int(ids[-1]) == ids.size - 1)

    def _load_col(self, col: str):
        if col in self._doc_meta:
            return
        t = pq.read_table(self._docs_dir, columns=[self.id_column, col])
        t = t.take(pc.sort_indices(t[self.id_column]))
        # docstore rows are the same doc set as doclens; align by doc_id
        ids = t[self.id_column].to_numpy(zero_copy_only=False)
        vals = t[col].to_numpy(zero_copy_only=False)
        ref = self._doc_meta[self.id_column]
        if ids.size == ref.size and np.array_equal(ids, ref):
            self._doc_meta[col] = vals
        else:  # defensive: docstore/doclens divergence (mid-append reads)
            idx = np.clip(np.searchsorted(ids, ref), 0, max(ids.size - 1, 0))
            self._doc_meta[col] = vals[idx]

    def has_meta(self, col: str) -> bool:
        """Whether the docstore carries this metadata column (schema
        check — does not force the column resident)."""
        try:
            return col in pq.read_schema(
                os.path.join(self._docs_dir,
                             sorted(os.listdir(self._docs_dir))[0])).names
        except (OSError, IndexError):
            return False

    def meta(self, col: str) -> np.ndarray:
        self._load_meta()
        if col != "dl_total":
            self._load_col(col)
        return self._doc_meta[col]

    def meta_for(self, col: str, doc_ids: np.ndarray) -> np.ndarray:
        """Values of a metadata column for given doc_ids (dense direct
        index when doc_ids are 0..N-1, else sorted lookup)."""
        self._load_meta()
        if col != "dl_total":
            self._load_col(col)
        ids = self._doc_meta[self.id_column]
        if self._meta_dense:
            idx = np.minimum(doc_ids.astype(np.intp, copy=False),
                             ids.size - 1)
        else:
            idx = np.searchsorted(ids, doc_ids)
            idx = np.clip(idx, 0, ids.size - 1)
        return self._doc_meta[col][idx]

    def dl_total_for(self, doc_ids: np.ndarray) -> np.ndarray:
        return self.meta_for("dl_total", doc_ids)

    # ---------------- postings ----------------------------------------
    def _term_parts(self, term: str) -> list[int]:
        """Partition(s) holding a term: split terms live in several
        (doc-hash-salted) partitions, hot terms in an explicitly placed
        one, the long tail by hash."""
        split = self.manifest.data.get("split_terms") or {}
        sp = split.get(term)
        if sp:
            return [int(p) for p in sp]
        hot = self.manifest.data.get("hot_terms") or {}
        p = hot.get(term)
        if p is not None:
            return [int(p)]
        return [int(term_partition([term], self.num_partitions)[0])]

    def _read_term_rows(self, term: str) -> pa.Table | None:
        """Rows for one term across all its partitions and ALL segment
        generations (plus the legacy single-file layout)."""
        import glob as _glob

        files: list[str] = []
        for part in self._term_parts(term):
            pattern = os.path.join(self.index_dir, "postings",
                                   f"part={part:05d}*.parquet")
            files.extend(sorted(_glob.glob(pattern)))
        if self.max_generation is not None:
            files = [f for f in files
                     if self._file_gen(f) <= self.max_generation]
        if not files:
            return None
        tabs = [pq.read_table(f, filters=[("term", "==", term)]) for f in files]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return None
        return pa.concat_tables(tabs)

    def postings(self, term: str) -> dict[int, Posting]:
        """field_id -> Posting for one term (LRU-cached); rows from
        multiple segment generations are merged positions-preserving."""
        hit = self._cache.get(term)
        if hit is not None:
            self._cache.move_to_end(term)
            return hit
        t = self._read_term_rows(term)
        out: dict[int, Posting] = {}
        if t is not None and t.num_rows:
            by_field: dict[int, list] = {}
            for i in range(t.num_rows):
                fid = t["field"][i].as_py()
                d, f, p = decode_postings(
                    t["docs"][i].as_py(), t["tfs"][i].as_py(), t["pos"][i].as_py()
                )
                by_field.setdefault(fid, []).append((d, f, p))
            for fid, parts in by_field.items():
                d, f, p = merge_postings(parts)
                out[fid] = Posting(d, f, p)
        self._cache[term] = out
        if len(self._cache) > self._cache_max:
            self._cache.popitem(last=False)
        return out

    @staticmethod
    def _file_gen(path: str) -> int:
        """Segment generation from the ``part=NNNNN-gGGG.parquet`` name
        (legacy un-tagged files are generation 0)."""
        m = re.search(r"-g(\d+)\.parquet$", path)
        return int(m.group(1)) if m else 0

    def _dict_dataset(self):
        """pyarrow dataset over the postings dir, generation-filtered
        when this reader is generation-pinned."""
        post_dir = os.path.join(self.index_dir, "postings")
        if not os.path.isdir(post_dir):
            return None
        if self.max_generation is None:
            return pads.dataset(post_dir, format="parquet")
        import glob as _glob

        files = [f for f in sorted(_glob.glob(
            os.path.join(post_dir, "*.parquet")))
            if self._file_gen(f) <= self.max_generation]
        if not files:
            return None
        return pads.dataset(files, format="parquet")

    def expand_prefix(self, prefix: str, max_terms: int = 128) -> list[str]:
        """Terms starting with prefix — scans every partition's dictionary
        columns (term,df) with a range filter.  (At scale this is served by
        a global sorted dictionary; partitioned scan is the test-scale
        equivalent.)"""
        lo, hi = prefix, prefix + "￿"
        found: dict[str, int] = {}
        dataset = self._dict_dataset()
        if dataset is None:
            return []
        flt = (pads.field("term") >= lo) & (pads.field("term") < hi)
        t = dataset.to_table(columns=["term", "df"], filter=flt)
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            found[term] = found.get(term, 0) + df
        ranked = sorted(found.items(), key=lambda kv: (-kv[1], kv[0]))
        return [term for term, _ in ranked[:max_terms]]

    def expand_wildcard(self, pattern: str, max_terms: int = 128) -> list[str]:
        """Terms matching a glob pattern (``*`` = any run, ``?`` = one
        char), ranked df DESC, term ASC — the prefix-expansion contract
        generalized to mid/leading wildcards.

        The literal prefix before the first wildcard narrows the
        dictionary scan to a term range (same pushdown as
        ``expand_prefix``); a leading wildcard forces a full dictionary
        scan — supported, but the caller should know it touches every
        partition's dictionary columns.
        """
        import re as _re

        i = min([j for j, c in enumerate(pattern) if c in "*?"],
                default=len(pattern))
        lit = pattern[:i]
        if i == len(pattern):  # no wildcard — degenerate exact term
            return [pattern]
        rx = _re.compile(
            "^" + "".join(".*" if c == "*" else "." if c == "?"
                          else _re.escape(c) for c in pattern) + "$")
        dataset = self._dict_dataset()
        if dataset is None:
            return []
        flt = None
        if lit:
            flt = ((pads.field("term") >= lit)
                   & (pads.field("term") < lit + "￿"))
        t = dataset.to_table(columns=["term", "df"], filter=flt)
        found: dict[str, int] = {}
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            if rx.match(term):
                found[term] = found.get(term, 0) + df
        ranked = sorted(found.items(), key=lambda kv: (-kv[1], kv[0]))
        return [term for term, _ in ranked[:max_terms]]

    def dictionary(self, limit: int = 20000, min_df: int = 2) -> dict[str, int]:
        """Top-``limit`` terms by summed df — the fuzzy candidate source
        (reference ``max_indexed_terms``/``min_term_frequency``).

        Memory-bounded: a term's rows all live in ONE partition (hash
        placement; manifest-listed split terms are the exception), so
        the exact global top-k is the merge of per-partition top-k
        lists.  Peak residency is O(largest partition dictionary +
        P x limit) — never the corpus-wide dictionary, which at cluster
        scale is billions of terms."""
        import glob as _glob
        import pandas as pd

        post_dir = os.path.join(self.index_dir, "postings")
        if not os.path.isdir(post_dir):
            return {}
        by_part: dict[str, list[str]] = {}
        for f in sorted(_glob.glob(os.path.join(post_dir, "part=*.parquet"))):
            key = os.path.basename(f).split(".")[0].split("-")[0]  # part=NNNNN
            by_part.setdefault(key, []).append(f)
        split_terms = set(self.manifest.data.get("split_terms") or {})
        cands: list[pd.Series] = []
        for files in by_part.values():
            t = pa.concat_tables(
                pq.read_table(f, columns=["term", "df"]) for f in files)
            s = pd.Series(t["df"].to_numpy(zero_copy_only=False),
                          index=t["term"].to_pylist()).groupby(level=0).sum()
            top = s.sort_values(ascending=False, kind="stable").head(limit)
            if split_terms:  # a split term's local share must always
                # reach the merge — its global df is summed across parts
                extra = s.index.intersection(split_terms).difference(top.index)
                if len(extra):
                    top = pd.concat([top, s[extra]])
            cands.append(top)
        if not cands:
            return {}
        merged = pd.concat(cands).groupby(level=0).sum()
        merged = merged[merged >= min_df]
        out = merged.sort_values(ascending=False, kind="stable").head(limit)
        return dict(out)

    # ---------------- docstore gather ---------------------------------
    def docs(self, doc_ids, columns=None) -> pa.Table:
        if self._docs_ds is None:
            self._docs_ds = pads.dataset(self._docs_dir, format="parquet")
        ids = pa.array(np.asarray(doc_ids, dtype=np.uint64), pa.uint64())
        flt = pads.field(self.id_column).isin(ids)
        return self._docs_ds.to_table(columns=columns, filter=flt)


def open_index(index_dir: str,
               max_generation: int | None = None) -> IndexReader:
    return IndexReader(index_dir, max_generation=max_generation)


# ==========================================================================
# query compilation
# ==========================================================================


@dataclass
class Phrase:
    terms: list  # 1..n unicode61 terms; n>1 => positional phrase
    prefix: bool = False  # last term is a prefix (term*)
    # ordered proximity (Lucene "sloppy phrase" shape, an extension —
    # FTS5 has only exact phrases + unordered NEAR): a match is a
    # strictly-increasing position chain q1<…<qn in term order with
    # span qn-q1 <= (n-1)+slop; tf = number of anchor positions q1
    # admitting such a chain.  0 = exact adjacency (FTS5 semantics).
    slop: int = 0
    # query-time boost (Lucene `term^2` shape, an extension — FTS5 has
    # no per-phrase boosts): multiplies this arm's BM25 contribution.
    boost: float = 1.0


@dataclass
class CompiledQuery:
    """mode:
    - "smart":  reference default  ("t1 … tn" OR NEAR(t1…tn,10) OR t1 OR …)
    - "and":    implicit FTS5 conjunction (reference fuzzy-correction shape)
    - "or":     explicit OR of terms
    - "phrase": single positional phrase
    """

    mode: str
    # field-restricted match (ES `field:term` shape, an extension — the
    # reference never emits FTS5 column filters): when set, match set,
    # tf AND df all come from these field ids only; N, avgdl and dl stay
    # whole-corpus (the pinned FTS5 unweighted-dl behavior).  The SQL
    # oracle mirrors this split verbatim.
    fields: frozenset | None = None
    # ES minimum_should_match (an extension — FTS5 OR is fixed at "any"):
    # in "or" mode, keep only docs matching at least this many of the OR
    # arms; scoring is unchanged (BM25 sum over the arms that match).
    # 1 = plain OR; len(arms) = the AND match set with OR scoring.
    min_should_match: int = 1
    # ES dis_max (an extension): score = best arm + tie_breaker * (sum
    # of the other arms).  tie_breaker=1 degenerates to the plain sum.
    dismax: bool = False
    tie_breaker: float = 0.0
    phrases: list = dc_field(default_factory=list)  # scoring phrases
    required: list = dc_field(default_factory=list)  # phrases that must ALL match ("and"/"phrase")
    any_of: list = dc_field(default_factory=list)  # components; ANY matches ("or"/"smart")
    exclude: list = dc_field(default_factory=list)  # NOT phrases (DSL layer)
    near_terms: list | None = None  # smart mode NEAR group
    near_distance: int = 10


def compile_query(query: str, analyzer: StandardAnalyzer, mode: str = "smart",
                  prefix_last: bool = False,
                  near_distance: int = 10) -> CompiledQuery:
    query = query.strip()
    explicit_phrase = len(query) >= 2 and query[0] == '"' and query[-1] == '"'
    if explicit_phrase:
        query = query[1:-1]
        mode = "phrase"
    groups = analyzer.match_terms(query)
    terms: list[str] = [t for g in groups for t in g]
    if prefix_last and terms:
        pass  # handled below via Phrase.prefix
    if not terms:
        return CompiledQuery(mode=mode)

    def P(ts, prefix=False):
        return Phrase(list(ts), prefix)

    last_prefix = prefix_last
    if mode == "phrase" or explicit_phrase:
        # prefix_last + phrase = ES match_phrase_prefix: the final slot
        # matches any dictionary expansion of the prefix
        ph = P(terms, prefix=last_prefix)
        return CompiledQuery(mode="phrase", phrases=[ph], required=[ph])
    if len(terms) == 1:
        ph = P(terms, prefix=last_prefix)
        return CompiledQuery(mode="smart", phrases=[ph], any_of=[ph])
    # NOTE: phrases/required/any_of must be DISTINCT list objects — callers
    # append synonym arms to cq.phrases only, which must not leak into the
    # required conjuncts (aliasing here once made synonyms shrink AND-mode
    # match sets and double-score OR arms).
    if mode == "near":
        # explicit FTS5 NEAR(t1 … tn, N) query: match set = docs with a
        # qualifying window (single column, span <= N+1); members are
        # scored ONCE each, with window-filtered tf (_near_filtered_tfs).
        # `phrases` carries the dedup'd singles for highlight/suggest
        # bookkeeping only — _score skips them in near mode.
        phs = [P([t]) for t in dict.fromkeys(terms)]
        return CompiledQuery(mode="near", phrases=list(phs), any_of=[],
                             near_terms=terms, near_distance=near_distance)
    if mode == "and":
        phs = [P([t]) for t in dict.fromkeys(terms)]
        return CompiledQuery(mode="and", phrases=list(phs), required=list(phs))
    if mode == "or":
        # prefix_last + or = ES match_bool_prefix: the last token is a
        # prefix arm (union of its dictionary expansions scored as ONE
        # term-like arm), the rest are plain OR terms
        phs = []
        seen_or: set = set()
        for i, t in enumerate(terms):
            pfx = last_prefix and i == len(terms) - 1
            if (t, pfx) in seen_or:
                continue
            seen_or.add((t, pfx))
            phs.append(P([t], prefix=pfx))
        return CompiledQuery(mode="or", phrases=list(phs), any_of=list(phs))
    # smart: "t1..tn" OR NEAR(t1..tn, 10) OR t1 OR ... OR tn
    # (reference src/Search/SearchEngine.php:615-643; components pass
    # through array_unique, so DUPLICATE single-term arms collapse while
    # the phrase/NEAR arms keep repeated tokens)
    full = P(terms)
    singles = []
    seen: set = set()
    for i, t in enumerate(terms):
        pfx = last_prefix and i == len(terms) - 1
        if (t, pfx) in seen:
            continue
        seen.add((t, pfx))
        singles.append(P([t], prefix=pfx))
    cq = CompiledQuery(
        mode="smart",
        phrases=[full] + singles,
        any_of=[full] + singles,
        near_terms=terms,
    )
    return cq


# ==========================================================================
# engine
# ==========================================================================


class SearchEngine:
    def __init__(self, index: IndexReader, *, language: str = "en",
                 analyzer: StandardAnalyzer | None = None,
                 field_weights: dict[str, float] | None = None,
                 synonyms: dict[str, list] | None = None,
                 fuzzy_algorithm: str = "trigram",
                 fuzziness: float = 0.4,
                 max_indexed_terms: int = 20000,
                 min_term_frequency: int = 2,
                 min_part_frequency: int = 5,
                 cache_ttl: float = 300.0,
                 persistent_cache=None,
                 persistent_fuzzy_cache=None):
        self.index = index
        self.analyzer = analyzer or StandardAnalyzer(language=language)
        self.default_weights = field_weights
        self.synonyms = {k.lower(): list(v) for k, v in (synonyms or {}).items()}
        self.fuzzy_algorithm = fuzzy_algorithm
        self.fuzziness = fuzziness
        self._fuzzy_cfg = (max_indexed_terms, min_term_frequency,
                           min_part_frequency)
        self._fuzzy = None
        self._cache_ttl = cache_ttl
        self._result_cache: OrderedDict = OrderedDict()
        self._cache_max = 1000
        self._cache_hits = 0
        self._cache_misses = 0
        # optional cross-process tiers (yetisearch_ray.state): a SQLite
        # query-result cache and a JSON fuzzy-term cache, both keyed on
        # the index mutation version so writes invalidate (reference
        # QueryCache.php / FuzzyTermCache.php)
        self._persistent = persistent_cache
        self._persistent_fuzzy = persistent_fuzzy_cache
        self._index_name = os.path.basename(
            os.path.normpath(index.index_dir)) or "default"

    @property
    def fuzzy_matcher(self):
        """Dictionary head + fuzzy state, built lazily once per engine
        (reference's indexed-terms cache, §2.3)."""
        if self._fuzzy is None:
            from .fuzzy import FuzzyMatcher

            limit, min_df, min_part = self._fuzzy_cfg
            self._fuzzy = FuzzyMatcher(
                self.index.dictionary(limit=limit, min_df=min_df),
                algorithm=self.fuzzy_algorithm, fuzziness=self.fuzziness,
                min_part_frequency=min_part,
                persistent_cache=self._persistent_fuzzy,
                version=self.index.mutation_version,
            )
        return self._fuzzy

    def _expand_synonyms(self, groups: list[list[str]], cap_per_term: int = 3):
        """Synonym expansion (reference ``expandSynonyms`` :2157-2213):
        extra OR-arms per term; multi-word synonyms become phrases."""
        extra = []
        for g in groups:
            if len(g) != 1:
                continue
            for syn in self.synonyms.get(g[0], [])[:cap_per_term]:
                toks = self.analyzer.match_terms(syn)
                extra.extend(toks)
        return extra

    # ---------------- low-level helpers -------------------------------
    def _field_weight_vector(self, field_weights: dict[str, float] | None) -> np.ndarray:
        w = np.ones(self.index.nfields, dtype=np.float64)
        if field_weights:
            for i, (fname, _) in enumerate(self.index.fields):
                if fname in field_weights:
                    w[i] = float(field_weights[fname])
        return w

    def _term_postings(self, term: str) -> dict[int, Posting]:
        return self.index.postings(term)

    def _phrase_postings(self, phrase: Phrase) -> dict[int, Posting]:
        """Postings of a (possibly multi-term / prefix) phrase per field.

        Multi-term: positional adjacency intersection (tf = number of
        phrase occurrences).  Prefix: union over expanded terms.
        """
        if phrase.prefix:
            # UNCAPPED expansion — FTS5 `term*` and ES *_prefix queries
            # are "starts with", not "top-k expansions"
            expanded = self.index.expand_prefix(phrase.terms[-1],
                                                max_terms=1 << 31)
            base_terms = phrase.terms[:-1]
            if not base_terms:
                # union of postings of all expanded terms, per field
                out: dict[int, Posting] = {}
                for t in expanded:
                    for fid, p in self._term_postings(t).items():
                        prev = out.get(fid)
                        if prev is None:
                            out[fid] = Posting(p.doc_ids.copy(), p.tfs.copy(), None)
                        else:
                            ids = np.concatenate([prev.doc_ids, p.doc_ids])
                            tfs = np.concatenate([prev.tfs, p.tfs])
                            uids, inv = np.unique(ids, return_inverse=True)
                            agg = np.zeros(uids.size, dtype=np.uint64)
                            np.add.at(agg, inv, tfs)
                            out[fid] = Posting(uids, agg, None)
                return out
            # phrase ending in prefix (ES match_phrase_prefix): the final
            # slot matches ANY dictionary expansion of the prefix; the
            # union occurrence set is built per field with positions so
            # the standard adjacency kernel below runs unchanged
            buf: dict[int, list] = {}
            for t in expanded:
                for fid, p in self._term_postings(t).items():
                    buf.setdefault(fid, []).append(p)
            per_last: dict[int, Posting] = {}
            for fid, ps in buf.items():
                if any(p.positions is None for p in ps):
                    continue
                docs = np.concatenate(
                    [np.repeat(p.doc_ids, p.tfs.astype(np.int64))
                     for p in ps])
                pos = np.concatenate([p.positions for p in ps])
                key = ((docs.astype(np.uint64) << np.uint64(32))
                       | pos.astype(np.uint64))
                order = np.argsort(key, kind="stable")
                docs, pos = docs[order], pos[order]
                uids, counts = np.unique(docs, return_counts=True)
                per_last[fid] = Posting(uids.astype(np.uint64),
                                        counts.astype(np.uint64), pos)
            if not per_last:
                return {}
            per_term = [self._term_postings(t) for t in base_terms]
            per_term.append(per_last)
            phrase = Phrase(list(base_terms) + [phrase.terms[-1]])
        else:
            if len(phrase.terms) == 1:
                return self._term_postings(phrase.terms[0])
            per_term = [self._term_postings(t) for t in phrase.terms]
        out: dict[int, Posting] = {}
        for fid in range(self.index.nfields):
            plists = [pt.get(fid) for pt in per_term]
            if any(p is None or p.doc_ids.size == 0 for p in plists):
                continue
            if any(p.positions is None for p in plists):
                continue  # positions required for phrases
            # fully vectorized adjacency: encode each occurrence as
            # key = doc_id * 2^32 + position, then a phrase anchored at key
            # requires key+j present in term j's key set — a chain of
            # sorted-array membership tests, no per-doc loop.
            # Bounds: positions are uint32 at build time (< 2^32), and
            # doc_id must fit the high 32 bits — guard so a pathological
            # id can never silently corrupt keys into false matches.
            SHIFT = np.uint64(32)
            # prune to the doc intersection before expanding occurrences —
            # an adjacency run needs every term in the doc, so non-shared
            # docs can never contribute (hot-term phrases shrink a lot)
            common = plists[0].doc_ids
            for p in plists[1:]:
                common = common[np.isin(common, p.doc_ids,
                                        assume_unique=True)]
            if common.size == 0:
                continue
            prune = common.size < 0.8 * min(p.doc_ids.size for p in plists)
            keys = []
            for p in plists:
                if p.doc_ids.size and int(p.doc_ids[-1]) >= (1 << 32):
                    raise ValueError(
                        "phrase matching requires doc_id < 2^32 per shard "
                        f"(got {int(p.doc_ids[-1])}); re-shard the index")
                tfs64 = p.tfs.astype(np.int64)
                if prune:
                    mask = np.isin(p.doc_ids, common, assume_unique=True)
                    docs_exp = np.repeat(p.doc_ids[mask], tfs64[mask])
                    pos = p.positions[np.repeat(mask, tfs64)]
                else:
                    docs_exp = np.repeat(p.doc_ids, tfs64)
                    pos = p.positions
                keys.append((docs_exp << SHIFT) | pos.astype(np.uint64))
            occ = keys[0]
            if phrase.slop > 0:
                # greedy windowed chain: per anchor, take the SMALLEST
                # next-term position > current — greedy minimizes the
                # final span, so "greedy chain fits the window" is exact
                # for "∃ increasing chain within the window".  One
                # searchsorted per term over the whole anchor vector —
                # no per-doc loop.
                bound = np.uint64(len(phrase.terms) - 1 + phrase.slop)
                anchor = occ
                cur = occ
                for j in range(1, len(phrase.terms)):
                    # keys are globally ascending: build sorts postings by
                    # (term, doc, position) (build.py:338) and docs_exp
                    # repeats the ascending doc_ids
                    kj = keys[j]
                    idx = np.searchsorted(kj, cur + np.uint64(1))
                    ok = idx < kj.size
                    nxt = kj[np.minimum(idx, kj.size - 1)]
                    ok &= (nxt >> SHIFT) == (cur >> SHIFT)  # same doc
                    ok &= (nxt - anchor) <= bound
                    anchor, cur = anchor[ok], nxt[ok]
                    if anchor.size == 0:
                        break
                occ = anchor
            else:
                for j in range(1, len(phrase.terms)):
                    occ = occ[np.isin(occ + np.uint64(j), keys[j],
                                      assume_unique=True)]
                    if occ.size == 0:
                        break
            if occ.size:
                docs = (occ >> SHIFT).astype(np.uint64)
                uids, counts = np.unique(docs, return_counts=True)
                out[fid] = Posting(uids, counts.astype(np.uint64), None)
        return out

    # FTS5 NEAR window rule, probed against stdlib sqlite3 FTS5 (see
    # tests/test_fts5_goldens.py): single-token members of NEAR(t1 … tn, N)
    # form a qualifying clump iff max(pos) - min(pos) <= N + 1, within a
    # SINGLE column (positions never span columns).  This holds for any
    # member count — "tokens between the end of the first phrase and the
    # start of the last" <= N.
    def _near_docs(self, terms: list[str], distance: int) -> np.ndarray:
        """doc_ids where all terms occur within a qualifying NEAR window
        in some single field — NEAR(t1 … tn, N) match set.

        Thin wrapper over the vectorized global-windowing kernel
        (_near_filtered_tfs): a doc has a qualifying window iff any of
        its term instances survive window filtering (tf > 0).  One NEAR
        implementation, no per-doc Python loop."""
        per_term = [self._term_postings(t) for t in terms]

        def docs_any(posts) -> np.ndarray:
            arrs = [p.doc_ids for p in posts.values()]
            if not arrs:
                return np.empty(0, np.uint64)
            return np.unique(np.concatenate(arrs))

        cand = docs_any(per_term[0])
        for pt in per_term[1:]:
            other = docs_any(pt)
            cand = cand[np.isin(cand, other, assume_unique=True)]
            if cand.size == 0:
                return cand
        ones = np.ones(self.index.nfields, dtype=np.float64)
        tfs = self._near_filtered_tfs(terms, distance, cand, ones)
        total = np.zeros(cand.size, dtype=np.float64)
        for tfw in tfs:
            total += tfw
        return cand[total > 0.0]

    def _near_filtered_tfs(self, terms: list[str], distance: int,
                           match: np.ndarray,
                           weights: np.ndarray) -> list[np.ndarray]:
        """Per-term, NEAR-window-filtered, column-weighted tf aligned with
        the sorted ``match`` array — the tf FTS5's bm25() sees for the
        member phrases of a NEAR group.

        FTS5 semantics (probed empirically, tests/test_fts5_goldens.py):
        an instance of a member term counts iff it lies inside some token
        window of span <= distance+1 (within one column) that contains at
        least one instance of EVERY member term; instances outside every
        qualifying window are dropped from the phrase's position list and
        therefore from its tf.
        """
        nterms = len(terms)
        out = [np.zeros(match.size, dtype=np.float64) for _ in range(nterms)]
        per_term = [self._term_postings(t) for t in terms]
        span_u = np.uint64(distance + 1)
        SHIFT = np.uint64(32)
        for fid in range(self.index.nfields):
            plists = [pt.get(fid) for pt in per_term]
            if any(p is None or p.doc_ids.size == 0 or p.positions is None
                   for p in plists):
                continue
            for p in plists:
                if int(p.doc_ids[-1]) >= (1 << 32):
                    raise ValueError(
                        "NEAR matching requires doc_id < 2^32 per shard")
            # Candidate pruning BEFORE occurrence expansion: a qualifying
            # window needs every member term in the same doc+field, and
            # only docs still in ``match`` can receive tf — so restrict
            # each posting to the doc intersection ∩ match first.  For
            # hot-term pairs this shrinks the occurrence sort from the
            # UNION of all postings to the (much smaller) co-occurrence
            # set (measured ~3× on two-hot-term smart queries).
            common = plists[0].doc_ids
            for p in plists[1:]:
                common = common[np.isin(common, p.doc_ids,
                                        assume_unique=True)]
            if match.size:
                common = common[np.isin(common, match, assume_unique=True)]
            if common.size == 0:
                continue
            # masking pays only when it actually shrinks the expansion —
            # for hot-term pairs that co-occur everywhere, skip it
            prune = common.size < 0.8 * min(p.doc_ids.size for p in plists)
            # Global vectorized windowing over ALL docs at once: pack
            # every occurrence as key = doc<<32 | pos (sorted).  A window
            # ending at occurrence h starts at lo(h) = first key >=
            # key[h]-span; same-doc membership is implied (cross-doc keys
            # differ by >= 2^32 - span).  The window qualifies iff every
            # term label appears in [lo(h), h] (per-label cumulative
            # counts), and a qualifying window marks all of its members
            # (interval-union via a +1/-1 diff array).  O(n log n), no
            # per-doc Python loop.
            keys_list, lbl_list = [], []
            for j, p in enumerate(plists):
                tfs64 = p.tfs.astype(np.int64)
                if prune:
                    mask = np.isin(p.doc_ids, common, assume_unique=True)
                    docs_exp = np.repeat(p.doc_ids[mask], tfs64[mask])
                    pos = p.positions[np.repeat(mask, tfs64)]
                else:
                    docs_exp = np.repeat(p.doc_ids, tfs64)
                    pos = p.positions
                keys_list.append((docs_exp << SHIFT)
                                 | pos.astype(np.uint64))
                lbl_list.append(np.full(keys_list[-1].size, j, dtype=np.int8))
            keys = np.concatenate(keys_list)
            lbl = np.concatenate(lbl_list)
            order = np.argsort(keys, kind="stable")
            keys, lbl = keys[order], lbl[order]
            n = keys.size
            lo_target = np.where(keys >= span_u, keys - span_u,
                                 np.uint64(0))
            lo = np.searchsorted(keys, lo_target, side="left")
            cum = np.empty((nterms, n + 1), dtype=np.int64)
            ok = np.ones(n, dtype=bool)
            for j in range(nterms):
                cum[j, 0] = 0
                np.cumsum(lbl == j, out=cum[j, 1:])
                ok &= (cum[j, 1:] - cum[j, lo]) > 0
            if not ok.any():
                continue
            diff = np.zeros(n + 1, dtype=np.int64)
            np.add.at(diff, lo[ok], 1)
            hi_idx = np.flatnonzero(ok)
            np.add.at(diff, hi_idx + 1, -1)
            marked = np.cumsum(diff[:-1]) > 0
            w = float(weights[fid])
            for j in range(nterms):
                sel = marked & (lbl == j)
                if not sel.any():
                    continue
                docs = (keys[sel] >> SHIFT)
                # NEAR-qualifying docs may have been REMOVED from `match`
                # (exclude terms): keep only true members, or searchsorted
                # indexes out of bounds / credits the wrong doc
                mi = np.searchsorted(match, docs)
                mi = np.clip(mi, 0, max(match.size - 1, 0))
                present = match[mi] == docs
                if present.any():
                    np.add.at(out[j], mi[present], w)
        return out

    # ---------------- scoring -----------------------------------------
    @staticmethod
    def _arm_key(ph: Phrase):
        return ("phrase", tuple(ph.terms), bool(ph.prefix))

    def arm_dfs(self, cq: CompiledQuery) -> dict:
        """LOCAL document frequencies per scoring arm — phrase arms keyed
        ("phrase", terms, prefix), NEAR member terms keyed ("near", t).
        The doc-sharded coordinator sums these across shards and feeds
        the totals back via ``_score(stats_override=...)`` so every shard
        scores with GLOBAL idf (distributed-BM25 two-phase protocol)."""
        out: dict = {}
        for ph in cq.phrases:
            posts = self._phrase_postings(ph)
            arrs = [p.doc_ids for p in posts.values()]
            union = (np.unique(np.concatenate(arrs)) if arrs
                     else np.empty(0, np.uint64))
            out[self._arm_key(ph)] = int(union.size)
        if cq.near_terms and len(cq.near_terms) > 1:
            for t in cq.near_terms:
                posts = self._term_postings(t)
                arrs = [p.doc_ids for p in posts.values()]
                union = (np.unique(np.concatenate(arrs)) if arrs
                         else np.empty(0, np.uint64))
                out[("near", t)] = int(union.size)
        return out

    def _score(self, cq: CompiledQuery, weights: np.ndarray,
               stats_override: dict | None = None):
        """Returns (doc_ids, rank) where rank is the NEGATED FTS5 bm25 sum
        (ORDER BY rank ASC = best first).

        ``stats_override`` = {"n_docs": N, "avgdl": x, "dfs": {arm_key:
        df}} replaces the LOCAL corpus statistics with cluster-global
        ones — the per-shard scoring phase of doc-sharded serving.
        """
        if stats_override:
            N = int(stats_override["n_docs"])
            avgdl = float(stats_override["avgdl"])
            dfs = stats_override["dfs"]
        else:
            N = self.index.n_docs
            avgdl = self.index.avgdl
            dfs = None
        phrase_posts = [self._phrase_postings(p) for p in cq.phrases]
        if cq.fields is not None:
            # field-restricted match: drop non-selected fields BEFORE the
            # match set / tf / df are formed — restricted-corpus semantics
            phrase_posts = [{fid: p for fid, p in pp.items()
                             if fid in cq.fields} for pp in phrase_posts]

        # match set
        def docs_any(posts) -> np.ndarray:
            arrs = [p.doc_ids for p in posts.values()]
            if not arrs:
                return np.empty(0, np.uint64)
            return np.unique(np.concatenate(arrs))

        if cq.mode == "near" and cq.near_terms and len(cq.near_terms) > 1:
            match = self._near_docs(cq.near_terms, cq.near_distance)
        elif cq.mode in ("and", "phrase") or cq.required:
            if cq.mode == "and":
                # Intersect ONLY over the required conjuncts — synonym
                # expansion appends extra scoring phrases to cq.phrases
                # which must behave as OR arms, not shrink the match set
                # (reference expandSynonyms adds OR components).
                req_ids = {id(ph) for ph in cq.required}
                sets = [docs_any(pp) for ph, pp in zip(cq.phrases, phrase_posts)
                        if id(ph) in req_ids]
            else:
                sets = [docs_any(phrase_posts[0])]
            if cq.mode == "phrase":
                match = docs_any(phrase_posts[0])
            else:
                match = sets[0]
                for s in sets[1:]:
                    match = match[np.isin(match, s)]
        else:
            allsets = [docs_any(pp) for pp in phrase_posts]
            nonempty = [s for s in allsets if s.size]
            if not nonempty:
                match = np.empty(0, np.uint64)
            elif cq.min_should_match > 1:
                # minimum_should_match: each arm contributes its doc set
                # once (docs_any is unique per arm), so the concat count
                # is the number of matching arms per doc
                ids, cnt = np.unique(np.concatenate(nonempty),
                                     return_counts=True)
                match = ids[cnt >= cq.min_should_match]
            else:
                match = np.unique(np.concatenate(nonempty))
            # The smart expression's NEAR(t1..tn, 10) arm adds nothing to
            # the MATCH SET (every NEAR match contains all terms, which the
            # OR-of-terms arms already cover) but it DOES contribute score:
            # FTS5's bm25() counts every phrase in the expression, so the
            # NEAR group's member terms are scored a second time with
            # window-filtered tf — added below after the phrase loop.
        if match.size and cq.exclude:
            for ph in cq.exclude:
                posts = self._phrase_postings(ph)
                if cq.fields is not None:
                    posts = {fid: p for fid, p in posts.items()
                             if fid in cq.fields}
                bad = docs_any(posts)
                if bad.size:
                    match = match[~np.isin(match, bad)]
        if match.size == 0:
            return match, np.empty(0, np.float64)

        dl = self.index.dl_total_for(match).astype(np.float64)
        score = np.zeros(match.size, dtype=np.float64)
        # dis_max (ES disjunction-max, an extension): combine arm
        # contributions as max + tie_breaker*(sum - max) instead of sum
        dmax = np.zeros(match.size, dtype=np.float64) if cq.dismax else None

        def phrase_contrib(posts, key=None, boost=1.0):
            # df = rows containing the phrase in ANY column (FTS5 idf)
            arrs = [p.doc_ids for p in posts.values()]
            if not arrs:
                return None
            if dfs is not None and key is not None:
                df = int(dfs.get(key, 0))
                if df == 0:
                    return None
            else:
                union = np.unique(np.concatenate(arrs))
                df = int(union.size)
            term_idf = _idf(N, df)
            tfw = np.zeros(match.size, dtype=np.float64)
            for fid, p in posts.items():
                idx = np.searchsorted(p.doc_ids, match)
                idx = np.clip(idx, 0, max(p.doc_ids.size - 1, 0))
                present = p.doc_ids[idx] == match
                tfw += np.where(present, p.tfs[idx].astype(np.float64), 0.0) * weights[fid]
            denom = tfw + K1 * (1.0 - B + B * dl / avgdl)
            score_contrib = boost * term_idf * (tfw * (K1 + 1.0)) / denom
            return np.where(tfw > 0, score_contrib, 0.0)

        def add_phrase(posts, key=None, boost=1.0):
            c = phrase_contrib(posts, key=key, boost=boost)
            if c is None:
                return
            np.add(score, c, out=score)  # running sum (plain BM25 path)
            if dmax is not None:
                np.maximum(dmax, c, out=dmax)

        # near mode: phrases are bookkeeping only — EXCEPT when the NEAR
        # group degenerates to a single member, where FTS5 scores
        # NEAR(term) exactly like a plain term query (the NEAR-arm
        # contribution below requires >1 members and would otherwise
        # leave every match at score 0)
        if cq.mode != "near" or len(cq.near_terms or []) <= 1:
            for ph, posts in zip(cq.phrases, phrase_posts):
                add_phrase(posts, key=self._arm_key(ph), boost=ph.boost)
        if dmax is not None:
            # score currently holds the arm SUM; fold into dis_max form
            score = dmax + cq.tie_breaker * (score - dmax)
        # NEAR-arm contribution (smart mode only): FTS5's bm25() scores
        # every phrase in the expression, so the member terms of
        # NEAR(t1..tn, 10) count AGAIN, with tf restricted to instances
        # inside qualifying NEAR windows.  idf uses each member's
        # standalone df (xQueryPhrase counts unconstrained phrase rows).
        # Verified rank- and score-identical to real SQLite FTS5 in
        # tests/test_fts5_goldens.py.
        if (cq.mode in ("smart", "near") and cq.near_terms
                and len(cq.near_terms) > 1 and match.size):
            near_tfs = self._near_filtered_tfs(
                cq.near_terms, cq.near_distance, match, weights)
            for t, tfw in zip(cq.near_terms, near_tfs):
                posts = self._term_postings(t)
                arrs = [p.doc_ids for p in posts.values()]
                if not arrs:
                    continue
                if dfs is not None:
                    df = int(dfs.get(("near", t), 0))
                    if df == 0:
                        continue
                else:
                    df = int(np.unique(np.concatenate(arrs)).size)
                term_idf = _idf(N, df)
                denom = tfw + K1 * (1.0 - B + B * dl / avgdl)
                contrib = term_idf * (tfw * (K1 + 1.0)) / np.where(
                    denom > 0, denom, 1.0)
                np.add(score, np.where(tfw > 0, contrib, 0.0), out=score)
        rank = -score
        return match, rank

    # ---------------- filters -----------------------------------------
    _OPS = {"=", "!=", "<", ">", "<=", ">=", "in", "not in", "between",
            "like", "not like", "contains", "is null", "is not null",
            "exists", "not exists", "=?"}

    def _apply_filters(self, doc_ids: np.ndarray, filters, language: str | None):
        if doc_ids.size == 0:
            return np.ones(0, dtype=bool)
        mask = np.ones(doc_ids.size, dtype=bool)
        if language and self.index.language_column:
            vals = self.index.meta_for(self.index.language_column, doc_ids)
            mask &= vals == language
        for f in filters or []:
            col, op, value = f["field"], f.get("operator", "=").lower(), f.get("value")
            if op not in self._OPS:
                raise ValueError(f"unsupported filter operator: {op}")
            if op in ("exists", "not exists"):
                have = self.index.has_meta(col)
                mask &= np.full(doc_ids.size, have if op == "exists" else not have)
                continue
            vals = self.index.meta_for(col, doc_ids)
            if op == "=":
                mask &= vals == value
            elif op == "!=":
                mask &= vals != value
            elif op == "<":
                mask &= vals < value
            elif op == ">":
                mask &= vals > value
            elif op == "<=":
                mask &= vals <= value
            elif op == ">=":
                mask &= vals >= value
            elif op == "in":
                mask &= np.isin(vals, list(value))
            elif op == "not in":
                mask &= ~np.isin(vals, list(value))
            elif op == "between":
                lo, hi = value
                mask &= (vals >= lo) & (vals <= hi)
            elif op == "like":
                rx = re.compile("^" + re.escape(str(value)).replace("%", ".*").replace(r"\%", ".*") + "$", re.I)
                mask &= np.fromiter((bool(rx.match(str(v))) for v in vals), bool, vals.size)
            elif op == "not like":
                rx = re.compile("^" + re.escape(str(value)).replace("%", ".*") + "$", re.I)
                mask &= np.fromiter((not rx.match(str(v)) for v in vals), bool, vals.size)
            elif op == "contains":
                mask &= np.fromiter((str(value).lower() in str(v).lower() for v in vals), bool, vals.size)
            elif op == "is null":
                mask &= np.fromiter((v is None or (isinstance(v, float) and np.isnan(v)) for v in vals), bool, vals.size)
            elif op == "is not null":
                mask &= np.fromiter((not (v is None or (isinstance(v, float) and np.isnan(v))) for v in vals), bool, vals.size)
            elif op == "=?":
                mask &= np.fromiter(
                    (v == value or v is None or v == "" for v in vals), bool, vals.size
                )
        return mask

    def _parse_boost_syntax(self, query: str, term_boosts):
        """Lucene ``term^2.5`` boost syntax: strip the suffix before the
        analyzer sees it (it would otherwise split "2.5" into tokens)
        and fold into term_boosts keyed by the ANALYZED term."""
        if "^" not in query:
            return query, term_boosts
        boosts = dict(term_boosts or {})

        def _take(mo):
            g = self.analyzer.match_terms(mo.group(1))
            for t in (t for grp in g for t in grp):
                boosts[t] = float(mo.group(2))
            return mo.group(1)

        return _BOOST_RE.sub(_take, query), boosts

    # ---------------- public API ---------------------------------------
    def search(
        self,
        query: str,
        *,
        limit: int = 20,
        offset: int = 0,
        mode: str = "smart",
        field_weights: dict[str, float] | None = None,
        filters=None,
        language: str | None = None,
        min_score: float = 0.0,
        normalize: bool = True,
        unique_by_route: bool = False,
        route_column: str | None = None,
        prefix_last: bool = False,
        with_docs: bool = False,
        highlight: bool = False,
        round_scores: int | None = None,
        fuzzy: bool = False,
        fuzzy_mode: str = "correction",
        exclude_terms=None,
        post_rescore: bool = False,
        geo_filters: dict | None = None,
        distance_weight: float = 0.0,
        sort: tuple | None = None,
        merge_tokens: bool = False,
        use_wand: bool = False,
        result_fields=None,
        enable_suggestions: bool = False,
        near_distance: int = 10,
        slop: int = 0,
        in_fields=None,
        min_should_match: int = 1,
        term_boosts: dict | None = None,
        dismax: bool = False,
        tie_breaker: float = 0.0,
        rank_column: str | None = None,
        rank_weight: float = 0.0,
        rank_mode: str = "add",
        decay_column: str | None = None,
        decay_origin: float = 0.0,
        decay_scale: float = 0.0,
        decay_offset: float = 0.0,
        negative_terms=None,
        negative_boost: float = 0.5,
        restrict_ids=None,
    ) -> pa.Table:
        limit = min(int(limit), MAX_RESULTS)
        # ---- query cache (reference QueryCache §2.3: TTL + LRU, keyed on
        # the index's mutation version so writes invalidate) ----
        cache_key = None
        if self._cache_ttl > 0:
            cache_key = (query, limit, offset, mode,
                         tuple(sorted((field_weights or {}).items())),
                         repr(filters), language, min_score, normalize,
                         unique_by_route, route_column, prefix_last,
                         with_docs, highlight, round_scores, fuzzy,
                         fuzzy_mode, tuple(exclude_terms or ()), post_rescore, use_wand,
                         tuple(result_fields or ()),
                         repr(sort), repr(geo_filters), distance_weight,
                         merge_tokens, enable_suggestions, near_distance,
                         slop, tuple(in_fields or ()), min_should_match,
                         tuple(sorted((term_boosts or {}).items())),
                         dismax, tie_breaker,
                         rank_column, rank_weight, rank_mode,
                         decay_column, decay_origin, decay_scale,
                         decay_offset,
                         tuple(negative_terms or ()), negative_boost,
                         (None if restrict_ids is None
                          else tuple(np.sort(np.asarray(
                              restrict_ids, np.uint64)).tolist())),
                         self.index.mutation_version)
            hit = self._result_cache.get(cache_key)
            if hit is not None:
                import time as _time

                expiry, table = hit
                if _time.time() < expiry:
                    self._result_cache.move_to_end(cache_key)
                    self._cache_hits += 1
                    return table
                del self._result_cache[cache_key]
            self._cache_misses += 1
            if self._persistent is not None:
                # cross-process tier: the version is already the last
                # element of cache_key, so a mutated index never hits
                import time as _time

                pt = self._persistent.get(
                    self._index_name, {"key": repr(cache_key)},
                    version=cache_key[-1])
                if pt is not None:
                    self._result_cache[cache_key] = (
                        _time.time() + self._cache_ttl, pt)
                    return pt
        weights = self._field_weight_vector(field_weights or self.default_weights)
        orig_terms: list[str] = []
        query, term_boosts = self._parse_boost_syntax(query, term_boosts)
        if merge_tokens and not fuzzy:
            query = self._merge_adjacent_tokens(query)
        if fuzzy:
            cq, orig_terms = self._compile_fuzzy(query, fuzzy_mode)
        else:
            cq = compile_query(query, self.analyzer, mode=mode,
                               prefix_last=prefix_last,
                               near_distance=near_distance)
        if slop > 0:
            # sloppy phrase (ordered proximity) — applies to the
            # multi-term phrase components; singles are unaffected
            for ph in cq.phrases:
                if len(ph.terms) > 1 and not ph.prefix:
                    ph.slop = int(slop)
        if in_fields:
            if mode == "smart" and cq.near_terms:
                raise ValueError(
                    "in_fields requires mode in {'and','or','phrase'} — "
                    "the smart-mode NEAR arm is not field-restrictable")
            names = [f[0] for f in self.index.fields]
            unknown = [f for f in in_fields if f not in names]
            if unknown:
                raise KeyError(f"unknown index fields: {unknown}")
            cq.fields = frozenset(names.index(f) for f in in_fields)
        if int(min_should_match) > 1:
            if mode != "or" or fuzzy:
                raise ValueError(
                    "min_should_match requires mode='or' without fuzzy — "
                    "other modes fix their own match-set semantics")
            cq.min_should_match = int(min_should_match)
        if term_boosts:
            # query-time term boosts (Lucene `term^2`): multiply the
            # matching single-term arm's BM25 contribution.  or/and only:
            # smart mode's NEAR arm re-scores member terms through a
            # separate window-filtered kernel that must stay FTS5-pinned.
            if mode not in ("or", "and") or fuzzy:
                raise ValueError(
                    "term_boosts requires mode in {'or','and'} without fuzzy")
            if any(b <= 0 for b in term_boosts.values()):
                raise ValueError("term boosts must be > 0")
            for ph in cq.phrases:
                if len(ph.terms) == 1 and ph.terms[0] in term_boosts:
                    ph.boost = float(term_boosts[ph.terms[0]])
        if dismax:
            # dis_max combines OR arms by max; other modes either have a
            # single arm (phrase) or conjunction semantics where ES
            # defines no dis_max analogue — keep the surface honest.
            if mode != "or" or fuzzy:
                raise ValueError("dismax requires mode='or' without fuzzy")
            if not (0.0 <= float(tie_breaker) <= 1.0):
                raise ValueError("tie_breaker must be in [0, 1]")
            cq.dismax, cq.tie_breaker = True, float(tie_breaker)
        if exclude_terms:
            for x in exclude_terms:
                g = self.analyzer.match_terms(x)
                for sub in g:
                    cq.exclude.append(Phrase(sub))
        if self.synonyms and not fuzzy:
            extra = self._expand_synonyms(
                [ph.terms for ph in cq.phrases if len(ph.terms) == 1])
            for g in extra:
                ph = Phrase(g)
                cq.phrases.append(ph)
                if cq.any_of:
                    cq.any_of.append(ph)
        if not cq.phrases:
            return self._empty_result(with_docs)
        # WAND stays OPT-IN: round 4 flipped it to auto-default,
        # measured the bench battery on the 50k sf0.1 index, and
        # reverted on the data - the pure-Python doc-at-a-time loop
        # measured p50 163 ms vs 5.7 ms for the vectorized numpy scan
        # (28x; p95 428 vs 26 ms) because this corpus's df ~ 0.7N gives
        # WAND nothing to skip while the scan streams contiguous
        # arrays.  WAND remains the right serving shape when cursors
        # stream from disk/compressed blocks (the 100 TB path); rank
        # identity with the scan is property-pinned in tests/test_wand.
        wand_on = bool(use_wand)
        # Any post-scoring rank modifier (decay, rank blend, negative-
        # term boosting, span constraint, id allowlist, distance blend)
        # re-orders or prunes AFTER BM25, so WAND's top-(offset+limit)
        # truncation would hand it an incomplete candidate set — those
        # shapes must take the exhaustive scan.
        rank_modified = (rank_column is not None or rank_weight != 0.0
                         or decay_column is not None
                         or bool(negative_terms) or bool(term_boosts)
                         or restrict_ids is not None
                         or distance_weight != 0.0 or slop != 0
                         or bool(in_fields) or enable_suggestions)
        if wand_on and not rank_modified and cq.fields is None \
                and cq.min_should_match == 1 \
                and not cq.dismax and not rank_column \
                and all(ph.boost == 1.0 for ph in cq.phrases) \
                and self._wand_eligible(
                cq, fuzzy=fuzzy, filters=filters,
                language=language, geo_filters=geo_filters,
                unique_by_route=unique_by_route,
                min_score=min_score, sort=sort,
                post_rescore=post_rescore):
            doc_ids, rank = self._wand_search(cq, weights, offset + limit)
        else:
            doc_ids, rank = self._score(cq, weights)
        if doc_ids.size and self.index.tombstones.size:
            live = ~np.isin(doc_ids, self.index.tombstones)
            doc_ids, rank = doc_ids[live], rank[live]
        if restrict_ids is not None and doc_ids.size:
            # ES `ids` / terms-by-_id filter (extension): prune the
            # match set to an explicit doc-id allowlist; scoring
            # (df/idf/dl) is unaffected, like exclude_terms.
            allow = np.asarray(restrict_ids, dtype=np.uint64)
            keep = np.isin(doc_ids, allow)
            doc_ids, rank = doc_ids[keep], rank[keep]
        if doc_ids.size:
            keep = self._apply_filters(doc_ids, filters, language)
            doc_ids, rank = doc_ids[keep], rank[keep]
        if rank_column and rank_weight and doc_ids.size:
            # static-rank doc boost (ES function_score
            # field_value_factor(log1p) shape, an extension): blend a
            # stored numeric column into the score BEFORE sorting.
            # add:      score += w * ln(1 + max(v, 0))
            # multiply: score *= 1 + w * ln(1 + max(v, 0))
            if rank_mode not in ("add", "multiply"):
                raise ValueError("rank_mode must be 'add' or 'multiply'")
            vals = self.index.meta_for(rank_column, doc_ids)
            f = np.log1p(np.maximum(np.asarray(vals, np.float64), 0.0))
            s = np.abs(rank)
            s = (s * (1.0 + rank_weight * f) if rank_mode == "multiply"
                 else s + rank_weight * f)
            rank = -s
        if decay_column and decay_scale > 0 and doc_ids.size:
            # ES function_score gauss decay (extension): multiply the
            # score by exp(-max(0, |v-origin|-offset)^2 / (2*scale^2))
            # over the FULL match set, BEFORE sorting/pagination, so
            # decay can promote docs from outside the BM25 page.
            vals = np.asarray(self.index.meta_for(decay_column, doc_ids),
                              np.float64)
            d = np.maximum(
                np.abs(vals - float(decay_origin)) - float(decay_offset),
                0.0)
            rank = -(np.abs(rank)
                     * np.exp(-(d * d) / (2.0 * float(decay_scale) ** 2)))
        if negative_terms and doc_ids.size:
            # ES `boosting` query (extension): docs matching ANY of the
            # negative terms keep their positive score multiplied by
            # negative_boost — a demotion, never an exclusion.  Applied
            # over the FULL match set BEFORE sorting/pagination, so a
            # demoted doc can fall out of (and a clean doc rise into)
            # the page, exactly like the decay multiplier above.
            neg = np.zeros(doc_ids.size, dtype=bool)
            for nt in negative_terms:
                ids = self.match_ids(str(nt), mode="or")
                if ids.size:
                    neg |= np.isin(doc_ids, ids)
            s = np.abs(rank)
            s[neg] *= float(negative_boost)
            rank = -s
        distances = None
        if geo_filters and doc_ids.size:
            doc_ids, rank, distances = self._apply_geo(doc_ids, rank, geo_filters)
        # ORDER BY rank ASC, doc_id ASC  (reference :1096) — or an explicit
        # column sort (reference :1106-1128: direct/metadata columns)
        if sort is not None and doc_ids.size:
            col, direction = (sort if isinstance(sort, (tuple, list))
                              else (sort, "asc"))
            vals = self.index.meta_for(col, doc_ids)
            key = np.argsort(vals, kind="stable")
            if str(direction).lower().startswith("desc"):
                key = key[::-1]
            order = key
        else:
            order = np.lexsort((doc_ids, rank))
        doc_ids, rank = doc_ids[order], rank[order]
        if distances is not None:
            distances = distances[order]
            if geo_filters.get("sort_by_distance"):
                # reference two-phase fallback (:1086-1098,:1237-1262):
                # widen candidates by rank, then re-sort by distance
                widen = int(np.clip(limit * 20, 200, 1000))
                doc_ids, rank = doc_ids[:widen], rank[:widen]
                distances = distances[:widen]
                o2 = np.lexsort((doc_ids, distances))
                doc_ids, rank, distances = doc_ids[o2], rank[o2], distances[o2]
        # widen before dedup (reference widens to max_results :129-137);
        # post_rescore must keep the full clamp(limit*20, 200, 2000)
        # candidate pool alive so rescoring can promote docs from outside
        # the final page (reference :901-913) — truncate only afterwards.
        if unique_by_route or fuzzy:
            page_n = MAX_RESULTS
        elif post_rescore:
            page_n = max(offset + limit, int(np.clip(limit * 20, 200, 2000)))
        else:
            page_n = offset + limit
        doc_ids, rank = doc_ids[:page_n], rank[:page_n]
        score = np.abs(rank)
        if distances is not None:
            distances = distances[: doc_ids.size]
        # min_score on abs score (processResults :717-729)
        if min_score > 0:
            keep = score >= min_score
            doc_ids, rank, score = doc_ids[keep], rank[keep], score[keep]
            if distances is not None:
                distances = distances[keep]
        if post_rescore and doc_ids.size:
            # candidate widening then PHP-style rescore + resort
            # (reference :901-913, :1226-1234: clamp(limit·20, 200, 2000))
            widen = int(np.clip(limit * 20, 200, 2000))
            doc_ids, score = doc_ids[:widen], score[:widen]
            terms = [t for ph in cq.phrases for t in ph.terms][:8]
            score = self._field_weighted_rescore(
                doc_ids, score, terms,
                field_weights or self.default_weights or {})
            order = np.lexsort((doc_ids, -score))
            doc_ids, score = doc_ids[order], score[order]
            rank = -score
        if fuzzy and doc_ids.size and orig_terms:
            score = self._apply_fuzzy_penalty(doc_ids, score, orig_terms)
            order = np.lexsort((doc_ids, -score))  # re-sort after penalty
            doc_ids, score = doc_ids[order], score[order]
            rank = -score
        if unique_by_route and route_column:
            doc_ids, score = self._dedup_by_route(doc_ids, score, route_column)
            rank = -score
            distances = None  # representative rows reordered
        # page slice
        doc_ids = doc_ids[offset : offset + limit]
        score = score[offset : offset + limit]
        if distances is not None:
            distances = distances[offset : offset + limit]
        # normalize 0-100 by max in page (quirk preserved: per-page max)
        if normalize and score.size:
            m = score.max()
            if m > 0:
                score = score / m * 100.0
        # distance blend (§2.9 step 5): after normalization, then re-sort
        # the page by the blended score
        if distances is not None and distance_weight > 0 and score.size:
            from ..functions.geo import distance_blend

            score = distance_blend(score, distances, weight=distance_weight)
            o3 = np.lexsort((doc_ids, -score))
            doc_ids, score, distances = doc_ids[o3], score[o3], distances[o3]
        if round_scores is not None:
            score = np.round(score, round_scores)
        cols = {"doc_id": pa.array(doc_ids, pa.uint64()),
                "score": pa.array(score, pa.float64())}
        if distances is not None:
            cols["distance_km"] = pa.array(np.round(distances, 4), pa.float64())
        out = pa.table(cols)
        if with_docs or highlight:
            docs = self.index.docs(doc_ids)
            # join in doc_id order
            dt = docs.to_pandas().set_index(self.index.id_column).loc[doc_ids.tolist()]
            cols_wanted = (list(result_fields) if result_fields
                           else list(dt.columns))
            if highlight:
                body = self.index.fields[-1][1]
                if body not in cols_wanted and body in dt.columns:
                    cols_wanted.append(body)
            for c in cols_wanted:
                if c in dt.columns and (result_fields is None or c in result_fields
                                        or not highlight):
                    out = out.append_column(c, pa.array(dt[c].tolist()))
            if highlight:
                terms = [t for ph in cq.phrases for t in ph.terms]
                body_col = self.index.fields[-1][1]
                snips = [make_snippet(s, terms) for s in dt[body_col].tolist()]
                out = out.append_column("highlight", pa.array(snips, pa.string()))
        if enable_suggestions and out.num_rows == 0:
            # reference attaches a did-you-mean to empty result sets
            # (SearchEngine.php:238-249 -> generateSuggestion); the Arrow
            # mapping is schema metadata on the (empty) result table
            sug = self.suggest(query)
            if sug.num_rows:
                out = out.replace_schema_metadata(
                    {b"suggestion": sug["suggestion"][0].as_py().encode()})
        if cache_key is not None:
            import time as _time

            self._result_cache[cache_key] = (_time.time() + self._cache_ttl, out)
            if len(self._result_cache) > self._cache_max:
                self._result_cache.popitem(last=False)
            if self._persistent is not None:
                self._persistent.set(
                    self._index_name, {"key": repr(cache_key)}, out,
                    ttl=int(self._cache_ttl), version=cache_key[-1])
        return out

    def _merge_adjacent_tokens(self, query: str) -> str:
        """tryMergeTokens (reference :1539-1592): merge adjacent query
        tokens when the concatenation is a known index term
        ("search engine" -> "searchengine" when that identifier exists)."""
        toks = self.analyzer.analyze(query)
        if len(toks) < 2:
            return query
        d = self.fuzzy_matcher.dict
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i] + toks[i + 1]) in d:
                out.append(toks[i] + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return " ".join(out)

    # ---------------- block-max WAND ----------------------------------
    def _wand_eligible(self, cq, *, fuzzy, filters, language, geo_filters,
                       unique_by_route, min_score, sort, post_rescore) -> bool:
        return (
            not fuzzy and not filters and not language and not geo_filters
            and not unique_by_route and min_score == 0 and sort is None
            and not post_rescore and not cq.exclude
            and self.index.tombstones.size == 0
            and cq.mode in ("or", "smart")
            and all(len(p.terms) == 1 and not p.prefix for p in cq.phrases)
        )

    def _wand_search(self, cq, weights: np.ndarray, k: int):
        """Top-k via block-max WAND over the term cursors — exact same
        result as the full scan (see wand.py).  OPT-IN (`use_wand=True`):
        the document-at-a-time loop is pure Python, so on in-memory
        decoded postings the numpy full scan is faster at moderate df;
        WAND is the right serving shape when cursors stream from disk /
        compressed blocks where skipping avoids IO + decode."""
        from .bm25 import idf as _idf_fn
        from .wand import TermCursor, wand_topk

        N = self.index.n_docs
        cursors = []
        for ph in cq.phrases:
            posts = self._term_postings(ph.terms[0])
            if not posts:
                continue
            arrs = [p.doc_ids for p in posts.values()]
            union = np.unique(np.concatenate(arrs))
            tfw = np.zeros(union.size, dtype=np.float64)
            for fid, p in posts.items():
                idx = np.clip(np.searchsorted(p.doc_ids, union), 0,
                              max(p.doc_ids.size - 1, 0))
                present = p.doc_ids[idx] == union
                tfw += np.where(present, p.tfs[idx].astype(np.float64), 0.0) * weights[fid]
            cursors.append(TermCursor(union, tfw, _idf_fn(N, int(union.size))))
        if not cursors:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        docs, scores = wand_topk(cursors, self.index.dl_total_for,
                                 self.index.avgdl, k)
        return docs, -scores  # rank = negated (all idfs ≥ 1e-6 → positive)

    # ---------------- geo ---------------------------------------------
    def _apply_geo(self, doc_ids, rank, geo_filters: dict):
        """Geo filters over candidate metadata (reference near/within,
        :2128-2201): ``near {lat, lng, radius_km}`` = bbox prefilter +
        haversine radius; ``within {bounds: (min_lat, max_lat, min_lng,
        max_lng)}``.  Lat/lng come from docstore metadata columns
        (default ``lat``/``lng``)."""
        from ..functions.geo import haversine_km, in_bounds, near_mask

        lat_col = geo_filters.get("lat_column", "lat")
        lng_col = geo_filters.get("lng_column", "lng")
        lats = self.index.meta_for(lat_col, doc_ids).astype(np.float64)
        lngs = self.index.meta_for(lng_col, doc_ids).astype(np.float64)
        distances = None
        mask = np.ones(doc_ids.size, dtype=bool)
        near = geo_filters.get("near")
        if near:
            mask &= near_mask(lats, lngs, near["lat"], near["lng"],
                              near["radius_km"])
            distances = haversine_km(lats, lngs, near["lat"], near["lng"])
        within = geo_filters.get("within")
        if within:
            mask &= in_bounds(lats, lngs, within["bounds"])
        ref = geo_filters.get("distance_from") or near
        if distances is None and ref:
            distances = haversine_km(lats, lngs, ref["lat"], ref["lng"])
        doc_ids, rank = doc_ids[mask], rank[mask]
        if distances is not None:
            distances = distances[mask]
        return doc_ids, rank, distances

    # ---------------- fuzzy -------------------------------------------
    def _compile_fuzzy(self, query: str, fuzzy_mode: str):
        """Fuzzy query compilation (reference ``processQuery`` :394-654).

        correction (default): replace each token with its best correction
        and emit an implicit-AND expression (:549-562).
        expansion: (smart shape over exact terms) OR (variations) — the
        budget is ``fuzzy_total_max_variations`` (:563-614).
        """
        fm = self.fuzzy_matcher
        groups = self.analyzer.match_terms(query)
        terms = [t for g in groups for t in g]
        if not terms:
            return CompiledQuery(mode="and"), []
        if fuzzy_mode == "correction":
            # corrected tokens compose as an implicit-AND expression
            # (:549-562 — "Multiple terms - search for all of them
            # (implicit AND in FTS5)"); the reference's own PHPUnit
            # (EnhancedFuzzySearchTest::testMultipleTypoCorrection) pins
            # this: an uncorrectable token DOES veto the query (0 rows),
            # which is also why the benchmark's "Teh Matrix" case fails
            # under trigram (teh→the is below the trigram threshold) —
            # parity, not a bug
            corrected: list[str] = []
            for t in terms:
                c = fm.find_best_correction(t)
                corrected.extend((c or t).split())
            phs = [Phrase([t]) for t in corrected]
            return CompiledQuery(mode="and", phrases=phs, required=phs), terms
        # expansion mode
        cq = compile_query(" ".join(terms), self.analyzer, mode="smart")
        budget = fm.total_max_variations
        for t in terms:
            if budget <= 0:
                break
            vars_ = fm.variations(t)[: min(fm.max_variations, budget)]
            budget -= len(vars_)
            for v in vars_:
                ph = Phrase(v.split())
                cq.phrases.append(ph)
                cq.any_of.append(ph)
        return cq, terms

    def _apply_fuzzy_penalty(self, doc_ids, score, orig_terms):
        """Penalty layer (§2.9 step 4): per-candidate match quality vs the
        ORIGINAL query terms decides the multiplier."""
        from .fuzzy import fuzzy_penalty

        n_present = np.zeros(doc_ids.size, dtype=np.int64)
        for t in orig_terms:
            posts = self._term_postings(t)
            present = np.zeros(doc_ids.size, dtype=bool)
            for p in posts.values():
                if p.doc_ids.size == 0:
                    continue
                idx = np.clip(np.searchsorted(p.doc_ids, doc_ids), 0,
                              p.doc_ids.size - 1)
                present |= p.doc_ids[idx] == doc_ids
            n_present += present
        # exact-phrase presence (only meaningful for multi-term queries)
        phrase_present = np.zeros(doc_ids.size, dtype=bool)
        if len(orig_terms) > 1:
            pp = self._phrase_postings(Phrase(list(orig_terms)))
            for p in pp.values():
                if p.doc_ids.size == 0:
                    continue
                idx = np.clip(np.searchsorted(p.doc_ids, doc_ids), 0,
                              p.doc_ids.size - 1)
                phrase_present |= p.doc_ids[idx] == doc_ids
        nt = max(1, len(orig_terms))
        penalties = np.fromiter(
            (fuzzy_penalty(bool(phrase_present[i]),
                           n_present[i] == nt,
                           n_present[i] / nt)
             for i in range(doc_ids.size)),
            np.float64, doc_ids.size,
        )
        return score * (1.0 - penalties)

    def suggest(self, query: str, *, limit: int = 5) -> pa.Table:
        """Did-you-mean (reference ``SearchEngine::suggest`` :2215-2373):
        per-token correction, verified to have hits, with confidence."""
        tokens = [t for g in self.analyzer.match_terms(query) for t in g]
        if not tokens:
            return pa.table({"suggestion": pa.array([], pa.string()),
                             "confidence": pa.array([], pa.float64()),
                             "count": pa.array([], pa.int64())})
        corrected, conf, changed = self.fuzzy_matcher.suggest_tokens(tokens)
        suggestion = " ".join(corrected)
        if not changed:
            return pa.table({"suggestion": pa.array([], pa.string()),
                             "confidence": pa.array([], pa.float64()),
                             "count": pa.array([], pa.int64())})
        # the reference verifies the composed suggestion with a DEFAULT
        # (smart) SearchQuery count, not an AND (SearchEngine.php:2254)
        n = self.count(suggestion)
        if n == 0:
            return pa.table({"suggestion": pa.array([], pa.string()),
                             "confidence": pa.array([], pa.float64()),
                             "count": pa.array([], pa.int64())})
        return pa.table({"suggestion": pa.array([suggestion], pa.string()),
                         "confidence": pa.array([round(conf, 4)], pa.float64()),
                         "count": pa.array([n], pa.int64())})

    def _dedup_by_route(self, doc_ids, score, route_column):
        """Reference dedup: group by route; composite = SUM of chunk scores;
        representative = best chunk; rows without route pass through
        (``SearchEngine::deduplicateByRoute`` :1112-1169)."""
        routes = self.index.meta_for(route_column, doc_ids)
        best: dict = {}
        passthrough = []
        for i, r in enumerate(routes):
            if r is None or r == "":
                passthrough.append(i)
                continue
            cur = best.get(r)
            if cur is None:
                best[r] = [i, float(score[i])]
            else:
                cur[1] += float(score[i])
                if score[i] > score[cur[0]]:
                    cur[0] = i
        items = [(doc_ids[i], s) for i, s in best.values()] + [
            (doc_ids[i], float(score[i])) for i in passthrough
        ]
        items.sort(key=lambda t: (-t[1], t[0]))
        if not items:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        ids = np.asarray([d for d, _ in items], np.uint64)
        sc = np.asarray([s for _, s in items], np.float64)
        return ids, sc

    # ---------------- field-weighted post-rescore (§2.9 step 2) --------
    _PRIMARY_FIELDS = {"title", "h1", "name", "label", "path"}

    def _field_weighted_rescore(self, doc_ids, base_score, terms,
                                field_weights: dict[str, float]):
        """The reference's PHP rescoring layer
        (``calculateFieldWeightedScore``, ``SqliteStorage.php:2472-2658``):
        per candidate, the best per-field match tier (exact field 100 /
        exact phrase 50 / all-terms 20 / partial 5·ratio), weighted and
        blended into the BM25 base as
        ``base · (1 + (best/10)^1.5 · tier_mult)``."""
        if doc_ids.size == 0 or not terms:
            return base_score
        cols = [self.index.id_column] + [c for _, c in self.index.fields]
        docs = self.index.docs(doc_ids, columns=cols)
        dt = docs.to_pandas().set_index(self.index.id_column)
        dt = dt.loc[[int(d) for d in doc_ids]]
        phrase = " ".join(terms)
        out = base_score.copy()
        for i in range(doc_ids.size):
            best = 0.0
            tier_mult = 2.0
            for fname, col in self.index.fields:
                text = str(dt[col].iloc[i] or "").lower()
                w = float(field_weights.get(fname, 1.0))
                primary = 2.0 if (fname in self._PRIMARY_FIELDS or w >= 5) else 1.0
                s, tm = 0.0, 2.0
                if text == phrase:
                    s, tm = 100.0, 10.0
                elif phrase in text and len(terms) > 1:
                    ratio = len(phrase) / max(1, len(text))
                    s = 50.0 + (20.0 if ratio > 0.5 else 10.0 * ratio)
                    tm = 10.0
                else:
                    present = [t for t in terms if t in text]
                    if len(present) == len(terms):
                        s, tm = 20.0, 5.0
                        pos = [text.find(t) for t in terms]
                        gap = max(pos) - min(pos)
                        if gap < 50:
                            s += 10.0 * (1.0 - gap / 50.0)
                        stripped = "".join(ch for ch in text if ch.isalnum() or ch == " ")
                        if set(stripped.split()) == set(terms):
                            s += 30.0
                    elif present:
                        s, tm = 5.0 * len(present) / len(terms), 2.0
                s *= w * primary
                if s > best:
                    best, tier_mult = s, tm
            if best > 0:
                out[i] = base_score[i] * (1.0 + (best / 10.0) ** 1.5 * tier_mult)
        return out

    def search_two_pass(self, query: str, *, limit: int = 20,
                        field_weights: dict[str, float] | None = None,
                        primary_boost: float = 1.5, **kwargs) -> pa.Table:
        """Two-pass precision mode (reference :139-203): pass 1 over
        primary fields with doubled weights (limit 100), pass 2 full;
        merge primary-first with a ×boost, dedup by id, sort, slice."""
        fw = dict(field_weights or self.default_weights or {})
        primary_fw = {
            f: fw.get(f, 1.0) * 2.0
            for f, _ in self.index.fields
            if f in self._PRIMARY_FIELDS or fw.get(f, 1.0) >= 5
        }
        p1 = self.search(query, limit=100, field_weights={**fw, **primary_fw},
                         normalize=False, **kwargs)
        p2 = self.search(query, limit=max(100, limit), field_weights=fw or None,
                         normalize=False, **kwargs)
        import pandas as pd

        d1 = p1.to_pandas()
        d1["score"] = d1["score"] * primary_boost
        d2 = p2.to_pandas()
        merged = pd.concat([d1, d2]).drop_duplicates("doc_id", keep="first")
        merged = merged.sort_values(["score", "doc_id"],
                                    ascending=[False, True]).head(limit)
        return pa.Table.from_pandas(merged.reset_index(drop=True),
                                    preserve_index=False)

    def facets(self, query: str, facet_fields, *, candidates: int = 1000,
               min_count: int = 1, top_n: int = 10,
               **search_kwargs) -> dict[str, pa.Table]:
        """Facet value counts over the match set — reference semantics
        preserved (``computeFacets`` :1187-1307): counts come from the
        TOP-``candidates`` (1000) results only, min_count filter, count
        desc, top-N."""
        r = self.search(query, limit=candidates, normalize=False,
                        **search_kwargs)
        ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out: dict[str, pa.Table] = {}
        for field in facet_fields:
            try:
                vals = self.index.meta_for(field, ids)
            except KeyError:
                docs = self.index.docs(ids, columns=[self.index.id_column, field])
                vals = docs[field].to_numpy(zero_copy_only=False)
            import pandas as pd

            counts = pd.Series(vals).value_counts()
            counts = counts[counts >= min_count]
            df = counts.reset_index()
            df.columns = ["value", "count"]
            df["value"] = df["value"].astype(str)
            df = df.sort_values(["count", "value"],
                                ascending=[False, True]).head(top_n)
            out[field] = pa.Table.from_pandas(df.reset_index(drop=True),
                                              preserve_index=False)
        return out

    def numeric_facets(self, query: str, field: str, edges, *,
                       candidates: int = 1000,
                       **search_kwargs) -> pa.Table:
        """Histogram facet over a numeric metadata column of the match
    set — the range-facet counterpart of :meth:`facets` (same
        top-``candidates`` clamp as the reference's computeFacets; the
        distance-facet shape from ``facets_distance``, generalized to
        any numeric column).  ``edges`` are ascending bucket boundaries;
        row i counts matches with ``edges[i] <= v < edges[i+1]``
        (v = the column value), plus the standard open-ended last
        bucket ``v >= edges[-1]``.  Empty buckets are kept (count 0) so
        the histogram shape is stable across queries."""
        r = self.search(query, limit=candidates, normalize=False,
                        **search_kwargs)
        ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        edges = np.asarray(list(edges), dtype=np.float64)
        if edges.size < 1 or np.any(np.diff(edges) <= 0):
            raise ValueError("edges must be ascending and non-empty")
        try:
            vals = self.index.meta_for(field, ids)
        except KeyError:
            docs = self.index.docs(ids, columns=[self.index.id_column, field])
            vals = docs[field].to_numpy(zero_copy_only=False)
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        # bucket i = [edges[i], edges[i+1]); values below edges[0] drop
        idx = np.searchsorted(edges, v, side="right") - 1
        counts = np.bincount(idx[idx >= 0], minlength=edges.size)
        los = edges
        his = np.append(edges[1:], np.inf)
        return pa.table({
            "lo": pa.array(los, pa.float64()),
            "hi": pa.array(his, pa.float64()),
            "count": pa.array(counts.astype(np.int64), pa.int64()),
        })

    def distance_facets(self, query: str, center: dict, thresholds,
                        *, candidates: int = 1000, **kwargs) -> pa.Table:
        """Distance-bucket facets (reference :1193-1258): count matches per
        radius threshold around a center point."""
        from ..functions.geo import haversine_km

        if query.strip() in ("", "*"):
            # geo-only facets (reference CLI facets-distance passes query
            # '', bin/yetisearch:200-218): bucket ALL live docs
            ids = self.index.meta(self.index.id_column).astype(np.uint64)
            if self.index.tombstones.size:
                ids = ids[~np.isin(ids, self.index.tombstones)]
        else:
            r = self.search(query, limit=candidates, normalize=False, **kwargs)
            ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lats = self.index.meta_for(center.get("lat_column", "lat"), ids)
        lngs = self.index.meta_for(center.get("lng_column", "lng"), ids)
        d = haversine_km(lats.astype(np.float64), lngs.astype(np.float64),
                         center["lat"], center["lng"])
        labels, counts = [], []
        for th in sorted(thresholds):
            labels.append(f"<{th}km")
            counts.append(int((d <= th).sum()))
        return pa.table({"bucket": pa.array(labels, pa.string()),
                         "count": pa.array(counts, pa.int64())})

    def aggregate(self, query: str, aggregations: dict, *,
                  candidates: int = 1000, **kwargs) -> pa.Table:
        """Numeric aggregations over the match set — honoring the API the
        reference documents but stubs out (``README:1382-1396``,
        ``SearchEngine.php:1309-1314`` returns []).  ``aggregations`` maps
        column -> list of ops in {avg, min, max, sum, count}."""
        r = self.search(query, limit=candidates, normalize=False, **kwargs)
        ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = {"aggregation": [], "value": []}
        for field, ops in aggregations.items():
            vals = self.index.meta_for(field, ids).astype(np.float64)
            for op in ops:
                fn = {"avg": np.mean, "min": np.min, "max": np.max,
                      "sum": np.sum, "count": np.size}[op]
                cols["aggregation"].append(f"{op}_{field}")
                cols["value"].append(float(fn(vals)) if ids.size else 0.0)
        return pa.table({"aggregation": pa.array(cols["aggregation"], pa.string()),
                         "value": pa.array(cols["value"], pa.float64())})

    def knn(self, center: dict, k: int = 10) -> pa.Table:
        """Geo k-NN fast path (reference :916-989): ignore text, nearest
        ``k`` docs by haversine distance, optional max_distance clamp."""
        from ..functions.geo import haversine_km

        k = min(int(k), MAX_RESULTS)
        ids = self.index.meta(self.index.id_column)
        lats = self.index.meta(center.get("lat_column", "lat")).astype(np.float64)
        lngs = self.index.meta(center.get("lng_column", "lng")).astype(np.float64)
        d = haversine_km(lats, lngs, center["lat"], center["lng"])
        if center.get("max_distance_km") is not None:
            keep = d <= center["max_distance_km"]
            ids, d = ids[keep], d[keep]
        if self.index.tombstones.size:
            keep = ~np.isin(ids, self.index.tombstones)
            ids, d = ids[keep], d[keep]
        order = np.lexsort((ids, d))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order].astype(np.uint64), pa.uint64()),
            "distance_km": pa.array(np.round(d[order], 4), pa.float64()),
        })

    def more_like_this(self, doc_id: int, *, limit: int = 10,
                       max_terms: int = 10, mode: str = "or",
                       language: str | None = None,
                       normalize: bool = True, **kwargs) -> pa.Table:
        """Find documents similar to ``doc_id`` (Lucene/Elasticsearch
        "more like this" shape — an extension beyond the reference's
        query classes, built entirely from its primitives).

        Selection: the source doc's stored indexed fields are
        re-tokenized with the INDEX tokenizer (exactly what the build
        saw), each distinct term weighted ``tf * ln(N / df)`` with df
        the union-of-fields document frequency (same definition the
        BM25 idf uses); terms the query compiler would drop (stopwords,
        length outside the analyzer's 2..50 window) are excluded since
        they could never score.  The top ``max_terms`` (weight DESC,
        term ASC — deterministic) run as one OR query through the
        normal search path; the source doc is removed from the result.

        Raises KeyError if the doc is unknown and ValueError if the
        index does not store its indexed source columns (MLT needs the
        original text).
        """
        from collections import Counter

        from ..analysis.tokenizer import tokenize as _index_tok

        cfg = self.index.manifest.data.get("config") or {}
        src_cols = [f[1] for f in cfg.get("fields", [])]
        stored = set(cfg.get("store_columns") or [])
        missing = [c for c in src_cols if c not in stored]
        if missing:
            raise ValueError(
                f"more_like_this needs stored source columns; not in "
                f"docstore: {missing}")
        t = self.index.docs([doc_id], columns=src_cols)
        if t.num_rows == 0:
            raise KeyError(f"doc_id {doc_id} not found")
        tf: Counter = Counter()
        for c in src_cols:
            tf.update(_index_tok(t[c][0].as_py() or ""))

        N = max(self.index.n_docs, 1)
        scored: list[tuple[float, str]] = []
        for term, f in tf.items():
            # keep only terms the query compiler would keep, verbatim
            if self.analyzer.match_terms(term) != [[term]]:
                continue
            posts = self._term_postings(term)
            arrs = [p.doc_ids for p in posts.values()]
            df = int(np.unique(np.concatenate(arrs)).size) if arrs else 0
            if df <= 0:
                continue
            # rounded so the DuckDB oracle's ln() agrees on ties
            scored.append((-round(f * math.log(N / df), 9), term))
        scored.sort()
        terms = [term for _, term in scored[:max_terms]]
        if not terms:
            return self._empty_result(False)

        res = self.search(" ".join(terms), mode=mode, limit=limit + 1,
                          normalize=normalize, language=language, **kwargs)
        keep = pc.not_equal(res["doc_id"],
                            pa.scalar(int(doc_id), pa.uint64()))
        return res.filter(keep).slice(0, limit)

    def search_lm(self, query: str, *, limit: int = 20, mu: float = 2000.0,
                  round_to: int = 5) -> pa.Table:
        """Query-likelihood ranking with Dirichlet smoothing (the
        Elasticsearch ``LMDirichlet`` similarity; a second ranking
        function beside the reference's FTS5 BM25,
        ``src/Storage/SqliteStorage.php:993-1015``):

            score(d) = sum_t ln( (tf_td + mu * cf_t / C) / (dl_d + mu) )

        over the query's OR match set, where ``tf_td`` is the doc's
        UNWEIGHTED any-field term count, ``cf_t`` the collection term
        count, ``C`` the total token count of the corpus, and ``dl_d``
        the unweighted doc length — absent terms contribute the pure
        smoothing mass, so the sum runs over every query term.  Terms
        with ``cf_t = 0`` are dropped (zero probability mass).  Rows
        ``(doc_id, score)`` with score = round(-total, round_to)
        ascending best-first (log-likelihoods are negative; smaller
        magnitude = better), ties doc_id ASC."""
        cq = compile_query(query, self.analyzer, mode="or")
        terms = [p.terms[0] for p in cq.phrases]
        if not terms:
            return pa.table({"doc_id": pa.array([], pa.uint64()),
                             "score": pa.array([], pa.float64())})
        C = float(self.index.manifest.stats.get("total_dl") or
                  (self.index.n_docs * self.index.avgdl))
        per_term = []
        match: np.ndarray | None = None
        for t in terms:
            posts = self._term_postings(t)
            if not posts:
                continue
            ids = np.unique(np.concatenate(
                [p.doc_ids for p in posts.values()]))
            tfs = np.zeros(ids.size, dtype=np.float64)
            for p in posts.values():
                at = np.searchsorted(ids, p.doc_ids)
                tfs[at] += p.tfs.astype(np.float64)
            cf = float(tfs.sum())
            per_term.append((ids, tfs, cf))
            match = ids if match is None else np.union1d(match, ids)
        if match is None or match.size == 0:
            return pa.table({"doc_id": pa.array([], pa.uint64()),
                             "score": pa.array([], pa.float64())})
        dl = self.index.dl_total_for(match).astype(np.float64)
        denom = np.log(dl + mu)
        total = np.zeros(match.size, dtype=np.float64)
        for ids, tfs, cf in per_term:
            tf_d = np.zeros(match.size, dtype=np.float64)
            at = np.searchsorted(match, ids)
            tf_d[at] = tfs
            total += np.log(tf_d + mu * cf / C) - denom
        # (log-likelihood DESC, doc_id ASC): lexsort's last key is primary
        top = np.lexsort((match, -total))[:limit]
        return pa.table({
            "doc_id": pa.array(match[top], pa.uint64()),
            "score": pa.array(np.round(-total[top], round_to), pa.float64()),
        })

    def explain_score(self, doc_id: int, query: str, *,
                      field_weights: dict | None = None,
                      round_to: int = 5) -> pa.Table:
        """Per-term BM25 score breakdown for one (doc, query) pair —
        the Elasticsearch ``_explain`` shape (an introspection
        extension; the reference exposes only the final ``abs(rank)``,
        ``src/Storage/SqliteStorage.php:993-1015``).

        The query is compiled in OR mode and each single-term arm
        reports ``(term, tf, df, idf, contrib)``: ``tf`` the
        column-weight-summed term frequency in the doc, ``df`` the
        any-column docfreq, ``idf`` the floor-clamped FTS5 idf, and
        ``contrib`` the arm's BM25 addend — summing ``contrib`` over
        rows reproduces the doc's OR-mode score exactly.  Terms absent
        from the doc are omitted (they contribute 0).  Rows sorted by
        term.  Raises ValueError on phrase/NEAR queries (window-kernel
        arms have no per-term decomposition) and KeyError for an
        unknown doc."""
        from .bm25 import bm25_term_score, idf as _idf

        cq = compile_query(query, self.analyzer, mode="or")
        if cq.near_terms or any(len(p.terms) != 1 for p in cq.phrases):
            raise ValueError(
                "explain_score decomposes single-term OR arms only")
        if self.index.docs([doc_id]).num_rows == 0:
            raise KeyError(f"doc_id {doc_id} not found")
        weights = self._field_weight_vector(field_weights)
        ids = np.asarray([doc_id], dtype=np.uint64)
        dl = float(self.index.dl_total_for(ids)[0])
        N, avgdl = self.index.n_docs, self.index.avgdl
        rows = []
        for ph in cq.phrases:
            term = ph.terms[0]
            posts = self._term_postings(term)
            if not posts:
                continue
            arrs = [p.doc_ids for p in posts.values()]
            df = int(np.unique(np.concatenate(arrs)).size)
            tfw = 0.0
            for fid, p in posts.items():
                at = np.searchsorted(p.doc_ids, ids[0])
                if at < p.doc_ids.size and p.doc_ids[at] == ids[0]:
                    tfw += float(weights[fid]) * float(p.tfs[at])
            if tfw <= 0:
                continue
            tidf = _idf(N, df)
            contrib = float(bm25_term_score([tfw], [dl], avgdl, tidf)[0])
            rows.append((term, tfw, df, round(tidf, 6),
                         round(contrib, round_to)))
        rows.sort()
        return pa.table({
            "term": pa.array([r[0] for r in rows], pa.string()),
            "tf": pa.array([r[1] for r in rows], pa.float64()),
            "df": pa.array([r[2] for r in rows], pa.int64()),
            "idf": pa.array([r[3] for r in rows], pa.float64()),
            "contrib": pa.array([r[4] for r in rows], pa.float64()),
        })

    def term_vectors(self, doc_id: int) -> pa.Table:
        """Per-document term statistics (the Elasticsearch
        ``_termvectors`` shape — an introspection extension over the
        reference's ``fts5vocab``-style dictionary surface,
        ``src/Storage/SqliteStorage.php`` getIndexedTerms).

        Each stored indexed field is re-tokenized with the INDEX
        tokenizer (exactly what the build saw) and reported as
        ``(field, term, tf, df)`` where ``tf`` is the in-field term
        count and ``df`` the union-of-fields corpus document frequency
        (the same definition BM25's idf uses; one postings read per
        distinct term, LRU-cached).  Rows sorted (field ASC, term ASC).

        Raises KeyError for an unknown doc and ValueError if the index
        does not store its indexed source columns."""
        from collections import Counter

        from ..analysis.tokenizer import tokenize as _index_tok

        cfg = self.index.manifest.data.get("config") or {}
        src_cols = [f[1] for f in cfg.get("fields", [])]
        stored = set(cfg.get("store_columns") or [])
        missing = [c for c in src_cols if c not in stored]
        if missing:
            raise ValueError(
                f"term_vectors needs stored source columns; not in "
                f"docstore: {missing}")
        t = self.index.docs([doc_id], columns=src_cols)
        if t.num_rows == 0:
            raise KeyError(f"doc_id {doc_id} not found")
        per_field: dict[str, Counter] = {}
        for c in src_cols:
            per_field[c] = Counter(_index_tok(t[c][0].as_py() or ""))
        dfs: dict[str, int] = {}
        for term in set().union(*(c.keys() for c in per_field.values())):
            posts = self._term_postings(term)
            arrs = [p.doc_ids for p in posts.values()]
            dfs[term] = int(np.unique(np.concatenate(arrs)).size) if arrs else 0
        rows = sorted((fname, term, tf, dfs[term])
                      for fname, ctr in per_field.items()
                      for term, tf in ctr.items())
        return pa.table({
            "field": pa.array([r[0] for r in rows], pa.string()),
            "term": pa.array([r[1] for r in rows], pa.string()),
            "tf": pa.array([r[2] for r in rows], pa.int64()),
            "df": pa.array([r[3] for r in rows], pa.int64()),
        })

    def search_wildcard(self, pattern: str, *, limit: int = 20,
                        max_terms: int = 16, **kwargs) -> pa.Table:
        """Wildcard term query (``pa?se``, ``par*``, ``*fix`` — the
        Elasticsearch wildcard-query shape; the reference exposes only
        trailing-prefix ``term*``).  The pattern is expanded against the
        index dictionary (df DESC, term ASC, capped at ``max_terms`` so
        a hot pattern can't explode into thousands of OR arms), terms
        the query compiler would drop (stopwords / length window) are
        removed since they could never score, and the survivors run as
        one OR query through the normal search path.
        """
        # expand unbounded (the dictionary scan reads all matching rows
        # regardless), drop compiler-dropped terms, THEN cap — so the cap
        # always buys max_terms scorable arms and the selection is
        # exactly "top max_terms surviving terms by (df DESC, term ASC)"
        # (the SQL oracle replicates this order verbatim)
        terms = [t for t in self.index.expand_wildcard(pattern,
                                                       max_terms=1 << 31)
                 if self.analyzer.match_terms(t) == [[t]]][:max_terms]
        if not terms:
            return self._empty_result(kwargs.get("with_docs", False))
        return self.search(" ".join(terms), mode="or", limit=limit, **kwargs)

    def search_after(self, query: str, *, after_score: float,
                     after_doc_id: int, limit: int = 10,
                     **kwargs) -> pa.Table:
        """Keyset (cursor) pagination — the Elasticsearch ``search_after``
        shape, an extension beyond the reference's offset pagination.

        ``(after_score, after_doc_id)`` is the composite sort key of the
        last row of the previous page (result order is score DESC,
        doc_id ASC, and doc_id makes the key unique), so the next page
        is exactly the rows strictly after it.  Unlike OFFSET, a keyset
        cursor is stable under concurrent appends of lower-scoring docs
        and costs the same for page 1000 as for page 2 — the scalable
        deep-pagination contract.  Scores must be raw (``normalize``
        rescales per page, destroying cursor comparability), so
        normalize=True is rejected.  The reachable depth is the same
        MAX_RESULTS clamp the reference applies to offset pagination.
        """
        if kwargs.get("normalize", False):
            raise ValueError("search_after needs raw scores; "
                             "normalize=True is incompatible")
        kwargs["normalize"] = False
        kwargs.pop("offset", None)
        res = self.search(query, limit=MAX_RESULTS, **kwargs)
        s = res["score"].to_numpy(zero_copy_only=False)
        d = res["doc_id"].to_numpy(zero_copy_only=False)
        keep = (s < after_score) | ((s == after_score) & (d > after_doc_id))
        return res.filter(pa.array(keep)).slice(0, limit)

    def search_grouped(self, query: str, *, route_column: str,
                       group_limit: int = 3, limit: int = 5,
                       **kwargs) -> pa.Table:
        """Grouped results (ES ``collapse`` + ``inner_hits`` / top_hits
        shape, an extension beyond the reference's best-per-route
        collapsing): the top ``group_limit`` docs per ``route_column``
        value, for the top ``limit`` groups ranked by their best
        member's score (ties broken by route value).  Candidates come
        from the same MAX_RESULTS-clamped raw-score page as field
        collapsing, which the SQL oracle replicates.  Output columns:
        ``route, doc_id, score, pos`` (1-based position within group),
        ordered by group rank then position.
        """
        if kwargs.get("normalize", False):
            raise ValueError("search_grouped needs raw scores; "
                             "normalize=True is incompatible")
        kwargs["normalize"] = False
        kwargs.pop("offset", None)
        res = self.search(query, limit=MAX_RESULTS, **kwargs)
        if res.num_rows == 0:
            return pa.table({"route": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64()),
                             "pos": pa.array([], pa.int64())})
        import pandas as pd

        d = res["doc_id"].to_numpy(zero_copy_only=False)
        s = res["score"].to_numpy(zero_copy_only=False)
        routes = self.index.meta_for(route_column, d.astype(np.uint64))
        # page rows arrive in (score DESC, doc_id ASC) order, so a
        # stable cumcount IS the within-group position and each group's
        # first row carries its best score — no further sorting needed
        df = pd.DataFrame({"route": routes, "doc_id": d.astype(np.int64),
                           "score": s})
        df["pos"] = df.groupby("route", sort=False).cumcount() + 1
        best = (df[df["pos"] == 1][["route", "score"]]
                .sort_values(["score", "route"], ascending=[False, True]))
        keep_routes = best["route"].head(int(limit)).tolist()
        grank = {r: i for i, r in enumerate(keep_routes)}
        out = df[(df["pos"] <= int(group_limit))
                 & df["route"].isin(grank)].copy()
        out["_g"] = out["route"].map(grank)
        out = out.sort_values(["_g", "pos"]).drop(columns="_g")
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    @staticmethod
    def search_multiple(engines: dict, query: str, *, limit: int = 20,
                        offset: int = 0, **kwargs) -> pa.Table:
        """Multi-index union (reference ``searchMultiple`` :1574-1628):
        per-index searches, tag ``_index``, merge by score desc, slice."""
        frames = []
        for name, eng in engines.items():
            r = eng.search(query, limit=limit + offset, **kwargs)
            t = r.append_column("_index",
                                pa.array([name] * r.num_rows, pa.string()))
            frames.append(t)
        merged = pa.concat_tables(frames, promote_options="default")
        import pandas as pd

        df = merged.to_pandas().sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).iloc[offset : offset + limit]
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    def count(self, query: str, *, mode: str = "smart", filters=None,
              language: str | None = None, field_weights=None) -> int:
        weights = self._field_weight_vector(field_weights or self.default_weights)
        cq = compile_query(query, self.analyzer, mode=mode)
        if not cq.phrases:
            return 0
        doc_ids, _ = self._score(cq, weights)
        if doc_ids.size and self.index.tombstones.size:
            doc_ids = doc_ids[~np.isin(doc_ids, self.index.tombstones)]
        if doc_ids.size:
            keep = self._apply_filters(doc_ids, filters, language)
            doc_ids = doc_ids[keep]
        return int(doc_ids.size)

    def match_ids(self, query: str, *, mode: str = "smart",
                  filters=None, language: str | None = None) -> np.ndarray:
        """Live doc_ids matching ``query`` (analyzer applied, tombstones
        and filters honored) — the match SET without scoring/pagination;
        feeds set-algebra aggregations (adjacency matrix)."""
        weights = self._field_weight_vector(self.default_weights)
        cq = compile_query(query, self.analyzer, mode=mode)
        if not cq.phrases:
            return np.empty(0, np.uint64)
        doc_ids, _ = self._score(cq, weights)
        if doc_ids.size and self.index.tombstones.size:
            doc_ids = doc_ids[~np.isin(doc_ids, self.index.tombstones)]
        if doc_ids.size:
            keep = self._apply_filters(doc_ids, filters, language)
            doc_ids = doc_ids[keep]
        return doc_ids

    def explain(self, query: str, *, mode: str = "smart",
                fuzzy: bool = False, fuzzy_mode: str = "correction",
                prefix_last: bool = False, near_distance: int = 10,
                **search_kwargs) -> dict:
        """Query plan introspection — the analog of the reference CLI's
        ``debug:query`` (``bin/yetisearch:137-155``), which prints the
        generated SQL + bind params + EXPLAIN QUERY PLAN.  There is no
        SQL here; the equivalent artifacts are the compiled query (arms,
        mode, NEAR params), the fuzzy rewrite if any, per-arm document
        frequencies, the posting PARTITIONS each term reads (the I/O
        plan), and which execution path serves it (WAND vs full scan)."""
        orig_terms: list[str] = []
        query, term_boosts = self._parse_boost_syntax(
            query, search_kwargs.get("term_boosts"))
        if fuzzy:
            cq, orig_terms = self._compile_fuzzy(query, fuzzy_mode)
        else:
            cq = compile_query(query, self.analyzer, mode=mode,
                               prefix_last=prefix_last,
                               near_distance=near_distance)
        in_fields = search_kwargs.get("in_fields")
        fids = None
        if in_fields:
            names = [f[0] for f in self.index.fields]
            fids = frozenset(names.index(f) for f in in_fields
                             if f in names)
        arms = []
        dfs = self.arm_dfs(cq)
        for ph in cq.phrases:
            terms = list(ph.terms)
            arm = {
                "terms": terms,
                "prefix": bool(ph.prefix),
                "kind": ("phrase" if len(terms) > 1 else "term"),
                "required": any(p is ph for p in cq.required),
                "df": dfs.get(self._arm_key(ph), 0),
                "partitions": sorted({p for t in terms
                                      for p in self.index._term_parts(t)}),
            }
            if term_boosts and len(terms) == 1 and terms[0] in term_boosts:
                arm["boost"] = float(term_boosts[terms[0]])
            arms.append(arm)
        wand_ok = (
            fids is None
            and int(search_kwargs.get("min_should_match", 1)) == 1
            and not search_kwargs.get("dismax")
            and not search_kwargs.get("rank_column")
            and not term_boosts
            and self._wand_eligible(
                cq, fuzzy=fuzzy, filters=search_kwargs.get("filters"),
                language=search_kwargs.get("language"),
                geo_filters=search_kwargs.get("geo_filters"),
                unique_by_route=search_kwargs.get("unique_by_route", False),
                min_score=search_kwargs.get("min_score", 0.0),
                sort=search_kwargs.get("sort"),
                post_rescore=search_kwargs.get("post_rescore", False)))
        plan = {
            "query": query,
            "mode": cq.mode,
            "arms": arms,
            "exclude": [list(p.terms) for p in cq.exclude],
            "stats": {"n_docs": self.index.n_docs,
                      "avgdl": self.index.avgdl,
                      "tombstones": int(self.index.tombstones.size)},
            "execution_path": ("wand" if wand_ok and
                               search_kwargs.get("use_wand") else "scan"),
            "wand_eligible": wand_ok,
        }
        if cq.near_terms:
            plan["near"] = {"terms": list(cq.near_terms),
                            "distance": cq.near_distance}
        if fuzzy:
            plan["fuzzy"] = {"original_terms": orig_terms,
                             "corrected_terms":
                                 [t for ph in cq.phrases for t in ph.terms]}
        # round-3 query-feature surface, reflected so debug-query dumps
        # the full effective plan
        if fids is not None:
            plan["in_fields"] = {"fields": list(in_fields),
                                 "field_ids": sorted(fids)}
        if int(search_kwargs.get("min_should_match", 1)) > 1:
            plan["min_should_match"] = int(search_kwargs["min_should_match"])
        if search_kwargs.get("dismax"):
            plan["dismax"] = {"tie_breaker":
                              float(search_kwargs.get("tie_breaker", 0.0))}
        if search_kwargs.get("rank_column"):
            plan["rank_boost"] = {
                "column": search_kwargs["rank_column"],
                "weight": float(search_kwargs.get("rank_weight", 0.0)),
                "mode": search_kwargs.get("rank_mode", "add")}
        return plan

    # ---------------- result-cache introspection ----------------------
    # (reference getCacheStats/clearCache/warmUpCache,
    #  src/YetiSearch.php:423-471)
    def cache_stats(self) -> dict:
        return {"entries": len(self._result_cache),
                "hits": self._cache_hits, "misses": self._cache_misses,
                "ttl": self._cache_ttl, "max_entries": self._cache_max}

    def clear_cache(self) -> None:
        self._result_cache.clear()
        self._cache_hits = 0
        self._cache_misses = 0

    def _empty_result(self, with_docs: bool) -> pa.Table:
        return pa.table({"doc_id": pa.array([], pa.uint64()),
                         "score": pa.array([], pa.float64())})


# ==========================================================================
# snippets / highlighting (reference :973-1110)
# ==========================================================================


def make_snippet(text: str, terms: list[str], context: int = 50,
                 max_len: int = 160) -> str:
    if not text:
        return ""
    # terms arrive FOLDED (unicode61: lowercase + diacritics stripped);
    # match against the folded text so accented originals highlight
    # (reference Utf8HighlightTest: "brûlée" must <mark>).  fold_text is
    # length-preserving for precomposed letters, so matched offsets map
    # 1:1 back onto the original text; on the rare ligature expansion
    # fall back to plain lowercase matching.
    from ..analysis.tokenizer import fold_text

    folded = fold_text(text)
    low = folded if len(folded) == len(text) else text.lower()
    best_pos = None
    for t in sorted(terms, key=len, reverse=True):
        for cand in (t, t + "s"):
            p = low.find(cand)
            if p >= 0 and (best_pos is None or p < best_pos):
                best_pos = p
    if best_pos is None:
        snippet = text[:max_len]
    else:
        start = max(0, best_pos - context)
        # word-boundary trim
        if start > 0:
            sp = text.find(" ", start)
            if 0 <= sp < best_pos:
                start = sp + 1
        snippet = text[start : start + max_len]
        if start > 0:
            snippet = "..." + snippet
        if start + max_len < len(text):
            snippet = snippet + "..."
    # mark original-text spans found via the folded view
    folded_snip = fold_text(snippet)
    if len(folded_snip) != len(snippet):
        folded_snip = snippet.lower()
    spans: list[tuple[int, int]] = []
    for t in sorted(set(terms), key=len, reverse=True):
        for m in re.finditer(rf"\b({re.escape(t)}s?)\b", folded_snip,
                             flags=re.I):
            s, e = m.span(1)
            if not any(s < e2 and e > s2 for s2, e2 in spans):
                spans.append((s, e))
    out = []
    last = 0
    for s, e in sorted(spans):
        out.append(snippet[last:s])
        out.append("<mark>" + snippet[s:e] + "</mark>")
        last = e
    out.append(snippet[last:])
    return "".join(out)


# ==========================================================================
# actor-pool serving
# ==========================================================================


class SearchActor:
    """Callable class for ``map_batches`` query serving.

    ``queries_ds.map_batches(SearchActor, fn_constructor_kwargs={...},
    concurrency=N, batch_size=B)`` — the index is opened ONCE per actor
    (manifest, stats, metadata arrays, posting cache), each batch of query
    strings is served from that state.
    """

    def __init__(self, index_dir: str, search_defaults: dict | None = None,
                 **engine_kwargs):
        self.engine = SearchEngine(open_index(index_dir), **engine_kwargs)
        # per-search defaults applied to every query this actor serves —
        # e.g. {"use_wand": True} to serve eligible queries through the
        # block-max WAND path (opt-in; see the measured-default note in
        # search())
        self.search_defaults = dict(search_defaults or {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        qids, queries = batch["qid"].to_pylist(), batch["query"].to_pylist()
        limits = (
            batch["limit"].to_pylist() if "limit" in batch.column_names
            else [10] * len(queries)
        )
        # optional per-row search options (JSON dict, e.g. {"mode": "or"})
        # merged OVER the actor-wide defaults — a mixed workload (boosted,
        # dis_max, field-restricted queries...) rides one actor pool
        opts = (
            batch["options"].to_pylist() if "options" in batch.column_names
            else [None] * len(queries)
        )
        out_qid, out_doc, out_score, out_rank = [], [], [], []
        for qid, q, lim, opt in zip(qids, queries, limits, opts):
            kw = dict(self.search_defaults)
            if opt:
                kw.update(_json.loads(opt))
            r = self.engine.search(q, limit=int(lim), **kw)
            ids = r["doc_id"].to_pylist()
            scores = r["score"].to_pylist()
            out_qid.extend([qid] * len(ids))
            out_doc.extend(ids)
            out_score.extend(scores)
            out_rank.extend(range(1, len(ids) + 1))
        # qid typed explicitly: an all-empty batch would otherwise emit a
        # null-typed column → mixed block schemas in batch_search sinks
        return pa.table({
            "qid": pa.array(out_qid, pa.int64()),
            "doc_id": pa.array(out_doc, pa.uint64()),
            "score": pa.array(out_score, pa.float64()),
            "result_rank": pa.array(out_rank, pa.int32()),
        })
