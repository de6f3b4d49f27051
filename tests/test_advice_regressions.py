"""Regression tests for the round-1 ADVICE findings.

Each test pins one reviewed bug:
  1. result-cache key must include sort / geo / distance_weight / merge_tokens
  2. post_rescore must widen the candidate pool before truncating to the page
  3. synonyms in mode='and' are OR score arms, not required conjuncts
  4. rebuild_index keeps the sha256 docstore column + content_hash_column cfg
"""
import os

import pyarrow.parquet as pq
import pytest

from yetisearch_ray.index.manifest import Manifest
from yetisearch_ray.search.engine import SearchEngine, open_index


@pytest.mark.usefixtures("ray_session")
class TestAdviceRegressions:
    def test_cache_key_includes_sort(self, built_index):
        eng = SearchEngine(open_index(built_index), cache_ttl=300.0)
        up = eng.search("return", limit=10, sort=("path", "asc"),
                        with_docs=True)["path"].to_pylist()
        down = eng.search("return", limit=10, sort=("path", "desc"),
                          with_docs=True)["path"].to_pylist()
        assert up == sorted(up)
        assert down == sorted(down, reverse=True)
        assert up != down

    def test_cache_key_includes_distance_weight_and_merge(self, built_index):
        eng = SearchEngine(open_index(built_index), cache_ttl=300.0)
        a = eng.search("parse buffer", limit=5)
        b = eng.search("parse buffer", limit=5, merge_tokens=True)
        # must not collide in the cache: both calls execute independently
        # (equality of results is fine; identity of the cached table for a
        # different merge_tokens value would be the bug)
        assert len(eng._result_cache) == 2
        del a, b

    def test_post_rescore_widens_pool(self, built_index):
        """post_rescore(limit=k) must be the k-prefix of the rescored wide
        ranking, not a reorder of the base top-k page."""
        eng = SearchEngine(open_index(built_index), cache_ttl=0.0)
        w = {"path": 10.0, "content": 1.0}
        small = eng.search("parse", limit=5, post_rescore=True,
                           field_weights=w, normalize=False)["doc_id"].to_pylist()
        wide = eng.search("parse", limit=50, post_rescore=True,
                          field_weights=w, normalize=False)["doc_id"].to_pylist()
        assert small == wide[:5]

    def test_and_mode_synonyms_do_not_shrink_match(self, built_index):
        plain = SearchEngine(open_index(built_index), cache_ttl=0.0)
        syn = SearchEngine(open_index(built_index), cache_ttl=0.0,
                           synonyms={"parse": ["deadline"]})
        base = set(plain.search("parse buffer", mode="and", limit=200,
                                normalize=False)["doc_id"].to_pylist())
        with_syn = set(syn.search("parse buffer", mode="and", limit=200,
                                  normalize=False)["doc_id"].to_pylist())
        assert base  # corpus sanity
        assert with_syn == base  # synonyms add score arms, never conjuncts

    def test_suggestion_on_empty_results(self, built_index):
        """Reference wires a did-you-mean onto empty result sets
        (SearchEngine.php:238-249); Arrow mapping = schema metadata."""
        eng = SearchEngine(open_index(built_index), cache_ttl=0.0,
                           min_term_frequency=1)
        r = eng.search("parseing", limit=5, enable_suggestions=True)
        assert r.num_rows == 0
        md = r.schema.metadata or {}
        assert b"suggestion" in md and b"pars" in md[b"suggestion"]

    def test_specific_s_contractions(self):
        from yetisearch_ray.analysis.analyzer import StandardAnalyzer

        a = StandardAnalyzer(disable_stopwords=True)
        toks = a.tokenize("it's that's grav's")
        # pronoun 's expands, possessive 's does not
        assert toks[:4] == ["it", "is", "that", "is"]
        assert not any(t.endswith(" is") or t == "gravis" for t in toks[4:])

    def test_rebuild_keeps_sha256(self, built_index, tmp_path):
        import shutil

        from yetisearch_ray.index.manage import rebuild_index

        idx2 = str(tmp_path / "idx_rebuild")
        shutil.copytree(built_index, idx2)
        before = pq.read_table(os.path.join(idx2, "docs"),
                               columns=["doc_id", "sha256"]).sort_by("doc_id")
        rebuild_index(idx2)
        man = Manifest.load(idx2)
        assert man.config.get("content_hash_column") == "content"
        after = pq.read_table(os.path.join(idx2, "docs"),
                              columns=["doc_id", "sha256"]).sort_by("doc_id")
        assert before.equals(after)
