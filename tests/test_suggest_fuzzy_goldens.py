"""Golden pins for the two driver entries that are rows-only by design
(`fts_suggest`, `fts_fuzzy_topk`) — deterministic expected outputs over
the fixed sf0.01 documents corpus, derived from GROUND TRUTH rather
than recorded behavior:

- fuzzy correction-mode search for a single-typo query must return
  exactly the result set of the intended term, with every score scaled
  by ONE common fuzzy penalty factor in (0, 1];
- suggest must compose the intended corrected phrase and verify it with
  the engine's own smart-mode count (reference SearchEngine.php:2254).
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_engine(ray_session):
    from yetisearch_ray.pipelines.fts_documents import get_engine

    return get_engine(SF)


@pytest.mark.usefixtures("ray_session")
class TestFuzzyTopkGolden:
    def test_single_typo_corrects_to_intended_term(self, docs_engine):
        from yetisearch_ray.pipelines import fts_documents as ftsd

        got = ftsd.fuzzy_topk(SF, query="mrege", k=10)
        want = docs_engine.search("merge", limit=10,
                                  normalize=False).to_pandas()
        assert got.doc_id.tolist() == want.doc_id.tolist()
        # one common penalty factor applied to every score — checked via
        # the engine directly (the driver entry rounds to 5 decimals,
        # which flattens hot-term scores to 0)
        g = docs_engine.search("mrege", limit=10, fuzzy=True,
                               normalize=False).to_pandas()
        w = docs_engine.search("merge", limit=10,
                               normalize=False).to_pandas()
        assert g.doc_id.tolist() == w.doc_id.tolist()
        gs = g.score.to_numpy(dtype=float)
        ws = w.score.to_numpy(dtype=float)
        mask = ws > 0
        assert mask.any()
        ratios = gs[mask] / ws[mask]
        assert np.allclose(ratios, ratios[0], rtol=1e-9)
        assert 0.0 < ratios[0] <= 1.0

    def test_exact_term_gets_all_terms_penalty_tier(self, docs_engine):
        """fuzzy=True with an already-correct term: same ranking, scores
        scaled by exactly 1 - 0.1 (the reference calculateFuzzyPenalty
        all-terms tier, src/Search/SearchEngine.php:850-971)."""
        exact = docs_engine.search("window", limit=10,
                                   normalize=False).to_pandas()
        fz = docs_engine.search("window", limit=10, fuzzy=True,
                                normalize=False).to_pandas()
        assert fz.doc_id.tolist() == exact.doc_id.tolist()
        assert np.allclose(fz.score.to_numpy(),
                           0.9 * exact.score.to_numpy(), rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestSuggestGolden:
    def test_two_typo_phrase_suggestion(self, docs_engine):
        from yetisearch_ray.pipelines import fts_documents as ftsd

        df = ftsd.suggest(SF, query="mrege windwo")
        assert len(df) == 1
        assert df.suggestion.iloc[0] == "merge window"
        assert int(df["count"].iloc[0]) == docs_engine.count("merge window")
        assert 0.0 < df.confidence.iloc[0] <= 1.0

    def test_clean_query_yields_no_suggestion(self, docs_engine):
        t = docs_engine.suggest("merge window")
        assert t.num_rows == 0

    def test_nonsense_query_yields_no_suggestion(self, docs_engine):
        t = docs_engine.suggest("zzzqqqxxyy")
        assert t.num_rows == 0
