"""Replays of the reference's own PHPUnit search/scoring scenarios.

Each test mirrors one reference test 1:1 — same documents, same options,
same assertions — through the reference-shaped facade
(``yetisearch_ray.facade.YetiSearchRay``).  Sources cited per test.
"""
import pytest

from yetisearch_ray.facade import YetiSearchRay


@pytest.mark.usefixtures("ray_session")
class TestEnhancedFuzzySearchReplay:
    """tests/Integration/Search/EnhancedFuzzySearchTest.php — the 5-doc
    corpus with trigram fuzzy correction, min_term_frequency 1."""

    @pytest.fixture(scope="class")
    def ys(self, tmp_path_factory):
        ys = YetiSearchRay(str(tmp_path_factory.mktemp("fuzzy_replay")))
        ys.create_index("enhanced_fuzzy_test", fields=["title", "content"])
        ys.index_batch("enhanced_fuzzy_test", [
            {"doc_id": 1, "content": {
                "title": "The Quick Brown Fox",
                "content": "A quick brown fox jumps over the lazy dog."}},
            {"doc_id": 2, "content": {
                "title": "Phone Number Directory",
                "content": "Contact us by phone for assistance."}},
            {"doc_id": 3, "content": {
                "title": "Their House",
                "content": "This is their house and their car."}},
            {"doc_id": 4, "content": {
                "title": "Keyboard Tutorial",
                "content": "Learn to type on the keyboard efficiently."}},
            {"doc_id": 5, "content": {
                "title": "Search Engine",
                "content": "How search engines work and rank results."}},
        ])
        eng = ys.engine("enhanced_fuzzy_test", fuzzy_algorithm="trigram",
                        min_term_frequency=1, min_part_frequency=1,
                        cache_ttl=0.0)
        return eng

    def _ids(self, eng, q, **kw):
        return eng.search(q, limit=5, fuzzy=True, **kw)["doc_id"].to_pylist()

    def test_phonetic_typo_correction(self, ys):
        # fone -> phone (PhoneticMatcher quick table)
        assert 2 in self._ids(ys, "fone")

    def test_keyboard_proximity_typo(self, ys):
        # qyick -> quick
        assert 1 in self._ids(ys, "qyick brown")

    def test_common_typo_patterns(self, ys):
        # thier -> their
        assert 3 in self._ids(ys, "thier house")

    def test_multiple_typo_correction(self, ys):
        # no doc contains both quick and phone -> 0 results; each alone
        # corrects and matches
        assert self._ids(ys, "qyick fone") == []
        assert 1 in self._ids(ys, "qyick")
        assert 2 in self._ids(ys, "fone")

    def test_did_you_mean_on_empty(self, ys):
        r = ys.search("qyick fone", limit=5, fuzzy=True,
                      enable_suggestions=True)
        assert r.num_rows == 0
        # reference: empty result sets carry suggestions
        md = r.schema.metadata or {}
        assert b"suggestion" in md


@pytest.mark.usefixtures("ray_session")
class TestSynonymsReplay:
    """tests/Integration/Search/SynonymsTest.php."""

    def test_synonyms_expand_terms_and_find_results(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "syn"))
        ys.create_index("syn_idx", fields=["title"])
        ys.index_batch("syn_idx", [
            {"doc_id": 1, "content": {"title": "Best Coffee in New York"}},
            {"doc_id": 2, "content": {"title": "New York City Bagels"}},
            {"doc_id": 3, "content": {"title": "Los Angeles Coffee"}},
        ])
        eng = ys.engine("syn_idx",
                        synonyms={"nyc": ["new york", "new york city"],
                                  "la": ["los angeles"]},
                        cache_ttl=0.0)
        ids = eng.search("nyc coffee", limit=5)["doc_id"].to_pylist()
        assert 1 in ids or 2 in ids, \
            "Expected NYC -> New York synonym expansion to match"


@pytest.mark.usefixtures("ray_session")
class TestUtf8HighlightReplay:
    """tests/Integration/Search/Utf8HighlightTest.php."""

    def test_utf8_highlight_and_snippet(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "utf8"))
        ys.create_index("utf8_highlight_idx", fields=["title", "content"])
        ys.index_batch("utf8_highlight_idx", [{
            "doc_id": 1,
            "content": {"title": "Crème brûlée guide",
                        "content": "Recette de crème brûlée et café "
                                   "torréfié."},
        }])
        r = ys.search("utf8_highlight_idx", "brûlée", limit=5,
                      highlight=True)
        assert r.num_rows > 0
        flat = r["highlight"][0].as_py()
        assert "<mark>" in flat
        assert "brûlée" in flat.lower()


@pytest.mark.usefixtures("ray_session")
class TestScoringAndDedupReplay:
    """tests/Integration/Search/SearchEngineScoringAndDedupTest.php —
    geo distance ordering + unique_by_route dedup (geo via metadata
    lat/lng columns in this engine)."""

    @pytest.fixture(scope="class")
    def ys(self, tmp_path_factory):
        ys = YetiSearchRay(str(tmp_path_factory.mktemp("geo_replay")))
        ys.create_index("engine_geo_idx", fields=["title"],
                        store_columns=["title", "route", "lat", "lng"])
        ys.index_batch("engine_geo_idx", [
            {"doc_id": 1, "content": {"title": "Alpha near"},
             "route": "/a", "lat": 37.7749, "lng": -122.4194},
            {"doc_id": 2, "content": {"title": "Alpha far"},
             "route": "/a", "lat": 37.8049, "lng": -122.3894},
            {"doc_id": 3, "content": {"title": "Beta mid"},
             "route": "/b", "lat": 37.7849, "lng": -122.4094},
        ])
        return ys

    def test_distance_sort_orders_near_first(self, ys):
        eng = ys.engine("engine_geo_idx", cache_ttl=0.0)
        r = eng.search("alpha", limit=10, geo_filters={
            "near": {"lat": 37.7749, "lng": -122.4194, "radius_km": 5.0},
            "sort_by_distance": True,
        })
        ids = r["doc_id"].to_pylist()
        assert ids.index(1) < ids.index(2)

    def test_unique_by_route_keeps_best_per_route(self, ys):
        eng = ys.engine("engine_geo_idx", cache_ttl=0.0)
        r = eng.search("alpha", limit=10, unique_by_route=True,
                       route_column="route")
        ids = r["doc_id"].to_pylist()
        assert (1 in ids) != (2 in ids)  # exactly one alpha survivor


@pytest.mark.usefixtures("ray_session")
class TestSuggestionsReplay:
    """tests/Integration/Search/SuggestionsTest.php — 'Skywaker' must
    suggest a Skywalker query."""

    def test_suggest_ranks_relevant_titles_first(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "sugg"))
        ys.create_index("suggest_idx", fields=["title", "content"])
        ys.index_batch("suggest_idx", [
            {"doc_id": 1, "content": {"title": "Anakin Skywalker",
                                      "content": "Jedi"}},
            {"doc_id": 2, "content": {"title": "Luke Skywalker",
                                      "content": "Jedi Knight"}},
            {"doc_id": 3, "content": {"title": "Star Wars",
                                      "content": "Space opera"}},
            {"doc_id": 4, "content": {"title": "The Dark Knight",
                                      "content": "Batman vs Joker"}},
            {"doc_id": 5, "content": {"title": "Skylark",
                                      "content": "Songbird"}},
        ])
        eng = ys.engine("suggest_idx", fuzzy_algorithm="jaro_winkler",
                        min_term_frequency=1, cache_ttl=0.0)
        s = eng.suggest("Skywaker", limit=5)
        assert s.num_rows > 0
        assert "skywalker" in s["suggestion"][0].as_py()


@pytest.mark.usefixtures("ray_session")
class TestPreChunkedReplay:
    """tests/PreChunkedDocumentTest.php."""

    def test_pre_chunked_with_simple_strings(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "pc1"))
        ys.create_index("test", fields=["title", "content"])
        ys.index_batch("test", [{
            "content": {"title": "Pre-chunked Document",
                        "content": "This is the main content that would "
                                   "normally be chunked automatically."},
            "chunks": [
                "Chapter 1: Introduction. This is the introduction to "
                "the document.",
                "Chapter 2: Main Content. This section contains the "
                "main content.",
                "Chapter 3: Conclusion. This is where we wrap things up.",
            ],
        }])
        assert ys.search("test", "introduction").num_rows > 0
        assert ys.search("test", "conclusion").num_rows > 0

    def test_pre_chunked_with_structured_chunks(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "pc2"))
        ys.create_index("test", fields=["title", "content"],
                        store_columns=["title", "content", "section",
                                       "is_chunk"])
        ys.index_batch("test", [{
            "content": {"title": "Structured Pre-chunked Document",
                        "content": "Main document content"},
            "chunks": [
                {"content": "## Introduction\nThis is the introduction "
                            "paragraph that provides context.",
                 "metadata": {"section": "introduction"}},
                {"content": "## Methodology\nHere we describe the "
                            "methodology used in this research.",
                 "metadata": {"section": "methodology"}},
                {"content": "## Results\nThe results show significant "
                            "improvements.",
                 "metadata": {"section": "results"}},
            ],
        }])
        r = ys.search("test", "methodology research", with_docs=True)
        assert r.num_rows > 0
        top = {c: r[c][0].as_py() for c in r.column_names}
        assert top.get("section") == "methodology" or top.get("is_chunk")

    def test_mixed_chunking_modes(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "pc3"))
        ys.create_index("test", fields=["title", "content"])
        ys.index_batch("test", [
            {"content": {"title": "Pre-chunked Article",
                         "content": "Short main content"},
             "chunks": ["First paragraph content.",
                        "Second paragraph content."]},
            {"content": {"title": "Auto-chunked Article",
                         "content": "This is a long document that will "
                                    "be automatically chunked. " * 200}},
            {"content": {"title": "Short Article",
                         "content": "This is too short to chunk."}},
        ])
        assert ys.search("test", "Article", limit=20).num_rows >= 3


@pytest.mark.usefixtures("ray_session")
class TestWeightedBm25Replay:
    """tests/Integration/Search/WeightedBm25AndPrefixTest.php — the
    behavioral assertions (the exact bm25 arithmetic is pinned in
    tests/test_fts5_goldens.py)."""

    def test_weighted_bm25_prioritizes_title(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "rank"))
        ys.create_index("rank_idx", fields=["title", "content"])
        ys.index_batch("rank_idx", [
            {"doc_id": 1, "content": {
                "title": "Rocket Propulsion",
                "content": "An introduction to physics and engineering."}},
            {"doc_id": 2, "content": {
                "title": "Introduction",
                "content": " rocket rocket rocket"}},
        ])
        eng = ys.engine("rank_idx", cache_ttl=0.0)
        r = eng.search("rocket", limit=2,
                       field_weights={"title": 50.0, "content": 1.0})
        assert 1 in r["doc_id"].to_pylist()
        assert r["doc_id"][0].as_py() == 1  # title-weighted doc on top

    def test_prefix_queries_return_matches(self, tmp_path):
        ys = YetiSearchRay(str(tmp_path / "prefix"))
        ys.create_index("prefix_idx", fields=["title", "content"])
        ys.index_batch("prefix_idx", [
            {"doc_id": 1, "content": {"title": "Skywalker", "content": "Jedi"}},
            {"doc_id": 2, "content": {"title": "Skyrim Guide", "content": "RPG tips"}},
            {"doc_id": 3, "content": {"title": "Skylark", "content": "Bird"}},
            {"doc_id": 4, "content": {"title": "Dark Knight", "content": "Batman"}},
        ])
        eng = ys.engine("prefix_idx", cache_ttl=0.0)
        r = eng.search("sky", prefix_last=True, limit=10, with_docs=True)
        titles = r["title"].to_pylist()
        assert titles and all(t.lower().startswith("sky") for t in titles)
