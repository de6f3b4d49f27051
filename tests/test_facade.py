"""YetiSearchRay facade: reference-shaped API over named indexes."""

import pytest

from yetisearch_ray.facade import YetiSearchRay


@pytest.mark.usefixtures("ray_session")
class TestFacade:
    @pytest.fixture()
    def ys(self, tmp_path):
        return YetiSearchRay(str(tmp_path / "indexes"))

    DOCS = [
        {"content": {"title": "Rocket Propulsion",
                     "content": "An introduction to physics and engineering."},
         "language": "en"},
        {"content": {"title": "Introduction",
                     "content": "rocket rocket rocket"},
         "language": "en"},
        {"content": {"title": "Cooking Basics",
                     "content": "How to boil water and other essentials."},
         "language": "en"},
    ]

    def test_index_and_search(self, ys):
        ys.create_index("books", fields=["title", "content"],
                        language_column="language")
        n = ys.index_batch("books", self.DOCS)
        assert n == 3
        r = ys.search("books", "rocket", limit=10, normalize=False)
        assert r.num_rows == 2

    def test_weighted_bm25_fixture_2c(self, ys):
        """FIXTURES.md §2c: with title weight 50, the title match must
        outrank the tf-heavy body match (canonical column-weight check)."""
        ys.create_index("b2", fields=["title", "content"])
        ys.index_batch("b2", self.DOCS[:2])
        r = ys.search("b2", "rocket", limit=2, normalize=False,
                      field_weights={"title": 50.0, "content": 1.0},
                      with_docs=True)
        assert r["title"][0].as_py() == "Rocket Propulsion"
        plain = ys.search("b2", "rocket", limit=2, normalize=False)
        assert plain.num_rows == 2

    def test_append_and_count(self, ys):
        ys.create_index("inc", fields=["title", "content"])
        ys.index_batch("inc", self.DOCS[:2])
        assert ys.count("inc", "rocket") == 2
        ys.index_batch("inc", [{"content": {"title": "More rockets",
                                            "content": "rocket science"}}])
        assert ys.count("inc", "rocket") == 3

    def test_delete_optimize_stats(self, ys):
        ys.create_index("mut", fields=["title", "content"])
        ys.index_batch("mut", self.DOCS)
        r = ys.search("mut", "rocket", limit=1, normalize=False)
        victim = r["doc_id"][0].as_py()
        assert ys.delete("mut", [victim]) == 1
        assert ys.count("mut", "rocket") == 1
        out = ys.optimize("mut")
        assert out["docs_removed"] == 1
        assert ys.stats("mut")["n_docs"] == 2

    def test_suggest_and_multi(self, ys):
        ys.create_index("a", fields=["title", "content"])
        ys.index_batch("a", self.DOCS)
        ys.create_index("b", fields=["title", "content"])
        ys.index_batch("b", self.DOCS[:1])
        m = ys.search_multiple(["a", "b"], "rocket", limit=10, normalize=False)
        assert set(m["_index"].to_pylist()) == {"a", "b"}

    def test_clear_and_drop(self, ys):
        ys.create_index("tmp", fields=["title", "content"])
        ys.index_batch("tmp", self.DOCS[:1])
        ys.clear("tmp")
        assert ys.stats("tmp")["n_docs"] == 0
        ys.drop("tmp")
        assert not ys.index_exists("tmp")

    def test_prefix_fixture_2d(self, ys):
        """FIXTURES.md §2d: 'sky*' returns exactly the Sky-titles."""
        docs = [{"content": {"title": t, "content": t.lower()}}
                for t in ["Skywalker", "Skyrim Guide", "Skylark", "Dark Knight"]]
        ys.create_index("sky", fields=["title", "content"])
        ys.index_batch("sky", docs)
        eng = ys.engine("sky")
        r = eng.search("sky", prefix_last=True, limit=10, normalize=False,
                       with_docs=True)
        titles = set(r["title"].to_pylist())
        assert titles == {"Skywalker", "Skyrim Guide", "Skylark"}
