"""DSL front-ends: text QueryParser, URLQueryParser, fluent QueryBuilder."""

import pytest

from yetisearch_ray.dsl import QueryBuilder, QueryParser, URLQueryParser
from yetisearch_ray.search.engine import SearchEngine, open_index


class TestQueryParser:
    def setup_method(self):
        self.p = QueryParser()

    def test_plain_terms_implicit_and(self):
        q = self.p.parse("parse buffer")
        assert q.terms == ["parse", "buffer"]
        kw = q.to_search_kwargs()
        assert kw["mode"] == "and" and kw["query"] == "parse buffer"

    def test_quoted_phrase(self):
        q = self.p.parse('"binary search" tree')
        assert q.phrases == ["binary search"]
        assert q.terms == ["tree"]

    def test_field_filters_with_ops(self):
        q = self.p.parse("config lang:python size:>100 weight:<=5")
        assert q.terms == ["config"]
        assert {"field": "lang", "operator": "=", "value": "python"} in q.filters
        assert {"field": "size", "operator": ">", "value": 100} in q.filters
        assert {"field": "weight", "operator": "<=", "value": 5} in q.filters

    def test_not_and_minus(self):
        q = self.p.parse("parse NOT legacy -deprecated")
        assert q.terms == ["parse"]
        assert q.exclude_terms == ["legacy", "deprecated"]

    def test_or_grouping(self):
        q = self.p.parse("rust OR golang")
        assert q.or_groups == [["rust", "golang"]]

    def test_quoted_filter_value(self):
        q = self.p.parse('author:"Jane Doe"')
        assert q.filters == [{"field": "author", "operator": "=", "value": "Jane Doe"}]


class TestURLParser:
    def setup_method(self):
        self.p = URLQueryParser()

    def test_basic(self):
        out = self.p.parse("q=hello+world&limit=5&offset=10&lang=en")
        assert out["query"] == "hello world"
        assert out["limit"] == 5 and out["offset"] == 10
        assert out["language"] == "en"

    def test_filters(self):
        out = self.p.parse("q=x&filter[lang]=python&filter[size][gte]=10"
                           "&filter[tag][in]=a,b,c")
        fs = {f["field"]: f for f in out["filters"]}
        assert fs["lang"]["operator"] == "=" and fs["lang"]["value"] == "python"
        assert fs["size"]["operator"] == ">=" and fs["size"]["value"] == 10
        assert fs["tag"]["operator"] == "in" and fs["tag"]["value"] == ["a", "b", "c"]

    def test_page_and_fuzzy(self):
        out = self.p.parse("q=x&page[limit]=7&page[offset]=3&fuzzy=true")
        assert out["limit"] == 7 and out["offset"] == 3 and out["fuzzy"] is True


@pytest.mark.usefixtures("ray_session")
class TestBuilderAndEndToEnd:
    def test_builder_spec(self):
        spec = (QueryBuilder().query("parse").where("lang", "python")
                .boost("path", 5.0).limit(7).min_score(0.1).build())
        assert spec["query"] == "parse"
        assert spec["filters"] == [{"field": "lang", "operator": "=", "value": "python"}]
        assert spec["field_weights"] == {"path": 5.0}
        assert spec["limit"] == 7

    def test_builder_execute(self, built_index):
        eng = SearchEngine(open_index(built_index))
        r = (QueryBuilder(eng).query("return").where("lang", "rust")
             .with_docs().limit(5).execute())
        assert r.num_rows > 0
        assert set(r["lang"].to_pylist()) == {"rust"}

    def test_parser_to_engine_not(self, built_index):
        eng = SearchEngine(open_index(built_index))
        parsed = QueryParser().parse("return -deadline")
        kw = parsed.to_search_kwargs()
        r = eng.search(kw["query"], mode="and", exclude_terms=kw["exclude_terms"],
                       limit=1000, normalize=False)
        with_dead = eng.search("return deadline", mode="and", limit=1000,
                               normalize=False)
        got = set(r["doc_id"].to_pylist())
        dead = set(with_dead["doc_id"].to_pylist())
        assert got and not (got & dead)

    def test_url_to_engine(self, built_index):
        eng = SearchEngine(open_index(built_index))
        out = URLQueryParser().parse("q=return&filter[lang]=go&limit=5")
        q = out.pop("query")
        out.pop("offset", None)
        r = eng.search(q, with_docs=True, **out)
        assert set(r["lang"].to_pylist()) <= {"go"}
