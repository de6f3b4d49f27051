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


class TestReferenceQueryParser:
    """Vectors transcribed from the reference's
    tests/DSL/QueryParserDetailedTest.php — incl. the documented
    tokenizer quirks (positive numbers parse as strings, LIMIT with a
    positive literal falls back to defaults)."""

    def setup_method(self):
        from yetisearch_ray.dsl import ReferenceQueryParser

        self.p = ReferenceQueryParser()

    def test_empty_and_plain_queries(self):
        r = self.p.parse("")
        assert r.query == "" and r.filters == []
        r = self.p.parse("golang")
        assert r.query == "golang" and r.filters == []
        assert self.p.parse("golang tutorial advanced").query == \
            "golang tutorial advanced"
        assert self.p.parse('"hello world"').query == "hello world"

    def test_equality_filters(self):
        r = self.p.parse('author = "John Doe"')
        assert r.filters == [{"field": "author", "operator": "=",
                              "value": "John Doe"}]
        assert self.p.parse("author = 'Jane Smith'").filters[0]["value"] == \
            "Jane Smith"
        assert self.p.parse("status = published").filters[0]["value"] == \
            "published"

    def test_numeric_value_quirks(self):
        # positive numbers tokenize as field -> strings
        assert self.p.parse("count = 42").filters[0]["value"] == "42"
        assert self.p.parse("price = 19.99").filters[0]["value"] == "19.99"
        # negative numbers tokenize as number -> int/float
        assert self.p.parse("score = -5").filters[0]["value"] == -5
        assert self.p.parse("score = -3.5").filters[0]["value"] == -3.5
        f = self.p.parse("score > -10").filters[0]
        assert f["operator"] == ">" and f["value"] == -10

    def test_comparison_operators(self):
        assert self.p.parse('status != "deleted"').filters[0]["operator"] == "!="
        assert self.p.parse('price > "100"').filters[0]["operator"] == ">"
        assert self.p.parse('price < "50"').filters[0]["operator"] == "<"
        assert self.p.parse('rating >= "4"').filters[0]["operator"] == ">="
        assert self.p.parse('rating <= "3"').filters[0]["operator"] == "<="
        f = self.p.parse('category =? "tech"').filters[0]
        assert f["operator"] == "=?" and f["value"] == "tech"

    def test_like_operator(self):
        f = self.p.parse('title LIKE "%golang%"').filters[0]
        assert f["operator"] == "like" and f["value"] == "%golang%"
        f = self.p.parse("title LIKE %golang%").filters[0]
        assert f["operator"] == "like" and f["value"] == "%golang%"

    def test_in_operators(self):
        f = self.p.parse("status IN [draft, published, archived]").filters[0]
        assert f["operator"] == "in"
        assert f["value"] == ["draft", "published", "archived"]
        assert self.p.parse("status IN [published]").filters[0]["value"] == \
            ["published"]
        assert self.p.parse('author IN ["John Doe", "Jane Smith"]'
                            ).filters[0]["value"] == ["John Doe", "Jane Smith"]
        # positive numbers in arrays are strings (tokenizer quirk)
        assert self.p.parse("rating IN [1, 2, 3, 4, 5]").filters[0]["value"] \
            == ["1", "2", "3", "4", "5"]
        f = self.p.parse("status NOT IN [draft, deleted]").filters[0]
        assert f["operator"] == "not in" and f["value"] == ["draft", "deleted"]

    def test_multiple_filters_and_grouping(self):
        r = self.p.parse('status = "published" AND author = "John"')
        assert [f["field"] for f in r.filters] == ["status", "author"]
        r = self.p.parse('status = "published" OR status = "featured"')
        assert len(r.filters) == 2
        r = self.p.parse('price > "10" AND price < "100" AND status = "active"')
        assert [f["operator"] for f in r.filters] == [">", "<", "="]
        r = self.p.parse('(status = "published" OR status = "featured") '
                         'AND author = "John"')
        assert len(r.filters) >= 2
        r = self.p.parse('(status = "published") AND (category = "tech")')
        assert len(r.filters) >= 2

    def test_query_text_with_filters(self):
        r = self.p.parse('golang tutorial author = "John"')
        assert r.query == "golang tutorial"
        assert r.filters[0]["field"] == "author"
        r = self.p.parse('search terms status = "published" AND rating > "3"')
        assert r.query == "search terms" and len(r.filters) == 2

    def test_fields_and_sort(self):
        r = self.p.parse("FIELDS title, author, body")
        assert r.fields == ["title", "author", "body"]
        r = self.p.parse("FIELDS title:t, author:a")
        assert r.fields == {"title": "t", "author": "a"}
        r = self.p.parse('author = "John" FIELDS title, body')
        assert len(r.filters) == 1 and r.fields == ["title", "body"]
        r = self.p.parse("SORT title")
        assert r.sort == {"title": "asc"}
        r = self.p.parse("SORT title, author")
        assert set(r.sort) == {"title", "author"}
        r = self.p.parse('status = "published" SORT created_at')
        assert r.sort == {"created_at": "asc"}

    def test_pagination_quirks(self):
        # positive literals after LIMIT/OFFSET tokenize as fields -> defaults
        r = self.p.parse("LIMIT 50")
        assert r.limit == 20
        r = self.p.parse("OFFSET 20")
        assert r.offset == 0
        r = self.p.parse("PAGE 1")
        assert r.limit == 10 and r.offset == 0

    def test_field_aliases(self):
        from yetisearch_ray.dsl import ReferenceQueryParser

        p = ReferenceQueryParser({"writer": "author", "cat": "category"})
        r = p.parse('writer = "John" AND cat = "tech"')
        assert [f["field"] for f in r.filters] == ["author", "category"]
        assert p.parse('status = "published"').filters[0]["field"] == "status"

    def test_dot_notation_fields(self):
        assert self.p.parse('metadata.author = "John"').filters[0]["field"] \
            == "metadata.author"
        assert self.p.parse('metadata.address.city = "NYC"'
                            ).filters[0]["field"] == "metadata.address.city"

    def test_combined_clauses(self):
        r = self.p.parse('status = "published" FIELDS title, body '
                         'SORT created_at')
        assert len(r.filters) == 1 and len(r.fields) == 2
        assert "created_at" in r.sort
        r = self.p.parse('tutorial author = "John" SORT title')
        assert r.query == "tutorial" and len(r.filters) == 1
        assert "title" in r.sort


class TestURLParserReferenceVectors:
    """Vectors from the reference tests/DSL/URLQueryParserTest.php."""

    def setup_method(self):
        self.p = URLQueryParser()

    def test_query_sources_and_precedence(self):
        assert self.p.parse({})["query"] == ""
        assert self.p.parse({"q": "golang tutorial"})["query"] == \
            "golang tutorial"
        assert self.p.parse({"query": "search terms"})["query"] == \
            "search terms"
        assert self.p.parse({"q": "primary", "query": "secondary"}
                            )["query"] == "primary"

    def test_from_raw_query_string(self):
        out = self.p.parse("q=hello+world&limit=5")
        assert out["query"] == "hello world" and out["limit"] == 5
        out = self.p.parse("q=test&filter[status][eq]=published")
        f = out["filters"][0]
        assert f["field"] == "status" and f["operator"] == "="

    def test_operator_map(self):
        def op(cond):
            return self.p.parse({"filter": cond})["filters"][0]

        assert op({"author": {"eq": "John"}})["operator"] == "="
        assert op({"author": {"eq": "John"}})["value"] == "John"
        assert op({"category": {"eqor": "tech"}})["operator"] == "=?"
        assert op({"status": {"neq": "deleted"}})["operator"] == "!="
        assert op({"status": {"ne": "deleted"}})["operator"] == "!="
        f = op({"price": {"gt": "100"}})
        assert f["operator"] == ">" and f["value"] == 100
        assert op({"rating": {"gte": "4"}})["operator"] == ">="
        assert op({"price": {"lt": "50"}})["operator"] == "<"
        assert op({"price": {"lte": "50"}})["operator"] == "<="
        f = op({"title": {"like": "%golang%"}})
        assert f["operator"] == "like" and f["value"] == "%golang%"
        f = op({"status": {"in": "published,featured,archived"}})
        assert f["operator"] == "in"
        assert f["value"] == ["published", "featured", "archived"]
        f = op({"status": {"nin": "draft,deleted"}})
        assert f["operator"] == "not in"
        assert f["value"] == ["draft", "deleted"]
        assert op({"price": {"between": "10,100"}})["operator"] == "between"
        assert op({"meta": {"exists": "true"}})["operator"] == "exists"
        assert op({"meta": {"null": "true"}})["operator"] == "is null"
        assert op({"meta": {"notnull": "true"}})["operator"] == "is not null"

    def test_simple_equality_and_multiple_filters(self):
        f = self.p.parse({"filter": {"status": "published"}})["filters"][0]
        assert f["operator"] == "=" and f["value"] == "published"
        out = self.p.parse({"filter": {"price": {"gt": "10", "lt": "100"}}})
        assert [f["field"] for f in out["filters"]] == ["price", "price"]

    def test_value_coercions(self):
        def val(cond):
            return self.p.parse({"filter": cond})["filters"][0]["value"]

        assert val({"active": {"eq": "true"}}) is True
        assert val({"active": {"eq": "false"}}) is False
        assert val({"deleted_at": {"eq": "null"}}) is None
        assert val({"count": {"eq": "42"}}) == 42
        assert val({"price": {"eq": "19.99"}}) == 19.99
        assert val({"tag": {"eq": "php,golang,rust"}}) == \
            ["php", "golang", "rust"]

    def test_sort_fields_pagination(self):
        out = self.p.parse({"sort": "-created_at,title:desc,name"})
        assert out["sort"] == ("created_at", "desc")
        assert "sort_all" not in out  # output stays a pure search() kwargs dict
        out = self.p.parse({"fields": "title, body"})
        assert out["result_fields"] == ["title", "body"]
        out = self.p.parse({"fields": {"title": "t", "body": "b"}})
        assert out["result_fields"] == ["title", "body"]
        out = self.p.parse({"page": {"limit": "10", "offset": "20"}})
        assert out["limit"] == 10 and out["offset"] == 20
        out = self.p.parse({"page": {"number": "3", "size": "15"}})
        assert out["limit"] == 15 and out["offset"] == 30
        out = self.p.parse({"page": "2"})
        assert out["limit"] == 20 and out["offset"] == 20

    def test_boost_and_geo(self):
        out = self.p.parse({"boost": {"title": "3.0", "content": "1.0"}})
        assert out["field_weights"] == {"title": 3.0, "content": 1.0}
        out = self.p.parse({"geo": {"near": {"lat": "37.7", "lng": "-122.4",
                                             "radius": "5"}}})
        assert out["geo_filters"]["near"]["radius_km"] == 5.0
        out = self.p.parse(
            "geo[within][north]=38&geo[within][south]=37"
            "&geo[within][east]=-122&geo[within][west]=-123")
        assert out["geo_filters"]["within"]["bounds"] == \
            (37.0, 38.0, -123.0, -122.0)

    def test_field_aliases(self):
        p = URLQueryParser({"writer": "author"})
        f = p.parse({"filter": {"writer": {"eq": "John"}}})["filters"][0]
        assert f["field"] == "author"


class TestFluentBuilderReferenceVectors:
    """Vectors from the reference tests/DSL/FluentQueryTest.php, mapped
    onto QueryBuilder.build() output."""

    def test_query_and_search_override(self):
        assert QueryBuilder().build()["query"] == ""
        assert QueryBuilder().query("hello").build()["query"] == "hello"
        assert QueryBuilder().query("a").search("b").build()["query"] == "b"

    def test_where_forms(self):
        b = QueryBuilder().where("status", "published")
        assert b.build()["filters"] == [
            {"field": "status", "operator": "=", "value": "published"}]
        f = QueryBuilder().where("price", 100, ">").build()["filters"][0]
        assert f["operator"] == ">" and f["value"] == 100
        f = QueryBuilder().where_not("status", "deleted").build()["filters"][0]
        assert f["operator"] == "!="
        spec = (QueryBuilder().where("a", 1).where("b", 2)
                .where("c", 3).build())
        assert [f["field"] for f in spec["filters"]] == ["a", "b", "c"]

    def test_where_collections_and_null(self):
        f = QueryBuilder().where_in("status", ["a", "b"]).build()["filters"][0]
        assert f["operator"] == "in" and f["value"] == ["a", "b"]
        f = QueryBuilder().where_not_in("s", ["x"]).build()["filters"][0]
        assert f["operator"] == "not in"
        f = QueryBuilder().where_like("title", "%go%").build()["filters"][0]
        assert f["operator"] == "like" and f["value"] == "%go%"
        assert QueryBuilder().where_null("d").build()["filters"][0][
            "operator"] == "is null"
        assert QueryBuilder().where_not_null("d").build()["filters"][0][
            "operator"] == "is not null"
        f = QueryBuilder().where_between("p", 10, 100).build()["filters"][0]
        assert f["operator"] == "between" and f["value"] == (10, 100)

    def test_fields_order_pagination(self):
        assert QueryBuilder().fields(["title", "body"]).build()[
            "result_fields"] == ["title", "body"]
        assert QueryBuilder().order_by("title").build()["sort"] == \
            ("title", "asc")
        assert QueryBuilder().order_by("price", "desc").build()["sort"] == \
            ("price", "desc")
        assert QueryBuilder().limit(5).build()["limit"] == 5
        assert QueryBuilder().offset(10).build()["offset"] == 10
        spec = QueryBuilder().page(3, 15).build()
        assert spec["limit"] == 15 and spec["offset"] == 30
        spec = QueryBuilder().page(2).build()
        assert spec["limit"] == 20 and spec["offset"] == 20
        assert QueryBuilder().page(1).build()["offset"] == 0

    def test_fuzzy_and_highlight(self):
        spec = QueryBuilder().fuzzy().build()
        assert spec["fuzzy"] is True
        assert QueryBuilder().fuzzy(False).build()["fuzzy"] is False
        assert QueryBuilder().fuzzy(True, 0.6).build()["fuzziness"] == 0.6
        assert QueryBuilder().highlight().build()["highlight"] is True
        assert QueryBuilder().highlight(False).build()["highlight"] is False

    def test_geo_chain(self):
        spec = QueryBuilder().near_point(37.7, -122.4, 5.0).build()
        assert spec["geo_filters"]["near"]["radius_km"] == 5.0
        spec = QueryBuilder().within_bounds(38, 37, -122, -123).build()
        assert spec["geo_filters"]["within"]["bounds"] == \
            (37.0, 38.0, -123.0, -122.0)
        spec = QueryBuilder().sort_by_distance(37.7, -122.4).build()
        assert spec["geo_filters"]["sort_by_distance"] is True
