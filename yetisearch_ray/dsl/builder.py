"""Fluent query builder (reference ``src/DSL/QueryBuilder.php`` /
``FluentQuery`` :241-430): chainable construction of a search call, with
auto ``metadata.``-style routing left to the engine's column filters."""

from __future__ import annotations


class QueryBuilder:
    def __init__(self, engine=None):
        self._engine = engine
        self._query = ""
        self._kwargs: dict = {}
        self._filters: list = []
        self._weights: dict = {}

    # ---- chainable -----------------------------------------------------
    def query(self, text: str) -> "QueryBuilder":
        self._query = text
        return self

    def filter(self, field: str, operator: str = "=", value=None) -> "QueryBuilder":
        self._filters.append({"field": field, "operator": operator, "value": value})
        return self

    def where(self, field: str, value) -> "QueryBuilder":
        return self.filter(field, "=", value)

    def where_in(self, field: str, values) -> "QueryBuilder":
        return self.filter(field, "in", list(values))

    def between(self, field: str, lo, hi) -> "QueryBuilder":
        return self.filter(field, "between", (lo, hi))

    def language(self, lang: str) -> "QueryBuilder":
        self._kwargs["language"] = lang
        return self

    def boost(self, field: str, weight: float) -> "QueryBuilder":
        self._weights[field] = float(weight)
        return self

    def fuzzy(self, on: bool = True, mode: str = "correction") -> "QueryBuilder":
        self._kwargs["fuzzy"] = on
        self._kwargs["fuzzy_mode"] = mode
        return self

    def limit(self, n: int) -> "QueryBuilder":
        self._kwargs["limit"] = int(n)
        return self

    def offset(self, n: int) -> "QueryBuilder":
        self._kwargs["offset"] = int(n)
        return self

    def unique_by_route(self, route_column: str = "route") -> "QueryBuilder":
        self._kwargs["unique_by_route"] = True
        self._kwargs["route_column"] = route_column
        return self

    def highlight(self, on: bool = True) -> "QueryBuilder":
        self._kwargs["highlight"] = on
        return self

    def with_docs(self, on: bool = True) -> "QueryBuilder":
        self._kwargs["with_docs"] = on
        return self

    def min_score(self, s: float) -> "QueryBuilder":
        self._kwargs["min_score"] = float(s)
        return self

    # ---- terminal ------------------------------------------------------
    def build(self) -> dict:
        kwargs = dict(self._kwargs)
        if self._filters:
            kwargs["filters"] = list(self._filters)
        if self._weights:
            kwargs["field_weights"] = dict(self._weights)
        return {"query": self._query, **kwargs}

    def execute(self, engine=None):
        eng = engine or self._engine
        if eng is None:
            raise ValueError("no engine bound; pass one to execute()")
        spec = self.build()
        q = spec.pop("query")
        return eng.search(q, **spec)
