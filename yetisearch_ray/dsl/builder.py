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

    # reference FluentQuery::search (:259) — overrides the initial text
    search = query

    def filter(self, field: str, operator: str = "=", value=None) -> "QueryBuilder":
        self._filters.append({"field": field, "operator": operator, "value": value})
        return self

    def where(self, field: str, value, operator: str = "=") -> "QueryBuilder":
        """Reference ``where($field, $value, $operator = '=')`` (:265)."""
        return self.filter(field, operator, value)

    def where_not(self, field: str, value) -> "QueryBuilder":
        return self.filter(field, "!=", value)

    def where_in(self, field: str, values) -> "QueryBuilder":
        return self.filter(field, "in", list(values))

    def where_not_in(self, field: str, values) -> "QueryBuilder":
        return self.filter(field, "not in", list(values))

    def where_like(self, field: str, pattern: str) -> "QueryBuilder":
        return self.filter(field, "like", pattern)

    def where_null(self, field: str) -> "QueryBuilder":
        return self.filter(field, "is null", None)

    def where_not_null(self, field: str) -> "QueryBuilder":
        return self.filter(field, "is not null", None)

    def where_between(self, field: str, lo, hi) -> "QueryBuilder":
        return self.filter(field, "between", (lo, hi))

    between = where_between

    def fields(self, names) -> "QueryBuilder":
        self._kwargs["result_fields"] = list(names)
        return self

    def order_by(self, field: str, direction: str = "asc") -> "QueryBuilder":
        self._kwargs["sort"] = (field, direction)
        return self

    def page(self, page: int, per_page: int = 20) -> "QueryBuilder":
        """Reference ``page($page, $perPage = 20)`` (:331)."""
        self._kwargs["limit"] = int(per_page)
        self._kwargs["offset"] = (max(1, int(page)) - 1) * int(per_page)
        return self

    def language(self, lang: str) -> "QueryBuilder":
        self._kwargs["language"] = lang
        return self

    def boost(self, field: str, weight: float) -> "QueryBuilder":
        self._weights[field] = float(weight)
        return self

    def fuzzy(self, on: bool = True, fuzziness: float | None = None,
              mode: str = "correction") -> "QueryBuilder":
        self._kwargs["fuzzy"] = on
        self._kwargs["fuzzy_mode"] = mode
        if fuzziness is not None:
            self._kwargs["fuzziness"] = float(fuzziness)
        return self

    def near_point(self, lat: float, lng: float,
                   radius_km: float) -> "QueryBuilder":
        self._kwargs.setdefault("geo_filters", {})["near"] = {
            "lat": float(lat), "lng": float(lng),
            "radius_km": float(radius_km)}
        return self

    def within_bounds(self, north: float, south: float, east: float,
                      west: float) -> "QueryBuilder":
        self._kwargs.setdefault("geo_filters", {})["within"] = {
            "bounds": (float(south), float(north), float(west),
                       float(east))}
        return self

    def sort_by_distance(self, lat: float, lng: float,
                         direction: str = "asc") -> "QueryBuilder":
        gf = self._kwargs.setdefault("geo_filters", {})
        near = gf.setdefault("near", {})
        near.setdefault("lat", float(lat))
        near.setdefault("lng", float(lng))
        # sort-only chains need a radius for the engine's near filter;
        # half the Earth's circumference keeps every doc in range
        near.setdefault("radius_km", 20037.5)
        gf["sort_by_distance"] = True
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
        spec.pop("fuzziness", None)  # engine-level knob, kept in build()
        return eng.search(q, **spec)
