"""Faithful port of the reference's text query DSL
(``src/DSL/QueryParser.php:1-552``): the SQL-ish grammar

    free text author = "John" AND price > -10 status IN [a, b]
    FIELDS title, body SORT created_at PAGE 2,10

Documented quirks reproduced on purpose (pinned by the reference's own
``tests/DSL/QueryParserDetailedTest.php``):

- POSITIVE numbers tokenize as ``field`` (the field alternative precedes
  the number alternative), so ``count = 42`` yields the STRING "42" and
  ``LIMIT 50`` silently falls back to the default limit; NEGATIVE
  numbers tokenize as ``number`` and cast to int/float.
- Grouped/parenthesized conditions flatten into the filter list.
- ``=?`` (equals-or-null) is preserved; ``LIKE``/``IN``/``NOT IN``
  lowercase.
- ``PAGE n,size`` computes limit/offset; bare defaults are limit 20 /
  offset 0 (the reference SearchQuery defaults).
- a bare ``-`` (``SORT -field``, value negation) never survives the
  reference's tokenizer either — PHP's preg_match_all drops unmatched
  characters, so descending SORT and operator negation are dead grammar
  in BOTH implementations; use ``field:desc``-style sorting via the URL
  parser or the fluent builder instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

_TOKEN_RE = re.compile(
    r"""
    (?P<string>"[^"]*"|'[^']*')                                   |
    (?P<operator>=\?|!=|>=|<=|>|<|=|LIKE|IN|NOT\s+IN|AND|OR)      |
    (?P<keyword>FIELDS|SORT|PAGE|LIMIT|OFFSET|FUZZY|HIGHLIGHT|NEAR|WITHIN) |
    (?P<field>\w+(?:\.\w+)*)                                      |
    (?P<bracket>\[|\])                                            |
    (?P<paren>\(|\))                                              |
    (?P<comma>,)                                                  |
    (?P<colon>:)                                                  |
    (?P<number>-?\d+\.?\d*)                                       |
    (?P<wildcard>%\w*%)                                           |
    (?P<whitespace>\s+)
    """,
    re.IGNORECASE | re.VERBOSE,
)

_OP_MAP = {"=": "=", "!=": "!=", ">": ">", "<": "<", ">=": ">=",
           "<=": "<=", "LIKE": "like", "IN": "in", "NOT IN": "not in"}
_NEGATE = {"=": "!=", "!=": "=", "=?": "!=", ">": "<=", "<": ">=",
           ">=": "<", "<=": ">", "like": "not like", "in": "not in",
           "not in": "in"}


@dataclass
class RefParsedQuery:
    query: str = ""
    filters: list = dc_field(default_factory=list)
    fields: object = dc_field(default_factory=list)  # list or {name: alias}
    sort: dict = dc_field(default_factory=dict)
    limit: int = 20    # reference SearchQuery defaults
    offset: int = 0

    def to_search_kwargs(self) -> dict:
        kw: dict = {"query": self.query, "limit": self.limit,
                    "offset": self.offset}
        if self.filters:
            kw["filters"] = [f for f in self.filters
                             if f.get("field") != "_geo"]
        if self.sort:
            col, direction = next(iter(self.sort.items()))
            kw["sort"] = (col, direction)
        if self.fields:
            names = (list(self.fields.keys())
                     if isinstance(self.fields, dict) else list(self.fields))
            kw["result_fields"] = names
        return kw


class ReferenceQueryParser:
    """Recursive-descent parser over the regex token stream, mirroring
    the reference's control flow method-for-method."""

    def __init__(self, field_aliases: dict | None = None):
        self.field_aliases = dict(field_aliases or {})
        self._tokens: list[tuple[str, str]] = []
        self._pos = 0

    # ---------------------------------------------------------- public
    def parse(self, text: str) -> RefParsedQuery:
        self._tokens = self._tokenize(text)
        self._pos = 0
        out = RefParsedQuery()
        query_parts: list[str] = []
        in_query = True

        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype == "keyword":
                in_query = False
                kw = tval.upper()
                if kw == "FIELDS":
                    self._next()
                    out.fields = self._parse_fields()
                elif kw == "SORT":
                    self._next()
                    out.sort = self._parse_sort()
                elif kw in ("PAGE", "LIMIT", "OFFSET"):
                    self._next()
                    pag = self._parse_pagination(kw)
                    if "limit" in pag:
                        out.limit = pag["limit"]
                    if "offset" in pag:
                        out.offset = pag["offset"]
                elif kw in ("NEAR", "WITHIN"):
                    self._next()
                    out.filters.append({"field": "_geo",
                                        "operator": kw.lower(),
                                        "value": []})
                else:
                    self._next()
            elif in_query and self._is_condition():
                in_query = False
                out.filters.extend(self._parse_conditions())
            elif in_query:
                if ttype == "string":
                    query_parts.append(tval.strip("\"'"))
                else:
                    query_parts.append(tval)
                self._next()
            else:
                if self._is_condition():
                    out.filters.extend(self._parse_conditions())
                else:
                    self._next()

        out.query = " ".join(query_parts).strip()
        return out

    # ------------------------------------------------------- internals
    @staticmethod
    def _tokenize(text: str) -> list[tuple[str, str]]:
        tokens = []
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind and kind != "whitespace" and m.group(kind):
                tokens.append((kind, m.group(kind)))
        return tokens

    def _current(self):
        return (self._tokens[self._pos] if self._pos < len(self._tokens)
                else (None, None))

    def _peek(self):
        return (self._tokens[self._pos + 1]
                if self._pos + 1 < len(self._tokens) else (None, None))

    def _next(self):
        self._pos += 1

    def _is_condition(self) -> bool:
        if self._pos >= len(self._tokens) - 1:
            return False
        cur, _ = self._current()
        nxt, _v = self._peek()
        return cur == "field" and nxt == "operator"

    def _parse_conditions(self) -> list[dict]:
        conditions: list[dict] = []
        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype is None:
                break
            if ttype == "operator" and tval.upper() in ("AND", "OR"):
                self._next()
                continue
            if ttype == "paren" and tval == "(":
                self._next()
                # reference collects grouped conditions separately; the
                # observable behavior (its tests) is that they surface in
                # the flat filter list
                conditions.extend(self._parse_grouped())
                continue
            if ttype == "keyword":
                break
            if self._is_condition():
                cond = self._parse_condition()
                if cond:
                    conditions.append(cond)
            else:
                break
        return conditions

    def _parse_grouped(self) -> list[dict]:
        conditions: list[dict] = []
        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype is None:
                break
            if ttype == "paren" and tval == ")":
                self._next()
                break
            if self._is_condition():
                cond = self._parse_condition()
                if cond:
                    conditions.append(cond)
            else:
                self._next()
        return conditions

    def _parse_condition(self) -> dict | None:
        ttype, tval = self._current()
        if ttype != "field":
            return None
        field_name = self.field_aliases.get(tval, tval)
        self._next()
        otype, oval = self._current()
        if otype != "operator":
            return None
        op = ("=?" if oval == "=?" else _OP_MAP.get(
            re.sub(r"\s+", " ", oval.upper()), "="))
        self._next()
        negate = False
        _, nval = self._current()
        if nval == "-":
            negate = True
            self._next()
        value = self._parse_value()
        if negate:
            op = _NEGATE.get(op, op)
        return {"field": field_name, "operator": op, "value": value}

    def _parse_value(self):
        ttype, tval = self._current()
        if ttype is None:
            return None
        if ttype == "bracket" and tval == "[":
            return self._parse_array_value()
        if ttype == "string":
            self._next()
            return tval.strip("\"'")
        if ttype == "number":
            self._next()
            return float(tval) if "." in tval else int(tval)
        if ttype in ("wildcard", "field"):
            self._next()
            return tval
        self._next()
        return tval

    def _parse_array_value(self) -> list:
        values = []
        self._next()  # skip [
        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype is None:
                break
            if ttype == "bracket" and tval == "]":
                self._next()
                break
            if ttype == "comma":
                self._next()
                continue
            values.append(self._parse_value())
        return values

    def _parse_fields(self):
        fields: list = []
        field_map: dict = {}
        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype is None or ttype == "keyword":
                break
            if ttype == "field":
                name = tval
                self._next()
                ctype, _ = self._current()
                if ctype == "colon":
                    self._next()
                    atype, aval = self._current()
                    if atype == "field":
                        field_map[name] = aval
                        self._next()
                else:
                    fields.append(name)
            elif ttype == "comma":
                self._next()
            else:
                break
        return field_map if field_map else fields

    def _parse_sort(self) -> dict:
        sort: dict = {}
        while self._pos < len(self._tokens):
            ttype, tval = self._current()
            if ttype is None or ttype == "keyword":
                break
            direction = "asc"
            if tval == "-":
                direction = "desc"
                self._next()
                ttype, tval = self._current()
            if ttype == "field":
                sort[tval] = direction
                self._next()
            ctype, _ = self._current()
            if ctype == "comma":
                self._next()
        return sort

    def _parse_pagination(self, keyword: str) -> dict:
        result: dict = {}
        if keyword == "PAGE":
            page_num, page_size = 1, 10
            ttype, tval = self._current()
            if ttype == "number":
                page_num = int(float(tval))
                self._next()
                ctype, _ = self._current()
                if ctype == "comma":
                    self._next()
                    ntype, nval = self._current()
                    if ntype == "number":
                        page_size = int(float(nval))
                        self._next()
            result["limit"] = page_size
            result["offset"] = (page_num - 1) * page_size
        elif keyword == "LIMIT":
            ttype, tval = self._current()
            if ttype == "number":  # positive ints tokenize as field: quirk
                result["limit"] = int(float(tval))
                self._next()
        elif keyword == "OFFSET":
            ttype, tval = self._current()
            if ttype == "number":
                result["offset"] = int(float(tval))
                self._next()
        return result
