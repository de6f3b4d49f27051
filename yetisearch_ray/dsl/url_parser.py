"""JSON-API-style URL query parser (reference ``src/DSL/URLQueryParser.php``
:19-110): ``?q=...&filter[field][op]=v&sort=-score&page[limit]=10``."""

from __future__ import annotations

import re
from urllib.parse import parse_qsl

_FILTER_RE = re.compile(r"^filter\[([\w.]+)\](?:\[(\w+)\])?$")
_PAGE_RE = re.compile(r"^page\[(limit|offset)\]$")

_OPS = {"eq": "=", "ne": "!=", "neq": "!=", "gt": ">", "gte": ">=",
        "lt": "<", "lte": "<=", "in": "in", "nin": "not in",
        "between": "between", "like": "like", "contains": "contains",
        "exists": "exists", "null": "is null"}


def _coerce(v: str):
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


class URLQueryParser:
    def parse(self, query_string: str) -> dict:
        """Returns kwargs for SearchEngine.search plus 'query'."""
        out: dict = {"query": "", "filters": [], "limit": 20, "offset": 0}
        for k, v in parse_qsl(query_string, keep_blank_values=True):
            if k == "q":
                out["query"] = v
                continue
            m = _FILTER_RE.match(k)
            if m:
                fld, op = m.group(1), (m.group(2) or "eq").lower()
                operator = _OPS.get(op, "=")
                val: object
                if operator in ("in", "not in", "between"):
                    val = [_coerce(x) for x in v.split(",")]
                else:
                    val = _coerce(v)
                out["filters"].append({"field": fld, "operator": operator,
                                       "value": val})
                continue
            m = _PAGE_RE.match(k)
            if m:
                out[m.group(1)] = int(v)
                continue
            if k == "limit" or k == "offset":
                out[k] = int(v)
            elif k == "lang" or k == "language":
                out["language"] = v
            elif k == "fuzzy":
                out["fuzzy"] = v.lower() in ("1", "true", "yes")
            elif k == "sort":
                out["sort"] = v  # "-score" (default) | column name
            elif k == "fields":
                out["result_fields"] = v.split(",")
        if not out["filters"]:
            out.pop("filters")
        return out
