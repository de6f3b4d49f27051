"""JSON-API-style URL query parser — faithful port of the reference
``src/DSL/URLQueryParser.php`` (:19-305):

- ``parse`` accepts a PARAMS dict (possibly nested:
  ``{"filter": {"author": {"eq": "John"}}}``) or a raw query string
  (``parse_from_query_string`` semantics — PHP ``parse_str`` nesting of
  ``filter[f][op]=v`` / ``page[limit]=n`` is reconstructed).
- ``q`` takes precedence over ``query``.
- operator map incl. ``eqor`` (=?), ``null``/``notnull``/``exists``.
- value coercion: comma list → array, 'true'/'false'/'null' → bool/None,
  numeric strings → int/float.
- sort: ``-field`` desc, ``field:dir``, comma lists; ``page[number]`` /
  ``page[size]``; fields as string/list/alias-map; ``boost[f]=w`` →
  field weights.

Output is a kwargs dict for ``SearchEngine.search`` plus ``query``.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl

_NESTED_RE = re.compile(r"^(\w+)((?:\[[\w.]*\])+)$")

_OPS = {"eq": "=", "eqor": "=?", "neq": "!=", "ne": "!=", "gt": ">",
        "gte": ">=", "lt": "<", "lte": "<=", "like": "like", "in": "in",
        "nin": "not in", "between": "between", "exists": "exists",
        "null": "is null", "notnull": "is not null"}


def _parse_value(v):
    """Reference ``parseValue`` (:263-289).  Deviation: elements of a
    comma list are ALSO coerced (bool/null/numeric) — the reference hands
    strings to SQLite, whose loose typing coerces at compare time, while
    this engine's typed numpy filters need real numbers for
    in/not-in/between on numeric columns."""
    if isinstance(v, str):
        if "," in v:
            return [_parse_scalar(x.strip()) for x in v.split(",")]
        return _parse_scalar(v)
    return v


def _parse_scalar(v: str):
    if v == "true":
        return True
    if v == "false":
        return False
    if v == "null":
        return None
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _qs_to_params(query_string: str) -> dict:
    """Rebuild PHP parse_str's nested arrays from bracketed keys."""
    params: dict = {}
    for k, v in parse_qsl(query_string, keep_blank_values=True):
        m = _NESTED_RE.match(k)
        if not m:
            params[k] = v
            continue
        root, rest = m.group(1), m.group(2)
        keys = [root] + re.findall(r"\[([\w.]*)\]", rest)
        node = params
        for kk in keys[:-1]:
            child = node.get(kk)
            if not isinstance(child, dict):  # scalar collision: replace,
                child = {}                   # as PHP parse_str does
                node[kk] = child
            node = child
        node[keys[-1]] = v
    return params


class URLQueryParser:
    def __init__(self, field_aliases: dict | None = None):
        self.field_aliases = dict(field_aliases or {})

    def parse(self, params) -> dict:
        """Params dict or raw query string → SearchEngine.search kwargs."""
        if isinstance(params, str):
            params = _qs_to_params(params)
        out: dict = {"query": str(params.get("q", params.get("query", ""))),
                     "filters": [], "limit": 20, "offset": 0}

        flt = params.get("filter")
        if isinstance(flt, dict):
            for field, conditions in flt.items():
                name = self.field_aliases.get(field, field)
                if isinstance(conditions, dict):
                    for op, value in conditions.items():
                        out["filters"].append({
                            "field": name,
                            "operator": _OPS.get(str(op).lower(), "="),
                            "value": _parse_value(value),
                        })
                else:
                    out["filters"].append({"field": name, "operator": "=",
                                           "value": _parse_value(conditions)})

        sort = params.get("sort")
        if isinstance(sort, str) and sort:
            pairs = []
            for f in (x.strip() for x in sort.split(",")):
                if not f:
                    continue
                if f.startswith("-"):
                    pairs.append((f[1:], "desc"))
                elif ":" in f:
                    name, direction = f.split(":", 1)
                    pairs.append((name, direction))
                else:
                    pairs.append((f, "asc"))
            if pairs:
                # engine supports one sort column; secondary sorts are
                # dropped (the output must stay a pure search() kwargs
                # dict)
                out["sort"] = pairs[0]

        fields = params.get("fields")
        if isinstance(fields, str) and fields:
            out["result_fields"] = [x.strip() for x in fields.split(",")]
        elif isinstance(fields, dict):
            out["result_fields"] = list(fields.keys())
        elif isinstance(fields, list):
            out["result_fields"] = list(fields)

        page = params.get("page")
        if isinstance(page, dict):
            if "limit" in page:
                out["limit"] = int(page["limit"])
            if "offset" in page:
                out["offset"] = int(page["offset"])
            if "number" in page and "size" in page:
                n = max(1, int(page["number"]))
                size = max(1, int(page["size"]))
                out["limit"] = size
                out["offset"] = (n - 1) * size
        elif isinstance(page, str) and page:
            n = max(1, int(page))
            out["limit"] = 20
            out["offset"] = (n - 1) * 20

        if "limit" in params:
            out["limit"] = int(params["limit"])
        if "offset" in params:
            out["offset"] = int(params["offset"])
        if "fuzzy" in params:
            fz = params["fuzzy"]
            out["fuzzy"] = fz if isinstance(fz, bool) else fz in ("true", "1")
        if "highlight" in params:
            hv = params["highlight"]
            out["highlight"] = hv is True or hv in ("true", "1")
        lang = params.get("language", params.get("lang"))
        if lang:
            out["language"] = lang
        boost = params.get("boost")
        if isinstance(boost, dict):
            out["field_weights"] = {f: float(w) for f, w in boost.items()}
        geo = params.get("geo")
        if isinstance(geo, dict):
            gf: dict = {}
            near = geo.get("near")
            if isinstance(near, dict) and {"lat", "lng", "radius"} <= set(near):
                gf["near"] = {"lat": float(near["lat"]),
                              "lng": float(near["lng"]),
                              "radius_km": float(near["radius"])}
            within = geo.get("within")
            if isinstance(within, dict) and \
                    {"north", "south", "east", "west"} <= set(within):
                gf["within"] = {"bounds": (float(within["south"]),
                                           float(within["north"]),
                                           float(within["west"]),
                                           float(within["east"]))}
            gsort = geo.get("sort")
            if isinstance(gsort, dict):
                if "near" not in gf and {"lat", "lng"} <= set(gsort):
                    # sort-only: the engine's geo path needs a near
                    # filter; full-earth radius keeps every doc in range
                    gf["near"] = {"lat": float(gsort["lat"]),
                                  "lng": float(gsort["lng"]),
                                  "radius_km": 20037.5}
                gf["sort_by_distance"] = True
            if gf:
                out["geo_filters"] = gf
        if not out["filters"]:
            out.pop("filters")
        return out

    # reference parseFromQueryString
    def parse_from_query_string(self, query_string: str) -> dict:
        return self.parse(_qs_to_params(query_string))
