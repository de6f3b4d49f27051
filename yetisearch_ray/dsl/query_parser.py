"""Text query DSL (reference ``src/DSL/QueryParser.php``).

Grammar (regex tokenizer + single-pass parse, like the reference's
:55-87 tokenizer / :89-170 parse):

    query     := clause+
    clause    := [-|NOT] (phrase | filter | term) | clause OR clause
    phrase    := '"' text '"'
    filter    := field ':' (op)? value      op ∈ > >= < <= != =
    term      := bareword

AND is implicit between clauses (reference compiles implicit
conjunction); ``OR`` lowers adjacent terms into an any-of group;
``NOT x`` / ``-x`` excludes; ``field:value`` becomes a metadata filter
(bare field names route to metadata exactly like the reference's
QueryBuilder auto-prefixing, §2.14).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(
    r"""
    "(?P<phrase>[^"]*)"            # quoted phrase
  | (?P<filter>[A-Za-z_][\w.]*):(?P<op>>=|<=|!=|>|<|=)?(?P<fval>"[^"]*"|\S+)
  | (?P<or>OR)\b
  | (?P<not>NOT)\b
  | (?P<neg>-)(?=\S)
  | (?P<term>\S+)
    """,
    re.VERBOSE,
)

_OP_MAP = {None: "=", "=": "=", ">": ">", ">=": ">=", "<": "<", "<=": "<=",
           "!=": "!="}


@dataclass
class ParsedQuery:
    terms: list = field(default_factory=list)       # AND terms (strings)
    or_groups: list = field(default_factory=list)   # list[list[str]] any-of
    phrases: list = field(default_factory=list)     # quoted phrases
    exclude_terms: list = field(default_factory=list)
    filters: list = field(default_factory=list)     # {field, operator, value}

    def to_search_kwargs(self) -> dict:
        """Flatten into SearchEngine.search(...) arguments."""
        text_parts = list(self.terms)
        for g in self.or_groups:
            text_parts.extend(g)
        for p in self.phrases:
            text_parts.append(f'"{p}"')
        query = " ".join(text_parts)
        kwargs: dict = {"filters": self.filters or None}
        if self.terms and not self.or_groups and not self.phrases:
            kwargs["mode"] = "and"
        return {"query": query, **kwargs,
                "exclude_terms": list(self.exclude_terms)}


class QueryParser:
    def parse(self, text: str) -> ParsedQuery:
        out = ParsedQuery()
        pending_neg = False
        last_kind = None  # "term" | None — for OR lowering
        for m in _TOKEN_RE.finditer(text):
            if m.group("or") is not None:
                if out.terms:
                    seed = out.terms.pop()
                    out.or_groups.append([seed])
                    last_kind = "or"
                continue
            if m.group("not") is not None or m.group("neg") is not None:
                pending_neg = True
                continue
            if m.group("phrase") is not None:
                p = m.group("phrase").strip()
                if not p:
                    pending_neg = False
                    continue
                if pending_neg:
                    out.exclude_terms.append(p)
                else:
                    out.phrases.append(p)
                pending_neg = False
                last_kind = "phrase"
                continue
            if m.group("filter") is not None:
                v = m.group("fval").strip('"')
                val: object = v
                try:
                    val = int(v)
                except ValueError:
                    try:
                        val = float(v)
                    except ValueError:
                        pass
                out.filters.append({
                    "field": m.group("filter"),
                    "operator": _OP_MAP.get(m.group("op"), "="),
                    "value": val,
                })
                pending_neg = False
                last_kind = "filter"
                continue
            term = m.group("term")
            if term is None:
                continue
            if pending_neg:
                out.exclude_terms.append(term)
                pending_neg = False
            elif last_kind == "or" and out.or_groups:
                out.or_groups[-1].append(term)
                last_kind = "term"
            else:
                out.terms.append(term)
                last_kind = "term"
        return out
