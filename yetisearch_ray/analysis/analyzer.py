"""Query-side text analysis chain (StandardAnalyzer equivalent).

Mirrors the semantics of the reference's ``StandardAnalyzer``
(``src/Analyzers/StandardAnalyzer.php:44-134``): normalize unicode
whitespace / control chars / smart quotes, expand contractions, strip
punctuation (keeping ``' -``), lowercase, split on whitespace, length-filter
(2..50), remove stopwords.  Per reference semantics (SURVEY.md §1.3) this
chain is applied to QUERIES only — the index side tokenizes raw text with
the unicode61-equivalent tokenizer, and stemming is never applied on the
match path (it only feeds ``extract_keywords``).
"""

from __future__ import annotations

import re

from .stopwords import stopwords_for
from .tokenizer import tokenize as u61_tokenize
from ..functions.stemmer import stem as _stem

_WS_RE = re.compile(r"[\s\u00a0\u2000-\u200b\u2028\u2029\u3000]+")
_CTRL_RE = re.compile(r"[\x00-\x1f\x7f\u200c-\u200f\u2060\ufeff]")
_PUNCT_RE = re.compile(r"[^\w\s'\-]", re.UNICODE)
_NUM_RE = re.compile(r"^\d+$")

_SMART = {
    "‘": "'",
    "’": "'",
    "‚": "'",
    "“": '"',
    "”": '"',
    "„": '"',
    "–": "-",
    "—": "-",
    "…": "...",
}

# Contraction handling per the reference (possessive 's deliberately NOT
# expanded generically; n't -> " not"; 're/'ve/'ll/'d/'m expanded; then
# the explicit pronoun/wh-word 's list, StandardAnalyzer.php:283-309).
_CONTRACTIONS = [
    (re.compile(r"\bcan't\b", re.I), "cannot"),
    (re.compile(r"\bwon't\b", re.I), "will not"),
    (re.compile(r"n't\b", re.I), " not"),
    (re.compile(r"'re\b", re.I), " are"),
    (re.compile(r"'ve\b", re.I), " have"),
    (re.compile(r"'ll\b", re.I), " will"),
    (re.compile(r"'d\b", re.I), " would"),
    (re.compile(r"'m\b", re.I), " am"),
] + [
    (re.compile(rf"\b{w}'s\b", re.I), f"{w} is")
    for w in ("it", "that", "what", "there", "here", "he", "she",
              "who", "how", "where", "when", "why")
]


class StandardAnalyzer:
    """Stateful analyzer — build once per actor / engine, reuse per query."""

    def __init__(
        self,
        language: str = "en",
        *,
        min_word_length: int = 2,
        max_word_length: int = 50,
        remove_numbers: bool = False,
        strip_html: bool = False,
        custom_stopwords=None,
        disable_stopwords: bool = False,
        expand_contractions: bool = True,
    ):
        self.language = language
        self.min_word_length = min_word_length
        self.max_word_length = max_word_length
        self.remove_numbers = remove_numbers
        self.strip_html = strip_html
        self.expand_contractions = expand_contractions
        self.stopwords = stopwords_for(language, custom_stopwords, disable_stopwords)

    # -- chain pieces -------------------------------------------------
    def normalize(self, text: str) -> str:
        for k, v in _SMART.items():
            if k in text:
                text = text.replace(k, v)
        text = _CTRL_RE.sub("", text)
        text = _WS_RE.sub(" ", text)
        return text.strip()

    def _expand(self, text: str) -> str:
        for rx, rep in _CONTRACTIONS:
            text = rx.sub(rep, text)
        return text

    def tokenize(self, text: str) -> list[str]:
        """Full query-side chain, WITHOUT stopword removal."""
        if self.strip_html:
            text = re.sub(r"<[^>]+>", " ", text)
        text = self.normalize(text)
        if self.expand_contractions:
            text = self._expand(text)
        text = _PUNCT_RE.sub(" ", text)
        text = text.lower()
        toks = [t.strip("'-") for t in text.split()]
        out = []
        for t in toks:
            if not t:
                continue
            if len(t) < self.min_word_length or len(t) > self.max_word_length:
                continue
            if self.remove_numbers and _NUM_RE.match(t):
                continue
            out.append(t)
        return out

    def analyze(self, text: str) -> list[str]:
        """tokenize + stopword removal (the FTS match-path view; the
        reference's full ``analyze`` additionally stems — see
        ``analyze_full``)."""
        return [t for t in self.tokenize(text) if t not in self.stopwords]

    def analyze_full(self, text: str, language: str | None = None) -> list[str]:
        """The reference's complete ``analyze($text, $language)`` chain
        (StandardAnalyzer.php): tokenize → per-language stopword removal
        → per-language STEMMING.  This is the terms-index / keyword view
        ('analyzer' → 'analyz', 'computers' → 'comput'); the FTS match
        path stays unstemmed (FTS5 indexes raw tokens)."""
        from ..functions.stemmer import stem as _stem_fn

        lang = language or self.language
        stopw = (self.stopwords if language in (None, self.language)
                 else stopwords_for(lang))
        return [_stem_fn(t, lang) for t in self.tokenize(text)
                if t not in stopw]

    def match_terms(self, text: str) -> list[list[str]]:
        """Query terms as the FTS match layer sees them.

        Each analyzer token is re-tokenized with the unicode61 tokenizer
        (what FTS5 does when parsing a MATCH string); a token containing
        internal punctuation (e.g. ``can't`` -> ``can t``) becomes a
        multi-term phrase.  Returns a list of term-groups; a group of
        length > 1 is an implicit phrase.
        """
        groups = []
        for tok in self.analyze(text):
            sub = u61_tokenize(tok)
            if sub:
                groups.append(sub)
        return groups

    # -- keyword extraction (reference :136-165) ----------------------
    def extract_keywords(self, text: str, limit: int = 10) -> list[tuple[str, float]]:
        toks = self.analyze(text)
        stems = [_stem(t, self.language) for t in toks]
        counts: dict[str, float] = {}
        first_pos: dict[str, int] = {}
        for i, s in enumerate(stems):
            counts[s] = counts.get(s, 0.0) + 1.0
            first_pos.setdefault(s, i)
        n = max(1, len(stems))
        scored = []
        for s, c in counts.items():
            # tf weighted by earliness and token length, as in the reference
            pos_boost = 1.0 + (1.0 - first_pos[s] / n) * 0.5
            len_boost = 1.0 + min(len(s), 10) / 20.0
            scored.append((s, c * pos_boost * len_boost))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:limit]
