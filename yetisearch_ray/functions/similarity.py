"""String-similarity scalar functions for the fuzzy layer.

Independent implementations of the classic public algorithms the reference
exposes (``src/Utils/{Levenshtein,JaroWinkler,Trigram,PhoneticMatcher,
KeyboardProximity}.php``): Levenshtein edit distance with early-exit bound,
Jaro-Winkler (match window ``max(len)/2 - 1``, Winkler prefix bonus ≤ 4
chars, scale 0.1, applied only when jaro ≥ 0.7), padded-trigram multiset
Jaccard, QWERTY-grid keyboard proximity, and a metaphone-ish phonetic
comparison.  All pure Python — these run inside the query actor on a small
candidate dictionary, never in a per-row hot path.
"""

from __future__ import annotations

import math

# ---------------------------------------------------------------- levenshtein


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein_within(a: str, b: str, max_dist: int) -> bool:
    """Early-exit bounded check (length-difference prefilter first)."""
    if abs(len(a) - len(b)) > max_dist:
        return False
    return levenshtein(a, b) <= max_dist


# ---------------------------------------------------------------- jaro-winkler


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    k = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    j = jaro(a, b)
    if j < boost_threshold:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


# ---------------------------------------------------------------- trigram


def _ngrams(s: str, n: int) -> dict[str, int]:
    pad = " " * (n - 1)
    s = pad + s.lower() + pad
    out: dict[str, int] = {}
    for i in range(len(s) - n + 1):
        g = s[i : i + n]
        out[g] = out.get(g, 0) + 1
    return out


def trigram_similarity(a: str, b: str, n: int = 3) -> float:
    """Multiset Jaccard over padded n-grams (pad = n-1 spaces)."""
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    ga, gb = _ngrams(a, n), _ngrams(b, n)
    inter = sum(min(c, gb.get(g, 0)) for g, c in ga.items())
    union = sum(ga.values()) + sum(gb.values()) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------- keyboard

_QWERTY_ROWS = ["qwertyuiop", "asdfghjkl", "zxcvbnm"]
_KEY_POS: dict[str, tuple[float, float]] = {}
for _r, _row in enumerate(_QWERTY_ROWS):
    for _c, _ch in enumerate(_row):
        _KEY_POS[_ch] = (_r * 1.0, _c + _r * 0.5)  # stagger rows slightly


def _key_dist(a: str, b: str) -> float:
    if a == b:
        return 0.0
    pa, pb = _KEY_POS.get(a), _KEY_POS.get(b)
    if pa is None or pb is None:
        return 3.0
    return math.hypot(pa[0] - pb[0], pa[1] - pb[1])


def keyboard_proximity(a: str, b: str) -> float:
    """Typo plausibility by key distance: same-length avg-distance score
    ``1 - d/3``; ±1-length insert/delete → 0.8; else 0."""
    a, b = a.lower(), b.lower()
    if a == b:
        return 1.0
    if len(a) == len(b):
        diffs = [(ca, cb) for ca, cb in zip(a, b) if ca != cb]
        if not diffs:
            return 1.0
        avg = sum(_key_dist(ca, cb) for ca, cb in diffs) / len(diffs)
        penalty = len(diffs) / len(a)
        return max(0.0, (1.0 - avg / 3.0) * (1.0 - penalty * 0.5))
    if abs(len(a) - len(b)) == 1:
        s, l = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1 :] == s:
                return 0.8
    return 0.0


# ---------------------------------------------------------------- phonetic


def metaphone_key(word: str) -> str:
    """A compact metaphone-style phonetic key (independent implementation
    of the classic public algorithm's main rules)."""
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return ""
    # initial-letter exceptions
    for pre, rep in (("kn", "n"), ("gn", "n"), ("pn", "n"), ("wr", "r"),
                     ("ae", "e"), ("x", "s"), ("wh", "w")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prv = w[i - 1] if i > 0 else ""
        if c in "aeiou":
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prv == "m"):
                out.append("B")
        elif c == "c":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and i + 2 < n and w[i + 2] in "iey":
                out.append("J"); i += 1
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h":
                if i + 2 >= n:  # silent-ish gh at end
                    pass
                else:
                    out.append("K")
                i += 1
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prv in "aeiou" and nxt not in "aeiou":
                pass
            else:
                out.append("H")
        elif c == "k":
            if prv != "c":
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F"); i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "h":
                out.append("0"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w" or c == "y":
            if nxt in "aeiou":
                out.append(c.upper())
        elif c == "x":
            out.append("KS")
        elif c == "z":
            out.append("S")
        elif c in "flmnr":
            out.append(c.upper())
        elif c == "j":
            out.append("J")
        # skip doubled letters
        while i + 1 < n and w[i + 1] == c and c != "c":
            i += 1
        i += 1
    return "".join(out)


# The reference's quickPhoneticCorrection table
# (src/Utils/PhoneticMatcher.php:115-141) plus common misspellings; the
# lookup runs BEFORE the known-term check, as in the reference.
_COMMON_TYPOS = {
    "teh": "the", "recieve": "receive", "seperate": "separate",
    "definately": "definitely", "occured": "occurred", "untill": "until",
    "wich": "which", "becuase": "because", "freind": "friend",
    "beleive": "believe", "acheive": "achieve", "adress": "address",
    "comming": "coming", "goverment": "government", "enviroment":
    "environment", "libary": "library", "lenght": "length", "wierd":
    "weird", "thier": "their", "truely": "truly", "basicly": "basically",
    "gaurd": "guard", "publically": "publicly", "accross": "across",
    "tommorow": "tomorrow",
    # PhoneticMatcher.php entries not covered above
    "fone": "phone", "adn": "and", "taht": "that", "whihc": "which",
    "waht": "what", "were": "where", "wher": "where",
    "becasue": "because", "neccessary": "necessary", "thru": "through",
    "tho": "though", "alot": "a lot", "cant": "can't", "wont": "won't",
    "dont": "don't",
}


def _similar_ratio(a: str, b: str) -> float:
    """Similarity % of two phonetic keys (difflib-ratio style)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    import difflib

    return difflib.SequenceMatcher(None, a, b).ratio()


def phonetic_similarity(a: str, b: str) -> float:
    """Reference ``PhoneticMatcher::phoneticSimilarity``
    (src/Utils/PhoneticMatcher.php:38-71): identical metaphone keys →
    1.0 ('phone'/'fone', 'their'/'there'); otherwise the similar-text
    ratio of the keys.  (The reference's doubleMetaphone 0.9 branch can
    never fire — its "double" is the same key twice.)"""
    ka, kb = metaphone_key(a.lower()), metaphone_key(b.lower())
    if ka and ka == kb:
        return 1.0
    return _similar_ratio(ka, kb)
