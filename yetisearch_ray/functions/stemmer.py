"""English Porter2 (Snowball) stemmer + light fr/de/es stemmers.

The reference implements a Porter2-style English stemmer plus French /
German / Spanish variants (``src/Stemmer/Languages/EnglishStemmer.php``).
This is an independent implementation of the publicly documented Snowball
"english" algorithm (snowballstem.org).  Per SURVEY.md §1.3 stemming is
NOT on the FTS match path — it feeds ``extract_keywords`` and optional
analysis pipelines only — so exact parity with the reference's outputs is
not rank-gating.

Convention: inside ``stem_en`` the working string marks consonant-y as
``Y``; lowercase ``aeiouy`` are vowels, ``Y`` is a consonant.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")  # marked "Y" is intentionally NOT in this set
_DOUBLES = {"bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"}
_LI_ENDING = set("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _vowel(c: str) -> bool:
    return c in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """R1 and R2 start offsets per the Snowball definition."""
    n = len(word)
    if word.startswith("gener") or word.startswith("arsen"):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = n
        for i in range(1, n):
            if not _vowel(word[i]) and _vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _vowel(word[i]) and _vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _vowel(word[0]) and not _vowel(word[1])
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (not _vowel(a)) and _vowel(b) and (not _vowel(c)) and c not in "wxyY"
    return False


def _contains_vowel(s: str) -> bool:
    return any(_vowel(c) for c in s)


def stem_en(word: str) -> str:
    word = word.lower()
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]
    word = word.lstrip("'")
    # mark consonant-y as Y: at word start, or after a vowel
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _regions(word)

    # Step 0 — strip apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word.lower() in _EXCEPTIONS2:
        return word.lower()

    # Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "ee"
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-3] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word[-2:].lower() in _DOUBLES:
                        word = word[:-1]
                    elif len(word) == r1 and _ends_short_syllable(word):
                        word += "e"
                break

    # Step 1c: y -> i when preceded by a consonant that is not word-initial
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    # Step 2 (longest-match table)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ]
    matched = False
    for suf, rep in step2:
        if word.endswith(suf):
            if in_r1(suf):
                word = word[: -len(suf)] + rep
            matched = True
            break
    if not matched:
        if word.endswith("ogi") and in_r1("ogi") and len(word) >= 4 and word[-4] == "l":
            word = word[:-1]
        elif word.endswith("li") and in_r1("li") and len(word) >= 3 and word[-3] in _LI_ENDING:
            word = word[:-2]

    # Step 3
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ful", ""), ("ness", ""),
    ]
    matched = False
    for suf, rep in step3:
        if word.endswith(suf):
            if in_r1(suf):
                word = word[: -len(suf)] + rep
            matched = True
            break
    if not matched and word.endswith("ative") and in_r2("ative"):
        word = word[:-5]

    # Step 4
    step4 = ["ement", "ance", "ence", "able", "ible", "ment",
             "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
             "al", "er", "ic"]
    matched = False
    for suf in step4:
        if word.endswith(suf):
            if in_r2(suf):
                word = word[: -len(suf)]
            matched = True
            break
    if not matched and word.endswith("ion") and in_r2("ion") and len(word) >= 4 and word[-4] in "st":
        word = word[:-3]

    # Step 5
    if word.endswith("e") and (
        in_r2("e") or (in_r1("e") and not _ends_short_syllable(word[:-1]))
    ):
        word = word[:-1]
    elif word.endswith("l") and in_r2("l") and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


def _stem_light(word: str, suffixes: tuple[str, ...], min_len: int = 5) -> str:
    w = word.lower()
    for suf in suffixes:
        if w.endswith(suf) and len(w) - len(suf) >= min_len - 1:
            return w[: -len(suf)]
    return w


def stem(word: str, language: str = "en") -> str:
    lang = (language or "en").lower()
    if lang == "en":
        return stem_en(word)
    if lang == "fr":
        return _stem_light(word, ("issement", "issant", "ement", "ation",
                                  "euses", "ences", "euse", "ence", "ants",
                                  "ant", "ees", "er", "es", "e", "s"))
    if lang == "de":
        return _stem_light(word, ("ungen", "heit", "keit", "ung", "isch",
                                  "lich", "en", "er", "es", "e", "s", "n"))
    if lang == "es":
        return _stem_light(word, ("amiento", "imiento", "aciones", "acion",
                                  "adora", "ante", "anza", "able", "ible",
                                  "mente", "idad", "ar", "er", "ir", "as",
                                  "os", "es", "a", "o", "s"))
    return word.lower()
