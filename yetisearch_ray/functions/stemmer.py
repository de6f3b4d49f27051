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


# ==========================================================================
# French / German / Spanish stemmers — parity ports of the reference's
# lightweight Snowball variants (src/Stemmer/Languages/{French,German,
# Spanish}Stemmer.php, unit vectors tests/Unit/Stemmer/*).
#
# The reference operates on PHP BYTE strings: strlen / $word[$i] index
# UTF-8 bytes, so region offsets are byte offsets and isVowelAt can only
# ever match the ASCII vowels (the accented entries in its vowel arrays
# compare a multi-byte string against a single byte and never hit).
# These ports therefore work on the UTF-8 byte encoding to reproduce the
# observable behavior exactly.
# ==========================================================================


def _b_ends(b: bytes, suf: bytes) -> bool:
    return b.endswith(suf)


def _vowel_at(b: bytes, i: int, vowels: frozenset) -> bool:
    return 0 <= i < len(b) and b[i] in vowels


_FR_VOWELS = frozenset(b"aeiouy")

_FR_STEP1 = [  # (suffix, region_key) — insertion order matters
    (b"ances", "r2"), (b"iques", "r2"), (b"ismes", "r2"), (b"ables", "r2"),
    (b"istes", "r2"), (b"ance", "r2"), (b"ique", "r2"), (b"isme", "r2"),
    (b"able", "r2"), (b"iste", "r2"), (b"eux", "r2"),
    (b"atrices", "r2"), (b"ateurs", "r2"), (b"ations", "r2"),
    (b"atrice", "r2"), (b"ateur", "r2"), (b"ation", "r2"),
    (b"ments", "rv"), (b"ment", "rv"),
]

_FR_STEP2A = [s.encode() for s in (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it")]

_FR_STEP2B = [s.encode() for s in (
    "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
    "erons", "eront", "erai", "era", "er", "ez", "é", "ée", "ées",
    "és", "èrent", "ant", "ante", "antes", "ants", "ât", "a",
    "ai", "aient", "ais", "ait", "as", "asse", "assent", "asses",
    "assiez", "assions", "e", "es", "s")]


def stem_fr(word: str) -> str:
    """French stemmer (reference FrenchStemmer.php:18-46)."""
    w = word.strip().lower()
    b = w.encode("utf-8")
    n = len(b)
    if n <= 2:
        return w
    V = _FR_VOWELS

    # RV (FrenchStemmer.php:181-206)
    if n >= 2 and _vowel_at(b, 0, V) and _vowel_at(b, 1, V):
        rv = n
        for i in range(2, n):
            if not _vowel_at(b, i, V):
                rv = i + 1
                break
    else:
        rv = n
        found_cons = False
        for i in range(n):
            if not _vowel_at(b, i, V):
                found_cons = True
            elif found_cons:
                rv = i + 1
                break
    # R1 / R2 (:208-234)
    r1 = n
    for i in range(n - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r1 = i + 2
            break
    r2 = len(b)
    for i in range(r1, len(b) - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r2 = i + 2
            break

    # Step 1 (:49-97)
    for suf, region_key in _FR_STEP1:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            region = {"rv": rv, "r1": r1, "r2": r2}[region_key]
            if pos >= region:
                b = b[:-len(suf)]
                if suf in (b"ment", b"ments") and b.endswith(b"emm"):
                    b = b[:-3] + b"ent"
                break

    # Step 2a (:99-122) else 2b (:124-153)
    done_2a = False
    for suf in _FR_STEP2A:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if pos >= rv and pos > 0 and not _vowel_at(b, pos - 1, V):
                b = b[:-len(suf)]
                done_2a = True
                break
    if not done_2a:
        if b.endswith(b"eurs") and len(b) - 4 >= rv:
            b = b[:-4]
        else:
            for suf in _FR_STEP2B:
                if b.endswith(suf):
                    pos = len(b) - len(suf)
                    if pos >= rv:
                        b = b[:-len(suf)]
                        break

    # Step 3 (:155-162); step 4 (accent strip) is disabled in the
    # reference to match its own test vectors
    if b.endswith(b"Y"):
        b = b[:-1] + b"i"
    elif b.endswith("ç".encode()):
        b = b[:-2] + b"c"
    return b.decode("utf-8", errors="replace")


_DE_VOWELS = frozenset(b"aeiouy")
_DE_S_ENDINGS = frozenset(b"bdfghklmnrt")
_DE_STEP1 = [b"ern", b"em", b"er", b"en", b"es", b"e", b"s"]
_DE_STEP2 = [b"est", b"en", b"st", b"er", b"et"]
_DE_STEP3 = [  # (suffix, region_key, not_after)
    (b"end", "r2", None), (b"ung", "r2", None),
    (b"isch", "r2", b"e"), (b"ig", "r2", b"e"), (b"ik", "r2", b"e"),
    (b"lich", "r2", None), (b"heit", "r2", None), (b"keit", "r2", None),
]


def stem_de(word: str) -> str:
    """German stemmer (reference GermanStemmer.php:18-48)."""
    w = word.strip().lower()
    b = w.encode("utf-8")
    if len(b) <= 2:
        return w
    b = b.replace("ß".encode(), b"ss")
    V = _DE_VOWELS
    n = len(b)

    r1 = n
    for i in range(n - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r1 = max(3, i + 2)  # R1 at least position 3 (:175)
            break
    r2 = n
    for i in range(r1, n - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r2 = i + 2
            break

    # Step 1 (:50-86)
    for suf in _DE_STEP1:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if suf == b"s" and pos > 0 and b[pos - 1] in _DE_S_ENDINGS:
                continue
            if pos >= r1:
                b = b[:-len(suf)]
                break

    # Step 2 (:88-108)
    for suf in _DE_STEP2:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if pos >= r1:
                if suf == b"st" and pos >= 3:
                    prec = b[pos - 3:pos]
                    if len(prec) >= 3 and prec[2] == prec[1]:
                        continue
                b = b[:-len(suf)]
                break

    # Step 3 (:110-156)
    for suf, region_key, not_after in _DE_STEP3:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if pos >= r2:
                if not_after and pos > 0 and b[pos - 1:pos] == not_after:
                    continue
                b = b[:-len(suf)]
                if suf in (b"lich", b"ig") and b.endswith(b"e"):
                    if len(b) - 1 >= r1:
                        b = b[:-1]
                break

    for um, base in (("ä", b"a"), ("ö", b"o"), ("ü", b"u")):
        b = b.replace(um.encode(), base)
    return b.decode("utf-8", errors="replace")


_ES_VOWELS = frozenset(b"aeiou")
_ES_PRONOUNS = [s.encode() for s in (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo")]
_ES_VERB_ENDINGS = [b"ar", b"er", b"ir", b"ando", b"iendo", b"ado", b"ido"]
_ES_STEP1 = [  # (suffix, region_key, replacement)
    (b"amientos", "r2", b""), (b"imientos", "r2", b""),
    (b"amiento", "r2", b""), (b"imiento", "r2", b""),
    (b"anzas", "r2", b""), (b"ismos", "r2", b""), (b"ables", "r2", b""),
    (b"ibles", "r2", b""), (b"istas", "r2", b""), (b"anza", "r2", b""),
    (b"ismo", "r2", b""), (b"able", "r2", b""), (b"ible", "r2", b""),
    (b"ista", "r2", b""), (b"osos", "r2", b""), (b"osas", "r2", b""),
    (b"oso", "r2", b""), (b"osa", "r2", b""),
    (b"aciones", "r2", b""), ("ación".encode(), "r2", b""),
    ("logías".encode(), "r2", b"log"), ("logía".encode(), "r2", b"log"),
    (b"uciones", "r2", b"u"), ("ución".encode(), "r2", b"u"),
    (b"encias", "r2", b"ente"), (b"encia", "r2", b"ente"),
    (b"amente", "r1", b""), (b"mente", "r2", b""),
    (b"idades", "r2", b""), (b"idad", "r2", b""),
    (b"ivas", "r2", b""), (b"ivos", "r2", b""),
    (b"iva", "r2", b""), (b"ivo", "r2", b""),
]
_ES_STEP2_RAW = [s.encode() for s in (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
    "aríais", "eríais", "iríais", "ierais", "ieseis", "asteis", "isteis",
    "ábamos", "aremos", "eremos", "iremos", "áramos", "éramos",
    "ásemos", "arían", "erían", "irían", "ieran", "iesen", "ieron",
    "iendo", "ando", "aban", "aran", "eron", "arán", "erán", "irán",
    "arás", "erás", "irás", "aría", "ería", "iría", "iera", "iese",
    "aste", "iste", "aba", "ada", "ida", "ara", "ase", "ían",
    "ado", "ido", "ando", "iendo", "ar", "er", "ir", "as",
    "ías", "aba", "ada", "ía", "ara", "ase", "en", "es", "éis",
    "emos", "an")]
# reference sorts longest-first with a stable sort (PHP 8 usort)
_ES_STEP2 = sorted(_ES_STEP2_RAW, key=lambda s: -len(s))
_ES_STEP3 = [s.encode() for s in ("os", "a", "o", "á", "í", "ó", "e", "é")]


def stem_es(word: str) -> str:
    """Spanish stemmer (reference SpanishStemmer.php:18-48)."""
    w = word.strip().lower()
    b = w.encode("utf-8")
    n = len(b)
    if n <= 2:
        return w
    V = _ES_VOWELS

    # RV (:207-233)
    if n >= 2 and not _vowel_at(b, 1, V):
        rv = n
        for i in range(2, n):
            if _vowel_at(b, i, V):
                rv = i + 1
                break
    elif n >= 2 and _vowel_at(b, 0, V) and _vowel_at(b, 1, V):
        rv = n
        for i in range(2, n):
            if not _vowel_at(b, i, V):
                rv = i + 1
                break
    else:
        rv = min(3, n)
    r1 = n
    for i in range(n - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if not _vowel_at(b, i, V) and _vowel_at(b, i + 1, V):
            r2 = i + 2
            break

    # Step 0: attached pronouns (:50-77)
    for pron in _ES_PRONOUNS:
        if b.endswith(pron):
            pos = len(b) - len(pron)
            stem_part = b[:pos]
            valid = any(stem_part.endswith(e) for e in _ES_VERB_ENDINGS)
            if valid and len(stem_part) >= rv:
                b = b[:-len(pron)]
                for acc in ("ár", "ér", "ír"):
                    if b.endswith(acc.encode()):
                        b = b[:-2] + b[-1:]
                        break
                break

    # Step 1 (:79-149)
    for suf, region_key, rep in _ES_STEP1:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            region = r1 if region_key == "r1" else r2
            if pos >= region:
                b = b[:-len(suf)] + rep
                break

    # Step 2 (:151-181)
    for suf in _ES_STEP2:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if pos >= rv:
                b = b[:-len(suf)]
                break

    # Step 3 (:183-196)
    for suf in _ES_STEP3:
        if b.endswith(suf):
            pos = len(b) - len(suf)
            if pos >= rv:
                b = b[:-len(suf)]
                break

    for acc, base in (("á", b"a"), ("é", b"e"), ("í", b"i"), ("ó", b"o"),
                      ("ú", b"u"), ("ñ", b"n"), ("ü", b"u")):
        b = b.replace(acc.encode(), base)
    return b.decode("utf-8", errors="replace")


def stem(word: str, language: str = "en") -> str:
    lang = (language or "en").lower()
    if lang in ("en", "english"):
        return stem_en(word)
    if lang in ("fr", "french"):
        return stem_fr(word)
    if lang in ("de", "german"):
        return stem_de(word)
    if lang in ("es", "spanish"):
        return stem_es(word)
    return word.lower()
