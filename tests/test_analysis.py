import numpy as np

from yetisearch_ray.analysis.tokenizer import fold_text, tokenize, tokenize_batch
from yetisearch_ray.analysis.analyzer import StandardAnalyzer
from yetisearch_ray.functions.stemmer import stem_en, stem
from yetisearch_ray.functions.similarity import (
    jaro_winkler,
    keyboard_proximity,
    levenshtein,
    levenshtein_within,
    phonetic_similarity,
    trigram_similarity,
)


class TestTokenizer:
    def test_alnum_runs_underscore_splits(self):
        # unicode61: underscore is NOT a token char
        assert tokenize("parse_config(x)") == ["parse", "config", "x"]

    def test_casefold_and_diacritics(self):
        assert tokenize("Café ÉCOLE") == ["cafe", "ecole"]
        assert fold_text("Straße") == "straße"  # simple case folding, unicode61-style

    def test_digits_kept(self):
        assert tokenize("foo123 42bar") == ["foo123", "42bar"]

    def test_batch_positions(self):
        toks, rows, pos, counts = tokenize_batch(["a b c", "", "x_y"], np.array([10, 11, 12]))
        assert toks == ["a", "b", "c", "x", "y"]
        assert rows.tolist() == [10, 10, 10, 12, 12]
        assert pos.tolist() == [0, 1, 2, 0, 1]
        assert counts.tolist() == [3, 0, 2]

    def test_none_rows(self):
        toks, rows, pos, counts = tokenize_batch([None, "ok"])
        assert toks == ["ok"] and counts.tolist() == [0, 1]


class TestAnalyzer:
    def test_stopwords_removed(self):
        a = StandardAnalyzer()
        assert a.analyze("the quick brown fox") == ["quick", "brown", "fox"]

    def test_contractions(self):
        a = StandardAnalyzer()
        # expansion happens pre-stopword-removal ("cannot" is a stopword)
        assert "cannot" in a.tokenize("can't")
        assert a.tokenize("won't")[:2] == ["will", "not"]

    def test_length_filter(self):
        a = StandardAnalyzer()
        assert "x" not in a.analyze("x ab abc")

    def test_match_terms_phrases(self):
        a = StandardAnalyzer(expand_contractions=False)
        # apostrophe token re-tokenizes (unicode61) into an implicit phrase
        groups = a.match_terms("rock'n'roll panic")
        assert ["rock", "n", "roll"] in groups and ["panic"] in groups
        # stopwords are removed before the match layer ("don't" is NOT a
        # reference stopword, so it re-tokenizes to an implicit phrase)
        assert a.match_terms("the panic") == [["panic"]]
        assert a.match_terms("don't panic") == [["don", "t"], ["panic"]]

    def test_smart_quotes_normalized(self):
        a = StandardAnalyzer()
        assert a.normalize("“hello” — world") == '"hello" - world'

    def test_analyze_full_reference_vectors(self):
        """Replays tests/Unit/Analyzers/StandardAnalyzerTest.php's
        behavioral assertions against the full (stemming) chain."""
        a = StandardAnalyzer()
        t = a.analyze_full("The quick brown fox jumps over the lazy dog")
        assert "the" not in t
        for w in ("quick", "brown", "fox"):
            assert w in t
        t = a.analyze_full("This is a test of the analyzer")
        assert "test" in t and "analyz" in t  # 'analyzer' stems to 'analyz'
        for w in ("this", "is", "the", "of"):
            assert w not in t
        assert set(a.analyze_full("running runs")) == {"run"}
        assert all(x.startswith("comput")
                   for x in a.analyze_full("computers computing computed"))
        t = a.analyze_full("Les ordinateurs sont utiles", "french")
        assert "les" not in t and "ordinat" in t
        t = a.analyze_full("Die Computer sind nützlich", "german")
        assert "die" not in t and "comput" in t
        t = a.analyze_full("I'm won't can't shouldn't they're")
        assert "cannot" in t and "won't" not in t
        t = a.analyze_full("The price is $99.99 or 100 euros")
        assert "price" in t and "99" in t and "100" in t and "euro" in t
        t = a.analyze_full("email@example.com and C++ programming!")
        for w in ("email", "exampl", "com", "program"):
            assert w in t
        assert a.analyze_full("") == []
        t = a.analyze_full("Café naïve résumé 北京 Москва")
        for w in ("café", "naïv", "résumé", "北京", "москва"):
            assert w in t

    def test_min_word_length_config(self):
        a = StandardAnalyzer(min_word_length=4)
        t = a.analyze_full("The cat and dog are big")
        for w in ("cat", "dog", "are", "big"):
            assert w not in t

    def test_html_stripping(self):
        a = StandardAnalyzer(strip_html=True)
        t = a.analyze_full('<p>This is <strong>bold</strong> text with '
                           '<a href="#">link</a></p>')
        for w in ("bold", "text", "link"):
            assert w in t
        a2 = StandardAnalyzer(strip_html=False)
        t2 = a2.analyze_full('<a href="#">link</a>')
        assert "href" in t2

    def test_extract_keywords_golden(self):
        """Pins the exact keyword ranking + scores (tf x earliness x
        length boosts over analyzed+stemmed tokens, reference
        StandardAnalyzer.php:136-165 semantics) so the text_keywords
        driver entry can't silently regress."""
        a = StandardAnalyzer()
        text = ("Parsing parsers parse the buffer. The buffer holds "
                "tokens; tokenization tokenizes tokens quickly.")
        got = [(k, round(s, 6)) for k, s in a.extract_keywords(text, limit=6)]
        assert got == [
            ("token", 6.136364), ("pars", 3.6), ("buffer", 3.545455),
            ("parser", 1.890909), ("hold", 1.527273), ("quick", 1.306818),
        ]

    def test_extract_keywords_boost_semantics(self):
        """Earliness boost: equal-tf terms rank by first position; tf
        dominates position."""
        a = StandardAnalyzer()
        got = a.extract_keywords("alpha beta alpha", limit=3)
        assert [k for k, _ in got] == ["alpha", "beta"]
        assert got[0][1] == 3.75 and got[1][1] == 1.6
        # stopwords never surface
        assert all(k not in a.stopwords for k, _ in got)


class TestStemmer:
    def test_known_stems(self):
        cases = {
            "running": "run", "flies": "fli", "dies": "die", "agreed": "agre",
            "conditional": "condit", "rational": "ration",
            "generously": "generous", "happiness": "happi",
            "knitting": "knit", "hopping": "hop", "hoping": "hope",
            "generalization": "general",
        }
        for w, expect in cases.items():
            assert stem_en(w) == expect, (w, stem_en(w), expect)

    def test_exceptions(self):
        assert stem_en("skis") == "ski"
        assert stem_en("dying") == "die"
        assert stem_en("news") == "news"
        assert stem_en("sky") == "sky"

    def test_other_languages_do_not_crash(self):
        assert stem("maisons", "fr")
        assert stem("häuser", "de")
        assert stem("casas", "es")

    def test_french_reference_vectors(self):
        """Parity with reference tests/Unit/Stemmer/FrenchStemmerTest.php."""
        from yetisearch_ray.functions.stemmer import stem_fr

        cases = {"action": "action", "actions": "action",
                 "doucement": "douc", "finir": "fin",
                 "finissaient": "finiss", "chanter": "chant",
                 "chantaient": "chant", "français": "franc"}
        for w, want in cases.items():
            assert stem_fr(w) == want, (w, stem_fr(w), want)

    def test_german_reference_vectors(self):
        """Parity with reference tests/Unit/Stemmer/GermanStemmerTest.php."""
        from yetisearch_ray.functions.stemmer import stem_de

        cases = {"Häuser": "haus", "Freunden": "freund", "Kindes": "kind",
                 "Kinder": "kind", "machest": "mach", "spielst": "spiel",
                 "notwendigkeit": "notwendig", "natürlich": "naturlich",
                 "wissenschaftlich": "wissenschaft"}
        for w, want in cases.items():
            assert stem_de(w) == want, (w, stem_de(w), want)

    def test_spanish_reference_vectors(self):
        """Parity with reference tests/Unit/Stemmer/SpanishStemmerTest.php."""
        from yetisearch_ray.functions.stemmer import stem_es

        cases = {"nación": "nacion", "biología": "biolog",
                 "hablando": "habl", "comiendo": "com", "niños": "nin",
                 "rápidamente": "rapid", "tristemente": "trist"}
        for w, want in cases.items():
            assert stem_es(w) == want, (w, stem_es(w), want)

    def test_language_name_aliases(self):
        assert stem("Kinder", "german") == "kind"
        assert stem("chanter", "french") == "chant"
        assert stem("hablando", "spanish") == "habl"


class TestSimilarity:
    def test_jaro_winkler_reference_vectors(self):
        """tests/Unit/Utils/JaroWinklerTest.php — exact to 1e-3."""
        cases = [("MARTHA", "MARHTA", 0.961), ("DIXON", "DICKSONX", 0.813),
                 ("JELLYFISH", "SMELLYFISH", 0.896),
                 ("Dwayne", "Duane", 0.840), ("Johnson", "Jonson", 0.962)]
        for a, b, want in cases:
            assert abs(jaro_winkler(a, b) - want) < 1e-3, (a, b)
        assert jaro_winkler("test", "test") == 1.0
        assert jaro_winkler("", "test") == 0.0
        assert jaro_winkler("Anakin", "amazon") < 0.7
        assert jaro_winkler("Anakin", "amazing") < 0.7

    def test_trigram_reference_vectors(self):
        """tests/Unit/Utils/TrigramTest.php bounds."""
        assert trigram_similarity("test", "test") == 1.0
        assert trigram_similarity("abc", "xyz") == 0.0
        assert trigram_similarity("", "test") == 0.0
        assert trigram_similarity("night", "nite") > 0.1
        assert trigram_similarity("color", "colour") > 0.3
        assert trigram_similarity("test", "tests") > 0.4
        assert trigram_similarity("test", "best") < 0.4
        assert trigram_similarity("cat", "dog") < 0.2

    def test_metaphone_reference_vectors(self):
        """tests/Unit/Utils/PhoneticMatcherTest.php key equalities."""
        from yetisearch_ray.functions.similarity import metaphone_key

        assert metaphone_key("phone") == metaphone_key("fone") == "FN"
        assert metaphone_key("their") == metaphone_key("there") == "0R"

    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("abc", "abc") == 0
        assert levenshtein_within("abc", "abcd", 1)
        assert not levenshtein_within("abc", "abcdef", 1)

    def test_jaro_winkler(self):
        assert jaro_winkler("martha", "marhta") > 0.95
        assert jaro_winkler("abc", "xyz") == 0.0
        assert jaro_winkler("same", "same") == 1.0

    def test_trigram(self):
        assert trigram_similarity("hello", "hello") == 1.0
        assert 0 < trigram_similarity("hello", "hallo") < 1
        assert trigram_similarity("abc", "xyz") == 0.0

    def test_keyboard(self):
        # 'a' and 's' are adjacent on QWERTY
        assert keyboard_proximity("cat", "cst") > 0.3
        assert keyboard_proximity("cat", "ca") == 0.8
        assert keyboard_proximity("cat", "cat") == 1.0

    def test_phonetic(self):
        # reference PhoneticMatcherTest.php: identical metaphone -> 1.0
        assert phonetic_similarity("smith", "smyth") == 1.0
        assert phonetic_similarity("phone", "fone") == 1.0
        assert phonetic_similarity("their", "there") == 1.0
        assert phonetic_similarity("phone", "phone") == 1.0


class TestTokenizerPathParity:
    """The Arrow dict-coded path must agree with the Python path on any
    input (hypothesis-generated, incl. unicode, punctuation, nulls)."""

    from hypothesis import given, settings, strategies as st

    @given(st.lists(st.one_of(
        st.none(),
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=80)), max_size=20))
    @settings(max_examples=150, deadline=None)
    def test_dict_path_matches_python(self, texts):
        import pyarrow as pa

        from yetisearch_ray.analysis.tokenizer import (
            tokenize_batch, tokenize_batch_dict)

        a = tokenize_batch(texts)
        codes, uniq, rows, pos, cnt = tokenize_batch_dict(
            pa.array(texts, pa.string()))
        assert [uniq[c] for c in codes] == a[0]
        assert rows.tolist() == a[1].tolist()
        assert pos.tolist() == a[2].tolist()
        assert cnt.tolist() == a[3].tolist()


class TestStemmerTotality:
    """Byte-level stemmers must be total over arbitrary unicode."""

    from hypothesis import given, settings, strategies as st

    @given(st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_stemmers_never_crash(self, w):
        from yetisearch_ray.functions.stemmer import (stem_de, stem_en,
                                                      stem_es, stem_fr)

        for fn in (stem_en, stem_fr, stem_de, stem_es):
            out = fn(w)
            assert isinstance(out, str)
