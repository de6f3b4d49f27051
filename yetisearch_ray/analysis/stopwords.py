"""Per-language stopword lists — VERBATIM from the reference
(``src/Analyzers/StandardAnalyzer.php:172-265``), so stopword-sensitive
behavior (analyze chain, keyword extraction, quality scoring and their
oracles) matches the reference exactly.  Accented entries are kept
accented: the analyze chain compares raw lowercase tokens (accents
preserved) against these sets, as the reference does.
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset([
        "a", "about", "above", "after", "again", "against", "all", "am",
        "an", "and", "any", "are", "as", "at", "be", "because", "been",
        "before", "being", "below", "between", "both", "but", "by", "can",
        "did", "do", "does", "doing", "down", "during", "each", "few",
        "for", "from", "further", "had", "has", "have", "having", "he",
        "her", "here", "hers", "herself", "him", "himself", "his", "how",
        "i", "if", "in", "into", "is", "it", "its", "itself", "just", "me",
        "more", "most", "my", "myself", "no", "nor", "not", "now", "of",
        "off", "on", "once", "only", "or", "other", "our", "ours",
        "ourselves", "out", "over", "own", "same", "she", "should", "so",
        "some", "such", "than", "that", "the", "their", "theirs", "them",
        "themselves", "then", "there", "these", "they", "this", "those",
        "through", "to", "too", "under", "until", "up", "very", "was",
        "we", "were", "what", "when", "where", "which", "while", "who",
        "whom", "why", "will", "with", "would", "you", "your", "yours",
        "yourself", "yourselves",
    ]),
    "fr": frozenset([
        "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
        "elle", "en", "et", "eux", "il", "je", "la", "le", "les", "leur",
        "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne",
        "nos", "notre", "nous", "on", "ou", "par", "pas", "pour", "qu",
        "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes",
        "toi", "ton", "tu", "un", "une", "vos", "votre", "vous", "sont",
        "est", "été", "être",
    ]),
    "de": frozenset([
        "aber", "als", "am", "an", "auch", "auf", "aus", "bei", "bin",
        "bis", "bist", "da", "dadurch", "daher", "darum", "das", "daß",
        "dass", "dein", "deine", "dem", "den", "der", "des", "dessen",
        "deshalb", "die", "dies", "dieser", "dieses", "doch", "dort", "du",
        "durch", "ein", "eine", "einem", "einen", "einer", "eines", "er",
        "es", "euer", "eure", "für", "hatte", "hatten", "hattest",
        "hattet", "hier", "hinter", "ich", "ihr", "ihre", "im", "in",
        "ist", "ja", "jede", "jedem", "jeden", "jeder", "jedes", "jener",
        "jenes", "jetzt", "kann", "kannst", "können", "könnt", "machen",
        "mein", "meine", "mit", "muß", "mußt", "musst", "müssen", "müßt",
        "nach", "nachdem", "nein", "nicht", "nun", "oder", "seid", "sein",
        "seine", "sich", "sie", "sind", "soll", "sollen", "sollst",
        "sollt", "sonst", "soweit", "sowie", "und", "unser", "unsere",
        "unter", "vom", "von", "vor", "wann", "warum", "was", "weiter",
        "weitere", "wenn", "wer", "werde", "werden", "werdet", "weshalb",
        "wie", "wieder", "wieso", "wir", "wird", "wirst", "wo", "woher",
        "wohin", "zu", "zum", "zur", "über",
    ]),
    "es": frozenset([
        "a", "al", "algo", "algunas", "algunos", "ante", "antes", "como",
        "con", "contra", "cual", "cuando", "de", "del", "desde", "donde",
        "durante", "e", "el", "ella", "ellas", "ellos", "en", "entre",
        "era", "erais", "eran", "eras", "eres", "es", "esa", "esas", "ese",
        "eso", "esos", "esta", "estaba", "estabais", "estaban", "estabas",
        "estad", "estada", "estadas", "estado", "estados", "estamos",
        "estando", "estar", "estaremos", "estará", "estarán", "estarás",
        "estaré", "estaréis", "estaría", "estaríais", "estaríamos",
        "estarían", "estarías", "estas", "este", "estemos", "esto",
        "estos", "estoy", "estuve", "estuviera", "estuvierais",
        "estuvieran", "estuvieras", "estuvieron", "estuviese",
        "estuvieseis", "estuviesen", "estuvieses", "estuvimos",
        "estuviste", "estuvisteis", "estuviéramos", "estuviésemos",
        "estuvo", "está", "estábamos", "estáis", "están", "estás", "esté",
        "estéis", "estén", "estés", "fue", "fuera", "fuerais", "fueran",
        "fueras", "fueron", "fuese", "fueseis", "fuesen", "fueses", "fui",
        "fuimos", "fuiste", "fuisteis", "fuéramos", "fuésemos", "ha",
        "habida", "habidas", "habido", "habidos", "habiendo", "habremos",
        "habrá", "habrán", "habrás", "habré", "habréis", "habría",
        "habríais", "habríamos", "habrían", "habrías", "habéis", "había",
        "habíais", "habíamos", "habían", "habías", "han", "has", "hasta",
        "hay", "haya", "hayamos", "hayan", "hayas", "hayáis", "he",
        "hemos", "hube", "hubiera", "hubierais", "hubieran", "hubieras",
        "hubieron", "hubiese", "hubieseis", "hubiesen", "hubieses",
        "hubimos", "hubiste", "hubisteis", "hubiéramos", "hubiésemos",
        "hubo", "la", "las", "le", "les", "lo", "los", "me", "mi", "mis",
        "mucho", "muchos", "muy", "más", "mí", "mía", "mías", "mío",
        "míos", "nada", "ni", "no", "nos", "nosotras", "nosotros",
        "nuestra", "nuestras", "nuestro", "nuestros", "o", "os", "otra",
        "otras", "otro", "otros", "para", "pero", "poco", "por", "porque",
        "que", "quien", "quienes", "qué", "se", "sea", "seamos", "sean",
        "seas", "seremos", "será", "serán", "serás", "seré", "seréis",
        "sería", "seríais", "seríamos", "serían", "serías", "seáis",
        "sido", "siendo", "sin", "sobre", "sois", "somos", "son", "soy",
        "su", "sus", "suya", "suyas", "suyo", "suyos", "sí", "también",
        "tanto", "te", "tendremos", "tendrá", "tendrán", "tendrás",
        "tendré", "tendréis", "tendría", "tendríais", "tendríamos",
        "tendrían", "tendrías", "tened", "tenemos", "tenga", "tengamos",
        "tengan", "tengas", "tengo", "tengáis", "tenida", "tenidas",
        "tenido", "tenidos", "teniendo", "tenéis", "tenía", "teníais",
        "teníamos", "tenían", "tenías", "ti", "tiene", "tienen", "tienes",
        "todo", "todos", "tu", "tus", "tuve", "tuviera", "tuvierais",
        "tuvieran", "tuvieras", "tuvieron", "tuviese", "tuvieseis",
        "tuviesen", "tuvieses", "tuvimos", "tuviste", "tuvisteis",
        "tuviéramos", "tuviésemos", "tuvo", "tuya", "tuyas", "tuyo",
        "tuyos", "tú", "un", "una", "uno", "unos", "vosotras", "vosotros",
        "vuestra", "vuestras", "vuestro", "vuestros", "y", "ya", "yo",
        "él", "éramos",
    ]),
}


_LANG_ALIASES = {"english": "en", "french": "fr", "german": "de",
                 "spanish": "es"}


def stopwords_for(language: str | None, custom=None, disabled: bool = False) -> frozenset[str]:
    if disabled:
        return frozenset()
    key = (language or "en").lower()
    key = _LANG_ALIASES.get(key, key)
    base = STOPWORDS.get(key, STOPWORDS["en"])
    if custom:
        return base | frozenset(w.lower() for w in custom)
    return base
