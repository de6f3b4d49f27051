"""Per-language stopword lists.

The reference ships ~100 English stopwords plus smaller fr/de/es lists
(``src/Analyzers/StandardAnalyzer.php:172-265``).  These are standard
public stopword inventories; ours need only be internally consistent
(query-side removal and any oracle SQL must agree, which they do because
both derive from this module).
"""

from __future__ import annotations

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """
        a about above after again against all am an and any are aren't as at
        be because been before being below between both but by can cannot
        could couldn't did didn't do does doesn't doing don't down during
        each few for from further had hadn't has hasn't have haven't having
        he her here hers herself him himself his how i if in into is isn't
        it its itself let's me more most my myself no nor not of off on once
        only or other our ours ourselves out over own same she should
        shouldn't so some such than that the their theirs them themselves
        then there these they this those through to too under until up very
        was wasn't we were weren't what when where which while who whom why
        will with won't would wouldn't you your yours yourself yourselves
        """.split()
    ),
    "fr": frozenset(
        """
        au aux avec ce ces dans de des du elle en et eux il ils je la le les
        leur lui ma mais me meme mes moi mon ne nos notre nous on ou par pas
        pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
        votre vous
        """.split()
    ),
    "de": frozenset(
        """
        aber als am an auch auf aus bei bin bis bist da dadurch daher darum
        das dass dein deine dem den der des dessen deshalb die dies dieser
        dieses doch dort du durch ein eine einem einen einer eines er es
        euer eure fur hatte hatten hattest hattet hier hinter ich ihr ihre
        im in ist ja jede jedem jeden jeder jedes jener jenes jetzt kann
        kannst konnen kannt machen mein meine mit muss mussen musst nach
        nachdem nein nicht nun oder seid sein seine sich sie sind soll
        sollen sollst sollt sonst soweit sowie und unser unsere unter vom
        von vor wann warum was weiter weitere wenn wer werde werden werdet
        weshalb wie wieder wieso wir wird wirst wo woher wohin zu zum zur
        """.split()
    ),
    "es": frozenset(
        """
        a al algo algunas algunos ante antes como con contra cual cuando de
        del desde donde durante e el ella ellas ellos en entre era erais
        eran eras eres es esa esas ese eso esos esta estas este esto estos
        fue fueron fui fuimos ha hasta hay la las le les lo los mas me mi
        mis mucho muchos muy nada ni no nos nosotras nosotros nuestra
        nuestras nuestro nuestros o os otra otras otro otros para pero poco
        por porque que quien quienes se sin sobre sois somos son soy su sus
        te tenemos tengo ti tiene tienen todo todos tu tus un una uno unas
        unos vosotras vosotros y ya yo
        """.split()
    ),
}


def stopwords_for(language: str | None, custom=None, disabled: bool = False) -> frozenset[str]:
    if disabled:
        return frozenset()
    base = STOPWORDS.get((language or "en").lower(), STOPWORDS["en"])
    if custom:
        return base | frozenset(w.lower() for w in custom)
    return base
