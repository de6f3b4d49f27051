"""SQLite-FTS5 BM25 semantics (publicly documented; sqlite.org/fts5.html).

The reference delegates scoring to FTS5's ``bm25()`` auxiliary function
(``src/Storage/SqliteStorage.php:993-1015``); we re-implement its exact,
publicly documented math:

- ``k1 = 1.2``, ``b = 0.75``
- ``idf(t) = ln( (N - df + 0.5) / (df + 0.5) )`` where N is the TOTAL row
  count of the index (not the match count) and df the number of rows
  containing the phrase in any column,
- per-row score ``sum over phrases of idf * (tf' * (k1+1)) /
  (tf' + k1 * (1 - b + b * D / avgdl))`` where
  ``tf' = sum over columns of (weight[col] * tf[col])`` — only tf is
  column-weighted; ``D`` is the UNWEIGHTED total token count of the row
  across all indexed columns and ``avgdl = total_tokens / N``,
- FTS5 returns the NEGATED sum (more relevant = more negative); the
  reference orders by ``rank ASC`` and displays ``abs(rank)``.

Vectorized over candidate arrays with numpy.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


IDF_FLOOR = 1e-6  # FTS5 clamps non-positive idf (fts5_aux.c, public source)


def idf(N: int, df: int) -> float:
    v = float(np.log((N - df + 0.5) / (df + 0.5)))
    return v if v > 0.0 else IDF_FLOOR


def bm25_term_score(tf_weighted, dl, avgdl: float, term_idf: float,
                    k1: float = K1, b: float = B):
    """One phrase's contribution for an array of candidate docs.

    tf_weighted : array of column-weight-summed term frequencies
    dl          : array of unweighted total doc lengths
    """
    tf = np.asarray(tf_weighted, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = term_idf * (tf * (k1 + 1.0)) / denom
    return np.where(denom > 0, contrib, 0.0)
