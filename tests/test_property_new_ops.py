"""Hypothesis property tests: the continuation-session operators vs
their DuckDB oracles on adversarial text — unicode whitespace (NBSP,
U+2028, vertical tab), quotes, braces, bullets, CRLF, ellipses, mixed
scripts.  This is the bug class round-2 ADVICE caught (Python-split vs
RE2 tokenization drift); both engines are RE2, so any divergence here
is an operator bug, not an engine difference."""

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from yetisearch_ray.pipelines import curation, oracles, textstats

# pathological alphabet: ASCII words, RE2-\s chars, NON-\s unicode
# whitespace (NBSP, U+2028), vertical tab (RE2 \s excludes it, Python
# re \s includes it — the classic drift), punctuation the rules key on
ALPHABET = list("abz AB .!?\"#{-•\t\n\r") + ["\x0b", " ", " ",
                                             "...", "é", "中", "the "]

texts_strategy = st.lists(
    st.lists(st.sampled_from(ALPHABET), max_size=40).map("".join),
    min_size=2, max_size=6)


def _setup(texts):
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "source": ["s" + str(i % 2) for i in range(len(texts))],
        "lang": ["en"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    ds = rd.from_arrow(tbl.replace_schema_metadata(None))
    con = duckdb.connect()
    con.register("documents", df)
    return ds, con


@pytest.mark.usefixtures("ray_session")
class TestPropertyNewOps:
    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=texts_strategy)
    def test_gopher_rules_property(self, texts):
        ds, con = _setup(texts)
        got = curation.gopher_rules(ds, min_required=1).to_pandas()
        want = con.execute(oracles.gopher_rules_sql(1)).fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=texts_strategy)
    def test_entropy_property(self, texts):
        ds, con = _setup(texts)
        got = textstats.entropy_stats(ds).to_pandas()
        want = con.execute(oracles.ENTROPY_STATS_SQL).fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=texts_strategy)
    def test_tfidf_property(self, texts):
        ds, con = _setup(texts)
        got = textstats.tfidf_topk(ds, k=3, num_partitions=2)
        sql = oracles.TFIDF_TOPK_SQL.replace("term_rank <= 5",
                                             "term_rank <= 3")
        want = con.execute(sql).fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=texts_strategy)
    def test_training_sequences_property(self, texts):
        ds, con = _setup(texts)
        got = curation.export_training_sequences(
            ds, seq_len=16).to_pandas()
        want = con.execute(oracles.training_sequences_sql(16)).fetchdf()
        if len(got) == 0 and len(want) == 0:
            return  # zero-row Datasets drop their schema on to_pandas
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)
