"""Driver-style conformance: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB — row count, schema (column
names), and order-insensitive values — mimicking CORRECTNESS_r{N}.json."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(5)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _compare(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        name, sorted(got.columns), sorted(want.columns))
    assert len(got) == len(want), (name, len(got), len(want))
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
            gv = g[c].astype(float).to_numpy()
            wv = w[c].astype(float).to_numpy()
            assert all(
                a == b  # exact (covers +-inf, where inf-inf is nan)
                or (math.isnan(a) and math.isnan(b))
                or abs(a - b) <= 1e-4
                for a, b in zip(gv, wv)
            ), (name, c)
        else:
            assert g[c].astype(str).tolist() == w[c].astype(str).tolist(), (name, c)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"query", "doc_id", "score"} <= set(df.columns)


def test_every_oracle_query_matches(entry_mod, con):
    qs = entry_mod.queries()
    oq = entry_mod.oracle_sql()
    missing = set(oq) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    failures = []
    for name, sql in sorted(oq.items()):
        got = _to_pandas(qs[name](SF_DIR))
        want = con.execute(sql).fetchdf()
        try:
            _compare(name, got, want)
        except AssertionError as e:
            failures.append((name, str(e)[:500]))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    oq = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(oq)):
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name
