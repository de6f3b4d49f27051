"""Hypothesis property tests for this session's analytics operators:
each distributed implementation is pinned against a brute-force numpy /
pandas recompute on randomized inputs (tie storms, empty groups,
single-row groups, degenerate distributions)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

SLOW = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _write_events(tmp_path, ts, user_id, etype=None, value=None,
                  event_id=None):
    n = len(ts)
    t = pa.table({
        "event_id": pa.array(event_id if event_id is not None
                             else range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
        "user_id": pa.array(user_id, pa.int64()),
        "event_type": pa.array(etype if etype is not None
                               else ["e"] * n),
        "value": pa.array(value if value is not None
                          else [1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, d / "events.parquet")
    return str(d)


class TestEmaProperty:
    @SLOW
    @given(st.lists(st.integers(0, 40), min_size=1, max_size=50),
           st.integers(1, 3))
    def test_ema_matches_bruteforce(self, ray_session, tmp_path_factory,
                                    day_offsets, n_types):
        from yetisearch_ray.pipelines.events import daily_ema

        tmp = tmp_path_factory.mktemp("ema")
        base = pd.Timestamp("2024-01-01")
        ts, uid, ety = [], [], []
        for i, off in enumerate(day_offsets):
            ts.append(base + pd.Timedelta(days=off, minutes=i))
            uid.append(i % 3)
            ety.append(f"t{i % n_types}")
        sf = _write_events(tmp, ts, uid, etype=ety)
        got = daily_ema(sf, alpha=0.3, window=14)
        # brute force per type
        w = np.power(0.7, np.arange(14))
        for ty, g in got.groupby("event_type"):
            g = g.sort_values("day").reset_index(drop=True)
            n = g.n.to_numpy(np.float64)
            for i in range(len(g)):
                lo = max(0, i - 13)
                xs = n[lo:i + 1][::-1]
                ws = w[:len(xs)]
                want = (xs * ws).sum() / ws.sum()
                assert abs(g.ema[i] - round(want, 6)) < 1e-9


class TestLatestEventProperty:
    @SLOW
    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5),
                              st.integers(0, 99)),
                    min_size=1, max_size=40))
    def test_latest_matches_bruteforce(self, ray_session,
                                       tmp_path_factory, rows):
        from yetisearch_ray.pipelines.events import latest_event_per_user

        tmp = tmp_path_factory.mktemp("latest")
        base = pd.Timestamp("2024-01-01")
        ts = [base + pd.Timedelta(hours=h) for _, h, _ in rows]
        uid = [u for u, _, _ in rows]
        eid = list(range(len(rows)))
        ety = [f"e{x % 4}" for _, _, x in rows]
        sf = _write_events(tmp, ts, uid, etype=ety, event_id=eid)
        got = latest_event_per_user(sf)
        df = pd.DataFrame({"user_id": uid, "ts": ts, "event_id": eid,
                           "event_type": ety})
        want = (df.sort_values(["user_id", "ts", "event_id"])
                .groupby("user_id").last().reset_index())
        assert list(got.user_id) == list(want.user_id)
        assert list(got.event_type) == list(want.event_type)


class TestPercentileRanksProperty:
    @SLOW
    @given(st.lists(st.floats(0, 1000, allow_nan=False), min_size=1,
                    max_size=60))
    def test_ranks_match_numpy(self, ray_session, tmp_path_factory,
                               prices):
        from yetisearch_ray.pipelines.relational import percentile_ranks

        tmp = tmp_path_factory.mktemp("pr")
        d = tmp / "sf"
        d.mkdir()
        n = len(prices)
        t = pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array([1] * n, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array(
                pd.to_datetime(["2024-01-01"] * n), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
        })
        pq.write_table(t, d / "orders.parquet")
        thr = (100.0, 500.0)
        got = percentile_ranks(str(d), thresholds=thr)
        x = np.asarray(prices)
        for v, frac in zip(got.threshold, got.frac):
            assert abs(frac - round((x <= v).mean(), 6)) < 1e-9


class TestNoveltyProperty:
    @SLOW
    @given(st.lists(st.lists(st.sampled_from("abcdefg"), min_size=0,
                             max_size=12), min_size=1, max_size=10))
    def test_novelty_matches_bruteforce(self, ray_session,
                                        tmp_path_factory, token_lists):
        import ray.data as rd

        from yetisearch_ray.pipelines.textstats import ngram_novelty

        tmp = tmp_path_factory.mktemp("nov")
        d = tmp / "sf"
        d.mkdir()
        texts = [" ".join(toks) for toks in token_lists]
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(t, d / "documents.parquet")
        got = ngram_novelty(rd.read_parquet(str(d / "documents.parquet")),
                            n=3)
        # brute force
        first: dict = {}
        per_doc: dict = {}
        for i, toks in enumerate(token_lists):
            grams = {" ".join(toks[j:j + 3])
                     for j in range(max(0, len(toks) - 2))}
            if grams:
                per_doc[i] = grams
                for g in grams:
                    first.setdefault(g, i)
        assert set(got.doc_id) == set(per_doc)
        for r in got.itertuples():
            grams = per_doc[r.doc_id]
            nov = sum(1 for g in grams if first[g] == r.doc_id)
            assert r.n_grams == len(grams)
            assert r.n_novel == nov
