"""Property tests for the round-3 curation operators: random inputs,
independently recomputed expectations (pure Python / DuckDB)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_rows(token_counts):
    return [{"doc_id": i, "n_tokens": int(n)} for i, n in enumerate(token_counts)]


@pytest.mark.usefixtures("ray_session")
class TestPackingProperty:
    @given(st.lists(st.integers(min_value=0, max_value=500),
                    min_size=1, max_size=40),
           st.integers(min_value=1, max_value=800))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_bins_equal_prefix_sum(self, toks, budget):
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import pack_token_bins

        got = pack_token_bins(rd.from_items(_mk_rows(toks)), budget=budget,
                              range_size=7).to_pandas()
        csum = np.cumsum([0] + list(toks))[:-1]
        want = [int(c) // budget for c in csum]
        assert got.bin_id.tolist() == want


@pytest.mark.usefixtures("ray_session")
class TestQuotaProperty:
    @given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=60),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_first_n_per_group(self, groups, n):
        import ray.data as rd

        from yetisearch_ray.pipelines.curation import quota_per_group

        rows = [{"doc_id": i, "source": g} for i, g in enumerate(groups)]
        got = quota_per_group(rd.from_items(rows), group_col="source",
                              n=n).to_pandas()
        want = []
        seen: dict = {}
        for i, g in enumerate(groups):
            seen[g] = seen.get(g, 0) + 1
            if seen[g] <= n:
                want.append(i)
        assert got.doc_id.tolist() == want


@pytest.mark.usefixtures("ray_session")
class TestDecontaminateProperty:
    @given(st.lists(st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
                    min_size=1, max_size=20),
           st.lists(st.sampled_from(WORDS), min_size=3, max_size=12))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_hits_equal_set_intersection(self, docs, bench_toks):
        import ray.data as rd

        from yetisearch_ray.pipelines.dedup import ngram_decontaminate

        def sh(toks):
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

        bench_text = " ".join(bench_toks)
        rows = [{"doc_id": i, "text": " ".join(d)} for i, d in enumerate(docs)]
        got = ngram_decontaminate(rd.from_items(rows),
                                  [bench_text]).to_pandas()
        bset = sh(bench_toks)
        want = [len(sh(d) & bset) for d in docs]
        assert got.sort_values("doc_id").n_hits.tolist() == want
