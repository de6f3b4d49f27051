"""Scored fuzzy conformance vs the reference benchmark's own bars
(benchmarks/benchmark.php:211-327: standard == 100%, fuzzy >= 70%)."""
import pytest


@pytest.mark.usefixtures("ray_session")
class TestFuzzyBenchmark:
    @pytest.fixture(scope="class")
    def result(self, tmp_path_factory):
        from yetisearch_ray.pipelines.fuzzy_bench import run_fuzzy_benchmark

        work = str(tmp_path_factory.mktemp("movies"))
        return run_fuzzy_benchmark(work)

    def test_case_counts(self, result):
        df = result.to_pandas()
        assert (df.kind == "standard").sum() == 6
        assert (df.kind == "fuzzy").sum() == 50

    def test_standard_pass_rate_100(self, result):
        from yetisearch_ray.pipelines.fuzzy_bench import pass_rates

        assert pass_rates(result)["standard"] == 1.0

    def test_fuzzy_pass_rate_above_reference_bar(self, result):
        from yetisearch_ray.pipelines.fuzzy_bench import pass_rates

        rate = pass_rates(result)["fuzzy"]
        assert rate >= 0.7, f"fuzzy pass rate {rate:.2f} below 70% bar"

    def test_typo_classes_covered(self, result):
        df = result.to_pandas()
        fuzzy = df[df.kind == "fuzzy"]
        # every typo class (desc prefix family) must have at least one pass
        for frag in ("missing", "extra", "transposed", "prefix only",
                     "phonetic", "e->a"):
            sub = fuzzy[fuzzy.desc.str.contains(frag, regex=False)]
            assert sub.found.any(), f"all '{frag}' cases failed"
