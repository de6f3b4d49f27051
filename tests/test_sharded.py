"""Sharded serving must return EXACTLY the single-reader results."""
import pytest

from yetisearch_ray.search.engine import SearchEngine, open_index


@pytest.mark.usefixtures("ray_session")
class TestShardedServing:
    @pytest.fixture(scope="class")
    def engines(self, built_index):
        from yetisearch_ray.search.sharded import open_sharded

        local = SearchEngine(open_index(built_index), cache_ttl=0.0)
        sharded = open_sharded(built_index, n_shards=3, cache_ttl=0.0)
        yield local, sharded
        sharded.index.shutdown()

    CASES = [
        dict(q="parse buffer", mode="smart"),
        dict(q="retry backoff", mode="and"),
        dict(q='"exponential backoff"'),
        dict(q="parse buffer", mode="or"),
        dict(q="module", field_weights={"path": 5.0, "content": 1.0}),
        dict(q="return", language="python"),
        dict(q="pars", prefix_last=True),
        dict(q="parseing", fuzzy=True),
    ]

    def test_identical_results(self, engines):
        local, sharded = engines
        for case in self.CASES:
            kw = dict(case)
            q = kw.pop("q")
            a = local.search(q, limit=20, normalize=False, **kw)
            b = sharded.search(q, limit=20, normalize=False, **kw)
            assert a.equals(b), (case, a.to_pydict(), b.to_pydict())

    def test_split_hot_term_spans_shards(self, engines):
        """Hot/split terms read from multiple partitions (and so usually
        multiple shards) must still merge identically."""
        local, sharded = engines
        a = local.search("return", limit=50, normalize=False)
        b = sharded.search("return", limit=50, normalize=False)
        assert a.equals(b)

    def test_shard_ownership_partition_cover(self, engines):
        import ray

        _, sharded = engines
        owned = [set(ray.get(s.owned.remote()))
                 for s in sharded.index._shards]
        all_parts = set().union(*owned)
        assert all_parts == set(range(sharded.index.num_partitions))
        for i in range(len(owned)):
            for j in range(i + 1, len(owned)):
                assert not (owned[i] & owned[j])
