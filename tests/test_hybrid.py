"""RRF fusion unit semantics (pipelines/hybrid.py).

The sf0.01 end-to-end parity of ``hybrid_rrf_topk`` vs its DuckDB
oracle is covered by tests/test_oracle_parity.py (it sweeps every
oracled entry); these pin the fusion kernel itself.
"""

import numpy as np
import pandas as pd

from yetisearch_ray.pipelines.hybrid import rrf_fuse


def _arm(ids, scores, id_col="id", score_col="s"):
    return pd.DataFrame({id_col: ids, score_col: scores}), id_col, score_col


class TestRrfFuse:
    def test_single_arm_is_reciprocal_ranks(self):
        out = rrf_fuse([_arm([5, 3, 9], [0.9, 0.5, 0.1])], k=10, rrf_k=60)
        assert out["doc_id"].tolist() == [5, 3, 9]
        np.testing.assert_allclose(
            out["rrf_score"].to_numpy(),
            np.round([1 / 61, 1 / 62, 1 / 63], 6))

    def test_doc_in_both_arms_outranks_single_arm_winner(self):
        # doc 7 is rank 2 in BOTH arms; doc 1 / doc 2 are rank-1 in one
        # arm each and absent from the other — RRF puts 7 first
        out = rrf_fuse([_arm([1, 7], [0.9, 0.8]),
                        _arm([2, 7], [0.9, 0.8])], k=3, rrf_k=60)
        assert out["doc_id"].tolist()[0] == 7
        assert set(out["doc_id"].tolist()) == {1, 2, 7}
        # equal single-arm scores tie-break by doc_id
        assert out["doc_id"].tolist() == [7, 1, 2]

    def test_rank_assignment_breaks_score_ties_by_id(self):
        # equal scores: rank order must be id-ascending (the SQL
        # oracle's row_number ORDER BY score DESC, id ASC)
        out = rrf_fuse([_arm([9, 2, 5], [0.5, 0.5, 0.5])], k=3)
        assert out["doc_id"].tolist() == [2, 5, 9]

    def test_k_limits_output(self):
        out = rrf_fuse([_arm(list(range(30)), list(range(30, 0, -1)))], k=10)
        assert len(out) == 10
        assert out["doc_id"].tolist() == list(range(10))

    def test_empty_arm_contributes_nothing(self):
        out = rrf_fuse([_arm([], []), _arm([4, 1], [0.9, 0.2])], k=5)
        assert out["doc_id"].tolist() == [4, 1]
        np.testing.assert_allclose(out["rrf_score"].to_numpy(),
                                   np.round([1 / 61, 1 / 62], 6))

    def test_all_arms_empty_yields_empty_frame(self):
        out = rrf_fuse([_arm([], []), _arm([], [])], k=5)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "rrf_score"]


import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestMmrRerank:
    """Greedy MMR diversity rerank (oracle identity in
    test_oracle_parity; behavioral contract here)."""

    def test_lambda_one_is_pure_relevance(self):
        from yetisearch_ray.pipelines import fts_documents as ftsd
        from yetisearch_ray.pipelines.hybrid import mmr_rerank_topk

        out = mmr_rerank_topk(SF, k=10, k_candidates=50, lam=1.0)
        bm = ftsd.or_topk(SF, k=50)
        # with no diversity penalty, selection order == BM25 order over
        # the candidates that have embeddings (all of them here)
        want = bm.sort_values(["score", "doc_id"],
                              ascending=[False, True]).doc_id.head(10)
        assert out.doc_id.tolist() == want.tolist()
        assert out["rank"].tolist() == list(range(1, 11))

    def test_diversifies_vs_plain_topk(self):
        import numpy as np
        import pyarrow.parquet as pq

        from yetisearch_ray.pipelines import fts_documents as ftsd
        from yetisearch_ray.pipelines.hybrid import mmr_rerank_topk

        mmr = mmr_rerank_topk(SF, k=10, k_candidates=50, lam=0.5)
        plain = ftsd.or_topk(SF, k=10)
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).to_pandas()
        vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
                for r in t.itertuples()}

        def avg_pairwise_cos(ids):
            V = np.stack([vecs[i] for i in ids])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            G = V @ V.T
            iu = np.triu_indices(len(ids), 1)
            return float(G[iu].mean())

        a = avg_pairwise_cos(mmr.doc_id.tolist())
        b = avg_pairwise_cos(plain.doc_id.tolist())
        assert a <= b + 1e-9, (a, b)
        # scores are the greedy objective at selection time: they are
        # non-increasing after the first pick
        s = mmr.mmr_score.to_numpy()
        assert (s[1:-1] >= s[2:] - 1e-12).all()
