"""Uniform ``as_dataset`` / parquet-sink contract for per-doc-output
operators (round-4 verdict item #4): every operator whose natural output
is one row per document must offer a streaming Dataset path whose
content is identical to the collected-DataFrame path, so a 100 TB run
can ``write_parquet`` instead of collecting on the driver."""

import os

import pandas as pd
import pytest
import ray.data as rd

from yetisearch_ray.pipelines import events, relational, textstats

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


def _frame_of(ds_result, sort_cols):
    pdf = ds_result.to_pandas()
    return pdf.sort_values(sort_cols).reset_index(drop=True)


def test_tfidf_topk_dataset_path_equals_frame_path(ray_session, tmp_path):
    frame = textstats.tfidf_topk(_docs(), k=3)
    ds = textstats.tfidf_topk(_docs(), k=3, as_dataset=True)
    got = _frame_of(ds, ["doc_id", "term_rank"])[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, got, check_dtype=False)
    # the Dataset path must sink to parquet and read back identically
    out = str(tmp_path / "tfidf")
    textstats.tfidf_topk(_docs(), k=3, as_dataset=True).write_parquet(out)
    back = (pd.read_parquet(out).sort_values(["doc_id", "term_rank"])
            .reset_index(drop=True))[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, back, check_dtype=False)


def test_percent_rank_nchars_dataset_path(ray_session, tmp_path):
    frame = relational.percent_rank_nchars(SF)
    ds = relational.percent_rank_nchars(SF, as_dataset=True)
    got = _frame_of(ds, ["doc_id"])[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, got, check_dtype=False)
    out = str(tmp_path / "pr")
    relational.percent_rank_nchars(SF, as_dataset=True).write_parquet(out)
    assert len(pd.read_parquet(out)) == len(frame)


def test_asof_join_orders_dataset_path(ray_session, tmp_path):
    frame = events.asof_join_orders(SF)
    ds = events.asof_join_orders(SF, as_dataset=True)
    got = _frame_of(ds, ["event_id"])[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, got, check_dtype=False)
    out = str(tmp_path / "asof")
    events.asof_join_orders(SF, as_dataset=True).write_parquet(out)
    assert len(pd.read_parquet(out)) == len(frame)


@pytest.mark.parametrize("op,kwargs,sort_cols", [
    (textstats.entropy_stats, {}, ["doc_id"]),
    (textstats.dsir_logweights, {}, ["doc_id"]),
])
def test_dataset_native_ops_sink_to_parquet(ray_session, tmp_path, op,
                                            kwargs, sort_cols):
    """Ops that already return a Dataset must write_parquet cleanly and
    the sink must hold exactly the collected content."""
    ds = op(_docs(), **kwargs)
    frame = _frame_of(ds, sort_cols)
    out = str(tmp_path / op.__name__)
    op(_docs(), **kwargs).write_parquet(out)
    back = (pd.read_parquet(out).sort_values(sort_cols)
            .reset_index(drop=True))[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, back, check_dtype=False)


def test_c4_line_clean_sinks_to_parquet(ray_session, tmp_path):
    from yetisearch_ray.pipelines import curation

    ds = curation.c4_line_clean(_docs())
    frame = _frame_of(ds, ["doc_id"])
    out = str(tmp_path / "c4")
    curation.c4_line_clean(_docs()).write_parquet(out)
    back = (pd.read_parquet(out).sort_values(["doc_id"])
            .reset_index(drop=True))[frame.columns.tolist()]
    pd.testing.assert_frame_equal(frame, back, check_dtype=False)
