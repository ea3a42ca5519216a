"""Derived artifacts downstream of a CRASHING stream: after kill+resume,
TextIndex / JoinView refreshes converge to exactly the direct computation
over the final table state — derivation maintenance composes with the
stream's exactly-once story (epoch commit keys below, cursor-in-props
epochs above)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.matview_join import JoinView
from data_pipeline_spark.operators.text_index import TextIndex, doc_tokens
from data_pipeline_spark.streaming.pipeline import run_stream, write_wal

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def streamed(spark):
    """One table fed by a stream that CRASHES after 2 epochs mid-WAL,
    refreshing derivations at the crash point, then resumes to the end."""
    wal = tempfile.mkdtemp(prefix="wal_der_")
    root = tempfile.mkdtemp(prefix="lake_der_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_der_")
    write_wal(spark, SF_SMOKE, wal, n_files=4)

    def drain(**kw):
        q = run_stream(
            spark, wal, root, ckpt, n_buckets=8, record_metrics=False,
            available_now=True, **kw,
        )
        try:
            q.awaitTermination(300)
        except Exception:
            pass
        finally:
            if q.isActive:
                q.stop()
        return LakeTable(spark, root)

    drain(fail_after_batches=2, fail_mode="after")
    t = LakeTable(spark, root)
    idx = TextIndex(spark, t, tempfile.mkdtemp(prefix="der_tix_"), "text", 4)
    idx.refresh()  # mid-stream refresh: cursor parked mid-replay
    dim = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="der_dim_"),
        [("lang", "string"), ("lsn", "bigint"), ("tier", "bigint")],
        key="lang", n_buckets=4,
    )
    merge_into(dim, spark.createDataFrame(
        [(lg, 1, i) for i, lg in enumerate(["en", "de", "fr", "es", "pt"])],
        "lang string, lsn bigint, tier bigint",
    ).withColumn("op", F.lit("insert")), "dim0")
    view = JoinView(
        spark, t, dim, tempfile.mkdtemp(prefix="der_jv_"),
        join_expr="lang",
        fact_cols=[("src_lsn", "bigint", "lsn")],
        dim_cols=["tier"],
        n_buckets=4,
        join_expr_cols=["lang"],
    )
    view.refresh()  # mid-stream refresh too
    table = drain()  # resume to the end of the WAL
    return table, idx, dim, view


def test_text_index_converges_after_resume(spark, streamed):
    table, idx, _, _ = streamed
    idx.refresh()
    got = sorted(
        (r.tok, r.src_key)
        for r in idx.table.read(columns=["tok", "src_key"]).collect()
    )
    want = sorted(
        (r.tok, r.url)
        for r in table.read()
        .select("url", F.explode(doc_tokens(F.col("text"))).alias("tok"))
        .collect()
    )
    assert got == want


def test_join_view_converges_after_resume(spark, streamed):
    table, _, dim, view = streamed
    view.refresh(max_point_keys=50)  # forces the semi-join route too
    got = sorted(
        (r.url, r.src_lsn, r.tier) for r in view.read().collect()
    )
    want = sorted(
        (r.url, r.lsn, r.tier)
        for r in table.read().select("url", "lsn", "lang")
        .join(dim.read().select("lang", "tier"), "lang")
        .collect()
    )
    assert got == want
