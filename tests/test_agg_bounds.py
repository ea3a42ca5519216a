"""agg_bounds(): MIN/MAX answered from manifest footer stats (Iceberg
min/max aggregate pushdown) with per-column tombstone soundness and
bucket-pruned scan fallback."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable, _epoch_us
from data_pipeline_spark.maintenance import delete_where
from data_pipeline_spark.pipeline import apply_batch, replay

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _mk_scored(spark):
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_ab_"),
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("score", "bigint"), ("lang", "string")],
        "url", 4,
    )
    df = spark.createDataFrame(
        [(f"u{i}", i + 1, "2026-01-01 00:00:00", (i * 7) % 101, "en")
         for i in range(40)],
        "url string, lsn bigint, warc_ts string, score bigint, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
     .withColumn("op", F.lit("upsert"))
    merge_into(t, df, "c1")
    return t


def test_payload_bounds_metadata_only_despite_tombstones(spark):
    """Tombstones carry NULLs in payload columns, so a compacted bucket
    answers payload MIN/MAX from metadata even while fenced tombstones
    persist — fence columns (lsn) still demand the scan."""
    t = _mk_scored(spark)
    delete_where(t, F.col("score") >= 95, "dw")
    t.compact("k", min_files=1)
    live = t.read().agg(F.min("score"), F.max("score")).first()
    plan = t.agg_bounds("score", with_plan=True)
    assert (plan["min"], plan["max"]) == (live[0], live[1])
    assert plan["scanned_buckets"] == []
    # lsn is a fence column and tombstones persist -> scan fallback
    lsn_plan = t.agg_bounds("lsn", with_plan=True)
    assert lsn_plan["scanned_buckets"]
    lsn_live = t.read().agg(F.min("lsn"), F.max("lsn")).first()
    assert (lsn_plan["min"], lsn_plan["max"]) == tuple(lsn_live)


def test_raw_bounds_pure_metadata_and_include_fences(spark):
    t = _mk_scored(spark)
    delete_where(t, F.col("score") >= 95, "dw")
    plan = t.agg_bounds("lsn", raw=True, with_plan=True)
    assert plan["scanned_buckets"] == []  # raw: base AND delta by stats
    raw = t.read(raw=True, include_tombstones=True) \
        .agg(F.min("lsn"), F.max("lsn")).first()
    assert (plan["min"], plan["max"]) == tuple(raw)
    assert plan["max"] > 40  # the delete fence (hi-watermark + 1) counts


def test_replay_table_mixed_buckets_partial_scan(spark, tmp_path):
    t = replay(spark, SF_DIR, str(tmp_path / "t"), n_batches=3,
               n_buckets=8, record_metrics=False)
    t.compact("c1")
    late = cl.changelog(spark, SF_DIR).orderBy(F.desc("lsn")).limit(5)
    apply_batch(t, late, commit_key="late", record_metrics=False)
    plan = t.agg_bounds("warc_ts", raw=True, with_plan=True)
    assert plan["metadata_buckets"]  # untouched buckets stay metadata
    raw = t.read(raw=True, include_tombstones=True) \
        .agg(F.min("warc_ts"), F.max("warc_ts")).first()
    assert (plan["min"], plan["max"]) == (_epoch_us(raw[0]),
                                          _epoch_us(raw[1]))


def test_string_columns_always_scan_but_answer_right(spark):
    """String footer maxima are truncated UPPER BOUNDS, not values —
    metadata must never answer them."""
    t = _mk_scored(spark)
    t.compact("k", min_files=1)
    plan = t.agg_bounds("lang", with_plan=True)
    assert plan["metadata_buckets"] == []
    assert (plan["min"], plan["max"]) == ("en", "en")


def test_refusals_under_masks_filters_modes(spark):
    import pytest

    from data_pipeline_spark import masking

    t = _mk_scored(spark)
    masking.add_mask(t, "score", "0")
    with pytest.raises(ValueError, match="masked column"):
        t.agg_bounds("score")
    assert t.agg_bounds("lsn", raw=True)[1] is not None  # raw unaffected
    masking.add_row_filter(t, "hi", "score < 50")
    with pytest.raises(ValueError, match="row filters"):
        t.agg_bounds("lsn")
