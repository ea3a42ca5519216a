"""Runtime-filter join (operators/runtime_filter.py): a selective dim's
key set prunes the fact-table scan to the files that can match — the
Iceberg runtime-filtering / DPP shape — while the joined result stays
exactly equal to the plain declarative join."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.operators.runtime_filter import (
    planned_file_count,
    runtime_filtered_join,
)

TS = "2026-01-01 00:00:00"


def _table(spark, n=64, batches=4, bloom_bits=1024):
    root = tempfile.mkdtemp(prefix="lake_rf_")
    t = LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", 8,
        props={"bloom_bits": bloom_bits} if bloom_bits else None,
    )
    lsn = 0
    for b in range(batches):
        rows = []
        for i in range(b, n, batches):
            lsn += 1
            rows.append((f"u{i}", lsn, TS, f"v{b}", "upsert"))
        df = spark.createDataFrame(
            rows, "url string, lsn bigint, warc_ts string, v string, op string"
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
        merge_into(t, df, f"c{b}")
    return t


def _dim(spark, keys, attr="p"):
    return spark.createDataFrame(
        [(k, f"{attr}{i}") for i, k in enumerate(keys)], "url string, prio string"
    )


def _set(df):
    return {tuple(r) for r in df.collect()}


def test_key_path_equals_plain_join(spark):
    t = _table(spark)
    dim = _dim(spark, ["u3", "u17", "u42", "u999"])  # one missing key
    got = runtime_filtered_join(t, dim, on="url")
    want = t.read().join(dim, on="url", how="inner")
    assert _set(got) == _set(want) and got.count() == 3
    assert sorted(got.columns) == sorted(want.columns)


def test_key_path_prunes_files(spark):
    t = _table(spark)
    dim = _dim(spark, ["u5"])
    pruned, total = planned_file_count(t, dim, on="url")
    # One key: its bucket's bloom-matching files only.
    assert pruned < total and pruned >= 1


def test_semi_join_variant(spark):
    t = _table(spark)
    dim = _dim(spark, ["u1", "u2"])
    got = runtime_filtered_join(t, dim, on="url", how="left_semi")
    want = t.read().join(dim.select("url"), on="url", how="left_semi")
    assert _set(got) == _set(want) and got.count() == 2


def test_overflow_falls_back_to_plain_join(spark):
    t = _table(spark)
    dim = _dim(spark, [f"u{i}" for i in range(10)])
    got = runtime_filtered_join(t, dim, on="url", max_keys=3)
    want = t.read().join(dim, on="url", how="inner")
    assert _set(got) == _set(want)
    pruned, total = planned_file_count(t, dim, on="url", max_keys=3)
    assert pruned == total  # no pruning claimed above the cap


def test_unprunable_join_type_falls_back(spark):
    t = _table(spark)
    dim = _dim(spark, ["u1", "u999"])
    got = runtime_filtered_join(t, dim, on="url", how="left_anti")
    want = t.read().join(dim, on="url", how="left_anti")
    assert _set(got) == _set(want)
    # Every live key except u1 survives the anti join.
    assert got.count() == t.read().count() - 1


def test_stats_path_interval_prune(spark):
    t = _table(spark)
    # Compact so per-bucket base files carry tight lsn stats.
    t.compact(commit_key="cp")
    dim = spark.createDataFrame([(2, "a"), (3, "b")], "lsn bigint, tag string")
    got = runtime_filtered_join(t, dim, on="lsn")
    want = t.read().join(dim, on="lsn", how="inner")
    assert _set(got) == _set(want) and got.count() == 2
    pruned, total = planned_file_count(t, dim, on="lsn")
    # lsn 2-3 live in the first write batch; post-compaction buckets whose
    # stats exclude the interval are skipped.
    assert pruned < total


def test_delta_tail_stays_correct_under_key_prune(spark):
    # A newer delta row for a matched key must win inside the pruned join
    # (merge-on-read collapse still runs over the pruned file set).
    t = _table(spark)
    df = spark.createDataFrame(
        [("u3", 1000, TS, "vNEW", "upsert")],
        "url string, lsn bigint, warc_ts string, v string, op string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    merge_into(t, df, "late")
    dim = _dim(spark, ["u3"])
    rows = runtime_filtered_join(t, dim, on="url").collect()
    assert len(rows) == 1 and rows[0]["v"] == "vNEW" and rows[0]["lsn"] == 1000
