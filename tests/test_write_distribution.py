"""Write distribution modes (Iceberg write.distribution-mode analog):
fanout writes task-local per-bucket files (no exchange, many files);
hash repartitions on the bucket id first — exactly one delta file per
touched bucket per commit. Same logical state either way."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable


def _mk(spark, props=None, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_dist_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("v", "string")],
        "url", n_buckets, props=props,
    )


def _batch(spark, n=64, parts=8):
    df = spark.createDataFrame(
        [(f"u{i}", i, "2024-01-01 00:00:00", f"v{i}", "insert")
         for i in range(n)],
        "url string, lsn bigint, warc_ts string, v string, op string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    return df.repartition(parts)


def _files_per_bucket(t):
    snap = t.current()
    return {
        b: len(es) for b, es in t.all_entries(snap).items() if es
    }


def test_hash_distribution_writes_one_file_per_bucket(spark):
    t = _mk(spark, props={"write.distribution": "hash"})
    merge_into(t, _batch(spark), "m0")
    fpb = _files_per_bucket(t)
    assert fpb and all(n == 1 for n in fpb.values()), fpb


def test_fanout_distribution_writes_task_local_files(spark):
    t = _mk(spark)  # default fanout
    # commit_delta directly: the merge path's collapse lets AQE coalesce
    # a toy batch to one partition, hiding the fanout multiplicity
    df = _batch(spark).drop("op").withColumn("__deleted", F.lit(False))
    t.commit_delta(df, "m0")
    fpb = _files_per_bucket(t)
    # 8 input partitions × 4 buckets: some bucket must carry >1 file
    assert max(fpb.values()) > 1, fpb


def test_hash_param_overrides_fanout_table(spark):
    t = _mk(spark)  # fanout table...
    df = _batch(spark).drop("op").withColumn("__deleted", F.lit(False))
    t.commit_delta(df, "m0", distribution="hash")  # ...hash per-commit
    fpb = _files_per_bucket(t)
    assert fpb and all(n == 1 for n in fpb.values()), fpb


def test_modes_produce_identical_state(spark):
    th = _mk(spark, props={"write.distribution": "hash"})
    tf = _mk(spark)
    merge_into(th, _batch(spark), "m0")
    merge_into(tf, _batch(spark), "m0")
    get = lambda t: sorted(  # noqa: E731
        (r.url, r.lsn, r.v) for r in t.read().collect()
    )
    assert get(th) == get(tf)
    assert len(get(th)) == 64


def test_unknown_distribution_refused(spark):
    t = _mk(spark)
    import pytest

    with pytest.raises(ValueError, match="unknown write distribution"):
        t.commit_delta(
            _batch(spark).withColumn("__deleted", F.lit(False)).drop("op"),
            "m0", distribution="zigzag",
        )


def test_partitions_metadata_table(spark):
    t = _mk(spark, props={"write.distribution": "hash"})
    merge_into(t, _batch(spark), "m0")
    t.compact("c0")
    merge_into(t, _batch(spark, n=8), "m1")  # delta tail on some buckets
    rows = {r.bucket: r for r in t.partitions().collect()}
    assert rows  # every non-empty bucket reported
    snap = t.current()
    for b, es in t.all_entries(snap).items():
        if not es:
            assert b not in rows
            continue
        r = rows[b]
        assert r.n_files == len(es)
        assert r.n_delta_files == sum(
            1 for e in es if e.get("kind", "base") == "delta"
        )
        assert r.bytes > 0
        if r.n_delta_files:
            assert 0 < r.delta_ratio < 1
