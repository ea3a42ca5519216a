"""Lake-table semantics: exactly-once, resume, schema evolution, pruning,
concurrent-writer guard, metrics reconciliation."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.lake.table import ConcurrentCommitError, LakeTable, Snapshot
from data_pipeline_spark.metrics import read_metrics
from data_pipeline_spark.pipeline import apply_batch, ensure_table, replay
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replayed(spark):
    root = tempfile.mkdtemp(prefix="lake_t_")
    table = replay(spark, SF_SMOKE, root, n_batches=3, n_buckets=16)
    return table


def _final_multiset(table):
    return sorted(
        (r.url, r.lsn) for r in table.read().select("url", "lsn").collect()
    )


def test_replay_is_idempotent(spark, replayed):
    v = replayed.current().version
    before = _final_multiset(replayed)
    replay(spark, SF_SMOKE, replayed.root, n_batches=3, n_buckets=16)
    assert replayed.current().version == v
    assert _final_multiset(replayed) == before


def test_same_commit_key_different_data_is_noop(spark, replayed):
    log = cl.changelog(spark, SF_SMOKE).withColumn("lsn", F.col("lsn") + 10**9)
    before = _final_multiset(replayed)
    stats = apply_batch(replayed, log.limit(5), "replay-1", record_metrics=False)
    assert not stats.applied
    assert _final_multiset(replayed) == before


def test_partial_then_resume_equals_oneshot(spark):
    log = cl.changelog(spark, SF_SMOKE)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + 2) // 3
    root_a = tempfile.mkdtemp()
    t = ensure_table(spark, root_a, 8)
    apply_batch(
        t, log.filter(F.col("lsn") < lo + span), "replay-0", record_metrics=False
    )
    replay(spark, SF_SMOKE, root_a, n_batches=3, n_buckets=8, record_metrics=False)
    root_b = tempfile.mkdtemp()
    one = replay(spark, SF_SMOKE, root_b, n_batches=1, n_buckets=8, record_metrics=False)
    assert _final_multiset(t) == _final_multiset(one)


def test_out_of_order_batches_converge(spark):
    """LWW makes the final state order-independent (the reference's
    out-of-order append robustness, register_per_acquisition.py:1-20)."""
    log = cl.changelog(spark, SF_SMOKE)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid = lo + (hi - lo) // 2
    root_a = tempfile.mkdtemp()
    t = ensure_table(spark, root_a, 8)
    apply_batch(t, log.filter(F.col("lsn") > mid), "b1", record_metrics=False)
    apply_batch(t, log.filter(F.col("lsn") <= mid), "b0", record_metrics=False)
    root_b = tempfile.mkdtemp()
    one = replay(spark, SF_SMOKE, root_b, n_batches=1, n_buckets=8, record_metrics=False)
    assert _final_multiset(t) == _final_multiset(one)


def test_schema_evolution_add_and_widen(spark):
    root = tempfile.mkdtemp()
    t = LakeTable.create(
        spark, root, [("url", "string"), ("lsn", "bigint"), ("score", "int")], "url", 4
    )
    df = spark.createDataFrame(
        [("a", 1, 10, "update"), ("b", 2, 20, "update")],
        "url string, lsn bigint, score int, op string",
    )
    from data_pipeline_spark.lake.merge import merge_into

    merge_into(t, df, "c1")
    t.evolve_schema(add_columns={"lang": "string"}, widen={"score": "bigint"})
    out = t.read()
    assert dict(t.schema_fields(t.current()))["score"] == "bigint"
    assert out.filter(F.col("lang").isNull()).count() == 2
    # post-evolution merge: new column flows, old files still readable
    df2 = spark.createDataFrame(
        [("a", 3, 30, "de", "update"), ("c", 4, 40, "fr", "update")],
        "url string, lsn bigint, score bigint, lang string, op string",
    )
    merge_into(t, df2, "c2")
    rows = {r.url: (r.score, r.lang) for r in t.read().collect()}
    assert rows == {"a": (30, "de"), "b": (20, None), "c": (40, "fr")}


def test_delete_semantics(spark):
    root = tempfile.mkdtemp()
    t = LakeTable.create(spark, root, [("url", "string"), ("lsn", "bigint")], "url", 4)
    from data_pipeline_spark.lake.merge import merge_into

    df = spark.createDataFrame(
        [("a", 1, "insert"), ("b", 2, "insert")], "url string, lsn bigint, op string"
    )
    merge_into(t, df, "c1")
    # delete a; stale delete for b (older lsn) must NOT win
    df2 = spark.createDataFrame(
        [("a", 3, "delete"), ("b", 1, "delete")], "url string, lsn bigint, op string"
    )
    merge_into(t, df2, "c2")
    rows = {r.url: r.lsn for r in t.read().collect()}
    assert rows == {"b": 2}


def test_bucket_pruning_exact(spark, replayed):
    snap = replayed.current()
    full = replayed.read().withColumn("b", replayed.bucket_expr(snap))
    some = {0, 3, 7}
    expect = {r.url for r in full.filter(F.col("b").isin(*some)).collect()}
    got = {r.url for r in replayed.read(buckets=some).collect()}
    assert got == expect


def test_concurrent_commit_guard(spark, replayed):
    snap = replayed.current()
    with pytest.raises(ConcurrentCommitError):
        replayed._write_snapshot(
            Snapshot(**{**snap.__dict__, "version": snap.version + 1}),
            expect_parent=snap.version - 1,
        )


def test_metrics_reconciliation(spark, replayed):
    """A5's invariant under merge-on-read: per bucket, the SUM of lineage
    rows-added across all commits (no compaction has run on `replayed`)
    equals the physical rows in that bucket."""
    lineage = read_metrics(replayed, "lineage")
    lin = {
        r.bucket: r.total
        for r in lineage.groupBy("bucket")
        .agg(F.sum("rows").alias("total"))
        .collect()
    }
    snap = replayed.current()
    actual = {
        r.b: r.n
        for r in replayed.read(buckets=set(lin), raw=True)
        .withColumn("b", replayed.bucket_expr(snap))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for b, rows in lin.items():
        assert actual.get(b, 0) == rows, (b, rows, actual.get(b))


def test_tied_lsn_events_collapse_to_one_deterministic_row(spark):
    """Rows tied on (url, lsn) — a feed contract violation — pass through
    the write path as duplicate physical delta rows (no per-batch
    detection job on the hot path), but every READ collapses them to one
    deterministic winner via the (lsn, row-fingerprint) order, two
    independent replays with opposite input order agree, and compaction
    physically folds the duplicates to one base row."""

    def _batch(rows):
        df = spark.createDataFrame(
            rows, "url string, lsn bigint, warc_ts string, html binary, "
            "lang string, op string"
        )
        return df.select(
            "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
            "html", F.lit(None).cast("string").alias("text"), "lang", "op",
        )

    TS = "2024-01-01 00:00:00"
    rows = [
        # u1: byte-identical redelivery (x3) at the winning lsn
        ("u1", 5, TS, b"<body>same</body>", "en", "insert"),
        ("u1", 5, TS, b"<body>same</body>", "en", "insert"),
        ("u1", 5, TS, b"<body>same</body>", "en", "insert"),
        # u2: DIFFERING payloads tied at the winning lsn
        ("u2", 7, TS, b"<body>alpha</body>", "en", "insert"),
        ("u2", 7, TS, b"<body>beta</body>", "de", "insert"),
        # u3: ties only below the winning lsn (discarded by the join)
        ("u3", 1, TS, b"<body>old</body>", "en", "insert"),
        ("u3", 1, TS, b"<body>old2</body>", "en", "insert"),
        ("u3", 2, TS, b"<body>new</body>", "fr", "insert"),
    ]

    outcomes = []
    for trial in range(2):
        t = ensure_table(
            spark, tempfile.mkdtemp(prefix=f"tie_{trial}_"), 4
        )
        # shuffle the input order between trials: determinism must not
        # depend on arrival order
        ordered = rows if trial == 0 else list(reversed(rows))
        apply_batch(t, _batch(ordered), "e0")
        # every READ sees exactly one row per key
        logical = t.read().select("url", "lsn", "html", "lang")
        per_key = {
            r["url"]: r["n"]
            for r in logical.groupBy("url").agg(
                F.count("*").alias("n")).collect()
        }
        assert per_key == {"u1": 1, "u2": 1, "u3": 1}, per_key
        before = sorted(
            (r.url, r.lsn, bytes(r.html), r.lang) for r in logical.collect()
        )
        # compaction folds the physical duplicates and preserves exactly
        # the winners every read already saw
        t.compact("c0")
        raw = t.read(include_tombstones=True, raw=True)
        phys = {
            r["url"]: r["n"]
            for r in raw.groupBy("url").agg(F.count("*").alias("n")).collect()
        }
        assert phys == {"u1": 1, "u2": 1, "u3": 1}, phys
        after = sorted(
            (r.url, r.lsn, bytes(r.html), r.lang)
            for r in t.read().select("url", "lsn", "html", "lang").collect()
        )
        assert before == after
        outcomes.append(after)
    assert outcomes[0] == outcomes[1]  # deterministic across replays
    assert [o[2] for o in outcomes[0] if o[0] == "u3"] == [b"<body>new</body>"]


def test_write_compression_codec_property(spark):
    import glob as _glob
    import os as _os
    import tempfile as _tf

    import pyarrow.parquet as _pq

    from data_pipeline_spark.lake.merge import merge_into as _mi
    from data_pipeline_spark.pipeline import ensure_table as _ensure

    ddl = ("url string, lsn bigint, warc_ts timestamp, html binary, "
           "text string, lang string, op string")
    row = [("u1", 1, None, b"<p>x</p>", "x", "en", "insert")]
    # default is zstd as of r5 (measured 32-core A/B: 0.62x snappy's
    # bytes on html payloads, wall parity at full width)
    t = _ensure(spark, _tf.mkdtemp(prefix="codec_"), 2)
    _mi(t, spark.createDataFrame(row, ddl), "c1")
    f = _glob.glob(_os.path.join(t.root, "data", "**", "*.parquet"),
                   recursive=True)[0]
    md = _pq.read_metadata(f)
    assert md.row_group(0).column(0).compression.lower() == "zstd"
    assert t.read().count() == 1  # reads back fine
    # the Iceberg-named property still overrides per table
    t2 = _ensure(spark, _tf.mkdtemp(prefix="codec_"), 2)
    t2.update_props({"write.parquet.compression-codec": "snappy"})
    _mi(t2, spark.createDataFrame(row, ddl), "c1")
    f2 = _glob.glob(_os.path.join(t2.root, "data", "**", "*.parquet"),
                    recursive=True)[0]
    md2 = _pq.read_metadata(f2)
    assert md2.row_group(0).column(0).compression.lower() == "snappy"
    assert t2.read().count() == 1


def test_distributed_entries_match_threadpool(spark, tmp_path):
    """Wide fanout commits compute manifest entries in a Spark job
    (executor-side, Iceberg writer-stats shape); the result must be
    byte-identical to the driver thread-pool path."""
    from data_pipeline_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "wide"),
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", 8,
    )
    df = spark.createDataFrame(
        [(f"u{i}", i, f"v{i}") for i in range(400)],
        "url string, lsn bigint, v string",
    ).withColumn("op", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("insert"))
    from data_pipeline_spark.lake.merge import merge_into

    merge_into(t, df, "seed")
    snap = t.current()
    paths = [
        e["path"]
        for b in snap.manifests
        for e in t.bucket_entries(snap, b)
    ]
    assert len(paths) >= 8
    local = t._entries(paths, snap.schema_version, "delta")
    orig = LakeTable._DISTRIBUTED_ENTRIES_AT
    try:
        LakeTable._DISTRIBUTED_ENTRIES_AT = 4  # force the Spark-job tier
        dist = t._entries(paths, snap.schema_version, "delta")
    finally:
        LakeTable._DISTRIBUTED_ENTRIES_AT = orig
    assert dist == local
