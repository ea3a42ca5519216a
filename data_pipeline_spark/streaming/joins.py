"""Stream-stream event-time interval join → exactly-once lake append.

The Flink/Spark "interval join" shape: two live change feeds (e.g. the
page-event WAL and a crawl-metrics feed) joined on key within an
event-time window, with the joined rows landed in an append-mode lake
table under the engine's epoch-key exactly-once contract.

How it composes with the rest of the engine:

    readStream(left WAL) ──┐
                           ├─ withWatermark × 2 → interval inner join
    readStream(right WAL) ─┘          (Spark's symmetric-hash join state,
                                       checkpoint-versioned)
        → foreachBatch: commit_delta append under ``epoch={batch_id}``
        → checkpointLocation (offsets of BOTH sources + join state)

Unlike the single-feed ``run_stream`` (which tails paths only and
re-reads files inside foreachBatch), a stream-stream join must ship
real rows through the streaming graph — the join operator holds them in
its state store — so both sides are column-pruned BEFORE the join and
the payload (html) is never carried. Exactly-once is the same argument
as run_stream: a post-commit/pre-checkpoint crash re-fires the same
batch_id with the same deterministic batch (offsets + state-store
version N-1 reconstruct it), and the commit key makes the re-apply a
recorded no-op.

Watermark semantics are Spark's: state for a side is evicted once its
watermark (max event time − delay) passes the join window, so a
DISORDERED feed needs ``watermark_s`` at least its disorder bound or
late matches silently drop — tests pin BOTH behaviors (span-covering
watermark == exact batch-join equality; tight watermark == documented
eviction). At 100 TB the state store is the scaling surface: state is
keyed by url (sharded like any keyed agg), bounded by
rate × (interval + watermark), and RocksDB-backed state stores are a
config flip away.

Reference analog: correlating the item feed with its sibling
quicklook/metadata feed before registration
(scripts/watch_cdse_and_process.py pairs products with their processing
outcomes across cron ticks — here the pairing is one declarative join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable

EPOCH_KEY = "epoch={n}"

# right-side feed: per-fetch metrics for a url (no payload)
METRICS_SCHEMA = "url string, metric_ts timestamp, status bigint, nbytes bigint"

JOINED_FIELDS = [
    ("url", "string"),
    ("lsn", "bigint"),
    ("warc_ts", "timestamp"),
    ("lang", "string"),
    ("metric_ts", "timestamp"),
    ("status", "bigint"),
    ("nbytes", "bigint"),
]


def write_metrics_wal(
    spark: SparkSession,
    events_wal_dir: str,
    metrics_wal_dir: str,
    reverse: bool = False,
) -> int:
    """Derive the metrics feed from an existing event WAL, one metrics
    segment per event segment: each event yields one metrics row at
    ``metric_ts = warc_ts + (lsn mod 7) minutes`` with deterministic
    status/nbytes — the synthetic stand-in for a real sibling feed.

    ``reverse=True`` lands the segments in REVERSE modification-time
    order (the file source delivers by mtime), so each event's matching
    metrics row arrives several micro-batches after the event — the
    disordered-feed fixture for watermark-eviction tests."""
    import time as _time

    os.makedirs(metrics_wal_dir, exist_ok=True)
    n = 0
    segs = sorted(
        s for s in os.listdir(events_wal_dir)
        if os.path.isdir(os.path.join(events_wal_dir, s))
    )
    if reverse:
        segs = segs[::-1]
    for seg in segs:
        src = os.path.join(events_wal_dir, seg)
        df = spark.read.parquet(src).select(
            "url",
            (
                F.col("warc_ts")
                + F.make_interval(mins=(F.col("lsn") % 7).cast("int"))
            ).alias("metric_ts"),
            (200 + (F.col("lsn") % 5) * 100).cast("bigint").alias("status"),
            (F.col("lsn") % 10000).cast("bigint").alias("nbytes"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(metrics_wal_dir, seg)
        )
        if reverse:
            _time.sleep(0.05)  # distinct mtimes pin the arrival order
        n += 1
    return n


def run_join_stream(
    spark: SparkSession,
    left_wal_dir: str,
    right_wal_dir: str,
    table_root: str,
    checkpoint_dir: str,
    interval_s: int = 600,
    watermark_s: int = 10 * 365 * 24 * 3600,
    n_buckets: int = 16,
    max_files_per_trigger: int = 1,
    fail_after_batches: int | None = None,
) -> LakeTable:
    """Join the event WAL with the metrics WAL on url within
    ``[warc_ts, warc_ts + interval_s]`` and append matches exactly once,
    draining all available segments (availableNow trigger — the live
    tail form is the same query without the trigger; run_stream's loop
    conventions apply).

    ``watermark_s`` defaults to span-covering (no state eviction — exact
    equality with the batch join); production sets it to the feeds'
    disorder bound. ``fail_after_batches=N`` injects a post-commit
    pre-checkpoint crash after N epochs (the double-fire window) for
    kill/resume tests. Returns the output table handle.
    """
    from data_pipeline_spark.streaming.pipeline import WAL_SCHEMA

    if LakeTable.exists(table_root):
        table = LakeTable(spark, table_root)
    else:
        table = LakeTable.create(
            spark, table_root, JOINED_FIELDS, key="url",
            n_buckets=n_buckets, props={"merge.mode": "event"},
        )

    left = (
        spark.readStream.schema(WAL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(left_wal_dir)
        # prune BEFORE the join: state never holds html payload
        .select("url", "lsn", "warc_ts", "lang")
        .withWatermark("warc_ts", f"{watermark_s} seconds")
        .alias("l")
    )
    right = (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(right_wal_dir)
        .withWatermark("metric_ts", f"{watermark_s} seconds")
        .alias("r")
    )
    joined = left.join(
        right,
        F.expr(
            f"""l.url = r.url
            AND r.metric_ts >= l.warc_ts
            AND r.metric_ts <= l.warc_ts + interval {interval_s} seconds"""
        ),
        "inner",
    ).select(
        F.col("l.url").alias("url"),
        "lsn",
        "warc_ts",
        "lang",
        "metric_ts",
        "status",
        "nbytes",
    )

    seen = {"n": 0}

    def apply_epoch(batch: DataFrame, batch_id: int) -> None:
        cols = [n for n, _ in JOINED_FIELDS]
        key = EPOCH_KEY.format(n=batch_id)
        if key in table.current().commits:
            # Redelivered epoch (post-commit/pre-checkpoint crash): the
            # TABLE commit must no-op, but the BATCH must still be fully
            # evaluated — the interval join's state stores only commit
            # their per-batch version when the stateful operators run,
            # and Spark 4's state-commit validation fails the replay
            # otherwise (StateStoreCommitValidationFailed). A noop-format
            # write runs every partition without writing anything.
            batch.write.format("noop").mode("overwrite").save()
        else:
            # hash distribution: ONE delta file per touched bucket per
            # epoch — a fanout sink under a joined stream (post-shuffle
            # partitions × buckets) mints thousands of tiny files that
            # every downstream read then pays for
            table.commit_delta(
                batch.select(*cols), key, distribution="hash"
            )
        seen["n"] += 1
        if (
            fail_after_batches is not None
            and seen["n"] >= fail_after_batches
        ):
            raise RuntimeError(
                "injected post-commit failure (before checkpoint)"
            )

    (
        joined.writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return table
