"""Structured-Streaming wrapper: tail the change log, apply via foreachBatch.

The reference's change-feed tail is a cron loop that polls "items updated in
window", checkpoints a processed-state file after each success, and re-runs
idempotent per-item pipelines (reference: scripts/watch_cdse_and_process.py:95-146,
241-277; scripts/query_stac.py:152-182). Spark-first shape:

    readStream (file source over the WAL directory, maxFilesPerTrigger)
      -> foreachBatch(apply_batch)        # the SAME batch core as replay()
      -> checkpointLocation               # offsets survive kill/restart

Exactly-once layering (north_star):

1. **Offset checkpoint** — Spark's file-source checkpoint guarantees each
   WAL file is delivered to foreachBatch at-least-once with a stable
   ``batch_id`` (epoch).
2. **Idempotent commit** — ``apply_batch`` keys its snapshot commit by
   ``epoch=<batch_id>``; re-delivery after a crash (the classic
   foreachBatch double-fire) is a recorded no-op. Together: exactly-once
   table state (reference analog: time-key dedup makes re-runs converge,
   scripts/ingest_v1_s1_rtc.py:125-127).

The WAL directory is append-only files — at scale this is the landing zone
a Kafka/Debezium feed writes to (or an Iceberg changelog scan); the file
source is chosen because it is fully deterministic and replayable in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.pipeline import apply_batch, ensure_table

EPOCH_KEY = "epoch={n}"


class CircuitBreakerOpen(RuntimeError):
    """A poisoned epoch failed the pre-commit quality gate; the stream is
    stopped BEFORE the table commit so the table stays on the previous
    snapshot (the reference's consecutive-failure abort,
    operator-tools/_migrate_catalog/runner.py:342-353)."""


def write_wal(
    spark: SparkSession, sf_dir: str, wal_dir: str, n_files: int = 8,
    amplify: int = 1,
    transform=None,
) -> int:
    """Land the synthetic change log as an append-only WAL directory.

    Files are LSN-ranged so arrival order == log order (the file source
    lists by modification time; one file per range keeps batches
    deterministic under ``maxFilesPerTrigger=1``). ``transform`` (a
    DataFrame -> DataFrame fn, schema-preserving) reshapes each segment
    before it lands — e.g. deriving a patch feed for append merge-mode
    streams. Returns file count.
    """
    from pyspark.sql import functions as F

    log = cl.changelog(spark, sf_dir, amplify=amplify)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + n_files - 1) // n_files
    os.makedirs(wal_dir, exist_ok=True)
    n = 0
    # Files per segment bound batch-scan parallelism (a Kafka-partition
    # analog): 1 for small test logs, defaultParallelism for amplified
    # benchmark logs so each epoch's scan uses every core.
    fps = 1 if amplify <= 1 else spark.sparkContext.defaultParallelism
    for i in range(n_files):
        part = log.filter(
            (F.col("lsn") >= lo + i * span) & (F.col("lsn") < lo + (i + 1) * span)
        )
        if transform is not None:
            part = transform(part)
        part.repartition(fps).write.mode("overwrite").parquet(
            os.path.join(wal_dir, f"seg-{i:05d}")
        )
        n += 1
    return n


def write_jsonl_wal(
    spark: SparkSession, sf_dir: str, wal_dir: str, n_files: int = 8,
    amplify: int = 1,
) -> int:
    """Land the change log as ``.jsonl`` segment directories of
    Debezium-style JSON envelopes (operators/envelope.py) — the shape a
    Kafka-Connect / DMS sink actually writes to an object-store landing
    zone. Encoding is one pure ``to_json`` projection per segment (no
    shuffle beyond the repartition that sets files-per-segment); Spark's
    text writer commits each part file atomically (write-then-rename),
    so a live tail never lists a torn segment. Returns segment count."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.operators.envelope import encode_envelope

    log = cl.changelog(spark, sf_dir, amplify=amplify)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + n_files - 1) // n_files
    os.makedirs(wal_dir, exist_ok=True)
    fps = 1 if amplify <= 1 else spark.sparkContext.defaultParallelism
    for i in range(n_files):
        part = log.filter(
            (F.col("lsn") >= lo + i * span) & (F.col("lsn") < lo + (i + 1) * span)
        )
        encode_envelope(part).repartition(fps).write.mode("overwrite").text(
            os.path.join(wal_dir, f"seg-{i:05d}")
        )
    return n_files


# The WAL wire schema (fixed: table-side schema evolution never changes the
# feed; see test_mid_stream_schema_evolution).
WAL_SCHEMA = (
    "url string, lsn bigint, warc_ts timestamp, op string, "
    "html binary, lang string"
)


def write_warc_wal(
    spark: SparkSession, sf_dir: str, wal_dir: str, n_files: int = 8,
    amplify: int = 1,
) -> int:
    """Land the change log as ``.warc`` segment files (the Common Crawl
    landing-zone shape; operators/warc.py).

    Scale shape: records are rendered by the codegen record expression,
    hash-routed to their segment's partition, sorted within partitions
    by (segment, lsn), and STREAMED into segment files from the
    executors — memory is O(one Arrow batch), never O(segment), and no
    segment ever materializes as a single value (the naive
    collect-list-per-segment render OOMs once segments reach real
    archive size). Files appear atomically (tmp + rename) so a
    concurrent streaming tail never lists a half-written segment.
    Byte-identical to :func:`operators.warc.render_warc_segments` for
    the same (feed, n_files) — test-pinned."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data_pipeline_spark.operators.warc import warc_record_column

    log = cl.changelog(spark, sf_dir, amplify=amplify)
    os.makedirs(wal_dir, exist_ok=True)
    recs = (
        log.select(
            F.pmod(F.col("lsn"), F.lit(n_files)).alias("segment_id"),
            F.col("lsn"),
            warc_record_column().alias("rec"),
        )
        .repartition(n_files, "segment_id")
        .sortWithinPartitions("segment_id", "lsn")
    )

    def _write(batches):
        handles: dict[int, tuple[str, object]] = {}
        for pdf in batches:
            for sid, rec in zip(pdf["segment_id"], pdf["rec"]):
                sid = int(sid)
                h = handles.get(sid)
                if h is None:
                    path = os.path.join(wal_dir, f"seg-{sid:05d}.warc")
                    h = handles[sid] = (path, open(path + ".tmp", "wb"))
                h[1].write(rec.encode("ascii"))
        for path, fh in handles.values():
            fh.close()
            os.replace(path + ".tmp", path)  # atomic to the tail
        yield pd.DataFrame({"n": [len(handles)]})

    n = recs.mapInPandas(_write, "n int").agg(F.sum("n")).first()[0]
    return int(n or 0)


def _decode_warc_paths(sess: SparkSession, paths: list[str]) -> DataFrame:
    """Segment paths → WAL-schema rows: each task STREAM-walks its files
    (operators/warc.py parse_warc_files, O(chunk) memory per task — an
    archive-size segment never materializes as a single value), then the
    JVM-side timestamp cast and WAL column order."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.operators.warc import (
        parse_warc_files,
        warc_date_to_ts,
    )

    pdf = sess.createDataFrame(
        [(p,) for p in sorted(paths)], "wal_path string"
    ).repartition(min(len(paths), sess.sparkContext.defaultParallelism))
    return parse_warc_files(pdf).select(
        "url",
        "lsn",
        warc_date_to_ts().alias("warc_ts"),
        "op",
        "html",
        "lang",
    )


def reread_wal_paths(
    batch: DataFrame, source_format: str = "parquet",
    merge_schema: bool = False,
) -> DataFrame:
    """Turn a paths-only epoch frame (one ``wal_path`` per WAL file the
    file source assigned to this epoch) back into the epoch's event rows
    via a real batch scan — pruned FileScans, pushed filters, and AQE
    instead of an unpruned ``Scan ExistingRDD`` (see :func:`wal_stream`
    ``paths_only``). Local files an in-place feed repair deleted are
    skipped (the replacement segments arrive as a fresh epoch); non-local
    URIs pass through untouched (object stores are immutable-by-key)."""
    sess = batch.sparkSession
    paths = [r[0] for r in batch.select("wal_path").distinct().collect()]
    live = [
        p for p in paths
        if not p.startswith("file:") or os.path.exists(p[len("file:"):])
    ]
    if not live:
        return sess.createDataFrame([], WAL_SCHEMA)
    if source_format == "warc":
        return _decode_warc_paths(sess, live)
    if source_format == "jsonl":
        from data_pipeline_spark.operators.envelope import decode_envelope

        return decode_envelope(sess.read.schema("value string").text(*live))
    if merge_schema:
        # auto-evolve path: segments may carry columns the pinned WAL
        # schema predates — union footers across the epoch's files so a
        # drift column surfaces (NULL for pre-drift segments) instead of
        # being silently projected away.
        return sess.read.option("mergeSchema", "true").parquet(*live)
    return sess.read.schema(WAL_SCHEMA).parquet(*live)


def wal_stream(
    spark: SparkSession,
    wal_dir: str,
    max_files_per_trigger: int = 1,
    paths_only: bool = False,
) -> DataFrame:
    """The change feed as a streaming DataFrame (checkpointed file offsets).

    ``paths_only=True`` projects the stream down to the per-file
    ``_metadata.file_path`` pseudo-column: the streaming query then carries
    only the epoch's FILE LIST (offsets/checkpoint semantics unchanged) and
    the consumer re-reads those files as a plain batch scan. Rationale: a
    foreachBatch micro-batch surfaces as ``Scan ExistingRDD`` — column
    pruning and predicate pushdown never reach the parquet reader, so every
    action inside the epoch drags the wide html payload off disk. The
    re-read path restores real FileScans (ReadSchema pruning, pushed
    filters, AQE) for the whole apply plan.
    """
    from pyspark.sql import functions as F

    base = (
        spark.readStream.schema(WAL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(wal_dir)
    )
    if paths_only:
        return base.select(F.col("_metadata.file_path").alias("wal_path"))
    return base


def run_stream(
    spark: SparkSession,
    wal_dir: str,
    table_root: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int = 1,
    record_metrics: bool = True,
    available_now: bool = True,
    fail_after_batches: int | None = None,
    fail_mode: str = "before",
    watermark_days: int | None = None,
    max_fail_ratio: float | None = None,
    reread_files: bool = True,
    compact_every: int | None = None,
    compact_min_delta_ratio: float | None = 0.2,
    dlq_root: str | None = None,
    writer_id: str | None = None,
    merge_mode: str = "lww",
    mode_props: dict | None = None,
    source_format: str = "parquet",
    transform=None,
    matview_spec: dict | None = None,
    auto_evolve: bool = False,
    order_lateness: int | None = None,
) -> StreamingQuery:
    """Start the CDC apply stream. ``available_now=True`` processes the
    current WAL backlog then stops (the test/replay mode); ``False`` keeps
    tailing.

    ``writer_id`` namespaces the commit keys (``epoch=<writer>:<n>``) so
    SEVERAL streams can ingest into ONE table concurrently — sharded
    ingest, each writer tailing its own WAL shard routed to a disjoint
    bucket set (shard by the table's own ``bucket_expr``). Commits race
    through the optimistic disjoint-bucket rebase (``commit_delta``), so
    parallel writers land without lost updates, and each writer's
    exactly-once is keyed independently (writer A's epoch 0 cannot no-op
    writer B's). Overlapping-bucket writers fail LOUDLY
    (``ConcurrentCommitError``) rather than interleave — by design.
    Compaction stays a separate single-role maintenance job in
    multi-writer deployments (Iceberg's shape); leave ``compact_every``
    unset — an in-stream compaction from one writer would conflict with
    the other's delta commits on shared buckets.

    ``fail_after_batches`` injects a mid-replay crash for kill-and-resume
    tests. ``fail_mode='before'`` crashes before the Nth batch is applied
    (clean kill); ``'after'`` crashes AFTER the table commit but BEFORE the
    stream checkpoint advances — the classic foreachBatch double-fire window.
    On restart Spark redelivers that epoch; the commit-keyed snapshot makes
    the re-application a recorded no-op (exactly-once).

    ``max_fail_ratio`` arms the circuit breaker: every epoch runs the
    pre-commit quality gate (maintenance.quality_gate — null/empty keys,
    null order, duplicate (key, order), event-time envelope) and a FAIL
    verdict raises :class:`CircuitBreakerOpen` BEFORE the table commit —
    the stream stops, the table stays on the previous snapshot, and a
    restart after the feed is fixed resumes from the checkpointed offset.

    ``reread_files=True`` (default) streams only the epoch's file list and
    re-reads those files as a batch parquet scan inside foreachBatch (see
    :func:`wal_stream` ``paths_only``): identical rows, identical offsets/
    exactly-once behavior, but the apply plan gets column pruning, pushed
    filters and AQE instead of an unpruned ``Scan ExistingRDD``. Files from
    a redelivered epoch that were deleted meanwhile (feed repair rewrote a
    segment in place) are skipped — the file source will list the
    replacement files as a fresh epoch.

    ``compact_every=N`` folds merge-on-read deltas back into base files
    every N applied epochs, INSIDE the stream loop: a continuous tail
    otherwise accretes one delta file per bucket per epoch forever, and
    read amplification grows without bound. The compaction commit is
    keyed on the epoch id (idempotent across stream restarts — a
    redelivered epoch re-issues the same compaction key, a no-op), runs
    AFTER the epoch's apply commit, and is size-tiered via
    ``compact_min_delta_ratio`` so delta-light buckets are skipped (no
    rewrite amplification). A compaction failure does not lose data —
    the apply commit already landed; the next trigger retries under the
    same key.

    ``merge_mode`` picks the table's merge engine: ``"lww"`` (default) is
    the CDC upsert path (winner selection -> extraction -> delta commit);
    ``"append"`` is the patch/aggregate-table path — EVERY event row is
    appended (pipeline.apply_append_batch) and the merge semantics run at
    read time (operators/partial_update.py, operators/agg_merge.py).
    In append mode ``compact_every`` runs the FILES-ONLY rewrite
    (maintenance.compact_append: event multiset preserved verbatim, one
    base file per fragmented bucket) — bounding file counts under a live
    tail without the whole-row LWW fold that would lose patch columns or
    increments. ``order_lateness`` (append mode only) declares the
    feed's disorder bound in order-column units: each epoch then ARMS a
    monotonic ``stream.low_watermark`` table prop (max seen order −
    lateness, committed atomically with the epoch), sub-watermark
    stragglers are DLQ-quarantined instead of silently folded over, and
    ``maintenance.compact_append(horizon="auto")`` may fold everything
    at/below it — the horizon soundness contract is owned by the
    stream's declaration, not re-stated by each maintenance caller.
    Append mode still refuses ``watermark_days``: a late patch is a
    valid contribution, not a drop candidate.

    ``transform`` (DataFrame -> DataFrame, WAL-schema-preserving) runs
    INSIDE each epoch, after the file re-read and before the quality
    gate / DLQ / apply — the stream-side enrichment stage (Flink lookup
    join / Paimon dim-table enrichment analog). The canonical use is a
    broadcast join against a small dimension (lang canonicalization,
    tenant lookup, denylist tag): the dim broadcasts once per epoch, the
    wide feed rows never shuffle, and the epoch's exactly-once key
    covers the enriched result — a redelivered epoch re-enriches and
    no-ops, so the transform MUST be deterministic (pure function of the
    epoch's rows plus stable reference data; no clocks, no RNG, no
    mutable external state). It runs before the gate on purpose:
    enrichment can repair/derive contract columns, and the gate then
    validates what will actually be committed.

    ``matview_spec`` keeps an incrementally-maintained materialized view
    (matview.IncrementalView) in sync INSIDE the stream loop — the
    Materialize / Paimon-aggregation downstream-view shape: ``{"root":
    view_root, "group_by": [(name, ddl, sql_expr)], "aggs": [AggSpec,
    ...], "source_columns": [...], "refresh_every": N}``. Every N
    applied epochs the view folds the source's new commits via its
    retract-stream changelog (one changelog diff + one keyed merge per
    refresh, never a recompute). The view's own cursor-in-props epochs
    make refreshes idempotent across stream restarts and redeliveries,
    and a crash between the apply commit and the refresh just leaves the
    view one refresh behind — the next cadence tick (or a maintenance
    ``refresh()``) catches it up. LWW mode only (append-mode tables have
    no whole-row changelog).

    ``source_format="warc"`` tails a directory of ``.warc`` segment
    drops instead of parquet (the Common Crawl landing-zone shape): the
    stream carries segment paths (binaryFile source, content column
    pruned) and each epoch decodes its segments with the Arrow-batched
    WARC walk (operators/warc.py) before the same apply core. Offsets,
    exactly-once epoch keys, kill/resume, DLQ, and compaction cadence
    are identical — the source format is orthogonal to the sink
    machinery.

    ``source_format="jsonl"`` tails ``.jsonl``/text segment drops of
    Debezium-style JSON envelopes (operators/envelope.py — the
    Kafka-Connect object-store sink shape): same paths-only stream, each
    epoch decodes with ONE ``from_json`` projection (JVM-side, field-
    pruned). Corrupt or key-less envelopes decode to NULL url/lsn and
    fall to the same structural DLQ/contract rules as any other feed.

    ``auto_evolve=True`` absorbs WAL schema drift mid-stream (the Delta
    mergeSchema / Debezium auto-evolution shape): the per-epoch re-read
    unions segment footers (``mergeSchema``), and a new column or safe
    type widening becomes a metadata-only evolution commit before the
    epoch applies (lake/merge.absorb_schema_drift — drift-based, so
    redelivery and the crash-between-evolve-and-apply window replay as
    no-ops). Incompatible drift stops the stream loudly; the table's
    ``schema.compat`` policy still governs (FORWARD refuses adds with
    no default). Parquet + lww + reread_files only."""
    if merge_mode not in ("lww", "append"):
        raise ValueError(f"unknown merge_mode {merge_mode!r}")
    if auto_evolve and merge_mode != "lww":
        raise ValueError(
            "auto_evolve absorbs drift into the COLLAPSED-row table "
            "schema; append merge-mode tables store raw events — evolve "
            "the event schema explicitly"
        )
    if auto_evolve and source_format != "parquet":
        raise ValueError(
            f"auto_evolve needs self-describing segments; the "
            f"{source_format} decode projects a fixed envelope schema"
        )
    if auto_evolve and not reread_files:
        raise ValueError(
            "auto_evolve detects drift on the per-epoch file re-read; "
            "the in-stream plan is pinned to the stream's start schema"
        )
    if source_format not in ("parquet", "warc", "jsonl"):
        raise ValueError(f"unknown source_format {source_format!r}")
    if source_format in ("warc", "jsonl") and not reread_files:
        raise ValueError(
            f"the {source_format} source streams segment paths and "
            "decodes inside each epoch (the binaryFile-scan shape); "
            "reread_files=False would put whole segment blobs through "
            "the stream plan"
        )
    if merge_mode == "append" and watermark_days is not None:
        raise ValueError(
            "append merge_mode stores every event: the LWW late-event "
            "watermark would drop patches/increments that are still "
            "valid contributions — filter the feed upstream instead"
        )
    if order_lateness is not None and merge_mode != "append":
        raise ValueError(
            "order_lateness arms the append-mode fold watermark; the "
            "lww path's late handling is watermark_days"
        )
    if mode_props is not None and merge_mode != "append":
        raise ValueError(
            "mode_props declares an APPEND table's merge engine; the "
            "lww path's table needs no engine declaration"
        )
    if matview_spec is not None and merge_mode != "lww":
        raise ValueError(
            "matview_spec folds the table's whole-row retract-stream "
            "changelog — append-mode tables store raw events and have "
            "none; maintain views over their read-time collapse instead"
        )
    if merge_mode == "append":
        from data_pipeline_spark.pipeline import ensure_event_table

        # ``mode_props`` (e.g. {"merge.mode": "patch", "merge.patch.cols":
        # [...]}) stamps the engine into the table's metadata so a plain
        # table.read() collapses correctly; without it the table is an
        # undeclared event store and non-raw reads refuse (see
        # ensure_event_table).
        table = ensure_event_table(spark, table_root, n_buckets, mode_props)
    else:
        table = ensure_table(spark, table_root, n_buckets)
    # ``dlq_root`` arms per-record quarantine inside every epoch (the
    # per-epoch circuit breaker above aborts on AGGREGATE failure rate;
    # the DLQ reroutes INDIVIDUAL contract violations and keeps going).
    dlq = None
    if dlq_root is not None:
        from data_pipeline_spark.pipeline import ensure_dlq

        dlq = ensure_dlq(spark, dlq_root)
    seen = {"n": 0}
    mv: dict = {"view": None}

    def _view():
        if mv["view"] is None:
            from data_pipeline_spark.matview import IncrementalView

            mv["view"] = IncrementalView(
                spark,
                table,
                matview_spec["root"],
                group_by=matview_spec["group_by"],
                aggs=matview_spec["aggs"],
                n_buckets=matview_spec.get("n_buckets", 16),
                source_columns=matview_spec.get("source_columns"),
            )
        return mv["view"]

    def _reread(batch: DataFrame) -> DataFrame:
        return reread_wal_paths(batch, source_format, merge_schema=auto_evolve)

    def apply_epoch(batch: DataFrame, batch_id: int) -> None:
        crash = fail_after_batches is not None and seen["n"] >= fail_after_batches
        if crash and fail_mode == "before":
            raise RuntimeError("injected mid-replay failure (before apply)")
        if reread_files:
            batch = _reread(batch)
        if transform is not None:
            batch = transform(batch)
        if max_fail_ratio is not None:
            from data_pipeline_spark.maintenance import quality_gate

            gate = quality_gate(batch, max_fail_ratio=max_fail_ratio)
            if gate["verdict"] == "FAIL":
                raise CircuitBreakerOpen(
                    f"epoch {batch_id} failed the quality gate: "
                    f"{gate['failures']} over {gate['rows']} rows"
                )
        key_n = (
            f"{writer_id}:{batch_id}" if writer_id is not None else batch_id
        )
        if merge_mode == "append":
            from data_pipeline_spark.pipeline import apply_append_batch

            apply_append_batch(
                table,
                batch,
                commit_key=EPOCH_KEY.format(n=key_n),
                record_metrics=record_metrics,
                dlq=dlq,
                order_lateness=order_lateness,
            )
        else:
            apply_batch(
                table,
                batch,
                commit_key=EPOCH_KEY.format(n=key_n),
                record_metrics=record_metrics,
                watermark_days=watermark_days,
                dlq=dlq,
                auto_evolve=auto_evolve,
            )
        seen["n"] += 1
        if compact_every is not None and seen["n"] % compact_every == 0:
            if merge_mode == "append":
                from data_pipeline_spark.maintenance import compact_append

                compact_append(table, f"stream-compact-{key_n}")
            else:
                table.compact(
                    f"stream-compact-{key_n}",
                    min_delta_ratio=compact_min_delta_ratio,
                )
        if (
            matview_spec is not None
            and seen["n"] % matview_spec.get("refresh_every", 1) == 0
        ):
            # Cursor-idempotent: a redelivered epoch's refresh folds
            # nothing new; a crash before this line leaves the view one
            # cadence behind, caught up by the next tick.
            _view().refresh()
        if crash and fail_mode == "after":
            raise RuntimeError("injected post-commit failure (before checkpoint)")

    if source_format in ("warc", "jsonl"):
        from pyspark.sql import functions as F

        source = (
            spark.readStream.format("binaryFile")
            # the binaryFile source's fixed schema, spelled out because
            # streaming sources refuse inference
            .schema(
                "path string, modificationTime timestamp, "
                "length bigint, content binary"
            )
            .option(
                "pathGlobFilter",
                "*.warc" if source_format == "warc" else "*.txt",
            )
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .load(wal_dir)
            # paths only: binaryFile prunes the content column, so the
            # stream plan carries the epoch's FILE LIST and each epoch's
            # decode runs as a batch scan in _reread
            .select(F.col("path").alias("wal_path"))
        )
    else:
        source = wal_stream(
            spark, wal_dir, max_files_per_trigger, paths_only=reread_files
        )
    writer = (
        source
        .writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_completion(
    spark: SparkSession,
    wal_dir: str,
    table_root: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
    **kwargs,
) -> LakeTable:
    """Drain the WAL backlog and return the final table (batch-equivalent)."""
    q = run_stream(
        spark, wal_dir, table_root, checkpoint_dir, available_now=True, **kwargs
    )
    q.awaitTermination(timeout_s)
    return LakeTable(spark, table_root)
