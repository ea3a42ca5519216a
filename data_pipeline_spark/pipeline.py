"""Batch CDC replay: change log → extraction → MERGE → final table.

The end-to-end path of SURVEY.md §7.1; the streaming wrapper in
``streaming/pipeline.py`` drives exactly this batch core from foreachBatch
(the reference's per-item Argo loop collapsed into one declarative plan;
reference: scripts/run_ingest_register.py:67-161).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.extraction import extract_text
from data_pipeline_spark.lake.merge import MergeStats, merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark import metrics as metrics_mod

# Current table schema, v0 (pre-evolution): input_hint columns + lsn.
TABLE_SCHEMA_V0: list[tuple[str, str]] = [
    ("url", "string"),
    ("lsn", "bigint"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


def ensure_table(
    spark: SparkSession, root: str, n_buckets: int = 64
) -> LakeTable:
    if LakeTable.exists(root):
        return LakeTable(spark, root)
    return LakeTable.create(spark, root, TABLE_SCHEMA_V0, key="url", n_buckets=n_buckets)


# -- dead-letter queue (per-record quarantine) --------------------------------

# DLQ table schema: the quarantined event's own columns ride along for
# forensics, keyed by a content-derived id so redelivered batches (and the
# same bad event arriving in two epochs) land exactly once.
DLQ_SCHEMA: list[tuple[str, str]] = [
    ("dlq_id", "string"),
    ("lsn", "bigint"),
    ("url", "string"),
    ("event_op", "string"),
    ("reason", "string"),
    ("warc_ts", "timestamp"),
]


def ensure_dlq(spark: SparkSession, root: str, n_buckets: int = 8) -> LakeTable:
    if LakeTable.exists(root):
        return LakeTable(spark, root)
    return LakeTable.create(
        spark, root, DLQ_SCHEMA, key="dlq_id", n_buckets=n_buckets
    )


def contract_reason(
    batch: DataFrame,
    allow_null_payload: bool = False,
    order_col: str = "lsn",
) -> F.Column:
    """First violated feed-contract rule per event, NULL when the event is
    clean. The rules protect engine invariants, not taste: a NULL key
    cannot route to a bucket (xxhash64(NULL) -> NULL), a NULL lsn cannot
    take part in last-writer-wins, an unknown op has no merge semantics,
    and a NULL payload on a non-delete would extract to a NULL text the
    table contract forbids (Kafka Connect DLQ / reference failure-page
    routing, _migrate_catalog/runner.py:342-353 — quarantine instead of
    abort).

    ``allow_null_payload`` drops the payload rule for APPEND merge-mode
    feeds: a patch event legitimately carries NULL in every column it
    does not change, and an aggregate event in every column it does not
    increment — only the structural rules (key, order, op) apply there.

    ``order_col`` names the ordering column the null-order rule guards —
    tables created with a custom ``sequence.field`` order by that column,
    not the literal ``lsn``, and a NULL there is just as fatal to LWW
    and to watermark enforcement (ADVICE r4: a null-order row matched
    neither the late filter nor the keep filter and vanished)."""
    null_order_reason = (
        "null_lsn" if order_col == "lsn" else f"null_{order_col}"
    )
    gate = (
        F.when(F.col("url").isNull(), F.lit("null_key"))
        .when(F.col(order_col).isNull(), F.lit(null_order_reason))
        .when(
            ~F.col("op").isin("insert", "update", "delete")
            | F.col("op").isNull(),
            F.lit("bad_op"),
        )
    )
    if allow_null_payload:
        return gate
    return gate.when(
        (F.col("op") != "delete") & F.col("html").isNull(),
        F.lit("null_payload"),
    )


def _dlq_id(df: DataFrame, order_col: str = "lsn") -> F.Column:
    """Content-hash DLQ key over the event's identifying fields — shared
    by quarantine (insert side) and redrive (delete side) so a resolved
    event's tombstone always finds its quarantine row. Schema-aware on
    the payload component: feeds without an ``html`` column (patch /
    aggregate append tables) hash the same null sentinel on both
    sides. ``order_col`` is the feed's ordering column (a custom
    ``sequence.field`` table has no ``lsn`` at all)."""
    payload = (
        F.coalesce(F.sha2(F.col("html"), 256), F.lit("∅"))
        if "html" in df.columns
        else F.lit("∅")
    )
    return F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col("url"), F.lit("∅")),
            F.coalesce(F.col(order_col).cast("string"), F.lit("∅")),
            F.coalesce(F.col("op"), F.lit("∅")),
            F.coalesce(F.col("warc_ts").cast("string"), F.lit("∅")),
            payload,
        )
    )


def quarantine(
    dlq: LakeTable, bad: DataFrame, commit_key: str,
    order_col: str = "lsn",
) -> None:
    """Append contract-violating events (with a ``__reason`` column) to
    the dead-letter table. The key is a content hash over the event's
    identifying fields, so the SAME bad event — redelivered after a
    crash, or replayed in a later epoch — collapses to one DLQ row
    (idempotent like every other commit in the engine). A custom-order
    feed's ``order_col`` value lands in the DLQ's ``lsn`` forensic
    slot."""
    rows = bad.select(
        _dlq_id(bad, order_col).alias("dlq_id"),
        F.coalesce(F.col(order_col).cast("bigint"),
                   F.lit(-1).cast("bigint")).alias("lsn"),
        F.col("url"),
        F.col("op").alias("event_op"),
        F.col("__reason").alias("reason"),
        F.col("warc_ts"),
        F.lit("update").alias("op"),
    )
    merge_into(dlq, rows, commit_key=f"dlq-{commit_key}")


def redrive_dlq(
    table: LakeTable,
    dlq: LakeTable,
    wal: DataFrame,
    commit_key: str,
    reasons: list[str] | None = None,
) -> dict[str, int]:
    """Re-process quarantined events from the ORIGINAL change log after
    the cause is fixed (a CHECK constraint dropped, a feed bug patched) —
    the Kafka-DLQ redrive shape, exactly-once like every other commit.

    The DLQ stores forensic metadata, not payloads, so redrive
    re-identifies each quarantined event in the WAL by (url, lsn) and
    runs it through the SAME gates as a live batch: events that now pass
    apply via :func:`apply_batch` (read-time LWW decides whether they
    win — a redriven event older than the url's current winner loses
    harmlessly, so the final state converges to the LWW collapse over
    all admitted events regardless of redrive order); events that STILL
    violate stay quarantined untouched. Resolved rows tombstone out of
    the DLQ at ``stored lsn + 1`` — a future re-quarantine of the same
    event content would write the old lsn again and lose the race, so a
    resolved event can never flap back in.

    ``reasons`` restricts the sweep (e.g. ``["check:lang_allowed"]``).
    Structurally broken rows (NULL key / NULL lsn) cannot be
    re-identified in the WAL and are never candidates.

    Scale shape: one semi-join of the WAL against the (tiny) DLQ key
    set — broadcastable — then the normal apply path; nothing driver-side.
    Returns ``{"candidates": n, "resolved": n, "still_quarantined": n}``.
    """
    from data_pipeline_spark import constraints as _constraints

    live = dlq.read().filter(
        F.col("url").isNotNull() & (F.col("lsn") >= 0)
    )
    if reasons is not None:
        live = live.filter(F.col("reason").isin(reasons))
    keys = live.select("url", "lsn")
    events = wal.join(F.broadcast(keys), ["url", "lsn"], "leftsemi")

    # Same gates as a live batch: structural contract + declared checks.
    reason = contract_reason(events)
    declared = _constraints.checks(table)
    if declared:
        reason = F.coalesce(
            reason, _constraints.violation_reason(events, declared)
        )
    flagged = events.withColumn("__reason", reason)
    passing = flagged.filter(F.col("__reason").isNull()).drop("__reason")

    n_candidates = events.count()
    n_resolved = passing.count()
    if n_resolved:
        apply_batch(
            table, passing, commit_key, record_metrics=False, dlq=None
        )
        # Tombstone the resolved rows out of the DLQ (content-hash key,
        # lsn+1 so the delete wins against the stored row and against
        # any future redelivery of the same event content).
        dead = passing.select(
            _dlq_id(passing).alias("dlq_id"),
            (F.col("lsn") + 1).alias("lsn"),
            F.col("url"),
            F.col("op").alias("event_op"),
            F.lit(None).cast("string").alias("reason"),
            F.col("warc_ts"),
            F.lit("delete").alias("op"),
        )
        merge_into(dlq, dead, commit_key=f"redrive-{commit_key}")
    return {
        "candidates": n_candidates,
        "resolved": n_resolved,
        "still_quarantined": n_candidates - n_resolved,
    }


def apply_batch(
    table: LakeTable,
    batch: DataFrame,
    commit_key: str,
    record_metrics: bool = True,
    with_stats: bool = False,
    watermark_days: int | None = None,
    stage_id: str | None = None,
    dlq: LakeTable | None = None,
    auto_evolve: bool = False,
) -> MergeStats:
    """One micro-batch: [late-drop] → LWW winner selection → extraction →
    MERGE (delta commit). ``stage_id`` stages the commit for
    write-audit-publish instead of advancing the table head
    (lake/table.py publish_staged).

    Winner selection runs FIRST so the extraction UDF touches only per-url
    winners (O(distinct urls)), not every change event; deletes skip
    extraction entirely (their payload never reaches the table).

    Winner selection is a two-phase plan chosen for shuffle WEIGHT, not
    just shuffle count: ``groupBy(url).agg(max(lsn))`` shuffles only the
    (url, lsn) pair (bytes per event, map-side combined) — never the wide
    html payload — and the join back to the batch is left to AQE: at
    micro-batch sizes the winner set is small and AQE picks a broadcast
    join (wide rows never cross the network; with the fanout delta write
    the whole batch path is then shuffle-free for payload bytes), while at
    backlog sizes (winner set ≫ broadcast threshold) AQE falls back to a
    shuffle join, which costs exactly what the one-shuffle max_by collapse
    would. Rows tied on (url, lsn) are a feed contract violation
    (quality_gate counts duplicate_key_order); they pass through as
    duplicate physical delta rows — detecting them would cost a job per
    batch on the hot path — and every downstream collapse (read,
    compaction, lww_collapse) resolves them DETERMINISTICALLY by
    (lsn, xxhash64 row fingerprint), so readers converge on one winner
    and compaction folds the duplicates away physically.

    ``watermark_days`` enables the too-late drop (reference: acquisition-
    age floor, query_stac.py:120-128 — "reingestion re-stamping `updated`
    must not flood the queue"): events whose warc_ts is more than N days
    older than the batch's max event time are discarded before the
    collapse and counted as events_late_dropped. LWW makes late data
    semantically harmless either way; the watermark bounds WORK, not
    correctness.
    """
    t0 = time.monotonic()
    snap = table.current()
    if auto_evolve and commit_key not in snap.commits:
        # Absorb batch schema drift (new columns / safe widenings) as a
        # metadata-only evolution commit BEFORE the gates, so the rest of
        # the pipeline — and the alignment inside merge_into — sees the
        # evolved schema. The Delta mergeSchema / Debezium auto-evolve
        # shape; incompatible drift raises (lake/merge.schema_drift).
        from data_pipeline_spark.lake.merge import absorb_schema_drift

        if absorb_schema_drift(table, batch, f"{commit_key}~evolve"):
            snap = table.current()
    n_quarantined = 0
    if dlq is not None:
        # Quarantine BEFORE anything else: contract violations (NULL key,
        # NULL lsn, unknown op, NULL payload) would poison bucket routing,
        # LWW, and the watermark's max-event-time aggregate. Clean batches
        # pay one extra scan-level predicate and an emptiness probe; the
        # DLQ commit happens only when violations exist.
        flagged = batch.withColumn("__reason", contract_reason(batch))
        bad = flagged.filter(F.col("__reason").isNotNull())
        if record_metrics:
            n_quarantined = bad.count()
            has_bad = n_quarantined > 0
        else:
            has_bad = bool(bad.take(1))
        if has_bad:
            quarantine(dlq, bad, commit_key)
        batch = flagged.filter(F.col("__reason").isNull()).drop("__reason")
    # Declared CHECK constraints (constraints.py): evaluated on each
    # incoming event AFTER the structural contract gate (a NULL-key row
    # must not reach a user predicate) and BEFORE winner selection, so a
    # url whose newest event violates falls back to its previous valid
    # event under LWW. SQL three-valued semantics — only FALSE violates.
    # With a DLQ the violators quarantine (reason check:<name>); without
    # one the whole batch refuses BEFORE any commit (Delta-style write
    # rejection — nothing is half-applied).
    from data_pipeline_spark import constraints as _constraints

    clean, check_bad = _constraints.enforce(batch, table, snap)
    if check_bad is not None:
        if dlq is not None:
            if record_metrics:
                n_check = check_bad.count()
                has_check_bad = n_check > 0
                n_quarantined += n_check
            else:
                has_check_bad = bool(check_bad.take(1))
            if has_check_bad:
                # distinct commit key: the structural-contract quarantine
                # above may already have committed under dlq-<commit_key>
                # in this same batch, and a colliding key would silently
                # no-op this merge
                quarantine(dlq, check_bad, f"check-{commit_key}")
        else:
            counts = {
                r["__reason"]: r["n"]
                for r in check_bad.groupBy("__reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if counts:
                raise _constraints.CheckViolation(
                    f"batch {commit_key!r} violates declared constraints "
                    f"{counts}; arm a DLQ to quarantine instead"
                )
        batch = clean
    n_late = 0
    if watermark_days is not None:
        hi = batch.agg(F.max("warc_ts")).first()[0]
        if hi is not None:
            floor_expr = F.lit(hi) - F.expr(f"INTERVAL {watermark_days} DAY")
            if record_metrics:
                n_late = batch.filter(F.col("warc_ts") < floor_expr).count()
            batch = batch.filter(F.col("warc_ts") >= floor_expr)
    # Winner selection stays the r2 single-pass plan: narrow (key, lsn)
    # aggregate, AQE join-back, wide bytes untouched. Rows TIED at the
    # winning lsn (a feed contract violation) deliberately pass through
    # as duplicate delta rows rather than paying a per-batch detection
    # job (measured ~18% on replay benchmarks): every downstream
    # collapse — read(), compaction, lww_collapse — orders by
    # (lsn, xxhash64 row fingerprint), so ALL readers converge on the
    # same deterministic winner and compaction physically folds the
    # duplicates away. Byte-identical redelivered copies hash equal, so
    # any pick among them is the same row.
    winners = batch.groupBy(snap.key).agg(F.max("lsn").alias("lsn"))
    collapsed = batch.join(winners, [snap.key, "lsn"])
    enriched = collapsed.withColumn(
        "text",
        F.when(F.col("op") != "delete", extract_text("html")),
    )
    stats = merge_into(
        table, enriched, commit_key, with_stats=with_stats, precollapsed=True,
        stage_id=stage_id,
        enforce_checks=False,  # enforced above (with DLQ quarantine)
        # The purge fence in maintenance derives from this recorded horizon
        # (tombstones may only age out once the watermark guarantees no
        # admissible event could still lose to them).
        props_update=(
            {"watermark_days": watermark_days}
            if watermark_days is not None
            else None
        ),
    )
    if record_metrics and stats.applied:
        # Event-flow counters (FIXTURES.md B4): two tiny aggregates — the
        # winner count prunes the text column, so extraction is NOT
        # recomputed. Invariant: read == applied + deduped + late_dropped
        # (the last term is 0 with no watermark).
        n_read = batch.count()
        # DISTINCT keys, not winner rows: rows tied at the winning lsn
        # pass through as duplicates by design (see winner selection),
        # and the flow invariant read == applied + deduped must count
        # each key once.
        agg = collapsed.agg(
            F.count_distinct(F.col(snap.key)).alias("w"),
            F.count_distinct(
                F.when(F.col("op") == "delete", F.col(snap.key))
            ).alias("d"),
        ).first()
        n_winners = agg["w"]
        flow = {
            "events_read": n_read + n_late + n_quarantined,
            "events_applied": n_winners,
            "events_deduped": n_read - n_winners,
            "events_late_dropped": n_late,
            "events_quarantined": n_quarantined,
            "deletes": agg["d"],
        }
        metrics_mod.record_commit(
            table,
            table.current(),
            commit_key,
            wall_ms=(time.monotonic() - t0) * 1000.0,
            batch_rows=stats.batch_rows,
            flow=flow,
        )
    return stats


# Patch/aggregate-mode tables store the raw change events themselves
# (op column included): the merge semantics live at READ time in
# operators/partial_update.py / operators/agg_merge.py, so the table
# schema is the WAL event shape, not the collapsed-row shape.
EVENT_SCHEMA: list[tuple[str, str]] = [
    ("url", "string"),
    ("lsn", "bigint"),
    ("warc_ts", "timestamp"),
    ("op", "string"),
    ("html", "binary"),
    ("lang", "string"),
]


def ensure_event_table(
    spark: SparkSession,
    root: str,
    n_buckets: int = 16,
    props: dict | None = None,
) -> LakeTable:
    """Create (or open) a raw-event append table. ``props`` declares the
    merge engine (``merge.mode`` + its spec) so ``read()`` collapses
    correctly; without one the table is stamped ``merge.mode="event"``,
    which makes a non-raw ``read()`` REFUSE instead of silently running
    the whole-row LWW fold over event rows — an undeclared event store
    has no sound default collapse."""
    if LakeTable.exists(root):
        return LakeTable(spark, root)
    return LakeTable.create(
        spark, root, EVENT_SCHEMA, key="url", n_buckets=n_buckets,
        props={"merge.mode": "event", **(props or {})},
    )


def apply_append_batch(
    table: LakeTable,
    batch: DataFrame,
    commit_key: str,
    record_metrics: bool = True,
    dlq: LakeTable | None = None,
    order_lateness: int | None = None,
) -> None:
    """One micro-batch for PATCH / AGGREGATE merge-mode tables: quarantine
    contract violations, then append EVERY event row as a delta commit —
    no winner selection, no whole-row LWW. Patch payloads carry only the
    columns they change and increments must all fold, so dropping
    within-batch "losers" here would lose data; the merge semantics run
    at read time (partial_update_collapse / aggregate_collapse) and in
    mode-aware compaction. Idempotent on ``commit_key`` like every other
    commit (redelivered epochs no-op).

    ``order_lateness`` (order-column units) ARMS the fold-compaction
    watermark: each epoch advances a monotonic ``stream.low_watermark``
    table prop to ``max(batch order) - order_lateness`` on the SAME
    commit (no extra snapshot), and once armed the apply path ENFORCES
    it — events at or below the watermark are quarantined to the DLQ
    (reason ``below_low_watermark``) or refuse the whole batch when no
    DLQ is wired. ``compact_append(horizon="auto")`` consumes the prop,
    so the "no future event ≤ horizon" soundness promise is owned by
    the stream's declared disorder bound, not re-stated by callers."""
    snap = table.current()
    cols = [n for n, _ in table.schema_fields(snap)]
    order = snap.order_col
    n_quarantined = 0
    if dlq is not None:
        # order_col=snap.order_col (not the literal lsn): a table created
        # with a custom sequence.field must quarantine null-ORDER rows —
        # they cannot take part in LWW or watermark enforcement.
        flagged = batch.withColumn(
            "__reason",
            contract_reason(batch, allow_null_payload=True, order_col=order),
        )
        bad = flagged.filter(F.col("__reason").isNotNull())
        if record_metrics:
            n_quarantined = bad.count()
            has_bad = n_quarantined > 0
        else:
            has_bad = bool(bad.take(1))
        if has_bad:
            quarantine(dlq, bad, commit_key, order_col=order)
        batch = flagged.filter(F.col("__reason").isNull()).drop("__reason")
    low = snap.props.get("stream.low_watermark")
    n_late = 0
    if low is not None:
        # NULL-order rows ride the late bucket: they match neither
        # `order <= low` nor `order > low`, so without this they would
        # silently vanish between quarantine and commit (ADVICE r4).
        # With a DLQ the contract gate above already caught them; this
        # keeps the no-DLQ path loss-free too (refusal, not loss).
        late = batch.filter(
            F.col(order).isNull() | (F.col(order) <= F.lit(int(low)))
        )
        if bool(late.take(1)):
            if dlq is None:
                raise ValueError(
                    f"batch carries events at/below the armed "
                    f"stream.low_watermark ({low}) or with a NULL "
                    f"{order} — fold compaction may already own that "
                    "region; wire a DLQ to quarantine them, or raise "
                    "order_lateness"
                )
            if record_metrics:
                n_late = late.count()
            quarantine(
                dlq,
                late.withColumn(
                    "__reason", F.lit("below_low_watermark")
                ),
                f"{commit_key}:late",
                order_col=order,
            )
            batch = batch.filter(F.col(order) > F.lit(int(low)))
    props_update = None
    if order_lateness is not None:
        mx = batch.agg(F.max(order)).first()[0]
        if mx is not None:
            cand = int(mx) - int(order_lateness)
            if low is None or cand > int(low):
                props_update = {"stream.low_watermark": cand}
    table.commit_delta(
        batch.select(*cols), commit_key, props_update=props_update
    )
    if record_metrics:
        n = batch.count()
        metrics_mod.record_commit(
            table,
            table.current(),
            commit_key,
            wall_ms=0.0,
            batch_rows=n,
            flow={
                "events_read": n + n_quarantined + n_late,
                "events_applied": n,
                "events_deduped": 0,
                "events_late_dropped": 0,
                "events_quarantined": n_quarantined + n_late,
                "deletes": 0,
            },
        )


def replay_log(
    spark: SparkSession,
    log: DataFrame,
    table_root: str,
    n_batches: int = 4,
    n_buckets: int = 64,
    record_metrics: bool = True,
    dense: bool = False,
    compact_at_end: bool = False,
    dlq: LakeTable | None = None,
) -> LakeTable:
    """Replay a change-log DataFrame in LSN-ordered micro-batches.

    Each batch is a merge-on-read delta commit (O(batch) writes);
    ``compact_at_end=True`` folds the deltas into one base file per bucket
    afterwards so the final table is fully materialized (the honest
    total-cost shape benchmarks time). ``dense`` is accepted for backward
    compatibility and ignored — delta commits never read the target, so
    the dense/sparse distinction no longer exists."""
    del dense
    table = ensure_table(spark, table_root, n_buckets)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + n_batches - 1) // n_batches
    for i in range(n_batches):
        batch = log.filter(
            (F.col("lsn") >= lo + i * span) & (F.col("lsn") < lo + (i + 1) * span)
        )
        apply_batch(table, batch, commit_key=f"replay-{i}",
                    record_metrics=record_metrics, dlq=dlq)
    if compact_at_end:
        table.compact(commit_key=f"replay-compact-{n_batches}")
    return table


def materialize_wal(
    spark: SparkSession,
    sf_dir: str,
    wal_dir: str,
    amplify: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Land the synthetic change log as a parquet WAL (the form a real
    binlog/Debezium feed arrives in). Batch scans over it get lsn row-group
    pruning + column pruning from the parquet reader — re-deriving the log
    per batch would instead recompute the synthesis for every pass."""
    log = cl.changelog(spark, sf_dir, amplify=amplify)
    if partitions:
        # Range-partition on lsn so micro-batch scans prune whole files
        # (each batch reads ~1/n_batches of the WAL, not all of it).
        log = log.repartitionByRange(partitions, "lsn")
    log.write.mode("overwrite").parquet(wal_dir)
    return spark.read.parquet(wal_dir)


def replay(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    n_batches: int = 4,
    n_buckets: int = 64,
    record_metrics: bool = True,
    amplify: int = 1,
    dense: bool = False,
    compact_at_end: bool = False,
) -> LakeTable:
    """Replay the full synthetic change log in LSN-ordered micro-batches."""
    log = cl.changelog(spark, sf_dir, amplify=amplify)
    return replay_log(
        spark, log, table_root, n_batches, n_buckets, record_metrics,
        dense=dense, compact_at_end=compact_at_end,
    )
