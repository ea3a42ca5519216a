"""Table maintenance jobs: retention sweep (TTL deletes) and backfill
(migration/schema-evolution data fixes).

Reference analogs:
* retention — expires stamping at write + cleanup cron with an
  order-sensitive guard matrix and idempotent deletes
  (scripts/register_v1.py:487-516, scripts/cleanup_expired_items.py:67-127,
  scripts/s3_item_cleanup.py:196-238);
* backfill — composable MigrationFn passes over every record with
  outcome histograms that must reconcile
  (operator-tools/_migrate_catalog/runner.py:73-86,
  migrations/stamp_expires.py:78-181).

Both are expressed as ONE declarative pass over the table committed
atomically through the same snapshot protocol as the merge path — a crash
mid-job leaves the previous snapshot live (the reference's torn-write
lesson), and re-running with the same commit key is a no-op.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable


@dataclass
class SweepStats:
    commit_key: str
    applied: bool
    gate_counts: dict[str, int]
    tombstones_purged: int = 0
    touched_buckets: int = 0


def classify_expired(
    df: DataFrame,
    now: Column,
    retention_days: int = 14,
    exclude: Column | None = None,
    ts_col: str = "warc_ts",
) -> Column:
    """The ordered guard matrix as one chained CASE (order-sensitive, like
    the reference's delete gate): excluded → no_expires → not_expired →
    delete. A NULL event time cannot prove expiry (NULL >= now is NULL and
    would otherwise fall through to delete), so it gates out explicitly —
    mirroring the oracle query's no_expires branch and the tombstone
    NULL-keep rule."""
    expires = F.col(ts_col) + F.expr(f"INTERVAL {retention_days} DAY")
    gate = F.when(exclude if exclude is not None else F.lit(False), "excluded")
    return (
        gate.when(F.col(ts_col).isNull(), "no_expires")
        .when(expires >= now, "not_expired")
        .otherwise("delete")
    )


def delete_where(
    table: LakeTable,
    predicate: Column,
    commit_key: str,
) -> "MergeStats":
    """Predicate delete (``DELETE FROM t WHERE ...``) as a normal DELTA
    commit: every currently-live row matching ``predicate`` gets a
    tombstone fenced at the table's PHYSICAL high-watermark lsn + 1
    (``agg_bounds(order, raw=True)`` — a metadata-only manifest read
    covering tombstone fences and filter-hidden rows too) — i.e. the
    delete happens "as of this snapshot": any event already reflected in
    the table loses the read-time LWW race to the fence, while a genuinely
    NEWER event (lsn above the snapshot's high watermark) still wins and
    resurrects the key, exactly like a keyed delete racing an upsert.

    Writes O(matching rows) via the merge-on-read delta path — no bucket
    rewrite (contrast :func:`retention_sweep`, which rewrites buckets to
    physically reclaim space; run compaction to fold these tombstones
    down later). Idempotent on ``commit_key``.

    The committed tombstones are NARROW — merge_into's tombstone select
    nulls every payload column, keeping only (key, lsn fence, warc_ts
    age-out fence) — so a delete matching 10^8 rows of a wide (html
    binary) table commits O(matching × ~tens of bytes), not O(matching ×
    row width); parquet RLE collapses the NULL pages to near zero. This
    is the Iceberg-equality-delete cost shape, and the privacy-correct
    one (``forget()`` relies on the tombstone never re-serializing the
    content it removes). Change-feed before-images are unaffected:
    :meth:`LakeTable.changes_between` reconstructs them from the PRIOR
    snapshot, never from tombstone payload. Pinned by
    tests/test_delete_where.py::test_tombstones_are_narrow.

    Reference analog: criteria-driven cleanup deletes items matching a
    filter rather than an id list (scripts/s3_item_cleanup.py:196-238).
    """
    from data_pipeline_spark.lake.merge import MergeStats, merge_into

    snap = table.current()
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)
    order = snap.order_col
    # physical high watermark from manifest stats (agg_bounds raw=True:
    # metadata-only, includes tombstone fences and rows hidden by row
    # filters — a live-read max could under-fence under a row filter)
    fence = table.agg_bounds(order, raw=True)[1]
    if fence is None:
        return MergeStats(commit_key, False, snap.version, 0)
    # maintenance predicates evaluate on physical truth, not masked reads
    hit = table.read(unmasked=True).filter(predicate)
    batch = hit.select(
        F.col(snap.key),
        *[
            (
                F.lit(fence + 1).cast(d).alias(n)
                if n == order
                else F.col(n)
            )
            for n, d in table.schema_fields(snap)
            if n != snap.key
        ],
        F.lit("delete").alias("op"),
    )
    return merge_into(table, batch, commit_key, precollapsed=True)


def update_where(
    table: LakeTable,
    set_exprs: dict[str, str],
    predicate: Column | str,
    commit_key: str,
) -> "MergeStats":
    """Predicate update (``UPDATE t SET col = expr WHERE ...``) as a
    normal DELTA commit: every currently-live row matching ``predicate``
    re-enters with the named columns replaced by their SET expressions
    (ordinary Spark SQL over the row's own columns) and the order column
    stamped at the table's PHYSICAL high-watermark lsn + 1 (metadata-only,
    same fence source as :func:`delete_where`) — "as of this
    snapshot", same fencing as :func:`delete_where`: anything already
    reflected loses the read-time LWW race to the rewrite, a genuinely
    newer feed event still wins.

    Writes O(matching rows) via the merge-on-read delta path — no bucket
    rewrite; compaction folds the superseded versions later. Idempotent
    on ``commit_key``. The key and order columns are not assignable.

    Reference analog: criteria-driven metadata fix-up rewriting fields
    in place (operator-tools/_migrate_catalog/runner.py:73-86).
    """
    from data_pipeline_spark.lake.merge import MergeStats, merge_into

    snap = table.current()
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)
    key, order = snap.key, snap.order_col
    fields = table.schema_fields(snap)
    names = {n for n, _ in fields}
    reserved = set(set_exprs) & {key, order}
    if reserved:
        raise KeyError(f"SET may not assign key/order columns {sorted(reserved)}")
    unknown = set(set_exprs) - names
    if unknown:
        raise KeyError(f"SET names unknown columns {sorted(unknown)}")
    # physical high watermark from manifest stats (agg_bounds raw=True:
    # metadata-only, includes tombstone fences and rows hidden by row
    # filters — a live-read max could under-fence under a row filter)
    fence = table.agg_bounds(order, raw=True)[1]
    if fence is None:
        return MergeStats(commit_key, False, snap.version, 0)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    hit = table.read(unmasked=True).filter(pred)
    batch = hit.select(
        F.col(key),
        *[
            (
                F.lit(fence + 1).cast(d).alias(n)
                if n == order
                else F.expr(set_exprs[n]).cast(d).alias(n)
                if n in set_exprs
                else F.col(n)
            )
            for n, d in fields
            if n != key
        ],
        F.lit("update").alias("op"),
    )
    return merge_into(table, batch, commit_key, precollapsed=True)


def retention_sweep(
    table: LakeTable,
    commit_key: str,
    retention_days: int = 14,
    now: Column | None = None,
    exclude: Column | None = None,
    watermark_days: int | None = None,
) -> SweepStats:
    """Delete expired rows (event-time older than retention) atomically.

    Emits the per-gate audit histogram BEFORE committing (the reference
    writes one audit record per item; here one count per gate) and keeps
    the reconciliation invariant: sum(gates) == table rows before sweep.

    **Bucket-pruned**: only buckets actually holding an expired row (or a
    purge-eligible tombstone) are rewritten; every other bucket's files
    carry forward by manifest reference — a nightly TTL sweep touching 1%
    of keys rewrites 1% of the table, not 100 TB. (Affected-bucket
    discovery is a column-pruned scan collecting ≤ n_buckets ids.)

    **Tombstone purge is watermark-coupled**: a tombstone may only age out
    if a late event that could still arrive (per the apply path's
    watermark) is guaranteed to be dropped before it could resurrect the
    key — i.e. an effective watermark exists and watermark_days <=
    retention_days. ``watermark_days`` defaults to the horizon the apply
    path recorded in table props; with no watermark configured anywhere,
    tombstones are retained (correctness over space).
    """
    from data_pipeline_spark.lake.table import TOMBSTONE_COL

    snap = table.current()
    if commit_key in snap.commits:
        return SweepStats(commit_key, False, {})
    lin = table.lineage_enabled(snap)
    live = table.read(snap=snap, with_lineage=lin)
    tombs = table.read(
        snap=snap, include_tombstones=True, with_lineage=lin
    ).filter(F.col(TOMBSTONE_COL))
    if now is None:
        # Deterministic "now": the max event time in the table — tests and
        # replays must not depend on wall-clock (reference lesson: cache
        # eviction keyed on acquisition date, not mtime).
        now = F.lit(live.agg(F.max("warc_ts")).first()[0])
    gated = live.withColumn(
        "__gate", classify_expired(live, now, retention_days, exclude)
    )
    counts = {
        r["__gate"]: r["n"]
        for r in gated.groupBy("__gate").agg(F.count("*").alias("n")).collect()
    }
    wm = watermark_days if watermark_days is not None else snap.props.get(
        "watermark_days"
    )
    purge_allowed = wm is not None and wm <= retention_days
    expires = F.col("warc_ts") + F.expr(f"INTERVAL {retention_days} DAY")
    if purge_allowed:
        # Older than retention ⇒ any event that could still lose to this
        # tombstone is below the (coupled) watermark and will be dropped
        # by the apply path before the race can happen.
        keep_tomb = F.col("warc_ts").isNull() | (expires >= now)
    else:
        keep_tomb = F.lit(True)
    keep_tombs = tombs.filter(keep_tomb)
    n_purged = tombs.count() - keep_tombs.count() if purge_allowed else 0

    # Affected buckets: anything losing a row (expired live row or purged
    # tombstone). Cheap: bucket ids distinct ≤ n_buckets rows collected.
    bucket = table.bucket_expr(snap)
    losing = gated.filter(F.col("__gate") == "delete").select(
        bucket.alias("b")
    )
    if purge_allowed:
        losing = losing.unionByName(
            tombs.filter(~keep_tomb).select(bucket.alias("b"))
        )
    affected = {int(r["b"]) for r in losing.distinct().collect()}
    if affected:
        in_affected = bucket.isin(*affected)
        content = (
            gated.filter((F.col("__gate") != "delete") & in_affected)
            .drop("__gate")
            .withColumn(TOMBSTONE_COL, F.lit(False))
            .unionByName(keep_tombs.filter(in_affected))
        )
    else:
        content = table.read(
            snap=snap, include_tombstones=True, with_lineage=lin
        ).limit(0)
    table.commit_buckets(
        content,
        touched=affected,
        commit_key=commit_key,
        summary={
            "gates": counts,
            "tombstones_purged": n_purged,
        },
        op="retention_sweep",
    )
    return SweepStats(
        commit_key,
        True,
        counts,
        tombstones_purged=n_purged,
        touched_buckets=len(affected),
    )


def quality_gate(
    batch: DataFrame,
    key: str = "url",
    order: str = "lsn",
    ts_col: str = "warc_ts",
    max_fail_ratio: float = 0.0,
) -> dict[str, object]:
    """Pre-commit batch validation (the reference's in-pipeline PASS/WARN/
    FAIL gate, scripts/validate_s1_rtc.py:38-135): one aggregate pass, no
    collect of data rows.

    Checks: null/empty keys, null order column, duplicate (key, order)
    pairs, event-time outside a sane envelope. Returns the verdict dict;
    callers abort the commit on FAIL (the circuit-breaker pattern,
    migrate_catalog runner.py:342-353).
    """
    row = batch.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col(key).isNull() | (F.length(key) == 0)).cast("long")
        ).alias("bad_key"),
        F.sum(F.col(order).isNull().cast("long")).alias("bad_order"),
        F.count(order).alias("n_order"),
        F.countDistinct(key, order).alias("n_key_order"),
        F.sum(
            (
                (F.col(ts_col) < F.lit("2000-01-01").cast("timestamp"))
                | (F.col(ts_col) > F.lit("2100-01-01").cast("timestamp"))
            ).cast("long")
        ).alias("bad_ts"),
    ).first()
    n = row["n"] or 0
    dup_pairs = (row["n_order"] or 0) - (row["n_key_order"] or 0)
    failures = {
        "null_or_empty_key": row["bad_key"] or 0,
        "null_order": row["bad_order"] or 0,
        "duplicate_key_order": dup_pairs,
        "ts_out_of_envelope": row["bad_ts"] or 0,
    }
    n_bad = sum(failures.values())
    verdict = (
        "PASS"
        if n_bad == 0
        else ("WARN" if n and n_bad / n <= max_fail_ratio else "FAIL")
    )
    return {"verdict": verdict, "rows": n, "failures": failures}


class EnvMismatchError(RuntimeError):
    """F7: refusing to write across environments."""


def check_env_consistency(
    table: LakeTable, expected_env: str, prop: str = "env"
) -> str:
    """F7 env-consistency guard (reference:
    scripts/run_ingest_register.py:50-64 — the target bucket's environment
    must equal the collection's environment before any write is attempted).

    The table carries its environment as a snapshot property (set once via
    ``update_props({'env': ...})``); writers call this precondition with the
    environment they were launched for and get an exception — not a silent
    cross-env write — on mismatch. A table with no recorded env adopts the
    caller's (first-writer-wins stamping, like the reference's collection
    creation path). Returns the env now in force."""
    snap = table.current()
    actual = snap.props.get(prop)
    if actual is None:
        table.update_props({prop: expected_env})
        return expected_env
    if actual != expected_env:
        raise EnvMismatchError(
            f"table env {actual!r} != caller env {expected_env!r} "
            f"(refusing cross-environment write)"
        )
    return actual


def backfill(
    table: LakeTable,
    commit_key: str,
    exprs: dict[str, Column],
    where: Column | None = None,
) -> bool:
    """Migration pass: set columns via expressions over the table
    (optionally row-gated), one atomic commit.

    Compose multiple migrations by passing several exprs — they apply in
    one scan like the reference's single-pass composed MigrationFns.
    Typical use right after ``evolve_schema(add_columns=...)`` to populate
    the new column for pre-evolution rows.

    **Bucket-pruned**: with a ``where`` gate, only buckets holding a
    matching row are rewritten (rows in those buckets that miss the gate
    ride along unmodified); every other bucket carries forward by manifest
    reference. ``where=None`` touches every row, so every non-empty bucket
    rewrites — that's the honest cost of a whole-table migration.
    """
    from data_pipeline_spark.lake.table import TOMBSTONE_COL

    snap = table.current()
    if commit_key in snap.commits:
        return False
    # Tombstone rows ride along untouched (their delete-lsn fence must
    # survive migrations).
    # rewrite path: read PHYSICAL values (masking must never reach disk)
    df = table.read(
        snap=snap, include_tombstones=True, unmasked=True,
        with_lineage=table.lineage_enabled(snap),
    )
    not_tomb = ~F.col(TOMBSTONE_COL)
    bucket = table.bucket_expr(snap)
    if where is None:
        affected = {
            int(b)
            for b in snap.manifests
            if table.bucket_entries(snap, b)
        }
    else:
        affected = {
            int(r["b"])
            for r in df.filter(not_tomb & where)
            .select(bucket.alias("b"))
            .distinct()
            .collect()
        }
    if not affected:
        table.commit_buckets(
            df.limit(0), touched=set(), commit_key=commit_key,
            summary={"columns": sorted(exprs)}, op="backfill",
        )
        return True
    for name, expr in exprs.items():
        if name not in df.columns:
            raise KeyError(f"backfill target column {name} not in schema")
        gate = not_tomb if where is None else (not_tomb & where)
        df = df.withColumn(name, F.when(gate, expr).otherwise(F.col(name)))
    table.commit_buckets(
        df.filter(bucket.isin(*affected)),
        touched=affected,
        commit_key=commit_key,
        summary={"columns": sorted(exprs)},
        op="backfill",
    )
    return True


def _fold_from_props(snap):
    """The merge-engine fold kernel a table declares in its props
    (``merge.mode`` + ``merge.patch.cols`` / ``merge.agg.spec``) — lets
    ``compact_append(table, key, horizon=h)`` fold a declared mode table
    without the caller re-stating its engine."""
    mode = snap.props.get("merge.mode", "lww")
    key, order = snap.key, snap.order_col
    op_col = snap.props.get("merge.op_col", "op")
    if mode == "patch":
        from data_pipeline_spark.operators.partial_update import fold_events

        cols = snap.props.get("merge.patch.cols")
        if cols is None:
            raise ValueError("merge.mode=patch needs merge.patch.cols")
        return lambda df: fold_events(df, key, order, list(cols), op_col=op_col)
    if mode == "aggregate":
        from data_pipeline_spark.operators.agg_merge import fold_events

        spec = snap.props.get("merge.agg.spec")
        if spec is None:
            raise ValueError("merge.mode=aggregate needs merge.agg.spec")
        return lambda df: fold_events(df, key, order, dict(spec), op_col=op_col)
    raise ValueError(
        f"no props-derived fold for merge.mode={mode!r}: pass fold= "
        "explicitly (first_row/event tables have no horizon fold — "
        "files-only compaction is the sound shape there)"
    )


def compact_append(
    table: LakeTable,
    commit_key: str,
    fold=None,
    horizon: int | None = None,
    buckets: set[int] | None = None,
    min_files: int = 2,
    max_buckets: int | None = None,
):
    """Compaction for APPEND merge-mode tables (patch / aggregate /
    first-row), where every physical row is an event and the whole-row
    LWW rewrite of :meth:`LakeTable.compact` would destroy data (it
    folds a key's patches into only its newest).

    Two safe shapes, mirroring what Paimon's compaction does for its
    non-deduplicate merge engines:

    * ``fold=None`` — FILES-ONLY rewrite: the selected buckets' event
      rows are rewritten verbatim into one base file per bucket. Always
      sound (row multiset unchanged — test-pinned); this is what bounds
      file counts under a streaming append tail.
    * ``fold=<callable>, horizon=<order value>`` — MERGE-ENGINE fold:
      events with order ≤ ``horizon`` are folded through the mode's
      ``fold_events`` kernel (operators/partial_update.py /
      operators/agg_merge.py) into equivalent accumulator events; newer
      events are kept verbatim. Exact iff no future event can carry
      order ≤ horizon — the same watermark contract the LWW path's
      retention sweep enforces, owned by the caller. On a table that
      DECLARES its engine (``merge.mode`` props), ``horizon`` alone is
      enough — the fold kernel is derived from the props
      (:func:`_fold_from_props`), so maintenance cannot mis-state the
      table's semantics.

    Bucket selection matches :meth:`LakeTable.compact`: ≥ ``min_files``
    files (any kind), most-fragmented-first under ``max_buckets`` so
    maintenance runs as bounded incremental rounds. Returns the new
    snapshot, or None when nothing qualifies. Idempotent on
    ``commit_key``.

    Reference analog: the aggregation cron rewrites whole aggregate
    documents from their parts on a cadence
    (scripts/aggregate_items.py:121-199); here the rewrite folds
    distributively and touches only fragmented buckets.
    """
    from data_pipeline_spark.lake.table import TOMBSTONE_COL

    snap = table.current()
    if commit_key in snap.commits:
        return snap
    if horizon == "auto":
        # The horizon comes from the STREAM's armed low-watermark
        # (apply_append_batch(order_lateness=) persists a monotonic
        # ``stream.low_watermark`` prop on every epoch commit, and the
        # apply path refuses sub-watermark events from then on) — the
        # caller no longer owns the "no future event ≤ horizon"
        # soundness promise by hand. Refuses when nothing is armed: a
        # guessed horizon would silently fold rows a late patch still
        # has the right to touch.
        lw = snap.props.get("stream.low_watermark")
        if lw is None:
            raise ValueError(
                "compact_append(horizon='auto') needs an armed "
                "stream.low_watermark — run the stream with "
                "order_lateness= (or pass an explicit horizon you can "
                "vouch for)"
            )
        horizon = int(lw)
    if fold is not None and horizon is None:
        raise ValueError("fold compaction needs a horizon (order value)")
    if fold is None and horizon is not None:
        # Horizon given, fold not: derive the fold kernel from the
        # table's declared merge engine (merge.mode props) — the table
        # owns its merge semantics, so maintenance need not re-state
        # them (and cannot mis-state them).
        fold = _fold_from_props(snap)
    if buckets is None:
        buckets = {
            int(b)
            for b in snap.manifests
            if len(table.bucket_entries(snap, b)) >= min_files
        }
    if max_buckets is not None and len(buckets) > max_buckets:
        buckets = set(
            sorted(
                buckets,
                key=lambda b: -len(table.bucket_entries(snap, b)),
            )[:max_buckets]
        )
    if not buckets:
        return None
    content = table.read(raw=True, buckets=buckets, snap=snap)
    if fold is not None:
        order = snap.order_col
        fields = table.schema_fields(snap)
        events = content.drop(TOMBSTONE_COL)
        old = events.filter(F.col(order) <= F.lit(horizon))
        young = events.filter(F.col(order) > F.lit(horizon))
        folded = fold(old)
        have = set(folded.columns)
        folded = folded.select(
            *[
                (F.col(n).cast(d) if n in have else F.lit(None).cast(d)).alias(n)
                for n, d in fields
            ]
        )
        content = folded.unionByName(
            young.select(*[n for n, _ in fields])
        ).withColumn(TOMBSTONE_COL, F.lit(False))
    return table.commit_buckets(
        content,
        buckets,
        commit_key,
        summary={"mode": "append", "fold": fold is not None},
        op="compact_append",
    )


def auto_split(
    table: LakeTable,
    commit_key: str,
    max_bucket_bytes: int,
    max_splits: int | None = None,
) -> list[int]:
    """Skew-driven partition evolution: split every BASE bucket whose live
    data bytes exceed ``max_bucket_bytes``, purely from manifest-recorded
    file sizes — a metadata-only decision, no data scan (Iceberg's
    partition-spec evolution triggered the way a hot url-domain actually
    shows up: one bucket's bytes outgrowing the rest).

    Each split is its own atomic snapshot commit costing O(that bucket)
    (see LakeTable.split_bucket); untouched buckets carry forward by
    reference. ``max_splits`` bounds one maintenance round, like
    compaction's ``max_buckets`` — at 100 TB maintenance runs as bounded
    incremental rounds. Re-running with the same ``commit_key`` is a
    no-op per already-split bucket (key is suffixed per base id, so a
    crash mid-round resumes where it stopped).

    Returns the base bucket ids split this round (largest first).
    """
    snap = table.current()
    sizes: dict[int, int] = {}
    for b in snap.manifests:
        base = int(b) % snap.n_buckets
        for e in table.bucket_entries(snap, b):
            sizes[base] = sizes.get(base, 0) + (e.get("bytes") or 0)
    over = sorted(
        (b for b, n in sizes.items() if n > max_bucket_bytes),
        key=lambda b: -sizes[b],
    )
    if max_splits is not None:
        over = over[:max_splits]
    for b in over:
        table.split_bucket(b, f"{commit_key}/base={b}")
    return over


def forget(
    table: LakeTable,
    keys: list[str],
    commit_key: str,
    keep_fence: bool = True,
    verify: bool = True,
) -> dict:
    """Provable erasure of ``keys`` (right-to-be-forgotten): tombstone the
    keys, rewrite exactly the buckets that held them, expire history, and
    vacuum — then PROVE it by raw-scanning every surviving physical file.

    ``keep_fence=True`` (default) retains the key's tombstone row (payload
    NULLed) so a late pre-delete event cannot resurrect erased content;
    ``False`` purges the tombstone too — full removal including the key
    string, at the documented cost that a late event re-inserts the key.

    Refuses while staged commits, live branches, tags, or any snapshot
    beyond the head would survive expiry — those roots retain the data
    and would make the erasure claim false. Resolve them first. After
    the sweep it additionally asserts the snapshot log collapsed to the
    head alone: ``expire_snapshots`` deliberately keeps tagged/staged
    anchors, so a root created between the guard and the expiry would
    otherwise let pre-delete payload survive on disk while the
    verification (which scans only the CURRENT snapshot's files)
    reported success — a falsely-passing erasure audit.

    The verification is the point (an audit needs evidence, not a plan):
    after the sweep, a raw pre-collapse scan of the CURRENT snapshot's
    files — which, post-vacuum, are the only files on disk — must show
    either nothing for the keys, or only NULL-payload tombstones.

    Reference analog: id-targeted cleanup with post-delete existence
    verification (scripts/s3_item_cleanup.py:196-238).
    """
    from data_pipeline_spark.lake.branch import list_branches
    from data_pipeline_spark.lake.table import TOMBSTONE_COL

    if table.staged_snapshots():
        raise RuntimeError("staged commits retain data: publish/abort first")
    if list_branches(table):
        raise RuntimeError("live branches retain data: publish/delete first")
    if table.tags():
        raise RuntimeError(
            "tags retain data: expire_snapshots keeps tagged versions (and "
            "vacuum keeps their files), so pre-delete payload for the "
            "forgotten keys would survive on disk — delete tags first"
        )

    snap = table.current()
    pred = F.col(snap.key).isin(list(keys))
    delete_where(table, pred, f"{commit_key}-del")

    # Exactly the buckets the keys route to (the same hash the writer
    # used — computed by Spark, not re-implemented driver-side).
    key_df = table.spark.createDataFrame(
        [(k,) for k in keys], f"{snap.key} string"
    )
    snap = table.current()
    touched = {
        r[0]
        for r in key_df.select(
            table.bucket_expr(snap, snap.key)
        ).distinct().collect()
    }
    table.compact(
        f"{commit_key}-compact",
        buckets=touched,
        min_files=1,
        purge_tombstones_where=None if keep_fence else pred,
    )
    expired = table.expire_snapshots(keep_last=1)
    # The expiry keeps tagged/staged/branch anchors by design — re-check
    # that nothing raced in between the guard above and the sweep. The
    # verification below raw-scans only the CURRENT snapshot's files, so
    # any surviving older snapshot would silently invalidate it.
    survivors = [
        s.version
        for s in table.snapshot_log()
        if s.version != table.current().version
    ]
    if survivors:
        raise RuntimeError(
            f"erasure incomplete: snapshots {survivors} survived expiry "
            f"(tag/stage/branch created concurrently?) — their files "
            f"retain pre-delete payload; resolve the anchors and re-run"
        )
    removed = table.vacuum()

    report = {
        "keys": len(keys),
        "buckets_rewritten": len(touched),
        "snapshots_expired": len(expired),
        "files_removed": removed,
        "fence_kept": keep_fence,
    }
    if verify:
        raw = table.read(include_tombstones=True, raw=True).filter(pred)
        # The fence row retains key + lsn + event time (warc_ts — the
        # retention sweep's tombstone-TTL clock; same keep-set as the
        # merge delete branch). Everything else must be NULL.
        payload = [
            c
            for c in raw.columns
            if c not in (snap.key, snap.order_col, TOMBSTONE_COL, "warc_ts")
        ]
        if keep_fence:
            leftover = raw.filter(
                ~F.col(TOMBSTONE_COL)
                | F.greatest(
                    *[F.col(c).isNotNull() for c in payload]
                )
            ).count()
        else:
            leftover = raw.count()
        report["leftover_rows"] = leftover
        if leftover:
            raise RuntimeError(
                f"erasure verification failed: {leftover} physical rows "
                f"still carry data for forgotten keys"
            )
    return report


# -- policy-driven maintenance scheduler --------------------------------------


@dataclass
class MaintenancePolicy:
    """Thresholds a maintenance round decides from — all evaluated on
    manifest metadata only (``partitions()`` stats + snapshot fields),
    never a data scan. Defaults match a live CDC table between
    compactions; ``None`` disables that action entirely.

    The policy is the Iceberg/Delta "table service" configuration shape:
    the table's writers stay thin (O(batch) delta commits) and a single
    scheduled round re-establishes read-side invariants — bounded file
    counts, bounded manifest chains, bounded bucket sizes, bounded
    snapshot history — touching only what drifted past a threshold.
    Reference analog: the nightly cleanup/aggregate crons
    (scripts/cleanup_expired_items.py:67-127,
    scripts/aggregate_items.py:121-199) collapsed into one planned,
    idempotent, bounded round.
    """

    # Compact a bucket when its delta share of bytes exceeds this …
    max_delta_ratio: float | None = 0.2
    # … or its file count exceeds this (whichever trips first).
    max_files_per_bucket: int | None = 8
    # Bound one round to the worst N buckets (None = all that qualify).
    max_compact_buckets: int | None = 16
    # Split any base bucket whose live bytes exceed this (None = never).
    max_bucket_bytes: int | None = None
    max_splits: int | None = 4
    # Merge manifest chains longer than this (None = leave to chain_max).
    max_chain_len: int | None = None
    # Keep at most N snapshots (None = never expire).
    keep_snapshots: int | None = None
    # Reclaim unreferenced files older than this (None = never vacuum).
    vacuum_min_age_s: float | None = None
    # Keep at most N idempotency commit keys (None = never expire). The
    # caller owns the redelivery horizon: a key expired here would
    # RE-APPLY on replay, so set this above the deepest checkpoint
    # rewind any writer can perform (see LakeTable.expire_commit_keys).
    keep_commit_keys: int | None = None
    # Append-mode fold horizon. None = files-only rewrite (always
    # sound). "auto" = fold events at/below the stream-armed
    # ``stream.low_watermark`` prop when one exists (falling back to
    # files-only on a not-yet-armed table — a scheduled round must not
    # crash on a young stream); an int folds at that explicit order
    # value and is the caller's promise to vouch for.
    fold_horizon: "str | int | None" = None


def plan_maintenance(
    table: LakeTable, policy: MaintenancePolicy | None = None
) -> dict:
    """Dry-run: what one maintenance round WOULD do, as a plain dict
    (the ops/observability surface; ``run_maintenance`` executes exactly
    this plan). Metadata-only — safe to call on any cadence."""
    policy = policy or MaintenancePolicy()
    snap = table.current()

    compact_buckets: list[int] = []
    split_buckets: list[int] = []
    base_bytes: dict[int, int] = {}
    for r in table.partitions(snap).collect():
        trip = (
            policy.max_delta_ratio is not None
            and r["delta_ratio"] > policy.max_delta_ratio
        ) or (
            policy.max_files_per_bucket is not None
            and r["n_files"] > policy.max_files_per_bucket
        )
        if trip:
            compact_buckets.append((r["n_files"], r["bucket"]))
        base = r["bucket"] % snap.n_buckets
        base_bytes[base] = base_bytes.get(base, 0) + r["bytes"]
    compact_buckets.sort(reverse=True)
    if policy.max_compact_buckets is not None:
        compact_buckets = compact_buckets[: policy.max_compact_buckets]
    if policy.max_bucket_bytes is not None:
        split_buckets = sorted(
            (b for b, n in base_bytes.items() if n > policy.max_bucket_bytes),
            key=lambda b: -base_bytes[b],
        )
        if policy.max_splits is not None:
            split_buckets = split_buckets[: policy.max_splits]

    long_chains = (
        sorted(
            int(b)
            for b, chain in snap.manifests.items()
            if policy.max_chain_len is not None
            and len(chain) > policy.max_chain_len
        )
        if policy.max_chain_len is not None
        else []
    )
    n_snapshots = len(table.snapshot_log())
    expire = (
        policy.keep_snapshots is not None
        and n_snapshots > policy.keep_snapshots
    )
    commit_key_horizon = None
    if (
        policy.keep_commit_keys is not None
        and len(snap.commits) > policy.keep_commit_keys
    ):
        versions = sorted(snap.commits.values(), reverse=True)
        commit_key_horizon = versions[policy.keep_commit_keys - 1]
    mode = snap.props.get("merge.mode", "lww")
    return {
        "mode": mode,
        "split_buckets": split_buckets,
        "compact_buckets": sorted(b for _, b in compact_buckets),
        "compact_kind": "compact" if mode == "lww" else "compact_append",
        "rewrite_manifest_buckets": long_chains,
        "expire_snapshots": policy.keep_snapshots if expire else None,
        "expire_commit_keys_below": commit_key_horizon,
        "vacuum": policy.vacuum_min_age_s is not None,
    }


def run_maintenance(
    table: LakeTable,
    commit_key: str,
    policy: MaintenancePolicy | None = None,
    retry_conflicts: int = 3,
) -> dict:
    """Execute one bounded maintenance round: split → compact →
    rewrite_manifests → expire_snapshots → vacuum, each step planned
    from the thresholds in ``policy`` and committed through the normal
    idempotent snapshot protocol (a crashed round re-runs with the same
    ``commit_key`` and resumes where it stopped; sub-keys are derived
    per action). Splits run FIRST so the round's compaction folds the
    freshly split sub-buckets; manifest rewrite runs after compaction
    because compaction already resets the chains it touches.

    Mode-aware: LWW tables compact through the whole-row rewrite; append
    merge-mode tables (patch/aggregate/first-row/event) route to
    ``compact_append``. By default that is FILES-ONLY — a sound fold
    horizon is a watermark contract, not a threshold. With
    ``policy.fold_horizon="auto"`` the round folds at the STREAM-armed
    ``stream.low_watermark`` prop (apply_append_batch(order_lateness=)
    arms and enforces it), falling back to files-only on a
    not-yet-armed table; an int folds at that explicit order value on
    the caller's own promise.

    Returns the executed plan plus per-step outcomes.
    """
    from data_pipeline_spark.lake.table import ConcurrentCommitError

    policy = policy or MaintenancePolicy()
    plan = plan_maintenance(table, policy)
    report = dict(plan)
    report["conflicts"] = 0
    report["skipped"] = []

    def attempt(name, fn):
        # A maintenance action racing a live writer loses the snapshot
        # CAS; each retry re-reads the head and re-derives its work from
        # the CURRENT state (compact/split/rewrite all re-plan inside),
        # so retrying with the SAME commit key is exact: either the key
        # is already recorded (crash after commit -> no-op) or the
        # action re-applies cleanly on the moved head. Exhausted retries
        # are REPORTED, not raised - table services are best-effort by
        # design and the next round's plan re-derives the backlog
        # (Iceberg commit-retry shape).
        for _ in range(max(1, retry_conflicts)):
            try:
                return fn()
            except ConcurrentCommitError:
                report["conflicts"] += 1
        report["skipped"].append(name)
        return None

    if plan["split_buckets"]:
        report["split_done"] = attempt(
            "split",
            lambda: auto_split(
                table,
                f"{commit_key}/split",
                max_bucket_bytes=policy.max_bucket_bytes,
                max_splits=policy.max_splits,
            ),
        )

    if plan["compact_buckets"]:
        def _compact():
            # Re-plan bucket ids from the CURRENT head: splits this round
            # (or an interleaved writer) may have changed the layout.
            buckets = set(plan_maintenance(table, policy)["compact_buckets"])
            if not buckets:
                return None
            kind = table.compact if plan["compact_kind"] == "compact" else None
            if kind is not None:
                return table.compact(
                    f"{commit_key}/compact",
                    buckets=buckets,
                    min_files=1,
                    max_buckets=policy.max_compact_buckets,
                )
            horizon = policy.fold_horizon
            if horizon == "auto" and (
                table.current().props.get("stream.low_watermark") is None
            ):
                horizon = None  # not armed yet — files-only this round
            return compact_append(
                table,
                f"{commit_key}/compact",
                horizon=horizon,
                buckets=buckets,
                min_files=1,
                max_buckets=policy.max_compact_buckets,
            )

        out = attempt("compact", _compact)
        report["compact_done"] = out is not None

    if policy.max_chain_len is not None:
        out = attempt(
            "rewrite_manifests",
            lambda: table.rewrite_manifests(
                f"{commit_key}/manifests", max_chain=policy.max_chain_len
            ),
        )
        report["rewrite_done"] = out is not None

    if plan["expire_commit_keys_below"] is not None:
        out = attempt(
            "expire_commit_keys",
            lambda: table.expire_commit_keys(
                plan["expire_commit_keys_below"], f"{commit_key}/commit-keys"
            ),
        )
        report["commit_keys_expired"] = out is not None
    if plan["expire_snapshots"] is not None:
        report["expired_versions"] = table.expire_snapshots(
            keep_last=policy.keep_snapshots
        )
    if plan["vacuum"]:
        report["vacuumed_files"] = table.vacuum(
            min_age_s=policy.vacuum_min_age_s
        )
    return report
