"""Snapshot bootstrap → WAL handoff (initial load + incremental tail).

A CDC pipeline rarely starts at WAL position 0: the source table already
exists, the log has been truncated, and the engine must first load a
CONSISTENT snapshot taken at some WAL position ``L``, then tail changes
from a checkpoint at or before ``L``, converging to the same state a full
replay would produce (the Debezium initial-snapshot / Flink-CDC
hybrid-source handoff). Reference analog: the bulk convert pass over the
pre-existing catalog (reference: scripts/ingest_v1_s1_rtc.py:323-420)
followed by the incremental watch loop
(scripts/watch_cdse_and_process.py:241-277) — there the handoff is a
"last updated" time window re-checked with overlap; here it is an exact
LSN watermark, and the overlap resolves by last-writer-wins instead of
re-running idempotent per-item jobs.

Correctness contract:

* the snapshot is CONSISTENT at ``L``: it reflects exactly the events
  with ``lsn <= L`` (one row per live key; keys deleted at or before
  ``L`` are absent),
* the tail replays ALL events with ``lsn > P`` for some checkpoint
  ``P <= L``, gap-free, at-least-once — overlap with the snapshot is
  expected and harmless,
* **per-key mode** (``lsn_col`` given, the default): snapshot rows carry
  their true last lsn ``lsn_k <= L``, so the final state is
  byte-identical to a full replay INCLUDING per-key lsn lineage.
  Consistency means an overlap event for a snapshotted key always has
  ``lsn <= lsn_k`` — the read-time LWW collapse drops it; an overlap
  DELETE of a snapshot-absent key fences as a tombstone at its own lsn,
  and a tail re-insert outruns that fence exactly as it would in a full
  replay (the tombstone machinery is shared, lake/merge.py),
* **watermark mode** (``lsn_col=None``): every snapshot row is stamped
  ``L`` (the shape of a Debezium READ event, which carries the snapshot
  position, not per-row history). Payload state still converges —
  events ``<= L`` lose to ``L``, events ``> L`` win — but per-key lsn
  lineage collapses to ``L``. An overlap event with ``lsn == L`` ties
  only with the snapshot row that already embodies it, so the
  fingerprint tie-break picks between byte-identical rows.

The handoff position is recorded as a table property
(``bootstrap.lsn``) in the SAME atomic commit that loads the rows, so a
resumed tail can read its safe start position from the table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import MergeStats, merge_into
from data_pipeline_spark.lake.table import LakeTable

BOOTSTRAP_LSN_PROP = "bootstrap.lsn"


def bootstrap_snapshot(
    table: LakeTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    lsn_col: str | None = "lsn",
    commit_key: str | None = None,
) -> MergeStats:
    """Load an initial consistent snapshot (taken at WAL position
    ``snapshot_lsn``) into an EMPTY lake table as one atomic commit.

    ``snapshot`` holds one row per live key with the table's payload
    columns. ``lsn_col`` names the per-key last-change lsn column
    (byte-identical lineage); ``None`` stamps every row with the
    watermark instead. Idempotent on ``commit_key`` like every other
    commit — a crashed-and-retried bootstrap no-ops.
    """
    snap = table.current()
    commit_key = commit_key or f"bootstrap@{snapshot_lsn}"
    if snap.commits and commit_key not in snap.commits:
        raise ValueError(
            "bootstrap_snapshot requires an empty table: this table "
            f"already has {len(snap.commits)} commit(s). A snapshot load "
            "over existing state would shadow rows the tail no longer "
            "replays — create a fresh table or replay the WAL instead."
        )
    cols = [n for n, _ in table.schema_fields(snap)]
    if lsn_col is None:
        rows = snapshot.withColumn(
            snap.order_col, F.lit(int(snapshot_lsn)).cast("bigint")
        )
    else:
        rows = snapshot.withColumn(
            snap.order_col, F.col(lsn_col).cast("bigint")
        )
        # Consistency guard: a snapshot row claiming a position past the
        # watermark means the snapshot and watermark were not taken
        # together — the tail would then skip events the snapshot does
        # not contain. One narrow max() aggregate.
        mx = rows.agg(F.max(snap.order_col)).first()[0]
        if mx is not None and mx > snapshot_lsn:
            raise ValueError(
                f"inconsistent snapshot: row lsn {mx} > watermark "
                f"{snapshot_lsn}; the snapshot must reflect exactly the "
                "events at or before its watermark"
            )
    rows = rows.withColumn("op", F.lit("insert")).select(*cols, "op")
    return merge_into(
        table,
        rows,
        commit_key,
        precollapsed=True,
        props_update={BOOTSTRAP_LSN_PROP: int(snapshot_lsn)},
    )


def bootstrap_lsn(table: LakeTable) -> int | None:
    """The recorded handoff watermark, or None if the table was not
    bootstrapped. A gap-free tail may start at any checkpoint <= this."""
    v = table.current().props.get(BOOTSTRAP_LSN_PROP)
    return None if v is None else int(v)


def tail_wal(
    table: LakeTable,
    wal: DataFrame,
    from_lsn: int | None = None,
    n_batches: int = 4,
    commit_prefix: str = "tail",
    record_metrics: bool = False,
    **apply_kw,
) -> LakeTable:
    """Replay WAL events with ``lsn > from_lsn`` in lsn-ordered
    micro-batches through the normal merge path.

    ``from_lsn`` defaults to the table's recorded bootstrap watermark;
    pass an EARLIER checkpoint to model at-least-once overlap — LWW
    absorbs it. The filter is a pushed predicate, so a range-partitioned
    WAL prunes pre-checkpoint files at the scan.
    """
    from data_pipeline_spark.pipeline import apply_batch

    if from_lsn is None:
        from_lsn = bootstrap_lsn(table)
        if from_lsn is None:
            raise ValueError(
                "tail_wal needs a start position: the table has no "
                "bootstrap.lsn property and no from_lsn was given"
            )
    tail = wal.filter(F.col("lsn") > int(from_lsn))
    lo, hi = tail.agg(F.min("lsn"), F.max("lsn")).first()
    if lo is None:
        return table
    span = (hi - lo + 1 + n_batches - 1) // n_batches
    for i in range(n_batches):
        batch = tail.filter(
            (F.col("lsn") >= lo + i * span)
            & (F.col("lsn") < lo + (i + 1) * span)
        )
        apply_batch(
            table,
            batch,
            commit_key=f"{commit_prefix}-{i}",
            record_metrics=record_metrics,
            **apply_kw,
        )
    return table
