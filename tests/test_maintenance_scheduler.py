"""Policy-driven maintenance scheduler (maintenance.plan_maintenance /
run_maintenance): one bounded, idempotent, metadata-planned round that
re-establishes read-side invariants — file counts, manifest chains,
bucket sizes, snapshot history — touching only what drifted."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import (
    MaintenancePolicy,
    plan_maintenance,
    run_maintenance,
)

TS = "2026-01-01 00:00:00"
SCHEMA = [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
          ("v", "string")]


def _mk(spark, props=None, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_sched_")
    return LakeTable.create(spark, root, SCHEMA, "url", n_buckets, props=props)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, v string, op string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _fill(spark, t, batches=5, n=16):
    lsn = 0
    for b in range(batches):
        rows = []
        for i in range(n):
            lsn += 1
            rows.append((f"u{i}", lsn, TS, f"v{b}", "upsert"))
        merge_into(t, _batch(spark, rows), f"c{b}")
    return t


def test_clean_table_plans_nothing(spark):
    t = _fill(spark, _mk(spark))
    t.compact(commit_key="pre")
    plan = plan_maintenance(t, MaintenancePolicy())
    assert plan["compact_buckets"] == [] and plan["split_buckets"] == []
    assert plan["rewrite_manifest_buckets"] == []


def test_delta_tail_trips_compaction_and_round_is_idempotent(spark):
    t = _fill(spark, _mk(spark))
    pol = MaintenancePolicy(max_delta_ratio=0.1, max_files_per_bucket=3)
    plan = plan_maintenance(t, pol)
    assert plan["compact_buckets"], "delta tail should trip the policy"
    before = sorted(t.read().collect())
    rep = run_maintenance(t, "round-1", pol)
    assert rep["compact_done"]
    assert sorted(t.read().collect()) == before  # state preserved
    # After the round, nothing qualifies; a re-run plans empty and the
    # same commit key would no-op anyway.
    assert plan_maintenance(t, pol)["compact_buckets"] == []
    v = t.current().version
    run_maintenance(t, "round-1", pol)
    assert t.current().version == v


def test_append_mode_routes_to_files_only_compaction(spark):
    t = _mk(spark, props={"merge.mode": "patch", "merge.patch.cols": ["v"]})
    for b in range(4):
        t.commit_delta(
            _batch(
                spark,
                [(f"u{i}", b * 10 + i, TS, f"p{b}", "update") for i in range(6)],
            ).drop("op").withColumn("op", F.lit("update")),
            f"c{b}",
        )
    pol = MaintenancePolicy(max_files_per_bucket=2, max_delta_ratio=None)
    plan = plan_maintenance(t, pol)
    assert plan["compact_kind"] == "compact_append" and plan["compact_buckets"]
    n_events = t.read(raw=True).count()
    rep = run_maintenance(t, "round-1", pol)
    assert rep["compact_done"]
    # Files-only: the event multiset is preserved verbatim.
    assert t.read(raw=True).count() == n_events
    parts = {r["bucket"]: r["n_files"] for r in t.partitions().collect()}
    assert all(n == 1 for n in parts.values())


def test_split_runs_before_compaction(spark):
    t = _fill(spark, _mk(spark), batches=4, n=32)
    pol = MaintenancePolicy(
        max_bucket_bytes=1, max_splits=1,
        max_delta_ratio=0.0, max_files_per_bucket=1,
    )
    rep = run_maintenance(t, "round-1", pol)
    assert rep["split_done"], "over-size bucket should split"
    assert rep["compact_done"]
    # The compaction covered the freshly split sub-buckets too.
    parts = t.partitions().collect()
    assert all(r["n_delta_files"] == 0 for r in parts)
    assert any(r["depth"] > 0 for r in parts)


def test_chain_rewrite_and_history_bounds(spark):
    t = _mk(spark, props={"manifest.chain_max": 64})
    for b in range(6):
        t.commit_delta(
            _batch(spark, [(f"u{i}", b * 10 + i, TS, "x", "upsert")
                           for i in range(8)]),
            f"c{b}",
        )
    snap = t.current()
    assert any(len(ch) > 2 for ch in snap.manifests.values())
    pol = MaintenancePolicy(
        max_delta_ratio=None, max_files_per_bucket=None,
        max_chain_len=2, keep_snapshots=1, vacuum_min_age_s=0.0,
    )
    plan = plan_maintenance(t, pol)
    assert plan["rewrite_manifest_buckets"]
    before = sorted(t.read(raw=True).collect())
    rep = run_maintenance(t, "round-1", pol)
    assert rep["rewrite_done"] and rep["expired_versions"]
    assert all(len(ch) <= 2 for ch in t.current().manifests.values())
    assert len(t.snapshot_log()) == 1
    assert sorted(t.read(raw=True).collect()) == before


def test_conflict_with_live_writer_retries_and_lands(spark):
    """A maintenance compaction losing the snapshot CAS to a live writer
    must retry from the new head (same commit key) and fold the
    interleaved rows too — table services run ALONGSIDE writers."""
    t = _fill(spark, _mk(spark))
    root = t.root
    other = LakeTable(spark, root)
    orig = t._write_snapshot
    state = {"fired": False}

    def hooked(snap, expect_parent):
        if not state["fired"] and snap.summary.get("op") == "compact":
            state["fired"] = True
            merge_into(
                other,
                _batch(spark, [("u0", 999, TS, "vRACE", "upsert")]),
                "race",
            )
        return orig(snap, expect_parent)

    t._write_snapshot = hooked
    try:
        pol = MaintenancePolicy(max_delta_ratio=0.0, max_files_per_bucket=1)
        rep = run_maintenance(t, "round-1", pol)
    finally:
        t._write_snapshot = orig
    assert state["fired"], "the race must actually have fired"
    assert rep["conflicts"] == 1 and rep["compact_done"]
    assert rep["skipped"] == []
    # The retried compaction saw the racer's row; the table reads it.
    row = {r["url"]: r["v"] for r in t.read().collect()}
    assert row["u0"] == "vRACE"


def test_exhausted_conflicts_reported_not_raised(spark):
    t = _fill(spark, _mk(spark))
    other = LakeTable(spark, t.root)
    orig = t._write_snapshot
    state = {"n": 0}

    def hooked(snap, expect_parent):
        if snap.summary.get("op") == "compact":
            state["n"] += 1
            merge_into(
                other,
                _batch(spark, [("u0", 1000 + state["n"], TS, "x", "upsert")]),
                f"race-{state['n']}",
            )
        return orig(snap, expect_parent)

    t._write_snapshot = hooked
    try:
        pol = MaintenancePolicy(max_delta_ratio=0.0, max_files_per_bucket=1)
        rep = run_maintenance(t, "round-1", pol, retry_conflicts=2)
    finally:
        t._write_snapshot = orig
    assert rep["conflicts"] == 2 and rep["skipped"] == ["compact"]
    assert rep["compact_done"] is False
    # The table itself is untouched by the failed service round: every
    # racer commit landed, nothing lost.
    assert t.read().filter(F.col("url") == "u0").first()["lsn"] == 1002


def test_commit_key_expiry_via_policy(spark):
    t = _fill(spark, _mk(spark), batches=8)
    assert len(t.current().commits) == 8
    pol = MaintenancePolicy(keep_commit_keys=3)
    plan = plan_maintenance(t, pol)
    assert plan["expire_commit_keys_below"] == t.current().commits["c5"]
    rep = run_maintenance(t, "round-ck", pol)
    assert rep["commit_keys_expired"]
    kept = set(t.current().commits)
    # 3 newest writer keys survive, plus the round's own expiry key
    assert {"c5", "c6", "c7", "round-ck/commit-keys"} <= kept
    assert not {"c0", "c1", "c2", "c3", "c4"} & kept
    # keys inside the window still no-op on replay
    v = t.current().version
    merge_into(t, _batch(spark, [("u0", 999, TS, "zz", "upsert")]), "c7")
    assert t.current().version == v
    # re-running the same round is a no-op (key recorded)
    rep2 = run_maintenance(t, "round-ck", pol)
    assert t.current().version == v
    # under the bound: nothing planned
    assert plan_maintenance(t, MaintenancePolicy(keep_commit_keys=50))[
        "expire_commit_keys_below"
    ] is None
