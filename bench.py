#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ..., "throughput_eps": ...}

Modes:
    python bench.py                 # default driver mode (one JSON line)
    python bench.py --scaling       # replay at two parallelism levels
                                    # (N and 4N cores) -> scaling efficiency;
                                    # evidence for the north_rule's
                                    # two-cluster-size criterion (see BENCH.md)

Execution is forced with a noop-format write (full plan runs, nothing is
collected to the driver), so timings measure the distributed plan, not
driver materialization.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries (subset of the registry: the CDC path end-to-end, the
# hot dataframe operators, classic OLAP, and training-data ops).
HEADLINE = [
    "cdc_replay_final_state",   # the real engine: micro-batched MERGE replay
    "cdc_stream_final_state",   # the streaming engine: WAL tail + epoch commits
    "cdc_final_state",          # declarative LWW + extraction plan
    "cdc_lww_latest",
    "cdc_anti_join_new",
    "cdc_daily_counts",
    "cdc_mode_per_domain",
    "cdc_range_join",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "docs_token_stats",
    "docs_minhash_near_dup_fast",
    "emb_ann_bruteforce",
    "cdc_incr_matview",         # retract-stream fold vs full recompute
    "cdc_point_lookup",         # bloom + bucket pruned primary-key GET
    "cdc_clustered_scan",       # OPTIMIZE ZORDER BY + stats-bounded scan
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench() -> None:
    from data_pipeline_spark import queries as q
    from data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM + parquet footers once so timings measure steady state.
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    registry = q.REGISTRY
    names = [n for n in HEADLINE if n in registry]
    # Optional extras via env (comma list or 'all').
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    if extra == "all":
        names = list(registry)
    elif extra:
        names += [n for n in extra.split(",") if n in registry and n not in names]

    # Same-hour noise-floor controls IN the bench JSON (VERDICT r4 #6):
    # the driver's headline trend drifted monotonically across rounds
    # while same-day solo readings attributed it to co-tenancy — these
    # two controls let every BENCH_r{N}.json carry its own attribution.
    # cpu_control: pure-codegen sha2 over a range (no data, no Python) —
    # its wall moves ONLY with machine contention. data_control: bare
    # scan+agg of the events parquet — the machine's ceiling for this
    # data shape. Both warmed best-of-2, fresh plan per trial.
    from pyspark.sql import functions as F

    def _cpu_ctl(trial: int):
        return (
            spark.range(trial, 20_000_000 + trial, 1, 64)
            .selectExpr("sha2(cast(id as string), 256) h")
            .selectExpr("max(h)")
        )

    def _data_ctl(trial: int):
        # raw driver-testdata events schema (event_id/ts/.../props), not
        # the synthesized changelog — a bare scan+agg of the same file
        # the queries start from
        return (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .filter(F.col("event_id") % 1000 != (999 - trial))
            .agg(
                F.count("props"),
                F.sum(F.octet_length(F.col("props").cast("string"))),
            )
        )

    def _best2(fn) -> float:
        fn(99).collect()  # warm
        walls = []
        for t in range(2):
            t0 = time.monotonic()
            fn(t).collect()
            walls.append(time.monotonic() - t0)
        return round(min(walls), 3)

    cpu_control_s = _best2(_cpu_ctl)
    data_control_s = _best2(_data_ctl)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        _force(registry[name].spark(spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    # Post-run control re-read: a large pre/post delta means contention
    # ARRIVED mid-bench — flags which half of the run to distrust.
    cpu_control_post_s = _best2(_cpu_ctl)

    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    replay_s = timings.get("cdc_replay_final_state")
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_change_events": n_events,
        "cdc_replay_throughput_eps": (
            round(n_events / replay_s, 1) if replay_s else None
        ),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
        "cpu_control_s": cpu_control_s,
        "cpu_control_post_s": cpu_control_post_s,
        "data_control_s": data_control_s,
    }
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# Scaling mode: the same replay job at two parallelism levels in FRESH JVMs
# (local[N] vs local[4N] stands in for N vs 4N executors per the sandbox
# rule; each run is an isolated spark-submit-equivalent subprocess).
# ---------------------------------------------------------------------------

def _scaling_child(cores: int) -> None:
    """One fresh-JVM replay at ``cores`` parallelism over an amplified log.

    Amplification (default 16× → 1.6M events at sf0.1) makes the replay
    compute/shuffle-bound rather than job-scheduling-bound, which is the
    regime the 100 TB scaling claim is about; the log keeps its key-skew
    shape (see changelog.changelog)."""
    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.pipeline import replay
    from data_pipeline_spark.session import get_spark

    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "64"))
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
    from data_pipeline_spark.pipeline import materialize_wal, replay_log

    # AQE stays ON (session default): the apply path's winner-join relies
    # on AQE's runtime size check to pick broadcast at micro-batch sizes
    # and shuffle join at backlog sizes.
    #
    # Heap scales WITH the core count (3 GiB/core): on a real cluster 4N
    # executors bring 4N executors' worth of heap, so a fixed local-JVM
    # heap would hand the N leg 4x the memory per core and tax the 4N leg
    # with GC pressure the cluster it stands in for would never see.
    # SPARK_GRAFT_DRIVER_MEM still overrides for constrained boxes.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{3 * cores}g")
    spark = get_spark(f"scale-{cores}", parallelism=cores)
    root = tempfile.mkdtemp(prefix=f"lake_scale_{cores}_")
    wal_dir = os.path.join(root, "wal")
    try:
        # WAL landing is untimed prep: the engine's job starts at "tail the
        # stored change log", not "synthesize it".
        log = materialize_wal(
            spark, SF_DIR, wal_dir, amplify=amplify, partitions=4 * cores
        )
        n_events = log.count()
        # Untimed warm-up: spin up Python UDF workers + JIT/codegen caches
        # so the timed runs measure steady-state throughput (a real tail
        # runs for hours; cold-start is noise, not signal).
        replay_log(spark, log, os.path.join(root, "warm"), n_batches=1,
                   n_buckets=64, record_metrics=False)
        walls = []
        last_table = None
        for t in range(trials):
            t0 = time.monotonic()
            # Timed work = 4 merge-on-read delta commits + the final
            # compaction that fully materializes the table (the complete
            # engine cost; deltas alone would understate it).
            # SPARK_GRAFT_COMPACT=0 times the pure apply path (deltas
            # only) — the "CDC apply throughput" number when compaction
            # runs on its own maintenance cadence; default includes the
            # compaction so the timed work is the complete engine cost.
            last_table = replay_log(
                spark, log, os.path.join(root, f"table{t}"),
                n_batches=4, n_buckets=64, record_metrics=False,
                compact_at_end=os.environ.get(
                    "SPARK_GRAFT_COMPACT", "1") == "1")
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        # Per-stage breakdown from the last trial's commit summaries:
        # t_write = distributed Spark jobs, t_meta = driver-serial
        # metadata tail (the non-scaling share the efficiency claim
        # hinges on).
        t_write = t_meta = 0.0
        for s in last_table.snapshot_log():
            t_write += s.summary.get("t_write_s", 0.0)
            t_meta += s.summary.get("t_meta_s", 0.0)

        # CPU-bound control job: same harness, no memory-bandwidth-heavy
        # wide rows. Separates "the engine doesn't scale" from "local[N]
        # shares one memory controller" (executors on a real cluster
        # bring their own bandwidth).
        def ctl(trial: int):
            # fresh plan per trial — a reused DataFrame object would skip
            # its completed shuffle stages and fake the timing
            return (
                spark.range(trial, 20_000_000 + trial, 1, 4 * cores)
                .selectExpr("sha2(cast(id as string), 256) h")
                .selectExpr("max(h)")
            )

        ctl(99).collect()  # warm
        ctl_walls = []
        for t in range(2):
            t0 = time.monotonic()
            ctl(t).collect()
            ctl_walls.append(time.monotonic() - t0)

        # DATA-shaped control: a bare scan+count over the same WAL rows —
        # zero engine code, pure JVM parquet decode of the same wide
        # payloads. This is the machine's scaling ceiling for THIS data
        # shape; the engine cannot beat it, only match it.
        from pyspark.sql import functions as F

        def data_ctl(trial: int):
            return log.filter(F.col("lsn") % 1000 != (999 - trial)).agg(
                F.count("html"), F.sum(F.octet_length("html"))
            )

        data_ctl(99).collect()  # warm
        dctl_walls = []
        for t in range(2):
            t0 = time.monotonic()
            data_ctl(t).collect()
            dctl_walls.append(time.monotonic() - t0)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"cores": cores, "wall_s": round(wall, 3),
                      "walls": [round(w, 3) for w in walls],
                      "events": n_events, "amplify": amplify,
                      "eps": round(n_events / wall, 1),
                      "stage_write_s": round(t_write, 3),
                      "stage_meta_s": round(t_meta, 3),
                      "cpu_control_s": round(min(ctl_walls), 3),
                      "data_control_s": round(min(dctl_walls), 3)}))


def run_stream_bench() -> None:
    """Streaming drain vs batch replay over the SAME WAL FILES: the batch
    reference applies each segment with apply_batch directly (identical
    input layout, identical work), so the gap is PURE Structured-Streaming
    machinery (file-source listing, offset commit, epoch planning) plus the
    per-epoch path-collect of the re-read mode — not, as a range-layout
    batch reference would conflate, a measure of WAL file layout.
    SPARK_GRAFT_EPOCHS controls how many epochs the backlog becomes;
    SPARK_GRAFT_REREAD=0 benchmarks the direct micro-batch mode instead of
    the file re-read mode."""
    import glob
    import tempfile

    from data_pipeline_spark.pipeline import apply_batch, ensure_table, replay_log
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.streaming.pipeline import (
        WAL_SCHEMA,
        stream_to_completion,
        write_wal,
    )

    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "64"))
    epochs = int(os.environ.get("SPARK_GRAFT_EPOCHS", "4"))
    reread = os.environ.get("SPARK_GRAFT_REREAD", "1") != "0"
    spark = get_spark("stream-bench")
    root = tempfile.mkdtemp(prefix="bench_stream_")

    wal = os.path.join(root, "wal_s")
    write_wal(spark, SF_DIR, wal, n_files=epochs, amplify=amplify)
    log = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(WAL_SCHEMA).parquet(wal)
    )
    n_events = log.count()
    # warm-up replay (JVM + page cache), untimed
    replay_log(spark, log, os.path.join(root, "warm"), n_batches=1,
               n_buckets=64, record_metrics=False)

    # batch reference: apply each WAL segment directly — exactly the rows
    # each streaming epoch processes, zero streaming machinery
    table_b = ensure_table(spark, os.path.join(root, "tb"), 64)
    segs = sorted(glob.glob(os.path.join(wal, "seg-*")))
    t0 = time.monotonic()
    for i, seg in enumerate(segs):
        apply_batch(table_b, spark.read.schema(WAL_SCHEMA).parquet(seg),
                    commit_key=f"b{i}", record_metrics=False)
    batch_s = time.monotonic() - t0

    # streaming drain: one epoch per WAL segment via availableNow
    t0 = time.monotonic()
    stream_to_completion(
        spark, wal, os.path.join(root, "ts"), os.path.join(root, "ckpt"),
        n_buckets=64, record_metrics=False,
        max_files_per_trigger=spark.sparkContext.defaultParallelism,
        reread_files=reread,
    )
    stream_s = time.monotonic() - t0
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "streaming_vs_batch_drain",
        "events": n_events, "epochs": epochs, "amplify": amplify,
        "reread_files": reread,
        "batch_s": round(batch_s, 3), "stream_s": round(stream_s, 3),
        "batch_eps": round(n_events / batch_s, 1),
        "stream_eps": round(n_events / stream_s, 1),
        "stream_over_batch": round(stream_s / batch_s, 3),
        "machinery_s_per_epoch": round((stream_s - batch_s) / epochs, 3),
        "sf": _sf_of(SF_DIR),
    }))


def run_scaling(n_small: int = 8) -> None:
    """SPARK_GRAFT_SCALE_REPS > 1 runs the two levels INTERLEAVED in ABBA
    order (N, 4N, 4N, N, ...) and keeps the best wall per level: co-tenant
    drift on this box can shift machine throughput between legs by tens of
    percent (observable as the pure-codegen CPU control 'scaling' at >1.0
    — impossible for a real job), and interleaving spreads the drift
    across both levels instead of crediting it all to one."""
    n_big = 4 * n_small
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "1"))
    order: list[int] = []
    for r in range(reps):
        order += [n_small, n_big] if r % 2 == 0 else [n_big, n_small]
    legs: dict[int, list[dict]] = {n_small: [], n_big: []}
    for cores in order:
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        legs[cores].append(json.loads(line))

    def best(cores: int) -> dict:
        runs = legs[cores]
        agg = dict(min(runs, key=lambda r: r["wall_s"]))
        agg["walls"] = [w for r in runs for w in r["walls"]]
        agg["wall_s"] = min(agg["walls"])
        agg["eps"] = round(agg["events"] / agg["wall_s"], 1)
        agg["cpu_control_s"] = min(r["cpu_control_s"] for r in runs)
        agg["data_control_s"] = min(r["data_control_s"] for r in runs)
        return agg

    small, big = best(n_small), best(n_big)
    # Efficiency of throughput scaling from N to 4N cores.
    eff = (big["eps"] / small["eps"]) / (n_big / n_small)
    cpu_eff = (small["cpu_control_s"] / big["cpu_control_s"]) / (n_big / n_small)
    out = {
        "metric": "scaling_efficiency_Nto4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpu_control_efficiency": round(cpu_eff, 3),
        "small": small,
        "big": big,
        "sf": _sf_of(SF_DIR),
    }
    if "data_control_s" in small and "data_control_s" in big:
        dctl = (small["data_control_s"] / big["data_control_s"]) / (
            n_big / n_small
        )
        out["data_control_efficiency"] = round(dctl, 3)
        # Engine efficiency normalized to the bare-scan ceiling of the
        # same rows on the same machine (1.0 = the engine adds zero
        # non-scaling work beyond touching the data).
        out["vs_data_ceiling"] = round(eff / dctl, 3) if dctl else None
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--stream" in sys.argv:
        run_stream_bench()
    elif "--scaling" in sys.argv:
        idx = sys.argv.index("--scaling")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 and sys.argv[idx + 1].isdigit() else 8
        run_scaling(n)
    else:
        run_bench()
