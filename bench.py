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
    "cdc_final_state",          # declarative LWW + extraction plan
    "cdc_lww_latest",
    "cdc_anti_join_new",
    "cdc_daily_counts",
    "cdc_mode_per_domain",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "docs_token_stats",
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

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        _force(registry[name].spark(spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

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
    }
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# Scaling mode: the same replay job at two parallelism levels in FRESH JVMs
# (local[N] vs local[4N] stands in for N vs 4N executors per the sandbox
# rule; each run is an isolated spark-submit-equivalent subprocess).
# ---------------------------------------------------------------------------

def _scaling_child(cores: int) -> None:
    from data_pipeline_spark.pipeline import replay
    from data_pipeline_spark.session import get_spark

    spark = get_spark(f"scale-{cores}", parallelism=cores)
    sf_dir = SF_DIR
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    root = tempfile.mkdtemp(prefix=f"lake_scale_{cores}_")
    try:
        t0 = time.monotonic()
        replay(spark, sf_dir, root, n_batches=4, n_buckets=64,
               record_metrics=False)
        wall = time.monotonic() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"cores": cores, "wall_s": round(wall, 3),
                      "events": n_events,
                      "eps": round(n_events / wall, 1)}))


def run_scaling(n_small: int = 8) -> None:
    n_big = 4 * n_small
    results = {}
    for cores in (n_small, n_big):
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    small, big = results[n_small], results[n_big]
    # Efficiency of throughput scaling from N to 4N cores.
    eff = (big["eps"] / small["eps"]) / (n_big / n_small)
    print(json.dumps({
        "metric": "scaling_efficiency_Nto4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "small": small,
        "big": big,
        "sf": _sf_of(SF_DIR),
    }))


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        idx = sys.argv.index("--scaling")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 and sys.argv[idx + 1].isdigit() else 8
        run_scaling(n)
    else:
        run_bench()
