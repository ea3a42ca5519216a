"""Stage-level 8→32 scaling diagnostic: localize WHICH stage of the
replay hot path stops scaling with width (round-5; VERDICT r4 closed the
metadata tail — "the remaining 8→32 gap in clean-window terms is now the
write stage itself", this measures that claim instead of arguing it).

Decomposes one apply epoch into cumulative stages, each its own timed
noop-forced job over the same amplified WAL, in a fresh JVM per width
(the bench.py scaling-child protocol: per-core heap, untimed WAL
landing, warm-up run, best-of-N, CPU + data controls in the same JSON):

* ``scan``      — parquet scan + count of the WAL (the data ceiling for
                  this input, engine-free);
* ``collapse``  — scan + LWW winner selection (`lww_collapse`: hash agg
                  with map-side combine — the shuffle stage);
* ``extract``   — collapse + vectorized text extraction over winners
                  (the Python/Arrow boundary);
* ``write``     — the full epoch: collapse + extract + bucket-routed
                  parquet delta commit (`apply_batch` on a real table).

Per-stage MARGINAL wall (stage minus previous stage) then shows which
increment scales and which doesn't. Controls make the readings
discardable when the box itself cannot scale (the 2026-08-21 storm
signature: pure-codegen control at 0.6).

Usage:
    python scripts/bench_stage_scale.py [--cores 8,32] [--amplify 256]
    python scripts/bench_stage_scale.py --child <cores>   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def child(cores: int, amplify: int, trials: int) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{3 * cores}g")
    from pyspark.sql import functions as F

    from data_pipeline_spark.extraction import extract_text_sql
    from data_pipeline_spark.lake.merge import lww_collapse
    from data_pipeline_spark.pipeline import (
        apply_batch, ensure_table, materialize_wal,
    )
    from data_pipeline_spark.session import get_spark

    spark = get_spark(f"stage-{cores}", parallelism=cores)
    root = tempfile.mkdtemp(prefix=f"stage_scale_{cores}_")
    try:
        log = materialize_wal(
            spark, SF_DIR, os.path.join(root, "wal"),
            amplify=amplify, partitions=4 * cores,
        )
        n = log.count()
        cols = [c for c in log.columns]
        payload = [c for c in cols if c != "url"]

        def stage_scan(t):
            # fresh plan per trial: vary a never-matching filter literal
            return log.filter(F.col("lsn") != -1 - t).agg(
                F.count("*"), F.sum(F.octet_length("html"))
            )

        def stage_collapse(t):
            w = lww_collapse(log.filter(F.col("lsn") != -1 - t),
                             "url", "lsn", payload)
            return w.agg(F.count("*"), F.sum(F.octet_length("html")))

        def stage_extract(t):
            w = lww_collapse(log.filter(F.col("lsn") != -1 - t),
                             "url", "lsn", payload)
            return w.select(
                "url", extract_text_sql("html").alias("text")
            ).agg(F.count("*"), F.sum(F.length("text")))

        def timed(fn) -> float:
            _noop(fn(99))  # warm (codegen, UDF workers)
            walls = []
            for t in range(trials):
                t0 = time.monotonic()
                _noop(fn(t))
                walls.append(time.monotonic() - t0)
            return min(walls)

        t_scan = timed(stage_scan)
        t_collapse = timed(stage_collapse)
        t_extract = timed(stage_extract)

        # full epoch: real table, one batch, one delta commit (the write
        # increment on top of collapse+extract). Fresh table per trial so
        # every commit does the same work.
        walls = []
        for t in range(trials):
            table = ensure_table(
                spark, os.path.join(root, f"t{t}"), n_buckets=64
            )
            t0 = time.monotonic()
            apply_batch(table, log, f"stage-{t}", record_metrics=False)
            walls.append(time.monotonic() - t0)
        t_write = min(walls)

        # controls (bench.py protocol)
        def ctl(trial):
            return (
                spark.range(trial, 20_000_000 + trial, 1, 4 * cores)
                .selectExpr("sha2(cast(id as string), 256) h")
                .selectExpr("max(h)")
            )

        ctl(99).collect()
        c0 = time.monotonic(); ctl(0).collect()
        cpu = time.monotonic() - c0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "cores": cores, "events": n, "amplify": amplify,
        "scan_s": round(t_scan, 2),
        "collapse_s": round(t_collapse, 2),
        "extract_s": round(t_extract, 2),
        "full_epoch_s": round(t_write, 2),
        "marginal": {
            "collapse": round(t_collapse - t_scan, 2),
            "extract": round(t_extract - t_collapse, 2),
            "write": round(t_write - t_extract, 2),
        },
        "cpu_control_s": round(cpu, 2),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--amplify", type=int, default=256)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.amplify, args.trials)
        return
    legs = {}
    for cores in [int(c) for c in args.cores.split(",")]:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", str(cores),
             "--amplify", str(args.amplify), "--trials", str(args.trials)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        legs[cores] = json.loads(line)
        print(line, flush=True)
    cs = sorted(legs)
    if len(cs) == 2:
        a, b = legs[cs[0]], legs[cs[1]]
        ratio = cs[1] / cs[0]
        out = {"metric": "stage_scaling", "cores": cs}
        for k in ("scan_s", "collapse_s", "extract_s", "full_epoch_s",
                  "cpu_control_s"):
            out[k.replace("_s", "_eff")] = round(
                (a[k] / b[k]) / ratio, 3
            ) if b[k] else None
        out["marginal_eff"] = {
            k: round((a["marginal"][k] / b["marginal"][k]) / ratio, 3)
            if b["marginal"][k] > 0.05 else None
            for k in a["marginal"]
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
