"""Continuous-tail soak: a LIVE (available_now=False) streaming tail fed
by a concurrent WAL writer, with in-stream compaction cadence and DLQ
armed, killed and resumed mid-tail — the evidence drain-mode tests can't
give (round-2 verdict Missing #4; reference analog: the perpetual cron
loop in scripts/watch_cdse_and_process.py:241-277).

Prints JSON lines:
  {"sample": ...}  periodic census — applied epochs, delta/base file
                   counts (bounded by compact_every), live rows
  {"soak": ...}    final verdict — sustained eps, resume green,
                   DLQ quarantined count, final-state == batch-replay

Usage: python scripts/soak_stream.py [--amplify 64] [--segments 16]
       [--compact-every 4] [--sleep 1.0]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def file_census(table):
    snap = table.current()
    base = delta = 0
    for entries in table.all_entries(snap).values():
        for e in entries:
            if e.get("kind", "base") == "delta":
                delta += 1
            else:
                base += 1
    return base, delta


def state(table):
    return sorted(
        (r.url, r.lsn, r.h)
        for r in table.read()
        .selectExpr("url", "lsn", "sha2(text, 256) AS h")
        .collect()
    )


def patchify(df):
    """Derive the patch feed (same rule as queries.cdc_partial_update)."""
    is_upd = F.col("op") == "update"
    return df.select(
        "url", "lsn", "warc_ts", "op",
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 0)),
               F.col("html")).alias("html"),
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 1)),
               F.col("lang")).alias("lang"),
    )


def patch_state(df):
    from data_pipeline_spark.operators.partial_update import (
        partial_update_collapse,
    )

    cur = partial_update_collapse(df, "url", "lsn", ["html", "lang"])
    return sorted(
        (r.url, r.lsn, r.lang, None if r.html is None else len(r.html))
        for r in cur.collect()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--amplify", type=int, default=64)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument("--sleep", type=float, default=1.0)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--merge-mode", default="lww", choices=["lww", "append"])
    args = ap.parse_args()

    from data_pipeline_spark import changelog as cl
    from data_pipeline_spark.lake.table import LakeTable
    from data_pipeline_spark.pipeline import replay_log
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.streaming.pipeline import run_stream

    spark = get_spark(parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    wal = tempfile.mkdtemp(prefix="soak_wal_")
    root = tempfile.mkdtemp(prefix="soak_tbl_")
    ckpt = tempfile.mkdtemp(prefix="soak_ckpt_")
    dlq_root = tempfile.mkdtemp(prefix="soak_dlq_")
    stage = tempfile.mkdtemp(prefix="soak_stage_")

    log = cl.changelog(spark, args.sf_dir, amplify=args.amplify)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo + 1 + args.segments - 1) // args.segments
    n_events = log.count()
    fps = spark.sparkContext.defaultParallelism

    def write_segment(i: int):
        part = log.filter(
            (F.col("lsn") >= lo + i * span)
            & (F.col("lsn") < lo + (i + 1) * span)
        )
        if args.merge_mode == "append":
            part = patchify(part)
        if i == args.segments // 3:
            # poison a few rows mid-tail: the DLQ must quarantine them
            # without stopping the stream
            bad = part.limit(3).withColumn("url", F.lit(None).cast("string"))
            part = part.unionByName(bad)
        tmp = os.path.join(stage, f"seg-{i:05d}")
        part.repartition(fps).write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(wal, f"seg-{i:05d}"))  # atomic arrival

    def start():
        return run_stream(
            spark, wal, root, ckpt,
            n_buckets=16,
            max_files_per_trigger=256,
            available_now=False,
            record_metrics=True,
            compact_every=args.compact_every,
            dlq_root=dlq_root,
            merge_mode=args.merge_mode,
        )

    t0 = time.monotonic()
    write_segment(0)
    q = start()
    table = LakeTable(spark, root)
    kill_at = args.segments // 2
    resumed = False
    samples = []
    for i in range(1, args.segments):
        write_segment(i)
        time.sleep(args.sleep)
        try:
            snap = table.current()
            base, delta = file_census(table)
            epochs = sum(1 for k in snap.commits if k.startswith("epoch="))
            samples.append({
                "sample": i, "t_s": round(time.monotonic() - t0, 1),
                "epochs": epochs, "base_files": base,
                "delta_files": delta, "resumed": resumed,
            })
            print(json.dumps(samples[-1]), flush=True)
        except FileNotFoundError:
            pass  # table not initialized yet
        if i == kill_at:
            q.stop()          # kill mid-tail...
            q.awaitTermination(60)
            q = start()       # ...and resume from the same checkpoint
            resumed = True

    # drain: wait until the stream has consumed everything it can see
    deadline = time.monotonic() + 600
    last = -1
    while time.monotonic() < deadline:
        time.sleep(2.0)
        snap = table.current()
        epochs = sum(1 for k in snap.commits if k.startswith("epoch="))
        if epochs == last and not q.status["isDataAvailable"]:
            break
        last = epochs
    active_wall = time.monotonic() - t0
    q.stop()
    q.awaitTermination(60)

    base, delta = file_census(table)

    # oracle: batch-replay / direct-collapse of the same WAL (minus the
    # quarantined rows)
    full = spark.read.schema(
        "url string, lsn bigint, warc_ts timestamp, op string, "
        "html binary, lang string"
    ).option("recursiveFileLookup", "true").parquet(wal).filter(
        F.col("url").isNotNull()
    )
    raw_count_ok = True
    if args.merge_mode == "append":
        # every WAL event row landed exactly once; state = mode collapse
        got = patch_state(table.read(raw=True))
        want = patch_state(full)
        raw_count_ok = table.read(raw=True).count() == full.count()
    else:
        got = state(table)
        batch_root = tempfile.mkdtemp(prefix="soak_batch_")
        bt = replay_log(spark, full, batch_root, n_batches=4, n_buckets=16,
                        record_metrics=False)
        want = state(bt)

    dlq_rows = LakeTable(spark, dlq_root).read().count()
    out = {
        "soak": True,
        "merge_mode": args.merge_mode,
        "raw_count_ok": raw_count_ok,
        "events": n_events,
        "segments": args.segments,
        "active_wall_s": round(active_wall, 1),
        "sustained_eps": round(n_events / active_wall, 1),
        "resumed_ok": resumed,
        "dlq_quarantined": dlq_rows,
        "final_delta_files": delta,
        "final_base_files": base,
        "delta_files_bounded": max(
            (s["delta_files"] for s in samples), default=0),
        "state_match": got == want,
        "rows": len(got),
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(stage, ignore_errors=True)
    if not out["state_match"] or not resumed or not raw_count_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
