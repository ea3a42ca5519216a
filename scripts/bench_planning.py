"""Scan-planning scalability: wall time of LakeTable._select_files vs
manifest entry count, on REAL tables whose manifests are synthesized at
10^3..10^5 entries (data files need not exist — planning reads only
manifests). Prints one JSON line per (n_files, mode).

Answers the round-2 verdict's scale question: manifests are per-bucket
JSON parsed on the driver and the planner loops file entries in Python —
what does a scan plan cost at 10^5-10^6 files (100 TB at ~1 GB/file)?

Modes:
  scan        — plain full-table plan (min_order/stats dict checks only)
  point5      — 5-key point-lookup plan: bloom probe per file (the
                expensive path; blooms decode ONCE per file lifetime into
                ints, probes are one AND per key) — cold cache then warm
  stats       — stats_bounds interval plan

O() statement: every mode is O(selected buckets' file entries) driver-
side with a per-entry constant measured below (~0.3 µs scan, ~2.5 µs
cold point probe, ~0.6 µs warm). At 10^6 files a cold 5-key point plan
costs ~2.5 s on the driver; the scale path beyond that is DISTRIBUTED
planning (Iceberg's Avro-manifest answer): --distributed adds timings
for the same plans run as a Spark job over manifests-as-data
(LakeTable._select_files_spark — wholetext read + the same
_plan_filter_entries kernel in mapInPandas), which the engine
auto-routes to above plan.distributed_min_bytes of selected manifest
JSON. Planning cost is independent of table BYTES (html never touches
the planner) and of untouched buckets (bucket pruning precedes entry
loading) on BOTH paths; the distributed path additionally makes it
O(entries / executors) wall with O(retained paths) driver state.
"""

import base64
import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.lake.table import (  # noqa: E402
    MANIFEST_DIR,
    SNAPSHOT_DIR,
    LakeTable,
    Snapshot,
    _atomic_write,
    _bloom_positions,
)


class _NoSpark:
    pass


def build_table(root: str, n_files: int, n_buckets: int = 64) -> LakeTable:
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    os.makedirs(os.path.join(root, SNAPSHOT_DIR), exist_ok=True)
    m = 2048
    manifests = {}
    per_bucket = max(1, n_files // n_buckets)
    fid = 0
    for b in range(n_buckets):
        entries = []
        for _ in range(per_bucket):
            bits = bytearray(m // 8)
            for k in (f"https://ex{fid}.com/a", f"https://ex{fid}.com/b"):
                for p in _bloom_positions(k, m):
                    bits[p >> 3] |= 1 << (p & 7)
            entries.append({
                "path": f"data/v1/__bucket={b}/part-{fid}.parquet",
                "schema_version": 1,
                "kind": "base",
                "bytes": 1 << 20,
                "stats": {"lsn": [fid * 10, fid * 10 + 9],
                          "warc_ts": [0, 10 ** 15]},
                "bloom": {"m": m,
                          "b": base64.b64encode(bytes(bits)).decode()},
            })
            fid += 1
        name = f"b{b:05d}-v00000001-{uuid.uuid4().hex[:8]}.json"
        _atomic_write(os.path.join(root, MANIFEST_DIR, name),
                      json.dumps(entries))
        manifests[str(b)] = [name]
    snap = Snapshot(
        version=1, schema_version=1,
        schemas={"1": [["url", "string"], ["lsn", "bigint"]]},
        n_buckets=n_buckets, key="url", manifests=manifests,
        commits={"init": 1}, summary={"op": "bench"},
    )
    _atomic_write(os.path.join(root, SNAPSHOT_DIR, "v00000001.json"),
                  snap.to_json())
    _atomic_write(os.path.join(root, "_CURRENT"), "v00000001.json")
    t = LakeTable.__new__(LakeTable)
    t.spark = _NoSpark()
    t.root = root
    t._manifest_cache = {}
    t._bloom_int_cache = {}
    return t


def main():
    distributed = "--distributed" in sys.argv
    spark = None
    if distributed:
        from data_pipeline_spark.session import get_spark

        spark = get_spark(
            parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        )
    print(json.dumps({"bench": "scan_planning", "unit": "ms"}))
    sizes = tuple(
        int(x) for x in os.environ.get(
            "SPARK_GRAFT_PLAN_SIZES", "1000,10000,100000"
        ).split(",")
    )
    for n in sizes:
        root = tempfile.mkdtemp(prefix=f"plan_{n}_")
        t = build_table(root, n)
        snap = t.current()
        keys = [f"https://ex{j}.com/a" for j in range(5)]
        rows = {"n_files": n}

        # cold: includes manifest JSON parse + bloom decode (first touch)
        t0 = time.monotonic()
        t._select_files(snap, None, None, keys, None)
        rows["point5_cold_ms"] = round((time.monotonic() - t0) * 1000, 2)
        # warm: manifests + decoded blooms cached (steady-state driver)
        t0 = time.monotonic()
        t._select_files(snap, None, None, keys, None)
        rows["point5_warm_ms"] = round((time.monotonic() - t0) * 1000, 2)
        t0 = time.monotonic()
        t._select_files(snap, None, n * 10 // 2, None, None)
        rows["min_order_ms"] = round((time.monotonic() - t0) * 1000, 2)
        t0 = time.monotonic()
        t._select_files(snap, None, None, None,
                        {"lsn": (n * 3, n * 4)})
        rows["stats_bounds_ms"] = round((time.monotonic() - t0) * 1000, 2)
        t0 = time.monotonic()
        t._select_files(snap, set(range(4)), None, keys, None)
        rows["point5_4buckets_ms"] = round((time.monotonic() - t0) * 1000, 2)
        if spark is not None:
            t.spark = spark
            # cold then warm (JVM/Python-worker reuse is the steady state)
            t0 = time.monotonic()
            t._select_files(snap, None, None, keys, None, distributed=True)
            rows["dist_point5_cold_ms"] = round(
                (time.monotonic() - t0) * 1000, 2)
            t0 = time.monotonic()
            t._select_files(snap, None, None, keys, None, distributed=True)
            rows["dist_point5_warm_ms"] = round(
                (time.monotonic() - t0) * 1000, 2)
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
