#!/usr/bin/env python
"""spark-submit entry point: replay the change log into a lake table.

Run (the north_rule's deployment shape — package shipped via --py-files):

    python -m zipfile -c /tmp/dps.zip data_pipeline_spark
    spark-submit --master local[8] --py-files /tmp/dps.zip \
        scripts/submit_replay.py --sf-dir /root/testdata/sf0.001 \
        --table-root /tmp/lake_submit

On a cluster the only change is --master and executor confs; the job code
is identical (no driver-local filesystem assumptions in the hot path).
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("cdc-replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from data_pipeline_spark.pipeline import replay

    t0 = time.monotonic()
    table = replay(
        spark, args.sf_dir, args.table_root,
        n_batches=args.n_batches, n_buckets=args.n_buckets,
        record_metrics=True,
    )
    final = table.read()
    n = final.count()
    h = final.selectExpr(
        "sum(cast(conv(substr(sha2(concat_ws('|', url, lsn, text), 256), 1, 15), 16, 10) as decimal(38, 0))) AS h"
    ).first()[0]
    print(json.dumps({
        "rows": n,
        "state_hash": str(h),
        "wall_s": round(time.monotonic() - t0, 2),
        "version": table.current().version,
    }))


if __name__ == "__main__":
    main()
