#!/usr/bin/env python
"""Metadata-write cost of a delta tail: manifest bytes written per commit
with CHAINED manifests (this engine: append one manifest of only the added
entries, self-merge at manifest.chain_max) vs the pre-chain behavior
(rewrite the touched bucket's full manifest every commit — O(bucket files)
per commit, quadratic over the tail).

Prints one JSON line per (mode, n_commits): total manifest bytes written,
bytes written by the LAST commit (the steady-state marginal cost), and the
final chain length. Data writes are identical in both modes; this isolates
the metadata plane. Uses a real LakeTable on disk with 1-row commits into
one bucket — the worst case for metadata share.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.lake.table import MANIFEST_DIR, LakeTable  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402


def run(spark, n_commits: int, chain_max: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"chainbench_{chain_max}_")
    t = LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", 1, props={"manifest.chain_max": chain_max},
    )
    man_dir = os.path.join(root, MANIFEST_DIR)

    def man_bytes():
        return {
            fn: os.path.getsize(os.path.join(man_dir, fn))
            for fn in os.listdir(man_dir)
        }

    total = 0
    last = 0
    seen: set[str] = set()
    for i in range(n_commits):
        df = spark.createDataFrame(
            [(f"u{i}", i, "x")], "url string, lsn bigint, v string"
        )
        t.commit_delta(df, f"c{i}")
        now = man_bytes()
        new = {fn: sz for fn, sz in now.items() if fn not in seen}
        seen.update(now)
        last = sum(new.values())
        total += last
    return {
        "chain_max": chain_max,
        "n_commits": n_commits,
        "manifest_bytes_total": total,
        "manifest_bytes_last_commit": last,
        "final_chain_len": len(t.current().manifests["0"]),
    }


def main():
    spark = get_spark(parallelism=4, shuffle_partitions=4)
    print(json.dumps({"bench": "manifest_chain_metadata", "unit": "bytes"}))
    for n in (64, 256):
        # chain_max=1 reproduces the pre-chain full-rewrite-every-commit
        # behavior; 16 is the shipped default.
        for chain_max in (1, 16):
            print(json.dumps(run(spark, n, chain_max)))


if __name__ == "__main__":
    main()
