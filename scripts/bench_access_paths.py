"""Access-path microbenchmark: quantify what the metadata layers buy.

Builds one replayed + bloom-indexed + z-order-compacted table at
$SPARK_GRAFT_SF_DIR (default sf0.1), then times each access path against
its naive full-scan twin (warmed best-of-N, fresh predicate literals per
trial so no stage reuse):

  point GET        table.lookup(keys)              vs read().filter(isin)
  bounded scan     read(stats_bounds=...)          vs read().filter(range)
  indexed lookup   SecondaryIndex.lookup(value)    vs read().filter(col=v)

Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(n, fn):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main() -> None:
    import datetime as dt

    from pyspark.sql import functions as F

    from data_pipeline_spark.index import SecondaryIndex
    from data_pipeline_spark.pipeline import replay
    from data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "16"))
    spark = get_spark(parallelism=cpus)

    table = replay(
        spark, sf_dir, tempfile.mkdtemp(prefix="lake_ap_"), n_batches=2,
        n_buckets=64, record_metrics=False, amplify=amplify,
    )
    table.update_props({"bloom_bits": 64 * 1024})
    table.compact(
        "ap-z", cluster_by=["lang", "warc_ts"], zorder=True,
        target_rows_per_file=256,
    )
    idx = SecondaryIndex(
        spark, table, tempfile.mkdtemp(prefix="lake_ap_i_"), "lang", 16
    )
    idx.refresh()
    idx.optimize("ap-idx", target_rows_per_file=4096)

    urls = [r.url for r in table.read().limit(400).collect()]
    results: dict[str, dict] = {}

    def pick(i):  # vary the key set per trial — no plan/stage reuse
        return urls[i * 7 % 300: i * 7 % 300 + 5]

    state = {"i": 0}

    def _next():
        state["i"] += 1
        return state["i"]

    results["point_get"] = {
        "indexed_s": best_of(
            trials, lambda: table.lookup(pick(_next())).count()
        ),
        "full_s": best_of(
            trials,
            lambda: table.read().filter(
                F.col("url").isin(pick(_next()))
            ).count(),
        ),
    }

    # Window derived from the data (amplified replays compress winner
    # timestamps into a narrow band): a ~10% slice of the actual range.
    mn, mx = table.read().agg(F.min("warc_ts"), F.max("warc_ts")).first()
    lo = mn + (mx - mn) * 2 // 10
    hi = mn + (mx - mn) * 3 // 10

    def _bounds(n):
        return {
            "lang": ("en", "en"),
            "warc_ts": (lo, hi + dt.timedelta(seconds=n)),
        }

    results["bounded_scan"] = {
        "indexed_s": best_of(
            trials,
            lambda: table.read(stats_bounds=_bounds(_next())).count(),
        ),
        "full_s": best_of(
            trials,
            lambda: table.read().filter(
                (F.col("lang") == "en")
                & (F.col("warc_ts") >= F.lit(lo))
                & (F.col("warc_ts") <= F.lit(hi + dt.timedelta(seconds=_next())))
            ).count(),
        ),
    }

    langs = ["en", "de", "fr", "es", "pt"]
    results["indexed_lookup"] = {
        "indexed_s": best_of(
            trials, lambda: idx.lookup(langs[_next() % 5]).count()
        ),
        "full_s": best_of(
            trials,
            lambda: table.read().filter(
                F.col("lang") == langs[_next() % 5]
            ).count(),
        ),
    }

    # Conjunctive token search: inverted text index (per-term pruned
    # postings reads + one aggregate) vs re-tokenizing every live doc.
    from data_pipeline_spark.operators.text_index import TextIndex, doc_tokens

    tix = TextIndex(
        spark, table, tempfile.mkdtemp(prefix="lake_ap_t_"), "text", 16
    )
    tix.refresh()
    tix.optimize("ap-tix", target_rows_per_file=4096)
    # One RARE term (a live row's lsn digits — appears as 'rev <lsn>' in
    # exactly that document) conjoined with one common term: the realistic
    # search shape, and the one where postings pruning pays (a common-term-
    # only query legitimately touches most postings files — its result IS
    # large).
    rare = [
        str(r.lsn)
        for r in table.read().select("lsn").orderBy("lsn").limit(3).collect()
    ]
    term_sets = [[rare[0], "lorem"], [rare[1], "user"], [rare[2], "signup"]]

    def _scan_tokens(terms):
        df = table.read(columns=["url", "text"]).select(
            "url", doc_tokens(F.col("text")).alias("__t")
        )
        cond = None
        for t in terms:
            c = F.array_contains("__t", t)
            cond = c if cond is None else (cond & c)
        return df.filter(cond)

    results["token_search"] = {
        "indexed_s": best_of(
            trials,
            lambda: tix.search(
                term_sets[_next() % 3], max_point_keys=4096
            ).count(),
        ),
        "full_s": best_of(
            trials, lambda: _scan_tokens(term_sets[_next() % 3]).count()
        ),
    }

    # COUNT(*): metadata sum over manifest live_rows (zero data IO on
    # the compacted table) vs the full collapsed scan. The fast path's
    # wall is pure driver-side JSON walking — no Spark job at all.
    results["count_star"] = {
        "indexed_s": best_of(trials, lambda: table.count_rows()),
        "full_s": best_of(trials, lambda: table.read().count()),
    }
    assert table.count_rows() == table.read().count()
    assert table.count_rows(with_plan=True)["scanned_buckets"] == []

    # MIN/MAX: manifest-bounds pushdown (agg_bounds — payload columns
    # answer from metadata even with fenced tombstones; here warc_ts is
    # raw-mode so base AND delta stats apply) vs the full scan aggregate.
    results["minmax"] = {
        "indexed_s": best_of(
            trials, lambda: table.agg_bounds("warc_ts", raw=True)
        ),
        "full_s": best_of(
            trials,
            lambda: table.read(raw=True, include_tombstones=True)
            .agg(F.min("warc_ts"), F.max("warc_ts"))
            .first(),
        ),
    }
    from data_pipeline_spark.lake.table import _epoch_us as _eus

    _mm = table.agg_bounds("warc_ts", raw=True, with_plan=True)
    _row = (
        table.read(raw=True, include_tombstones=True)
        .agg(F.min("warc_ts"), F.max("warc_ts"))
        .first()
    )
    assert (_mm["min"], _mm["max"]) == (_eus(_row[0]), _eus(_row[1]))
    assert _mm["scanned_buckets"] == []

    # Equality probes: every fast path must return exactly the naive
    # path's rows (a wrong fast path is worse than a slow one).
    for ts_ in term_sets:
        assert sorted(
            r.url for r in tix.search(ts_, max_point_keys=1 << 20)
            .select("url").collect()
        ) == sorted(r.url for r in _scan_tokens(ts_).select("url").collect())
    ks = pick(3)
    assert (
        table.lookup(ks).count()
        == table.read().filter(F.col("url").isin(ks)).count()
    )
    assert (
        table.read(stats_bounds=_bounds(0)).count()
        == table.read().filter(
            (F.col("lang") == "en")
            & (F.col("warc_ts") >= F.lit(lo))
            & (F.col("warc_ts") <= F.lit(hi))
        ).count()
    )
    assert (
        idx.lookup("de").count()
        == table.read().filter(F.col("lang") == "de").count()
    )

    # Files opened — the scale-invariant measure (wall times at test SF
    # are driver-overhead-dominated; file-skip ratios are what survive a
    # 1000× scale-up).
    snap = table.current()

    def nfiles(**kw):
        groups, _ = table._select_files(snap, **kw)
        return sum(len(fs) for fs in groups.values())

    import data_pipeline_spark.lake.table as lt

    total = nfiles()
    results["point_get"]["files"] = [
        nfiles(point_keys=pick(1)), total
    ]
    results["bounded_scan"]["files"] = [
        nfiles(stats_bounds={
            "lang": ("en", "en"),
            "warc_ts": (lt._epoch_us(lo), lt._epoch_us(hi)),
        }),
        total,
    ]
    isnap = idx.table.current()
    igroups, _ = idx.table._select_files(
        isnap, stats_bounds={"val": ("en", "en")}
    )
    iall, _ = idx.table._select_files(isnap)
    results["indexed_lookup"]["files"] = [
        sum(len(f) for f in igroups.values()),
        sum(len(f) for f in iall.values()),
    ]

    tsnap = tix.table.current()
    tprobe = sum(
        sum(len(f) for f in tix.table._select_files(
            tsnap, stats_bounds={"tok": (t, t)}
        )[0].values())
        for t in term_sets[0]
    )
    tall, _ = tix.table._select_files(tsnap)
    results["token_search"]["files"] = [
        tprobe, sum(len(f) for f in tall.values())
    ]

    for k, v in results.items():
        v["speedup"] = round(v["full_s"] / v["indexed_s"], 2)
    print(json.dumps({
        "metric": "access_path_bench", "sf_dir": sf_dir, "cpus": cpus,
        "trials": trials, "amplify": amplify, "paths": results,
    }))


if __name__ == "__main__":
    main()
