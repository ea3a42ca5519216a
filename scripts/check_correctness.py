"""Driver-style correctness sweep: run every ``queries()`` entry on Spark
and its ``oracle_sql()`` twin in DuckDB over the same parquet, compare row
count, sorted column names, and an order-insensitive value multiset —
the same three axes the round driver records in CORRECTNESS_r{N}.json.

Usage:
    python scripts/check_correctness.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--parallelism 16]

Exit code 0 iff every oracle-backed entry matches on all three axes
(rows-only entries count as pass when the Spark query runs and returns
a stable schema).
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# Entries allowed to return 0 rows under --assert-nonvacuous (audited:
# empty IS the asserted answer, not an accidentally vacuous predicate).
# Keep this list justified — an unexplained name here defeats the gate.
_VACUOUS_OK: dict[str, str] = {}


def _norm(v):
    """Engine-independent canonical string for a cell value."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return str(int(f)) if f == int(f) else repr(f)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _multiset(rows, names, order):
    idx = [names.index(c) for c in order]
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--parallelism", type=int, default=16)
    ap.add_argument(
        "--assert-nonvacuous",
        action="store_true",
        help="fail any entry whose Spark result has 0 rows at this sf "
        "(VERDICT r4 #7: r2/r3 each caught one predicate gone vacuous "
        "at some scale — a 0-row result matching a 0-row oracle is a "
        "hash PASS that verifies nothing). Entries that legitimately "
        "return 0 rows at an sf must be listed in _VACUOUS_OK.",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from data_pipeline_spark.session import get_spark

    spark = get_spark(parallelism=args.parallelism)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.monotonic()
        rec: dict = {"err": None}
        try:
            df = qs[name](spark, args.sf_dir)
            sp_names = list(df.columns)
            sp_rows = df.collect()
            rec["spark_rows"] = len(sp_rows)
            osql = oracles.get(name)
            if osql is None:
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
                rec["note"] = "no_oracle (rows-only)"
            else:
                cur = con.execute(osql)
                dk_names = [d[0] for d in cur.description]
                dk_rows = cur.fetchall()
                rec["oracle_rows"] = len(dk_rows)
                order = sorted(sp_names)
                rec["rows_match"] = len(sp_rows) == len(dk_rows)
                rec["schema_match"] = order == sorted(dk_names)
                rec["hash_match"] = (
                    rec["schema_match"]
                    and _multiset(sp_rows, sp_names, order)
                    == _multiset(dk_rows, dk_names, order)
                )
                if not (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rec["hash_match"]
                ):
                    n_fail += 1
            if (
                args.assert_nonvacuous
                and len(sp_rows) == 0
                and name not in _VACUOUS_OK
            ):
                rec["err"] = (
                    "vacuous: 0 Spark rows at this sf (gate "
                    "--assert-nonvacuous; add to _VACUOUS_OK with a "
                    "justification if empty is the asserted answer)"
                )
                n_fail += 1
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            rec["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
            n_fail += 1
        rec["sec"] = round(time.monotonic() - t0, 2)
        results[name] = rec
        ok = rec["err"] is None and rec.get("hash_match") in (True, None)
        print(
            f"{'PASS' if ok else 'FAIL'} {name} "
            f"rows={rec.get('spark_rows')} {rec['sec']}s",
            flush=True,
        )

    print(json.dumps({"n": len(names), "fail": n_fail}))
    with open("/tmp/correctness_sweep.json", "w") as f:
        json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
