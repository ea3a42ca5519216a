"""Driver-style Spark-vs-DuckDB comparison: row count + sorted column names
+ order-insensitive value multiset."""

from __future__ import annotations

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> dict:
    sp_cols = list(spark_df.columns)
    sp_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle)
    dk_cols = [d[0] for d in cur.description]
    dk_rows = cur.fetchall()
    res = {
        "spark_rows": len(sp_rows),
        "duck_rows": len(dk_rows),
        "cols_match": sorted(sp_cols) == sorted(dk_cols),
        "spark_cols": sorted(sp_cols),
        "duck_cols": sorted(dk_cols),
    }
    res["count_match"] = res["spark_rows"] == res["duck_rows"]
    if res["cols_match"] and res["count_match"]:
        a = rows_multiset(sp_cols, sp_rows)
        b = rows_multiset(dk_cols, dk_rows)
        res["values_match"] = a == b
        if not res["values_match"]:
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            res["sample_spark_only"] = diff_a
            res["sample_duck_only"] = diff_b
    else:
        res["values_match"] = False
    res["ok"] = res["cols_match"] and res["count_match"] and res["values_match"]
    return res
