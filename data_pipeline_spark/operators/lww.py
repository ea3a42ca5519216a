"""Last-writer-wins collapse — the CDC heart.

Reference behavior: group change events by key, keep one representative per
key by timestamp order (scripts/trigger_cdse.py:123-141 keeps the earliest
frame per (date, platform); the ingest dedup keeps *new* time-slices only,
scripts/ingest_v1_s1_rtc.py:110-127). For a WAL tail the right collapse is
**max-LSN wins**: within any batch of change events, only the latest change
per url matters before merging into the table.

Spark shape: one shuffle on the key. Two physical strategies:

* ``row_number`` window (general: keeps the whole winning row)
* ``max_by`` aggregation (map-side partial aggregation → less shuffle IO
  when the payload is small relative to the group size)

Both produce identical results; ``last_writer_wins`` picks the window form
because the payload (html) is wide and max_by on a big struct spills the
same bytes anyway; AQE's skew handling applies to the window shuffle too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_writer_wins(
    df: DataFrame,
    key: str = "url",
    order: str = "lsn",
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep the single highest-``order`` row per ``key``.

    ``order`` must be unique per key for deterministic output (the change
    log's LSN is globally unique). ``tiebreak`` adds a secondary column for
    logs where it is not.
    """
    cols = [F.col(order).desc()]
    if tiebreak:
        cols.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_sql(key: str = "url", order: str = "lsn") -> str:
    """DuckDB/ANSI spelling of the same collapse, for oracle queries."""
    return (
        f"SELECT * EXCLUDE (__rn) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {key} ORDER BY {order} DESC) AS __rn "
        f"FROM changelog) WHERE __rn = 1"
    )
