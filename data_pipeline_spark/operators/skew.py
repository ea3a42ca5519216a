"""Hot-key skew mitigation: salting + two-phase collapse.

The reference never needed this — its per-tile Argo mutex serializes each
key and concurrency exists only ACROSS keys (scripts/ingest_v1_s1_rtc.py:43-46).
At 10^10 web events the engine meets real url/domain hot keys, and the
north_star mandates salted repartitioning + AQE skew splitting before the
merge-apply stage.

The engine's merge path is skew-proof by construction — ``lww_collapse``
is a hash AGGREGATE, so a hot url partially collapses on every input
partition before the exchange (map-side combine): the shuffle carries one
row per (input partition, url), never 30% of the batch. Salting is for the
operators that CANNOT partially aggregate:

* ``row_number`` windows (keep-whole-row semantics with arbitrary columns)
* large equi-joins against a skewed key column (AQE skew-join split covers
  sort-merge joins; salting covers cases AQE can't see, e.g. a hot build
  side under a non-AQE plan or aggregation-after-join shapes)

Strategy: phase 1 collapses within (key, salt) — the hot key's rows spread
over ``n_salts`` reducers; phase 2 collapses the ≤``n_salts`` survivors per
key. Deterministic salt (hash of the order column) keeps re-runs identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, order: str = "lsn", n_salts: int = 16) -> DataFrame:
    """Deterministic salt column: pmod(xxhash64(order), n_salts).

    Derived from data (not rand()) so retries and replays salt
    identically — the engine's exactly-once story must hold under salting.
    """
    return df.withColumn("__salt", F.pmod(F.xxhash64(F.col(order)), F.lit(n_salts)))


def last_writer_wins_salted(
    df: DataFrame,
    key: str = "url",
    order: str = "lsn",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant keep-whole-row LWW: two row_number phases.

    Phase 1 partitions by (key, salt) — a hot key's events split across
    ``n_salts`` window groups; phase 2 sees at most ``n_salts`` rows per
    key. Output is identical to ``lww.last_writer_wins`` (order must be
    unique per key).
    """
    w1 = Window.partitionBy(key, "__salt").orderBy(F.col(order).desc())
    w2 = Window.partitionBy(key).orderBy(F.col(order).desc())
    return (
        with_salt(df, order, n_salts)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") == 1)
        .drop("__rn", "__rn2", "__salt")
    )


def key_histogram(df: DataFrame, key: str = "url", top: int = 10) -> DataFrame:
    """Skew diagnostic: per-key counts + share of total, top-N (the
    observability half of skew handling — what you alert on)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.col("n") / F.lit(total))
        .orderBy(F.col("n").desc(), key)
        .limit(top)
    )
