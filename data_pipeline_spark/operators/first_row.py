"""First-row merge mode: the current row per key is the FIRST event ever
seen for it — later events are ignored.

This is the merge engine Paimon calls first-row: it turns an append
stream with re-deliveries and re-crawls into a deduplicated
first-occurrence table (level-0 dedup for log→lake pipelines where the
first observation is authoritative — e.g. first-seen crawl of a url).
Like the first-row engine upstream, deletes and retractions do not
participate: the mode is defined over inserts only, which is what makes
it expressible as ONE hash aggregate with map-side combine (min_by of
the whole payload over the order column) — the exact mirror of the LWW
collapse's max_by (lake/merge.py lww_collapse).

Determinism: rows tied on the order column resolve by MIN xxhash64 row
fingerprint (same stance as the LWW path, opposite extremum), so every
run converges on the same row regardless of partitioning or retries.

Reference analog: the ingest path skips items that already exist rather
than re-registering them (scripts/run_ingest_register.py checks the
catalog before convert) — first-row is that skip expressed as a merge
engine instead of a driver-side existence probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_row_collapse(
    df: DataFrame,
    key: str,
    order: str,
    op_col: str = "op",
    insert_value: str = "insert",
) -> DataFrame:
    """Collapse an event frame to the first insert per key.

    Output carries every input column (minus ``op_col``) at the values
    of the key's earliest insert event; keys with no insert event
    disappear.
    """
    ev = df.filter(F.col(op_col) == insert_value).drop(op_col)
    others = [c for c in ev.columns if c != key]
    tiebreak = F.struct(
        F.col(order).alias("o"),
        F.xxhash64(*[F.col(c) for c in others]).alias("f"),
    )
    packed = ev.groupBy(key).agg(
        F.min_by(F.struct(*others), tiebreak).alias("__w")
    )
    return packed.select(
        key, *[F.col(f"__w.{c}").alias(c) for c in others]
    )
