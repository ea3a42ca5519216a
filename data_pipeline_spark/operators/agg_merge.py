"""Aggregation merge mode: the current row per key is a FOLD of its
change events (sum / min / max / count / last-non-null per column), with
deletes resetting the accumulator.

The shape this serves is metric-accumulator tables — per-url click
counters, byte totals, last-seen timestamps — where the feed ships
increments and the table's "current row" is the running aggregate, the
merge engine Paimon calls aggregation and ClickHouse calls
AggregatingMergeTree. Folding at READ time keeps writes O(batch) deltas
(same merge-on-read economics as the LWW path); compaction of such a
table must fold through this collapse, not the whole-row LWW one.

Like operators/partial_update.py this is ONE hash aggregate over the
event rows — a single shuffle of (key, numeric columns), map-side
combined, no join cascade — and the delete-reset uses the same fence
construction: an aggregate contribution counts only if its event is
newer than the key's last delete. Because sum/min/max/count need the
fence BEFORE they fold (a fold, unlike max_by, cannot un-mix pre-fence
rows afterwards), the fence join runs first: a broadcast-sized frame of
keys-with-deletes (deletes are rare in metric feeds) anti-gates the
event rows; keys with no delete skip the join entirely via the
broadcast null-pass.

Reference analog: aggregate_items.py:121-199 recomputes whole aggregate
documents per batch; here increments fold distributively, which is what
makes a 10^10-event counter table writable at O(batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)

# spec value -> aggregate builder over a pre-gated column
_FOLDS = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": lambda c: F.count(c),
    "last": None,  # handled via max_by (needs the order column)
}


def aggregate_collapse(
    df: DataFrame,
    key: str,
    order: str,
    spec: dict[str, str],
    op_col: str = "op",
    delete_value: str = "delete",
) -> DataFrame:
    """Fold change events to one current row per live key.

    ``spec`` maps column -> fold ('sum' | 'min' | 'max' | 'count' |
    'last'). Output carries ``key``, ``order`` (latest live event), and
    one folded column per spec entry. A key whose newest event is a
    delete (no later contributions) disappears; contributions at or
    before a key's latest delete are excluded from every fold.
    """
    bad = [f for f in spec.values() if f not in _FOLDS]
    if bad:
        raise ValueError(f"unknown fold(s) {bad}; pick from {sorted(_FOLDS)}")
    deleted = F.col(op_col) == delete_value

    # Reset fences: one tiny row per key that EVER saw a delete. Metric
    # feeds delete rarely, so this frame is broadcast-sized; the left
    # join costs no shuffle on the event side.
    fences = (
        df.filter(deleted)
        .groupBy(key)
        .agg(F.max(order).alias("__tdel"))
    )
    gated = (
        df.join(F.broadcast(fences), key, "left")
        .withColumn(
            "__tdel", F.coalesce(F.col("__tdel"), F.lit(_NEG_INF).cast("bigint"))
        )
        .filter(~deleted & (F.col(order) > F.col("__tdel")))
    )

    aggs = [F.max(F.col(order)).alias(order)]
    for c, fold in spec.items():
        if fold == "last":
            aggs.append(
                F.max_by(
                    F.col(c),
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(
                            F.col(order).alias("o"),
                            F.xxhash64(c).alias("f"),
                        ),
                    ),
                ).alias(c)
            )
        else:
            aggs.append(_FOLDS[fold](F.col(c)).alias(c))
    return gated.groupBy(key).agg(*aggs)
