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

# spec value -> aggregate builder over a pre-gated column. 'count' and
# 'last' are handled inline in aggregate_collapse: count needs the
# accumulator-row contribution rule, last needs the order column.
_FOLDS = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": None,
    "last": None,
}


def aggregate_collapse(
    df: DataFrame,
    key: str,
    order: str,
    spec: dict[str, str],
    op_col: str = "op",
    delete_value: str = "delete",
    fold_value: str = "fold",
) -> DataFrame:
    """Fold change events to one current row per live key.

    ``spec`` maps column -> fold ('sum' | 'min' | 'max' | 'count' |
    'last'). Output carries ``key``, ``order`` (latest live event), and
    one folded column per spec entry. A key whose newest event is a
    delete (no later contributions) disappears; contributions at or
    before a key's latest delete are excluded from every fold.

    Rows with ``op == fold_value`` are ACCUMULATOR rows (written by
    compaction's :func:`fold_events`): sum/min/max/last already merge
    distributively over their stored values, and a count column's
    contribution is the stored count itself rather than 1 — so a folded
    base row plus fresh events refolds to exactly the unfolded answer.
    A later delete still resets an accumulator row through the same
    fence (its order predates the fold horizon by construction).
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
        elif fold == "count":
            # An event contributes 1 per non-null value; an accumulator
            # row contributes its stored count (see docstring).
            contrib = F.when(
                F.col(op_col) == fold_value, F.col(c)
            ).otherwise(F.when(F.col(c).isNotNull(), F.lit(1)))
            aggs.append(
                F.coalesce(F.sum(contrib), F.lit(0))
                .cast("bigint")
                .alias(c)
            )
        else:
            aggs.append(_FOLDS[fold](F.col(c)).alias(c))
    return gated.groupBy(key).agg(*aggs)


def fold_events(
    df: DataFrame,
    key: str,
    order: str,
    spec: dict[str, str],
    op_col: str = "op",
    delete_value: str = "delete",
    fold_value: str = "fold",
) -> DataFrame:
    """Fold an aggregate-event frame into accumulator EVENT rows
    (``op == fold_value``) that refold to the same answer — the
    compaction kernel for aggregation-mode tables. Exact as long as
    every later event's order is greater than the fold horizon (the
    caller's watermark contract); a later delete resets the accumulator
    row through the normal fence.
    """
    cur = aggregate_collapse(
        df, key, order, spec,
        op_col=op_col, delete_value=delete_value, fold_value=fold_value,
    )
    return cur.select(
        F.col(key),
        F.col(order),
        F.lit(fold_value).alias(op_col),
        *[F.col(c) for c in spec],
    )
