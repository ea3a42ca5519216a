"""Changelog producer for merge-mode tables: the retract-stream diff of
two COLLAPSED states.

Append merge-mode tables (partial-update / aggregation / first-row)
store raw events; their readable state only exists after the mode's
collapse, so LakeTable.changelog_rows — which diffs LWW row images —
does not apply. This operator closes the loop for downstream consumers:
feed it the collapsed state at two versions (or two horizons) and it
emits the Flink-style retract stream with
``op ∈ {insert, delete, update_preimage, update_postimage}`` — ±1
weighting keeps any distributive aggregate incrementally maintainable,
the same contract matview.py consumes from LWW tables. This is what
Paimon's changelog-producer=lookup computes for its merge engines: the
merged before/after rows, not the raw events.

Plan shape: ONE full-outer shuffle on the key (both sides are already
one-row-per-key collapses), field-wise null-safe change classification
(patch tables legitimately carry NULL columns), and the pre/postimage
pair materialized by an array explode — no window, no second exchange.

Reference analog: downstream aggregation recomputes summaries from full
catalog state (scripts/aggregate_items.py:42-77); a merged change feed
is what lets such consumers advance by O(delta) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collapsed_changelog(
    before: DataFrame, after: DataFrame, key: str
) -> DataFrame:
    """Retract-stream changelog between two collapsed states.

    ``before`` and ``after`` must be one-row-per-key frames with the
    same columns (the output of the table's merge-mode collapse at two
    versions). Output: one ``insert``/``delete`` row, or an
    ``update_preimage``/``update_postimage`` pair, per key whose image
    changed; unchanged keys emit nothing.
    """
    payload = [c for c in after.columns if c != key]
    if [c for c in before.columns if c != key] != payload:
        raise ValueError("before/after must share one schema")
    o = before.select(F.col(key), F.struct(*payload).alias("__o"))
    n = after.select(F.col(key), F.struct(*payload).alias("__n"))
    j = o.join(n, key, "full_outer")
    o_live = F.col("__o").isNotNull()
    n_live = F.col("__n").isNotNull()
    # Spark struct equality is row-like: NULL fields compare equal when
    # both NULL — exactly the per-column IS DISTINCT FROM semantics a
    # patch table needs (NULL columns are normal state, not unknowns).
    changed = j.filter(
        ~(o_live & n_live & (F.col("__o") == F.col("__n")))
    )
    is_ins = ~o_live & n_live
    is_del = o_live & ~n_live
    is_upd = o_live & n_live

    def image(side: str, op: str) -> F.Column:
        return F.struct(
            F.lit(op).alias("op"),
            *[F.col(side).getField(c).alias(c) for c in payload],
        )

    rows = changed.select(
        F.col(key),
        F.explode(
            F.array_compact(
                F.array(
                    F.when(is_ins, image("__n", "insert")),
                    F.when(is_del, image("__o", "delete")),
                    F.when(is_upd, image("__o", "update_preimage")),
                    F.when(is_upd, image("__n", "update_postimage")),
                )
            )
        ).alias("__r"),
    )
    return rows.select(
        F.col(key),
        F.col("__r.op").alias("op"),
        *[F.col(f"__r.{c}").alias(c) for c in payload],
    )
