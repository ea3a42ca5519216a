"""Plan-shape pins for the merge modes (operators/partial_update.py,
operators/agg_merge.py): the 100 TB properties are structural — ONE
shuffle of the event rows, map-side partial aggregation before it, and
a broadcast (never shuffle) fence join — and must not regress when
someone 'simplifies' the collapse into joins or windows."""

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.agg_merge import aggregate_collapse
from data_pipeline_spark.operators.partial_update import partial_update_collapse
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _patch_feed(spark):
    log = cl.changelog(spark, SF_SMOKE)
    is_upd = F.col("op") == "update"
    return log.select(
        "url", "lsn", "op",
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 0)),
               F.col("html")).alias("html"),
        F.when((F.col("op") == "insert") | (is_upd & (F.col("lsn") % 3 != 1)),
               F.col("lang")).alias("lang"),
    )


def test_partial_update_is_one_exchange_with_map_side_combine(spark):
    out = partial_update_collapse(
        _patch_feed(spark), "url", "lsn", ["html", "lang"]
    )
    plan = _plan(out)
    # exactly one shuffle: the groupBy(key) hash aggregate — no join
    # cascade, no window sort-exchange per column ("Exchange (" counts
    # tree nodes once; the detail section spells it "(n) Exchange")
    assert plan.count("Exchange (") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan
    # partial aggregation runs BEFORE the exchange (hot keys cannot skew
    # the shuffle: each input partition ships at most one row per key)
    assert "partial_max_by" in plan, plan


def test_first_row_is_one_exchange_with_map_side_combine(spark):
    from data_pipeline_spark.operators.first_row import first_row_collapse

    out = first_row_collapse(cl.changelog(spark, SF_SMOKE), "url", "lsn")
    plan = _plan(out)
    # the mirror of the LWW collapse: ONE shuffle (groupBy hash agg),
    # no window sort, no join; min_by partials combine map-side so a
    # redelivery-heavy hot key ships one row per input partition
    assert plan.count("Exchange (") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan
    assert "partial_min_by" in plan, plan


def test_agg_merge_fence_broadcasts_and_folds_once(spark):
    log = cl.changelog(spark, SF_SMOKE)
    ev = log.select(
        "url", "lsn", "op",
        F.octet_length("html").alias("nbytes"), "lang",
        F.col("lsn").alias("n_events"),
    )
    out = aggregate_collapse(
        ev, "url", "lsn",
        {"nbytes": "sum", "n_events": "count", "lang": "last"},
    )
    plan = _plan(out)
    # the reset-fence join must be broadcast: the event side never
    # shuffles for it (keys-with-deletes is the small side by design)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the fold itself is one hash-partitioned exchange with map-side
    # partials (partial_sum / partial_count before the shuffle)
    assert "partial_sum" in plan or "partial sum" in plan.lower(), plan
