"""Golden before/after fixtures (FIXTURES.md B5; reference style:
tests/fixtures/update_storage_tier before→after pairs).

Each case is a hand-written change log + the expected final table state.
Every case is replayed TWO ways — one batch, and split into two batches at
the lsn midpoint — and both must produce the golden state (order-
independence is part of the contract)."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.pipeline import apply_batch, ensure_table

CASES = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "cases.json"))
)


def _events_df(spark, events):
    rows = [
        (
            e["url"],
            e["lsn"],
            e["warc_ts"].replace("T", " "),
            e["op"],
            e["html"].encode(),
            e["lang"],
        )
        for e in events
    ]
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, op string, html binary, lang string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _final(table):
    return sorted(
        (r.url, r.lsn, r.text, r.lang)
        for r in table.read().select("url", "lsn", "text", "lang").collect()
    )


def _golden(case):
    return sorted(
        (g["url"], g["lsn"], g["text"], g["lang"]) for g in case["final"]
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_one_batch(spark, name):
    case = CASES[name]
    t = ensure_table(spark, tempfile.mkdtemp(prefix=f"g1_{name}_"), 4)
    apply_batch(t, _events_df(spark, case["events"]), "b0", record_metrics=False)
    assert _final(t) == _golden(case), case["doc"]


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_two_batches_any_split(spark, name):
    case = CASES[name]
    df = _events_df(spark, case["events"])
    lsns = sorted(e["lsn"] for e in case["events"])
    mid = lsns[len(lsns) // 2]
    t = ensure_table(spark, tempfile.mkdtemp(prefix=f"g2_{name}_"), 4)
    # later half FIRST: out-of-order delivery must converge identically
    apply_batch(t, df.filter(F.col("lsn") >= mid), "b1", record_metrics=False)
    apply_batch(t, df.filter(F.col("lsn") < mid), "b0", record_metrics=False)
    assert _final(t) == _golden(case), case["doc"]
