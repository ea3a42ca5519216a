"""Property-based tests (Hypothesis): for ANY small change log and ANY
batch split, the engine's final state equals a pure-Python LWW oracle.

The reference has no property tests (SURVEY §5); this guards the merge
semantics against edge shapes hand-written fixtures miss: repeated lsns
across urls, delete-only urls, single-event logs, all-duplicate batches.
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_spark.pipeline import apply_batch, ensure_table

URLS = [f"u{i}" for i in range(6)]
OPS = ["insert", "update", "delete"]


@st.composite
def change_logs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    lsns = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    events = []
    for lsn in lsns:
        events.append(
            (
                draw(st.sampled_from(URLS)),
                lsn,
                draw(st.sampled_from(OPS)),
                draw(st.integers(min_value=0, max_value=99)),
            )
        )
    split = draw(st.integers(min_value=0, max_value=n))
    order_flip = draw(st.booleans())
    return events, split, order_flip


def python_oracle(events):
    """Pure-Python LWW: max-lsn event per url; deletes drop the key."""
    best = {}
    for url, lsn, op, payload in events:
        if url not in best or lsn > best[url][0]:
            best[url] = (lsn, op, payload)
    return {
        url: (lsn, f"p{payload}")
        for url, (lsn, op, payload) in best.items()
        if op != "delete"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(change_logs())
def test_any_log_any_split_matches_python_oracle(spark, case):
    events, split, order_flip = case
    rows = [
        (url, lsn, "2025-01-01 00:00:00", op, f"<p>p{payload}</p>".encode(), "en")
        for url, lsn, op, payload in events
    ]
    df = spark.createDataFrame(
        rows,
        "url string, lsn bigint, warc_ts string, op string, html binary, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    ordered = sorted(events, key=lambda e: e[1])
    cut = ordered[split - 1][1] if 0 < split <= len(ordered) else -1
    parts = [df.filter(F.col("lsn") <= cut), df.filter(F.col("lsn") > cut)]
    if order_flip:
        parts.reverse()

    t = ensure_table(spark, tempfile.mkdtemp(prefix="prop_"), 4)
    for i, part in enumerate(parts):
        apply_batch(t, part, f"b{i}", record_metrics=False)

    got = {
        r.url: (r.lsn, r.text)
        for r in t.read().select("url", "lsn", "text").collect()
    }
    assert got == python_oracle(events)
