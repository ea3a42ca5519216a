"""Right-to-be-forgotten: physical erasure proven by raw file scan,
fence semantics against late events, purge mode, and root guards."""

import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark.lake.branch import create_branch, delete_branch
from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.maintenance import forget
from data_pipeline_spark.pipeline import ensure_table


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string"
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), "lang", "op",
    )


def _mk(spark):
    t = ensure_table(spark, tempfile.mkdtemp(prefix="fg_"), 4)
    merge_into(t, _batch(spark, [
        (f"u{i}", i + 1, "2024-01-01 00:00:00", f"<body>secret{i}</body>".encode(),
         "en", "insert")
        for i in range(12)
    ]), "m0")
    return t


def test_forget_erases_payload_and_proves_it(spark):
    t = _mk(spark)
    rep = forget(t, ["u3", "u7"], "fg-0")
    assert rep["leftover_rows"] == 0 and rep["fence_kept"]
    # survivors intact, forgotten keys gone from reads
    assert t.read().count() == 10
    assert t.read().filter(F.col("url").isin("u3", "u7")).count() == 0
    # and NO live physical byte anywhere carries the secret payload
    raw = t.read(include_tombstones=True, raw=True)
    assert raw.filter(
        F.col("url").isin("u3", "u7") & F.col("html").isNotNull()
    ).count() == 0


def test_fence_blocks_late_event_below_watermark(spark):
    t = _mk(spark)
    forget(t, ["u3"], "fg-0")
    # a LATE event (lsn below the delete fence) must not resurrect
    merge_into(t, _batch(spark, [
        ("u3", 2, "2024-01-01 01:00:00", b"<body>old</body>", "en", "update"),
    ]), "late-0")
    assert t.read().filter(F.col("url") == "u3").count() == 0
    # a genuinely NEW event may re-insert (new data, not erased data)
    merge_into(t, _batch(spark, [
        ("u3", 10**6, "2024-02-01 00:00:00", b"<body>new</body>", "en", "insert"),
    ]), "new-0")
    assert t.read().filter(F.col("url") == "u3").count() == 1


def test_purge_mode_removes_even_the_key(spark):
    t = _mk(spark)
    forget(t, ["u5"], "fg-0", keep_fence=False)
    raw = t.read(include_tombstones=True, raw=True)
    assert raw.filter(F.col("url") == "u5").count() == 0


def test_refuses_with_live_roots(spark):
    t = _mk(spark)
    create_branch(t, "wip")
    with pytest.raises(RuntimeError, match="branches"):
        forget(t, ["u1"], "fg-0")
    delete_branch(t, "wip")
    assert forget(t, ["u1"], "fg-1")["leftover_rows"] == 0


def test_forget_refuses_while_tags_retain_history(spark):
    """expire_snapshots deliberately keeps tagged versions (and vacuum
    keeps their files), so a tag would let pre-delete payload survive on
    disk while the current-snapshot verification reports success — a
    falsely-passing erasure audit. forget() must refuse until the tag is
    dropped, then succeed with real physical erasure."""
    t = _mk(spark)
    t.tag("audit-anchor")
    with pytest.raises(RuntimeError, match="tags retain data"):
        forget(t, ["u3"], "fg-tagged")
    # the refused run must not have mutated anything
    assert t.read().filter(F.col("url") == "u3").count() == 1
    t.untag("audit-anchor")
    rep = forget(t, ["u3"], "fg-after-untag")
    assert rep["leftover_rows"] == 0
    raw = t.read(include_tombstones=True, raw=True)
    assert raw.filter(
        (F.col("url") == "u3") & F.col("html").isNotNull()
    ).count() == 0
