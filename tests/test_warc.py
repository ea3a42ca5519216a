"""WARC codec (operators/warc.py): byte-exact round trip of the change
feed through standard WARC segments, and malformed-record handling."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.warc import (
    parse_warc_segments,
    render_warc_segments,
    warc_date_to_ts,
)
from tests.conftest import SF_SMOKE


def _roundtrip(spark, n_segments=8, strict=True):
    log = cl.changelog(spark, SF_SMOKE)
    segs = render_warc_segments(log, n_segments=n_segments)
    parsed = parse_warc_segments(segs, strict=strict).withColumn(
        "warc_ts", warc_date_to_ts()
    )
    return log, parsed


def test_roundtrip_is_exact(spark):
    log, parsed = _roundtrip(spark)
    cols = ["url", "lsn", "warc_ts", "op", "lang", "html"]
    want = sorted(map(tuple, log.select(*cols).collect()))
    got = sorted(map(tuple, parsed.select(*cols).collect()))
    assert got == want  # byte-exact: html bytes, microsecond timestamps


def test_segment_assignment_and_order(spark):
    log, parsed = _roundtrip(spark, n_segments=4)
    # records land in lsn % n_segments, in lsn order within the blob
    bad = parsed.filter(F.pmod("lsn", F.lit(4)) != F.col("segment_id"))
    assert bad.count() == 0
    assert parsed.count() == log.count()


def test_render_is_deterministic(spark):
    log = cl.changelog(spark, SF_SMOKE)
    a = {r["segment_id"]: bytes(r["blob"])
         for r in render_warc_segments(log).collect()}
    b = {r["segment_id"]: bytes(r["blob"])
         for r in render_warc_segments(log).collect()}
    assert a == b


def test_file_writer_matches_dataframe_render_bytes(spark):
    """The streaming file writer (O(batch) memory) lands byte-identical
    segments to the DataFrame render (O(segment) memory)."""
    import os
    import tempfile

    from data_pipeline_spark.streaming.pipeline import write_warc_wal

    wal = tempfile.mkdtemp(prefix="warcbytes_")
    assert write_warc_wal(spark, SF_SMOKE, wal, n_files=4) == 4
    log = cl.changelog(spark, SF_SMOKE)
    blobs = {
        int(r["segment_id"]): bytes(r["blob"])
        for r in render_warc_segments(log, n_segments=4).collect()
    }
    for sid, blob in blobs.items():
        with open(os.path.join(wal, f"seg-{sid:05d}.warc"), "rb") as f:
            assert f.read() == blob


def test_truncated_record_strict_raises_lax_keeps_prefix(spark):
    log = cl.changelog(spark, SF_SMOKE).limit(20)
    segs = render_warc_segments(log, n_segments=1)
    blob = bytes(segs.collect()[0]["blob"])
    cut = spark.createDataFrame(
        [(0, blob[: len(blob) - 6])], "segment_id bigint, blob binary"
    )
    with pytest.raises(Exception, match="truncated"):
        parse_warc_segments(cut, strict=True).count()
    # lax mode: every record except the torn tail survives
    assert parse_warc_segments(cut, strict=False).count() == 19


def test_file_walker_roundtrip_and_truncation(spark):
    """parse_warc_files (the O(chunk)-memory streaming walker) matches
    the in-memory segment walk exactly, including torn-tail handling."""
    import os
    import tempfile

    from data_pipeline_spark.operators.warc import parse_warc_files
    from data_pipeline_spark.streaming.pipeline import write_warc_wal

    wal = tempfile.mkdtemp(prefix="warcfiles_")
    write_warc_wal(spark, SF_SMOKE, wal, n_files=4)
    paths = spark.createDataFrame(
        [(os.path.join(wal, f),) for f in sorted(os.listdir(wal))],
        "wal_path string",
    )
    got = parse_warc_files(paths).withColumn("warc_ts", warc_date_to_ts())
    log = cl.changelog(spark, SF_SMOKE)
    cols = ["url", "lsn", "warc_ts", "op", "lang", "html"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, log.select(*cols).collect())
    )
    # tear one file's tail: strict raises, lax keeps its valid prefix
    victim = os.path.join(wal, sorted(os.listdir(wal))[0])
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[:-6])
    one = spark.createDataFrame([(victim,)], "wal_path string")
    with pytest.raises(Exception, match="truncated"):
        parse_warc_files(one, strict=True).count()
    n_victim_records = data.count(b"WARC/1.0")
    assert parse_warc_files(one, strict=False).count() == n_victim_records - 1


def test_file_walker_small_chunks(spark):
    """The buffered walk is chunk-size independent (records spanning
    refill boundaries reassemble exactly)."""
    import io
    import os
    import tempfile

    from data_pipeline_spark.operators.warc import _walk_file
    from data_pipeline_spark.streaming.pipeline import write_warc_wal

    wal = tempfile.mkdtemp(prefix="warcchunk_")
    write_warc_wal(spark, SF_SMOKE, wal, n_files=1)
    path = os.path.join(wal, sorted(os.listdir(wal))[0])
    data = open(path, "rb").read()
    big = list(_walk_file("x", io.BytesIO(data), True, chunk=1 << 20))
    tiny = list(_walk_file("x", io.BytesIO(data), True, chunk=7))
    assert big == tiny and len(big) == data.count(b"WARC/1.0")


def test_garbage_segment_strict_raises(spark):
    junk = spark.createDataFrame(
        [(0, b"HTTP/1.1 200 OK\r\n\r\nnot a warc")],
        "segment_id bigint, blob binary",
    )
    with pytest.raises(Exception, match="bad version"):
        parse_warc_segments(junk, strict=True).count()
    assert parse_warc_segments(junk, strict=False).count() == 0
