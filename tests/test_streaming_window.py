"""Streaming windowed aggregation with watermark (§2.12: tumbling windows
+ too-late drop) — streamed results must equal the batch computation."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.streaming.pipeline import wal_stream, write_wal
from tests.conftest import SF_SMOKE


def test_streaming_windowed_counts_equal_batch(spark):
    wal = tempfile.mkdtemp(prefix="wal_w_")
    write_wal(spark, SF_SMOKE, wal, n_files=4)

    stream = (
        wal_stream(spark, wal, max_files_per_trigger=1)
        .withWatermark("warc_ts", "1 day")
        .groupBy(F.window("warc_ts", "6 hours").alias("w"), "op")
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="ckpt_w_")
        )
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.w.start, r.op): r.n
        for r in spark.table("win_counts").collect()
    }
    expect = {
        (r.w.start, r.op): r.n
        for r in cl.changelog(spark, SF_SMOKE)
        .groupBy(F.window("warc_ts", "6 hours").alias("w"), "op")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect and len(got) > 0
