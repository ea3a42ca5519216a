"""Debezium-envelope codec: lossless round-trip, delete image placement,
corrupt-record gating. (Cross-engine value parity is pinned by the
registry entry ``cdc_envelope_roundtrip`` in test_oracle_parity.)"""

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.operators.envelope import (
    decode_envelope,
    encode_envelope,
    envelope_corrupt,
)
from tests.conftest import SF_SMOKE


def _roundtrip(spark):
    log = cl.changelog(spark, SF_SMOKE)
    return log, decode_envelope(encode_envelope(log))


def test_roundtrip_is_lossless(spark):
    log, back = _roundtrip(spark)
    key = ["url", "lsn", "op", "lang"]
    a = log.select(*key, F.sha2("html", 256).alias("h"),
                   F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("us"))
    b = back.select(*key, F.sha2("html", 256).alias("h"),
                    F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("us"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_delete_row_image_travels_in_before(spark):
    log = cl.changelog(spark, SF_SMOKE)
    feed = encode_envelope(log)
    e = F.from_json("value", (
        "before struct<url:string>, after struct<url:string>, op string"
    ))
    counts = {
        r["k"]: r["n"]
        for r in feed.select(
            F.concat_ws(
                "/",
                e["op"],
                F.when(e["before"].isNotNull(), "B").otherwise("-"),
                F.when(e["after"].isNotNull(), "A").otherwise("-"),
            ).alias("k")
        ).groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    # deletes: image in before only; upserts: after only
    assert set(counts) == {"d/B/-", "c/-/A", "u/-/A"}


def test_corrupt_records_are_gated_not_decoded(spark):
    good = encode_envelope(cl.changelog(spark, SF_SMOKE).limit(5))
    bad = spark.createDataFrame(
        [("not json at all",), ('{"op":"u","ts_us":1}',)], "value string"
    )
    feed = good.unionByName(bad)
    n_bad = feed.filter(envelope_corrupt(feed)).count()
    assert n_bad == 2
    clean = feed.filter(~envelope_corrupt(feed))
    decoded = decode_envelope(clean)
    assert decoded.count() == 5
    assert decoded.filter(F.col("url").isNull()).count() == 0
