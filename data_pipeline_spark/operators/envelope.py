"""Debezium-style CDC envelope codec (source-connector surface).

A production deployment of this engine tails a Kafka topic written by a
log-based CDC connector (Debezium / DMS style): each record is a JSON
envelope ``{before, after, op, ts_us, lsn}`` and the engine must decode it
into the typed WAL row the apply path consumes. The reference's analog is
the STAC-item JSON the watcher fetches and normalizes per item
(reference: scripts/query_stac.py:152-182, scripts/ingest_v1_s1_rtc.py:98-127);
Spark-first shape: one ``from_json`` projection — JVM-side, vectorized, no
Python — that Catalyst prunes like any other column expression.

Envelope conventions follow Debezium:

* ``op``: ``c`` (create) / ``u`` (update) / ``d`` (delete); decode also
  accepts ``r`` (snapshot read) as an insert.
* deletes carry the row image in ``before`` with ``after = null``; upserts
  carry ``after``.
* event time is ``ts_us`` — microseconds since epoch (Debezium
  ``io.debezium.time.MicroTimestamp``; millis would silently truncate the
  feed's microsecond timestamps).
* binary payloads (html) travel base64-encoded, as JSON requires.

``encode_envelope`` exists so tests/benchmarks can synthesize a
deterministic feed from the synthetic changelog; the correctness contract
is the lossless round-trip (``cdc_envelope_roundtrip`` in the registry,
whose DuckDB oracle projects the changelog directly — any loss or drift in
either codec direction breaks the value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The JSON payload schema, as a DDL string (used by from_json; a wrong or
# missing field decodes as NULL — callers can gate on envelope_corrupt()).
ENVELOPE_SCHEMA = (
    "before struct<url:string, ts_us:bigint, html:string, lang:string>, "
    "after  struct<url:string, ts_us:bigint, html:string, lang:string>, "
    "op string, ts_us bigint, lsn bigint"
)

_OP_ENCODE = {"insert": "c", "update": "u", "delete": "d"}


def _ts_us() -> F.Column:
    # warc_ts is TIMESTAMP_NTZ in the WAL; unix_micros needs TIMESTAMP.
    # The session timezone is pinned UTC (changelog() does it), so the
    # NTZ→LTZ cast here and the reverse cast in decode are exact inverses.
    return F.unix_micros(F.col("warc_ts").cast("timestamp"))


def _row_image() -> F.Column:
    return F.struct(
        F.col("url"),
        _ts_us().alias("ts_us"),
        F.base64("html").alias("html"),
        F.col("lang"),
    )


def encode_envelope(changelog: DataFrame, value_col: str = "value") -> DataFrame:
    """WAL rows → one JSON-string column (the Kafka record value shape).

    Deletes put the row image in ``before``; inserts/updates in ``after``
    (Debezium semantics). Pure ``to_json`` — no shuffle, no UDF.
    """
    op_code = (
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    row = _row_image()
    null_row = F.lit(None).cast(
        "struct<url:string, ts_us:bigint, html:string, lang:string>"
    )
    envelope = F.struct(
        F.when(F.col("op") == "delete", row).otherwise(null_row).alias("before"),
        F.when(F.col("op") != "delete", row).otherwise(null_row).alias("after"),
        op_code.alias("op"),
        _ts_us().alias("ts_us"),
        F.col("lsn"),
    )
    return changelog.select(F.to_json(envelope).alias(value_col))


def decode_envelope(feed: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON envelope strings → typed WAL rows (url, lsn, warc_ts, op, html,
    lang).

    ``c``/``r`` → insert, ``u`` → update, ``d`` → delete; the row image is
    ``after`` for upserts, ``before`` for deletes. One JVM-side projection;
    Catalyst prunes unaccessed envelope fields out of the JSON parse
    (from_json field pruning), so a consumer that only needs (url, lsn)
    never materializes the base64 payload.
    """
    e = F.from_json(F.col(value_col), ENVELOPE_SCHEMA)
    img = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    return feed.select(
        img["url"].alias("url"),
        e["lsn"].alias("lsn"),
        F.timestamp_micros(e["ts_us"]).cast("timestamp_ntz").alias("warc_ts"),
        F.when(e["op"].isin("c", "r"), F.lit("insert"))
        .when(e["op"] == "d", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.unbase64(img["html"]).alias("html"),
        img["lang"].alias("lang"),
    )


def envelope_corrupt(feed: DataFrame, value_col: str = "value") -> F.Column:
    """Predicate: the record failed to parse or lacks the required fields
    (key + order). Route these to a dead-letter sink instead of the merge
    (the quality-gate pattern, maintenance.quality_gate)."""
    e = F.from_json(F.col(value_col), ENVELOPE_SCHEMA)
    img = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    return e.isNull() | e["lsn"].isNull() | img["url"].isNull()
