"""Deterministic synthetic change log (WAL/binlog analog).

The reference tails a remote STAC catalog for "items updated in window"
(reference: scripts/query_stac.py:152-182, scripts/watch_cdse_and_process.py:95-117)
— a polled change feed of keyed documents. This engine's change feed is a
table of Common-Crawl-style web-page change events:

    (url string, lsn bigint, warc_ts timestamp, op string,
     html binary, lang string)

* ``url``     — the record key (reference analog: STAC item id / cube key)
* ``lsn``     — monotonic log sequence number; the LWW ordering column
                (reference analog: ns-since-epoch dedup key,
                scripts/ingest_v1_s1_rtc.py:98-107)
* ``warc_ts`` — event time (reference: item ``updated`` timestamp)
* ``op``      — insert | update | delete
* ``html``    — the heavy payload (reference analog: Zarr/GeoTIFF bytes)

The log is synthesized **deterministically** from the driver-provided
``events`` parquet table, with pure SQL-expressible transforms, so every
downstream query has an exact DuckDB oracle. No randomness, no external data.

Skew is built in on purpose: ~30% of events hit 8 hot urls (the hot-domain
skew the north_star requires the merge stage to survive).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

# Number of cold urls (prime, avoids aliasing with the hot-key modulus).
N_COLD_URLS = 1997
# Hot urls: event_id % 10 < 3 → one of 8 urls (~30% of the log).
N_HOT_URLS = 8
N_DOMAINS = 31

# One shared SQL body per dialect. The two strings are intentionally
# line-parallel: any semantic drift between them is an oracle bug.
# Differences are only dialect spelling: string→binary cast and concat
# coercion behave identically for this ASCII content.

_COMMON_COLS = """
    CASE WHEN event_id % 10 < 3 THEN event_id % {hot}
         ELSE event_id % {cold} END AS url_id,
    event_id AS lsn,
    ts AS warc_ts,
    CASE WHEN event_type = 'error'  THEN 'delete'
         WHEN event_type = 'signup' THEN 'insert'
         ELSE 'update' END AS op,
    user_id,
    event_type
"""

_HTML_EXPR = (
    "concat('<html><head><title>Page ', url_id, ' rev ', lsn, "
    "'</title></head><body><h1>Page ', url_id, '</h1>"
    "<p>Event ', event_type, ' by user ', user_id, '.</p><p>', "
    "repeat('lorem ipsum dolor sit amet consectetur ', 1 + user_id % 4), "
    "'</p></body></html>')"
)

_LANG_EXPR = (
    "CASE user_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de' "
    "WHEN 2 THEN 'fr' WHEN 3 THEN 'es' ELSE 'pt' END"
)


def _changelog_sql(
    events_rel: str, binary_cast: str, cold_mod: int = N_COLD_URLS
) -> str:
    common = _COMMON_COLS.format(hot=N_HOT_URLS, cold=cold_mod)
    return f"""
        SELECT
            concat('https://site-', url_id % {N_DOMAINS},
                   '.example.com/page/', url_id) AS url,
            lsn,
            warc_ts,
            op,
            {binary_cast.format(expr=_HTML_EXPR)} AS html,
            {_LANG_EXPR} AS lang
        FROM (SELECT {common} FROM {events_rel})
    """


def changelog_spark_sql(events_rel: str = "events") -> str:
    """Spark-SQL text of the change log over an ``events`` relation."""
    return _changelog_sql(events_rel, binary_cast="encode({expr}, 'utf-8')")


def changelog_duckdb_sql(events_rel: str = "events") -> str:
    """DuckDB text of the same change log (oracle side)."""
    return _changelog_sql(events_rel, binary_cast="encode({expr})")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def changelog(spark: SparkSession, sf_dir: str, amplify: int = 1) -> DataFrame:
    """The synthetic change log as a DataFrame (lazy; scan-pruned).

    Pure projection over the events scan — no shuffle, no UDF; Catalyst
    prunes unused event columns out of the parquet read.

    ``amplify > 1`` deterministically replicates every event ``amplify``
    times with distinct lsn/url/event-time (benchmark-scale synthesis, no
    external data): replica r of event e gets ``lsn = e.lsn*amplify + r``,
    and the cold-url modulus grows by ``amplify`` so KEY CARDINALITY scales
    with event count (real web change feeds grow urls with volume; a
    fixed-key amplification would make the merge trivially small and the
    benchmark overhead-bound). The 8 hot urls stay hot — absolute skew
    grows with the log, which is the regime salting/AQE exist for. Oracle
    queries always use amplify=1.
    """
    # Pin UTC for any session (driver-owned sessions included): timestamp
    # parity with the DuckDB oracle requires it. Ship the package so the
    # extraction pandas UDFs import in workers whatever the driver's cwd.
    from data_pipeline_spark.session import ship_package

    ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load_events(spark, sf_dir)
    if amplify > 1:
        # events.parquet is a single file → one input partition; without a
        # repartition the explode-amplified synthesis runs as ONE task.
        par = spark.sparkContext.defaultParallelism
        events = events.repartition(4 * par)
    # Unique per-invocation view names (uuid-suffixed): two concurrent
    # builds on one session (different sf_dir/amplify) must never read
    # each other's events relation, and the result DataFrame inlines the
    # view plan at analysis, so dropping right after keeps the session
    # namespace residue-free.
    ev = f"__cl_events_{uuid.uuid4().hex[:12]}"
    events.createOrReplaceTempView(ev)
    try:
        if amplify <= 1:
            return spark.sql(changelog_spark_sql(ev))
        amp = f"{ev}_amp"
        spark.sql(
            f"""
            CREATE OR REPLACE TEMP VIEW {amp} AS
            SELECT event_id * {amplify} + rep AS event_id,
                   ts + make_interval(0, 0, 0, 0, 0, 0, rep) AS ts,
                   user_id * {amplify} + rep AS user_id,
                   event_type, value, props
            FROM {ev}
            LATERAL VIEW explode(sequence(0, {amplify - 1})) t AS rep
            """
        )
        try:
            return spark.sql(
                _changelog_sql(
                    amp,
                    binary_cast="encode({expr}, 'utf-8')",
                    cold_mod=N_COLD_URLS * amplify,
                )
            )
        finally:
            spark.catalog.dropTempView(amp)
    finally:
        spark.catalog.dropTempView(ev)


def changelog_cte(events_parquet: str) -> str:
    """DuckDB CTE fragment: ``WITH changelog AS (...)`` body for oracles."""
    return changelog_duckdb_sql(f"read_parquet('{events_parquet}')")
