"""data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of EOPF-Explorer/data-pipeline
(see SURVEY.md) on idiomatic Spark: a WAL/binlog-style change feed of web-page
events (insert/update/delete keyed by ``url``, ordered by a monotonic ``lsn``
and event-time ``warc_ts``) is deduplicated per-url last-writer-wins, run
through vectorized Arrow/pandas UDFs for deterministic html→text extraction,
and applied as MERGE-style upserts into a url-hash-bucketed lake table with
atomic snapshot commits, exactly-once idempotent batch application, schema
evolution, and a sidecar metrics table.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's *behavior* (cited file:line in docstrings).
"""

__version__ = "0.1.0"
