"""Stream-side enrichment hook (run_stream transform=): a per-epoch
broadcast lookup join runs before the apply, composes with exactly-once
redelivery, and equals enriching the whole log then batch-replaying."""

import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.pipeline import replay_log
from data_pipeline_spark.streaming.pipeline import (
    run_stream,
    stream_to_completion,
    write_wal,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

LANG3 = [
    ("en", "eng"), ("de", "deu"), ("fr", "fra"), ("es", "spa"), ("pt", "por")
]


def _enrich(batch):
    dim = F.broadcast(
        batch.sparkSession.createDataFrame(LANG3, "lang string, lang3 string")
    )
    cols = batch.columns
    return (
        batch.join(dim, "lang", "left")
        .withColumn("lang", F.coalesce("lang3", "lang"))
        .select(*cols)
    )


def _state(table):
    return sorted(
        table.read()
        .select("url", "lsn", "lang", F.sha2("text", 256).alias("sha"))
        .collect()
    )


def test_stream_transform_equals_enriched_batch_replay(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=3)
    streamed = stream_to_completion(
        spark, wal, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=8, record_metrics=False, transform=_enrich,
    )
    batch = replay_log(
        spark,
        _enrich(cl.changelog(spark, SF_DIR)),
        str(tmp_path / "solo"),
        n_batches=3, n_buckets=8, record_metrics=False,
    )
    rows = _state(streamed)
    assert rows == _state(batch)
    live_langs = {r.lang for r in rows}
    assert live_langs <= {b for _a, b in LANG3}  # mapping actually applied


def test_stream_transform_survives_post_commit_double_fire(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(spark, SF_DIR, wal, n_files=4)
    root, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    q = run_stream(
        spark, wal, root, ckpt, n_buckets=8, record_metrics=False,
        available_now=True, transform=_enrich,
        fail_after_batches=2, fail_mode="after",
    )
    try:
        q.awaitTermination(300)
    except Exception:
        pass
    finally:
        if q.isActive:
            q.stop()
    streamed = stream_to_completion(
        spark, wal, root, ckpt,
        n_buckets=8, record_metrics=False, transform=_enrich,
    )
    batch = replay_log(
        spark,
        _enrich(cl.changelog(spark, SF_DIR)),
        str(tmp_path / "solo"),
        n_batches=4, n_buckets=8, record_metrics=False,
    )
    assert _state(streamed) == _state(batch)
