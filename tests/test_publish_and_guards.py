"""K7 aggregation publish (replace-by-rel), F7 env-consistency guard,
S5 (size, etag) listing completeness."""

import hashlib
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.maintenance import (
    EnvMismatchError,
    check_env_consistency,
)
from data_pipeline_spark.metrics import (
    AGGREGATES_DIR,
    publish_aggregate,
    read_aggregate,
)


def _mk(spark, n_buckets=4):
    root = tempfile.mkdtemp(prefix="lake_pub_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("v", "string")],
        "url", n_buckets,
    )


def test_publish_aggregate_replace_by_rel(spark):
    """Second publish under the same rel replaces the link; readers follow
    the link and see only the fresh aggregate; the stale blob stays on disk
    (immutable) but is unreachable through the API."""
    t = _mk(spark)
    stale = spark.createDataFrame([("en", 1)], "lang string, n long")
    fresh = spark.createDataFrame(
        [("en", 5), ("de", 2)], "lang string, n long"
    )
    l1 = publish_aggregate(t, stale, "histogram", commit_key="p1")
    assert l1["replaced"] is None and l1["rows"] == 1
    l2 = publish_aggregate(t, fresh, "histogram", commit_key="p2")
    assert l2["replaced"] == "p1" and l2["rows"] == 2
    got = {(r.lang, r.n) for r in read_aggregate(t, "histogram").collect()}
    assert got == {("en", 5), ("de", 2)}
    # stale blob still on disk, reachable only by its immutable path
    assert os.path.isdir(os.path.join(t.root, AGGREGATES_DIR, "histogram", "p1"))
    # links doc holds exactly one entry per rel (replace, not append)
    with open(os.path.join(t.root, AGGREGATES_DIR, "links.json")) as f:
        links = json.load(f)
    assert set(links) == {"histogram"} and links["histogram"]["commit_key"] == "p2"


def test_publish_aggregate_idempotent_redelivery(spark):
    """Re-publishing a recorded commit_key (crash redelivery) is a no-op
    even with different data attached."""
    t = _mk(spark)
    df1 = spark.createDataFrame([("en", 5)], "lang string, n long")
    df2 = spark.createDataFrame([("xx", 999)], "lang string, n long")
    publish_aggregate(t, df1, "histogram", commit_key="p1")
    link = publish_aggregate(t, df2, "histogram", commit_key="p1")
    assert link["commit_key"] == "p1"
    got = {(r.lang, r.n) for r in read_aggregate(t, "histogram").collect()}
    assert got == {("en", 5)}


def test_publish_aggregate_independent_rels(spark):
    t = _mk(spark)
    publish_aggregate(
        t, spark.createDataFrame([("a", 1)], "k string, n long"), "rel-a", "p1"
    )
    publish_aggregate(
        t, spark.createDataFrame([("b", 2)], "k string, n long"), "rel-b", "p2"
    )
    assert read_aggregate(t, "rel-a").count() == 1
    assert read_aggregate(t, "rel-b").count() == 1


def test_env_guard_stamps_then_enforces(spark):
    t = _mk(spark)
    assert check_env_consistency(t, "prod") == "prod"  # first-writer stamps
    assert t.current().props["env"] == "prod"
    assert check_env_consistency(t, "prod") == "prod"  # match passes
    with pytest.raises(EnvMismatchError):
        check_env_consistency(t, "staging")
    # the failed check must not have clobbered the stamp
    assert t.current().props["env"] == "prod"


def test_files_listing_etag_matches_content_md5(spark):
    """S5: files(with_etag=True) yields the reference's {key: (size, etag)}
    listing shape; etag is the S3-style content md5."""
    from data_pipeline_spark.lake.merge import merge_into

    t = _mk(spark)
    batch = spark.createDataFrame(
        [("u1", 1, "a"), ("u2", 2, "b"), ("u3", 3, "c")],
        "url string, lsn bigint, v string",
    ).withColumn("op", F.lit("insert"))
    merge_into(t, batch, "c1")
    rows = t.files(with_etag=True).collect()
    assert rows, "expected at least one data file"
    for r in rows:
        p = os.path.join(t.root, r.path)
        data = open(p, "rb").read()
        assert r.etag == hashlib.md5(data).hexdigest()
        assert r.bytes == len(data)
    # etag column only appears on request (hot paths never pay the hash)
    assert "etag" not in t.files().columns
