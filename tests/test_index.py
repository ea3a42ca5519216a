"""Secondary index: lookups equal filtered source scans through inserts,
value-moves (update preimage retraction), and deletes; refresh is
cursor-idempotent; clustered compaction file-prunes the probe."""

import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.index import SecondaryIndex
from data_pipeline_spark.lake.merge import merge_into
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
    src = ensure_table(spark, tempfile.mkdtemp(prefix="idx_src_"), 4)
    idx = SecondaryIndex(
        spark, src, tempfile.mkdtemp(prefix="idx_idx_"), "lang", 4
    )
    return src, idx


def _expect(src, lang):
    return sorted(
        r.url for r in src.read().filter(F.col("lang") == lang).collect()
    )


def test_index_tracks_inserts_updates_deletes(spark):
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        ("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert"),
        ("u2", 2, "2024-01-01 00:00:00", b"b", "en", "insert"),
        ("u3", 3, "2024-01-01 00:00:00", b"c", "de", "insert"),
    ]), "m0")
    idx.refresh()
    assert sorted(r.url for r in idx.lookup("en").collect()) == ["u1", "u2"]
    assert sorted(r.url for r in idx.lookup("de").collect()) == ["u3"]

    # value move: u1 en -> de; delete u2
    merge_into(src, _batch(spark, [
        ("u1", 4, "2024-01-02 00:00:00", b"a2", "de", "update"),
        ("u2", 5, "2024-01-02 00:00:00", None, "en", "delete"),
    ]), "m1")
    idx.refresh()
    for lang in ("en", "de"):
        assert sorted(r.url for r in idx.lookup(lang).collect()) == \
            _expect(src, lang)
    assert idx.lookup("en").count() == 0
    assert sorted(r.url for r in idx.lookup("de").collect()) == ["u1", "u3"]


def test_refresh_is_idempotent_and_cursor_advances(spark):
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        ("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert"),
    ]), "m0")
    c1 = idx.refresh()
    v1 = idx.table.current().version
    assert idx.refresh() == c1  # nothing new: no commit
    assert idx.table.current().version == v1
    merge_into(src, _batch(spark, [
        ("u2", 2, "2024-01-01 00:00:00", b"b", "en", "insert"),
    ]), "m1")
    c2 = idx.refresh()
    assert c2 > c1 and idx.cursor == c2
    assert sorted(r.url for r in idx.lookup("en").collect()) == ["u1", "u2"]


def test_optimize_prunes_index_probe_files(spark):
    src, idx = _mk(spark)
    rows = [
        (f"u{i}", i + 1, "2024-01-01 00:00:00", b"x",
         ["en", "de", "fr", "es"][i % 4], "insert")
        for i in range(200)
    ]
    merge_into(src, _batch(spark, rows), "m0")
    idx.refresh()
    idx.optimize("opt-0", target_rows_per_file=16)
    snap = idx.table.current()

    def nfiles(**kw):
        groups, _ = idx.table._select_files(snap, **kw)
        return sum(len(v) for v in groups.values())

    full = nfiles()
    pruned = nfiles(stats_bounds={"val": ("en", "en")})
    assert pruned < full
    assert sorted(r.url for r in idx.lookup("en").collect()) == \
        _expect(src, "en")


def test_noop_value_update_keeps_entry_live(spark):
    """A source update whose payload moved but whose INDEXED value did
    not emits a preimage retraction and a postimage assertion with the
    identical index key in one epoch; the assertion must win the LWW
    tie deterministically (lsn = 2*version + is_assert), so the entry
    for a still-live (value, key) pair is never tombstoned."""
    src, idx = _mk(spark)
    merge_into(src, _batch(spark, [
        ("u1", 1, "2024-01-01 00:00:00", b"a", "en", "insert"),
        ("u2", 2, "2024-01-01 00:00:00", b"b", "en", "insert"),
    ]), "m0")
    idx.refresh()
    # Three successive html-only rewrites: lang stays 'en' every time.
    for i in range(3):
        merge_into(src, _batch(spark, [
            ("u1", 10 + i, "2024-01-02 00:00:00", f"a{i}".encode(),
             "en", "update"),
        ]), f"m{i + 1}")
        idx.refresh()
        assert sorted(r.url for r in idx.lookup("en").collect()) == \
            ["u1", "u2"], f"entry lost after no-op update epoch {i}"
    # and a real value move afterwards still retracts correctly
    merge_into(src, _batch(spark, [
        ("u1", 20, "2024-01-03 00:00:00", b"z", "de", "update"),
    ]), "m9")
    idx.refresh()
    assert sorted(r.url for r in idx.lookup("en").collect()) == ["u2"]
    assert sorted(r.url for r in idx.lookup("de").collect()) == ["u1"]


def test_lookup_routes_by_selectivity(spark, monkeypatch):
    """Access-path routing: a selective value goes through the source's
    point lookup; a low-selectivity value (matched keys > max_point_keys)
    must NOT collect keys or point-probe — it routes to the stats-pruned
    scan. Both paths return exactly the filtered-scan answer."""
    src, idx = _mk(spark)
    rows = [
        (f"u{i}", i + 1, "2024-01-01 00:00:00", bytes([i % 250]),
         "common" if i < 30 else "rare", "insert")
        for i in range(33)
    ]
    merge_into(src, _batch(spark, rows), "m0")
    idx.refresh()

    calls = {"point": 0}
    orig = type(src).lookup

    def counting(self, keys, **kw):
        calls["point"] += 1
        return orig(self, keys, **kw)

    monkeypatch.setattr(type(src), "lookup", counting)

    # selective: 3 keys <= threshold -> point path
    got = sorted(r.url for r in idx.lookup("rare", max_point_keys=10).collect())
    assert got == ["u30", "u31", "u32"]
    assert calls["point"] == 1

    # low selectivity: 30 keys > threshold -> scan path, no point lookup
    got = sorted(r.url for r in idx.lookup("common", max_point_keys=10).collect())
    assert got == sorted(f"u{i}" for i in range(30))
    assert calls["point"] == 1  # unchanged: scan route took over
