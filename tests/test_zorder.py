"""Z-order clustered compaction + stats-bounds file skipping: correctness
(clustered rewrite changes nothing semantically; bounded reads equal
filtered full reads) and pruning (fewer files opened on EITHER clustered
column; merge-on-read buckets never skip unsoundly)."""

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.lake.zorder import with_zvalue


def _mk(spark, n_buckets=2):
    root = tempfile.mkdtemp(prefix="lake_z_")
    return LakeTable.create(
        spark, root,
        [("url", "string"), ("lsn", "bigint"), ("warc_ts", "timestamp"),
         ("lang", "string")],
        "url", n_buckets,
    )


def _events(spark, n=400):
    langs = ["en", "de", "fr", "es", "pt"]
    rows = [
        (
            f"https://site-{i % 7}.example/page/{i}",
            i + 1,
            f"2024-01-{(i % 28) + 1:02d} {(i * 7) % 24:02d}:00:00",
            langs[i % len(langs)],
            "update",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "url string, lsn bigint, warc_ts string, lang string, op string"
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _paths(table, **kw):
    groups, _ = table._select_files(table.current(), **kw)
    return {p for ps in groups.values() for p in ps}


def _sorted_rows(df):
    return sorted(
        (r.url, r.lsn, str(r.warc_ts), r.lang) for r in df.collect()
    )


def test_zorder_compaction_preserves_state_and_prunes_both_columns(spark):
    t = _mk(spark)
    merge_into(t, _events(spark), "m0")
    before = _sorted_rows(t.read())

    t.compact("z0", cluster_by=["lang", "warc_ts"], zorder=True,
              target_rows_per_file=25)
    assert _sorted_rows(t.read()) == before
    assert t.current().summary["cluster_by"] == ["lang", "warc_ts"]

    all_files = _paths(t)
    assert len(all_files) > 8, "file-granularity clustering needs many files"

    # Equality interval on the string column prunes files.
    en = _paths(t, stats_bounds={"lang": ("en", "en")})
    assert en < all_files and len(en) < len(all_files)

    # Range interval on the timestamp column (epoch micros units for the
    # manifest check) prunes too — the point of z-order vs a lexicographic
    # sort on (lang, warc_ts).
    lo = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    hi = int(dt.datetime(2024, 1, 8).timestamp() * 1_000_000)
    week1 = _paths(t, stats_bounds={"warc_ts": (lo, hi)})
    assert week1 < all_files and len(week1) < len(all_files)


def test_stats_bounds_read_equals_filtered_full_read(spark):
    t = _mk(spark)
    merge_into(t, _events(spark), "m0")
    t.compact("z0", cluster_by=["lang", "warc_ts"], zorder=True,
              target_rows_per_file=25)

    got = t.read(stats_bounds={"lang": ("en", "en")})
    want = t.read().filter(F.col("lang") == "en")
    assert _sorted_rows(got) == _sorted_rows(want)

    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 12)
    got = t.read(stats_bounds={"warc_ts": (lo, hi)})
    want = t.read().filter(
        (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stats_bounds_never_skips_in_delta_buckets(spark):
    """Merge-on-read soundness: after new deltas land, a bounded read must
    NOT file-skip inside those buckets (a winner could hide in a skipped
    file while a stale loser survives the collapse)."""
    t = _mk(spark)
    merge_into(t, _events(spark), "m0")
    t.compact("z0", cluster_by=["lang", "warc_ts"], zorder=True,
              target_rows_per_file=25)

    # Flip one en-row's lang to 'de' with a higher lsn (delta commit).
    upd = spark.createDataFrame(
        [("https://site-0.example/page/0", 10_000, "2024-02-01 00:00:00",
          "de", "update")],
        "url string, lsn bigint, warc_ts string, lang string, op string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    merge_into(t, upd, "m1")

    got = t.read(stats_bounds={"lang": ("en", "en")})
    want = t.read().filter(F.col("lang") == "en")
    assert _sorted_rows(got) == _sorted_rows(want)
    urls = {r.url for r in got.collect()}
    assert "https://site-0.example/page/0" not in urls

    # And the de-interval sees the NEW value exactly once.
    de = t.read(stats_bounds={"lang": ("de", "de")}).filter(
        F.col("url") == "https://site-0.example/page/0"
    )
    assert [(r.lsn, r.lang) for r in de.collect()] == [(10_000, "de")]


def test_hierarchical_sort_cluster_prunes_leading_column(spark):
    t = _mk(spark)
    merge_into(t, _events(spark), "m0")
    t.compact("s0", cluster_by=["lang"], target_rows_per_file=25)
    all_files = _paths(t)
    en = _paths(t, stats_bounds={"lang": ("en", "en")})
    assert len(en) < len(all_files)
    got = t.read(stats_bounds={"lang": ("en", "en")})
    assert _sorted_rows(got) == _sorted_rows(
        t.read().filter(F.col("lang") == "en")
    )


def test_zvalue_expression_is_deterministic_and_interleaves(spark):
    df = spark.createDataFrame(
        [(i, float(i), f"s{i % 4}") for i in range(64)],
        "a bigint, b double, c string",
    )
    z1 = {r["a"]: r["__z"] for r in with_zvalue(df, ["a", "b"]).collect()}
    z2 = {r["a"]: r["__z"] for r in with_zvalue(df, ["a", "b"]).collect()}
    assert z1 == z2
    # Two equal dims interleave to the classic Morton diagonal: z(k,k)
    # has both bits set per level → value 3 * sum(4^i * bit_i(bin(k))).
    # With 64 values over 256 bins, bin(k) = k*4 .. deterministic spread:
    assert len(set(z1.values())) > 32, "z-values must spread, not collapse"
