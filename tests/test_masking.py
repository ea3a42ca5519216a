"""Column masking policies (masking.py + LakeTable.read enforcement):
policies replace values on every default read, see the original row,
compose with column pruning, never reach disk through rewrite paths,
and drop cleanly."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import masking
from data_pipeline_spark.pipeline import apply_batch, ensure_table


def _mk(spark):
    table = ensure_table(spark, tempfile.mkdtemp(prefix="mask_"), 4)
    batch = spark.createDataFrame(
        [
            ("https://a/1", 1, "2024-01-01 00:00:00",
             b"<body>alpha</body>", "en", "insert"),
            ("https://b/2", 2, "2024-01-01 00:00:00",
             b"<body>beta</body>", "de", "insert"),
        ],
        "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string",
    ).select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
        "html", F.lit(None).cast("string").alias("text"), "lang", "op",
    )
    apply_batch(table, batch, "m0", record_metrics=False)
    return table


def test_mask_applies_on_default_read_and_bypasses(spark):
    table = _mk(spark)
    masking.add_mask(
        table, "text", "CASE WHEN lang = 'en' THEN text ELSE '[MASKED]' END"
    )
    got = {(r.url, r.text) for r in table.read().collect()}
    assert got == {
        ("https://a/1", "alpha"),
        ("https://b/2", "[MASKED]"),
    }
    un = {(r.url, r.text) for r in table.read(unmasked=True).collect()}
    assert un == {("https://a/1", "alpha"), ("https://b/2", "beta")}
    raw = {r.text for r in table.read(raw=True).collect()}
    assert raw == {"alpha", "beta"}


def test_policies_see_original_row_not_other_masks(spark):
    table = _mk(spark)
    # both columns masked; text's policy references lang — it must see
    # the ORIGINAL lang even though lang itself is masked
    masking.add_mask(table, "lang", "'**'")
    masking.add_mask(
        table, "text", "CASE WHEN lang = 'en' THEN text ELSE '[MASKED]' END"
    )
    got = {(r.url, r.lang, r.text) for r in table.read().collect()}
    assert got == {
        ("https://a/1", "**", "alpha"),
        ("https://b/2", "**", "[MASKED]"),
    }


def test_pruned_read_auto_includes_policy_inputs_then_drops_them(spark):
    table = _mk(spark)
    masking.add_mask(
        table, "text", "CASE WHEN lang = 'en' THEN text ELSE '[MASKED]' END"
    )
    out = table.read(columns=["text"])
    assert "lang" not in out.columns  # auto-included input dropped
    got = {(r.url, r.text) for r in out.collect()}
    assert got == {
        ("https://a/1", "alpha"),
        ("https://b/2", "[MASKED]"),
    }


def test_rewrite_paths_never_persist_masked_values(spark):
    table = _mk(spark)
    masking.add_mask(table, "text", "'[MASKED]'")
    table.compact(commit_key="m-compact")
    # physical bytes survived compaction intact
    raw = {r.text for r in table.read(raw=True).collect()}
    assert raw == {"alpha", "beta"}
    # and the policy still applies on the default read
    assert {r.text for r in table.read().collect()} == {"[MASKED]"}


def test_add_mask_refusals_and_drop(spark):
    table = _mk(spark)
    with pytest.raises(ValueError, match="key"):
        masking.add_mask(table, "url", "'x'")
    with pytest.raises(ValueError, match="order"):
        masking.add_mask(table, "lsn", "0")
    with pytest.raises(ValueError, match="no column"):
        masking.add_mask(table, "nope", "'x'")
    with pytest.raises(ValueError, match="does not resolve"):
        masking.add_mask(table, "text", "missing_col || 'x'")
    masking.add_mask(table, "text", "'[MASKED]'")
    with pytest.raises(ValueError, match="already carries"):
        masking.add_mask(table, "text", "'other'")
    masking.drop_mask(table, "text")
    assert masking.masks(table) == {}
    assert {r.text for r in table.read().collect()} == {"alpha", "beta"}
    with pytest.raises(ValueError, match="no masking policy"):
        masking.drop_mask(table, "text")


def test_row_filter_hides_rows_on_default_read(spark):
    table = _mk(spark)
    masking.add_row_filter(table, "en_only", "lang = 'en'")
    assert {r.url for r in table.read().collect()} == {"https://a/1"}
    # bypasses see everything; physical rows intact
    assert table.read(unmasked=True).count() == 2
    assert table.read(raw=True).count() == 2
    # compaction must NOT delete hidden rows
    table.compact(commit_key="rf-compact")
    assert table.read(raw=True).count() == 2
    assert table.read().count() == 1


def test_row_filter_composes_with_masks_on_original_values(spark):
    table = _mk(spark)
    # filter references lang; mask replaces lang — the filter must see
    # the ORIGINAL value
    masking.add_mask(table, "lang", "'**'")
    masking.add_row_filter(table, "de_only", "lang = 'de'")
    got = [(r.url, r.lang) for r in table.read().collect()]
    assert got == [("https://b/2", "**")]


def test_row_filter_pruned_read_and_refusals(spark):
    table = _mk(spark)
    masking.add_row_filter(table, "en_only", "lang = 'en'")
    out = table.read(columns=["text"])
    assert "lang" not in out.columns
    assert {r.text for r in out.collect()} == {"alpha"}
    with pytest.raises(ValueError, match="already declared"):
        masking.add_row_filter(table, "en_only", "lang = 'de'")
    with pytest.raises(ValueError, match="does not resolve"):
        masking.add_row_filter(table, "bad", "missing > 1")
    masking.drop_row_filter(table, "en_only")
    assert table.read().count() == 2
    with pytest.raises(ValueError, match="no row filter"):
        masking.drop_row_filter(table, "en_only")
