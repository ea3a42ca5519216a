"""Table-declared CHECK constraints (constraints.py): add-time validation
against existing rows, apply-time enforcement (DLQ quarantine or loud
refusal before any commit), SQL three-valued semantics (NULL passes),
LWW fallback to the previous valid event, drop, and redelivery
idempotency."""

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark import constraints
from data_pipeline_spark.pipeline import apply_batch, ensure_dlq, ensure_table


def _ev(url, lsn, html, lang, op="update", ts="2024-01-01 00:00:00"):
    return (url, lsn, ts, html, lang, op)


def _df(spark, rows):
    df = spark.createDataFrame(
        rows,
        "url string, lsn bigint, warc_ts string, html binary, "
        "lang string, op string",
    )
    return df.select(
        "url", "lsn", F.to_timestamp("warc_ts").alias("warc_ts"),
        "html", F.lit(None).cast("string").alias("text"), "lang", "op",
    )


def _mk(spark):
    table = ensure_table(spark, tempfile.mkdtemp(prefix="ck_main_"), 4)
    dlq = ensure_dlq(spark, tempfile.mkdtemp(prefix="ck_dlq_"), 4)
    return table, dlq


def test_violators_quarantine_and_previous_event_wins(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    batch = _df(spark, [
        _ev("https://a/1", 1, b"<body>ok</body>", "en", "insert"),
        _ev("https://a/1", 2, b"<body>bad</body>", "xx"),   # violates
        _ev("https://b/2", 3, b"<body>ok2</body>", "fr", "insert"),
    ])
    apply_batch(table, batch, "ck-0", dlq=dlq)
    state = {(r.url, r.lsn, r.lang) for r in table.read().collect()}
    # a/1's newest event violated → lsn 1 wins under LWW
    assert state == {
        ("https://a/1", 1, "en"),
        ("https://b/2", 3, "fr"),
    }
    got = {(r.url, r.lsn, r.reason) for r in dlq.read().collect()}
    assert got == {("https://a/1", 2, "check:lang_allowed")}


def test_without_dlq_batch_refuses_before_any_commit(spark):
    table, _ = _mk(spark)
    constraints.add_check(table, "small", "octet_length(html) <= 10")
    v0 = table.current().version
    batch = _df(spark, [
        _ev("https://a/1", 1, b"tiny", "en", "insert"),
        _ev("https://b/2", 2, b"x" * 50, "en", "insert"),
    ])
    with pytest.raises(constraints.CheckViolation, match="check:small"):
        apply_batch(table, batch, "ck-1")
    assert table.current().version == v0  # nothing committed
    assert table.read().count() == 0


def test_null_predicate_passes_and_deletes_exempt(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    batch = _df(spark, [
        _ev("https://a/1", 1, b"<body>a</body>", None, "insert"),  # NULL lang
        _ev("https://a/1", 2, None, "xx", "delete"),  # delete exempt
    ])
    apply_batch(table, batch, "ck-2", dlq=dlq)
    assert dlq.read().count() == 0  # NULL passed, delete exempt
    assert table.read().count() == 0  # tombstone won


def test_add_check_refuses_on_existing_violations(spark):
    table, dlq = _mk(spark)
    apply_batch(
        table,
        _df(spark, [_ev("https://a/1", 1, b"<body>a</body>", "xx", "insert")]),
        "ck-3", dlq=dlq,
    )
    with pytest.raises(constraints.CheckViolation, match="existing"):
        constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    # and an unresolvable predicate is refused with the schema named
    with pytest.raises(ValueError, match="does not resolve"):
        constraints.add_check(table, "broken", "no_such_col > 0")
    # duplicate name refused
    constraints.add_check(table, "ok", "lsn >= 0")
    with pytest.raises(ValueError, match="already declared"):
        constraints.add_check(table, "ok", "lsn >= 1")


def test_drop_check_restores_flow(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    assert constraints.checks(table) == {"lang_allowed": "lang <> 'xx'"}
    constraints.drop_check(table, "lang_allowed")
    assert constraints.checks(table) == {}
    apply_batch(
        table,
        _df(spark, [_ev("https://a/1", 1, b"<body>a</body>", "xx", "insert")]),
        "ck-4", dlq=dlq,
    )
    assert table.read().count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        constraints.drop_check(table, "lang_allowed")


def test_redelivery_idempotent_with_checks_armed(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "lang_allowed", "lang <> 'xx'")
    batch = _df(spark, [
        _ev("https://a/1", 1, b"<body>a</body>", "en", "insert"),
        _ev("https://b/2", 2, b"<body>b</body>", "xx", "insert"),
    ])
    apply_batch(table, batch, "ck-5", dlq=dlq)
    v_main, v_dlq = table.current().version, dlq.current().version
    apply_batch(table, batch, "ck-5", dlq=dlq)  # exact redelivery
    assert table.current().version == v_main
    assert dlq.read().count() == 1
    assert dlq.current().version == v_dlq


def test_first_violated_check_reported_in_declared_order(spark):
    table, dlq = _mk(spark)
    constraints.add_check(table, "a_lang", "lang <> 'xx'")
    constraints.add_check(table, "b_size", "octet_length(html) <= 10")
    batch = _df(spark, [
        _ev("https://a/1", 1, b"x" * 50, "xx", "insert"),  # violates both
        _ev("https://b/2", 2, b"y" * 50, "en", "insert"),  # only size
    ])
    apply_batch(table, batch, "ck-6", dlq=dlq)
    got = {(r.url, r.reason) for r in dlq.read().collect()}
    assert got == {
        ("https://a/1", "check:a_lang"),
        ("https://b/2", "check:b_size"),
    }
