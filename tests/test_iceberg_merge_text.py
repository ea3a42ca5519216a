"""Pin the Iceberg adapter's generated MERGE INTO text against an
EXECUTING engine without the Iceberg jar (VERDICT r4 "next round" #3).

DuckDB 1.0 (this container) has no MERGE statement, so the test drives a
minimal STANDARD-SEMANTICS MERGE interpreter: it parses the adapter's
exact generated text (``iceberg_adapter.merge_sql_text`` — the same
string ``merge_into`` submits to Spark), and executes it as DuckDB DML
in which every clause CONDITION and UPDATE ASSIGNMENT runs VERBATIM —
only the MERGE skeleton (clause ordering, original-snapshot matching) is
interpreted per SQL:2003:

* matching is decided against the ORIGINAL target snapshot (the insert
  arm uses a pre-delete key snapshot);
* WHEN MATCHED clauses apply in order — the DELETE arm first, so a row
  matching both arms deletes (standard first-match-wins);
* each arm's condition text is spliced into DuckDB WHERE unchanged.

The semantic-diff matrix then compares the executed text against the
ENGINE's own merge_into on identical scenarios, asserting equality where
the adapter docstring claims parity and asserting the DOCUMENTED
divergences (late-resurrection after delete; the commit-key crash
window) actually reproduce — a divergence table that exists only as
prose is not pinned.
"""

import re

import duckdb
import pytest

from data_pipeline_spark.lake.iceberg_adapter import merge_sql_text

COLUMNS = ["url", "lsn", "op", "text"]


def parse_merge(sql: str) -> dict:
    """Parse the adapter-generated MERGE shape (and ONLY that shape —
    anything unexpected raises, so a generator change that breaks the
    parse breaks this test loudly instead of testing stale text)."""
    flat = " ".join(sql.split())
    m = re.fullmatch(
        r"MERGE INTO (?P<tgt>\w+) t USING (?P<src>\w+) s "
        r"ON (?P<on>t\.\w+ = s\.\w+) "
        r"WHEN MATCHED AND (?P<del_cond>.+?) THEN DELETE "
        r"WHEN MATCHED AND (?P<upd_cond>.+?) THEN UPDATE SET "
        r"(?P<assigns>.+?) "
        r"WHEN NOT MATCHED AND (?P<ins_cond>.+?) THEN "
        r"INSERT \((?P<ins_cols>[^)]+)\) VALUES \((?P<ins_vals>[^)]+)\)",
        flat,
    )
    assert m, f"generated MERGE text changed shape: {flat}"
    return m.groupdict()


def run_merge_text(con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Execute the generated MERGE text with standard semantics; the
    condition/assignment fragments run verbatim in DuckDB."""
    p = parse_merge(sql)
    tgt, src, on = p["tgt"], p["src"], p["on"]
    key = re.fullmatch(r"t\.(\w+) = s\.\w+", on).group(1)
    # original-snapshot key set: the INSERT arm must judge "not matched"
    # against the target BEFORE this statement's own deletes
    con.execute(f"CREATE TEMP TABLE __orig AS SELECT {key} FROM {tgt}")
    try:
        con.execute(
            f"DELETE FROM {tgt} WHERE EXISTS (SELECT 1 FROM {src} s "
            f"WHERE {on.replace('t.', tgt + '.')} "
            f"AND {p['del_cond'].replace('t.', tgt + '.')})"
        )
        # DuckDB UPDATE ... FROM: alias the source as s, strip the t.
        # prefix on assignment LHS only (DuckDB rejects qualified LHS)
        assigns = ", ".join(
            re.sub(r"^\s*t\.", "", a) for a in p["assigns"].split(",")
        )
        con.execute(
            f"UPDATE {tgt} SET {assigns} FROM {src} s "
            f"WHERE {on.replace('t.', tgt + '.')} "
            f"AND {p['upd_cond'].replace('t.', tgt + '.')}"
        )
        con.execute(
            f"INSERT INTO {tgt} ({p['ins_cols']}) "
            f"SELECT {p['ins_vals']} FROM {src} s "
            f"WHERE s.{key} NOT IN (SELECT {key} FROM __orig) "
            f"AND {p['ins_cond']}"
        )
    finally:
        con.execute("DROP TABLE __orig")


def fresh_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages (url VARCHAR, lsn BIGINT, text VARCHAR)"
    )
    return con


def apply_batch_text(con, rows) -> None:
    """One adapter 'epoch': pre-collapsed batch (the adapter collapses
    via lww_collapse before the MERGE; these test batches are already
    one-row-per-key) through the generated text."""
    con.execute("CREATE TEMP TABLE batch (url VARCHAR, lsn BIGINT, op VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO batch VALUES (?, ?, ?, ?)", rows)
    run_merge_text(con, merge_sql_text("pages", "batch", COLUMNS))
    con.execute("DROP TABLE batch")


def state(con) -> dict:
    return {
        r[0]: (r[1], r[2])
        for r in con.execute("SELECT url, lsn, text FROM pages").fetchall()
    }


def test_upsert_update_and_late_update():
    con = fresh_con()
    apply_batch_text(con, [("a", 1, "insert", "a1"), ("b", 1, "insert", "b1")])
    assert state(con) == {"a": (1, "a1"), "b": (1, "b1")}
    # newer update wins, stale update loses (strict > on the order col)
    apply_batch_text(con, [("a", 3, "update", "a3"), ("b", 0, "update", "b0")])
    assert state(con) == {"a": (3, "a3"), "b": (1, "b1")}
    # order tie keeps the TABLE row (strict >, the engine's rule too)
    apply_batch_text(con, [("a", 3, "update", "aX")])
    assert state(con) == {"a": (3, "a3"), "b": (1, "b1")}


def test_delete_wins_and_late_delete_loses():
    con = fresh_con()
    apply_batch_text(con, [("a", 5, "insert", "a5"), ("b", 5, "insert", "b5")])
    apply_batch_text(con, [("a", 6, "delete", None), ("b", 4, "delete", None)])
    assert state(con) == {"b": (5, "b5")}  # a deleted; late delete no-op


def test_delete_arm_beats_update_arm_on_same_row():
    """A delete event satisfies BOTH matched conditions (op='delete' and
    order >); standard first-match-wins must DELETE, not update the row
    with a NULL payload. This is exactly the clause-ordering property
    the generated text encodes."""
    con = fresh_con()
    apply_batch_text(con, [("a", 1, "insert", "a1")])
    apply_batch_text(con, [("a", 2, "delete", None)])
    assert state(con) == {}


def test_documented_divergence_late_resurrection():
    """The adapter docstring's divergence class: after a delete, Iceberg
    has no memory of the row, so an OLDER re-insert WINS (NOT MATCHED
    arm) — where the engine's tombstone would suppress it. Assert the
    divergence is real in the executed text, and that the ENGINE side
    behaves the opposite way (tests/test_merge.py pins that half)."""
    con = fresh_con()
    apply_batch_text(con, [("a", 5, "insert", "a5")])
    apply_batch_text(con, [("a", 6, "delete", None)])
    assert state(con) == {}
    # older event arrives in a LATER batch: resurrects under Iceberg
    apply_batch_text(con, [("a", 2, "insert", "a2")])
    assert state(con) == {"a": (2, "a2")}, (
        "late-resurrection divergence no longer reproduces — "
        "update the adapter's divergence table"
    )


def test_crash_window_replay_is_idempotent_except_insert_arm():
    """ADVICE r4 low: commit-key lands in a SEPARATE ALTER after the
    MERGE, so a crash between them replays the MERGE. Replaying the
    SAME text twice: update/delete arms no-op (strict order conditions)
    — but if a later interleaved batch deleted a key, the replayed
    INSERT arm resurrects it. Both halves pinned."""
    con = fresh_con()
    apply_batch_text(con, [("a", 3, "insert", "a3"), ("b", 3, "insert", "b3")])
    # replay the exact same epoch (crash before ALTER): no-op
    apply_batch_text(con, [("a", 3, "insert", "a3"), ("b", 3, "insert", "b3")])
    assert state(con) == {"a": (3, "a3"), "b": (3, "b3")}
    # interleaved later delete, then replay epoch 1 again: b resurrects
    apply_batch_text(con, [("b", 9, "delete", None)])
    apply_batch_text(con, [("a", 3, "insert", "a3"), ("b", 3, "insert", "b3")])
    assert state(con) == {"a": (3, "a3"), "b": (3, "b3")}, (
        "crash-window INSERT-arm resurrection no longer reproduces — "
        "update the adapter's divergence note"
    )


def test_text_matches_engine_on_ordered_feed(spark):
    """Parity half of the diff matrix: on an ORDER-MONOTONIC batched
    feed (the shape the streaming path's checkpointed epochs guarantee,
    per the adapter docstring), the executed MERGE text and the engine's
    merge_into land the identical final state."""
    import tempfile

    from data_pipeline_spark.lake.merge import merge_into
    from data_pipeline_spark.lake.table import LakeTable

    epochs = [
        [("a", 1, "insert", "a1"), ("b", 2, "insert", "b2"),
         ("c", 3, "insert", "c3")],
        [("a", 4, "update", "a4"), ("b", 5, "delete", None)],
        [("b", 6, "insert", "b6"), ("c", 2, "update", "cSTALE"),
         ("d", 7, "insert", "d7")],
    ]
    con = fresh_con()
    for rows in epochs:
        apply_batch_text(con, rows)

    fields = [("url", "string"), ("lsn", "bigint"), ("text", "string")]
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="lake_icetext_"), fields, "url", 4
    )
    for i, rows in enumerate(epochs):
        df = spark.createDataFrame(
            rows, "url string, lsn bigint, op string, text string"
        )
        merge_into(t, df, commit_key=f"e{i}")
    engine = {
        r["url"]: (r["lsn"], r["text"]) for r in t.read().collect()
    }
    assert engine == state(con)


def test_parser_refuses_foreign_shapes():
    with pytest.raises(AssertionError, match="changed shape"):
        parse_merge("MERGE INTO t USING s ON t.a = s.a WHEN MATCHED THEN DELETE")
