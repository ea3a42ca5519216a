"""Winnowing fingerprints (operators/dedup.py winnowing_sql): the local
guarantee (a shared run of >= k+w-1 words always shares a selected
fingerprint), cross-engine parity, and the reference Python winnowing
equivalence of the distinct-window-minima formulation."""

import duckdb
import pytest

from data_pipeline_spark.operators.dedup import DUCK, SPARK, winnowing_sql

K, W = 5, 4


def _mk_docs(spark, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .createOrReplaceTempView("documents")


def _duck(rows, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con.execute(winnowing_sql(DUCK, **kw)).fetchall()


def _uniq_words(seed, n):
    return " ".join(f"w{seed}x{i}" for i in range(n))


def test_local_guarantee_shared_run_always_matches(spark):
    """Docs sharing a K+W-1 = 8-word run must share >= 1 fingerprint —
    the guarantee MinHash cannot give."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (0, _uniq_words(0, 30) + " " + shared + " " + _uniq_words(1, 30)),
        (1, _uniq_words(2, 25) + " " + shared + " " + _uniq_words(3, 25)),
        (2, _uniq_words(4, 60)),  # no overlap with anyone
    ]
    for engine in ("spark", "duck"):
        if engine == "spark":
            _mk_docs(spark, rows)
            got = spark.sql(winnowing_sql(SPARK, min_shared=1)).collect()
        else:
            got = _duck(rows, min_shared=1)
        pairs = {(r[0], r[1]) for r in got}
        assert (0, 1) in pairs, engine
        assert all(2 not in p for p in pairs), engine


def test_spark_duck_parity_and_threshold(spark):
    rows = []
    base = _uniq_words(9, 40)
    for i in range(6):
        # three near-identical docs + three unrelated ones
        text = base if i < 3 else _uniq_words(20 + i, 40)
        rows.append((i, text + f" tail{i}a tail{i}b"))
    _mk_docs(spark, rows)
    sp = {tuple(r) for r in
          spark.sql(winnowing_sql(SPARK, min_shared=4)).collect()}
    dk = {tuple(r) for r in _duck(rows, min_shared=4)}
    assert sp == dk
    assert {(a, b) for a, b, *_ in sp} == {(0, 1), (0, 2), (1, 2)}


def test_matches_reference_python_winnowing(spark):
    """The distinct-window-minima set equals the fingerprint set of the
    positional reference algorithm (select min in each window; ties by
    rightmost position — the SET of hashes is identical either way)."""
    rows = [(7, "the quick brown fox jumps over the lazy dog again and "
                "the quick brown fox naps")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    # engine's fingerprint set (expose fps by querying the CTE chain)
    sql = winnowing_sql(DUCK, min_shared=1)
    head = sql.split("sizes AS")[0].rstrip().rstrip(",")
    fps = {r[1] for r in con.execute(
        head + " SELECT doc_id, fp FROM fps").fetchall()}

    words = rows[0][1].split(" ")
    grams = [" ".join(words[i:i + K]) for i in range(len(words) - K + 1)]
    hs = [con.execute(
        "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [g]
    ).fetchone()[0] for g in grams]
    ref = set()
    for i in range(len(hs) - W + 1):
        window = hs[i:i + W]
        m = min(window)
        # rightmost minimal position (the paper's robust winnowing)
        ref.add(window[len(window) - 1 - window[::-1].index(m)])
    assert fps == ref and len(fps) > 0


def test_short_docs_yield_no_fingerprints(spark):
    rows = [(0, "one two three"), (1, "one two three")]  # < K words
    assert _duck(rows, min_shared=1) == []
    _mk_docs(spark, rows)
    assert spark.sql(winnowing_sql(SPARK, min_shared=1)).collect() == []
