"""OS-level crash safety: SIGKILL the JVM mid-replay; the table must open
clean on the previous snapshot and a re-run must converge to the oracle
state (the reference's torn-write elimination, runner.py:126-156)."""

import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

import duckdb

from data_pipeline_spark import changelog as cl
from data_pipeline_spark.extraction import extract_text_duckdb
from data_pipeline_spark.lake.table import LakeTable
from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.pipeline import replay

    spark = get_spark("crash-child", parallelism=4)
    print("READY", flush=True)
    replay(spark, {sf!r}, {root!r}, n_batches=6, n_buckets=8,
           record_metrics=False)
    print("DONE", flush=True)
    """
)


def test_sigkill_mid_replay_leaves_consistent_table(spark):
    root = tempfile.mkdtemp(prefix="lake_crash_")
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=REPO, sf=SF_SMOKE, root=root)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait for some commits to land, then SIGKILL the whole process mid-work
    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        if LakeTable.exists(root):
            try:
                if len(LakeTable(spark, root).current().commits) >= 2:
                    break
            except Exception:
                pass  # racing the atomic pointer swap is fine
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    proc.kill()
    proc.wait()

    # table opens clean on the last fully-committed snapshot
    t = LakeTable(spark, root)
    snap = t.current()
    n_committed = len(snap.commits)
    assert n_committed >= 1
    t.read().count()  # every referenced file is present and readable

    # resume: the SAME replay converges to the oracle final state
    from data_pipeline_spark.pipeline import replay

    t = replay(spark, SF_SMOKE, root, n_batches=6, n_buckets=8,
               record_metrics=False)
    assert len(t.current().commits) == 6
    sp = {
        r.url: (r.lsn, r.h)
        for r in t.read().selectExpr("url", "lsn", "sha2(text,256) h").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    q = f"""WITH changelog AS ({cl.changelog_duckdb_sql('events')}),
    latest AS (SELECT * FROM (SELECT *, row_number() OVER
      (PARTITION BY url ORDER BY lsn DESC) rn FROM changelog) WHERE rn=1)
    SELECT url, lsn, sha256({extract_text_duckdb('html')})
    FROM latest WHERE op <> 'delete'"""
    dk = {r[0]: (r[1], r[2]) for r in con.execute(q).fetchall()}
    assert sp == dk
