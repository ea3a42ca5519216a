"""Every queries() entry with an oracle must match DuckDB exactly —
the same comparison the round driver runs (at sf0.001 here for speed;
the driver runs sf0.01)."""

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_util import compare, duck_connect

import __spark_entry__ as entrymod


def _names():
    oracles = entrymod.oracle_sql()
    return [n for n in entrymod.queries() if n in oracles]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, SF_SMOKE)
    res = compare(df, duck, oracles[name])
    assert res["ok"], {k: v for k, v in res.items() if k != "ok"}


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "lsn", "warc_ts", "lang", "text_sha"}
