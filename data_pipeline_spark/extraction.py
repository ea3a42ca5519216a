"""Vectorized html→text extraction and text-analysis functions.

The reference's heavy per-record transform is Zarr→GeoZarr conversion
(reference: scripts/convert_v1_s2.py:51-181); this engine's analog is
html→text extraction. The invariant carried over is **determinism**: the
reference pins its writer version so re-derived output is value-identical
(scripts/s1_store_meta.py:1-38, scripts/migrate_s1_rtc_datamodel.py:73-155);
here extraction output must be byte-identical per url no matter which code
path (pandas UDF, Spark SQL expression, DuckDB oracle) produced it.

All UDFs are Arrow-vectorized pandas UDFs — no per-row Python — and every
function has a frozen, regex-only definition so the three implementations
can be proven equal (tests/test_extraction.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.column import Column
from pyspark.sql.functions import pandas_udf

# Frozen extraction spec v1 — changing these is a "writer version" bump and
# must be recorded in the metrics table (see metrics.py EXTRACTOR_VERSION).
EXTRACTOR_VERSION = "extract-v1"
_TAG_RE = r"<[^>]*>"
_SPACE_RE = r" +"


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html (binary) → visible text: strip tags, collapse spaces, trim.

    Arrow hands binary columns to pandas as ``bytes`` objects; content is
    ASCII by construction of the change log, so utf-8 decode is total.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_SPACE_RE, " ", regex=True)
    return s.str.strip()


def extract_text_sql(html_col: str) -> Column:
    """The same extraction as a pure Spark-SQL expression (codegen'd,
    JVM-side). Used to *prove* the pandas UDF byte-identical, and as the
    fast path where the plan benefits from whole-stage codegen."""
    decoded = F.decode(F.col(html_col), "utf-8")
    stripped = F.regexp_replace(decoded, _TAG_RE, " ")
    return F.trim(F.regexp_replace(stripped, _SPACE_RE, " "))


def extract_text_duckdb(html_expr: str) -> str:
    """DuckDB spelling of the same extraction (oracle side)."""
    return (
        f"trim(regexp_replace(regexp_replace(decode({html_expr}), "
        f"'{_TAG_RE}', ' ', 'g'), '{_SPACE_RE}', ' ', 'g'))"
    )


# ---------------------------------------------------------------------------
# Text analysis for the training-data pipeline (documents table)
# ---------------------------------------------------------------------------

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (both engines count substring
# occurrences the same way).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
    "zh": ["的", "是", "了"],
}

_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


@pandas_udf(T.IntegerType())
def token_count(text: pd.Series) -> pd.Series:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return text.str.count(_TOKEN_RE).fillna(0).astype("int32")


def token_count_sql(text_col: str) -> Column:
    """JVM-side equivalent of :func:`token_count` (regexp_count)."""
    return F.regexp_count(F.col(text_col), F.lit(_TOKEN_RE)).cast("int")


@pandas_udf(T.DoubleType())
def quality_score(text: pd.Series) -> pd.Series:
    """Document quality in [0,1]: penalize very short docs, reward a sane
    word-length distribution and low punctuation density. Frozen formula,
    UNROUNDED — the IEEE op order below is mirrored exactly by the SQL
    oracle (docs_quality), so both engines produce bit-identical doubles."""
    n_chars = text.str.len().fillna(0)
    n_words = text.str.count(r"[A-Za-z]+").fillna(0)
    n_punct = text.str.count(r"[^\w\s]").fillna(0)
    den = n_chars.replace(0, 1)
    len_score = (n_chars / 200.0).clip(upper=1.0)
    punct_ratio = (n_punct / den).clip(upper=1.0)
    word_density = (n_words * 5.0 / den).clip(upper=1.0)
    return 0.4 * len_score + 0.4 * word_density + 0.2 * (1.0 - punct_ratio)


def quality_score_sql(text_col: str, dialect: str = "duck") -> str:
    """SQL spelling of :func:`quality_score` with the SAME IEEE op order.

    Valid Spark SQL and DuckDB text (shared dialect subset); counts come
    from regexp matches identical under RE2/Java regex on ASCII."""
    n_chars = f"CAST(length({text_col}) AS DOUBLE)"
    if dialect == "duck":
        n_words = f"CAST(len(regexp_extract_all({text_col}, '[A-Za-z]+')) AS DOUBLE)"
        n_punct = f"CAST(len(regexp_extract_all({text_col}, '[^\\w\\s]')) AS DOUBLE)"
    else:
        n_words = f"CAST(regexp_count({text_col}, '[A-Za-z]+') AS DOUBLE)"
        n_punct = f"CAST(regexp_count({text_col}, '[^\\\\w\\\\s]') AS DOUBLE)"
    den = f"(CASE WHEN length({text_col}) = 0 THEN 1.0 ELSE {n_chars} END)"
    return (
        f"(0.4 * least({n_chars} / 200.0, 1.0) "
        f"+ 0.4 * least({n_words} * 5.0 / {den}, 1.0) "
        f"+ 0.2 * (1.0 - least({n_punct} / {den}, 1.0)))"
    )
