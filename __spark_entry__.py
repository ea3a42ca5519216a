"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (real engine replay at sf0.001),
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see data_pipeline_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 change log through the lake-table
    MERGE pipeline and return the final url-keyed state."""
    return q.entry_df(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in q.REGISTRY.items()
        if spec.oracle is not None
    }
