"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank over the supplier co-purchase graph
derived from sf0.001. ``queries()`` / ``oracle_sql()`` — the operator
registry with DuckDB oracles (see
``graph_data_science_spark/driver_contract.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_data_science_spark import driver_contract as _dc  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dc.q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dc.queries()


def oracle_sql() -> dict[str, str]:
    return _dc.oracle_sql()
