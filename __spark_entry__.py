"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pipeline_etl_ecommerce_spark``; see SURVEY.md §2
for the operator inventory each query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_etl_ecommerce_spark import testdata_queries
from pipeline_etl_ecommerce_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily-consolidation shape: multi-sum aggregation +
    broadcast dim joins + ratio-to-parent allocation with cap & fallback)
    on /root/testdata/sf0.001."""
    tune_session(spark)
    return testdata_queries.flagship_consolidation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator cluster from SURVEY.md §2."""
    return testdata_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirroring each query's arithmetic."""
    return testdata_queries.oracle_sql()
