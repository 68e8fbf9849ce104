"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join rollup at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
SURVEY.md §2 (implementations live in ``retail_sales_etl_spark``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from retail_sales_etl_spark.plans import registry
from retail_sales_etl_spark.plans.analytics import q_star_flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return q_star_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return registry.all_oracles()
