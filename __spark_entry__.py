"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multiway merge-tree query at sf0.001;
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (+ the LLM-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each. Column names/aliases match pairwise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fixed merge-tree shape (fact left, broadcast
    dims, one aggregation shuffle) on sf0.001."""
    from proteofav_spark.queries import all_queries

    return all_queries()["join_merge_tree"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from proteofav_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from proteofav_spark.queries import all_oracles

    return all_oracles()
