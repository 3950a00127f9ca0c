"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship canonical-assembly query on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2, one
  callable per name (see a_share_data_pipeline_spark/plans/).
- ``oracle_sql()``: the DuckDB-equivalent SQL per query (omitted only
  for genuinely non-SQL-expressible ops — e.g. HLL sketches).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from a_share_data_pipeline_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from a_share_data_pipeline_spark.plans.queries_pipeline import canonical_assembly

    return canonical_assembly(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names/types)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
