"""UDF surface (SURVEY.md §2.10): the engine's user-function
registration points, each on the fastest available lane.

The reference's only "UDF model" is coarse Prefect task functions over
whole pandas frames (market/non_fq_daily_kline.py:21-107). Spark gives
four lanes, fastest first:

1. built-in Column expressions (JVM codegen) — always preferred;
2. `@pandas_udf` scalar / grouped-agg (Arrow-vectorized Python);
3. Python UDTF (table function, Spark 4);
4. row-at-a-time `udf()` — deliberately NOT used anywhere in this
   engine; it exists only via `spark.udf.register` for user code.

Everything here is Arrow-batched; nothing iterates Python rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

# DataType objects, not DDL strings: string return types are parsed by
# the JVM at decoration time, which would make importing this module
# require a live SparkContext


@pandas_udf(T.LongType())
def price_band(price: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: 1000-wide price band id.
    Semantically CAST(FLOOR(p/1000) AS BIGINT) — kept as a UDF to
    exercise the Arrow scalar lane against a SQL oracle."""
    return (price // 1000).astype("int64")


@pandas_udf(T.DoubleType())
def geo_mean(x: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: geometric mean = exp(avg(ln(x))).
    One Arrow batch per group partition; partial aggregation is not
    available to Python UDAFs, so groups shuffle whole — acceptable for
    low-cardinality group keys, documented tradeoff vs lane 1."""
    import numpy as np

    return float(np.exp(np.log(x[x > 0]).mean()))


@udtf(returnType=T.StructType([T.StructField("word", T.StringType())]), useArrow=True)
class WordExplode:
    """Python UDTF (lane 3): one output row per space-separated token.
    The same split semantics as the SQL oracle's string_split(text,' ')
    — empty tokens filtered on both sides."""

    def eval(self, text: str):  # noqa: A002
        if text:
            for w in text.split(" "):
                if w:
                    yield (w,)


def register_all(spark) -> None:
    """Expose the UDF surface to SQL users (spark.udf.register /
    spark.udtf.register are the engine's registration API)."""
    spark.udf.register("price_band", price_band)
    spark.udf.register("geo_mean", geo_mean)
    spark.udtf.register("word_explode", WordExplode)


__all__ = ["price_band", "geo_mean", "WordExplode", "register_all", "F"]
