"""Incremental aggregate maintenance (continuous rollup).

The scale problem: a 100 TB fact table with a standing daily/monthly
rollup. Recomputing `GROUP BY month` over the full table per refresh is
O(table); maintaining a rollup of MERGEABLE partial aggregates is
O(delta) — aggregate the new partition, merge it into the stored
rollup by key.

Mergeable state kept per measure: sum, count, min, max (avg finalizes
as sum/count). All merges are pure column expressions:

    new_sum = coalesce(a.sum, 0) + coalesce(b.sum, 0)
    new_min = least(a.min, b.min)        (nulls lose)
    ...

so `partial(delta) ⊕ stored ≡ partial(full)` exactly — associative,
commutative, null-safe. The same shape maintains the canonical price
table's per-month/per-code aggregates under the watermark-driven delta
flow (flows.delta_flow), replacing a full-table rescan per refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SUFFIXES = ("sum", "cnt", "min", "max")


def partial_rollup(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Mergeable per-key state for each measure: _sum/_cnt/_min/_max.
    One partial+final hash aggregation; shuffle carries only key
    cardinality."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(m).alias(f"{m}_sum"),
            F.count(m).alias(f"{m}_cnt"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(a: DataFrame, b: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """⊕: combine two partial states by key (full outer — keys can be
    new, retired, or shared). Column expressions only; associative and
    commutative, so any merge order / grouping of deltas is exact."""
    an = a.select(*keys, *[F.col(c).alias(f"a_{c}") for c in a.columns if c not in keys])
    bn = b.select(*keys, *[F.col(c).alias(f"b_{c}") for c in b.columns if c not in keys])
    joined = an.join(bn, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for m in measures:
        s, c = f"{m}_sum", f"{m}_cnt"
        mn, mx = f"{m}_min", f"{m}_max"
        out_cols += [
            (F.coalesce(F.col(f"a_{s}"), F.lit(0.0)) + F.coalesce(F.col(f"b_{s}"), F.lit(0.0))).alias(s),
            (F.coalesce(F.col(f"a_{c}"), F.lit(0)) + F.coalesce(F.col(f"b_{c}"), F.lit(0))).alias(c),
            F.least(F.col(f"a_{mn}"), F.col(f"b_{mn}")).alias(mn),  # least/greatest skip nulls
            F.greatest(F.col(f"a_{mx}"), F.col(f"b_{mx}")).alias(mx),
        ]
    return joined.select(*out_cols)


def finalize_rollup(state: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Resolve the user-facing aggregates from the mergeable state."""
    out_cols = [F.col(k) for k in keys]
    for m in measures:
        out_cols += [
            F.col(f"{m}_sum").alias(f"sum_{m}"),
            F.col(f"{m}_cnt").alias(f"count_{m}"),
            (F.col(f"{m}_sum") / F.col(f"{m}_cnt")).alias(f"avg_{m}"),
            F.col(f"{m}_min").alias(f"min_{m}"),
            F.col(f"{m}_max").alias(f"max_{m}"),
        ]
    return state.select(*out_cols)
