"""As-of join (J4 [GAP]): for each left row, the most recent right row
with right.ts <= left.ts within the same key.

Spark has no built-in as-of join. The scalable implementation is the
union-merge trick, NOT a range cross-join:

  1. tag both sides and union them on a common column layout,
  2. one shuffle: partition by key, sort by (ts, side) — right rows
     sort before left rows at equal ts so the match is inclusive,
  3. per row, `last(payload, ignorenulls=True)` over the running frame
     carries the latest right payload forward,
  4. keep only left rows.

Cost: one shuffle of |L|+|R| rows, no blow-up — this survives 100 TB
where a `JOIN ON l.ts >= r.ts` theta-join would explode. Skewed keys
are handled by AQE skew-join after the union's repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_KEY = "__asof_key"
_TS = "__asof_ts"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join; unmatched left rows keep null payload columns.

    ``payload``: right-side columns to carry onto each left row.
    ``direction``: 'backward' (latest right.ts <= left.ts, the default)
    or 'forward' (earliest right.ts >= left.ts) — forward is the same
    union-merge with the sort reversed, still one shuffle.
    ``tolerance``: max |left.ts - matched.ts| to accept, in SECONDS for
    timestamp columns / plain units for numerics (pandas merge_asof
    semantics: a match farther than tolerance becomes null).
    If several right rows share (key, ts), pre-deduplicate `right` —
    the match among exact ties is otherwise unspecified (DuckDB ASOF
    has the same caveat).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    # The payload rides in ONE struct column so a null field inside a
    # right row can't make ignorenulls fall back to an older row for
    # just that field (row atomicity). The matched ts rides along for
    # the tolerance check.
    pay = "__asof_payload"
    left_types = dict(left.dtypes)
    left_cols = list(left.columns)

    r = right.select(
        F.col(right_key).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*payload, F.col(right_ts).alias("__matched_ts")).alias(pay),
    )
    for c in left_cols:
        r = r.withColumn(c, F.lit(None).cast(left_types[c]))

    l = (
        left.withColumn(_KEY, F.col(left_key))
        .withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(pay, F.lit(None).cast(r.schema[pay].dataType))
    )

    ordered_cols = left_cols + [pay, _KEY, _TS, _SIDE]
    unioned = l.select(*ordered_cols).unionByName(r.select(*ordered_cols))

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        W.partitionBy(_KEY)
        .orderBy(ts_order, F.col(_SIDE).asc())  # right rows first at equal ts → inclusive
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left_cols,
        _TS,
        _SIDE,
        F.last(pay, ignorenulls=True).over(w).alias(pay),
    )
    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        matched = F.col(f"{pay}.__matched_ts")
        l_type = dict(left.dtypes)[left_ts]
        r_type = dict(right.dtypes)[right_ts]
        is_ts = r_type.startswith("timestamp")
        if is_ts and "timestamp_ntz" in (l_type, r_type):
            # unix_micros rejects TIMESTAMP_NTZ, so NTZ goes through a
            # cast to TIMESTAMP — which relabels the wall time in the
            # SESSION timezone. That is instant-preserving arithmetic
            # only under a fixed-offset zone: in a DST zone, two wall
            # times straddling a transition skew the diff by the DST
            # shift. load_table forces UTC, but guard HERE so any other
            # caller fails loudly instead of silently mis-matching.
            tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "GMT", "Z", "+00:00", "Etc/UTC", "Etc/GMT"):
                raise ValueError(
                    "as_of_join tolerance over TIMESTAMP_NTZ needs a UTC "
                    f"session timezone; spark.sql.session.timeZone={tz!r}. "
                    "Set it to UTC (sources.readers.load_table does) or "
                    "cast the ts columns to TIMESTAMP first."
                )
        if is_ts:
            diff = (
                F.abs(
                    F.unix_micros(F.col(_TS).cast("timestamp"))
                    - F.unix_micros(matched.cast("timestamp"))
                )
                / F.lit(1e6)
            )
        else:
            diff = F.abs(F.col(_TS) - matched)
        out = out.withColumn(
            pay, F.when(diff <= F.lit(tolerance), F.col(pay))  # else null payload
        )
    return out.select(*left_cols, *[F.col(f"{pay}.{c}").alias(c) for c in payload])
