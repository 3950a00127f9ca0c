"""Explicit schemas for every table the engine touches.

The reference infers all schemas from REST/CSV payloads (SURVEY.md §1.2);
we make them explicit StructTypes — `spark.read.schema(...)`, never
`inferSchema` (schema inference is a full extra pass over 100 TB).

Two groups:
- A*: Tushare-shaped source tables + the canonical wide table, mirroring
  the reference pipeline (column lists cite /root/reference file:line).
- TESTDATA: the driver's TPC-H-ish parquet tables (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(cols: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in cols])


D = T.DoubleType()
S = T.StringType()

# --- A1. stock_basic dimension (reference market/non_fq_daily_kline.py:39-47)
STOCK_BASIC = _struct(
    [
        ("ts_code", S),
        ("name", S),
        ("area", S),
        ("industry", S),
        ("market", S),
        ("exchange", S),
        ("list_date", S),  # yyyyMMdd on the wire; cast at assembly
    ]
)

# --- A2. daily kline fact (reference market/non_fq_daily_kline.py:67)
DAILY = _struct(
    [
        ("ts_code", S),
        ("trade_date", S),
        ("open", D),
        ("high", D),
        ("low", D),
        ("close", D),
        ("pre_close", D),
        ("pct_chg", D),
        ("vol", D),
        ("amount", D),
    ]
)

# --- A3. stk_limit fact (reference market/non_fq_daily_kline.py:75)
STK_LIMIT = _struct(
    [
        ("ts_code", S),
        ("trade_date", S),
        ("up_limit", D),
        ("down_limit", D),
    ]
)

# --- A4. daily_basic fact (reference market/non_fq_daily_kline.py:84)
DAILY_BASIC = _struct(
    [
        ("ts_code", S),
        ("trade_date", S),
        ("turnover_rate", D),
        ("turnover_rate_f", D),
        ("volume_ratio", D),
        ("pe", D),
        ("pe_ttm", D),
        ("pb", D),
        ("ps", D),
        ("ps_ttm", D),
        ("dv_ratio", D),
        ("dv_ttm", D),
        ("total_share", D),
        ("float_share", D),
        ("free_share", D),
        ("total_mv", D),
        ("circ_mv", D),
    ]
)

# --- A5. trade_cal (reference market/trade_calendar.py:27-29)
TRADE_CAL = _struct([("cal_date", S)])

# --- A6. canonical wide table, 31 cols + key, column order as the
# reference writes it (rename map market/non_fq_daily_kline.py:113-124).
CANONICAL = _struct(
    [
        ("code", S),
        ("date", T.DateType()),
        ("open", D),
        ("high", D),
        ("low", D),
        ("close", D),
        ("prev_close", D),
        ("quote_rate", D),
        ("volume", D),
        ("turnover", D),
        ("high_limit", D),
        ("low_limit", D),
        ("turnover_rate", D),
        ("turnover_rate_f", D),
        ("volume_ratio", D),
        ("pe", D),
        ("pe_ttm", D),
        ("pb", D),
        ("ps", D),
        ("ps_ttm", D),
        ("dv_ratio", D),
        ("dv_ttm", D),
        ("total_share", D),
        ("float_share", D),
        ("free_share", D),
        ("total_mv", D),
        ("circ_mv", D),
        ("name", S),
        ("area", S),
        ("industry", S),
        ("market", S),
        ("exchange", S),
        ("list_date", T.DateType()),
    ]
)

# --- A7. published calendar output
CALENDAR = _struct([("cal_date", T.DateType())])

# --- Driver testdata (FIXTURES.md §B). Parquet carries its own footer
# schema; these exist for validation and for CSV round-trip tests.
TESTDATA = {
    "region": _struct([("r_regionkey", T.IntegerType()), ("r_name", S)]),
    "nation": _struct(
        [("n_nationkey", T.IntegerType()), ("n_name", S), ("n_regionkey", T.IntegerType())]
    ),
    "customer": _struct(
        [
            ("c_custkey", T.LongType()),
            ("c_name", S),
            ("c_nationkey", T.IntegerType()),
            ("c_acctbal", D),
            ("c_mktsegment", S),
        ]
    ),
    "supplier": _struct(
        [
            ("s_suppkey", T.LongType()),
            ("s_name", S),
            ("s_nationkey", T.IntegerType()),
            ("s_acctbal", D),
        ]
    ),
    "part": _struct(
        [
            ("p_partkey", T.LongType()),
            ("p_name", S),
            ("p_brand", S),
            ("p_type", S),
            ("p_size", T.IntegerType()),
            ("p_retailprice", D),
        ]
    ),
    "orders": _struct(
        [
            ("o_orderkey", T.LongType()),
            ("o_custkey", T.LongType()),
            ("o_orderstatus", S),
            ("o_totalprice", D),
            ("o_orderdate", T.TimestampType()),
            ("o_orderpriority", S),
        ]
    ),
    "lineitem": _struct(
        [
            ("l_orderkey", T.LongType()),
            ("l_partkey", T.LongType()),
            ("l_suppkey", T.LongType()),
            ("l_linenumber", T.IntegerType()),
            ("l_quantity", D),
            ("l_extendedprice", D),
            ("l_discount", D),
            ("l_tax", D),
            ("l_returnflag", S),
            ("l_linestatus", S),
            ("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": _struct(
        [
            ("event_id", T.LongType()),
            ("ts", T.TimestampType()),
            ("user_id", T.LongType()),
            ("event_type", S),
            ("value", D),
            ("props", S),
        ]
    ),
    "documents": _struct(
        [
            ("doc_id", T.LongType()),
            ("text", S),
            ("lang", S),
            ("source", S),
            ("n_chars", T.LongType()),
        ]
    ),
    "embeddings": _struct(
        [
            ("vec_id", T.LongType()),
            ("embedding", T.ArrayType(T.FloatType())),
            ("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)
