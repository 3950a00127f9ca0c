"""The reference's three flow entry points, re-expressed as Spark jobs.

Reference (SURVEY.md §3):
  1. fetch_non_fq_daily_kline  (market/non_fq_daily_kline.py:159-174)
     — full backfill: per-stock fetch → 3-way merge → dim enrich →
       CSV append → publish → set watermark
  2. fetch_delta_non_fq_daily_kline
     (market/delta_non_fq_daily_kline.py:170-181)
     — incremental: watermark → per-day fetch → merge → inner-join dim
       → append → download+UNION ALL+overwrite published → advance wm
  3. fetch_trade_calendar_flow (market/trade_calendar.py:45-50)
     — calendar: fetch open days → cast → sort → overwrite → publish

The per-stock / per-day driver loops become ONE lazy plan each: the
loop dimension is just a filter on the scan (Catalyst prunes it into
the source), and the reference's 3-thread fetch barrier disappears —
the three fact tables are three scans joined in one job, parallelism
comes from partitioning, not threads.

Sources arrive as a `TableSource` (sources/api_source.py) or plain
DataFrames — the engine never knows whether rows came from Tushare,
fixtures, or parquet.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import assembly
from .sources import sinks
from .streaming.incremental import WatermarkStore

PRICES_FILE = "all-prices.csv"
CALENDAR_FILE = "calendar.csv"
WATERMARK_FILE = ".last_update_date"


def backfill_flow(
    spark: SparkSession,
    daily: DataFrame,
    stk_limit: DataFrame,
    daily_basic: DataFrame,
    stock_basic: DataFrame,
    out_path: str,
    publisher: sinks.Publisher | None = None,
    watermark: WatermarkStore | None = None,
    end: date | None = None,
) -> DataFrame:
    """Entry point 1. The reference iterates filtered dim keys and
    appends per stock (market/non_fq_daily_kline.py:54-58); here the
    key-driven scan IS the left join against the filtered dim — same
    output set, one declarative plan (SURVEY.md §2.3 'key asymmetry')."""
    canonical = assembly.assemble_canonical(
        daily, stk_limit, daily_basic, stock_basic, mode="backfill"
    )
    sinks.append_csv(canonical, out_path)
    if publisher is not None:
        publisher.upload(out_path, PRICES_FILE)
    if watermark is not None and end is not None:
        watermark.write(end)  # initial watermark set, ref :148-156
        if publisher is not None:
            publisher.upload(watermark.path, WATERMARK_FILE)
    return canonical


def delta_flow(
    spark: SparkSession,
    daily: DataFrame,
    stk_limit: DataFrame,
    daily_basic: DataFrame,
    stock_basic: DataFrame,
    staging_path: str,
    publisher: sinks.LocalDirPublisher,
    watermark: WatermarkStore,
    end: date,
    calendar: DataFrame | None = None,
    mode: str = "compat",
    slack_days: int = 0,
) -> DataFrame | None:
    """Entry point 2. The reference's day loop + skip-empty + thread
    barrier (market/delta_non_fq_daily_kline.py:71-107) collapses to a
    date-range filter on each fact scan — at scale this is static
    partition pruning to exactly the pending date partitions.

    mode='compat' (default) keeps reference semantics on purpose:
    published = old UNION ALL new with NO dedup (U1 — a crash rerun
    duplicates rows), and late rows before the watermark are lost
    forever (§2.9).

    mode='merge' is the strictly-better upgrade the reference can't do:
    the delta window re-opens `slack_days` behind the watermark (so a
    source backfilling a recent past date is picked up), and the
    publish is an idempotent key-merge — reruns and the re-read slack
    window dedup on (code, date), delta rows winning."""
    if mode not in ("compat", "merge"):
        raise ValueError(f"unknown mode: {mode}")
    wm = watermark.read()
    if wm is None:
        raise ValueError("delta flow needs an existing watermark")
    from datetime import timedelta

    slack_from = wm - timedelta(days=slack_days) if mode == "merge" else wm
    lo = F.lit(slack_from.strftime("%Y%m%d"))
    hi = F.lit(end.strftime("%Y%m%d"))
    in_range = lambda df: df.filter(  # noqa: E731
        (F.col("trade_date") > lo) & (F.col("trade_date") <= hi)
    )
    if calendar is not None:
        # improvement over the reference (which fetches wall-clock days
        # and skips empties): semi-join facts to open trading days
        cal = calendar.select(F.col("cal_date").alias("trade_date"))
        in_range_cal = lambda df: in_range(df).join(  # noqa: E731
            F.broadcast(cal), "trade_date", "left_semi"
        )
    else:
        in_range_cal = in_range

    delta = assembly.assemble_canonical(
        in_range_cal(daily),
        in_range_cal(stk_limit),
        in_range_cal(daily_basic),
        stock_basic,
        mode="delta",  # inner dim join doubles as the main-board filter (J3)
    )
    if delta.isEmpty():  # P6: no new rows → no publish, no advance
        return None

    sinks.append_csv(delta, staging_path)  # local delta CSV, ref :101-107

    from .schemas import CANONICAL
    from .sources.readers import read_csv
    from .streaming.incremental import merge_increment

    if publisher.exists(PRICES_FILE):
        existing = read_csv(spark, publisher.download(PRICES_FILE), CANONICAL)
        # compat: U1 bag union, no dedup; merge: idempotent, delta wins
        merged = merge_increment(existing, delta, keys=["code", "date"], mode=mode)
    else:
        merged = delta
    published_local = staging_path + ".published"
    sinks.overwrite_csv(merged, published_local)
    publisher.upload(published_local, PRICES_FILE)

    watermark.write(end)  # advance ONLY after publish success (T1)
    publisher.upload(watermark.path, WATERMARK_FILE)
    return delta


def calendar_flow(
    spark: SparkSession,
    trade_cal: DataFrame,
    out_path: str,
    publisher: sinks.Publisher | None = None,
) -> DataFrame:
    """Entry point 3 (market/trade_calendar.py:24-29): open days only
    (the is_open='1' predicate is pushed into the source), cast, sort
    ascending, single-file overwrite, publish."""
    cal = (
        trade_cal.select(F.to_date(F.col("cal_date"), "yyyyMMdd").alias("cal_date"))
        .orderBy("cal_date")
    )
    sinks.overwrite_csv(cal, out_path)
    if publisher is not None:
        publisher.upload(out_path, CALENDAR_FILE)
    return cal
