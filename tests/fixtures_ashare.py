"""Deterministic Tushare-shaped fixtures (FIXTURES.md §A, seed 42) plus
a pandas "reference emulator" that replays the exact operations the
reference performs — the goldens for SURVEY.md §5.1.

The emulator is intentionally written with the reference's own pandas
idioms (set_index → concat(axis=1) → join → dropna → rename) so the
goldens carry its semantics, NaN behavior included; it cites the lines
it replays. It is NOT engine code — the engine is the Spark side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

AREAS = ["上海", "深圳", "北京", "广东", "浙江"]
INDUSTRIES = ["银行", "软件", "医药", "汽车", "钢铁"]
MARKETS = ["主板", "主板", "主板", "创业板", "科创板"]  # main-board-heavy mix
NAMES = ["浦发银行", "万科A", "贵州茅台", "宁德时代", "中芯国际"]


def gen_trade_cal(n_days: int = 30, start: str = "2024-01-01") -> pd.DataFrame:
    """A5: Mon-Fri minus two 'holiday' gaps, yyyyMMdd strings."""
    days = pd.bdate_range(start, periods=n_days + 2)
    keep = [d for i, d in enumerate(days) if i not in (7, 19)][:n_days]
    return pd.DataFrame({"cal_date": [d.strftime("%Y%m%d") for d in keep]})


def gen_stock_basic(n: int = 20) -> pd.DataFrame:
    rng = np.random.RandomState(SEED)
    rows = []
    for i in range(n):
        exch = "SH" if i % 2 == 0 else "SZ"
        rows.append(
            {
                "ts_code": f"{600000 + i:06d}.{exch}",
                "name": NAMES[i % len(NAMES)] + str(i),
                "area": AREAS[i % len(AREAS)],
                "industry": INDUSTRIES[i % len(INDUSTRIES)],
                "market": MARKETS[i % len(MARKETS)],
                "exchange": "SSE" if exch == "SH" else "SZSE",
                "list_date": f"{2000 + rng.randint(0, 20)}{rng.randint(1, 13):02d}{rng.randint(1, 29):02d}",
            }
        )
    return pd.DataFrame(rows)


def gen_facts(
    stock_basic: pd.DataFrame, trade_cal: pd.DataFrame
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """A2/A3/A4 with the edge cases the goldens depend on:
    - a few null `close` rows in daily (exercises dropna P5)
    - stk_limit / daily_basic missing some (ts_code, trade_date) pairs
      present in daily (exercises outer-concat→left-join NaN keep)
    - null pe/pe_ttm for 'loss-making' stocks (nulls surviving to output)
    """
    rng = np.random.RandomState(SEED + 1)
    daily_rows, limit_rows, basic_rows = [], [], []
    dates = list(trade_cal["cal_date"])
    for _, stk in stock_basic.iterrows():
        base = float(rng.uniform(5, 100))
        prev = base
        for d in dates:
            close = prev * float(1 + rng.normal(0, 0.02))
            row = {
                "ts_code": stk.ts_code,
                "trade_date": d,
                "open": round(prev * float(1 + rng.normal(0, 0.005)), 2),
                "high": round(max(prev, close) * 1.01, 2),
                "low": round(min(prev, close) * 0.99, 2),
                "close": round(close, 2),
                "pre_close": round(prev, 2),
                "pct_chg": round((close - prev) / prev * 100, 4),
                "vol": float(rng.randint(1_000, 500_000)),
                "amount": round(float(rng.uniform(1e3, 1e6)), 3),
            }
            if rng.rand() < 0.03:  # suspended day → no close
                row["close"] = np.nan
            daily_rows.append(row)
            if rng.rand() >= 0.05:  # 5% of pairs missing from stk_limit
                limit_rows.append(
                    {
                        "ts_code": stk.ts_code,
                        "trade_date": d,
                        "up_limit": round(prev * 1.1, 2),
                        "down_limit": round(prev * 0.9, 2),
                    }
                )
            if rng.rand() >= 0.05:  # and from daily_basic
                loss_making = rng.rand() < 0.15
                basic_rows.append(
                    {
                        "ts_code": stk.ts_code,
                        "trade_date": d,
                        "turnover_rate": round(float(rng.uniform(0.1, 5)), 4),
                        "turnover_rate_f": round(float(rng.uniform(0.1, 5)), 4),
                        "volume_ratio": round(float(rng.uniform(0.5, 3)), 2),
                        "pe": np.nan if loss_making else round(float(rng.uniform(5, 80)), 4),
                        "pe_ttm": np.nan if loss_making else round(float(rng.uniform(5, 80)), 4),
                        "pb": round(float(rng.uniform(0.5, 10)), 4),
                        "ps": round(float(rng.uniform(0.5, 20)), 4),
                        "ps_ttm": round(float(rng.uniform(0.5, 20)), 4),
                        "dv_ratio": round(float(rng.uniform(0, 5)), 4),
                        "dv_ttm": round(float(rng.uniform(0, 5)), 4),
                        "total_share": round(float(rng.uniform(1e4, 1e6)), 4),
                        "float_share": round(float(rng.uniform(1e4, 1e6)), 4),
                        "free_share": round(float(rng.uniform(1e4, 1e6)), 4),
                        "total_mv": round(float(rng.uniform(1e5, 1e7)), 4),
                        "circ_mv": round(float(rng.uniform(1e5, 1e7)), 4),
                    }
                )
            prev = close if not np.isnan(row["close"]) else prev
    return pd.DataFrame(daily_rows), pd.DataFrame(limit_rows), pd.DataFrame(basic_rows)


# ---------------------------------------------------------------------------
# Reference emulator (pandas, the reference's own idioms) → goldens
# ---------------------------------------------------------------------------

RENAME_MAP = {  # market/non_fq_daily_kline.py:113-120
    "pre_close": "prev_close",
    "pct_chg": "quote_rate",
    "vol": "volume",
    "amount": "turnover",
    "up_limit": "high_limit",
    "down_limit": "low_limit",
}

CANONICAL_ORDER = [
    "code", "date",
    "open", "high", "low", "close", "prev_close", "quote_rate", "volume", "turnover",
    "high_limit", "low_limit",
    "turnover_rate", "turnover_rate_f", "volume_ratio",
    "pe", "pe_ttm", "pb", "ps", "ps_ttm", "dv_ratio", "dv_ttm",
    "total_share", "float_share", "free_share", "total_mv", "circ_mv",
    "name", "area", "industry", "market", "exchange", "list_date",
]  # fmt: skip


def _keyed(df: pd.DataFrame) -> pd.DataFrame:
    # market/non_fq_daily_kline.py:65-66 etc.: MultiIndex (ts_code, trade_date)
    return df.set_index(["ts_code", "trade_date"])


def _finish(merged: pd.DataFrame, stock_basic: pd.DataFrame) -> pd.DataFrame:
    """rename → re-key (code,date) → cast dates → canonical order
    (market/non_fq_daily_kline.py:110-124)."""
    out = merged.rename(columns=RENAME_MAP)
    out.index = out.index.set_names(["code", "date"])
    out = out.reset_index()
    out["date"] = pd.to_datetime(out["date"], format="%Y%m%d").dt.date
    out["list_date"] = pd.Series(
        pd.to_datetime(out["list_date"], format="%Y%m%d").dt.date, dtype=object
    )
    return out[CANONICAL_ORDER]


def golden_backfill(
    daily: pd.DataFrame,
    stk_limit: pd.DataFrame,
    daily_basic: pd.DataFrame,
    stock_basic: pd.DataFrame,
) -> pd.DataFrame:
    """Backfill golden (market/non_fq_daily_kline.py:87-124): the
    per-stock loop fetches ONLY filtered dim keys (:54-57), so emulate
    by restricting facts to main-board codes, then per-stock concat
    (axis=1 outer) → LEFT join dim row (:104) → dropna close (:106)."""
    dim = stock_basic[stock_basic["market"] == "主板"]  # :48
    codes = set(dim["ts_code"])
    pick = lambda df: _keyed(df[df["ts_code"].isin(codes)])  # noqa: E731
    merged = pd.concat([pick(daily), pick(stk_limit), pick(daily_basic)], axis=1)  # :99
    merged = merged.join(dim.set_index("ts_code"))  # :101-104 (left)
    merged = merged.dropna(subset=["close"])  # :106
    return _finish(merged, stock_basic)


def golden_delta(
    daily: pd.DataFrame,
    stk_limit: pd.DataFrame,
    daily_basic: pd.DataFrame,
    stock_basic: pd.DataFrame,
    after: str,
    until: str,
) -> pd.DataFrame:
    """Delta golden (market/delta_non_fq_daily_kline.py:63-99): facts
    for days in (after, until], concat axis=1, INNER join the filtered
    dim (:84 — the join IS the main-board filter), dropna close (:85)."""
    dim = stock_basic[stock_basic["market"] == "主板"]  # :61
    sel = lambda df: _keyed(  # noqa: E731
        df[(df["trade_date"] > after) & (df["trade_date"] <= until)]
    )
    merged = pd.concat([sel(daily), sel(stk_limit), sel(daily_basic)], axis=1)  # :83
    merged = merged.join(dim.set_index("ts_code"), how="inner")  # :84
    merged = merged.dropna(subset=["close"])  # :85
    return _finish(merged, stock_basic)
