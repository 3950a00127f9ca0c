"""as_of_join vs pandas.merge_asof goldens: backward/forward directions
and tolerance, on randomized inputs — pandas is the reference semantics
(the same semantics DuckDB ASOF implements for backward)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from a_share_data_pipeline_spark.operators.asof import as_of_join


def _gen(seed: int, n_left: int = 60, n_right: int = 40):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n_left),
            "lt": rng.randint(0, 1000, n_left).astype("float64"),
            "lv": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n_right),
            "rt": rng.randint(0, 1000, n_right).astype("float64"),
            "rv": np.arange(n_right, dtype="int64"),
        }
    ).drop_duplicates(["k", "rt"])  # unique (key, ts): tie order is unspecified otherwise
    return left, right


def _golden(left, right, direction, tolerance=None):
    kwargs = {}
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    g = pd.merge_asof(
        left.sort_values("lt", kind="stable"),
        right.sort_values("rt", kind="stable"),
        left_on="lt",
        right_on="rt",
        left_by="k",
        right_by="k",
        direction=direction,
        **kwargs,
    )
    return sorted(
        (r.k, r.lt, r.lv, None if pd.isna(r.rv) else int(r.rv)) for r in g.itertuples()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [7, 21])
def test_asof_matches_pandas(spark, direction, seed):
    left, right = _gen(seed)
    sl = spark.createDataFrame(left, "k string, lt double, lv long")
    sr = spark.createDataFrame(right, "k string, rt double, rv long")
    out = as_of_join(
        sl, sr, left_key="k", right_key="k", left_ts="lt", right_ts="rt",
        payload=["rv"], direction=direction,
    )
    got = sorted((r.k, r.lt, r.lv, r.rv) for r in out.collect())
    assert got == _golden(left, right, direction)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance_matches_pandas(spark, direction):
    left, right = _gen(99)
    sl = spark.createDataFrame(left, "k string, lt double, lv long")
    sr = spark.createDataFrame(right, "k string, rt double, rv long")
    tol = 50.0
    out = as_of_join(
        sl, sr, left_key="k", right_key="k", left_ts="lt", right_ts="rt",
        payload=["rv"], direction=direction, tolerance=tol,
    )
    got = sorted((r.k, r.lt, r.lv, r.rv) for r in out.collect())
    assert got == _golden(left, right, direction, tolerance=tol)
    # tolerance must actually null out some far matches on this data
    n_matched_tol = sum(1 for t in got if t[3] is not None)
    n_matched_free = sum(
        1 for t in _golden(left, right, direction) if t[3] is not None
    )
    assert n_matched_tol < n_matched_free
