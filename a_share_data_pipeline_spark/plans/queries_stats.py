"""Round-6 wave 20: classical-inference completion — Welch's unequal-
variance t-test, one-way ANOVA (the k-group generalization), and an
exact-arithmetic permutation test whose resamples are md5-derived and
therefore reproducible on both engines.

Same discipline as waves 5-19: moments accumulate as exact integers
(int64 cents; squares in decimal/hugeint so no SF ever wraps), pivots
collapse per-group rows into COLUMNS so cross-group sums chain in a
FIXED literal order (never a float fold over an aggregation), and the
permutation-test comparison is a pure integer cross-multiply — the
p-value never touches a float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# Welch's t-test: purchase vs click order values (wave 20)
# ---------------------------------------------------------------------------

_WELCH_SQL = """
WITH cents AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click')
),
m AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s,
         SUM(CAST(c AS HUGEINT) * c) AS q
  FROM cents GROUP BY g
),
piv AS (
  SELECT MAX(CASE WHEN g = 'purchase' THEN n END) AS n1,
         MAX(CASE WHEN g = 'click' THEN n END) AS n2,
         MAX(CASE WHEN g = 'purchase' THEN CAST(s AS DOUBLE) END) AS s1,
         MAX(CASE WHEN g = 'click' THEN CAST(s AS DOUBLE) END) AS s2,
         MAX(CASE WHEN g = 'purchase' THEN CAST(n * q - s * s AS DOUBLE) END) AS vnum1,
         MAX(CASE WHEN g = 'click' THEN CAST(n * q - s * s AS DOUBLE) END) AS vnum2
  FROM m
),
stats AS (
  SELECT n1, n2,
         s1 / n1 / 100.0 AS m1, s2 / n2 / 100.0 AS m2,
         vnum1 / n1 / (n1 - 1) AS v1c, vnum2 / n2 / (n2 - 1) AS v2c
  FROM piv
)
SELECT n1, n2,
       ROUND(m1, 6) AS mean_1, ROUND(m2, 6) AS mean_2,
       ROUND((m1 - m2) / sqrt(v1c / 10000.0 / n1 + v2c / 10000.0 / n2), 4) AS t_stat,
       ROUND(
         (v1c / n1 + v2c / n2) * (v1c / n1 + v2c / n2)
         / ((v1c / n1) * (v1c / n1) / (n1 - 1) + (v2c / n2) * (v2c / n2) / (n2 - 1)),
         2) AS welch_dof,
       ROUND((m1 - m2) / sqrt(
         ((n1 - 1) * (v1c / 10000.0) + (n2 - 1) * (v2c / 10000.0)) / (n1 + n2 - 2)
       ), 4) AS cohens_d
FROM stats
"""


@register(
    "stats_welch_ttest",
    _WELCH_SQL,
    doc=(
        "Welch's unequal-variance t-test (purchase vs click order "
        "values) + Satterthwaite dof + Cohen's d: per-group count, "
        "sum, and sum-of-squares accumulate in ONE scan as exact "
        "integers (cents; the square sums in 128-bit so no scale "
        "factor wraps), the variance numerator n·Σx²−(Σx)² is an "
        "exact integer BEFORE its single cast to double, and the two "
        "groups pivot into columns so every cross-group expression is "
        "a fixed chain of IEEE ops over bit-identical inputs — the "
        "only rounding is on the emitted t/dof/d. O(1) result from "
        "O(n) scan; the shuffle carries 2 rows"
    ),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    c = dround(F.col("value") * 100, 0).cast("bigint")
    cd = c.cast("decimal(18,0)")
    m = ev.select(F.col("event_type").alias("g"), c.alias("c"), (cd * cd).alias("c2")).groupBy(
        "g"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum("c2").alias("q"),
    )
    g, n, s, q = F.col("g"), F.col("n"), F.col("s"), F.col("q")
    piv = m.agg(
        F.max(F.when(g == "purchase", n)).alias("n1"),
        F.max(F.when(g == "click", n)).alias("n2"),
        F.max(F.when(g == "purchase", s.cast("double"))).alias("s1"),
        F.max(F.when(g == "click", s.cast("double"))).alias("s2"),
        F.max(F.when(g == "purchase", (n * q - s * s).cast("double"))).alias("vnum1"),
        F.max(F.when(g == "click", (n * q - s * s).cast("double"))).alias("vnum2"),
    )
    stats = piv.select(
        "n1",
        "n2",
        (F.col("s1") / F.col("n1") / F.lit(100.0)).alias("m1"),
        (F.col("s2") / F.col("n2") / F.lit(100.0)).alias("m2"),
        (F.col("vnum1") / F.col("n1") / (F.col("n1") - 1)).alias("v1c"),
        (F.col("vnum2") / F.col("n2") / (F.col("n2") - 1)).alias("v2c"),
    )
    n1, n2, m1, m2 = F.col("n1"), F.col("n2"), F.col("m1"), F.col("m2")
    v1n, v2n = F.col("v1c") / n1, F.col("v2c") / n2  # still cents²-scaled
    v1d, v2d = F.col("v1c") / F.lit(10000.0), F.col("v2c") / F.lit(10000.0)
    return stats.select(
        n1,
        n2,
        dround(m1, 6).alias("mean_1"),
        dround(m2, 6).alias("mean_2"),
        dround((m1 - m2) / F.sqrt(v1d / n1 + v2d / n2), 4).alias("t_stat"),
        dround(
            (v1n + v2n)
            * (v1n + v2n)
            / (v1n * v1n / (n1 - 1) + v2n * v2n / (n2 - 1)),
            2,
        ).alias("welch_dof"),
        dround(
            (m1 - m2)
            / F.sqrt(((n1 - 1) * v1d + (n2 - 1) * v2d) / (n1 + n2 - 2)),
            4,
        ).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA across all five event types (wave 20)
# ---------------------------------------------------------------------------

_TYPES = ("click", "error", "purchase", "signup", "view")  # fixed literal
# order: cross-group sums chain left-associatively in THIS order on
# both engines — never a float fold over an aggregation

_ANOVA_PIV = ",\n         ".join(
    f"MAX(CASE WHEN g = '{t}' THEN n END) AS n_{t},\n"
    f"         MAX(CASE WHEN g = '{t}' THEN CAST(s AS DOUBLE) END) AS s_{t},\n"
    f"         MAX(CASE WHEN g = '{t}' THEN CAST(q AS DOUBLE) END) AS q_{t}"
    for t in _TYPES
)
_ANOVA_N = " + ".join(f"n_{t}" for t in _TYPES)
_ANOVA_S = " + ".join(f"s_{t}" for t in _TYPES)
_ANOVA_Q = " + ".join(f"q_{t}" for t in _TYPES)
_ANOVA_SSB_TERMS = " + ".join(f"s_{t} * s_{t} / n_{t}" for t in _TYPES)

_ANOVA_SQL = f"""
WITH cents AS (
  SELECT event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s,
         SUM(CAST(c AS HUGEINT) * c) AS q
  FROM cents GROUP BY g
),
piv AS (
  SELECT {_ANOVA_PIV}
  FROM m
),
tot AS (
  SELECT {len(_TYPES)} AS k, ({_ANOVA_N}) AS n_total,
         (({_ANOVA_SSB_TERMS}) - ({_ANOVA_S}) * ({_ANOVA_S}) / ({_ANOVA_N})) / 10000.0 AS ssb,
         (({_ANOVA_Q}) - ({_ANOVA_SSB_TERMS})) / 10000.0 AS ssw
  FROM piv
)
SELECT CAST(k AS INT) AS k, CAST(n_total AS BIGINT) AS n_total,
       ROUND(ssb, 4) AS ss_between,
       ROUND(ssw, 4) AS ss_within,
       ROUND((ssb / (k - 1)) / (ssw / (n_total - k)), 4) AS f_stat
FROM tot
"""


@register(
    "stats_anova_oneway",
    _ANOVA_SQL,
    doc=(
        "one-way ANOVA F across all five event-type groups: the "
        "k-group generalization of the Welch row. One scan "
        "accumulates exact integer (n, Σc, Σc²) per group (squares "
        "128-bit), the five groups pivot into COLUMNS, and SSB/SSW "
        "come from the textbook identities Σs_g²/n_g − S²/N and "
        "Q − Σs_g²/n_g where every sum over groups is a FIXED "
        "left-associative literal-order chain — the only fold a "
        "float ever sees has one deterministic shape on both "
        "engines. F emits with one rounding; the shuffle carries "
        "k=5 rows"
    ),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = dround(F.col("value") * 100, 0).cast("bigint")
    cd = c.cast("decimal(18,0)")
    m = (
        ev.select(F.col("event_type").alias("g"), c.alias("c"), (cd * cd).alias("c2"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("decimal(38,0)").alias("s"),
            F.sum("c2").alias("q"),
        )
    )
    g = F.col("g")
    aggs = []
    for t in _TYPES:
        aggs.append(F.max(F.when(g == t, F.col("n"))).alias(f"n_{t}"))
        aggs.append(F.max(F.when(g == t, F.col("s").cast("double"))).alias(f"s_{t}"))
        aggs.append(F.max(F.when(g == t, F.col("q").cast("double"))).alias(f"q_{t}"))
    piv = m.agg(*aggs)

    def chain(cols: list[F.Column]) -> F.Column:
        out = cols[0]
        for x in cols[1:]:
            out = out + x
        return out

    n_total = chain([F.col(f"n_{t}") for t in _TYPES])
    s_total = chain([F.col(f"s_{t}") for t in _TYPES])
    q_total = chain([F.col(f"q_{t}") for t in _TYPES])
    ssb_terms = chain([F.col(f"s_{t}") * F.col(f"s_{t}") / F.col(f"n_{t}") for t in _TYPES])
    tot = piv.select(
        F.lit(len(_TYPES)).alias("k"),
        n_total.alias("n_total"),
        ((ssb_terms - s_total * s_total / n_total) / F.lit(10000.0)).alias("ssb"),
        ((q_total - ssb_terms) / F.lit(10000.0)).alias("ssw"),
    )
    k, nt = F.col("k"), F.col("n_total")
    return tot.select(
        k.cast("int").alias("k"),
        nt.cast("bigint").alias("n_total"),
        dround(F.col("ssb"), 4).alias("ss_between"),
        dround(F.col("ssw"), 4).alias("ss_within"),
        dround((F.col("ssb") / (k - 1)) / (F.col("ssw") / (nt - k)), 4).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Permutation test with md5-deterministic resamples (wave 20)
# ---------------------------------------------------------------------------

_N_PERMS = 100

_PERM_SQL = f"""
WITH base AS (
  SELECT event_id, event_type AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'click')
),
obs AS (
  SELECT CAST(SUM(CASE WHEN g = 'purchase' THEN c ELSE 0 END) AS HUGEINT) AS s1,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN g = 'click' THEN c ELSE 0 END) AS HUGEINT) AS s2,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS HUGEINT) AS n2
  FROM base
),
perms AS (
  SELECT x.p,
         CAST(SUM(CASE WHEN flip THEN c ELSE 0 END) AS HUGEINT) AS s1,
         CAST(SUM(CASE WHEN flip THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN NOT flip THEN c ELSE 0 END) AS HUGEINT) AS s2,
         CAST(SUM(CASE WHEN NOT flip THEN 1 ELSE 0 END) AS HUGEINT) AS n2
  FROM (
    SELECT b.c, pr.p,
           ((('0x' || substring(md5(CAST(pr.p AS VARCHAR) || '|' ||
              CAST(b.event_id AS VARCHAR)), 1, 8))::BIGINT) % 2) = 0 AS flip
    FROM base b CROSS JOIN (SELECT unnest(range({_N_PERMS})) AS p) pr
  ) x
  GROUP BY x.p
),
exceed AS (
  SELECT COUNT(*) AS n_exceed
  FROM perms pm CROSS JOIN obs o
  WHERE pm.n1 > 0 AND pm.n2 > 0
    AND abs(pm.s1 * pm.n2 - pm.s2 * pm.n1) * (o.n1 * o.n2)
        >= abs(o.s1 * o.n2 - o.s2 * o.n1) * (pm.n1 * pm.n2)
)
SELECT CAST({_N_PERMS} AS BIGINT) AS n_perms,
       CAST(n_exceed AS BIGINT) AS n_exceed,
       ROUND((n_exceed + 1) * 1.0 / ({_N_PERMS} + 1), 4) AS p_value
FROM exceed
"""


@register(
    "stats_permutation_test",
    _PERM_SQL,
    doc=(
        "two-sample permutation test for the purchase-vs-click mean "
        "difference with fully REPRODUCIBLE resamples: permutation p "
        "reassigns each row by the parity of md5(p|event_id) — the "
        "same label sequence on both engines, no RNG — so the "
        f"{_N_PERMS}-resample null distribution is a deterministic "
        "dataset, not a sampling artifact. |mean₁−mean₂| comparisons "
        "are integer cross-multiplies (|s1·n2−s2·n1|·(N1·N2) vs the "
        "observed mirror, 128-bit) — the add-one p-value never "
        "touches a float until its single emit division. The fan-out "
        "is a map-side ×K explode feeding ONE partial-aggregated "
        "shuffle of K rows; K is a constant, so the pass stays "
        "one-scan-linear at any corpus scale"
    ),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    base = ev.select(
        "event_id",
        F.col("event_type").alias("g"),
        dround(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    d38 = "decimal(38,0)"
    obs = base.agg(
        F.sum(F.when(F.col("g") == "purchase", F.col("c")).otherwise(0))
        .cast(d38)
        .alias("o_s1"),
        F.sum(F.when(F.col("g") == "purchase", 1).otherwise(0)).cast(d38).alias("o_n1"),
        F.sum(F.when(F.col("g") == "click", F.col("c")).otherwise(0))
        .cast(d38)
        .alias("o_s2"),
        F.sum(F.when(F.col("g") == "click", 1).otherwise(0)).cast(d38).alias("o_n2"),
    )
    fanned = base.select(
        "event_id",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_N_PERMS - 1))).alias("p"),
    )
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("p").cast("string"),
                        F.lit("|"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0
    )
    perms = (
        fanned.withColumn("flip", flip)
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("flip"), F.col("c")).otherwise(0)).cast(d38).alias("s1"),
            F.sum(F.when(F.col("flip"), 1).otherwise(0)).cast(d38).alias("n1"),
            F.sum(F.when(~F.col("flip"), F.col("c")).otherwise(0)).cast(d38).alias("s2"),
            F.sum(F.when(~F.col("flip"), 1).otherwise(0)).cast(d38).alias("n2"),
        )
    )
    s1, n1, s2, n2 = F.col("s1"), F.col("n1"), F.col("s2"), F.col("n2")
    os1, on1, os2, on2 = F.col("o_s1"), F.col("o_n1"), F.col("o_s2"), F.col("o_n2")
    exceed = (
        perms.crossJoin(F.broadcast(obs))  # 1-row observed frame
        .filter(
            (n1 > 0)
            & (n2 > 0)
            & (
                F.abs(s1 * n2 - s2 * n1) * (on1 * on2)
                >= F.abs(os1 * on2 - os2 * on1) * (n1 * n2)
            )
        )
        .agg(F.count(F.lit(1)).alias("n_exceed"))
    )
    return exceed.select(
        F.lit(_N_PERMS).cast("bigint").alias("n_perms"),
        F.col("n_exceed").cast("bigint").alias("n_exceed"),
        dround(
            (F.col("n_exceed") + 1) * F.lit(1.0) / F.lit(_N_PERMS + 1), 4
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Wave 27: SPRT — Wald's sequential probability ratio test
# ---------------------------------------------------------------------------

import math as _math

_SPRT_P0, _SPRT_P1 = 0.4, 0.5  # H0 vs H1 conversion rate
_SPRT_ALPHA = _SPRT_BETA = 0.05
# pre-rounded integer NANO log-likelihood increments and boundaries —
# the text_js_divergence "once-rounded integer ln" device: Python
# computes each log ONCE and injects the SAME int64 literal into both
# engines, so the cumulative LLR is exact integer arithmetic
_SPRT_L1 = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1e9)  # per conversion
_SPRT_L0 = round(_math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e9)  # per miss
_SPRT_A = round(_math.log((1 - _SPRT_BETA) / _SPRT_ALPHA) * 1e9)  # accept H1
_SPRT_B = round(_math.log(_SPRT_BETA / (1 - _SPRT_ALPHA)) * 1e9)  # accept H0

_SPRT_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_neg
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1
),
walk AS (
  SELECT day, n_pos, n_neg,
         SUM(n_pos * CAST({_SPRT_L1} AS BIGINT)
             + n_neg * CAST({_SPRT_L0} AS BIGINT))
           OVER (ORDER BY day) AS cum_llr_nano
  FROM daily
)
SELECT day, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(cum_llr_nano AS BIGINT) AS cum_llr_nano,
       CASE WHEN cum_llr_nano >= {_SPRT_A} THEN 'accept_h1'
            WHEN cum_llr_nano <= {_SPRT_B} THEN 'accept_h0'
            ELSE 'continue' END AS state
FROM walk
"""


@register(
    "stats_sprt",
    _SPRT_SQL,
    doc=(
        "Wald's SPRT — the sequential-analysis family beside the "
        "fixed-horizon tests: is the purchase:click conversion rate "
        f"{_SPRT_P1} (H1) or {_SPRT_P0} (H0)? Per-day (conversions, "
        "misses) reduce FIRST, each day's log-likelihood increment is "
        "n⁺·L1 + n⁻·L0 over PRE-ROUNDED integer-nano log literals "
        "(Python computes each ln once; both engines add the same "
        "int64 constants — the once-rounded integer-ln device, so "
        "the random walk can never drift), and ONE cumulative window "
        "over the O(days) frame emits the trajectory with Wald "
        "boundary states ln((1−β)/α) / ln(β/(1−α)). Decision "
        "granularity is the day — the reduce-first trade the doc "
        "states explicitly (tick-level SPRT would need a global "
        "ordered walk; daily batching is how sequential monitors "
        "actually deploy)"
    ),
)
def stats_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_pos"
        ),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_neg"),
    )
    inc = F.col("n_pos") * F.lit(_SPRT_L1).cast("bigint") + F.col("n_neg") * F.lit(
        _SPRT_L0
    ).cast("bigint")
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    walk = daily.select(
        "day", "n_pos", "n_neg", F.sum(inc).over(w).alias("cum_llr_nano")
    )
    c = F.col("cum_llr_nano")
    return walk.select(
        "day",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        c.cast("bigint").alias("cum_llr_nano"),
        F.when(c >= _SPRT_A, F.lit("accept_h1"))
        .when(c <= _SPRT_B, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("state"),
    )


# ---------------------------------------------------------------------------
# Wave 35: Wald-Wolfowitz runs test (randomness diagnostic)
# ---------------------------------------------------------------------------

_RUNS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         arg_max(CAST(ROUND(value * 100, 0) AS BIGINT),
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close_c
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
),
moves AS (
  SELECT event_type, day,
         CASE WHEN close_c > lag(close_c) OVER w THEN 1
              WHEN close_c < lag(close_c) OVER w THEN 0 END AS up
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
seq AS (
  SELECT event_type, up,
         CASE WHEN lag(up) OVER (PARTITION BY event_type ORDER BY day)
                   IS DISTINCT FROM up THEN 1 ELSE 0 END AS brk
  FROM moves WHERE up IS NOT NULL
),
agg AS (
  SELECT event_type,
         CAST(SUM(up) AS BIGINT) AS n1,
         CAST(SUM(1 - up) AS BIGINT) AS n0,
         CAST(SUM(brk) AS BIGINT) AS runs
  FROM seq GROUP BY event_type
)
SELECT event_type, n1, n0, runs,
       ROUND(1.0 + 2.0 * n1 * n0 / (n1 + n0), 4) AS expected_runs,
       ROUND((runs - (1.0 + 2.0 * n1 * n0 / (n1 + n0)))
             / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - (n1 + n0))
                    / ((n1 + n0) * (n1 + n0) * 1.0 * ((n1 + n0) - 1))),
             4) AS z_stat
FROM agg
WHERE n1 > 0 AND n0 > 0
"""


@register(
    "stats_runs_test",
    _RUNS_SQL,
    doc=(
        "Wald-Wolfowitz runs test on the daily up/down move sequence "
        "— the randomness diagnostic beside events_autocorrelation "
        "(too few runs = trending, too many = mean-reverting): moves "
        "reduce from int-cents daily closes (flat days drop — they "
        "are neither symbol), the run count is Σ[move differs from "
        "its predecessor] via ONE lag window whose null-safe compare "
        "makes the first move open run #1 — R is the exact total run "
        "count as a pure 0/1 integer sum — and E[R], Var[R], z are "
        "fixed IEEE chains over "
        "the exact integer (n1, n0, R). Two windows + one aggregation "
        "over the O(days) frame"
    ),
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    ordkey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            dround(F.col("value") * 100, 0).cast("bigint").alias("close_c"),
            ordkey.alias("ordkey"),
        )
        .groupBy("event_type", "day")
        .agg(F.max_by("close_c", "ordkey").alias("close_c"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("close_c").over(w)
    moves = daily.select(
        "event_type",
        "day",
        F.when(F.col("close_c") > prev, 1)
        .when(F.col("close_c") < prev, 0)
        .alias("up"),
    ).filter(F.col("up").isNotNull())
    brk = F.when(
        ~F.lag("up").over(w).eqNullSafe(F.col("up")), 1
    ).otherwise(0)
    seq = moves.select("event_type", "up", brk.alias("brk"))
    agg = seq.groupBy("event_type").agg(
        F.sum("up").cast("bigint").alias("n1"),
        F.sum(1 - F.col("up")).cast("bigint").alias("n0"),
        F.sum("brk").cast("bigint").alias("runs"),
    ).filter((F.col("n1") > 0) & (F.col("n0") > 0))
    n1, n0, r = F.col("n1"), F.col("n0"), F.col("runs")
    n = n1 + n0
    e = F.lit(1.0) + F.lit(2.0) * n1 * n0 / n
    var = (
        F.lit(2.0)
        * n1
        * n0
        * (F.lit(2.0) * n1 * n0 - n)
        / (n * n * F.lit(1.0) * (n - 1))
    )
    return agg.select(
        "event_type",
        "n1",
        "n0",
        "runs",
        dround(e, 4).alias("expected_runs"),
        dround((r - e) / F.sqrt(var), 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Wave 39: Poisson bootstrap — the single-pass, corpus-scale bootstrap
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds on the 1e8 integer grid (cumulative
# P(K<=k), floored once): a uniform md5 draw u in [0,1e8) maps to
# k = #{thresholds <= u}, capped at 5 (P(K>5) ~ 0.06%). Literal ints →
# bit-identical on both engines.
_PB_THRESH = (36787944, 73575888, 91969860, 98101184, 99634015)
_PB_B = 50  # replicates
_PB_LO = 2  # 2.5% rank among 50 sorted replicate means (ceil(0.025*50)+? fixed rank contract)
_PB_HI = 49  # 97.5% rank


def _pb_k_sql(u: str) -> str:
    return " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _PB_THRESH)


_PB_SQL = f"""
WITH rows_x AS (
  SELECT l_orderkey * 10 + l_linenumber AS rid,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
),
draws AS (
  SELECT b.b,
         ({_pb_k_sql("('0x' || substr(md5('pb|' || CAST(b.b AS VARCHAR) || '|' || CAST(r.rid AS VARCHAR)), 1, 8))::BIGINT % 100000000")}) AS k,
         r.cents
  FROM range({_PB_B}) b(b) CROSS JOIN rows_x r
),
reps AS (
  SELECT b,
         SUM(CAST(k AS HUGEINT) * cents) AS skx,
         SUM(CAST(k AS HUGEINT)) AS sk
  FROM draws GROUP BY b
),
means AS (
  SELECT b, CAST(skx AS DOUBLE) / CAST(sk AS DOUBLE) AS m FROM reps
),
ranked AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means),
pt AS (
  SELECT SUM(CAST(cents AS HUGEINT) ) AS s, COUNT(*)::HUGEINT AS n FROM rows_x
)
SELECT CAST({_PB_B} AS BIGINT) AS n_replicates,
       ROUND(CAST(pt.s AS DOUBLE) / CAST(pt.n AS DOUBLE) / 100.0, 4) AS mean_price,
       ROUND(lo.m / 100.0, 4) AS ci_lo,
       ROUND(hi.m / 100.0, 4) AS ci_hi
FROM pt
CROSS JOIN (SELECT m FROM ranked WHERE rn = {_PB_LO}) lo
CROSS JOIN (SELECT m FROM ranked WHERE rn = {_PB_HI}) hi
"""


@register(
    "stats_poisson_bootstrap",
    _PB_SQL,
    doc=(
        "Poisson bootstrap — THE bootstrap that survives 100 TB "
        "(Chamandy et al., Google): classic resampling needs a global "
        "index and n draws per replicate; the Poisson trick replaces "
        "it with an INDEPENDENT per-row Poisson(1) weight per "
        "replicate, so all B replicates compute in ONE pass with "
        "map-side partial aggregation — the shuffle carries B rows "
        "per partition, never the corpus (vs stats_bootstrap_ci's "
        "index-draw form, which is exact but only works because its "
        "input is the tiny daily frame). Weights are deterministic: "
        "md5(b|row) uniform on the 1e8 grid → inverse-CDF through 5 "
        "integer thresholds (floored once, literal on both engines). "
        "Per-replicate Σk·x and Σk ride HUGEINT/decimal (k ≤ 5, "
        "cents ~1e7, corpus rows → past int64), one double division "
        "per replicate mean, fixed-rank 2.5/97.5% picks from the 50 "
        "sorted means"
    ),
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    rows_x = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        dround(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
    )
    bs = F.explode(F.sequence(F.lit(0), F.lit(_PB_B - 1))).alias("b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("pb|"),
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("rid").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100000000
    )
    k = None
    for t in _PB_THRESH:
        term = F.when(u >= t, 1).otherwise(0)
        k = term if k is None else k + term
    draws = rows_x.select("rid", "cents", bs).select(
        "b", k.alias("k"), "cents"
    )
    reps = draws.groupBy("b").agg(
        F.sum(
            (F.col("k").cast("decimal(19,0)") * F.col("cents")).cast("decimal(26,0)")
        ).alias("skx"),
        F.sum(F.col("k").cast("decimal(19,0)")).alias("sk"),
    )
    means = reps.select(
        "b", (F.col("skx").cast("double") / F.col("sk").cast("double")).alias("m")
    )
    wr = W.orderBy("m", "b")
    ranked = means.select("m", F.row_number().over(wr).alias("rn"))
    pt = rows_x.agg(
        F.sum(F.col("cents").cast("decimal(19,0)")).alias("s"),
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
    )
    lo = ranked.filter(F.col("rn") == _PB_LO).select(F.col("m").alias("mlo"))
    hi = ranked.filter(F.col("rn") == _PB_HI).select(F.col("m").alias("mhi"))
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(_PB_B).cast("bigint").alias("n_replicates"),
            dround(
                F.col("s").cast("double") / F.col("n").cast("double") / 100.0, 4
            ).alias("mean_price"),
            dround(F.col("mlo") / 100.0, 4).alias("ci_lo"),
            dround(F.col("mhi") / 100.0, 4).alias("ci_hi"),
        )
    )
