"""Round-6 wave 23: distributed linear algebra — the top principal
component of the embedding covariance via power iteration, fully
deterministic across engines.

PCA at corpus scale is a two-phase shape: (1) ONE data-sized pass
builds the d×d Gram/covariance matrix (map-side products, the shuffle
carries d² rows — never the data), then (2) the iteration runs on the
d²-row matrix frame alone. Floats never accumulate across rows:
components quantize to integer micro-units up front, the covariance
numerator n·Σqᵢqⱼ − SᵢSⱼ is exact 128-bit integer, and each power-
iteration round re-normalizes the rank vector back onto an integer
ppm grid (the PageRank/k-core integer-encode discipline) — so the
only doubles are one fixed-shape ratio per matrix entry and per
round, bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources import load_table
from .catalog import register

_Q = 1_000_000  # component quantization: micro-units
_PPM = 1_000_000  # iteration grid: vector entries live in [-1e6, 1e6]
_ROUNDS = 8  # fixed budget, NOT convergence: with the synthetic
# corpus's tiny eigengap (λ2/λ1 ≈ 0.93-0.99, measured) no practical
# round count converges plain power iteration, so the operator's
# contract is "the 8-round iterate" and the output carries delta_ppm
# (the last round's max movement) as the convergence diagnostic —
# callers with a real spectrum tune rounds / add deflation


def _pca_sql() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, _ROUNDS + 1):
        rounds.append(
            f"""
r{r} AS MATERIALIZED (
  SELECT g.i, SUM(g.g * v.v) AS u
  FROM g JOIN {prev} v ON v.j = g.j
  GROUP BY g.i
),
m{r} AS (SELECT MAX(ABS(u)) AS m FROM r{r}),
v{r} AS (
  SELECT r.i AS j,
         CAST(ROUND(CAST(r.u AS DOUBLE) / CAST(mm.m AS DOUBLE) * {_PPM}, 0)
              AS BIGINT) AS v
  FROM r{r} r CROSS JOIN m{r} mm
)"""
        )
        prev = f"v{r}"
    rounds_sql = ",".join(rounds)
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_Q}, 0) AS BIGINT) AS qi,
         embedding
  FROM embeddings
),
gram AS (
  SELECT i, j, CAST(SUM(CAST(qi AS HUGEINT) * qj) AS HUGEINT) AS sxy
  FROM (
    SELECT a.i, a.qi,
           generate_subscripts(a.embedding, 1) AS j,
           CAST(ROUND(CAST(unnest(a.embedding) AS DOUBLE) * {_Q}, 0) AS BIGINT) AS qj
    FROM q a
  )
  GROUP BY i, j
),
marg AS (
  SELECT i, CAST(SUM(qi) AS HUGEINT) AS s,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM q GROUP BY i
),
cov AS MATERIALIZED (
  SELECT gr.i, gr.j, ma.n * gr.sxy - ma.s * mb.s AS num
  FROM gram gr
  JOIN marg ma ON ma.i = gr.i
  JOIN marg mb ON mb.i = gr.j
),
cmax AS (SELECT MAX(ABS(num)) AS m FROM cov),
g AS MATERIALIZED (
  SELECT i, j,
         CAST(ROUND(CAST(num AS DOUBLE) / CAST(cm.m AS DOUBLE) * {_PPM}, 0)
              AS BIGINT) AS g
  FROM cov CROSS JOIN cmax cm
),
v0 AS (SELECT DISTINCT i AS j, CAST({_PPM} AS BIGINT) AS v FROM g),
{rounds_sql},
dd AS (
  SELECT MAX(ABS(a.v - b.v)) AS d
  FROM v{_ROUNDS} a JOIN v{_ROUNDS - 1} b ON b.j = a.j
)
SELECT CAST(a.j AS INT) AS dim, CAST(a.v AS BIGINT) AS loading_ppm,
       CAST(dd.d AS BIGINT) AS delta_ppm
FROM v{_ROUNDS} a CROSS JOIN dd
"""


_PCA_SQL = _pca_sql()


@register(
    "feature_pca_power",
    _PCA_SQL,
    doc=(
        "top principal component of the embedding covariance by "
        f"fixed-budget ({_ROUNDS}-round) power iteration — the PCA "
        "building block for whitening/dim-reduction in training-data "
        "pipelines. The contract is the ITERATE, not convergence "
        "(this corpus's eigengap λ2/λ1≈0.93-0.99 makes plain power "
        "iteration spectrum-limited at any budget); delta_ppm — the "
        "last round's max coordinate movement — ships in the output "
        "as the convergence diagnostic, so a caller can see exactly "
        "how settled the direction is and tune rounds or add "
        "deflation. "
        "Phase 1 is the ONLY data-sized pass: components quantize to "
        "integer micro-units, a double-posexplode emits the n·d² "
        "pairwise products map-side, and partial aggregation bounds "
        "the shuffle at d² rows; the covariance numerator "
        "n·Σqᵢqⱼ−SᵢSⱼ is exact 128-bit integer. Phase 2 never "
        "touches the data again: the d²-entry matrix rescales once "
        "onto a ±1e6 integer grid (one double ratio per entry, "
        "bit-identical both engines), and each unrolled round is an "
        "exact int64 matrix·vector (g≤1e6 · v≤1e6 · d=64 ≪ 2⁶³) "
        "re-normalized by max|u| back onto the ppm grid — the "
        "PageRank integer-encode discipline, so the iterate can "
        "NEVER drift across engines. The matrix frame is multi-use "
        "across rounds → checkpointed once (the CC discipline); the "
        "single-use v chain pipelines; vectors broadcast every round"
    ),
)
def feature_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "embedding",
        F.posexplode("embedding").alias("i0", "x"),
    ).select(
        "vec_id",
        "embedding",
        (F.col("i0") + 1).alias("i"),
        dround(F.col("x").cast("double") * _Q, 0).cast("bigint").alias("qi"),
    )
    d38 = "decimal(38,0)"
    pairs = q.select(
        "i", "qi", F.posexplode("embedding").alias("j0", "xj")
    ).select(
        "i",
        "qi",
        (F.col("j0") + 1).alias("j"),
        dround(F.col("xj").cast("double") * _Q, 0).cast("bigint").alias("qj"),
    )
    gram = pairs.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).cast(d38).alias("sxy")
    )
    marg = q.groupBy("i").agg(
        F.sum("qi").cast(d38).alias("s"),
        F.count(F.lit(1)).cast(d38).alias("n"),
    )
    ma = marg.select(F.col("i"), F.col("s").alias("s_i"), F.col("n"))
    mb = marg.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    cov = (
        gram.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            "i",
            "j",
            (F.col("n") * F.col("sxy") - F.col("s_i") * F.col("s_j")).alias("num"),
        )
    )
    cmax = cov.agg(F.max(F.abs(F.col("num"))).alias("m"))
    g = cov.crossJoin(F.broadcast(cmax)).select(
        "i",
        "j",
        dround(F.col("num").cast("double") / F.col("m").cast("double") * _PPM, 0)
        .cast("bigint")
        .alias("g"),
    )
    # fixed-budget power iteration on the d²-row matrix frame; the
    # matrix is multi-use across rounds → checkpoint it once (the CC
    # discipline), then the single-use v chain pipelines
    g = g.localCheckpoint(eager=True)
    v = g.select(F.col("i").alias("j")).distinct().select(
        "j", F.lit(_PPM).cast("bigint").alias("v")
    )
    prev = None
    for _ in range(_ROUNDS):
        u = (
            g.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        prev = v
        v = (
            u.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("j"),
                dround(
                    F.col("u").cast("double") / F.col("m").cast("double") * _PPM, 0
                )
                .cast("bigint")
                .alias("v"),
            )
            # v is re-used by the NEXT round's broadcast AND (last
            # round) by the delta join — without cutting the chain
            # every broadcast re-executes the whole iteration prefix
            # (measured 77s → ~15s at sf0.01); the frame is d=64 rows
            .localCheckpoint(eager=True)
        )
    dd = (
        v.join(prev.select("j", F.col("v").alias("pv")), "j")
        .agg(F.max(F.abs(F.col("v") - F.col("pv"))).alias("d"))
    )
    return v.crossJoin(F.broadcast(dd)).select(
        F.col("j").cast("int").alias("dim"),
        F.col("v").cast("bigint").alias("loading_ppm"),
        F.col("d").cast("bigint").alias("delta_ppm"),
    )
