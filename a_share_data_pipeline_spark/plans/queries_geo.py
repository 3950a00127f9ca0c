"""Round-6 wave 21: the geospatial family — grid-blocked k-nearest-
neighbor search and neighborhood density, the blocking pattern every
distributed spatial join reduces to (same shape as LSH banding: bucket
by cell, probe only adjacent buckets, verify exactly inside the
candidate set).

The corpus has no coordinates, so each customer gets a deterministic
synthetic position from md5 arithmetic (the _PII_AUG /_emb_aug fixture-
augmentation precedent: both engines derive the SAME rows before the
operator under test). Positions are integer micro-units on a
[0, 1e6)² plane — squared distances are exact int64, so candidate
ranking never touches a float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

_PLANE = 1_000_000  # integer micro-unit plane edge
_CELL = 50_000  # grid cell edge → 20×20 cells
_KNN = 3

# md5-derived coordinate, identical on both engines: the first 8 hex
# chars of md5(tag|custkey) as a 32-bit int, reduced mod the plane.
_COORD_SQL = (
    "(('0x' || substring(md5('{tag}|' || CAST(c_custkey AS VARCHAR)), 1, 8))"
    f"::BIGINT % {_PLANE})"
)


def _coord(tag: str) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{tag}|"), F.col("c_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _PLANE
    )


_POINTS_CTE = f"""
points AS (
  SELECT c_custkey AS id,
         {_COORD_SQL.format(tag='gx')} AS x,
         {_COORD_SQL.format(tag='gy')} AS y
  FROM customer
),
cells AS (
  SELECT id, x, y, x // {_CELL} AS cx, y // {_CELL} AS cy FROM points
),
offsets AS (
  SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                             (1,-1),(1,0),(1,1)) AS t(dx, dy)
)"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"), _coord("gx").alias("x"), _coord("gy").alias("y")
    )
    return pts.select(
        "id",
        "x",
        "y",
        (F.col("x") / _CELL).cast("bigint").alias("cx"),
        (F.col("y") / _CELL).cast("bigint").alias("cy"),
    )


_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

# hot-cell salt guard (VERDICT r6 item 6): a cell with n points makes
# n×n candidate pairs land in ONE join task; above the cap the build
# side splits into _N_SALTS sub-buckets and the probe side replicates
# across them — same pairs, spread over _N_SALTS tasks. Salting (not
# drop-and-log) because kNN correctness requires EVERY candidate; the
# knob for density is the cell edge, not candidate loss.
_HOT_CELL_CAP = 1_000
_N_SALTS = 8


def _grid_candidates(
    cells: DataFrame, hot_cap: int = _HOT_CELL_CAP, n_salts: int = _N_SALTS
) -> DataFrame:
    """(id, neighbor, dist2) candidate pairs over the 3×3 cell
    neighborhood — the offset fan-out + ONE equi-join on the cell key,
    with the hot-cell salt guard: per-cell counts (O(cells), broadcast)
    mark cells above ``hot_cap``; build-side points in hot cells salt
    by ``pmod(id, n_salts)`` and probes targeting a hot cell replicate
    across all salts, so the join key (pcx, pcy, salt) caps any single
    task's pair block at ~(n/s)·n instead of n². Cold cells pay salt=0
    and exactly one probe row — identical to the unguarded plan. Output
    is pair-for-pair identical either way (property-tested), so the
    exhaustive SQL oracle is unchanged."""
    per_cell = cells.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    # O(populated cells) rows — a legitimately broadcastable frame
    # (bounded by the grid, not the corpus)
    hot = per_cell.select(
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
        (F.col("n") > hot_cap).alias("is_hot"),
    )
    off = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in _OFFSETS]
    )
    # fan out the offset struct first, then derive both probe
    # coordinates from it (explode appears once per select)
    probes = (
        cells.select("id", "x", "y", "cx", "cy", F.explode(off).alias("o"))
        .select(
            F.col("id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("o.dx")).alias("pcx"),
            (F.col("cy") + F.col("o.dy")).alias("pcy"),
        )
        .join(F.broadcast(hot), ["pcx", "pcy"], "left")
        .select(
            "a_id",
            "ax",
            "ay",
            "pcx",
            "pcy",
            F.explode(
                F.when(
                    F.coalesce(F.col("is_hot"), F.lit(False)),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ).alias("salt"),
        )
    )
    b = (
        cells.select(
            F.col("id").alias("neighbor"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.col("cx").alias("pcx"),
            F.col("cy").alias("pcy"),
        )
        .join(F.broadcast(hot), ["pcx", "pcy"], "left")
        .select(
            "neighbor",
            "bx",
            "by",
            "pcx",
            "pcy",
            F.when(
                F.coalesce(F.col("is_hot"), F.lit(False)),
                F.pmod(F.col("neighbor"), F.lit(n_salts)).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("salt"),
        )
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probes.join(b, ["pcx", "pcy", "salt"])
        .filter(F.col("neighbor") != F.col("a_id"))
        .select(F.col("a_id").alias("id"), "neighbor", dist2.alias("dist2"))
    )


_GRID_KNN_SQL = f"""
WITH {_POINTS_CTE},
cand AS (
  SELECT a.id AS id, b.id AS neighbor,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
  FROM cells a
  CROSS JOIN offsets o
  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy AND b.id <> a.id
)
SELECT CAST(id AS BIGINT) AS id, CAST(neighbor AS BIGINT) AS neighbor,
       CAST(dist2 AS BIGINT) AS dist2, CAST(rnk AS INT) AS rnk
FROM (
  SELECT c.*, row_number() OVER (
    PARTITION BY id ORDER BY dist2, neighbor
  ) AS rnk
  FROM cand c
)
WHERE rnk <= {_KNN}
"""


@register(
    "geo_grid_knn",
    _GRID_KNN_SQL,
    doc=(
        "grid-blocked spatial kNN: points bucket into a uniform cell "
        "grid, each point probes only its 3×3 cell neighborhood (a "
        "constant 9-way map-side fan-out feeding ONE equi-join on the "
        "cell key — the spatial analogue of LSH banding, no all-pairs "
        "product anywhere), and the exact squared distance ranks "
        "candidates inside the bounded set. Coordinates are "
        "md5-derived integer micro-units so dist2 is exact int64 and "
        "the top-3 window needs no float tie-break. Per-point work is "
        "bounded by neighborhood density; cells above _HOT_CELL_CAP "
        "get the SALT guard (_grid_candidates: build side salted by "
        "pmod(id, s), probes replicated across salts — same pairs, "
        "1/s the per-task block; property-tested pair-identical on a "
        "deliberately hot fixture). The cell edge is PART OF THE CONTRACT — "
        "candidates are exactly the 3×3 neighborhood, so retuning it "
        "changes which far-away neighbors are reachable (unlike a "
        "pure cost knob); production callers fix the grid constant "
        "per dataset or widen the probe ring instead"
    ),
)
def geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _grid_candidates(_cells(spark, sf_dir))
    w = W.partitionBy("id").orderBy("dist2", "neighbor")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.col("neighbor").cast("bigint").alias("neighbor"),
            F.col("dist2").cast("bigint").alias("dist2"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_GRID_DENSITY_SQL = f"""
WITH {_POINTS_CTE},
per_cell AS (
  SELECT cx, cy, COUNT(*) AS n FROM cells GROUP BY cx, cy
)
SELECT CAST(a.cx AS BIGINT) AS cx, CAST(a.cy AS BIGINT) AS cy,
       CAST(a.n AS BIGINT) AS n,
       CAST(SUM(b.n) AS BIGINT) AS n_neighborhood
FROM per_cell a
CROSS JOIN offsets o
JOIN per_cell b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
GROUP BY a.cx, a.cy, a.n
"""


@register(
    "geo_cell_density",
    _GRID_DENSITY_SQL,
    doc=(
        "grid density with 3×3 neighborhood smoothing — the spatial "
        "rollup that sizes the kNN blocking (points/cell decides the "
        "cell edge) and the hot-cell report that triggers salting: "
        "points reduce to per-cell counts FIRST (one shuffle, "
        "O(cells) rows), then the 9-way offset fan-out convolves "
        "counts over the REDUCED frame — the neighborhood sum never "
        "touches point-level data. Empty neighbor cells contribute "
        "nothing (inner join ≡ +0); all counts exact int64"
    ),
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _cells(spark, sf_dir)
    per_cell = cells.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    off = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in _OFFSETS]
    )
    probes = per_cell.select("cx", "cy", "n", F.explode(off).alias("o")).select(
        "cx",
        "cy",
        "n",
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    b = per_cell.select(
        F.col("cx").alias("pcx"), F.col("cy").alias("pcy"), F.col("n").alias("bn")
    )
    return (
        probes.join(b, ["pcx", "pcy"])
        .groupBy("cx", "cy", "n")
        .agg(F.sum("bn").alias("n_neighborhood"))
        .select(
            F.col("cx").cast("bigint").alias("cx"),
            F.col("cy").cast("bigint").alias("cy"),
            F.col("n").cast("bigint").alias("n"),
            F.col("n_neighborhood").cast("bigint").alias("n_neighborhood"),
        )
    )
