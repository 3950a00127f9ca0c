"""Cross-engine-stable float rounding.

Spark's `round()` on doubles round-trips through the shortest decimal
string (BigDecimal HALF_UP on Double.toString), while DuckDB rounds
the binary value (`std::round(x * 10^n) / 10^n`). On boundary values
(e.g. avg = 152741.235) they disagree by one ulp of the last kept
digit — enough to flip the correctness hash.

`dround` reproduces DuckDB's binary semantics inside Spark with plain
IEEE ops (multiply, +0.5, floor, divide), so a query rounded with
`dround` in Spark and `ROUND` in DuckDB computes bit-identical
doubles whenever the pre-rounding inputs are bit-identical (always
true for deterministic window frames; within 1e-13 for reordered
parallel sums, where the shared rounding still lands on the same side
of the boundary except on exact-rational edge cases).

Valid for |x * 10^n| < 2^52 (far beyond every aggregate here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    s = F.lit(float(10**n))
    pos = F.floor(c * s + F.lit(0.5)) / s
    neg = -(F.floor((-c) * s + F.lit(0.5)) / s)
    return F.when(c < 0, neg).otherwise(pos)
