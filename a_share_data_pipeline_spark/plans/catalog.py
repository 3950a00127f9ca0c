"""Query catalog: every operator from SURVEY.md §2 gets a named query.

Each entry pairs a Spark DataFrame program with an equivalent ANSI-SQL
oracle string (run by DuckDB over the same parquet) — the driver's
correctness gate. Column names/types are aligned on both sides; float
aggregates are rounded identically on both sides so order-of-summation
noise cannot flip the value hash.

Queries whose semantics are not SQL-expressible (streaming state,
engine-level incrementality) register with ``oracle=None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def registry() -> dict[str, Query]:
    """All registered queries (importing the defining modules)."""
    from . import queries_core  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_profile  # noqa: F401
    from . import queries_sql  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_udf  # noqa: F401

    return dict(_REGISTRY)


def catalog_markdown() -> str:
    """QUERIES.md content: the full catalog with docs + oracle status."""
    lines = [
        "# QUERIES — the full catalog",
        "",
        "Generated from `plans/catalog.py` "
        "(`python -c \"from a_share_data_pipeline_spark.plans.catalog import "
        "catalog_markdown; print(catalog_markdown())\" > QUERIES.md`).",
        "Every query is a callable `(spark, sf_dir) -> DataFrame` in "
        "`__spark_entry__.queries()`; *oracled* means a DuckDB-equivalent "
        "SQL string in `oracle_sql()` hash-verifies it per round.",
        "",
        "| Query | Oracle | What it exercises |",
        "|---|---|---|",
    ]
    for name, q in sorted(registry().items()):
        doc = " ".join((q.doc or "—").split())
        lines.append(f"| `{name}` | {'✓' if q.oracle else 'rows-only'} | {doc} |")
    lines.append("")
    return "\n".join(lines)
