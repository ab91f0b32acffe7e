"""Registry mapping query names to (Spark builder, DuckDB oracle SQL).

Each declared operator from SURVEY.md §2 registers one ``QuerySpec``:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet tables
  (pre-registered views), or ``None`` for genuinely non-SQL-expressible ops
  (the driver then records a weaker rows-only check).

Column names are part of the contract: the correctness driver sorts columns
by NAME before hashing, so builders and oracles must alias every computed
column identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    category: str
    doc: str
    bench: bool = False  # include in bench.py headline set


def register(
    name: str,
    *,
    oracle: str | None = None,
    category: str,
    doc: str = "",
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=doc or (fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries_map() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in _REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle}
