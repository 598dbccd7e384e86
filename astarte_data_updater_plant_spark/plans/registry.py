"""Declared-query registry: the engine's public query surface.

Every operator claimed in SURVEY.md §2 registers here with
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
    genuinely non-SQL-expressible operators, which get a weaker
    rows-only check).

The driver's correctness gate runs both sides at sf0.01 and compares
row count + schema + order-insensitive value hash, with columns sorted
by name — so Spark aliases and SQL ``AS`` names MUST match exactly.

Determinism contract for hash-stable results (see ``exact.py``):
aggregate floating point through exact DECIMAL arithmetic on both
sides and cast back to DOUBLE at the end; never rank on raw
accumulated floats without a rounding + id tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from ..operators import (  # noqa: F401
        analytics,
        ann,
        controlplane,
        corpus,
        dedup,
        diff,
        formats,
        graph,
        ingest,
        ivf,
        merge,
        multimodal,
        relational,
        simhash,
        similarity,
        state_queries,
        textops,
        timeseries,
        triggers,
    )


def queries_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
