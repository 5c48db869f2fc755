"""Query registry: name → Spark callable, name → oracle SQL."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB
    oracle SQL. Omit ``oracle`` only for genuinely
    non-SQL-expressible operators (driver then runs a rows-only
    check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # a silent overwrite would leave one of two same-named
            # queries ungraded (and which one wins depends on module
            # import order) — fail loudly at import instead
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
