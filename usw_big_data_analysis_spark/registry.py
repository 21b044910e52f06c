"""Query registry — the driver correctness contract.

Every implemented operator from SURVEY.md §2 registers here under its
inventory "Query key": a Spark callable ``(spark, sf_dir) -> DataFrame`` and
(when SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.

The driver compares row-count + schema + order-insensitive value-hash, with
columns sorted by name — so every computed column is aliased identically on
both sides, and floating-point outputs follow the bit-stability conventions
in ``functions/numeric.py`` (decimal-summed aggregates, rounded derived
stats) so the two engines produce byte-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import every query module (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import ALL_MODULES  # noqa: F401

    _LOADED = True
