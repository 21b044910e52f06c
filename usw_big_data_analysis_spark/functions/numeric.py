"""Bit-stable floating-point aggregation helpers.

Distributed double summation is order-dependent (partial aggregation order
differs run-to-run and engine-to-engine), so a raw ``sum(double)`` can differ
from the DuckDB oracle in the low bits — enough to break value-hash
comparison. The fix used throughout the query registry:

- **Sums** go through a DECIMAL cast: decimal addition is exact and
  associative, so the result is identical regardless of partition order, in
  Spark and DuckDB alike. Cast back to double at the end (one deterministic
  IEEE rounding).
- **Derived statistics** (mean, variance, stddev, correlation) are computed
  from decimal sufficient statistics (n, Σx, Σx², Σxy) with the final
  arithmetic in double — every step is a deterministic IEEE operation, so the
  result is bit-identical across engines.
- ``dround`` is a belt-and-braces rounding for values whose inputs are
  already exact (e.g. exact percentile interpolation).

The fixture's numerics carry ≤2 decimal digits, so DECIMAL(25,6)/(30,10)
casts are lossless for x and x²/xy. At 100 TB this costs a wider shuffle row
but removes a correctness footgun; for throughput-only paths use plain double
sums (see bench.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal wide enough for Σx over ~1e12 rows of 1e6-magnitude values
_DEC_X = "decimal(25,6)"
_DEC_XX = "decimal(38,10)"


def dsum(c: Column | str, dec: str = _DEC_X) -> Column:
    """Order-independent sum: sum(cast(x as decimal)) cast back to double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(dec)).cast("double")


def _sums(col: Column):
    n = F.count(col).cast("double")
    sx = F.sum(col.cast(_DEC_X)).cast("double")
    sxx = F.sum((col.cast(_DEC_X) * col.cast(_DEC_X)).cast(_DEC_XX)).cast("double")
    return n, sx, sxx


def davg(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    n, sx, _ = _sums(col)
    return sx / n


# Derived statistics combine exact sums with compound double arithmetic;
# compilers may contract those expressions differently (FMA), so the final
# value is rounded to 6 decimals on both engines to stay hash-identical.
_STAT_SCALE = 6


def dvar(c: Column | str, ddof: int = 1) -> Column:
    """Sample (ddof=1) or population (ddof=0) variance from exact sums."""
    col = F.col(c) if isinstance(c, str) else c
    n, sx, sxx = _sums(col)
    return F.round((sxx - sx * sx / n) / (n - float(ddof)), _STAT_SCALE)


def dstd(c: Column | str, ddof: int = 1) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    n, sx, sxx = _sums(col)
    return F.round(
        F.sqrt((sxx - sx * sx / n) / (n - float(ddof))), _STAT_SCALE
    )


def dcorr(x: Column | str, y: Column | str) -> Column:
    """Pearson r from exact decimal sufficient statistics."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    n = F.count(cx).cast("double")
    sx = F.sum(cx.cast(_DEC_X)).cast("double")
    sy = F.sum(cy.cast(_DEC_X)).cast("double")
    sxx = F.sum((cx.cast(_DEC_X) * cx.cast(_DEC_X)).cast(_DEC_XX)).cast("double")
    syy = F.sum((cy.cast(_DEC_X) * cy.cast(_DEC_X)).cast(_DEC_XX)).cast("double")
    sxy = F.sum((cx.cast(_DEC_X) * cy.cast(_DEC_X)).cast(_DEC_XX)).cast("double")
    return F.round(
        (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        _STAT_SCALE,
    )


def dround(c: Column, scale: int = 6) -> Column:
    return F.round(c, scale)


# --- matching DuckDB SQL fragments -----------------------------------------
# The oracle side of the same conventions; f-string these into oracle SQL.


def sql_dsum(expr: str, dec: str = _DEC_X) -> str:
    return f"CAST(sum(CAST({expr} AS {dec})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / CAST(count({expr}) AS DOUBLE))"


def _sql_sums(expr: str):
    n = f"CAST(count({expr}) AS DOUBLE)"
    sx = sql_dsum(expr)
    sxx = f"CAST(sum(CAST(CAST({expr} AS {_DEC_X}) * CAST({expr} AS {_DEC_X}) AS {_DEC_XX})) AS DOUBLE)"
    return n, sx, sxx


def sql_dvar(expr: str, ddof: int = 1) -> str:
    n, sx, sxx = _sql_sums(expr)
    return f"round((({sxx} - {sx} * {sx} / {n}) / ({n} - {float(ddof)})), {_STAT_SCALE})"


def sql_dstd(expr: str, ddof: int = 1) -> str:
    n, sx, sxx = _sql_sums(expr)
    return f"round(sqrt((({sxx} - {sx} * {sx} / {n}) / ({n} - {float(ddof)}))), {_STAT_SCALE})"


def sql_dcorr(x: str, y: str) -> str:
    n = f"CAST(count({x}) AS DOUBLE)"
    sx = sql_dsum(x)
    sy = sql_dsum(y)
    sxx = f"CAST(sum(CAST(CAST({x} AS {_DEC_X}) * CAST({x} AS {_DEC_X}) AS {_DEC_XX})) AS DOUBLE)"
    syy = f"CAST(sum(CAST(CAST({y} AS {_DEC_X}) * CAST({y} AS {_DEC_X}) AS {_DEC_XX})) AS DOUBLE)"
    sxy = f"CAST(sum(CAST(CAST({x} AS {_DEC_X}) * CAST({y} AS {_DEC_X}) AS {_DEC_XX})) AS DOUBLE)"
    return (
        f"round((({n} * {sxy} - {sx} * {sy}) / "
        f"sqrt(({n} * {sxx} - {sx} * {sx}) * ({n} * {syy} - {sy} * {sy}))), {_STAT_SCALE})"
    )
