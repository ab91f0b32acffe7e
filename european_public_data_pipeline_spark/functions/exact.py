"""Exact-arithmetic aggregation helpers.

Summing IEEE doubles is order-dependent; on a 1000-executor cluster the
partition order of a shuffle is nondeterministic, so ``SUM(double)`` can
return a different last-ulp value per run — and never hash-match a
single-threaded oracle. The synthetic money columns are exact 2-decimal
values, so casting to DECIMAL before aggregating makes every sum exact,
deterministic, and scale-invariant: the same answer on local[32] and on the
full cluster. The final cast back to DOUBLE is a correctly-rounded IEEE
operation on an identical rational value, hence identical everywhere.

This mirrors how the reference's warehouse keeps FLOAT measures but relies
on deterministic single-process pandas sums (/root/reference/src/db/
load_hicp_to_sql.py:41); at Spark scale determinism has to be engineered.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for any per-row money value in the star schema; products of two
# (18,2) casts stay well under Spark's DECIMAL(38) ceiling.
DEFAULT_PRECISION = 18
DEFAULT_SCALE = 2


def dec(col: Column | str, precision: int = DEFAULT_PRECISION, scale: int = DEFAULT_SCALE) -> Column:
    """Cast a (money-like) double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Exact decimal sum returned as DOUBLE (deterministic across runs)."""
    return F.sum(dec(col, scale=scale)).cast("double")


def dsum_expr(col: Column) -> Column:
    """Exact sum of an already-decimal expression, returned as DOUBLE."""
    return F.sum(col).cast("double")


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic average: exact decimal sum, then one IEEE division.

    ``CAST(SUM(decimal) AS DOUBLE) / COUNT(col)`` — both operands exact, the
    single division is correctly rounded, so the result is identical across
    engines and partition orders (unlike ``AVG(double)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale=scale)).cast("double") / F.count(c)
