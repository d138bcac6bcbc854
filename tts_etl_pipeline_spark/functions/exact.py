"""Cross-engine-exact numeric expressions.

The driver verifies every query against a DuckDB oracle with an
order-insensitive *value hash* — so floating-point aggregates must be
bit-identical between Spark and DuckDB. Double summation is order-dependent
(Spark's partial aggregation order differs run to run), so any SUM/AVG over
money-like doubles goes through DECIMAL:

* the test data's money columns (prices, discounts, taxes, balances) carry
  <= 2 decimal digits, so casting double -> DECIMAL(p,2) is lossless and
  identical in both engines;
* decimal addition/multiplication is exact, hence order-independent;
* the final cast back to double rounds-to-nearest identically everywhere.

AVG is expressed as exact-decimal SUM divided by COUNT *in double*, because
DuckDB's AVG(decimal) returns a double computed incrementally (order
dependent) while Spark's returns a decimal. sum/count is one deterministic
double division on identical inputs -> identical bits.

Keep the same discipline in the oracle SQL strings (see operators/*.py):
every aggregate is written with the same casts on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precisions chosen so products stay exactly representable in both engines:
# MONEY(12,2) * FRAC(4,2) * FRAC(4,2) has scale 6 / precision ~22 — far below
# the 38-digit decimal limit, so neither engine truncates.
MONEY = "decimal(12,2)"
FRAC = "decimal(4,2)"


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def frac(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(FRAC)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * (F.lit(1).cast(FRAC) - frac("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (F.lit(1).cast(FRAC) + frac("l_tax"))


# The same expressions as ANSI SQL fragments for the DuckDB oracle strings.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
