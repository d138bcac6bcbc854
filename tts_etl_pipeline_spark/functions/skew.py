"""Skew-mitigation join utilities (100 TB posture, SURVEY.md §7 item 6).

First line of defense is AQE's skew-join splitting (enabled in session.py).
`salted_join` is the explicit fallback for the pathological case AQE can't
fix: one join key carrying an unsplittable fraction of the fact side.

Mechanics: the fact (skewed) side gets a per-ROW salt in [0, n) from
monotonically_increasing_id (consecutive within a partition, so the salt
round-robins every row — including bit-identical duplicate rows, which a
row-content hash would pile into one bucket, exactly the rows a hot key is
made of), widening the hot key across n reducer partitions; the dimension
side is replicated n times (explode over sequence) so every (key, salt)
pair finds its match. Result is row-identical to the unsalted join; shuffle
width for the hot key goes from 1 partition to n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `on` with an n-way salt against key skew.

    Use when the dim side is too big to broadcast AND the fact side has hot
    keys. The dim side is replicated n_salts times — size that accordingly.
    Only fact-preserving join types are sound: replicated dim rows would
    surface as spurious/multiplied output in right/full outer joins.
    """
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the dim side is "
            "replicated, so right/full outer (and cross) results would be wrong"
        )
    salted_fact = fact.withColumn(
        SALT_COL,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [on, SALT_COL], how).drop(SALT_COL)
