"""Two-phase per-key top-N: the hot-key-safe form of `row_number() <= N`.

A plain `Window.partitionBy(key)` top-N ships EVERY row of a key to one
reducer before dropping all but N — at 100 TB a hot key (one crawl domain
with 10^9 docs) is a single straggler task. The standard fix is two-phase:

  phase 1 (no shuffle): inside each Arrow batch, keep only the top N rows
    per key. Top-N is subset-monotone — a row in the global top N of its
    key is in the top N of ANY subset containing it — so per-batch pruning
    never discards a global survivor. Survivors per key are bounded by
    N x (number of batches that saw the key), not the key's row count.
  phase 2: the usual partitioned window over the pruned relation computes
    exact global row numbers.

Used by operators/curation.py c8 (per-source quota). The same wrapper
applies to any per-key top-k whose window input is data-grain; per-key
pre-aggregated inputs (w1's supplier grain) don't need it.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def partial_topn_per_key(
    df: DataFrame,
    keys: list[str],
    order: list[tuple[str, bool]],
    n: int,
) -> DataFrame:
    """Prune `df` to at most `n` rows per `keys` group per Arrow batch,
    ordered by `order` ([(column, ascending), ...] — must be a total order,
    e.g. end with a unique id, for deterministic survivors). The result is a
    SUPERSET of the exact per-key top-n; follow with the exact window."""
    import pandas as pd

    cols = [c for c, _ in order]
    asc = [a for _, a in order]
    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(cols, ascending=asc)
                    .groupby(keys, sort=False)
                    .head(n)
                )

    return df.mapInPandas(prune, schema)
