"""Z-order clustering: multi-column data-skipping layout (B11 table
maintenance, next to bucketing.py's co-located joins and sink.py's
compaction).

At 100 TB the scan cost of a selective query is governed by how many files
(and row groups) the reader can SKIP from footer min/max statistics. A
linear sort gives perfect skipping on the leading column and none on any
other; interleaving the bit representations of several columns (the
Z-order / Morton curve, Orenstein & Merrett 1984 — the same layout Delta
Lake's OPTIMIZE ZORDER BY and many warehouse engines use) makes every file
cover a small HYPER-RECTANGLE of the key space, so min/max pruning works
on ALL clustered columns at once, at the price of each being slightly
coarser than a dedicated sort.

Implementation is pure DataFrame ops, JVM-side end-to-end:
1. per column, compute `Z_BITS`-bit quantile ranks via ntile() — rank, not
   raw value, so skew and arbitrary types (dates, strings) flatten into a
   uniform grid. ntile's window is unpartitioned BUT consumes only the
   (row-key, column) projection at write time — this is a WRITE-path
   maintenance job (like compaction), amortized over every later read; a
   production variant samples quantile cuts instead (approxQuantile) to
   avoid even that sort, at no change to the read-side contract;
2. interleave the rank bits into one Morton key with shift/or expressions
   (F.shiftleft — no UDF);
3. repartitionByRange(n_files, zkey) + sortWithinPartitions(zkey) and
   write one file per range partition: each file then owns a contiguous
   Morton range = a small hyper-rectangle per clustered column.

`file_column_ranges` reads the parquet FOOTERS (pyarrow) and returns
per-file min/max per column; `pruning_ratio` evaluates what fraction of
files a range predicate could skip — the measurable contract tests pin:
Z-order prunes on BOTH columns where a linear sort prunes on one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # 256 rank cells per column; 2 cols -> 16-bit Morton key


def morton_key(df: DataFrame, cols: Sequence[str], bits: int = Z_BITS) -> DataFrame:
    """Add a `zkey` column interleaving per-column ntile ranks bitwise."""
    from pyspark.sql.window import Window as W

    out = df
    for c in cols:
        # rank 0 .. 2^bits-1; ntile handles ties/skew by equal-count cells
        out = out.withColumn(
            f"__rank_{c}", F.ntile(1 << bits).over(W.orderBy(c)) - 1
        )
    # interleave: bit b of column i lands at position b*len(cols)+i
    zkey = F.lit(0)
    for b in range(bits):
        for i, c in enumerate(cols):
            src = F.shiftright(F.col(f"__rank_{c}"), b).bitwiseAND(F.lit(1))
            zkey = zkey.bitwiseOR(F.shiftleft(src, b * len(cols) + i))
    return out.withColumn("zkey", zkey).drop(*[f"__rank_{c}" for c in cols])


def zorder_write(
    df: DataFrame, cols: Sequence[str], path: str, n_files: int, bits: int = Z_BITS
) -> None:
    """Write `df` Z-ordered on `cols` into ~`n_files` parquet files."""
    keyed = morton_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def linear_write(df: DataFrame, col: str, path: str, n_files: int) -> None:
    """Baseline layout: range-partitioned linear sort on one column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max per column from parquet footer statistics only."""
    import pathlib

    import pyarrow.parquet as pq

    out = []
    for f in sorted(pathlib.Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(str(f)).metadata
        rec: dict = {"file": f.name}
        for ci in range(meta.num_columns):
            name = meta.row_group(0).column(ci).path_in_schema
            if name not in cols:
                continue
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            rec[name] = (min(mins), max(maxs)) if mins else None
        out.append(rec)
    return out


def pruning_ratio(ranges: list[dict], col: str, lo, hi) -> float:
    """Fraction of files a reader can SKIP for `col BETWEEN lo AND hi`
    using footer stats alone (None stats = unprunable)."""
    skipped = 0
    for rec in ranges:
        r = rec.get(col)
        if r is not None and (r[1] < lo or r[0] > hi):
            skipped += 1
    return skipped / max(1, len(ranges))
