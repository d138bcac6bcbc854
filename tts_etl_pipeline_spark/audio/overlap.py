"""W1 — adjacent-segment boundary-word overlap flag (pa.py:311-330).

Reference semantics, preserved exactly (SURVEY §2.1-W1 / Appendix bug B4):
- "adjacent" means adjacent among SURVIVORS of the text filters, not
  adjacent in the audio — so this window is applied AFTER F4-F6;
- comparison is lowercase last-word of the previous segment vs lowercase
  first word of the current one (pa.py:319-326);
- a match sets the flag on BOTH rows (pa.py:327-328) -> lag and lead;
- default False (pa.py:298); null-safe via coalesce.

One shuffle on original_name; within-file order is (start_ms) which
reproduces the reference's file-sorted sequential scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_overlap_flag(df: DataFrame) -> DataFrame:
    w = W.partitionBy("original_name").orderBy("start_ms")
    words = F.split(F.lower(F.trim("text")), r"\s+")
    first_word = F.element_at(words, 1)
    last_word = F.element_at(words, -1)
    prev_last = F.lag(last_word).over(w)
    next_first = F.lead(first_word).over(w)
    overlap = F.coalesce(prev_last == first_word, F.lit(False)) | F.coalesce(
        next_first == last_word, F.lit(False)
    )
    return df.withColumn("overlap_flag", overlap)
