"""Shared per-epoch-band user-state substrate for the SCD2 queries
(j10_scd2_history and st22_stream_scd2_sync): the time axis splits into
three equal epoch-micro bands (integer-exact cuts both engines compute
identically — the j7/j9 idiom), and each band contributes per user the
latest (tss, event_id)-ordered event_type as that band's state. One
definition keeps the two queries' change streams — and their oracles'
identical CTE prefix — in lock-step; a tie-break or cut-arithmetic fix
lands in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_BANDS = 3

# The oracles' shared CTE prefix: per-(user, band) latest state, collapsed
# into SCD2 versions with LEAD validity bounds. j10/j12 select straight
# from `hist`; st22 appends its deletion-adjustment CTEs; j13 takes the
# PREFIX variant (bands <= upto) via user_state_hist_ctes(upto) — the
# declarative twin of time travel to the version committed after band
# `upto`.
_USER_STATE_HIST_TEMPLATE = """b AS (
      SELECT epoch_us(MIN(ts)) AS tmin, epoch_us(MAX(ts)) AS tmax FROM events
    ),
    tagged AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tss,
             CASE
               WHEN epoch_us(ts) <= b.tmin + ((b.tmax - b.tmin) // 3) THEN 1
               WHEN epoch_us(ts) <= b.tmin + (((b.tmax - b.tmin) * 2) // 3)
                 THEN 2
               ELSE 3
             END AS band
      FROM events, b
    ),
    ranked AS (
      SELECT user_id, band, event_type, tss,
             ROW_NUMBER() OVER (PARTITION BY user_id, band
                                ORDER BY tss DESC, event_id DESC) AS rn
      FROM tagged
    ),
    states AS (
      SELECT user_id, band, event_type, tss FROM ranked
      WHERE rn = 1 AND ({states_pred})
    ),
    seq AS (
      SELECT user_id, event_type, tss,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY band) AS rn2,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY band) AS prev
      FROM states
    ),
    collapsed AS (
      SELECT user_id, event_type AS state, tss AS valid_from
      FROM seq WHERE rn2 = 1 OR prev IS DISTINCT FROM event_type
    ),
    hist AS (
      SELECT user_id, state, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS valid_to
      FROM collapsed
    )"""


def user_state_hist_ctes(upto: int = N_BANDS) -> str:
    """The shared oracle CTE prefix with only the first `upto` bands'
    states folded in — upto=N_BANDS is the full history (what
    USER_STATE_HIST_CTES pins for j10/j12/st22); a smaller `upto` is the
    declarative equivalent of reading the SCD2 dimension AS OF the
    version committed after that band (j13's time-travel composition)."""
    return user_state_hist_ctes_where(f"band <= {upto}")


def user_state_hist_ctes_where(states_pred: str) -> str:
    """The shared prefix with an arbitrary per-state SQL predicate over
    (user_id, band, event_type, tss) — j15 folds only a KEY SUBRANGE of
    bands 2..3 into its clustered dimension, so its oracle keeps band 1
    whole and band-filters the rest: `band = 1 OR user_id <= mid`."""
    return _USER_STATE_HIST_TEMPLATE.format(states_pred=states_pred)


USER_STATE_HIST_CTES = user_state_hist_ctes(N_BANDS)


def band_states(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, bool, int, int, int]:
    """(states, empty, cut1, cut2, tmax): `states` is the per-band latest
    user state — columns (user_id, state, tss, band in 1..N_BANDS) — and
    the cuts/tmax are the integer-exact scalars both engines derive from
    MIN/MAX(ts). Empty events yield an empty `states` with zeroed cuts."""
    from tts_etl_pipeline_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tss"),
    )
    bounds = ev.agg(
        F.min("tss").alias("tmin"), F.max("tss").alias("tmax")
    ).collect()[0]
    empty = bounds.tmin is None
    cut1 = 0 if empty else bounds.tmin + ((bounds.tmax - bounds.tmin) // 3)
    cut2 = 0 if empty else bounds.tmin + (((bounds.tmax - bounds.tmin) * 2) // 3)
    tmax = 0 if empty else bounds.tmax
    conds = [
        F.col("tss") <= cut1,
        (F.col("tss") > cut1) & (F.col("tss") <= cut2),
        F.col("tss") > cut2,
    ]
    w = Window.partitionBy("user_id").orderBy(F.desc("tss"), F.desc("event_id"))
    per_band = [
        ev.filter(cond)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "state", "tss")
        .withColumn("band", F.lit(i + 1))
        for i, cond in enumerate(conds)
    ]
    from tts_etl_pipeline_spark.functions.checkpoints import materialize

    states = per_band[0]
    for p in per_band[1:]:
        states = states.unionByName(p)
    # materialized once: both consumers slice it repeatedly (per-band
    # batches, cumulative snapshots) and the window passes are paid once
    return materialize(states), empty, cut1, cut2, tmax
