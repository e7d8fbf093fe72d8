"""Time-series resampling: regular-grid spine + gap-fill (hypertable-rollup
family).

The reference's real-time path keeps per-vehicle time-series state in
DynamoDB (hash+range key, ``scripts/06_aws_setup.py:105-146``) and recomputes
ETAs on a schedule; a warehouse consuming that feed needs the classic
``time_bucket`` + gap-fill + last-observation-carried-forward (LOCF)
resample that hypertables (TimescaleDB ``time_bucket_gapfill``/``locf``,
InfluxDB ``fill(previous)``) provide.  This module is that operator as a
pure DataFrame composition.

Scale design (100 TB of events):
- the spine is generated DISTRIBUTED: one ``sequence()`` array per key from
  that key's [min,max] bucket span, exploded on the executors — never a
  driver-side loop or a literal range table;
- per-bucket "last observation" is a keyed window (one shuffle on
  (key, bucket)); the forward fill is a second window on key ordered by
  bucket — both are the partitioning the downstream rollup needs anyway;
- spine cardinality is span/step per key, independent of event count: for
  high-frequency telemetry the resample SHRINKS data (that is its job);
  for sparse keys over long spans, bound the span or step accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def time_bucket(ts, step_seconds: int):
    """Floor a timestamp column onto a regular epoch grid (TimescaleDB
    ``time_bucket``).  Integer epoch math so engines agree exactly."""
    epoch = F.unix_timestamp(ts)
    return F.from_unixtime(
        F.floor(epoch / F.lit(step_seconds)) * F.lit(step_seconds)
    ).cast("timestamp")


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Resample ``value_col`` onto a regular ``step_seconds`` grid per key,
    carrying the last observation forward across empty buckets.

    Per (key, bucket): ``n_obs`` = observation count, ``last_value`` = value
    of the latest observation (ties broken by ``tiebreak_col`` descending —
    deterministic across engines), ``value_ffill`` = LOCF fill (null until
    the key's first observation), ``gap_filled`` = bucket had no rows.
    The spine spans each key's own [first, last] bucket, so no key is
    extrapolated beyond its observed range."""
    bucket = time_bucket(F.col(ts_col), step_seconds).alias("bucket_ts")
    obs = df.select(
        F.col(key_col), bucket, F.col(ts_col), F.col(value_col), F.col(tiebreak_col)
    )

    # per-bucket last observation: rank the bucket's rows, keep rank 1's value
    w_rank = W.partitionBy(key_col, "bucket_ts").orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    per_bucket = (
        obs.withColumn("__rn", F.row_number().over(w_rank))
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count("*").alias("n_obs"),
            F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias("last_value"),
        )
    )

    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    spine = (
        per_bucket.groupBy(key_col)
        .agg(F.min("bucket_ts").alias("__b0"), F.max("bucket_ts").alias("__b1"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__b0"), F.col("__b1"), step)).alias(
                "bucket_ts"
            ),
        )
    )

    w_fill = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(per_bucket, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
            F.last("last_value", ignorenulls=True).over(w_fill).alias("value_ffill"),
            F.col("n_obs").isNull().alias("gap_filled"),
        )
        # no final orderBy: the spine is (keys × span/step) rows — a global
        # sort of it would dwarf the two keyed exchanges that do the work;
        # consumers already receive it clustered by key from the fill window
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Gap-fill by LINEAR INTERPOLATION between the neighboring observed
    buckets (TimescaleDB ``interpolate``, InfluxDB ``fill(linear)``) — the
    sibling of ``resample_locf`` for continuous signals where
    carry-forward would manufacture plateaus.

    Non-empty buckets keep their own last observation; an empty bucket
    between two observed buckets gets the time-weighted lerp of their
    values (x = bucket epoch); leading/trailing gaps (no neighbor on one
    side) stay null — interpolation never extrapolates.  Same two keyed
    shuffles as the LOCF form: the backward- and forward-looking windows
    share one (key, bucket) ordering."""
    bucket = time_bucket(F.col(ts_col), step_seconds).alias("bucket_ts")
    obs = df.select(
        F.col(key_col), bucket, F.col(ts_col), F.col(value_col), F.col(tiebreak_col)
    )
    w_rank = W.partitionBy(key_col, "bucket_ts").orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    per_bucket = (
        obs.withColumn("__rn", F.row_number().over(w_rank))
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count("*").alias("n_obs"),
            F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias("last_value"),
        )
    )
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    spine = (
        per_bucket.groupBy(key_col)
        .agg(F.min("bucket_ts").alias("__b0"), F.max("bucket_ts").alias("__b1"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__b0"), F.col("__b1"), step)).alias(
                "bucket_ts"
            ),
        )
    )
    joined = spine.join(per_bucket, [key_col, "bucket_ts"], "left")
    w_prev = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_ts = F.when(F.col("last_value").isNotNull(), F.col("bucket_ts"))
    prev_val = F.last("last_value", ignorenulls=True).over(w_prev)
    prev_ts = F.last(known_ts, ignorenulls=True).over(w_prev)
    next_val = F.first("last_value", ignorenulls=True).over(w_next)
    next_ts = F.first(known_ts, ignorenulls=True).over(w_next)
    frac = (
        (F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_ts)).cast("double")
        / (F.unix_timestamp(next_ts) - F.unix_timestamp(prev_ts)).cast("double")
    )
    # NO rounding on the lerp: every term is evaluated in the same IEEE
    # order in any engine, so the raw double is bit-identical — while
    # ROUND(double, n) is NOT cross-engine stable at half boundaries
    # (Spark rounds the shortest decimal representation, DuckDB scales by
    # 10^n first), and lerps of low-precision inputs land on exact halves
    # systematically (frac = 1/2 between 2-decimal values).
    interp = F.when(F.col("last_value").isNotNull(), F.col("last_value")).otherwise(
        prev_val + (next_val - prev_val) * frac
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias("n_obs"),
        interp.alias("value_interp"),
        F.col("n_obs").isNull().alias("gap_filled"),
    )
