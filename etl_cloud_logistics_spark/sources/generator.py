"""Distributed synthetic data generation (reference layer 1,
``scripts/01_data_generation.py`` — SURVEY.md §2.8 F22).

The reference builds ~500k rows in driver-side Python/NumPy loops and
batch-inserts them.  The Spark-native form generates on the executors:
``spark.range(n)`` → column expressions over ``F.rand(seed)`` — no driver
materialization, linear scale-out, and deterministic per (seed, partition
layout), so tests can hash the output.

Building blocks mirror the generator's distribations:
- weighted categorical (status @ 85/5/10 etc., ref 01:394-396);
- uniform ranges (dates, weights, prices);
- FK sampling against a parent key space (referential integrity by
  construction, ref 01:321-356);
- timestamp interpolation departure + U(0,1)×(arrival−departure)
  (ref 01:469-470, F9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def weighted_choice(r: Column, options: list[tuple[str, float]]) -> Column:
    """Map a U(0,1) column to categories with the given weights —
    the reference's weighted ``random.choices`` as a threshold chain."""
    total = sum(w for _, w in options)
    expr = None
    acc = 0.0
    for value, weight in options[:-1]:
        acc += weight / total
        expr = F.when(r < acc, value) if expr is None else expr.when(r < acc, value)
    last = options[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def uniform_ts(r: Column, start: str, end: str) -> Column:
    """Uniform timestamp in [start, end) via epoch-seconds interpolation."""
    lo = F.unix_timestamp(F.lit(start).cast("timestamp"))
    hi = F.unix_timestamp(F.lit(end).cast("timestamp"))
    return F.timestamp_seconds(lo + (r * (hi - lo)).cast("long"))


def generate_trips_like(
    spark: SparkSession,
    n_rows: int,
    n_vehicles: int = 200,
    n_drivers: int = 400,
    seed: int = 42,
    num_partitions: int = 32,
) -> DataFrame:
    """Synthetic trips-shaped fact table, generated entirely on executors
    (ref 01:316-419 builds the same shape in driver loops):

    - FK columns sampled uniformly from the parent key spaces;
    - status with the reference's 85/5/10 completed/cancelled/in-progress
      weights;
    - departure uniform over 2024; arrival = departure + 1..9 h (arrival >
      departure by construction — the reference's temporal-consistency
      invariant);
    - fuel consumption correlated with duration plus noise.
    """
    base = spark.range(0, n_rows, numPartitions=num_partitions).select(
        F.col("id").alias("trip_id"),
        F.rand(seed).alias("r1"),
        F.rand(seed + 1).alias("r2"),
        F.rand(seed + 2).alias("r3"),
        F.rand(seed + 3).alias("r4"),
    )
    departure = uniform_ts(F.col("r2"), "2024-01-01", "2025-01-01")
    duration_h = 1 + F.col("r3") * 8  # 1..9 hours
    return base.select(
        "trip_id",
        (F.col("r1") * n_vehicles).cast("int").alias("vehicle_id"),
        (F.col("r4") * n_drivers).cast("int").alias("driver_id"),
        departure.alias("departure_datetime"),
        (departure + F.make_dt_interval(hours=duration_h)).alias("arrival_datetime"),
        F.round(duration_h * 7 + F.col("r1") * 5, 2).alias("fuel_consumed_liters"),
        weighted_choice(
            F.col("r3"), [("completed", 85.0), ("cancelled", 5.0), ("in_progress", 10.0)]
        ).alias("status"),
    )
