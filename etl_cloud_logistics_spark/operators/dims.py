"""Dimension generators: dim_date and dim_time.

Reference: pandas ``date_range`` loops building DIM_DATE
(etl_pipeline.py:337-361) and the 96-row 15-minute-grain DIM_TIME
(04_dimensional_model.sql:39-50).  Spark-first replacement:
``F.sequence`` + ``explode`` — generated distributed, never in the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import date_key, day_name, dow_pg


def generate_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension for [start, end] inclusive (ref etl_pipeline.py:
    337-361 builds the same attrs row-by-row in pandas)."""
    d = F.col("full_date")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.lit(end).cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("full_date")
        )
        .select(
            date_key(d).alias("date_key"),
            d,
            F.year(d).cast("int").alias("year"),
            F.quarter(d).cast("int").alias("quarter"),
            F.month(d).cast("int").alias("month"),
            F.dayofmonth(d).cast("int").alias("day"),
            dow_pg(d).alias("day_of_week"),
            day_name(d).alias("day_name"),
            F.date_format(d, "MMMM").alias("month_name"),
            dow_pg(d).isin(0, 6).alias("is_weekend"),
            (F.dayofmonth(d) == 1).alias("is_month_start"),
            (d == F.last_day(d)).alias("is_month_end"),
        )
    )


def generate_dim_time(spark: SparkSession) -> DataFrame:
    """96-row 15-minute-grain time dimension (ref 04_dimensional_model.sql:
    39-50; time_key = hour*100 + minute, ref etl_pipeline.py:834-840)."""
    m = F.col("minute_of_day")
    hour = F.floor(m / 60).cast("int")
    minute = (m % 60).cast("int")
    return (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(1425), F.lit(15))).alias(
                "minute_of_day"
            )
        )
        .select(
            (hour * 100 + minute).alias("time_key"),
            hour.alias("hour"),
            minute.alias("minute"),
            F.when(hour < 12, "AM").otherwise("PM").alias("am_pm"),
            F.when(hour.between(6, 11), "morning")
            .when(hour.between(12, 17), "afternoon")
            .when(hour.between(18, 21), "evening")
            .otherwise("night")
            .alias("day_part"),
        )
    )
