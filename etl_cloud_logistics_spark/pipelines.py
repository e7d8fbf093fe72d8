"""End-to-end daily incremental ETL pipeline — the engine-native analog of
the reference's ``scripts/05_etl_pipeline/etl_pipeline.py`` run loop
(extract → stage raw → transform dims (SCD2) → build fact → load → report →
audit log), composed from this package's operators.

Key departures from the reference, all deliberate (SURVEY.md §3.2):
- ONE lazy DataFrame graph per run: intermediates never materialize to the
  driver (the reference round-trips every stage through driver-local pandas);
- the SCD2 merge actually executes (the reference generates the MERGE SQL
  and leaves it commented out, etl_pipeline.py:1087-1090);
- loads are partitioned parquet with dynamic partition overwrite, so
  re-running a day is idempotent instead of append-duplicating.

Scale notes (100 TB): the only wide operations per run are (a) the fact's
orders⋈lineitem join, keyed on orderkey, and (b) the SCD2 classify join,
keyed on the natural key — both single shuffles AQE can size and de-skew.
Dimension lookups broadcast.  The daily extract is partition-pruned by the
run date, so cost scales with the day's slice, not table history.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions import date_key, sum_exact
from .operators.dims import generate_dim_date
from .operators.quality import flag_outliers, qa_flags
from .operators.scd2 import scd2_apply, scd2_asof_lookup
from .sources.lake import write_partitioned_lake
from .sources.staging import write_json_staging

DIM_CUSTOMER_KEYS = ["c_custkey"]
DIM_CUSTOMER_TRACKED = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@dataclass
class EtlAudit:
    """The reference's ``load_logs`` row (01_data_generation.py:53-57)."""

    run_date: str
    started_at: float = field(default_factory=time.time)
    finished_at: float | None = None
    status: str = "running"
    error_message: str | None = None
    records: dict[str, int] = field(default_factory=dict)

    def as_row(self) -> dict:
        return {
            "process_name": "daily_etl",
            "run_date": self.run_date,
            "records_inserted": sum(self.records.values()),
            "detail": str(self.records),
            "start_time": self.started_at,
            "end_time": self.finished_at,
            "status": self.status,
            "error_message": self.error_message,
        }


def _path(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, name)


def extract_orders_for_date(spark: SparkSession, sf_dir: str, run_date: str) -> DataFrame:
    """Incremental extract (ref extract_deliveries, etl_pipeline.py:230-277):
    one day's orders — the date predicate prunes partitions/rowgroups at the
    scan, the Spark twin of the reference pushing its WHERE into Postgres."""
    return load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") == F.lit(run_date).cast("date")
    )


def build_fact_orders(
    orders: DataFrame, lineitem: DataFrame, dim_customer: DataFrame
) -> DataFrame:
    """Fact build (ref etl_pipeline.py:817-944): degenerate keys, as-of
    surrogate lookup into the SCD2 customer dimension, derived measures,
    QA flags."""
    enriched = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice")
        .agg(
            F.count("*").alias("n_items"),
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "net_revenue"
            ),
            sum_exact("l_quantity").alias("total_qty"),
        )
    )
    dim = dim_customer.select(
        F.col("c_custkey").alias("o_custkey"),
        "c_mktsegment",
        "valid_from",
        "valid_to",
        "is_current",
    )
    fact = scd2_asof_lookup(
        dim,
        enriched,
        keys=["o_custkey"],
        fact_ts="o_orderdate",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        date_key("o_orderdate").alias("date_key"),
        "o_orderstatus",
        "c_mktsegment",
        "o_totalprice",
        "n_items",
        "net_revenue",
        "total_qty",
        F.col("valid_from").alias("customer_version_from"),
    )
    # QA: negative measures corrected + flagged; outliers marked (ref
    # etl_pipeline.py:313-322,851-873)
    fact = qa_flags(fact, ["o_totalprice", "net_revenue", "total_qty"])
    return flag_outliers(fact, "o_totalprice")


def refresh_report_segment_totals(
    fact_path: str, spark: SparkSession, out_path: str, run_date: str | None = None
) -> int:
    """Pre-aggregated report refresh (ref REPORT_* rebuilds,
    etl_pipeline.py:1100-1132) — incremental view maintenance:

    1. aggregate ONLY the run date's fact slice to a day-grain partition
       (``<out>_daily/``, dynamic partition overwrite → re-runs replace the
       day, never double-count);
    2. roll the day-grain aggregates up into the totals table — counts and
       decimal sums re-aggregate losslessly (operators.quality
       .merge_aggregates rationale), so the totals never rescan the fact.

    At 100 TB the daily refresh cost is O(one day) + O(|report days|),
    versus the reference's full-table rebuild."""
    daily_path = out_path.rstrip("/") + "_daily"
    fact = spark.read.parquet(fact_path)
    day_slice = (
        fact.filter(F.col("ingest_date") == F.lit(run_date).cast("date"))
        if run_date is not None
        else fact
    )
    day_agg = day_slice.groupBy("c_mktsegment", "ingest_date").agg(
        F.count("*").alias("n_orders"),
        sum_exact("net_revenue").alias("sum_revenue"),
        F.sum(F.when(~F.col("qa_passed"), 1).otherwise(0)).alias("n_qa_failed"),
    )
    (
        day_agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_date")
        .parquet(daily_path)
    )
    daily = spark.read.parquet(daily_path)
    report = daily.groupBy("c_mktsegment").agg(
        F.sum("n_orders").alias("n_orders"),
        F.round(F.sum("sum_revenue"), 2).alias("total_revenue"),
        F.round(F.sum("sum_revenue") / F.sum("n_orders"), 2).alias("avg_revenue"),
        F.sum("n_qa_failed").alias("n_qa_failed"),
    )
    report.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path).count()


def run_daily_etl(
    spark: SparkSession, sf_dir: str, warehouse: str, run_date: str
) -> EtlAudit:
    """One incremental run (the reference's ``ETL.run_etl``,
    etl_pipeline.py:1176-1279).  Lands, under ``warehouse/``:

    - ``staging/``       raw JSON of the day's extract (audit trail, S5)
    - ``dim_date/``      calendar rows covering the day (anti-join insert, J7)
    - ``dim_customer/``  SCD2 dimension after today's merge (J8/J9)
    - ``fact_orders/``   date-partitioned fact (S7), QA-flagged
    - ``report_segment_totals/``  rebuilt aggregate table
    - ``load_logs/``     one audit row per run
    """
    audit = EtlAudit(run_date=run_date)
    try:
        # -- extract (pushdown) + raw staging ---------------------------------
        day_orders = extract_orders_for_date(spark, sf_dir, run_date)
        write_json_staging(day_orders, _path(warehouse, "staging"), batch_id=run_date)
        audit.records["staging"] = day_orders.count()

        # -- dim_date: incremental anti-join insert (J7) -----------------------
        dim_date_path = _path(warehouse, "dim_date")
        new_dates = generate_dim_date(spark, run_date, run_date)
        if os.path.exists(dim_date_path):
            existing = spark.read.parquet(dim_date_path)
            new_dates = new_dates.join(
                existing.select("date_key"), "date_key", "left_anti"
            )
            new_dates.write.mode("append").parquet(dim_date_path)
        else:
            new_dates.write.mode("overwrite").parquet(dim_date_path)
        audit.records["dim_date"] = spark.read.parquet(dim_date_path).count()

        # -- dim_customer: SCD2 merge (J8/J9) ----------------------------------
        dim_cust_path = _path(warehouse, "dim_customer")
        staging_cust = (
            day_orders.select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .join(load_table(spark, sf_dir, "customer"), "c_custkey")
            .select(*DIM_CUSTOMER_KEYS, *DIM_CUSTOMER_TRACKED)
        )
        if os.path.exists(dim_cust_path):
            current = spark.read.parquet(dim_cust_path)
        else:
            current = (
                staging_cust.limit(0)
                .withColumn("valid_from", F.lit(None).cast("date"))
                .withColumn("valid_to", F.lit(None).cast("date"))
                .withColumn("is_current", F.lit(True))
            )
        merged = scd2_apply(
            current,
            staging_cust,
            keys=DIM_CUSTOMER_KEYS,
            tracked=DIM_CUSTOMER_TRACKED,
            effective_date=run_date,
        )
        # functional rewrite: land the new snapshot, then swap
        tmp = dim_cust_path + "._next"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(dim_cust_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        dim_customer = spark.read.parquet(dim_cust_path)
        audit.records["dim_customer"] = dim_customer.count()

        # -- fact build + partitioned load (S7) --------------------------------
        lineitem = load_table(spark, sf_dir, "lineitem")
        fact = build_fact_orders(day_orders, lineitem, dim_customer)
        fact_path = _path(warehouse, "fact_orders")
        write_partitioned_lake(fact, fact_path, date_col="o_orderdate")
        audit.records["fact_orders"] = (
            spark.read.parquet(fact_path)
            .filter(F.col("ingest_date") == F.lit(run_date).cast("date"))
            .count()
        )

        # -- data-quality gate over the day's slice ----------------------------
        from .operators.expectations import (
            expect_not_null,
            expect_positive,
            run_expectations,
        )

        day_fact = spark.read.parquet(fact_path).filter(
            F.col("ingest_date") == F.lit(run_date).cast("date")
        )
        dq = run_expectations(
            day_fact,
            [
                expect_positive("n_items"),
                expect_not_null("c_mktsegment"),
                expect_not_null("date_key"),
            ],
            unique_cols=["o_orderkey"],
        ).withColumn("run_date", F.lit(run_date).cast("date"))
        (
            dq.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run_date")
            .parquet(_path(warehouse, "dq_reports"))
        )
        audit.records["dq_failed"] = dq.filter(~F.col("passed")).count()

        # -- report refresh -----------------------------------------------------
        audit.records["report_segment_totals"] = refresh_report_segment_totals(
            fact_path, spark, _path(warehouse, "report_segment_totals"), run_date
        )
        audit.status = "success"
    except Exception as e:  # audit trail first, then re-raise (ref :64-72)
        audit.status = "error"
        audit.error_message = str(e)[:500]
        raise
    finally:
        audit.finished_at = time.time()
        log_df = spark.createDataFrame(
            [audit.as_row()],
            schema=(
                "process_name string, run_date string, records_inserted long, "
                "detail string, start_time double, end_time double, "
                "status string, error_message string"
            ),
        )
        log_df.write.mode("append").json(_path(warehouse, "load_logs"))
    return audit
