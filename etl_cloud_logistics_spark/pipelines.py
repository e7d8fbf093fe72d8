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

import json
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
from .sources.upsert import atomic_overwrite

DIM_CUSTOMER_KEYS = ["c_custkey"]
DIM_CUSTOMER_TRACKED = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
# second SCD2 dimension (the reference tracks SCD2 on BOTH dim_vehicle and
# dim_driver, 04_dimensional_model.sql:53-85 — supplier is our second dim)
DIM_SUPPLIER_KEYS = ["s_suppkey"]
DIM_SUPPLIER_TRACKED = ["s_name", "s_nationkey", "s_acctbal"]


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
    QA flags.

    The as-of lookup runs with default policies here deliberately: a
    steady-state daily extract would benefit from
    ``scd2_asof_lookup(prefilter_dim_keys=True)`` (r11 — 4.4× less
    exchange at a 1e7-dim/1e6-key day, see BLOOMRT_PROBE_r11.txt), but
    this function also serves initial loads and backfills whose extract
    touches MOST dim keys, where the prefilter's forced key broadcast
    inverts into the same scale wall the r10 adaptive broadcast policy
    removed.  Callers that KNOW their extract is a thin daily slice can
    pass the flag through their own lookup; the pipeline default stays
    shape-safe."""
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
    """Pre-aggregated report refresh (ref REPORT_DRIVER_TOTALS,
    etl_pipeline.py:1100-1116) — incremental view maintenance:

    1. aggregate ONLY the run date's fact slice to a day-grain partition
       (``<out>_daily/``, dynamic partition overwrite → re-runs replace the
       day, never double-count);
    2. roll the day-grain aggregates up into the totals table — counts and
       decimal sums re-aggregate losslessly (operators.quality
       .merge_aggregates rationale), so the totals never rescan the fact.

    At 100 TB the daily refresh cost is O(one day) + O(|report days|),
    versus the reference's full-table rebuild."""
    return _refresh_report(fact_path, spark, out_path, "c_mktsegment", run_date)


def refresh_report_status_totals(
    fact_path: str, spark: SparkSession, out_path: str, run_date: str | None = None
) -> int:
    """The SECOND pre-aggregated report table (ref REPORT_ROUTE_TOTALS,
    etl_pipeline.py:1117-1132 — the reference maintains a PAIR of report
    tables per run): totals keyed by order status, same incremental
    day-grain + rollup layout as the segment report."""
    return _refresh_report(fact_path, spark, out_path, "o_orderstatus", run_date)


def _refresh_report(
    fact_path: str,
    spark: SparkSession,
    out_path: str,
    group_col: str,
    run_date: str | None = None,
) -> int:
    daily_path = out_path.rstrip("/") + "_daily"
    fact = spark.read.parquet(fact_path)
    day_slice = (
        fact.filter(F.col("ingest_date") == F.lit(run_date).cast("date"))
        if run_date is not None
        else fact
    )
    day_agg = day_slice.groupBy(group_col, "ingest_date").agg(
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
    report = daily.groupBy(group_col).agg(
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
    - ``dim_supplier/``  second SCD2 dimension (ref dual SCD2, 04:53-85)
    - ``fact_orders/``   date-partitioned fact (S7), QA-flagged
    - ``report_segment_totals/`` + ``report_status_totals/``  the pair of
      rebuilt aggregate tables (ref dual reports, etl_pipeline.py:1100-1132)
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

        # -- SCD2 dimension merges (J8/J9) — BOTH tracked dims, mirroring the
        # reference's dual SCD2 on dim_vehicle + dim_driver (04:53-85) -------
        def scd2_refresh(
            dim_path: str, staging: DataFrame, keys: list[str], tracked: list[str]
        ) -> DataFrame:
            if os.path.exists(dim_path):
                current = spark.read.parquet(dim_path)
            else:
                current = (
                    staging.limit(0)
                    .withColumn("valid_from", F.lit(None).cast("date"))
                    .withColumn("valid_to", F.lit(None).cast("date"))
                    .withColumn("is_current", F.lit(True))
                )
            merged = scd2_apply(
                current, staging, keys=keys, tracked=tracked, effective_date=run_date
            )
            # functional rewrite: land the snapshot NEXT TO the live dim, then
            # swap by rename — a crash anywhere leaves a complete dimension
            atomic_overwrite(merged, dim_path)
            return spark.read.parquet(dim_path)

        dim_cust_path = _path(warehouse, "dim_customer")
        staging_cust = (
            day_orders.select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .join(load_table(spark, sf_dir, "customer"), "c_custkey")
            .select(*DIM_CUSTOMER_KEYS, *DIM_CUSTOMER_TRACKED)
        )
        dim_customer = scd2_refresh(
            dim_cust_path, staging_cust, DIM_CUSTOMER_KEYS, DIM_CUSTOMER_TRACKED
        )
        audit.records["dim_customer"] = dim_customer.count()

        lineitem = load_table(spark, sf_dir, "lineitem")
        dim_supp_path = _path(warehouse, "dim_supplier")
        staging_supp = (
            day_orders.select("o_orderkey")
            .join(lineitem, day_orders.o_orderkey == lineitem.l_orderkey)
            .select(F.col("l_suppkey").alias("s_suppkey"))
            .distinct()
            .join(load_table(spark, sf_dir, "supplier"), "s_suppkey")
            .select(*DIM_SUPPLIER_KEYS, *DIM_SUPPLIER_TRACKED)
        )
        dim_supplier = scd2_refresh(
            dim_supp_path, staging_supp, DIM_SUPPLIER_KEYS, DIM_SUPPLIER_TRACKED
        )
        audit.records["dim_supplier"] = dim_supplier.count()

        # -- fact build + partitioned load (S7) --------------------------------
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

        # -- report refresh: BOTH pre-aggregated tables (ref loads driver AND
        # route totals every run, etl_pipeline.py:1100-1132) -------------------
        audit.records["report_segment_totals"] = refresh_report_segment_totals(
            fact_path, spark, _path(warehouse, "report_segment_totals"), run_date
        )
        audit.records["report_status_totals"] = refresh_report_status_totals(
            fact_path, spark, _path(warehouse, "report_status_totals"), run_date
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


# ---------------------------------------------------------------------------
# Training-data export pipeline (the X6 curation kit composed end to end —
# the LLM-data twin of run_daily_etl's warehouse flow)
# ---------------------------------------------------------------------------


def run_curation_export(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 16,
    pack_budget: int = 512,
) -> dict:
    """Curate → shard → pack → manifest: the full path from a raw document
    corpus to training-ready artifacts, composed from the kit operators
    (each individually oracle-checked; this function is the operable
    composition, like ``run_daily_etl`` for the warehouse side).

    Writes under ``out_dir``:
    - ``shards/split=train/shard=N/`` — deterministic md5-sharded parquet
      of the curated TRAIN docs with text payload (one file per shard:
      the resume/shuffle granularity a training loader expects);
    - ``packing/`` — the FFD context-window assignment (doc_id → bucket,
      bin) for the train split at ``pack_budget`` tokens;
    - ``manifest/`` — one row per (split, lang) with doc/token counts:
      the reproducibility record (the md5-keyed split/shard decisions mean
      a re-run over the same corpus rewrites byte-stable content).

    Scale: curation is the documented pipeline plan; the export adds one
    repartition keyed on shard (the write layout) and the Arrow packing
    pass — nothing new shuffles the corpus more than once."""
    from .operators.curation import pack_sequences, shard_assign
    from .queries.curation_ops import curation_pipeline_end2end

    curated = curation_pipeline_end2end(spark, sf_dir).localCheckpoint(eager=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = curated.filter(F.col("split") == "train")
    payload = train.join(docs, "doc_id")
    (
        shard_assign(payload, "doc_id", n_shards)
        .withColumn("split", F.lit("train"))
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(os.path.join(out_dir, "shards"))
    )
    packing = pack_sequences(
        train.withColumnRenamed("n_tok", "n_tokens"), budget=pack_budget
    )
    packing.write.mode("overwrite").parquet(os.path.join(out_dir, "packing"))
    manifest = curated.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))
    rows = manifest.collect()  # small: |splits| x |langs|
    return {
        "out_dir": out_dir,
        "n_shards": n_shards,
        "pack_budget": pack_budget,
        "splits": sorted({r["split"] for r in rows}),
        "n_docs": sum(r["n_docs"] for r in rows),
        "n_tokens": sum(r["n_tokens"] for r in rows),
    }


def run_index_build(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_clusters: int = 8,
    nprobe: int = 2,
    k: int = 3,
) -> dict:
    """Train → build → persist → serve → evaluate for the ANN index: the
    operable composition of the X3 kit (each piece individually measured/
    tested; this is the deployment flow, like ``run_curation_export`` for
    the text side and ``run_daily_etl`` for the warehouse).

    1. TRAIN the coarse quantizer (deterministic Lloyd k-means) and the
       SQ8 bounds from the corpus — bounded model metadata.
    2. BUILD the scored index (bucket + int8 codes + reconstruction norm;
       floats excluded) in one corpus pass.
    3. PERSIST index and model to a versioned ``SnapshotTable`` — the
       index is data, so it gets the same time-travel/atomic-commit
       treatment as any table; a rebuild is a new version, serving reads a
       pinned one.
    4. SERVE a probe query set from the STORED index and
    5. EVALUATE recall@k against the exact brute-force ground truth,
       returning the figure with the manifest — an index build that does
       not report its recall is not done.
    """
    from .operators.similarity import (
        build_sq8_index,
        knn_bruteforce,
        knn_sq8_serve,
        recall_at_k,
        train_ivf_centroids,
        train_sq8_bounds,
    )
    from .sources.snapshots import SnapshotTable

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, n_clusters=n_clusters, n_iter=3)
    lo, hi = train_sq8_bounds(emb)
    index = build_sq8_index(emb, lo, hi, centroids=centroids)

    table = SnapshotTable(os.path.join(out_dir, "ann_index"))
    version = table.write(index)
    # the model is PART of the index version — an unversioned model.json
    # clobbered by rebuilds would dequantize a pinned elder version with
    # the wrong bounds/centroids (silently wrong neighbors); write one
    # model per version, atomically (tmp + rename)
    model = {"centroids": centroids, "lo": lo, "hi": hi, "n_clusters": n_clusters}
    model_path = os.path.join(out_dir, "ann_index", f"model_v{version}.json")
    tmp_path = model_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(model, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_path, model_path)

    stored = table.read(spark, version)
    queries = emb.filter(F.col("vec_id") < 10)
    served = knn_sq8_serve(
        stored, queries, emb, k, lo, hi, centroids=centroids, nprobe=nprobe
    )
    exact = knn_bruteforce(queries, emb, k=k)
    recall = (
        recall_at_k(served, exact).agg(F.avg("recall").alias("r")).first()["r"]
    )
    return {
        "index_version": version,
        "index_rows": stored.count(),
        "n_clusters": n_clusters,
        "nprobe": nprobe,
        "recall_at_k": recall,
        "model_path": model_path,
    }


def run_index_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    out_dir: str,
) -> dict:
    """Append-only incremental maintenance of the ANN index built by
    :func:`run_index_build` — the FAISS ``add``-without-``train``
    contract: NEW vectors are encoded with the index's PINNED model
    (coarse quantizer + SQ8 bounds read from the latest version's model
    file, NEVER retrained — retraining would re-bucket history, which is a
    REBUILD and gets its own version + model via ``run_index_build``) and
    committed as an APPEND version of the same ``SnapshotTable``: no
    existing index file is read, re-encoded, or rewritten, so the cost is
    O(delta), while serving from the new version sees old ∪ new and a
    pinned elder version still time-travels to exactly its own rows.

    The stated trade-off (same as FAISS add-after-train): if the delta's
    distribution drifts outside the trained SQ8 bounds, out-of-range
    dimensions clamp — quantization error grows for those vectors until
    the next full rebuild refreshes bounds; the exact-rerank contract
    still guarantees REPORTED scores stay exact, drift can only cost
    shortlist recall.  The new version gets its own model file with the
    inherited parameters, preserving the one-model-per-version invariant
    (every version can always be dequantized with the parameters it was
    encoded under)."""
    from .operators.similarity import build_sq8_index
    from .sources.snapshots import SnapshotTable

    table = SnapshotTable(os.path.join(out_dir, "ann_index"))
    parent = table.latest_version()
    if parent is None:
        raise FileNotFoundError(
            f"no ANN index at {out_dir!r} — run_index_build first; append "
            "has no model to encode with"
        )
    model_path = os.path.join(out_dir, "ann_index", f"model_v{parent}.json")
    with open(model_path) as f:
        model = json.load(f)

    delta = build_sq8_index(
        new_vectors, model["lo"], model["hi"], centroids=model["centroids"]
    )
    version = table.write(delta, mode="append", operation="index-append")
    new_model_path = os.path.join(
        out_dir, "ann_index", f"model_v{version}.json"
    )
    tmp_path = new_model_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(model, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_path, new_model_path)
    return {
        "index_version": version,
        "parent_version": parent,
        "appended_rows": new_vectors.count(),
        "index_rows": table.read(spark).count(),
        "model_path": new_model_path,
    }


def run_incremental_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    threshold: float = 0.5,
    n: int = 3,
    n_hashes: int = 8,
    rows_per_band: int = 2,
) -> dict:
    """Incremental ingestion dedup — how a 100 TB pipeline actually runs
    MinHash dedup: each arriving batch is checked against a PERSISTED
    signature store (a versioned ``SnapshotTable`` of per-doc signatures +
    LSH band keys), never against re-read history text.

    Per batch:
    1. signatures + band keys for the NEW docs only (one narrow pass);
    2. candidates = band-key equi-join of new against (store ∪ new) — so
       within-batch duplicates are caught in the same pass; history-side
       cost is a join against stored keys, O(|store| matched buckets), no
       recompute;
    3. verdict by SIGNATURE agreement (matching minima / n_hashes — the
       unbiased MinHash estimate of Jaccard): stored state is O(n_hashes)
       strings per doc, so the store never holds text; a pipeline wanting
       exact-Jaccard confirmation fetches the original text for the
       (rare) flagged pairs out of band — stated trade-off;
    4. only UNIQUE new docs' signatures append to the store (a new
       version: time travel gives every past ingest's dedup state), so a
       replayed batch deduplicates against itself — idempotent ingest.

    Returns the verdicts (doc_id, dup_of — smallest matching prior/peer
    id) and the commit info."""
    from .operators.dedup import band_keys, minhash_signatures, shingle_array
    from .sources.snapshots import SnapshotTable

    # short_doc_fallback: docs with < n tokens would otherwise produce
    # all-null minima → sig='' and band_key='' → every distinct short doc
    # silently flagged a duplicate of the first one (est_jaccard compares
    # ''=='' at every offset).  The fallback hashes the full text instead.
    #
    # Signature-scheme versioning: signatures are only comparable when
    # derived identically — a store written under a different shingle n,
    # hash count, banding, or fallback rule would silently miss (or
    # falsely merge) cross-era duplicates.  Every state row carries the
    # scheme stamp; a mismatch on read refuses loudly rather than
    # mis-deduplicating (backfill needs the original text, which the store
    # deliberately never holds — so the remedies are re-ingest into a new
    # store, or read history with the old parameters).
    scheme = f"mh1:n{n}:h{n_hashes}:rpb{rows_per_band}:sdf1"
    sh = shingle_array(new_docs, n=n, short_doc_fallback=True)
    sig_long = minhash_signatures(sh, n_hashes=n_hashes).localCheckpoint(eager=True)
    bands_new = band_keys(sig_long, rows_per_band=rows_per_band)
    sig_new = sig_long.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "h"))), lambda x: x["h"]
            ),
        ).alias("sig")
    )
    state_new = sig_new.join(bands_new, "doc_id").select(
        "doc_id", "sig", "band", "band_key", F.lit(scheme).alias("scheme")
    )

    table = SnapshotTable(store_path)
    try:
        stored = table.read(spark)
        if "scheme" not in stored.columns:
            raise ValueError(
                f"signature store at {store_path} predates scheme stamping — "
                f"its signatures are not comparable to {scheme!r} ones; "
                f"re-ingest into a fresh store"
            )
        foreign = (
            stored.select("scheme").filter(F.col("scheme") != scheme).limit(1).collect()
        )
        if foreign:
            raise ValueError(
                f"signature store at {store_path} holds scheme "
                f"{foreign[0]['scheme']!r} but this run derives {scheme!r} — "
                f"cross-era signatures would silently miss duplicates; "
                f"re-ingest into a fresh store or run with the stored "
                f"parameters"
            )
    except FileNotFoundError:
        stored = spark.createDataFrame(
            [], "doc_id long, sig string, band bigint, band_key string, scheme string"
        )
    # tag sides: against HISTORY any stored match blocks a new doc (ids are
    # independent spaces, no ordering assumption); within the BATCH the
    # smaller id wins, like every canonicalizer here.  A re-sent doc_id
    # (replayed batch) is a duplicate of its stored self by id identity.
    pool = (
        stored.withColumn("is_new", F.lit(False))
        .unionByName(state_new.withColumn("is_new", F.lit(True)))
        .localCheckpoint(eager=True)
    )
    a = state_new.select(F.col("doc_id").alias("new_id"), "band", "band_key")
    b = pool.select(F.col("doc_id").alias("old_id"), "band", "band_key", "is_new")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(
            (~F.col("is_new") & (F.col("old_id") != F.col("new_id")))
            | (F.col("is_new") & (F.col("old_id") < F.col("new_id")))
        )
        .select("new_id", "old_id")
        .distinct()
    )
    replayed = state_new.select("doc_id").join(
        stored.select("doc_id").distinct(), "doc_id"
    ).select(F.col("doc_id").alias("new_id"), F.col("doc_id").alias("old_id"))
    sig_pool = pool.select("doc_id", "sig").distinct()
    # signature agreement: count matching 32-hex minima at aligned offsets
    match_frac = (
        F.aggregate(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            F.lit(0),
            lambda acc, j: acc
            + F.when(
                F.substring(F.col("sig_a"), j * 32 + 1, 32)
                == F.substring(F.col("sig_b"), j * 32 + 1, 32),
                1,
            ).otherwise(0),
        ).cast("double")
        / n_hashes
    )
    dup_pairs = (
        cand.join(
            sig_pool.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_a")),
            "new_id",
        )
        .join(
            sig_pool.select(F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_b")),
            "old_id",
        )
        .withColumn("est_jaccard", match_frac)
        .filter(F.col("est_jaccard") >= threshold)
    )
    blockers = dup_pairs.select("new_id", "old_id").unionByName(replayed)
    verdicts = (
        state_new.select("doc_id")
        .distinct()
        .join(
            blockers.groupBy("new_id").agg(F.min("old_id").alias("dup_of")),
            state_new["doc_id"] == F.col("new_id"),
            "left",
        )
        .select("doc_id", "dup_of")
        .localCheckpoint(eager=True)
    )
    unique_ids = verdicts.filter(F.col("dup_of").isNull()).select("doc_id")
    appended = state_new.join(unique_ids, "doc_id")
    version = table.write(appended, mode="append", operation="incremental_dedup")
    n_new = new_docs.select("doc_id").distinct().count()
    n_dup = verdicts.filter(F.col("dup_of").isNotNull()).count()
    return {
        "verdicts": verdicts,
        "store_version": version,
        "n_docs": n_new,
        "n_duplicates": n_dup,
        "n_inserted": n_new - n_dup,
    }
