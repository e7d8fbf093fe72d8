"""End-to-end daily-ETL pipeline tests (SURVEY.md §3.2): two incremental
runs, SCD2 invariants, idempotent re-run, audit trail."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_cloud_logistics_spark.catalog import load_table
from etl_cloud_logistics_spark.pipelines import run_daily_etl


def _two_busy_days(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    days = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .count()
        .orderBy(F.desc("count"), "d")
        .limit(2)
        .collect()
    )
    return sorted(r["d"].isoformat() for r in days)


def test_daily_etl_two_runs(spark, sf_small, tmp_path):
    wh = str(tmp_path / "wh")
    day1, day2 = _two_busy_days(spark, sf_small)

    a1 = run_daily_etl(spark, sf_small, wh, day1)
    assert a1.status == "success"
    assert a1.records["staging"] > 0
    assert a1.records["fact_orders"] > 0

    a2 = run_daily_etl(spark, sf_small, wh, day2)
    assert a2.status == "success"

    # dim_date accumulated both days, no duplicates
    dim_date = spark.read.parquet(os.path.join(wh, "dim_date"))
    assert dim_date.count() == 2
    assert dim_date.select("date_key").distinct().count() == 2

    # SCD2 invariant on BOTH tracked dimensions (ref dual SCD2, 04:53-85):
    # exactly one current row per key, no overlaps
    for dim_name, key in (("dim_customer", "c_custkey"), ("dim_supplier", "s_suppkey")):
        dim = spark.read.parquet(os.path.join(wh, dim_name))
        per_key = dim.groupBy(key).agg(
            F.sum(F.col("is_current").cast("int")).alias("n_current")
        )
        assert per_key.filter(F.col("n_current") != 1).count() == 0, dim_name
    assert a2.records["dim_supplier"] > 0

    # the PAIR of report tables exists (ref dual reports)
    status_report = spark.read.parquet(os.path.join(wh, "report_status_totals"))
    assert status_report.count() > 0
    assert "o_orderstatus" in status_report.columns

    # fact is date-partitioned; both days present
    fact = spark.read.parquet(os.path.join(wh, "fact_orders"))
    assert {r["ingest_date"].isoformat() for r in fact.select("ingest_date").distinct().collect()} == {
        day1,
        day2,
    }
    # every fact row resolved a customer-dim version and carries QA columns
    assert fact.filter(F.col("customer_version_from").isNull()).count() == 0
    assert "qa_passed" in fact.columns and "is_outlier" in fact.columns

    # audit log has one row per run
    logs = [
        json.loads(line)
        for f in os.listdir(os.path.join(wh, "load_logs"))
        if f.endswith(".json") or f.startswith("part-")
        for line in open(os.path.join(wh, "load_logs", f))
        if line.strip()
    ]
    assert len([r for r in logs if r["status"] == "success"]) == 2


def test_daily_etl_rerun_is_idempotent(spark, sf_small, tmp_path):
    wh = str(tmp_path / "wh2")
    day1, _ = _two_busy_days(spark, sf_small)

    run_daily_etl(spark, sf_small, wh, day1)
    fact1 = spark.read.parquet(os.path.join(wh, "fact_orders"))
    n1 = fact1.count()
    keys1 = {r["o_orderkey"] for r in fact1.select("o_orderkey").collect()}

    run_daily_etl(spark, sf_small, wh, day1)  # same day again
    fact2 = spark.read.parquet(os.path.join(wh, "fact_orders"))
    assert fact2.count() == n1  # dynamic overwrite, no append-duplication
    assert {r["o_orderkey"] for r in fact2.select("o_orderkey").collect()} == keys1

    # SCD2 stays single-current after the no-change rerun
    dim_cust = spark.read.parquet(os.path.join(wh, "dim_customer"))
    per_key = dim_cust.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current")
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0
    # and no phantom closed versions were created
    assert dim_cust.filter(~F.col("is_current")).count() == 0


def test_scd2_attribute_change_creates_version(spark, sf_small, tmp_path):
    """Simulate an attribute change between runs by staging a mutated
    customer row through the SCD2 path directly."""
    import etl_cloud_logistics_spark.pipelines as P

    wh = str(tmp_path / "wh3")
    day1, day2 = _two_busy_days(spark, sf_small)
    run_daily_etl(spark, sf_small, wh, day1)

    dim_path = os.path.join(wh, "dim_customer")
    dim = spark.read.parquet(dim_path)
    victim = dim.orderBy("c_custkey").first()

    from etl_cloud_logistics_spark.operators.scd2 import scd2_apply

    staged = (
        dim.filter(F.col("c_custkey") == victim["c_custkey"])
        .select(*P.DIM_CUSTOMER_KEYS, *P.DIM_CUSTOMER_TRACKED)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
    )
    merged = scd2_apply(
        dim, staged, P.DIM_CUSTOMER_KEYS, P.DIM_CUSTOMER_TRACKED, effective_date=day2
    )
    rows = merged.filter(F.col("c_custkey") == victim["c_custkey"]).collect()
    assert len(rows) == 2
    closed = [r for r in rows if not r["is_current"]][0]
    opened = [r for r in rows if r["is_current"]][0]
    assert closed["valid_to"] == opened["valid_from"]
    assert opened["c_acctbal"] == victim["c_acctbal"] + 1000.0


def test_incremental_report_equals_full_rebuild(spark, sf_small, tmp_path):
    """The day-grain incremental report rollup must equal an aggregate
    computed directly over the whole fact, and re-running a day must not
    double-count."""
    from etl_cloud_logistics_spark.functions import sum_exact

    wh = str(tmp_path / "whr")
    day1, day2 = _two_busy_days(spark, sf_small)
    run_daily_etl(spark, sf_small, wh, day1)
    run_daily_etl(spark, sf_small, wh, day2)
    run_daily_etl(spark, sf_small, wh, day2)  # rerun: dynamic overwrite, no dup

    fact = spark.read.parquet(os.path.join(wh, "fact_orders"))
    expect = {
        r["c_mktsegment"]: (r["n"], r["rev"])
        for r in fact.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(sum_exact("net_revenue"), 2).alias("rev"),
        )
        .collect()
    }
    report = spark.read.parquet(os.path.join(wh, "report_segment_totals"))
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["total_revenue"]) for r in report.collect()
    }
    assert got == expect


def test_pipeline_writes_dq_report(spark, sf_small, tmp_path):
    wh = str(tmp_path / "whdq")
    day1, _ = _two_busy_days(spark, sf_small)
    audit = run_daily_etl(spark, sf_small, wh, day1)
    assert audit.records["dq_failed"] == 0  # clean testdata passes the gate
    dq = spark.read.parquet(os.path.join(wh, "dq_reports"))
    assert {r["expectation"] for r in dq.collect()} == {
        "n_items_positive",
        "c_mktsegment_not_null",
        "date_key_not_null",
        "o_orderkey_unique",
    }
    assert dq.filter(~F.col("passed")).count() == 0


def test_run_curation_export_end_to_end(spark, sf_small, tmp_path):
    """The training-export composition: curated train docs land in
    deterministic shards with payload, the packing assignment covers
    exactly the train split, and the manifest reconciles with both."""
    import os

    from pyspark.sql import functions as F

    from etl_cloud_logistics_spark.pipelines import run_curation_export
    from etl_cloud_logistics_spark.queries.curation_ops import (
        curation_pipeline_end2end,
    )

    out = str(tmp_path / "export")
    info = run_curation_export(spark, sf_small, out, n_shards=4, pack_budget=256)

    curated = curation_pipeline_end2end(spark, sf_small).collect()
    train_ids = {r["doc_id"] for r in curated if r["split"] == "train"}
    assert info["n_docs"] == len(curated)

    shards = spark.read.parquet(os.path.join(out, "shards"))
    assert {r["doc_id"] for r in shards.collect()} == train_ids
    assert shards.filter(F.col("text").isNull()).count() == 0
    # one parquet file per written shard directory (loader resume contract)
    base = os.path.join(out, "shards", "split=train")
    for d in os.listdir(base):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(base, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)

    packing = spark.read.parquet(os.path.join(out, "packing"))
    assert {r["doc_id"] for r in packing.collect()} == train_ids
    # capacity invariant on non-oversize bins
    over = (
        packing.filter(~F.col("oversize"))
        .groupBy("bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 256)
        .count()
    )
    assert over == 0

    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    m_train = manifest.filter(F.col("split") == "train").agg(F.sum("n_docs")).first()[0]
    assert m_train == len(train_ids)


def test_index_build_pipeline_end_to_end(spark, sf_med, tmp_path):
    """The ANN deployment flow: train + build + persist to a versioned
    table + serve FROM STORAGE + recall report.  Reconciles: the stored
    index is complete and float-free, the model is persisted, serving from
    the stored version works, and the reported recall matches the measured
    IVF floor (nprobe=2 -> >= 0.7 on this corpus, figures in COVERAGE.md);
    a rebuild commits a NEW version, leaving the served one readable."""
    import json as _json

    from etl_cloud_logistics_spark.pipelines import run_index_build
    from etl_cloud_logistics_spark.sources.snapshots import SnapshotTable

    out = str(tmp_path / "annout")
    report = run_index_build(spark, sf_med, out, n_clusters=8, nprobe=2, k=3)
    assert report["index_rows"] == 500
    assert 0.7 <= report["recall_at_k"] <= 1.0
    t = SnapshotTable(f"{out}/ann_index")
    idx = t.read(spark, report["index_version"])
    assert set(idx.columns) == {"neighbor_id", "bucket", "codes", "approx_norm"}
    assert "embedding" not in idx.columns  # float-free scored index
    model = _json.load(open(report["model_path"]))
    assert len(model["centroids"]) == 8 and len(model["lo"]) == 64
    # rebuild: new version, old one still readable (time travel)
    report2 = run_index_build(spark, sf_med, out, n_clusters=8, nprobe=2, k=3)
    assert report2["index_version"] == report["index_version"] + 1
    assert t.read(spark, report["index_version"]).count() == 500


def test_incremental_dedup_against_signature_store(spark, tmp_path):
    """Ingestion-time dedup: batch 2 checks against batch 1's PERSISTED
    signatures (no history recompute), catches stored near-dups, in-batch
    dups, and replayed ids; only unique docs grow the store; a full batch
    replay with fresh ids marks everything duplicate."""
    from etl_cloud_logistics_spark.pipelines import run_incremental_dedup
    from etl_cloud_logistics_spark.sources.snapshots import SnapshotTable

    store = str(tmp_path / "sigstore")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different text about spark streaming engines at scale"),
            (3, "a third unrelated document mentioning warehouses and parquet files"),
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_dedup(spark, b1, store)
    assert r1["n_duplicates"] == 0 and r1["n_inserted"] == 3

    b2 = spark.createDataFrame(
        [
            (10, base),  # exact dup of stored doc 1
            (11, base.replace("today", "tonight")),  # near-dup of stored doc 1
            (12, "an entirely fresh document on watermarks and state stores"),
            (13, "twin sentences inside one batch share almost every word here"),
            (14, "twin sentences inside one batch share almost every word too"),
            (2, "completely different text about spark streaming engines at scale"),
        ],
        "doc_id long, text string",
    )
    r2 = run_incremental_dedup(spark, b2, store)
    v = {r.doc_id: r.dup_of for r in r2["verdicts"].collect()}
    assert v[10] == 1 and v[11] == 1          # caught against the STORE
    assert v[12] is None and v[13] is None    # fresh + in-batch canonical
    assert v[14] == 13                        # in-batch near-dup
    assert v[2] == 2                          # replayed id is idempotent
    assert r2["n_inserted"] == 2              # only 12 and 13 join the store
    t = SnapshotTable(store)
    stored_ids = {
        r.doc_id for r in t.read(spark).select("doc_id").distinct().collect()
    }
    assert stored_ids == {1, 2, 3, 12, 13}
    # replaying batch 2 under NEW ids: everything is now a duplicate
    b2_replay = b2.withColumn("doc_id", F.col("doc_id") + 100)
    r3 = run_incremental_dedup(spark, b2_replay, store)
    assert r3["n_duplicates"] == r3["n_docs"]


def test_incremental_dedup_rejects_scheme_change(spark, tmp_path):
    """Signatures are only comparable under identical derivation (shingle
    n, hash count, banding, fallback): a store written under one scheme
    must refuse a run under another instead of silently missing cross-era
    duplicates (r5 advice).  The scheme stamp travels in the state rows."""
    import pytest as _pytest

    from etl_cloud_logistics_spark.pipelines import run_incremental_dedup
    from etl_cloud_logistics_spark.sources.snapshots import SnapshotTable

    store = str(tmp_path / "sigstore_scheme")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today")],
        "doc_id long, text string",
    )
    run_incremental_dedup(spark, b1, store)
    stored = SnapshotTable(store).read(spark)
    assert set(stored.select("scheme").distinct().toPandas()["scheme"]) == {
        "mh1:n3:h8:rpb2:sdf1"
    }
    b2 = spark.createDataFrame(
        [(2, "another document arriving after a tokenizer upgrade happened")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="scheme"):
        run_incremental_dedup(spark, b2, store, n_hashes=16)
    # same parameters still ingest fine
    r = run_incremental_dedup(spark, b2, store)
    assert r["n_inserted"] == 1


def test_incremental_dedup_short_docs_not_collapsed(spark, tmp_path):
    """Docs shorter than the shingle width (< n tokens) must NOT all collide:
    without the full-text fallback their MinHash minima are all null, every
    short doc gets sig='' / band_key='' and est_jaccard('','')=1.0, so every
    distinct short doc after the first was silently dropped.  Identical short
    docs must still dedup, including against the persisted store."""
    from etl_cloud_logistics_spark.pipelines import run_incremental_dedup

    store = str(tmp_path / "sigstore_short")
    b1 = spark.createDataFrame(
        [(1, "hello"), (2, "goodbye world"), (3, "ok")],
        "doc_id long, text string",
    )
    r1 = run_incremental_dedup(spark, b1, store)
    v1 = {r.doc_id: r.dup_of for r in r1["verdicts"].collect()}
    assert v1 == {1: None, 2: None, 3: None}  # three DISTINCT short docs
    assert r1["n_inserted"] == 3

    b2 = spark.createDataFrame(
        [
            (10, "hello"),          # exact short dup of stored doc 1
            (11, "brand new"),      # fresh short doc
            (12, "same pair"),      # in-batch short twins...
            (13, "same pair"),
        ],
        "doc_id long, text string",
    )
    r2 = run_incremental_dedup(spark, b2, store)
    v2 = {r.doc_id: r.dup_of for r in r2["verdicts"].collect()}
    assert v2[10] == 1            # caught against the STORE by full-text hash
    assert v2[11] is None
    assert v2[12] is None and v2[13] == 12
    assert r2["n_inserted"] == 2


def test_index_append_encodes_with_pinned_model(spark, sf_med, tmp_path):
    """Incremental index maintenance: an append encodes ONLY the delta with
    the parent version's model (no retrain, no history re-encode), serving
    from the new version retrieves old AND new vectors, the old version
    still time-travels to exactly its own rows, and appending without an
    index fails loudly."""
    import json as _json

    import pytest as _pytest

    from etl_cloud_logistics_spark.catalog import load_table
    from etl_cloud_logistics_spark.operators.similarity import knn_sq8_serve
    from etl_cloud_logistics_spark.pipelines import run_index_append, run_index_build
    from etl_cloud_logistics_spark.sources.snapshots import SnapshotTable

    out = str(tmp_path / "annout")
    with _pytest.raises(FileNotFoundError):
        run_index_append(
            spark,
            load_table(spark, sf_med, "embeddings").limit(1),
            out,
        )

    base = run_index_build(spark, sf_med, out, n_clusters=8, nprobe=2, k=3)
    emb = load_table(spark, sf_med, "embeddings")
    # delta: 20 existing vectors re-badged with fresh ids (same distribution,
    # so SQ8 bounds hold exactly and retrievability is geometric fact)
    delta = emb.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    rep = run_index_append(spark, delta, out)
    assert rep["parent_version"] == base["index_version"]
    assert rep["index_version"] == base["index_version"] + 1
    assert rep["appended_rows"] == 20
    assert rep["index_rows"] == 520

    t = SnapshotTable(f"{out}/ann_index")
    # old version untouched (time travel) and old rows byte-identical in new
    assert t.read(spark, base["index_version"]).count() == 500
    old_rows = {
        r["neighbor_id"]: (r["bucket"], list(r["codes"]))
        for r in t.read(spark, base["index_version"]).collect()
    }
    new_rows = {
        r["neighbor_id"]: (r["bucket"], list(r["codes"]))
        for r in t.read(spark, rep["index_version"]).collect()
    }
    assert all(new_rows[i] == old_rows[i] for i in old_rows)
    # one model per version, appended model inherits the parent's params
    m0 = _json.load(open(base["model_path"]))
    m1 = _json.load(open(rep["model_path"]))
    assert m0 == m1 and rep["model_path"] != base["model_path"]

    # serving from the appended version: querying with original vec 3 must
    # surface its appended twin 100003 at cos 1.0 (the self-match filter
    # excludes 3 itself; the twin proves the delta rows are live in the
    # index and fetchable in the rerank)
    corpus = emb.unionByName(delta)
    queries = emb.filter(F.col("vec_id") == 3)
    served = knn_sq8_serve(
        t.read(spark, rep["index_version"]),
        queries,
        corpus,
        k=3,
        lo=m1["lo"],
        hi=m1["hi"],
        centroids=m1["centroids"],
        nprobe=2,
    )
    rows = {r["neighbor_id"]: r for r in served.collect()}
    assert 100003 in rows, sorted(rows)
    assert rows[100003]["cos_sim"] == 1.0 and rows[100003]["rank"] == 1
