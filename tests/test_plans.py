"""Plan-shape regression tests: pin the scale-critical physical-plan
properties (pushdown, broadcast, no cartesian blowups) so a refactor that
silently degrades a plan fails CI, not the cluster.  Complements the
manual `tools/explain_audit.py` sweep."""

from __future__ import annotations

import pytest

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all

_load_all()


def plan_of(spark, sf_small, name: str) -> str:
    # plan metadata truncates at spark.sql.maxMetadataStringLength (default
    # 100 chars), which silently cuts long PushedFilters lists mid-entry and
    # turns substring asserts into false negatives (the explain_audit tool
    # hit exactly this, r9) — render plans untruncated for every pin here
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    return REGISTRY[name].fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()


def test_q04_broadcasts_dims_and_pushes_date_filter(spark, sf_small):
    plan = plan_of(spark, sf_small, "q04_volume_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_secure_view_filter_reaches_scan(spark, sf_small):
    plan = plan_of(spark, sf_small, "secure_view_customers")
    assert "PushedFilters: [IsNotNull(c_mktsegment), Not(EqualTo(c_mktsegment,BUILDING))" in plan


def test_report_totals_joins_broadcast(spark, sf_small):
    plan = plan_of(spark, sf_small, "report_customer_totals")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "knn_ivf_bucketed",
        "neardup_minhash_lsh",
        "simhash_near_pairs",
        "neardup_embedding_cosine",
        "string_similarity_pairs",
    ],
)
def test_candidate_joins_never_cartesian(spark, sf_small, name):
    """Every similarity/dedup operator must generate candidates via an
    equi-join on shared evidence — a CartesianProduct in the plan means the
    bucketing broke."""
    plan = plan_of(spark, sf_small, name)
    assert "CartesianProduct" not in plan


def test_star_join_broadcasts_only_true_dims(spark, sf_small):
    """star_join_operations must NOT carry a broadcast hint on orders (it is
    fact-sized — a forced broadcast OOMs at 100 TB).  With auto-broadcast
    disabled, only explicitly hinted joins broadcast: the five true dims
    must, the lineitem⋈orders edge must become a shuffle join (at real SF
    with auto-broadcast on, AQE makes this size-based call at runtime)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, sf_small, "star_join_operations")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("BroadcastHashJoin") == 5
    orders_edge = [
        ln for ln in plan.splitlines() if "Join" in ln and "l_orderkey" in ln
    ]
    assert orders_edge and all("Broadcast" not in ln for ln in orders_edge), orders_edge


def test_q10b_window_is_hash_partitioned_not_global(spark, sf_small):
    """The scale-safe ranking variant must never coalesce to one partition:
    its window exchange hashes on the partition key.  (q10/q11 keep the
    reference's global-ORDER-BY semantics over bounded post-agg sets; q10b
    is the shape for unbounded inputs — see queries/core.py.)"""
    plan = plan_of(spark, sf_small, "q10b_rank_within_nation")
    assert "SinglePartition" not in plan
    assert "hashpartitioning(nacion" in plan


def test_column_pruning_reaches_scan(spark, sf_small):
    """q01 projects one column; the parquet ReadSchema must not include the
    rest of the customer table."""
    plan = plan_of(spark, sf_small, "q01_fleet_composition")
    assert "ReadSchema: struct<c_mktsegment:string>" in plan


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join splitting is the engine's first line of defense for
    fact-side hot keys (operators/skew.py docstring delegates the SMJ case
    to it); prove the configured session actually splits: a 95%-hot-key
    join under test-scale skew thresholds must mark the sort-merge join
    skew=true in the final adaptive plan, and results must be exact."""
    from pyspark.sql import functions as F

    big = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50_000).select(
        (F.col("id") % 1000).alias("k"), F.lit(1).alias("tag")
    )
    confs = {
        # force the SMJ path and make the hot partition count as skewed at
        # test scale; restore after — other tests rely on session defaults
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # execute the join's OWN QueryExecution (an action like count()
        # builds a twin execution whose adaptive plan we would not see, and
        # an operator above the join that requires a distribution makes AQE
        # skip the split unless forceOptimizeSkewedJoin is on)
        joined = big.join(small, "k")
        n = joined._jdf.queryExecution().executedPlan().execute().count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        # exactness: hot key 7 matches 50 small rows; every 20th id keeps
        # its own k and matches iff k < 1000 (each matching 50 small rows)
        hot = 200_000 - 200_000 // 20
        cold_matching = len(range(0, 1000, 20))
        assert n == hot * 50 + cold_matching * 50
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_no_registry_query_plans_a_cartesian_product(spark, sf_small):
    """Blanket net over the WHOLE registry (driver surface + extras):
    no query may plan a CartesianProduct, so a new query with a broken
    candidate join fails CI immediately.  Mostly planning-only, but NOT
    side-effect-free: building the eager iterative queries
    (neardup_components_canonical, curation_pipeline_end2end) EXECUTES
    their connected-components rounds (eager checkpoints + per-round count
    actions) during plan construction — this test costs real compute.
    (crossJoin against a broadcast side plans as BroadcastNestedLoopJoin,
    which is the intended shape for tiny broadcast sides and stays
    allowed; an unhinted cartesian blowup plans as CartesianProduct.)"""
    offenders = []
    for name in REGISTRY:
        try:
            plan = plan_of(spark, sf_small, name)
        except Exception as e:  # a query that cannot even plan is its own failure
            offenders.append((name, f"planning failed: {e}"))
            continue
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct in plan"))
    assert not offenders, offenders


@pytest.mark.parametrize(
    "name,max_splits",
    [
        ("doc_quality_battery", 2),
        ("dsir_importance_weights", 6),
        ("token_budget_select", 2),
    ],
)
def test_hof_consumers_stage_tokenization_once(spark, sf_small, name, max_splits):
    """Guard against the O(n_words²) HOF-lambda pathology: higher-order
    lambdas are interpreted (no codegen, no common-subexpression
    elimination), so an inline split()[i] captured by a transform lambda
    re-splits the document per array element, and a multi-referenced inline
    expression tree re-evaluates per reference (doc_quality_battery's
    executed plan once carried 19 copies of split — 26 s for 1.5 MB of
    text).  Tokenization must be staged as a column; the plan may then
    carry at most one split per scan branch."""
    plan = plan_of(spark, sf_small, name)
    n = plan.count("split(")
    assert n <= max_splits, f"{name}: {n} split() copies in executed plan"


def test_span_fraction_shuffles_spans_once(spark, sf_small):
    """duplicated_span_fraction must keep the single span-keyed exchange
    layout: one aggregation carries the 8-gram strings, everything after
    moves ints.  A join-back or pre-shuffle distinct reappearing shows up
    as extra exchanges (the old layout shuffled the spans 3x, 126 MB vs
    40 MB at sf0.1)."""
    plan = plan_of(spark, sf_small, "duplicated_span_fraction")
    assert plan.count("Exchange") <= 2, plan[:1500]
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_small):
    """At cluster scale a selective dim filter should reach the fact side
    BEFORE the shuffle via Spark's runtime bloom filter (InjectRuntimeFilter):
    the filtered creation side builds a bloom_filter_agg and the fact scan
    gains a BloomFilterMightContain predicate, cutting shuffled fact rows to
    near the join's output size.  The production thresholds (10 MB creation
    side / 10 GB application side) make this a no-op at test SF, so pin the
    MECHANICS under test-scale thresholds and restore the defaults after."""
    from pyspark.sql import functions as F

    from etl_cloud_logistics_spark.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        part = load_table(spark, sf_small, "part").filter(F.col("p_size") == 1)
        li = load_table(spark, sf_small, "lineitem")
        joined = li.join(part, li.l_partkey == part.p_partkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan, (
            "runtime bloom filter was not injected:\n" + plan[:2000]
        )
        n_filtered = joined.count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # exactness: the bloom filter is a pre-filter, never a semantics change
    part = load_table(spark, sf_small, "part").filter(F.col("p_size") == 1)
    li = load_table(spark, sf_small, "lineitem")
    assert n_filtered == li.join(part, li.l_partkey == part.p_partkey).count()


def test_shared_shingle_pair_plans_stay_collapsed(spark, sf_small):
    """The shared-shingle pair queries must keep the r7 checkpointed
    layout: the tokenize→posexplode→distinct subtree is staged behind
    localCheckpoint, so every consumer reads RDD-scan leaves and the plan
    carries a handful of exchanges.  Before the fix the persisted
    formulation re-displayed (and the cap join re-derived) that subtree
    per consumer — 27 exchanges vs 3 for these two rows in
    EXPLAIN_AUDIT_r06 vs _r07."""
    for name in ("neardup_jaccard_pairs", "containment_excerpt_pairs"):
        plan = plan_of(spark, sf_small, name)
        n_exch = plan.count("Exchange")
        assert n_exch <= 8, f"{name}: {n_exch} exchanges\n{plan[:1500]}"


def test_tpch_q4_semi_join_carries_nonequi_residual(spark, sf_small):
    """Q4's correlated EXISTS must decorrelate to a LEFT SEMI whose join
    carries the non-equi lateness comparison (a post-join filter on a
    plain inner join would need a DISTINCT repair and double-count risk)."""
    plan = plan_of(spark, sf_small, "tpch_q4_order_priority")
    semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi_lines, plan
    assert any("l_shipdate" in ln for ln in semi_lines), semi_lines


def test_tpch_q21_double_correlation_is_semi_then_anti(spark, sf_small):
    """Q21's EXISTS + NOT EXISTS on the same relation must become one LEFT
    SEMI and one LEFT ANTI against the pruned lineitem projection — never a
    count-based self-join."""
    plan = plan_of(spark, sf_small, "tpch_q21_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_tpch_q13_filter_stays_inside_left_join(spark, sf_small):
    """Q13's priority exclusion lives in the LEFT JOIN condition; it must
    reach the orders scan as a pushed filter while the join stays outer
    (a WHERE-style rewrite would silently delete zero-order customers)."""
    plan = plan_of(spark, sf_small, "tpch_q13_customer_distribution")
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_tpch_q19_supersets_reach_both_scans(spark, sf_small):
    """Q19's cross-side disjunction can't push whole; the per-side implied
    supersets must reach BOTH parquet scans."""
    plan = plan_of(spark, sf_small, "tpch_q19_discounted_revenue")
    assert "In(p_brand, [Brand#1,Brand#2,Brand#3])" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


def test_tpch_q8_snowflake_broadcasts_every_dim_leg(spark, sf_small):
    """Q8 (8-table snowflake): every non-fact leg must broadcast; at most
    the lineitem-orders edge may shuffle."""
    import re as _re

    plan = plan_of(spark, sf_small, "tpch_q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert len(_re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)) <= 1, plan
