"""Plan-shape regression tests: pin the scale-critical physical-plan
properties (pushdown, broadcast, no cartesian blowups) so a refactor that
silently degrades a plan fails CI, not the cluster.  Complements the
manual `tools/explain_audit.py` sweep."""

from __future__ import annotations

import pytest

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all

_load_all()


def plan_of(spark, sf_small, name: str) -> str:
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
