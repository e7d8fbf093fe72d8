"""Classic TPC-H-style queries over the driver testdata (which is
TPC-H-shaped: TESTDATA.md).  These are NOT in the reference's query set —
they are the industry-standard relational shapes a user migrating an
analytics workload expects an engine to run well, registered as
locally-verified extras so the engine's breadth is demonstrated without
displacing reference-surface driver rows:

- Q1 pricing summary: the canonical wide-aggregate scan (map-side combine
  collapses everything; output is 4 rows);
- Q3 shipping priority: selective fact⋈fact join + top-k (adapted: order
  priority stands in for the missing o_shippriority column);
- Q5 local supplier volume: the 6-table snowflake join where customer and
  supplier must share a nation — dims broadcast, one fact shuffle.

Decimal-exact sums (functions.sum_exact) keep every float aggregate
order-independent so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions import sum_exact
from . import register


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    extra=True,  # engine-breadth demo; the wide-agg family's driver rows are
    # q01/q03-q09
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): one filtered scan, grouped wide
    aggregate over 2 enum keys.  100 TB shape: map-side partial aggregation
    collapses the scan to |executors|×4 partial rows before the single tiny
    shuffle — the benchmark's test of raw aggregate throughput."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_exact("l_quantity").alias("sum_qty"),
            sum_exact("l_extendedprice").alias("sum_base_price"),
            sum_exact(disc_price).alias("sum_disc_price"),
            sum_exact(charge).alias("sum_charge"),
            F.round(sum_exact("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.round(sum_exact("l_discount") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    extra=True,  # adapted: o_orderpriority stands in for o_shippriority
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered customers broadcast
    onto date-filtered orders, joined to shipdate-filtered lineitem, top-10
    orders by revenue.  Both date predicates push to the parquet scans; the
    only real shuffle is the per-order aggregation, and the top-k carries
    the unique l_orderkey tiebreaker so the LIMIT cut is deterministic."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_exact(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    extra=True,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-table snowflake join with the
    correlated customer-nation = supplier-nation constraint.  All four true
    dimensions broadcast (customer/supplier/nation/region); the only wide
    shuffle is lineitem⋈orders on the order key, then a 5-row aggregate —
    the shape that proves a snowflake schema never needs more than one
    fact-sized exchange."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(sum_exact(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    extra=True,  # locally verified; r10 promotion candidate (correlated
    # EXISTS with a non-equi residual — no driver row has this shape yet)
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking, adapted): orders from one year
    with at least one lineitem shipped more than a year after the order
    date, counted per priority.  The testdata has no
    commit/receipt-date pair, so Q4's "receipt after commit" lateness
    becomes "shipped > 365 days after order date" — which keeps the
    interesting part: a correlated EXISTS whose predicate mixes an equi
    key (order key) with a NON-EQUI residual comparing columns from BOTH
    sides (l_shipdate vs o_orderdate).

    Spark-first: LEFT SEMI join — the equi half hashes, the residual
    rides along as the join filter, and lineitem is pruned to two columns
    before its exchange.  Semi join preserves orders' row multiplicity by
    construction, so no DISTINCT repair is needed (the trap in the
    naive inner-join rewrite).  At 100 TB: one fact⋈fact hash on the
    order key, then a 5-row aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 365 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    extra=True,  # locally verified; r10 promotion candidate (agg-view +
    # uncorrelated scalar-MAX filter — the Q15 "CREATE VIEW" shape)
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue per supplier over one quarter,
    keep the supplier(s) hitting the maximum — the classic aggregate-view
    + scalar-subquery-on-the-same-view shape.

    Spark-first: the view is one shipdate-pruned scan aggregated by
    supplier; the scalar MAX then comes from a window over that ALREADY
    AGGREGATED frame (|suppliers|-bounded, same post-aggregation
    global-window pattern as q10) rather than re-running the view for a
    1-row aggregate — one lineitem scan total, where the q22-style
    broadcast-the-scalar form would scan the fact twice (exchange reuse
    across the two consumers is not guaranteed).  Ties all survive, per
    the TPC-H spec.

    Determinism: revenue is the decimal-exact sum emitted as double, so
    the MAX-equality filter compares bit-identical values in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.withColumn(
        "max_revenue", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(q.total_qty AS DOUBLE) AS total_qty
    FROM (SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(38,6))) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300) q
    JOIN orders o   ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
    extra=True,  # locally verified; r10 promotion candidate (IN-subquery
    # HAVING filter, the Q18 large-order shape)
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customer): orders whose total lineitem
    quantity exceeds a threshold, with their customers — canonically an
    ``o_orderkey IN (SELECT ... HAVING SUM > 300)`` plus a SECOND
    aggregation of the same lineitems for the output column.

    Spark-first: aggregate lineitem per order ONCE and reuse the same
    frame as both the filter (HAVING) and the output value — the IN
    subquery collapses into an inner join against the qualifying agg,
    deleting Q18's second fact aggregation outright (the oracle spells
    the same single-agg form).  The qualifying set (46 orders at sf0.01)
    rides a broadcast into orders; customer joins broadcast as a dim.
    At 100 TB the only fact-sized exchange is the per-order aggregation.

    Determinism: the quantity sum is decimal-exact (threshold compare in
    decimal, emission as double); the LIMIT carries the unique
    o_orderkey tiebreaker."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
        .select(
            "l_orderkey", F.col("qty_dec").cast("double").alias("total_qty")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(qualifying), orders.o_orderkey == qualifying.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 180 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 180 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    extra=True,  # locally verified; r10 promotion candidate (EXISTS +
    # NOT EXISTS double-correlation on the same relation, the Q21 shape)
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted): in
    finished multi-supplier orders, find lineitems shipped > 180 days
    after the order date where EVERY OTHER supplier in the order shipped
    on time — i.e. this supplier alone held the order up.  Lateness is
    adapted to shipdate-vs-orderdate (no commit/receipt dates in the
    testdata); the double correlation on the same relation — EXISTS
    (another supplier) AND NOT EXISTS (another LATE supplier) — is the
    hardest decorrelation shape in the TPC-H suite and survives intact.

    Spark-first: both subqueries become joins against the SAME pruned
    lineitem projection, hashed on the order key that the l1⋈orders join
    already established — a LEFT SEMI for the EXISTS, then a LEFT ANTI
    whose condition carries the two non-equi residuals (supplier <>,
    lateness vs l1's own order date).  Three order-key exchanges of the
    same pruned fact, no window, no DISTINCT repair; supplier broadcasts
    at the end, and the count aggregates per supplier name.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waited = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3)
            & (F.col("l_suppkey") != l3.s3)
            & (l3.ship3 > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(F.broadcast(supp), waited.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*)) AS qty_threshold
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < pq.qty_threshold
    """,
    # r9 window rotation: promoted INTO the driver window (zero prior
    # driver history; correlated-scalar-subquery shape external check)
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the classic CORRELATED
    SCALAR SUBQUERY shape — each lineitem compares against an aggregate of
    its own part's lineitems.  Spark-first decorrelation, one step past
    Catalyst's aggregate-then-rejoin rewrite (which the oracle spells out):
    p_partkey→p_brand is functional, so a part's lineitems are all
    brand-filtered or none are — the brand broadcast-semi-filter can run
    FIRST, and the per-part 20%-of-average threshold then comes from a
    window over the already-filtered fact subset.  One broadcast join +
    ONE hash-partitioned window shuffle on the ~1/25th-sized subset,
    versus the rejoin form's full-fact aggregation plus a second
    fact-sized join (and versus the naive engine's O(n·n_part) rescan).

    Determinism: the threshold's AVG runs as a decimal-exact SUM divided by
    COUNT (order-independent; a double SUM would drift by addend order),
    and the final division by 7.0 is a single IEEE op on a decimal-exact
    numerator.  ``n_lines`` pins the surviving-row set so the oracle
    differential cannot pass on a compensating-value accident."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    w = W.partitionBy("l_partkey")
    threshold = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("qty_threshold", threshold)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(sum_exact("l_extendedprice") / F.lit(7.0), 6).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q22_dormant_high_balance",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)))
                    FILTER (WHERE c_acctbal > 0.0) AS DOUBLE)
               / COUNT(*) FILTER (WHERE c_acctbal > 0.0) AS a
        FROM customer
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    # r9 window rotation: promoted INTO the driver window (zero prior
    # driver history; global-agg predicate + NOT EXISTS external check)
)
def tpch_q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global-relations check, adapted): customers whose balance
    exceeds the average POSITIVE balance and who placed no order since the
    cutoff ("dormant" — every synthetic customer has SOME order, so Q22's
    literal never-ordered predicate is vacuous here), counted per nation —
    the migrating workload's two remaining subquery shapes in one query: an
    uncorrelated scalar aggregate used as a filter constant, and a
    correlated NOT EXISTS.

    Spark-first: the scalar average is a 1-row aggregate CROSS-broadcast
    onto the customer scan (never a driver collect); NOT EXISTS is a
    LEFT ANTI join against just the order keys (column-pruned before its
    exchange).  Both sides of the anti join hash on the customer key — at
    100 TB this is one fact-sized shuffle and nothing else.

    Determinism: the average is a decimal-exact filtered SUM over a
    filtered COUNT (single IEEE division); totacctbal is decimal-exact."""
    cust = load_table(spark, sf_dir, "customer")
    pos = F.when(F.col("c_acctbal") > 0.0, F.col("c_acctbal"))
    avg_bal = cust.agg(
        (sum_exact(pos) / F.count(pos)).alias("a")
    )
    orders_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders_keys, cust.c_custkey == orders_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            sum_exact("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
