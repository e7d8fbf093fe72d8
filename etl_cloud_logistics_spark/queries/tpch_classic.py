"""Classic TPC-H-style queries over the driver testdata (which is
TPC-H-shaped: TESTDATA.md).  These are NOT in the reference's query set —
they are the industry-standard relational shapes a user migrating an
analytics workload expects an engine to run well, registered as
locally-verified extras so the engine's breadth is demonstrated without
displacing reference-surface driver rows:

16 of the 22 spec queries run here (some adapted where the testdata lacks
a spec column — each docstring states its adaptation):

- Q1 pricing summary (wide aggregate), Q6 forecast revenue (pushdown
  probe), Q14 promo effect / Q19 discounted revenue (conditional +
  disjunctive single-join aggregates);
- Q3 shipping priority, Q10 returned items, Q18 large-volume customer
  (fact⋈fact join + top-k reports);
- Q5 local supplier volume, Q7 volume shipping, Q8 market share (the
  snowflake joins, up to 8 tables);
- Q4 order priority (correlated EXISTS), Q13 customer distribution
  (filter-in-left-join + re-aggregate), Q15 top supplier (agg view +
  scalar MAX), Q17 small-quantity revenue (correlated scalar subquery),
  Q21 waiting suppliers (EXISTS + NOT EXISTS double correlation),
  Q22 dormant high balance (NOT EXISTS + uncorrelated scalar AVG).

The remaining six are schema-infeasible in this testdata, not skipped for
difficulty: Q2/Q9/Q11/Q16/Q20 need the partsupp table (absent), Q12 needs
l_shipmode (absent); nothing in their plan shapes is missing from the
set above (semi/anti correlation: Q4/Q21/Q22; agg-view scalar: Q15/Q17;
snowflake: Q5/Q7/Q8).

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
    # r10: PROMOTED to the driver window (agg-view + uncorrelated
    # scalar-MAX filter — the Q15 "CREATE VIEW" shape; local-green since r9)
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
    # r11 rotation: promoted (VERDICT r10 #1 — the HAVING-IN decorrelation
    # shape's first driver exposure)
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
    # r10: PROMOTED to the driver window (EXISTS + NOT EXISTS double-
    # correlation on the same relation, the Q21 shape; local-green since r9)
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


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    extra=True,  # locally verified; rotation candidate (pure pushdown probe)
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): one scan, three range
    predicates, one ungrouped sum.  The benchmark's predicate-pushdown
    probe: every filter is a parquet-pushable range on a scan column, so
    at 100 TB the scan reads only row groups whose min/max statistics
    overlap [1996-01-01,1997) x [0.05,0.07] x [0,24) and only the four
    referenced columns — no shuffle at all (ungrouped partial sums merge
    in one 1-row reduce).  ``n_lines`` pins the surviving-row set so the
    oracle differential cannot pass on a compensating-value accident."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        sum_exact(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol_dec) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6)) AS vol_dec
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    extra=True,  # locally verified; rotation candidate (cross-dim
    # disjunction over a 2-fact join)
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year — lineitem x orders is the only fact-sized join; both
    nation hops and supplier/customer are broadcast dims.  The nation-pair
    disjunction references BOTH dimension legs, so it cannot collapse to a
    single-leg pushdown — but each leg's implied superset
    (n_name IN (N1, N2)) CAN be applied before the join, shrinking the
    supplier/customer legs ~2/25 before any fact row is touched.  The
    supersets are spelled explicitly rather than left to the optimizer
    (this Spark's constraint propagation does also derive them — both
    forms show in PushedFilters — but an explicit filter doesn't depend
    on `spark.sql.constraintPropagation.enabled` staying on); the full
    pair filter still runs post-join, so semantics are unchanged.  At
    100 TB: one orderkey hash exchange of the doubly-pre-filtered fact,
    then a 12-row aggregate."""
    pair = ("NATION_1", "NATION_2")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = nat.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .select("c_custkey", "cust_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN vol_dec
                         ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(vol_dec) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM (SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6)) AS vol_dec,
                 n1.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
          JOIN region r   ON r.r_regionkey = n2.n_regionkey
          WHERE r.r_name = 'ASIA'
            AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    # r11 rotation: promoted (VERDICT r10 #1 — the two-level
    # conditional-share aggregation's first driver exposure)
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of ECONOMY-part
    revenue sold into ASIA per order-year — the deepest snowflake in the
    suite (8 tables).  Spark-first: every non-fact leg (part filtered to
    one type, supplier+nation, customer+nation+region filtered to one
    region) broadcasts; lineitem x orders is the only exchange.  The share
    is a conditional aggregate over ONE pass — no self-join of
    numerator/denominator legs.  At 100 TB: two fact scans (pruned to 5
    and 3 columns), one orderkey hash join, 2-row output.

    Determinism: numerator and denominator are decimal-exact sums emitted
    as double; the share is then a single IEEE division of bit-identical
    operands, so no rounding repair is needed.  ``n_lines`` pins the
    surviving-row set."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nat = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nat.select(F.col("n_nationkey").alias("nk2"), "n_regionkey").join(
                    F.broadcast(region.select("r_regionkey")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("nk2"),
        )
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    zero_dec = F.lit(0).cast("decimal(38,6)")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_12", vol_dec).otherwise(
                        zero_dec
                    )
                ).cast("double")
                / F.sum(vol_dec).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    extra=True,  # locally verified; rotation candidate (the returned-item
    # top-k report; distinct from q10_customer_ranking's window shape)
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): revenue lost to returns per
    customer over one quarter, top 20.  Distinct from the reference's
    q10_customer_ranking (a rank window): this is the group-then-top-k
    report shape.  Spark-first: the quarter filter prunes orders BEFORE
    the fact join (pushed to the orders scan), the returnflag filter
    prunes lineitem at its scan, customer/nation broadcast, and the top-20
    is TakeOrderedAndProject — no global sort materializes.  At 100 TB:
    one orderkey hash exchange between two pre-pruned facts, one custkey
    aggregate, then a 20-row driver fetch.

    Determinism: revenue is decimal-exact; LIMIT ties break on the unique
    c_custkey."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    # r10: PROMOTED to the driver window (predicate INSIDE the left-join
    # condition + double re-aggregation — no other driver row has the
    # join-condition-filter shape; local-green since r9)
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): histogram of how
    many non-urgent orders each customer placed, INCLUDING zero-order
    customers.  The priority exclusion is adapted from Q13's o_comment
    NOT LIKE filter (the testdata has no comment column); the shape it
    exercises survives intact: the predicate must live in the LEFT JOIN
    CONDITION, not the WHERE clause — a WHERE would silently delete the
    zero-order customers that the outer join exists to keep (the classic
    outer-join-filter trap).

    Spark-first: COUNT(o_orderkey) over the left join counts only matched
    rows (nulls don't count), then the second aggregate histograms the
    counts.  At 100 TB: one custkey hash exchange (orders pre-filtered at
    the scan), one map-side-combining re-aggregate whose key space is
    ~100 distinct counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                           AS DECIMAL(38,6))
                                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    extra=True,  # locally verified; rotation candidate (conditional-share
    # ratio over a single broadcast join)
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts (testdata p_type is the bare family name, so
    the LIKE 'PROMO%' of spec TPC-H is equality here).  Spark-first: the
    month filter prunes the fact scan; part broadcasts pruned to 2
    columns; numerator and denominator are one conditional-aggregate pass
    — never two scans.  At 100 TB: zero non-broadcast shuffles (ungrouped
    aggregate merges partials in a 1-row reduce).

    Determinism: both sums decimal-exact; 100.0 * num / den is evaluated
    left-associatively in both engines on bit-identical operands."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    zero_dec = F.lit(0).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol_dec).otherwise(zero_dec)
                ).cast("double")
                / F.sum(vol_dec).cast("double")
            ).alias("promo_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    extra=True,  # locally verified; rotation candidate (cross-table
    # disjunctive predicate — the Q19 shape)
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted to the testdata's columns:
    brand/size/quantity triples stand in for the spec's
    brand/container/quantity + shipmode residuals).  The shape that
    matters survives: a DISJUNCTION whose every branch references BOTH
    join sides, so no branch can be pushed through the join whole.

    Spark-first: each side's IMPLIED superset is extracted by hand and
    applied before the join — part to (brand IN (1,2,3) AND size <= 15),
    lineitem to (quantity BETWEEN 1 AND 30).  This Spark's post-join
    filter pushdown does also derive per-side Or-supersets (both forms
    show in the PushedFilters), but the explicit filters keep the scan
    pruning independent of that optimizer behavior; the full triple
    filter still runs on the joined rows, so semantics are unchanged
    while the fact scan prunes ~40% of quantities and the broadcast
    shrinks ~7/8.  At 100 TB both predicates reach the parquet
    scans (min/max row-group pruning) and the join is a broadcast — zero
    shuffle before the 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )
