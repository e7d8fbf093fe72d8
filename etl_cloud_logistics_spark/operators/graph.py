"""PageRank over an edge list — iterative graph analytics beyond the
connected-components canonicalizer (operators/dedup.py): rank the
co-purchase graph's influential parts, the near-dup graph's hub documents,
the event-transition graph's sink states.

Same iterative discipline as ``neardup_components``:

- each round is ONE shuffle join (ranks ⋈ edges on src, contributions
  re-keyed to dst) plus one aggregation — no collect of graph data;
- lineage truncates every round (eager ``localCheckpoint``), keeping the
  plan one-iteration deep instead of nesting every prior round;
- convergence is measured distributed (L1 delta as a decimal-exact sum)
  and iteration stops at ``tol`` or ``max_iter``, whichever first.

Semantics (Page et al. 1999, power iteration on the Google matrix):
``rank = (1-d)/N + d · (Σ_in rank/out_deg + dangling_mass/N)`` — dangling
nodes (no out-edges) redistribute their mass uniformly, so total rank is
invariant at 1.0 every round (pytest-pinned to 1e-9; the per-round
dangling mass is one broadcast scalar).  Ranks are float: contribution
sums are order-dependent in the last bits, so the registry row is
rows-only and the differential test compares against driver-side numpy
power iteration at 1e-8, not bit-exact — stated rather than papered over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


PR_SCALE = 10**15  # fixed-point unit for pagerank_fixed (1.0 == 10^15)


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int | None = None,
) -> DataFrame:
    """Minimum hop count from ``seeds`` (a DataFrame with one ``node``
    column) to every reachable node, by frontier-deduplicated BFS.

    Why not a recursive CTE: a ``UNION ALL`` recursive step enumerates
    every *walk*, not the frontier — walk count grows ~avg_degree^depth
    (the r5 driver row shuffled 628 MB for a ≤|V|-row answer).  Per-level
    dedup bounds every round at |frontier ∪ visited| rows instead: each
    level is one equi-join frontier⋈edges (the frontier is broadcast-sized
    in practice), a ``distinct``, and an anti-join against the visited set
    — the textbook level-synchronous BFS (Pregel's traversal shape) in
    DataFrame form.  Lineage truncates every level (eager
    ``localCheckpoint``), and iteration stops when the frontier empties or
    at ``max_hops``.

    Returns (node, hops) — first-visit level == minimum hop distance,
    because level h is explored only after all nodes at < h are visited."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        seeds.select("node")
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    h = 0
    while max_hops is None or h < max_hops:
        h += 1
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 12,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank in scaled-BIGINT fixed point: ranks are integers in units
    of ``1/scale`` and every operation is integer add/multiply/floor-div —
    no floating point anywhere, so the result is a pure function of the
    edge set, independent of partitioning, aggregation order, and engine.
    That buys what the float ``pagerank`` cannot have: a bit-exact SQL
    oracle (the registry row unrolls the same ``n_iter`` iterations as
    chained CTEs with the same ``//`` arithmetic in DuckDB).

    Per iteration (same Google-matrix semantics as ``pagerank``):
    ``r' = base + (d_pct * (Σ_in r//out_deg + dang//n)) // 100`` with
    ``base = (100-d_pct)*scale // (100*n)``.  Floor division loses at most
    1 unit (1e-15) per term per round — far below any ranking-relevant
    difference (differential-tested against float power iteration) — and
    loses it IDENTICALLY in every engine, which is the point.

    Scale shape is the float twin's: one shuffle join per round, dangling
    mass as a broadcast 1-row aggregate, eager localCheckpoint per round
    to truncate lineage.  Returns (node, rank_fp: long)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e2 = e.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    base = (100 - damping_pct) * scale // (100 * n)
    ranks = nodes.withColumn(
        "r", F.lit(scale // n).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "r", "od")
        dang = with_deg.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
        )
        contribs = (
            with_deg.filter(F.col("od").isNotNull())
            .join(e2, F.col("node") == F.col("e_src"))
            .select(F.col("e_dst").alias("node"), F.expr("r div od").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"{base}L + ({damping_pct} * (coalesce(inflow, 0L)"
                    f" + dm div {n})) div 100"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 30,
    tol: float = 1e-8,
) -> DataFrame:
    """Returns (node, rank) for every node appearing in ``edges``.
    Duplicate edges are collapsed (simple graph).  ``tol`` is the total L1
    rank movement under which iteration stops."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e2 = e.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    probe_every = 4  # convergence probes are extra jobs; amortize them
    for i in range(max_iter):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "out_deg")
        # dangling mass stays IN the plan as a broadcast 1-row aggregate
        # (the zscore-stats pattern) — no per-round driver collect
        dang = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(e2, F.col("node") == F.col("e_src"))
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if (i + 1) % probe_every == 0 or i == max_iter - 1:
            delta = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("old")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                .first()["d"]
            )
            if delta is not None and delta < tol:
                ranks = new_ranks
                break
        ranks = new_ranks
    return ranks
