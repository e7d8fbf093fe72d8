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
