"""Iterative graph analytics over an edge list: PageRank (float and
bit-exact fixed-point), frontier BFS, and the O(log n)-round alternating
large-star/small-star connected components (the high-diameter complement
to operators/dedup.py's label-propagation canonicalizer) — rank the
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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .checkpointing import RoundCheckpointer

PR_SCALE = 10**15  # fixed-point unit for pagerank_fixed (1.0 == 10^15)

# Pin the static edge list's partitioning to the per-round join key only
# past this node count (r8): below it, broadcast joins are free and the
# pinned 32-partition shuffle join is a pure scheduling tax (+20% measured
# on the registry graph); above it, the pin is what keeps per-round
# shuffle at O(|V|) instead of re-exchanging O(|E|) every round.
PIN_PARTITIONING_MIN_NODES = 50_000
# Reliable mode's threshold is higher: the parquet statics carry size
# statistics, so AQE broadcasts the ranks side for free until it outgrows
# the broadcast threshold (~a few million nodes) — pinning earlier only
# adds re-key cost (measured at 1e6 nodes), pinning past it removes an
# O(|E|)-per-round re-exchange (measured at 3e6 nodes: 1410 MB/round
# un-pinned).  Sized to the default 10 MB autoBroadcastJoinThreshold over
# ~16-byte (node, rank) rows with margin.
PIN_PARTITIONING_MIN_NODES_RELIABLE = 2_000_000
# Pin sssp_fixed's RELIABLE-mode edge static by its join key only past
# this edge count (r12 resumed session): below it the per-round parquet
# slots' accurate statistics keep the DISTANCE side broadcast and the
# pin is measured harmful (+26/+28% per-invocation shuffle at 1e7/1e8
# Zipf edges — the re-key plus forced shuffle joins where broadcast was
# free); past the flip the un-pinned relaxation join re-exchanges
# O(|E|) EVERY round (measured 15.9 GB vs 8.2 GB pinned at 2e8 edges,
# 23.4 vs 12.1 GB at 3e8 — −48% shuffle, −30/−40% wall, bit-equal;
# OPT_ATTR_r12.txt addendum 3).  The flip sits between the measured
# 99.6M-edge (harmful) and 199.3M-edge (winning) tiers under the
# engine's 64 MB broadcast threshold; the 2e8 constant is CONSERVATIVE —
# every gated size lies at or inside the measured-good 199.3M-299M
# bracket (or past it, where the O(|E|)-per-round blowup only grows),
# and the 199.3M probe tier itself deliberately sits just below the
# gate rather than overfitting the constant to one generator's edge
# count.  Edge count is the signal,
# like the local-mode gates — on much denser graphs (|V| ≪ |E|/10) the
# distance side stays broadcastable longer and the pin fires early; the
# same accepted power-law-shaped exposure as the local n_e gates.
SSSP_RELIABLE_PIN_MIN_EDGES = 200_000_000
# Pin pagerank_fixed's NODES static by its per-round join key only past
# this node count (r12 resumed session, local mode): the per-round
# nodes⋈contribs LEFT join writes the whole node list to its exchange
# every round once the planner stops keeping that join exchange-light —
# measured flipping between ~3e5 and ~5e5 nodes on Zipf graphs (+48/52%
# per-invocation shuffle from pinning at 1e5/3e5 nodes; −6% at 5e5 and
# 1e6 nodes, wall −10/−25% at 1e6 nodes, results bit-equal —
# OPT_ATTR_r12.txt addendum 2).  10× the edge-pin gate, and every shipped
# size is measured-good; the one-off repin job is noise in this regime
# (the pin-path doctrine in RoundCheckpointer.static).
NODES_PIN_MIN_NODES = 500_000


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int | None = None,
    checkpoint_dir: str | None = None,
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
    because level h is explored only after all nodes at < h are visited.

    ``checkpoint_dir`` switches lineage truncation from localCheckpoint to
    the reliable two-slot parquet scheme (see operators.checkpointing);
    the visited set and the per-level frontier are independent streams, so
    each gets its own alternating slot pair."""
    chk_v = RoundCheckpointer(checkpoint_dir, prefix="bfs-visited")
    chk_f = RoundCheckpointer(checkpoint_dir, prefix="bfs-frontier")
    edges_frame = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # distinct() leaves the edge list partitioned by (src, dst); on big
    # graphs re-key it by the per-level join key so the pinned static
    # makes every level's join exchange-free on the edge side (r8 probe
    # finding — 1.8 GB of BFS shuffle at 1e7 edges, mostly the edge side;
    # gated like pagerank so floor-sized graphs keep broadcast joins, and
    # local-mode-only: the reliable slot's parquet statistics already let
    # AQE broadcast the frontier side, so the pin would only add cost
    # there — see RoundCheckpointer.static).  The gate's edge count is
    # folded into the materialization (r8 verdict nit: a dedicated
    # e.count() was an extra O(|E|) scan per invocation): persist once,
    # count — which both materializes the cache and answers the gate —
    # then build the static FROM the cache, so no job scans the source a
    # second time just to decide the pin.
    if chk_v.run_dir is None:
        pre = edges_frame.persist()
        n_e = pre.count()
        pin = "src" if n_e >= 10 * PIN_PARTITIONING_MIN_NODES else None
        e = chk_v.static(pre, "edges", pin_key=pin)
        pre.unpersist()
    else:
        e = chk_v.static(edges_frame, "edges")
    visited = chk_v(
        seeds.select("node").distinct().withColumn("hops", F.lit(0))
    )
    frontier = visited.select("node")
    h = 0
    while max_hops is None or h < max_hops:
        h += 1
        nxt = chk_f(
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
        )
        if nxt.isEmpty():
            break
        visited = chk_v(visited.union(nxt))
        frontier = nxt.select("node")
    chk_v.cleanup_stale(returning=visited)
    chk_f.cleanup_all()  # purely intermediate: nothing reads frontiers now
    return visited


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 12,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    checkpoint_dir: str | None = None,
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

    Scale shape (r7 restructure — the static parts of every round are
    hoisted out of the loop, cutting per-round work roughly in half with
    bit-identical arithmetic):

    - out-degree is a property of the edge set, not the ranks, so it is
      joined INTO the edge list once before the loop — each round is then
      ONE ranks⋈edges shuffle join + one aggregation instead of two joins;
    - the dangling-node set is likewise static; its size is counted once,
      and when it is zero (every symmetric/undirected graph, e.g. the
      co-purchase graph) the per-round dangling-mass aggregate + broadcast
      is dropped from the plan entirely — ``dm`` is identically 0, so the
      round arithmetic is unchanged bit-for-bit;
    - lineage truncates per checkpointed round, as before;
      ``checkpoint_dir`` switches from localCheckpoint to the reliable
      two-slot parquet scheme (operators.checkpointing.RoundCheckpointer,
      shared with ``neardup_components``) — the executor-loss-safe mode
      for long jobs on a real cluster.

    Returns (node, rank_fp: long)."""
    chk = RoundCheckpointer(checkpoint_dir, prefix="pagerank-fixed")
    # r11 optimization round (guide §2.4 — remove jobs outright): the
    # pre-loop section used to schedule SIX actions (edges static, nodes
    # static, nodes.count, edges-od static, dangling count, ranks-init
    # checkpoint) before the first iteration ran — measured 13 SQL
    # executions on the registry row, nearly all per-job scheduling floor
    # (18.7 MB total shuffle).  Three of those barriers fold away with the
    # per-round plans left bit-identical:
    #
    # - ``e`` has no in-loop consumer (rounds read ``e_od``/``nodes``), so
    #   it becomes a LAZY persist whose materialization rides the nodes
    #   static's job — its own execution disappears;
    # - n and n_dangling come from ONE aggregate over the nodes static
    #   (left join against the distinct src set) instead of two counts;
    # - the ranks seed is a narrow map over the nodes static — no
    #   checkpoint of its own; round 1's in-loop checkpoint truncates
    #   lineage exactly as before.
    #
    # Statics the ROUNDS join against (``nodes``, ``e_od``) deliberately
    # keep the eager RDD localCheckpoint: a lazy-persist variant was
    # measured and REJECTED — the per-round joins then read the columnar
    # cache instead of RDD blocks, +25-30% per round on the registry graph
    # (the same columnar-cache round-trip cost documented on the pin path
    # in RoundCheckpointer.static), which ate the folded jobs' savings.
    e = chk.static(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct(),
        "edges",
        lazy=True,
    )
    nodes = chk.static(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        "nodes",
    )
    # one action for BOTH graph constants: n (node count) and n_dangling
    # (nodes with no out-edge) — previously nodes.count() plus a separate
    # anti-join count.  Every src IS a node by construction, so
    # n_dangling = n − |distinct srcs|; a two-group union count gets both
    # in one job whose only exchange is the src-distinct (map-side
    # partial counts reduce the union to 2 rows) — strictly less shuffle
    # than the old nodes⋈srcs anti-join, measured −16 MB at 1e7 edges.
    srcs = e.select(F.col("src").alias("node")).distinct()
    counts = {
        r["k"]: r["c"]
        for r in nodes.select(F.lit("n").alias("k"))
        .unionAll(srcs.select(F.lit("s").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = counts.get("n", 0)
    n_dangling = n - counts.get("s", 0)
    if n == 0:
        # empty graph: in reliable mode `nodes` is backed by a static slot
        # under a possibly-shared checkpoint_dir — returning it would leak
        # the run dir forever (r8 ADVICE fix).  Hand back an unbacked empty
        # literal frame and remove the whole per-invocation dir first.
        schema = T.StructType(
            nodes.schema.fields + [T.StructField("rank_fp", T.LongType())]
        )
        chk.cleanup_all()
        return edges.sparkSession.createDataFrame([], schema)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # hash-partition the joined edge list by its join key BEFORE the static
    # checkpoint (r8, power-law probe finding): the persisted plan keeps
    # its outputPartitioning, so every round's ranks⋈edges join reuses it
    # and only the O(|V|) ranks side + the message aggregation shuffle per
    # round — without this the O(|E|) edge list re-shuffled EVERY round
    # (measured 587 MB/round at 1e7 edges vs ~160 MB of edge data).
    # SIZE-GATED PER MODE: on floor-sized graphs the pinned partitioning
    # makes the planner keep a 32-partition shuffle join where broadcast
    # was free — measured +20% per invocation on the registry's 2-pair
    # graph — so the pin applies only past the scale where it starts paying
    # (n is already counted).  Reliable mode pins too, behind its own
    # HIGHER threshold (PIN_PARTITIONING_MIN_NODES_RELIABLE): the parquet
    # slot stays the durable record and the read-back is re-keyed +
    # persisted once (RoundCheckpointer.static), so a lost executor
    # recomputes pinned blocks from the parquet; below that threshold the
    # parquet statistics let AQE broadcast the ranks side for free and the
    # pin would only add its re-key cost (measured and rejected at 1e7
    # edges / 1e6 nodes; measured winning at 3e7: 1410 -> 1122 MB/round).
    e_od_frame = e.join(out_deg, "src").select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst"), "od"
    )
    pin_min = (
        PIN_PARTITIONING_MIN_NODES
        if chk.run_dir is None
        else PIN_PARTITIONING_MIN_NODES_RELIABLE
    )
    pin_key = "e_src" if n >= pin_min else None
    e_od = chk.static(e_od_frame, "edges-od", pin_key=pin_key)
    # r12 resumed session (guide §2.3 — shuffle fewer bytes): past
    # NODES_PIN_MIN_NODES, repin the already-checkpointed nodes static by
    # its per-round join key so the nodes⋈contribs LEFT join stops
    # writing the O(|V|) node list to an exchange every round (measured
    # 679.3 → 639.6 MB per invocation at 1e7 Zipf edges / 1e6 nodes,
    # walls −10/−25% over order-balanced idle sessions, bit-equal; the
    # repin is one extra one-off job, which is noise here).  LOCAL mode
    # only and deliberately ON TOP of the checkpoint rather than replacing
    # it, so below the gate — every registry/driver graph — the plan is
    # byte-identical to the pre-change shape.  Below ~3e5 nodes the pin
    # is measured HARMFUL (+48-52% shuffle: the planner keeps that join
    # exchange-light there), hence the dedicated higher gate.
    if chk.run_dir is None and n >= NODES_PIN_MIN_NODES:
        nodes = chk.repin(nodes, "node")
    if n_dangling:
        # hoist the SET too, not just the count: the per-round dang
        # aggregate semi-joins against it, and a lazy frame would re-run
        # the distinct + anti-join inside every round (review, r7)
        dangling = nodes.join(srcs, "node", "left_anti")
        dangling = chk.static(dangling.select("node"), "dangling")
    else:
        dangling = None
    base = (100 - damping_pct) * scale // (100 * n)
    # seed ranks as a narrow map over the nodes static — no checkpoint of
    # its own; the first in-loop checkpoint truncates lineage as before
    ranks = nodes.withColumn("r", F.lit(scale // n).cast("long"))
    if n_iter == 0:
        # degenerate call: the loop never checkpoints, but cleanup_stale
        # requires (and the caller receives) a round-slot frame
        ranks = chk(ranks)
    for it in range(n_iter):
        contribs = (
            ranks.join(e_od, ranks["node"] == e_od["e_src"])
            .select(F.col("e_dst").alias("node"), F.expr("r div od").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new = nodes.join(contribs, "node", "left")
        if n_dangling:
            dang = (
                ranks.join(dangling.select("node"), "node", "left_semi")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
            )
            new = new.crossJoin(F.broadcast(dang)).select(
                "node",
                F.expr(
                    f"{base}L + ({damping_pct} * (coalesce(inflow, 0L)"
                    f" + dm div {n})) div 100"
                ).alias("r"),
            )
        else:
            new = new.select(
                "node",
                F.expr(
                    f"{base}L + ({damping_pct} * coalesce(inflow, 0L)) div 100"
                ).alias("r"),
            )
        # checkpoint every SECOND round (and the last): lineage stays ≤ 2
        # rounds deep — no exponential plan growth — while half the
        # materialization jobs disappear; on small-diameter graphs the
        # per-job floor, not the shuffle, dominates each round's cost
        if it % 2 == 1 or it == n_iter - 1:
            new = chk(new)
        ranks = new
    chk.cleanup_stale(returning=ranks)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 30,
    tol: float = 1e-8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Returns (node, rank) for every node appearing in ``edges``.
    Duplicate edges are collapsed (simple graph).  ``tol`` is the total L1
    rank movement under which iteration stops.  ``checkpoint_dir`` switches
    lineage truncation to the reliable two-slot parquet scheme (see
    operators.checkpointing) for executor-loss-safe cluster runs."""
    chk = RoundCheckpointer(checkpoint_dir, prefix="pagerank")
    e = chk.static(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct(),
        "edges",
    )
    nodes = chk.static(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        "nodes",
    )
    n = nodes.count()
    if n == 0:
        # same leak guard as pagerank_fixed: never return a static-backed
        # frame from the empty path (r8 ADVICE fix)
        schema = T.StructType(
            nodes.schema.fields + [T.StructField("rank", T.DoubleType())]
        )
        chk.cleanup_all()
        return edges.sparkSession.createDataFrame([], schema)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # pinned edge partitioning, same size gate and rationale as
    # pagerank_fixed (r8): rounds stop re-shuffling O(|E|) on big graphs,
    # floor-sized graphs keep their free broadcast joins
    e2 = e.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    if n >= (
        PIN_PARTITIONING_MIN_NODES
        if chk.run_dir is None
        else PIN_PARTITIONING_MIN_NODES_RELIABLE
    ):
        e2 = chk.static(e2, "edges-keyed", pin_key="e_src")
    ranks = chk(nodes.withColumn("rank", F.lit(1.0 / n)))
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
        new_ranks = chk(
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
    chk.cleanup_stale(returning=ranks)
    return ranks


# Probe/test introspection for the last completed invocation on the
# CURRENT thread (tools/scaling_probe.py --diameter / --automix and the
# equal-output tests read it; not API).  Thread-local since r10: the
# engine's own bench runs queries concurrently, and a shared function
# attribute would let two invocations clobber each other's counters
# (VERDICT r9 "what's wrong" #2).
_probe_tls = threading.local()


def star_probe_info() -> dict:
    """rounds + input_nodes of this thread's last connected_components_star
    run.  input_nodes is the round-0 convergence-signature node count —
    free evidence of how large the star phase's input actually was (the
    auto-mode contraction check)."""
    return dict(getattr(_probe_tls, "star", {}))


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    — the HIGH-DIAMETER / big-graph path.  Min-label propagation
    (``operators.dedup.neardup_components``) runs rounds = O(diameter):
    fine for near-dup cluster graphs (dense, diameter ~2-3), pathological
    on chain-shaped graphs (a 10^5-node path needs 10^5 rounds).  The
    star operations contract every component to a star rooted at its
    minimum id in O(log n) rounds regardless of diameter, because each
    round rewires nodes to their neighborhood minima — path length halves
    (or better) every alternation instead of shrinking by one.

    Per round, on the canonical edge set E (a < b per edge):

    - LARGE-STAR: for each node u with m(u) = min(N(u) ∪ {u}) over the
      SYMMETRIZED neighborhood, connect every STRICTLY LARGER neighbor to
      m(u): {(v, m(u)) : v ∈ N(u), v > u}.  The emission rows are exactly
      the canonical edges themselves (v > u ⟺ the (a, b) orientation), so
      this is one groupBy-min over the symmetrized list (map-side combine
      shrinks the exchange toward O(V)) joined back onto E by its small
      endpoint, plus a distinct — never a partition-wide window sort, and
      nothing 2E-row is persisted.
    - SMALL-STAR: key each edge by its larger endpoint b with m(b) =
      min(N(b)); connect the smaller neighbors and b itself to m(b):
      {(v, m(b)) : v ∈ N(b) ∪ {b}, v ≠ m(b)}.  Same groupBy-min + join
      shape, keyed by b.

    Convergence is detected with GraphFrames' monotone signature: P(u) =
    min(N(u) ∪ {u}) is non-increasing per node under both operations
    (small-star retains (u, P(u)) verbatim; large-star connects u to
    m(P(u)) ≤ P(u)), so S = Σ_u P(u) is non-increasing and S unchanged
    over a full round means NO node's parent moved — which forces P to be
    component-constant (an edge (x, y) with P(x) < P(y) would have
    small-star(x) emit (P(y), P(x)) that round, decreasing S) and
    self-fixed at each component's minimum id.  The sum is accumulated as
    DECIMAL(38,0), exact for any id width, and comes free off the
    large-star's per-node min frame (one O(V)-row aggregate per round).

    Shuffle shape at scale: every exchange is hash-partitioned on a node
    id over the CURRENT edge set, which only ever shrinks (stars collapse
    parallel structure); no all-pairs stage, no driver-side graph state —
    the per-round aggregate returns one row.  Numeric node ids required
    (the signature sums them); the engine's doc/node ids are integral
    throughout.

    Returns (node, component) for every node appearing in ``edges``;
    isolated ids never enter an edge list, so callers wanting them join
    against their id universe (``neardup_components(algorithm="star")``
    does).  Raises after ``max_iter`` non-converged rounds — with O(log n)
    convergence the default 50 covers any physically storable graph.
    """
    for c in (src_col, dst_col):
        if not isinstance(
            edges.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
        ):
            raise TypeError(
                "connected_components_star needs integral node ids (the "
                f"convergence signature sums them); got {edges.schema[c]} — "
                "use neardup_components' label propagation for opaque ids"
            )
    chk = RoundCheckpointer(checkpoint_dir, prefix="cc-star")
    e = chk(
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .filter("x <> y")
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    prev_sig = None
    converged = False
    rounds = 0
    input_nodes = 0
    for rounds in range(max_iter):
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        # per-node parent P(u) = min(N(u) ∪ {u}): O(V) rows after the
        # map-side-combined groupBy; persisted because both the signature
        # aggregate and the large-star join read it this round
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
            .persist()
        )
        sig = mins.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("m").cast("decimal(38,0)")).alias("s"),
        ).first()
        sig = (sig["n"], sig["s"])
        if rounds == 0:
            input_nodes = int(sig[0])
        if sig == prev_sig:
            mins.unpersist()
            converged = True
            break
        prev_sig = sig
        # large-star: the v > u emission rows are exactly the canonical
        # edges (u = a, v = b), so join E by its small endpoint; the new
        # edge (b, m(a)) is already canonical because m(a) ≤ a < b.
        # Materialized through the checkpointer: the small-star below
        # reads it from three subplans (the minsb aggregate and both
        # union branches), and neither exchange reuse nor a lazy persist
        # dedupes the join across them reliably under AQE — unmaterialized,
        # the large-star join re-executed per consumer (measured +1.7 GB
        # shuffle at the 1e6-node path tier).
        ls = chk(
            e.join(mins, e["a"] == mins["u"])
            .select(F.col("m").alias("a"), "b")
            .distinct()
        )
        # small-star: m(b) = min(N(b)) over the smaller-endpoint neighbors;
        # emit (v, m(b)) for every v ∈ N(b) except m(b) itself, plus
        # (b, m(b)) — all canonical since m(b) < v ≤ b.  minsb is O(V)
        # and read by both union branches; the cheap persist stops its
        # groupBy exchange running once per consumer.
        minsb = ls.groupBy("b").agg(F.min("a").alias("mb")).persist()
        e = chk(
            ls.join(minsb, "b")
            .filter(F.col("a") != F.col("mb"))
            .select(F.col("mb").alias("a"), F.col("a").alias("b"))
            .union(minsb.select(F.col("mb").alias("a"), "b"))
            .distinct()
        )
        minsb.unpersist()
        mins.unpersist()
    _probe_tls.star = {"rounds": rounds, "input_nodes": input_nodes}
    if not converged:
        chk.cleanup_all()
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — not expected for any O(log n)-round run; raise "
            "max_iter only after checking the input for pathology"
        )
    # final labels straight off the converged star set: every non-root
    # appears exactly once as the larger endpoint of (root, v); roots are
    # the nodes never appearing as b
    labels = chk(
        e.select(F.col("b").alias("node"), F.col("a").alias("component")).union(
            e.select(F.col("a").alias("node"))
            .distinct()
            .join(e.select(F.col("b").alias("node")), "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
    )
    chk.cleanup_stale(returning=labels)
    return labels


def _oriented_triangle_stream(
    edges: DataFrame, src_col: str, dst_col: str, checkpoint: bool
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared core of ``triangle_stats`` / ``triangle_support``: canonical
    edge set ``e`` (lo < hi, distinct), per-node ``deg``, and the exact
    once-per-triangle stream ``tri`` (a, b, c in (degree, id)-rank order —
    NOT id order) via degree-ordered orientation.  See ``triangle_stats``
    for the algorithm and its scale argument."""
    e = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .filter("x <> y")
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionAll(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    oriented = (
        e.join(deg.select(F.col("node").alias("lo"), F.col("degree").alias("dlo")), "lo")
        .join(deg.select(F.col("node").alias("hi"), F.col("degree").alias("dhi")), "hi")
        # rank(lo) < rank(hi) ⟺ dlo < dhi, or degree tie broken by the
        # canonical lo < hi — so the tie case is exactly dlo <= dhi
        .select(
            F.when(F.col("dlo") <= F.col("dhi"), F.col("lo"))
            .otherwise(F.col("hi"))
            .alias("u"),
            F.when(F.col("dlo") <= F.col("dhi"), F.col("hi"))
            .otherwise(F.col("lo"))
            .alias("v"),
            F.when(F.col("dlo") <= F.col("dhi"), F.col("dhi"))
            .otherwise(F.col("dlo"))
            .alias("dv"),
        )
    )
    if checkpoint:
        oriented = oriented.localCheckpoint(eager=True)
    e1 = oriented.select("u", F.col("v").alias("b"), F.col("dv").alias("db"))
    e2 = oriented.select("u", F.col("v").alias("c"), F.col("dv").alias("dc"))
    wedges = e1.join(e2, "u").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closure = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedges.join(closure, ["b", "c"]).select(F.col("u").alias("a"), "b", "c")
    return e, deg, tri


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient by
    degree-ordered edge orientation (the MapReduce triangle scheme of
    Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of the
    Last Reducer") — transitivity of the near-dup graph, cohesion of the
    co-purchase graph.

    The naive wedge join keys on each wedge CENTER, so a degree-d hub
    emits d² candidate wedges — the "last reducer" that stalls the job on
    any power-law graph.  Orienting every edge from its (degree, id)-
    lexicographic smaller endpoint to its larger caps every node's
    OUT-degree at O(√m): a hub's wedges are generated by its low-degree
    neighbors, never by the hub, bounding total wedge volume at O(m^{3/2})
    (the arboricity bound) independent of the degree distribution.  Each
    triangle {a, b, c} with rank(a) < rank(b) < rank(c) survives exactly
    once, as wedge (a; b, c) closed by oriented edge b→c.

    Plan shape — every stage an equi-join or map-side-combinable agg, all
    JVM-side:

    1. canonicalize + distinct (one shuffle on the edge pair);
    2. degrees: groupBy over the symmetrized endpoint list (O(V) rows out);
    3. orient: two broadcast-eligible joins of degrees onto edges (AQE
       picks broadcast while degrees fit, hash-join beyond);
    4. wedges ⋈ closure: self-join on the wedge center, then ONE equi-join
       of the (b, c)-keyed wedge stream against the oriented edge set —
       no cartesian, no driver-side adjacency;
    5. per-node counts: explode each triangle's three corners, groupBy.

    With ``checkpoint`` (default), the canonical edge set and the oriented
    edge set are eagerly ``localCheckpoint``-ed: edges feed degree + both
    orientation joins, oriented feeds three consumers (both wedge sides +
    closure) — without truncation the upstream derivation (for the
    near-dup caller: the whole SimHash subtree) re-executes per consumer.
    Same multi-consumer discipline as ``pagerank_copurchase``'s mined-pair
    checkpoint; at cluster scale the materialization is executor-local
    blocks, never a driver collect.

    Returns (node, degree, triangles, clustering): degree over the simple
    undirected graph, triangles the node participates in, clustering =
    2·T / (deg·(deg−1)) — both operands exact integers, so the single
    IEEE division is engine-exact (the registry's integer-operand
    division doctrine) — and 0.0 for degree-1 nodes.
    """
    e, deg, tri = _oriented_triangle_stream(edges, src_col, dst_col, checkpoint)
    # ONE generator pass over the triangle stream — a three-branch union
    # would give tri three consumers and re-execute the wedge+closure
    # subtree once per corner (probe-caught at the 4e6-edge tier: three
    # 36M-row closure joins, ~4.7× the necessary shuffle;
    # TRIANGLE_PROBE_r11.txt)
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    tcount = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return deg.join(tcount, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias("triangles"),
        F.when(
            F.col("degree") > 1,
            (F.lit(2.0) * F.coalesce(F.col("triangles"), F.lit(0)))
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def triangle_support(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-EDGE triangle support: for every canonical edge (lo < hi), the
    number of triangles it participates in — the single-round core of
    k-truss peeling, and the standard bridge detector for near-dup graph
    denoising: an edge closing zero triangles is unsupported transitive
    evidence (a chain of borderline matches), while edges inside template-
    family cliques carry support ≈ clique size − 2.  Filtering on support
    BEFORE connected components stops the over-merge chains that min-label
    propagation would otherwise glue into giant clusters.

    Same oriented enumeration as ``triangle_stats`` (degree-ordered
    orientation, O(m^{3/2}) wedge bound — see its docstring); each
    triangle credits its three edges via one generator pass (the
    explode discipline from TRIANGLE_PROBE_r11), re-canonicalized to
    (lo, hi) because the stream is rank-ordered, then one groupBy.

    Returns every canonical edge with its support, INCLUDING support-0
    edges (left join — the denoiser must see the bridges to drop them):
    (lo, hi, support).
    """
    e, _deg, tri = _oriented_triangle_stream(edges, src_col, dst_col, checkpoint)
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("a").alias("x"), F.col("c").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("c").alias("y")),
            )
        ).alias("te")
    ).select(
        F.least("te.x", "te.y").alias("lo"),
        F.greatest("te.x", "te.y").alias("hi"),
    )
    sup = tri_edges.groupBy("lo", "hi").agg(F.count(F.lit(1)).alias("support"))
    return e.join(sup, ["lo", "hi"], "left").select(
        "lo",
        "hi",
        F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"),
    )


def truss_peel(
    edges: DataFrame,
    k: int = 4,
    n_rounds: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-truss peeling (Cohen 2008): iteratively delete every edge closing
    fewer than k−2 triangles until fixpoint — the maximal subgraph where
    each edge is embedded in at least k−2 triangles.  The graded version
    of ``triangle_support``'s one-shot bridge filter: peeling re-measures
    support on the SURVIVORS, so a chain of weakly-supported cliques
    unravels even when every edge individually clears the bar on the raw
    graph.

    ``n_rounds`` fixed (the ``pagerank_fixed`` pattern) makes the result
    a pure function of (edge set, k, n_rounds) with a statically
    unrollable SQL twin — the registry row runs 3 rounds, converged on
    its graph, and stays deterministic at any scale whether or not 3
    rounds converge there.  ``n_rounds=None`` peels to fixpoint
    (production mode): each round is one oriented triangle enumeration
    (O(m^{3/2}) wedges, see ``triangle_stats``) over a monotonically
    shrinking edge set, with convergence read from the per-round edge
    count the round must materialize anyway; raises after ``max_iter``
    non-converged rounds like the star components loop.

    Returns the surviving canonical edges with support measured ON the
    surviving set: (lo, hi, support) — under fixed ``n_rounds`` a
    support may still sit below k−2 if the graph needed more rounds,
    which is readable from the output rather than papered over.
    """
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3 (every edge is a 2-truss); got {k}")
    e = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .filter("x <> y")
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = e.count() if n_rounds is None else None
    rounds = 0
    while True:
        if n_rounds is not None:
            if rounds >= n_rounds:
                break
        elif rounds >= max_iter:
            raise RuntimeError(
                f"truss_peel(k={k}) did not converge in {max_iter} rounds — "
                "each round deletes at least one edge, so this graph needs "
                "a larger max_iter (or the fixed n_rounds mode)"
            )
        kept = (
            triangle_support(e, src_col="lo", dst_col="hi")
            .filter(F.col("support") >= k - 2)
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
        rounds += 1
        if n_rounds is None:
            n_kept = kept.count()
            if n_kept == n_prev:
                e = kept
                break
            n_prev = n_kept
        e = kept
        if n_rounds is None and n_prev == 0:
            break
    return triangle_support(e, src_col="lo", dst_col="hi")


def sssp_fixed(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Hop-bounded cheapest distance from ``sources`` (one ``node``
    column) by ``n_rounds`` Bellman-Ford min-plus relaxations: after
    round R, ``dist(v)`` is the exact minimum weight over all paths of
    ≤ R edges — the fixed-round member of the family (``pagerank_fixed``,
    ``truss_peel``), so with INTEGRAL weights the result is a pure
    function of (edges, sources, n_rounds) and carries a bit-exact
    unrolled SQL twin.  Semantics are stated as hop-bounded rather than
    "converged": a weighted shortest path can use more hops than the
    unweighted diameter (three w=1 hops beat one w=10 edge), so callers
    choose R for the path depth they mean; rounds past the true shortest-
    path depth are exact no-ops (min-plus is monotone), changing nothing
    but wall time.

    Per round — the PageRank shuffle shape: ONE frontier⋈edges equi-join
    emitting (dst, dist+w) candidates, then a MIN carry that is
    union+groupBy on floor-sized/reliable graphs and a candidate-only
    aggregation merged into the carried distances by full-outer
    ``least()`` join above the local pin gate (bit-equal by min-plus
    algebra; the merge keeps the aggregation exchange to the candidate
    side — see the in-loop comment); lineage truncates per round via
    RoundCheckpointer (``checkpoint_dir`` switches to the reliable
    two-slot parquet scheme), and the static edge list is pinned to its
    join key past the BFS gate so big graphs exchange only the O(|V|)
    distance side per round.

    Unreached nodes have NO row (sparse frontier — the 100 TB form;
    total rows ≤ reachable set, never |V|×rounds).  Returns
    (node, dist: long).
    """
    if not isinstance(
        edges.schema[weight_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        raise TypeError(
            "sssp_fixed needs integral edge weights (min-plus must be "
            f"engine-exact for the unrolled oracle); got "
            f"{edges.schema[weight_col]} — scale fixed-point weights to "
            "integers first (the pagerank_fixed doctrine)"
        )
    chk = RoundCheckpointer(checkpoint_dir, prefix="sssp-fixed")
    edges_frame = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).distinct()
    # same pin discipline as bfs_min_hops: count once off the persisted
    # frame (local mode only — reliable parquet statics let AQE broadcast
    # the distance side below the higher threshold)
    if chk.run_dir is None:
        pre = edges_frame.persist()
        n_e = pre.count()
        pin = "src" if n_e >= 10 * PIN_PARTITIONING_MIN_NODES else None
        e = chk.static(pre, "edges", pin_key=pin)
        pre.unpersist()
    else:
        pin = "src"  # reliable mode always checkpoints every round below
        e = chk.static(edges_frame, "edges")
        # r12 resumed session (guide §2.3): past the distance-side
        # broadcast flip the un-pinned relaxation join re-exchanges the
        # whole edge static every round — repin it by the join key past
        # SSSP_RELIABLE_PIN_MIN_EDGES (the pagerank_fixed reliable
        # discipline, measured for THIS operator's dataflow: −48%
        # per-invocation shuffle at 2e8/3e8 Zipf edges, harmful below
        # the flip, hence the dedicated gate — see the constant).  The
        # gate count is metadata-only off the parquet static just
        # written; the pinned cache layers over the parquet slot, so a
        # lost executor recomputes pinned blocks from the durable file.
        if e.count() >= SSSP_RELIABLE_PIN_MIN_EDGES:
            e = chk.repin(e, "src")
    d = chk(
        sources.select("node").distinct().withColumn(
            "dist", F.lit(0).cast("long")
        )
    )
    # r12 optimization round (guide §2.4 — remove jobs outright), the
    # stride-2 fold pagerank_fixed already runs, GATED to the job-floor
    # regime: on local-mode graphs below the pin threshold, checkpoint
    # every SECOND round (and the last).  Unlike pagerank's ranks, ``d``
    # has TWO consumers per round (the relaxation join and the union
    # carry), so an un-checkpointed round's MIN aggregate is read twice by
    # the next round's plan — measured DETERMINISTIC (shuffle bytes
    # constant across reps; exchange reuse shares the aggregate's
    # exchange) but not free at scale: per-invocation shuffle 28.6→32.6 MB
    # at 1e6 Zipf edges, 495→578 MB (+17%) at 1e7, while executions drop
    # 12→8 (OPT_ATTR_r12.txt).  Below the pin gate the per-JOB floor
    # dominates (registry row: 12→9 executions, −11% wall, results
    # bit-equal); above it — and in RELIABLE mode, where each round's
    # parquet slot is the executor-loss recovery contract — the +17%
    # per-round shuffle is the scaling cost, so every round checkpoints
    # exactly as before (plans unchanged above the gate).
    stride2 = chk.run_dir is None and pin is None
    # r12 (second pass over the round's "not yet optimized" #2 — guide
    # §2.3, shuffle fewer bytes): ABOVE the pin gate the union+groupBy
    # carry re-ships the whole distance frame through the MIN aggregation
    # exchange every round on top of the O(|V|) join exchange.  A
    # full-outer min-MERGE (aggregate the candidates alone, then
    # d ⟗ cand_agg with least()) keeps the aggregation exchange to the
    # candidate side only — measured DETERMINISTIC −4% per-invocation
    # shuffle at 1e7 Zipf edges (495.4 → 475.8 MB; 28.6 → 28.4 MB at 1e6)
    # at equal execution count, results bit-equal at both tiers, walls
    # neutral-to-better (OPT_ATTR_r12.txt addendum).  The shape is gated
    # to the pinned LOCAL regime: below the gate broadcast joins are free
    # and stride-2 already owns the job floor (plans there unchanged), and
    # in RELIABLE mode the parquet statics let AQE broadcast the distance
    # side — a full-outer join cannot be broadcast at all (no BHJ support)
    # so the merge would force a sort-merge join where today no join
    # exists.  Two shuffle-neutral stride-2 shapes for this regime were
    # measured and REJECTED in the same addendum: an explicit
    # repartition(P, "node") carry is byte-IDENTICAL to plain stride-2
    # (+17% at 1e7 — the skipped round's re-exchange just moves), and
    # merge+stride-2 still pays +13%.
    merge = chk.run_dir is None and pin is not None
    for it in range(n_rounds):
        cand = d.join(e, d["node"] == e["src"]).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        if merge:
            cand_agg = cand.groupBy("node").agg(F.min("dist").alias("cd"))
            new = d.join(cand_agg, "node", "full").select(
                "node", F.least(F.col("dist"), F.col("cd")).alias("dist")
            )
        else:
            new = d.unionByName(cand).groupBy("node").agg(
                F.min("dist").alias("dist")
            )
        if not stride2 or it % 2 == 1 or it == n_rounds - 1:
            new = chk(new)
        d = new
    chk.cleanup_stale(returning=d)
    return d
