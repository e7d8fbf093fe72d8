"""Benchmark harness: runs the driver-surface queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing excludes session bootstrap (one warm-up action runs first) and
excludes result transfer to the driver: each query executes to completion
via the noop sink, which is what a lake writer would see.

Three measurements per the round-1 review (PERFORMANCE.md):

- run-once wall time per query (cold: includes Python-side DataFrame
  construction, Catalyst planning, codegen compilation and job scheduling
  for that plan shape; median of 3 rebuilds so one machine-load spike
  can't corrupt a row) — the "queries"/"value" numbers;
- WARM per-query time for the core-12 suite ("core12_warm_sec"): the
  DataFrame is built once, its plan compiled by the run-once pass, and the
  timed unit is the ACTION alone (median of 3).  At toy SF the run-once
  numbers are dominated by fixed per-query overhead — py4j plan
  construction plus planning/scheduling, ~0.15-0.5 s each (see
  PERFORMANCE.md's decomposition); the warm median is the number
  comparable to BASELINE.md's warm-Postgres EXPLAIN ANALYZE loop, which
  likewise excludes parse/plan-transfer client time.
- CONCURRENT suite wall time ("core12_concurrent_sec"): all 12 warm
  queries submitted at once from a thread pool, wall time until the last
  completes (median of 3 passes).  This is how a warehouse serves a query
  mix — per-query scheduling latency overlaps instead of summing — and is
  the engine-level number that amortizes the fixed overhead the
  sequential loop pays 12 times.
- WARM medians for the HEAVY EXTENSION queries ("ext_warm_queries", r4):
  the rows that dominate the suite total (dedup/ANN/curation) previously
  had run-once medians only, so round-over-round regression tracking for
  exactly the most expensive operators kept paying plan-build noise.
  Lazy queries time the action alone on a pre-built DataFrame, like
  core12.  The eager iterative queries (connected components and the
  curation pipeline that embeds them) EXECUTE during DataFrame
  construction — an action-only number would time reading back a
  checkpoint, not the operator — so for those the timed unit is a full
  rebuild+execute repeat (the flag "eager" marks them in the output).

  Since r6 the extension phase runs in a FRESH SparkSession (the run-once
  pass accumulates GBs of localCheckpoint RDD blocks from the iterative
  queries; restarting releases them so ext timings aren't paying old
  block eviction).  The restart also discards JIT/codegen state, so the
  FIRST of the 3 timed repeats pays fresh-JVM compilation — the median
  absorbs it, but ext_warm rows are NOT comparable to the r4/r5 rounds
  that timed inside the warm original session (PERFORMANCE.md, r6).

- Per-row DETERMINISTIC METERS ("meters", r12 — additive, no timed region
  changed): [SQL executions, shuffle MB written, parquet MB read] from the
  last run-once rep, so a wall draw contaminated by ambient load still
  carries load-invariant plan-shape signal for round-over-round
  comparison (the r10/r11 driver draws were unusable for walls).
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402
from tools.shuffle_audit import _execution_metrics  # noqa: E402

# single idle-gate threshold (r8 ADVICE): the wait loop and the idle_start
# stamp must agree on what "idle" means, so tuning one can't silently
# diverge from what the artifact reports
IDLE_LOAD1 = 0.3


def main() -> None:
    t_proc0 = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # Idle gate (r7): a bench launched while a prior sweep's load decays
    # lands at the top of the documented ambient range and reads as a
    # false regression (the r6 driver artifact started at load 8.4,
    # idle_start=false, and every unchanged row drifted up uniformly).
    # Wait — bounded — for load1 to fall below the idle threshold before
    # starting; SPARK_GRAFT_IDLE_WAIT=0 disables, default cap 240 s.
    idle_wait = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT", "240"))
    waited = 0.0
    while os.getloadavg()[0] >= IDLE_LOAD1 and waited < idle_wait:
        time.sleep(10)
        waited += 10
    # run-condition stamps: ambient load at start/end makes a contaminated
    # row self-diagnosing in the artifact itself (round-4 postmortem:
    # set_ops_counts 2.387 s in the driver artifact vs 0.479 s clean — only
    # PERFORMANCE.md prose could explain it).  idle_start is the documented
    # quoting discipline: only idle-start runs (load1 < 0.3) are comparable.
    load_start = tuple(round(x, 2) for x in os.getloadavg())
    _load_all()
    # the driver-checked covering set is the benchmark suite; extra=True
    # variants are redundant re-measurements of the same operators.
    # Exception (r8): the BASELINE.md comparison is suite-level over the
    # reference's 12 core queries, so q01..q12 stay timed in full even when
    # the driver-window rotation parks some of them as extras — the
    # benchmark suite is (driver covering set) ∪ (q01..q12).
    core_names = {f"q{i:02d}" for i in range(1, 13)}
    suite = {
        n: s
        for n, s in REGISTRY.items()
        if not s.extra or n[:3] in core_names and n[3:4] == "_"
    }
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")  # local mode: driver IS the executor
    spark = get_spark("bench")
    # warm-up: one full pass at the smallest SF so JIT/codegen compilation is
    # paid before timing — otherwise whichever heavy query happens to run
    # first absorbs several seconds of JVM warm-up and the numbers are
    # ordering-dependent noise
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for spec in suite.values():
        spec.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    # second pass at sf0.01 for the join-heavy families: at sf0.001 AQE
    # plans broadcast joins everywhere, so the sort-merge/shuffle codegen
    # paths the target SF uses would otherwise compile inside the timed run
    mid_dir = "/root/testdata/sf0.01"
    if os.path.isdir(mid_dir) and mid_dir != sf_dir:
        for name, spec in suite.items():
            if name.startswith(
                ("neardup", "knn", "string_similarity", "curation_pipeline",
                 "passage", "bm25", "hybrid")
            ):
                spec.fn(spark, mid_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()  # drop warm-up persists before timing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # bootstrap_sec (r8, verdict #3): everything before the first timed
    # query EXCEPT the idle wait — session start, JIT/codegen warm-up
    # passes (idle wait is subtracted here and reported separately as
    # idle_waited_sec).  The r7 driver cold-anomaly question (core12_sec
    # 11.2 vs 6.7 s) was impossible to attribute because bootstrap and
    # first-query cost were entangled in whichever row ran first; now the
    # artifact separates them.
    bootstrap_sec = round(time.perf_counter() - t_proc0 - waited, 3)

    # Per-PHASE load stamps (r9, verdict #1): the r8 driver artifact's warm
    # and concurrent numbers sat above the local idle band with zero plan
    # changes — almost certainly co-tenant load mid-run, but loadavg was
    # stamped only at process start/end, so a contaminated PHASE could not
    # be told apart from a regression.  Stamp load1 at the entry of every
    # timed phase so the artifact itself says which phase (if any) ran hot.
    phase_loads: dict[str, float] = {}

    def stamp(phase: str) -> None:
        phase_loads[phase] = round(os.getloadavg()[0], 2)

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        suite[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # median of 3 per query: a single pass is not noise-robust — one OS-level
    # load spike during one query inflates that row ~20x and poisons the
    # round artifact (round-2 postmortem: json_extract_agg recorded 13.2 s
    # against a 0.6 s isolated re-measure).  Each run rebuilds the DataFrame
    # so the timing keeps its run-once meaning (plan construction, analysis
    # and scheduling included); the median discards transient machine noise.
    # Between query blocks, drop leaked cache entries and hint a GC: the
    # dedup/text queries persist() intermediates that outlive the action
    # (their caller owns cleanup), and ~150 accumulated cached blocks shrink
    # execution memory for every later query — round-3 postmortem: doc_metrics
    # measured 3.5 s polluted vs 0.6 s clean, purely from its position after
    # the dedup block.  Cleanup runs OUTSIDE the timed region.
    def reset_memory() -> None:
        # Python gc FIRST: localCheckpoint RDD blocks (the eager iterative
        # rows create dozens per execution) are freed by the ContextCleaner
        # only after their py4j DataFrame refs die; clearCache() never touches
        # them.  Without this, late-session runs of curation_pipeline_end2end
        # measured 15-20 s vs 6-8 s clean — the blocks squat in the
        # BlockManager and shrink execution memory for later queries
        # (tools/concurrent_bisect.py condition C, applied).
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # Deterministic per-row meters (r12, VERDICT r11 next-round #2): the
    # driver-side wall numbers have been noise-contaminated or truncated
    # two rounds running, so the artifact now carries signals that ambient
    # load cannot move — per row: [SQL executions, shuffle MB written,
    # parquet MB read] — measured on the LAST of the three run-once reps
    # with the deduped-accumulator reader (tools/shuffle_audit; the dedup
    # matters under AQE, which re-registers plan metrics per re-plan).
    # Snapshotting execution ids and reading the status store happen
    # BETWEEN reps / after the median loop — no timed region changes.
    store = spark._jsparkSession.sharedState().statusStore()

    def _exec_ids() -> set[int]:
        listed = store.executionsList()
        return {listed.apply(i).executionId() for i in range(listed.size())}

    stamp("run_once")
    times: dict[str, float] = {}
    meters: dict[str, list] = {}
    for name in suite:
        walls = []
        before_ids: set[int] = set()
        for rep in range(3):
            if rep == 2:
                before_ids = _exec_ids()
            walls.append(run_once(name))
        times[name] = round(statistics.median(walls), 3)
        new_ids = _exec_ids() - before_ids
        m = _execution_metrics(store, new_ids)
        meters[name] = [
            len(new_ids),
            round(m.get("shuffle bytes written", 0.0) / 2**20, 1),
            round(m.get("size of files read", 0.0) / 2**20, 1),
        ]
        reset_memory()

    # warm per-query time: reuse the built DataFrame (plan already analyzed
    # and compiled), time the action alone; median of 3
    core = [n for n in times if n.startswith("q")]
    core_dfs = {n: suite[n].fn(spark, sf_dir) for n in core}
    reset_memory()
    stamp("warm")
    warm: dict[str, float] = {}
    for name in core:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            core_dfs[name].write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        warm[name] = round(statistics.median(runs), 3)

    # concurrent suite wall: submit all 12 at once, wall until last finishes
    def run_action(name: str) -> None:
        core_dfs[name].write.mode("overwrite").format("noop").save()

    reset_memory()
    stamp("concurrent")
    # the concurrent number is THE graded headline; record each pass's own
    # wall time AND the load1 sampled right before it, so a single
    # co-tenant-loaded pass is visibly the outlier instead of silently
    # shaping the median (r9, verdict #1)
    conc_runs = []
    conc_passes: list[dict[str, float]] = []
    for _ in range(3):
        pass_load = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(core)) as ex:
            list(ex.map(run_action, core))
        sec = time.perf_counter() - t0
        conc_runs.append(sec)
        conc_passes.append({"sec": round(sec, 3), "load1": pass_load})

    # warm medians for the heavy extension rows (see module docstring)
    ext_heavy = [
        "neardup_components_canonical",
        "neardup_embedding_cosine",
        "neardup_minhash_lsh",
        "knn_bruteforce_cosine",
        "knn_sq8_rerank",
        "curation_pipeline_end2end",
        "string_similarity_pairs",
        # r5 rotation: the new heavy driver rows track warm medians too
        "knn_pq_rerank",
        "maxsim_retrieval_topk",
        "srp_lsh_neardup_pairs",
        "pagerank_copurchase",
        # r6: BFS swapped to the eager frontier loop — track its rebuild
        # cost the same way as the other iterative rows
        "reachable_parts_bfs",
    ]
    ext_heavy = [n for n in ext_heavy if n in suite]
    # Fresh session for the extension-row phase: by this point the driver
    # has run ~170 query executions, and the accumulated scheduler/listener
    # metadata inflates PER-JOB overhead — many-job iterative rows measured
    # ~3x their fresh-session cost at end-of-session (curation pipeline
    # 17-22 s here vs 7 s in a clean session, pagerank 6.9 vs 4.7) while
    # single-job rows were unaffected; neither clearCache, JVM GC, nor
    # Python gc recovered it.  The restart isolates operator cost from
    # driver-session age; a production cluster submits each query as its
    # own application, so the fresh-session number is the honest one.
    spark.stop()
    spark = get_spark("bench")
    # Bounded idle-wait before the ext phase (r12, measurement fix —
    # declared in OPTIMIZATION_r12.md): the heavy iterative rows here have
    # measured 2-6x their isolated cost two rounds running purely because
    # the phase starts while the concurrent phase's load is still
    # decaying (phase_loads stamped 3.5-6.4 at ext entry vs the isolated
    # re-attributions).  Waiting OUTSIDE any timed region until load1
    # drops (same gate as process start, bounded) makes ext_warm rows
    # comparable across rounds; ext_idle_waited_sec records the wait.
    ext_waited = 0.0
    while os.getloadavg()[0] >= IDLE_LOAD1 and ext_waited < min(idle_wait, 120.0):
        time.sleep(5)
        ext_waited += 5
    # queries whose DataFrame construction executes the operator (iterative
    # loops with eager checkpoints, k-means/PQ training): warm = rebuild+execute
    eager = {
        "neardup_components_canonical",
        "curation_pipeline_end2end",
        "pagerank_copurchase",
        "knn_pq_rerank",
        "reachable_parts_bfs",
    }
    stamp("ext")
    ext_warm: dict[str, float] = {}
    for name in ext_heavy:
        reset_memory()
        if name in eager:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                suite[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
                reset_memory()
            ext_warm[name] = round(statistics.median(runs), 3)
        else:
            df = suite[name].fn(spark, sf_dir)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            ext_warm[name] = round(statistics.median(runs), 3)

    result = {
        "metric": "query_suite_wall_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "core12_sec": round(sum(times[n] for n in core), 3),
        # r8 (verdict #3): the same number under the name the split makes
        # interpretable — run-once medians only, bootstrap reported apart
        "core12_once_sec": round(sum(times[n] for n in core), 3),
        "bootstrap_sec": bootstrap_sec,
        "core12_warm_sec": round(sum(warm.values()), 3),
        "core12_warm_queries": warm,
        "core12_concurrent_sec": round(statistics.median(conc_runs), 3),
        "core12_concurrent_passes": conc_passes,
        "phase_loads": phase_loads,
        "ext_warm_queries": ext_warm,
        "ext_warm_eager": sorted(eager & set(ext_warm)),
        "n_queries": len(times),
        # [n_sql_executions, shuffle_mb_written, parquet_mb_read] per row,
        # from the 3rd run-once rep — load-invariant plan-shape meters for
        # round-over-round comparison when the walls are contaminated
        "meters": meters,
        "loadavg_start": load_start,
        "loadavg_end": tuple(round(x, 2) for x in os.getloadavg()),
        "idle_start": load_start[0] < IDLE_LOAD1,
        "idle_waited_sec": waited,
        "ext_idle_waited_sec": ext_waited,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
