"""Bisect the r5 core-12 concurrent regression (1.29 → 1.58 s idle).

Hypothesis (r5 verdict item 4): the heavier rotated suite leaves session
state behind — specifically, ``spark.catalog.clearCache()`` does NOT free
``localCheckpoint`` RDD blocks, which are released only when the
ContextCleaner sees their Python/py4j references die.  The r5 suite runs
the checkpoint-heavy flagships (pagerank ×3 eager rebuilds = 36+
checkpointed RDDs, BFS levels, curation pipeline, components) before the
concurrent phase; their blocks squat in the BlockManager and shrink
execution memory for the 12-way concurrent burst.

Three measured conditions, same session ordering as bench.py:

  A. CLEAN   — warm-up + core-12 warm pass only, then the concurrent
               burst (the r4-shaped session: no heavy rows ran).
  B. POLLUTED — run the heavy eager rows 3× each (bench.py's ext_warm
               protocol) with bench.py's reset_memory (clearCache + JVM
               GC, NO Python gc), then the same burst.
  C. SCRUBBED — same as B, then Python ``gc.collect()`` + JVM GC before
               the burst (releases the py4j refs so ContextCleaner can
               drop checkpoint blocks).

If A ≈ C < B the cause is named (leaked checkpoint/session state) and
the fix is adding gc.collect() to bench.py's reset_memory; if A ≈ B the
pollution theory is wrong and the regression needs another bisect axis.

Run IDLE (load1 < 0.3); prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY_EAGER = [
    "neardup_components_canonical",
    "curation_pipeline_end2end",
    "pagerank_copurchase",
    "reachable_parts_bfs",
]


def main() -> None:
    load_start = tuple(round(x, 2) for x in os.getloadavg())
    _load_all()
    suite = {n: s for n, s in REGISTRY.items() if not s.extra}
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark("concurrent-bisect")

    core = sorted(n for n in suite if n.startswith("q"))
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else SF_DIR
    for n in core:
        suite[n].fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    core_dfs = {n: suite[n].fn(spark, SF_DIR) for n in core}
    # compile + warm the target-SF plans once
    for n in core:
        core_dfs[n].write.mode("overwrite").format("noop").save()

    def reset_memory_bench() -> None:  # bench.py's exact cleanup
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def burst() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=len(core)) as ex:
                list(
                    ex.map(
                        lambda n: core_dfs[n]
                        .write.mode("overwrite")
                        .format("noop")
                        .save(),
                        core,
                    )
                )
            runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs), 3)

    def block_count() -> int:
        """Cached RDD partitions alive in the BlockManager — includes
        localCheckpoint blocks, which clearCache() does NOT touch."""
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return sum(i.numCachedPartitions() for i in infos)

    reset_memory_bench()
    a_blocks = block_count()
    a = burst()

    # pollute: the bench ext_warm protocol for the eager heavy rows
    for name in HEAVY_EAGER:
        if name not in suite:
            continue
        for _ in range(3):
            suite[name].fn(spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            reset_memory_bench()
    reset_memory_bench()
    b_blocks = block_count()
    b = burst()

    # scrub: drop py4j refs, let ContextCleaner reclaim checkpoint blocks
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)  # ContextCleaner is async
    c_blocks = block_count()
    c = burst()

    print(
        json.dumps(
            {
                "clean_sec": a,
                "polluted_sec": b,
                "scrubbed_sec": c,
                "cached_rdd_partitions": {
                    "clean": a_blocks,
                    "polluted": b_blocks,
                    "scrubbed": c_blocks,
                },
                "loadavg_start": load_start,
                "idle_start": load_start[0] < 0.3,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
