"""Timing record for the TPC-H classic family at sf0.1 (local[32]).

Not part of bench.py's driver contract (the family is engine-breadth
extras, not reference surface) — this is the committed evidence that the
classic relational suite is fast, not just exact.  Method mirrors
bench.py's warm phase: run-once first (plan compile + first execution),
then the warm number is the median of 3 repeats of the action alone.
The timed action is a noop-sink write, same as bench.py — a bare
``.count()`` would let Catalyst's ColumnPruning drop unused aggregate
expressions and EliminateSorts strip the final sort for aggregate-final
queries (Q1/Q6/Q7/Q8/Q14/Q19), timing less work than the query does
(ADVICE r9); the rows column comes from a separate un-timed count.

Usage: python tools/tpch_bench.py   (SPARK_GRAFT_SF_DIR to override)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    _load_all()
    names = sorted(n for n in REGISTRY if n.startswith("tpch_"))
    spark = get_spark("tpch-bench")
    print(f"TPC-H classic family at {SF_DIR}, load1={os.getloadavg()[0]:.2f}")
    print(f"{'query':36s} {'once_sec':>8} {'warm_sec':>8} {'rows':>6}")
    total_once = total_warm = 0.0
    for n in names:
        fn = REGISTRY[n].fn
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        once = time.perf_counter() - t0
        rows = fn(spark, SF_DIR).count()  # un-timed, for the rows column
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        warm = statistics.median(runs)
        total_once += once
        total_warm += warm
        print(f"{n:36s} {once:>8.3f} {warm:>8.3f} {rows:>6}")
    label = f"TOTAL ({len(names)} queries)"
    print(f"{label:36s} {total_once:>8.3f} {total_warm:>8.3f}")


if __name__ == "__main__":
    main()
