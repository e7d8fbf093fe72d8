"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing excludes session bootstrap (one warm-up action runs first) and
excludes result transfer to the driver: each query executes to completion
via the noop sink, which is what a lake writer would see.

Baseline context (BASELINE.md): the reference's 8 measured PostgreSQL
queries total ~1.27 s at ~500k rows; target is within 2x at sf=0.1
(~600k lineitem rows) for the comparable core suite, reported here as
"core12_sec" alongside the full-registry total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    _load_all()
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")  # local mode: driver IS the executor
    spark = get_spark("bench")
    # warm-up: one full pass at the smallest SF so JIT/codegen compilation is
    # paid before timing — otherwise whichever heavy query happens to run
    # first absorbs several seconds of JVM warm-up and the numbers are
    # ordering-dependent noise
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for spec in REGISTRY.values():
        spec.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    # second pass at sf0.01 for the join-heavy families: at sf0.001 AQE
    # plans broadcast joins everywhere, so the sort-merge/shuffle codegen
    # paths the target SF uses would otherwise compile inside the timed run
    mid_dir = "/root/testdata/sf0.01"
    if os.path.isdir(mid_dir) and mid_dir != sf_dir:
        for name, spec in REGISTRY.items():
            if name.startswith(("neardup", "knn", "string_similarity")):
                spec.fn(spark, mid_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()  # drop warm-up persists before timing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    core = [n for n in times if n.startswith("q")]
    result = {
        "metric": "query_suite_wall_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "core12_sec": round(sum(times[n] for n in core), 3),
        "n_queries": len(times),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
