"""Job-count / materialization profile of curation_pipeline_end2end
(r10, VERDICT r9 #5): the suite's most expensive row runs a composed
17-job program whose bench-scale cost is dominated by the per-job
scheduling floor, which is why its band is wide (6.0-13.2 s ext-warm).
This tool attributes the wall to individual SQL executions — each eager
materialization (localCheckpoint, persist-realizing action, convergence
probe, final write) is its own execution — so "which barrier costs what"
is measured, not argued.

Usage: python tools/pipeline_jobs.py   (SPARK_GRAFT_SF_DIR to override;
       prints one row per SQL execution in submission order: #jobs,
       duration, and the execution's description / plan head)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries.curation_ops import (  # noqa: E402
    curation_pipeline_end2end,
)
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("pipeline-jobs")
    store = spark._jsparkSession.sharedState().statusStore()

    def exec_ids() -> set[int]:
        listed = store.executionsList()
        return {listed.apply(i).executionId() for i in range(listed.size())}

    def run_once() -> float:
        t0 = time.perf_counter()
        curation_pipeline_end2end(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    run_once()  # warm: plan compile + shuffle-file reuse out of the picture
    spark.catalog.clearCache()
    before = exec_ids()
    wall = run_once()
    new = sorted(exec_ids() - before)

    listed = store.executionsList()
    rows = []
    total_jobs = 0
    for i in range(listed.size()):
        e = listed.apply(i)
        if e.executionId() not in new:
            continue
        n_jobs = e.jobs().size()
        sub = e.submissionTime()
        comp = e.completionTime()
        dur_ms = (
            comp.get().getTime() - sub if comp.isDefined() else -1
        )
        desc = str(e.description() or "")[:80].replace("\n", " ")
        rows.append((sub, e.executionId(), n_jobs, dur_ms, desc))
        total_jobs += n_jobs
    rows.sort()
    print(
        f"curation_pipeline_end2end at {SF_DIR}: wall {wall:.2f}s, "
        f"{len(rows)} SQL executions, {total_jobs} jobs "
        f"(load1={os.getloadavg()[0]:.2f})"
    )
    print(f"{'exec':>5} {'jobs':>4} {'ms':>7}  description")
    t_first = rows[0][0] if rows else 0
    for sub, eid, n_jobs, dur_ms, desc in rows:
        print(f"{eid:>5} {n_jobs:>4} {dur_ms:>7}  [+{(sub - t_first) / 1000:6.2f}s] {desc}")


if __name__ == "__main__":
    main()
