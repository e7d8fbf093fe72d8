"""Physical-plan audit over the whole query registry.

For each registered query (at $SPARK_GRAFT_SF_DIR, default sf0.01) prints a
one-line summary of scale-relevant plan features:

- BHJ / SMJ / BNLJ / CART : join strategy counts in the plan
- push=Y/n  : a parquet scan carries PushedFilters (only meaningful when the
  query filters base tables)
- batched=Y : the scan is columnar (vectorized parquet reader)
- exch=N    : number of shuffle exchanges
- flags     : suspicious shapes (CartesianProduct, BroadcastNestedLoopJoin
  on non-range joins, single-partition Window)

Usage: python tools/explain_audit.py [name-substring ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def audit_one(name, spec, spark):
    df = spec.fn(spark, SF_DIR)
    # execute once so AQE finalizes the plan (isFinalPlan=true); the audit
    # must read the plan that actually ran, not the pre-AQE guess
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "CART": len(re.findall(r"CartesianProduct", plan)),
    }
    # no closing-bracket anchor: plan text truncates long filter lists at
    # spark.sql.maxMetadataStringLength (raised in main, but stay robust) —
    # requiring the "]" made every long-list scan read as push=- (found via
    # tpch_q6, the pushdown probe itself, r9)
    pushed = "Y" if re.search(r"PushedFilters: \[[^\]]", plan) else "-"
    batched = "Y" if "Batched: true" in plan else "-"
    exch = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))
    flags = []
    if counts["CART"]:
        flags.append("CARTESIAN")
    # structural: a Window whose child exchange is SinglePartition (the
    # coalesce-to-1 global-order window).  A SinglePartition exchange that
    # feeds a 1-row final aggregate elsewhere in the same plan is benign
    # and must not flag (e.g. the funnel roll-up), so require the Exchange
    # to sit directly under the Window through at most Sort/AQE plumbing.
    mid = (
        r"(?:[^\n]*(?:Sort |AQEShuffleRead|ShuffleQueryStage|InputAdapter|"
        r"WholeStageCodegen)[^\n]*\n)*"
    )
    if re.search(r"Window [^\n]*\n" + mid + r"[^\n]*Exchange SinglePartition", plan):
        flags.append("GLOBAL-WINDOW")
    joins = " ".join(f"{k}={v}" for k, v in counts.items() if v)
    print(
        f"{name:32s} push={pushed} batched={batched} exch={exch:2d} {joins:28s} {' '.join(flags)}"
    )
    return plan, flags


def main():
    subs = sys.argv[1:]
    _load_all()
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # default 100-char metadata truncation cuts long PushedFilters lists
    # mid-entry; the audit artifact should carry the full list
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    for name, spec in REGISTRY.items():
        if subs and not any(s in name for s in subs):
            continue
        try:
            audit_one(name, spec, spark)
        except Exception as e:
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
