"""Capture `.explain("formatted")` output for driver-surface queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan evidence.

For every non-extra registry query (or the names given as args):
- run the query once to the noop sink so AQE finalizes its plan;
- write the FORMATTED explain (the pre-execution plan with operator
  details, PushedFilters, ReadSchema) followed by the AQE-final executed
  plan string (the plan that actually ran) to one file per query.

Eager rows (iterative loops) execute during DataFrame construction; their
formatted plan is the final materialized frame's scan plus the tail
operators, which is exactly what their file says.

Usage: python tools/plan_capture.py --tag r11 --suffix before [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    _load_all()
    names = args.names or [n for n, s in REGISTRY.items() if not s.extra]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    # raise the metadata string cap so PushedFilters lists don't truncate
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, SF_DIR)
        formatted = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        df.write.mode("overwrite").format("noop").save()
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {SF_DIR} — explain('formatted') ==\n")
            f.write(formatted)
            f.write("\n== AQE-final executed plan (after one noop run) ==\n")
            f.write(executed)
            f.write("\n")
        print(f"wrote {path}")
        spark.catalog.clearCache()
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
