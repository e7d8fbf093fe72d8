"""Local mirror of the driver's correctness gate.

Runs every registry query at sf0.01 (override with SPARK_GRAFT_SF_DIR),
runs its DuckDB oracle twin over the same parquet, and compares
row-count + column names/types + order-insensitive values (exact —
stricter than any hash the driver uses).

Usage:  python tools/verify_local.py [name-substring ...] [--json PATH]

``--json PATH`` additionally writes one record per query (name, extra
flag, row counts, schema/values match, seconds) — the committed
per-round artifact (VERIFYLOCAL_r{N}.json) that makes the extras'
verification status auditable the same way the driver surface is.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cloud_logistics_spark.queries import _load_all, REGISTRY  # noqa: E402
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connect() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize temporal/decimal dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (bytes,)):
            pass
        else:
            try:
                import decimal

                if s.dropna().size and isinstance(s.dropna().iloc[0], decimal.Decimal):
                    df[c] = s.astype(float)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = normalize(spark_df.copy()), normalize(duck_df.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_datetime64_any_dtype(av) or pd.api.types.is_datetime64_any_dtype(bv):
            av = pd.to_datetime(av).astype(str)
            bv = pd.to_datetime(bv).astype(str)
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av.to_numpy() == bv.to_numpy()) | both_nan.to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
        else:
            eq = (av.astype(str).to_numpy() == bv.astype(str).to_numpy())
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r} "
                    f"(dtypes {av.dtype}/{bv.dtype})"
                )
    return problems


def main() -> int:
    _load_all()
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    filters = list(args)
    names = [
        n
        for n in REGISTRY
        if not filters or any(f in n for f in filters)
    ]
    spark = get_spark("verify-local")
    con = duck_connect()
    failed = []
    records: dict[str, dict] = {}
    for n in names:
        spec = REGISTRY[n]
        rec = {"extra": spec.extra, "has_oracle": spec.oracle is not None}
        records[n] = rec
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL  {n}: spark raised\n{traceback.format_exc()}")
            rec.update(status="spark_error", err=traceback.format_exc(limit=1))
            failed.append(n)
            continue
        rec["spark_rows"] = len(sdf)
        if spec.oracle is None:
            print(f"ok?   {n}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: {n} returned 0 rows")
            rec.update(status="rows_only", secs=round(time.time() - t0, 2))
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL  {n}: oracle raised\n{traceback.format_exc()}")
            rec.update(status="oracle_error", err=traceback.format_exc(limit=1))
            failed.append(n)
            continue
        problems = compare(n, sdf, ddf)
        rec.update(
            oracle_rows=len(ddf),
            rows_match=len(sdf) == len(ddf),
            schema_match=sorted(sdf.columns) == sorted(ddf.columns),
            values_match=not problems,
            secs=round(time.time() - t0, 2),
        )
        if problems:
            print(f"FAIL  {n}: rows={len(sdf)}")
            for p in problems[:5]:
                print(f"      {p}")
            rec.update(status="mismatch", problems=problems[:5])
            failed.append(n)
        else:
            print(f"PASS  {n}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            rec["status"] = "pass"
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    if json_path is not None:
        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(names),
            "n_passed": len(names) - len(failed),
            "comparison": "rows + column names + order-insensitive EXACT values",
            "queries": records,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
