"""Local mirror of the driver's correctness gate.

Runs every registry query at sf0.01 (override with SPARK_GRAFT_SF_DIR),
runs its DuckDB oracle twin over the same parquet, and compares
row-count + column names/types + order-insensitive values, PLUS a
TYPE-SENSITIVE canonical hash (r7).  The hash matters: value-exact
comparison is type-coercing (int64 170 == float64 170.0) but the
driver's hash is not — DuckDB HUGEINT outputs land in pandas as
float64 while Spark longs are int64, which is exactly how
`temperature_mixture_sources` / `pagerank_copurchase` were locally
"exact" yet driver-red for three rounds.  A query only counts as green
here when values match AND the typed hashes agree.

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


def _typed_cell(v, int_tag: str = "i") -> str:
    """Render one value with a type tag, so int64 170 != float64 170.0.

    ``int_tag`` carries the COLUMN's integer width ("i32"/"i64", from the
    pandas dtype) — r8 ADVICE fix: a bare "i:" tag collapsed all integer
    widths, so a DuckDB INTEGER (int32) vs Spark BIGINT (int64) drift
    hashed green locally while a width-sensitive driver hash could still
    flag it.  Cells inside object-dtype columns (lists, mixed) keep the
    width-less tag, symmetrically on both sides."""
    import datetime
    import decimal

    if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"{int_tag}:{int(v)}"
    if isinstance(v, (float, np.floating)):
        # -0.0 == 0.0 in every engine's comparison semantics but reprs
        # differ; canonicalize so a sign-of-zero split between engines
        # (legal under IEEE for e.g. rounding of negative tiny values)
        # doesn't raise a false type-drift alarm
        return f"f:{float(v) + 0.0!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return f"t:{pd.Timestamp(v).tz_localize(None) if getattr(v, 'tzinfo', None) else pd.Timestamp(v)}"
    if isinstance(v, datetime.date):
        # Spark DATE → datetime.date objects; DuckDB DATE → datetime64 at
        # midnight — the DATE identity is GONE from the pandas frame on the
        # DuckDB side, so a cell tag cannot distinguish DATE from midnight
        # TIMESTAMP symmetrically; unify to the timestamp rendering.  The
        # DATE/TIMESTAMP drift this could hide is instead caught at the
        # SOURCE level: main() compares Spark's schema temporal kinds
        # against DuckDB's declared result types for every oracle (r9,
        # VERDICT r8 #7) — stricter than any pandas-level hash could be.
        return f"t:{pd.Timestamp(v)}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, (list, np.ndarray)):
        return "l:[" + ",".join(_typed_cell(x) for x in v) + "]"
    return f"s:{v}"


def _esc(cell: str) -> str:
    """Escape the join separators inside one rendered cell (r8 ADVICE fix):
    unescaped '|' or '\\n' inside string contents could make two genuinely
    different frames render to the same joined byte stream (false PASS)."""
    return cell.replace("\\", "\\\\").replace("|", "\\p").replace("\n", "\\n")


def typed_hash(df: pd.DataFrame) -> str:
    """Order-insensitive, TYPE-SENSITIVE digest of a result frame —
    the local stand-in for the driver's value hash.  Columns sort by
    name, every cell carries a type tag (integer cells a WIDTH-bearing
    one derived from the column dtype, e.g. ``i32:``/``i64:``), cell
    renders are separator-escaped, rows sort as rendered tuples."""
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1)
    tags = [
        f"{df[c].dtype.kind}{df[c].dtype.itemsize * 8}"
        if df[c].dtype.kind in "iu"
        else "i"
        for c in df.columns
    ]
    rows = sorted(
        "|".join(_esc(_typed_cell(v, t)) for v, t in zip(row, tags))
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    h.update(",".join(df.columns).encode())
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def temporal_kind_spark(dt) -> str | None:
    """'DATE' / 'TS' / None for a Spark data type — the logical temporal
    kind the pandas conversion erases on the DuckDB side."""
    from pyspark.sql import types as T  # noqa: PLC0415

    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TS"
    return None


def temporal_kind_duck(type_name: str) -> str | None:
    tn = str(type_name).upper()
    return "DATE" if tn == "DATE" else ("TS" if "TIME" in tn else None)


def temporal_mismatches(spark_schema, duck_description) -> list[str]:
    """DATE-vs-TIMESTAMP cross-typings between the Spark result schema and
    DuckDB's declared result types (r9, VERDICT r8 #7).  Both engines'
    pandas frames render a DATE and a midnight TIMESTAMP identically, so
    neither exact-value comparison nor any pandas-level hash can see this
    drift — it must be checked where the type still exists: Spark's
    analyzed schema vs the oracle cursor's description."""
    duck_kinds = {col[0]: temporal_kind_duck(col[1]) for col in duck_description}
    out = []
    for f in spark_schema.fields:
        sk = temporal_kind_spark(f.dataType)
        dk = duck_kinds.get(f.name)
        if (sk or dk) and sk != dk:
            out.append(
                f"temporal kind drift on col {f.name}: spark={sk or f.dataType.simpleString()} "
                f"duck={dk or 'non-temporal'}"
            )
    return out


def numeric_kind_spark(dt) -> str | None:
    """'F32' / 'F64' / 'DEC(p,s)' / None for a Spark data type — the
    non-integer numeric kinds the pandas conversion erases (ints keep
    their width through the typed hash's i32/i64 tags; floats and
    decimals all land as float64/object)."""
    from pyspark.sql import types as T  # noqa: PLC0415

    if isinstance(dt, T.FloatType):
        return "F32"
    if isinstance(dt, T.DoubleType):
        return "F64"
    if isinstance(dt, T.DecimalType):
        return f"DEC({dt.precision},{dt.scale})"
    return None


def numeric_kind_duck(type_name: str) -> str | None:
    tn = str(type_name).upper()
    if tn in ("FLOAT", "REAL"):
        return "F32"
    if tn == "DOUBLE":
        return "F64"
    if tn.startswith("DECIMAL"):
        return tn.replace("DECIMAL", "DEC").replace(" ", "")
    return None


def duck_described_types(con, oracle_sql: str) -> dict[str, str]:
    """name -> declared type string via DuckDB's DESCRIBE (binds and plans
    without executing).  The DBAPI cursor description collapses every
    numeric kind to 'NUMBER', so the numeric check needs this source; the
    temporal check keeps using the cursor description (Date/DATETIME are
    distinguishable there) so it also guards rows where DESCRIBE fails."""
    rows = con.execute(f"DESCRIBE ({oracle_sql.rstrip().rstrip(';')})").fetchall()
    return {r[0]: r[1] for r in rows}


def kind_mismatches(spark_schema, duck_description, duck_types=None) -> list[str]:
    """Source-level type-kind drift between Spark's analyzed schema and
    DuckDB's declared types: temporal (DATE vs TIMESTAMP, r9 — off the
    cursor description) plus numeric (DECIMAL precision/scale and
    FLOAT-vs-DOUBLE, r10 — VERDICT r9 #7 — off ``duck_types``, a
    DESCRIBE-derived name->type map, since the cursor description erases
    numeric kinds entirely).  A Spark DECIMAL(38,6) against an oracle
    DOUBLE renders identically in both pandas frames for every value that
    fits a double, so the exact compare and the typed hash are blind to
    it; the drift only exists where the types still do."""
    out = temporal_mismatches(spark_schema, duck_description)
    if duck_types is None:
        return out
    duck_kinds = {name: numeric_kind_duck(tn) for name, tn in duck_types.items()}
    for f in spark_schema.fields:
        sk = numeric_kind_spark(f.dataType)
        dk = duck_kinds.get(f.name)
        if (sk or dk) and sk != dk:
            out.append(
                f"numeric kind drift on col {f.name}: "
                f"spark={sk or f.dataType.simpleString()} duck={dk or 'non-float/decimal'}"
            )
    return out


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
            frame = spec.fn(spark, SF_DIR)
            sdf = frame.toPandas()
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
            cur = con.execute(spec.oracle)
            duck_desc = cur.description
            ddf = cur.df()
        except Exception:
            print(f"FAIL  {n}: oracle raised\n{traceback.format_exc()}")
            rec.update(status="oracle_error", err=traceback.format_exc(limit=1))
            failed.append(n)
            continue
        try:
            duck_types = duck_described_types(con, spec.oracle)
        except Exception:
            duck_types = None  # DESCRIBE can fail on exotic forms; the
            # cursor-description temporal check below still applies
        problems = kind_mismatches(frame.schema, duck_desc, duck_types)
        # r11 (ADVICE r10): this gate covers BOTH temporal and numeric
        # source-kind drift since r10 — record it under a name that says so
        rec["type_kinds_match"] = not problems
        problems += compare(n, sdf, ddf)
        hash_match = (
            sorted(sdf.columns) == sorted(ddf.columns)
            and typed_hash(sdf) == typed_hash(ddf)
        )
        rec.update(
            oracle_rows=len(ddf),
            rows_match=len(sdf) == len(ddf),
            schema_match=sorted(sdf.columns) == sorted(ddf.columns),
            values_match=not problems,
            hash_match=hash_match,
            secs=round(time.time() - t0, 2),
        )
        if problems or not hash_match:
            print(f"FAIL  {n}: rows={len(sdf)}")
            for p in problems[:5]:
                print(f"      {p}")
            if not problems:
                # values coerce equal but the TYPED hash differs — the
                # exact failure mode the driver sees on HUGEINT/double
                # output edges; show the per-column dtypes to localize it
                print(
                    "      typed-hash mismatch (type drift, values equal): "
                    f"spark dtypes={dict(sdf.dtypes.astype(str))} "
                    f"duck dtypes={dict(ddf.dtypes.astype(str))}"
                )
            rec.update(
                status="mismatch" if problems else "hash_mismatch",
                problems=problems[:5],
            )
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
            "comparison": (
                "rows + column names + order-insensitive EXACT values "
                "+ type-sensitive canonical hash"
            ),
            "queries": records,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
