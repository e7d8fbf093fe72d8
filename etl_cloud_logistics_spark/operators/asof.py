"""As-of join (J10) — the operator Spark lacks natively.

The reference's only temporal lookup is the SCD2 ``BETWEEN VALID_FROM AND
VALID_TO`` key UPDATE (etl_pipeline.py:1144-1158); the general form ("attach
the most recent right-side row at or before each left timestamp") is a core
time-series primitive, so the engine ships it as a first-class operator.

Implementation: the union-and-window trick, not a range join.

    tag left rows 1 / right rows 0 → unionByName → one window per key
    ordered by (ts, tag): ``last(right_struct, ignorenulls)`` carries the
    latest right row forward → keep left rows.

Why this shape at 100 TB: a naive non-equi join (``l.ts >= r.ts``) becomes a
BroadcastNestedLoopJoin or a per-key cartesian; ``merge_asof`` via
``applyInPandas`` serializes every group through Arrow.  The union-window
form is ONE shuffle of (left ∪ right) on the key — linear, skew-handled by
AQE, fully JVM-side.  Right rows sort before left rows at equal timestamps
(tag 0 < 1), so an exactly-simultaneous right row is visible to the left row,
matching DuckDB/pandas ASOF (>=) semantics.  The whole right row travels as
ONE struct, so rows with NULL payload fields never mix across versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_TAG = "__asof_tag"
_TS = "__asof_ts"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach ``payload`` columns of the most recent right
    row with the same ``on`` keys and ``right.right_ts <= left.left_ts``
    (left-join semantics: payload is NULL when no prior right row exists)."""
    lcols = left.columns
    pay_struct = F.struct(*[F.col(p) for p in payload])

    l_sel = left.select(
        *lcols,
        F.lit(1).alias(_TAG),
        F.col(left_ts).alias(_TS),
        F.lit(None).cast(
            "struct<" + ",".join(f"{p}:{right.schema[p].dataType.simpleString()}" for p in payload) + ">"
        ).alias(_PAY),
    )
    r_sel = right.select(
        *[
            F.col(c).alias(c)
            if c in on
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias(_TAG),
        F.col(right_ts).alias(_TS),
        pay_struct.alias(_PAY),
    )
    w = (
        W.partitionBy(*on)
        .orderBy(_TS, _TAG)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = l_sel.unionByName(r_sel).withColumn(
        _PAY, F.last(_PAY, ignorenulls=True).over(w)
    )
    return u.filter(F.col(_TAG) == 1).select(
        *lcols, *[F.col(f"{_PAY}.{p}").alias(f"{prefix}{p}") for p in payload]
    )
