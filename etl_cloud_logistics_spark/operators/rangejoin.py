"""Interval-overlap join (J10's interval×interval form — the as-of/range
family's missing piece: both sides carry [start, end) ranges and pairs
must OVERLAP, optionally within a partition key).

Spark's optimizer plans a raw ``a.start < b.end AND b.start < a.end``
condition as a nested-loop (cartesian within key) — quadratic per key.
The scale-safe layout is the standard interval-bucketing trick: explode
each interval into the fixed-width buckets it touches, equi-join on
(key, bucket), de-duplicate candidate pairs, then apply the EXACT overlap
predicate.  Candidates are generated only where bucket evidence exists,
so cost follows actual overlap density, not |left|×|right|; bucket width
trades explode factor against candidate precision (width ≈ median
interval length is the usual choice).

Reference anchor: the closest the reference has is point-in-range
(vehicle maintenance windows vs trip dates, implicit in
``scripts/02_queries_analysis.sql``'s date filters); this operator
generalizes the same need to range×range, which the warehouse's SCD2
validity intervals make constant use of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, start: str, end: str, width: int, side: str) -> DataFrame:
    """Explode one interval table into the integer buckets it touches.
    Intervals are half-open [start, end); ``width`` in the column's units
    (days for date columns cast upstream to day numbers)."""
    # floor, not cast-truncate: truncation rounds toward zero, which maps
    # negative range values into the wrong bucket
    lo = F.floor(F.col(start) / width).cast("long")
    hi = F.floor((F.col(end) - 1) / width).cast("long")
    return df.withColumn(f"_bucket_{side}", F.explode(F.sequence(lo, hi)))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket_width: int = 7,
) -> DataFrame:
    """All (left, right) pairs whose half-open ranges overlap, equi-keyed
    on ``on``.  Ranges are numeric (cast dates to day numbers with
    ``F.datediff`` upstream).  Output: every column of both inputs
    (caller aliases collisions).

    Plan shape: explode-to-buckets (narrow, factor ≈ range/width),
    equi-join on (keys, bucket) — never a nested loop — then
    ``dropDuplicates`` on the pair identity and the exact overlap filter.
    The plan-net test (no CartesianProduct over the registry) holds for
    its registry query."""
    ls, le = left_range
    rs, re_ = right_range
    lb = _bucketed(left, ls, le, bucket_width, "l")
    rb = _bucketed(right, rs, re_, bucket_width, "r")
    cond = lb["_bucket_l"] == rb["_bucket_r"]
    for k in on:
        cond = cond & (lb[k] == rb[k])
    joined = lb.join(rb, cond)
    for k in on:
        joined = joined.drop(rb[k])
    exact = joined.filter(
        (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    ).drop("_bucket_l", "_bucket_r")
    return exact.dropDuplicates()
