"""Multi-dimensional clustering (Z-order) for the lake layout.

The reference gets multi-predicate locality for free from warehouse
services — Snowflake micro-partitions with per-partition min/max pruning
(``scripts/04_dimensional_model.sql:162-168``) and clustered index layouts
(``scripts/03_optimization_indexes.sql:15-16``).  A parquet lake gets the
same read-side effect only if the writer CLUSTERS rows so each file covers
a small region of the predicate space; a linear sort gives perfect
locality on the leading column and none on the rest.  Z-ordering (the
public Delta Lake OPTIMIZE ZORDER design) interleaves the bits of the
clustering columns so a contiguous key range maps to a compact
hyper-rectangle — every clustered column prunes, not just the first.

How it composes here:
- ``zorder_key`` builds the interleaved key as a static chain of
  shift/or expressions — whole-stage-codegen arithmetic, no UDF;
- ``cluster_by_zorder`` range-partitions on that key and sorts within
  partitions, so each output parquet file covers one compact z-range;
- ``SnapshotTable.compact(cluster_by=...)`` rewrites a table through it,
  records per-FILE min/max stats in the manifest, and ``read_pruned``
  then skips at file granularity on ANY of the clustered columns.

Scale notes (100 TB):
- the key is pure column arithmetic: clustering cost is one range
  shuffle + local sort, the same shape as any repartition — no driver
  involvement beyond the tiny bounds agg;
- bounds are per-column global min/max (one agg job).  Heavily skewed
  columns waste key bits (the classic z-order caveat); the public
  refinement is quantile-based rank bucketing, which drops in here by
  replacing ``_bucket16`` — the interleave itself is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16
_MAX = (1 << _BITS) - 1


def _bucket16(col: Column, lo: Column, hi: Column) -> Column:
    """Normalize a numeric column into a 16-bit bucket [0, 65535] given its
    global bounds.  NULLs and a constant column land in bucket 0 (nulls
    cluster together at the low edge, same as a nulls-first sort)."""
    span = hi.cast("double") - lo.cast("double")
    scaled = F.floor(
        (col.cast("double") - lo.cast("double")) / span * F.lit(float(_MAX))
    )
    bucket = F.when(span > 0, F.least(F.lit(_MAX), F.greatest(F.lit(0), scaled))).otherwise(
        F.lit(0)
    )
    return F.coalesce(bucket, F.lit(0)).cast("long")


def zorder_key(buckets: list[Column]) -> Column:
    """Morton interleave of 16-bit buckets into one long: bit ``b`` of
    column ``j`` lands at position ``b * n_cols + j``.  Statically unrolled
    (16 × n_cols shift/or terms) so it runs inside whole-stage codegen."""
    n = len(buckets)
    out = F.lit(0).cast("long")
    for b in range(_BITS):
        for j, col in enumerate(buckets):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + j))
    return out


def zorder_key_for(df: DataFrame, cols: list[str]) -> Column:
    """Build the Morton-key Column for ``cols`` over ``df``'s observed
    value ranges (one tiny bounds agg — 2·k scalars of driver metadata).
    Exposed (r11) so the key math is usable outside the compaction path:
    the registry row ``zorder_key_events`` differential-tests this exact
    expression bit-for-bit against a DuckDB oracle, which is what lets the
    layout tests trust the key.  Date and timestamp columns participate
    via their numeric day/epoch form."""
    if not cols:
        raise ValueError("zorder_key_for needs at least one clustering column")
    numeric = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt == "date":
            numeric[c] = F.unix_date(F.col(c))
        elif dt.startswith("timestamp"):
            numeric[c] = F.unix_timestamp(F.col(c))
        else:
            numeric[c] = F.col(c)
    row = df.agg(
        *[F.min(numeric[c]).alias(f"__lo_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"__hi_{c}") for c in cols],
    ).first()
    buckets = [
        _bucket16(numeric[c], F.lit(row[f"__lo_{c}"]), F.lit(row[f"__hi_{c}"]))
        for c in cols
    ]
    return zorder_key(buckets)


def cluster_by_zorder(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Rewrite ``df`` into ``n_files``-way z-ordered layout: each output
    partition (= parquet file on write) covers one compact z-range, so its
    min/max footer stats are tight on EVERY clustering column."""
    keyed = df.withColumn("__z", zorder_key_for(df, cols))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
