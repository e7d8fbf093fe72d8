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
  columns waste key bits under min/max scaling (the classic z-order
  caveat); ``bucketing='quantile'`` (r11) replaces ``_bucket16`` with
  equal-population rank buckets from ``approxQuantile`` — the interleave
  itself is unchanged, and the skew win is footer-pinned in
  tests/test_sources.py.
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


_QUANTILE_BUCKETS = 256  # 8 meaningful bits/dim; plenty at file granularity


def _bucket_quantile(col: Column, boundaries: list[float]) -> Column:
    """Rank-bucket a numeric column by PRE-COMPUTED quantile boundaries —
    the public refinement for SKEWED columns (this module's documented
    caveat): min/max scaling gives a Zipf-like column one useful bucket
    (everything piles at the low edge, the huge max stretches the scale),
    so its interleaved bits carry no information and pruning on it dies.
    Equal-POPULATION buckets spend every bit on real data density.

    The bucket index (= count of boundaries <= value) is computed by a
    statically-unrolled balanced comparison tree: ``len(boundaries)``
    ``when`` nodes but only ``log2`` of them on any evaluation path, all
    inside whole-stage codegen — no UDF, no HOF lambda (which would be
    interpreted per element).  NULLs take the all-left path to bucket 0,
    matching ``_bucket16``'s nulls-first contract."""

    def build(lo: int, hi: int) -> Column:
        # invariant: value >= boundaries[:lo], value < boundaries[hi:]
        if lo == hi:
            return F.lit(lo).cast("long")
        mid = (lo + hi) // 2
        return F.when(
            col.cast("double") >= F.lit(float(boundaries[mid])), build(mid + 1, hi)
        ).otherwise(build(lo, mid))

    # scale into the 16-bit interleave domain: padding the low bits with
    # zeros preserves Morton ORDER exactly (comparisons are unaffected),
    # it only coarsens granularity to the quantile grid
    scale = (1 << _BITS) // (len(boundaries) + 1)
    return build(0, len(boundaries)) * F.lit(scale)


def _numeric_form(df: DataFrame, cols: list[str]) -> dict[str, Column]:
    """Date and timestamp columns participate via their numeric day/epoch
    form; everything else as-is."""
    numeric = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt == "date":
            numeric[c] = F.unix_date(F.col(c))
        elif dt.startswith("timestamp"):
            numeric[c] = F.unix_timestamp(F.col(c))
        else:
            numeric[c] = F.col(c)
    return numeric


def zorder_key_for(
    df: DataFrame, cols: list[str], bucketing: str = "uniform"
) -> Column:
    """Build the Morton-key Column for ``cols``.

    ``bucketing='uniform'`` (default): min/max scale per column — one tiny
    bounds agg (2·k scalars of driver metadata).  Exposed (r11) so the key
    math is usable outside the compaction path: the registry row
    ``zorder_key_events`` differential-tests this exact expression
    bit-for-bit against a DuckDB oracle, which is what lets the layout
    tests trust the key.

    ``bucketing='quantile'`` (r11): equal-population rank buckets from
    ``approxQuantile`` (255 cut points per column on the driver — bounded
    metadata, same class as the bounds agg) — the right choice when a
    clustering column is heavily skewed; see ``_bucket_quantile``."""
    if not cols:
        raise ValueError("zorder_key_for needs at least one clustering column")
    if bucketing not in ("uniform", "quantile"):
        raise ValueError(
            f"unknown bucketing {bucketing!r}: use 'uniform' or 'quantile'"
        )
    numeric = _numeric_form(df, cols)
    if bucketing == "quantile":
        proj = df.select(*[numeric[c].cast("double").alias(c) for c in cols])
        probs = [i / _QUANTILE_BUCKETS for i in range(1, _QUANTILE_BUCKETS)]
        cuts = proj.approxQuantile(cols, probs, 0.001)
        buckets = []
        for c, bounds in zip(cols, cuts):
            if not bounds:  # all-NULL column: approxQuantile returns []
                buckets.append(F.lit(0).cast("long"))
                continue
            # dedupe (heavy ties collapse cut points; the tree needs them
            # strictly usable, duplicates just waste comparisons)
            uniq = sorted(set(bounds))
            buckets.append(_bucket_quantile(numeric[c], uniq))
        return zorder_key(buckets)
    row = df.agg(
        *[F.min(numeric[c]).alias(f"__lo_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"__hi_{c}") for c in cols],
    ).first()
    buckets = [
        _bucket16(numeric[c], F.lit(row[f"__lo_{c}"]), F.lit(row[f"__hi_{c}"]))
        for c in cols
    ]
    return zorder_key(buckets)


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_files: int, bucketing: str = "uniform"
) -> DataFrame:
    """Rewrite ``df`` into ``n_files``-way z-ordered layout: each output
    partition (= parquet file on write) covers one compact z-range, so its
    min/max footer stats are tight on EVERY clustering column.  Pass
    ``bucketing='quantile'`` when a clustering column is heavily skewed
    (see ``zorder_key_for``)."""
    keyed = df.withColumn("__z", zorder_key_for(df, cols, bucketing))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
