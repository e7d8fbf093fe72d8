"""Z-order (Morton-curve) file clustering for multi-dimensional data
skipping — the lakehouse layout technique for predicates over MORE THAN
ONE column.

Why it exists (100 TB rationale): parquet scans skip files/row-groups via
min/max statistics.  A single-column sort makes those stats tight for ONE
column and useless for every other; date partitioning (``lake.py``)
handles the time axis but nothing else.  Interleaving the bits of k
normalized column values into one Morton key and range-sorting files by
that key makes every participating column's per-file [min, max] narrow
simultaneously, so a scan with predicates on ANY subset of the z-columns
prunes most files.  This is the same layout contract as Delta Lake's
``OPTIMIZE ZORDER BY`` / the classic UB-tree literature (Bayer 1997),
built here from native Spark expressions only:

- normalization: each column min/max-scales to an integer bucket in
  ``[0, 2^bits)`` (one tiny agg collects 2k scalars — bounded driver
  metadata, like every other model-stats collect in the kit);
- interleave: pure ``shiftleft``/``bitwiseOR`` expression tree
  (``bits × k`` codegen'd integer ops per row, no UDF);
- layout: ``repartitionByRange`` on the key (one exchange) +
  ``sortWithinPartitions`` so each output FILE covers a compact z-range.

The key is layout-only metadata: readers never need it, queries stay
unchanged, only their file-skipping improves.  Cite:
reference scripts/06_aws_setup.py:59-99 stops at date-prefix layout; this
is the extension that keeps non-date predicates cheap at scale.

The bit-interleave math is differential-tested against a DuckDB oracle
(registry row ``zorder_key_events``) and the skipping claim is pinned by
``tests/test_sources.py`` on real parquet footer statistics: the same
rows written z-ordered vs arbitrarily yield the same row set but a far
smaller fraction of candidate files for conjunctive point/range
predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 12  # 4096 buckets/dim; k*bits must stay < 63 (long key)


def _bucketize(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Min/max-scale a numeric column into an integer bucket in
    [0, 2^bits).  FLOOR before the long cast — Spark's double→long cast
    truncates while other engines round, so the floor keeps the math
    engine-portable (the oracle replays it verbatim)."""
    n_buckets = float(2**bits)
    if mx <= mn:  # constant column: every row in bucket 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
    return F.least(
        F.floor(scaled * F.lit(n_buckets)).cast("long"),
        F.lit(2**bits - 1).cast("long"),
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: output bit (i*k + j) = bit i of column j.  A
    flat shiftleft/bitwiseOR tree — bits×k integer ops, all inside
    whole-stage codegen."""
    k = len(buckets)
    assert k * bits < 63, f"{k} cols × {bits} bits overflows a signed long"
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> tuple[Column, dict[str, tuple[float, float]]]:
    """Build the Morton-key Column for ``cols`` over ``df``'s value ranges.

    Returns ``(key_column, ranges)`` — the ranges are the collected
    min/max per column (2k scalars; the only driver-side data), exposed so
    callers can persist them next to the table for stable incremental
    re-clustering."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).first()
    ranges = {c: (row[2 * i], row[2 * i + 1]) for i, c in enumerate(cols)}
    for c, (mn, mx) in ranges.items():
        if mn is None or mx is None:
            raise ValueError(f"zorder column {c} is all-NULL; cannot scale")
    buckets = [
        _bucketize(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    return _interleave(buckets, bits), ranges


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> dict[str, tuple[float, float]]:
    """Write ``df`` as ``n_files`` z-clustered parquet files.

    One range exchange on the Morton key + an in-partition sort; the key
    column itself is dropped before the write (layout-only).  Returns the
    per-column ranges used, for the caller's clustering metadata.

    Scale notes: ``n_files`` plays the role ``maxRecordsPerFile`` plays in
    the date lake — size it so files land near the 128 MB-1 GB sweet spot
    at the target scale.  On a real cluster the range exchange is the
    only data movement, identical in shape to any global sort."""
    key, ranges = zorder_key(df, cols, bits)
    writer = (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
    )
    if options:  # e.g. parquet.block.size to tune the row-group grain
        writer = writer.options(**options)
    writer.parquet(path)
    return ranges
