"""Lake maintenance: small-file compaction and sort-ordered layout.

Two operations every parquet lake needs at 100 TB:

- **Compaction**: streaming/incremental writers leave many small files; a
  1000-executor scan of 10^6 tiny files spends its time in listing and
  footer reads.  ``compact_partition`` rewrites ONE partition directory to
  a target file count — bounded work, safe to run per-day behind the
  ingest.
- **Sort-ordered layout**: parquet rowgroup min/max statistics only prune
  when values are clustered.  ``write_sorted_lake`` sorts within partitions
  by the hot filter columns before writing (the poor-man's Z-order for a
  single sort dimension), so point/range predicates skip most rowgroups.
  The effect is verifiable in the file footers: per-file min/max ranges
  become (nearly) disjoint — tested with pyarrow metadata.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_partition(
    spark: SparkSession,
    lake_path: str,
    partition_col: str,
    partition_val: str,
    target_files: int = 1,
) -> int:
    """Rewrite one Hive-style partition directory to ``target_files`` files.
    Returns the row count.  Atomic per partition: write to a sibling temp
    dir, then swap — readers see the old or the new layout, never a mix."""
    part_dir = os.path.join(lake_path, f"{partition_col}={partition_val}")
    df = spark.read.parquet(part_dir)
    n = df.count()
    tmp = part_dir + "._compact"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = part_dir + "._old"
    os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n


def write_sorted_lake(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write range-partitioned-and-sorted by ``sort_cols``: repartitionByRange
    gives each output file a disjoint key range, and the within-partition
    sort clusters values inside each rowgroup — so min/max pruning on the
    sort key skips whole files/rowgroups at scan time."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
