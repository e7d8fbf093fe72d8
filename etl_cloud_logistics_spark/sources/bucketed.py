"""Bucketed table layout — shuffle-free co-located joins (SURVEY.md §4;
100 TB design).

The reference pre-computes join locality with covering indexes
(``scripts/03_optimization_indexes.sql``); the Spark-native equivalent for
fact⋈fact joins too big to broadcast is bucketing: both tables are written
pre-hashed into the same number of buckets on the join key, so the join
reads bucket i against bucket i — NO shuffle exchange at query time, the
single biggest cost in a repeated 100 TB join.

Cost model: bucketing pays one shuffle at WRITE time and amortizes it over
every subsequent join/aggregation on that key.  Rules of thumb encoded here:
- bucket count ≈ table size / target partition size (128-256 MB), and both
  sides of a co-located join MUST use the same count;
- ``sortBy`` the bucket key so the join degenerates to a streaming merge
  within each bucket pair;
- aggregations on the bucket key also skip their exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet).  Requires a
    session with a warehouse dir (any SparkSession has one; tables land in
    ``spark.sql.warehouse.dir``)."""
    keys = [bucket_key] if isinstance(bucket_key, str) else bucket_key
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key.  With matching
    bucket counts Catalyst plans a SortMergeJoin with ZERO Exchange
    operators — verify with ``.explain()`` / tests."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
