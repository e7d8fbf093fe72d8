"""JDBC extraction source (operator S1's production form, SURVEY.md §2.1).

The reference extracts from PostgreSQL with hand-written SQL whose joins
and filters run server-side (``etl_pipeline.py:230-311``).  The Spark-native
equivalent is ``spark.read.jdbc`` with:

- ``pushDownPredicate`` (default true): Catalyst ships filters into the
  source query, same effect as the reference's WHERE;
- partitioned reads (``partitionColumn``/``lowerBound``/``upperBound``/
  ``numPartitions``): N executors each pull a key range concurrently — the
  scan parallelism the single-connection reference lacks;
- ``fetchsize``: server-side cursor batching (the ``executemany``-batching
  twin on the read side).

No external database server ships in this environment, but the option
plumbing IS executed end-to-end against a live JDBC engine:
``tests/test_sources.py::test_jdbc_live_roundtrip_embedded_derby`` writes
and partition-reads through Apache Derby's embedded driver (bundled with
the pyspark distribution), asserting one range query per partition and
filter pushdown into the JDBC source.  Against Postgres, only ``url`` and
``driver`` change.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession


def build_jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 5000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """The option set for a (possibly partitioned) JDBC scan — pure, so the
    plumbing is testable without a live database."""
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(properties or {})
    return opts


def jdbc_reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured JDBC reader (``.load()`` against a live database).

    ``partition_column`` (+bounds) splits the scan into ``num_partitions``
    concurrent range queries — REQUIRED for any table that doesn't fit one
    connection's throughput; without it Spark reads on a single task.
    """
    return spark.read.format("jdbc").options(**build_jdbc_options(**kwargs))
