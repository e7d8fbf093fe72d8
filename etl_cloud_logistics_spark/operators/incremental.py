"""Incremental aggregate maintenance — delta refresh of materialized
report tables.

The reference refreshes its report tables by full rebuild every pipeline
run (``/root/reference/scripts/05_etl_pipeline/etl_pipeline.py:1100-1132``
re-aggregates the whole fact table into REPORT_DRIVER_TOTALS /
REPORT_ROUTE_TOTALS).  At 100 TB a daily full re-aggregation re-reads the
entire history to fold in one day of new facts; incremental view
maintenance folds ONLY the delta into the previous aggregate state —
cost O(|delta| + |groups|), independent of history size.

The algebra: a measure is maintainable when its aggregate is a
commutative monoid over mergeable partials —

    count  ->  long partials,             merged with SUM
    sum    ->  DECIMAL(38,6) partials,    merged with SUM (decimal
               addition is associative AND exact, so incremental ==
               full-rebuild bit-for-bit; a double sum would drift with
               merge order)
    min/max -> native partials,           merged with MIN / MAX

AVG and other ratios are NOT maintained directly (they don't merge);
they derive from sum/count at publish time — the same split Spark's own
partial aggregation performs inside one job, lifted across jobs.

Retractions (late deletes/updates of old facts) are out of scope here,
as they are for the reference's insert-only fact feed; the state table
is rebuilt for those (or the deltas carry compensating negative rows,
which the same monoid merge absorbs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"

_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class AggSpec:
    """A maintainable aggregate: grouping keys + (name, source, kind)
    measures with kind in count|sum|min|max, plus publish-time derived
    columns as (name, fn(state) -> Column)."""

    keys: list[str]
    measures: list[tuple[str, str, str]]
    derived: list[tuple[str, object]] = field(default_factory=list)

    def __post_init__(self) -> None:
        bad = [k for _, _, k in self.measures if k not in _MERGE]
        if bad:
            raise ValueError(f"unmergeable measure kinds: {bad}")


def partial_agg(delta: DataFrame, spec: AggSpec) -> DataFrame:
    """Aggregate a delta into mergeable partial state (one row per key)."""
    aggs = []
    for name, src, kind in spec.measures:
        if kind == "count":
            aggs.append(F.count(src).alias(name))
        elif kind == "sum":
            aggs.append(F.sum(F.col(src).cast(_DEC)).alias(name))
        else:
            aggs.append(_MERGE[kind](src).alias(name))
    return delta.groupBy(*spec.keys).agg(*aggs)


def refresh(prev: DataFrame | None, delta: DataFrame, spec: AggSpec) -> DataFrame:
    """Fold ``delta`` (raw fact rows) into the previous aggregate state.

    ``prev`` is the state produced by an earlier ``refresh`` (or None for
    the first build).  The merge re-aggregates the union of prior state
    and new partials — a shuffle keyed on the group keys whose input is
    |groups| + |delta partials| rows, never the fact history."""
    part = partial_agg(delta, spec)
    if prev is None:
        return part
    merged = prev.unionByName(part).groupBy(*spec.keys).agg(
        *[_MERGE["sum" if k == "count" else k](n).alias(n)
          for n, _, k in spec.measures]
    )
    return merged


def publish(state: DataFrame, spec: AggSpec) -> DataFrame:
    """Apply publish-time derived columns (ratios, roundings) to the
    mergeable state — the only place a decimal sum becomes a double."""
    out = state
    for name, fn in spec.derived:
        col = fn(out)
        assert isinstance(col, Column)
        out = out.withColumn(name, col)
    return out


def foreach_batch_refresh(table, spec: AggSpec):
    """``writeStream.foreachBatch`` adapter: maintain the aggregate state
    in a versioned ``SnapshotTable`` — each micro-batch folds into the
    prior version and commits the new state (ST5's additive-state twin of
    ``snapshots.foreach_batch_merge``).  Replay of an already-folded batch
    after a checkpoint restart would double-count, so the batch id is
    recorded in the commit and re-application of the same id is skipped
    (the standard idempotent-sink contract)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = table.latest_version()
        prev = None
        if latest is not None:
            manifest = table._read_manifest(latest)
            if manifest.get("batch_id") == batch_id:
                return  # replayed batch: already folded into this state
            prev = table.read(spark, version=latest)
        new_state = refresh(prev, batch_df, spec)
        parent = latest
        version = 0 if parent is None else parent + 1
        rel = table._write_data(new_state, version, "agg-refresh")
        table._commit(version, {
            "version": version,
            "parent": parent,
            "operation": "agg-refresh",
            "batch_id": batch_id,
            "files": [rel],
            "stats": {},
        })

    return sink
