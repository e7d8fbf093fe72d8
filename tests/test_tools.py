"""Regression tests for the measurement tools the probe records are built
on (tools/shuffle_audit.py) — a biased meter poisons every artifact that
quotes it, so the meter gets its own pins."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from shuffle_audit import _execution_metrics, _parse_bytes  # noqa: E402


def _exec_ids(store) -> set[int]:
    listed = store.executionsList()
    return {listed.apply(i).executionId() for i in range(listed.size())}


def test_execution_metrics_dedups_aqe_plan_versions(spark):
    """r11: ``SQLExecutionUIData.metrics`` carries one SQLPlanMetric entry
    per ADAPTIVE PLAN VERSION (same accumulator ids re-registered on every
    runtime re-plan), so an occurrence-sum overcounts by the plan-update
    count — caught when the triangle probe's 4e6-edge tier read 3989 MB
    against 586 MB of physical shuffle.  Pins: (a) the duplication is
    actually present in the run (non-vacuous), (b) _execution_metrics
    equals the independent unique-accumulator sum, (c) the metric is
    physically plausible — positive and under the occurrence-sum."""
    store = spark._jsparkSession.sharedState().statusStore()
    before = _exec_ids(store)
    a = spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    b = spark.range(100_000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") * 2).alias("w")
    )
    # two shuffles + a join => AQE re-plans at least once per stage wave
    (
        a.groupBy("k")
        .agg(F.sum("v").alias("sv"))
        .join(b.groupBy("k").agg(F.sum("w").alias("sw")), "k")
        .agg(F.sum(F.col("sv") + F.col("sw")))
        .collect()
    )
    ids = _exec_ids(store) - before
    assert ids

    occurrences = 0
    uniq: dict[int, float] = {}
    listed = store.executionsList()
    for i in range(listed.size()):
        e = listed.apply(i)
        if e.executionId() not in ids:
            continue
        vals = store.executionMetrics(e.executionId())
        it = e.metrics().iterator()
        while it.hasNext():
            m = it.next()
            if m.name() != "shuffle bytes written":
                continue
            v = vals.get(m.accumulatorId())
            if not v.isDefined():
                continue
            occurrences += 1
            uniq[m.accumulatorId()] = _parse_bytes(v.get())
    # (a) AQE actually re-registered metrics — otherwise this test would
    # pass vacuously on a build where the duplication doesn't occur
    assert occurrences > len(uniq), (occurrences, len(uniq))
    expected = sum(uniq.values())
    assert expected > 0

    got = _execution_metrics(store, ids).get("shuffle bytes written", 0.0)
    assert got == expected, (got, expected, occurrences, len(uniq))
