"""Property-based checks (SURVEY.md §5): SCD2 invariants under random
update sequences, QA flag/clamp laws.  Few examples with tiny frames —
each example round-trips through Spark, so the budget is small but the
state space (change/no-change/new-key mixes over multiple merges) is the
part unit fixtures can't cover."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_cloud_logistics_spark.operators.quality import qa_flags
from etl_cloud_logistics_spark.operators.scd2 import scd2_apply

KEYS = [1, 2, 3]
DATES = ["2024-01-01", "2024-02-01", "2024-03-01"]

# per merge round: subset of keys staged, each with a value in a small domain
# (collisions with the previous value exercise the "unchanged" path)
round_strategy = st.dictionaries(
    st.sampled_from(KEYS), st.integers(min_value=0, max_value=2), max_size=3
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rounds=st.lists(round_strategy, min_size=1, max_size=3))
def test_scd2_invariants_hold_under_any_update_sequence(spark, rounds):
    dim = (
        spark.createDataFrame([], "k int, v int")
        .withColumn("valid_from", F.lit(None).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    for staged, eff in zip(rounds, DATES):
        if not staged:
            continue
        stg = spark.createDataFrame(list(staged.items()), "k int, v int")
        dim = scd2_apply(dim, stg, keys=["k"], tracked=["v"], effective_date=eff)
    rows = dim.collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        # exactly one open version per key
        assert sum(1 for r in versions if r["is_current"]) == 1
        # open version has no valid_to; closed ones do
        for r in versions:
            assert (r["valid_to"] is None) == bool(r["is_current"])
        # windows are chronologically chained: each closed row's valid_to is
        # the valid_from of exactly one later version
        ordered = sorted(versions, key=lambda r: r["valid_from"])
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
        # consecutive versions always differ in the tracked attribute
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev["v"] != nxt["v"]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_qa_flags_laws(spark, vals):
    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(vals)], "id int, a int, b int")
    out = qa_flags(df, ["a", "b"]).collect()
    for r, (a0, b0) in zip(sorted(out, key=lambda r: r["id"]), vals):
        # clamped to zero, flags reflect the ORIGINAL sign
        assert r["a"] == max(a0, 0) and r["b"] == max(b0, 0)
        assert r["qa_flag_a"] == (a0 < 0) and r["qa_flag_b"] == (b0 < 0)
        # qa_passed iff nothing was flagged
        assert r["qa_passed"] == (not (r["qa_flag_a"] or r["qa_flag_b"]))
