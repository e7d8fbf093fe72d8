"""Skew-mitigation operators for hot keys (100 TB design; SURVEY.md §4).

AQE's skew-join splitting handles most sort-merge-join skew at runtime, but
two shapes still need explicit salting on a big cluster:

- **hot-key aggregation**: one key holding 1% of a 100 TB fact lands ~1 TB
  on a single reducer.  ``salted_agg`` spreads the partial aggregation over
  ``n_salts`` reducers and re-combines — valid for algebraic aggregates
  (sum/count/min/max), which re-aggregate losslessly.
- **hot-key join against a non-broadcastable side**: ``replicated_skew_join``
  splits the probe side into hot/cold on a known hot-key list, replicates
  only the hot keys' build rows across ``n_salts`` salted copies, and unions
  the two join results.  The cold path is untouched; the hot path's shuffle
  key becomes (key, salt) — fan-out bounded by n_salts × |hot build rows|.

Both are deterministic: the salt is ``pmod(hash(unique-ish cols), n)`` — no
``rand()`` — so reruns produce identical plans and results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic near-uniform salt from the row's full column set."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count: bool = True,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys ⊕ salt) → keys, for algebraic
    aggregates.  Phase 1 runs on n_salts× more reducers, so no single
    reducer sees a whole hot key; phase 2 combines n_salts tiny rows/key."""
    sum_cols = sum_cols or []
    stage1 = (
        df.withColumn(_SALT, _salt_col(df, n_salts))
        .groupBy(*group_cols, _SALT)
        .agg(
            F.count("*").alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    aggs = []
    if count:
        aggs.append(F.sum("__cnt").alias("n_rows"))
    aggs += [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    return stage1.groupBy(*group_cols).agg(*aggs)


def replicated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with explicit hot-key replication.

    ``probe``: the big (skewed) side.  ``build``: the other side (too big to
    broadcast whole, small per key).  ``hot_keys``: the keys known to be hot
    — in production discovered by a cheap pre-agg (``probe.groupBy(key)
    .count()`` top-N) or from table stats.

    Only ``inner`` and ``left`` (probe-outer) joins are valid: the build side
    is replicated across all salts, so a build row unmatched within one salt
    bucket would be emitted once PER SALT under ``right``/``full`` — n_salts
    duplicate unmatched rows.  Guarded here rather than silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"replicated_skew_join supports how='inner'|'left', got {how!r}: "
            "the salted build side would duplicate unmatched build rows "
            "n_salts times under right/full outer joins"
        )
    hot = F.col(key).isin(hot_keys)

    cold = probe.filter(~hot).join(build.filter(~hot), key, how)

    probe_hot = probe.filter(hot).withColumn(_SALT, _salt_col(probe, n_salts))
    build_hot = (
        build.filter(hot)
        .withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    )
    hot_joined = probe_hot.join(build_hot, [key, _SALT], how).drop(_SALT)

    return cold.unionByName(hot_joined)
