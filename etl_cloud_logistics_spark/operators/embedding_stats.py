"""Distributed second-moment statistics and PCA over embedding columns
(north-star extension X3/X5 support: whitening / dimensionality reduction
before ANN indexing or SemDeDup-style semantic pruning).

Two computation shapes for the same covariance matrix, by design:

- ``covariance_long`` — the *exactness* shape: posexplode the vector once,
  self-join per row id for ordered dim pairs, decimal-exact sums per
  (i, j) group.  Every emitted double derives from order-independent
  DECIMAL accumulations via one fixed arithmetic expression, so a SQL
  oracle with the identical casts reproduces it bit-for-bit.  Cost is
  O(rows × dim²) join output — fine for a differential test corpus,
  wrong at 100 TB.
- ``gram_partials`` / ``moments_from_partials`` — the *scale* shape: one
  Arrow ``mapInPandas`` pass emits a single (count, Σx, XᵀX) partial per
  input partition (constant-size state: dim² + dim + 1 doubles, never
  proportional to row count), and the ≤ num_partitions partial rows are
  merged into the final moments.  This is the classic treeAggregate shape;
  the merged result is float-associative so it agrees with the exact path
  to ~1e-9 relative, which the tests pin.

PCA itself (``pca_model``) eigendecomposes the dim×dim covariance on the
driver — like the IVF centroids and SQ8 bounds, the model is bounded
metadata (64×64 here), never data-proportional.  Sign indeterminacy of
eigenvectors is resolved deterministically: the largest-|value| entry of
each component (first index on ties) is made positive, so two runs — or
two clusters — produce identical components.  Projection
(``pca_project``) broadcasts the components as literals and builds one
statically-unrolled codegen expression per output score; no Python
executes per row.

Reference parity: the reference has no PCA (its analytics stop at SQL
aggregates), so this module is engine-breadth for the LLM-data pipeline
mandate; the covariance algebra mirrors its z-score QA gate
(scripts/05_etl_pipeline/etl_pipeline.py quality stats) generalized from
variance to cross-moments.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Same decimal policy as operators.similarity: float32 values are exact in
# double; a float32×float32 product is exact in double; casting each product
# to a wide DECIMAL makes the sum order-independent.
_DEC = "decimal(38,12)"


# 2^43: any float32 with |x| ≥ 2^-20 is m·2^-q with q ≤ 43 (20 exponent + 23
# mantissa bits), so x·2^43 is an integer that the double computes EXACTLY —
# the decimal(38,0) cast of it never rounds, in any engine.
_POW2_43 = 8796093022208.0


def covariance_long(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Population covariance matrix in long form — one row per ordered dim
    pair (i ≤ j, 1-based to match SQL array indexing):
    ``cov = (Σ xᵢxⱼ − Σxᵢ · Σxⱼ / n) / n``.

    Cross-engine exactness needs care on TWO fronts, not one:

    - The product sums Σxᵢxⱼ use the per-term DECIMAL(38,12) cast (the
      _COS_TERMS pattern): order-independent, and a rounding tie would
      need the product's 20+-digit dyadic expansion to terminate at
      exactly 13 digits — not reachable from this corpus's values.
    - The RAW sums Σxᵢ must NOT use that cast.  Raw float32 values are
      often short dyadics, and a 13-digit one sits exactly on the
      DECIMAL(38,12) rounding boundary where Spark (HALF_UP) and DuckDB
      (HALF_EVEN) legally disagree — found in this corpus: dim 38 holds
      x = 0.1983642578125 = 1625·2⁻¹³, Spark …813 vs DuckDB …812, a
      1e-12 decimal split that surfaced as 64 mismatched covariances.
      Fix: sum round(x·2^43) as DECIMAL(38,0) integers — exact for every
      |x| ≥ 2⁻²⁰ (data min here 1.3e-6), no rounding ever happens, and
      the scaled sum stays below 2^53 (|Σx| ≤ ~16 per dim → ~1.4e14) so
      the single decimal→double conversion is exact too (DuckDB's
      int128→double is NOT correctly rounded above 2^53 — measured).

    The final expression then runs in one fixed double-arithmetic order on
    bit-identical inputs.  Exactness shape only: the self-join emits
    rows × dim·(dim+1)/2 pairs — use ``gram_partials`` at scale.
    """
    e = (
        emb.select(id_col, F.posexplode(vec_col).alias("pos", "x"))
        .withColumn("i", F.col("pos") + F.lit(1))
        .withColumn("x", F.col("x").cast("double"))
        .drop("pos")
    )
    a = e.select(F.col(id_col).alias("rid_a"), F.col("i"), F.col("x").alias("xi"))
    b = e.select(F.col(id_col).alias("rid_b"), F.col("i").alias("j"), F.col("x").alias("xj"))
    pairs = a.join(
        b, on=[F.col("rid_a") == F.col("rid_b"), F.col("i") <= F.col("j")]
    ).select("i", "j", "xi", "xj")
    # cast BEFORE the sum: the per-term cast is what makes the accumulation
    # order-independent (a double-sum-then-cast would not be); raw values
    # go through the exact 2^43 integer scaling (docstring)
    agg = pairs.groupBy("i", "j").agg(
        F.sum((F.col("xi") * F.col("xj")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("xi") * F.lit(_POW2_43)).cast("decimal(38,0)")).alias("sxi"),
        F.sum((F.col("xj") * F.lit(_POW2_43)).cast("decimal(38,0)")).alias("syi"),
        F.count(F.lit(1)).alias("n"),
    )
    # fixed evaluation order: (sxy_d - (sxi/2^43) * (syi/2^43) / n) / n,
    # every double either exact or identically rounded on both engines
    sx = F.col("sxi").cast("double") / F.lit(_POW2_43)
    sy = F.col("syi").cast("double") / F.lit(_POW2_43)
    cov = (F.col("sxy").cast("double") - sx * sy / F.col("n")) / F.col("n")
    return agg.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        cov.alias("cov"),
    )


def gram_partials(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One constant-size moment partial per input partition: (count, Σx,
    flattened upper-triangular XᵀX).  The Arrow batch loop is numpy
    matrix work; per-partition state is dim²+dim+1 doubles regardless of
    row count, so 100 TB in produces num_partitions rows out."""
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sx", T.ArrayType(T.DoubleType())),
            T.StructField("gram", T.ArrayType(T.DoubleType())),
        ]
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = 0
        sx = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[pdf.columns[0]]]
            )
            n += x.shape[0]
            sx += x.sum(axis=0)
            g += x.T @ x
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "sx": [sx.tolist()], "gram": [g[np.triu_indices(dim)].tolist()]}
        )

    return emb.select(vec_col).mapInPandas(part, schema=schema)


def moments_from_partials(partials: DataFrame, dim: int):
    """Merge the ≤ num_partitions moment partials into (n, mean, cov) numpy
    arrays.  The collect here pulls bounded model metadata (a handful of
    rows of dim² doubles) — the same legitimacy class as the IVF centroid
    and SQ8-bounds collects, never corpus data."""
    import numpy as np

    rows = partials.collect()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("empty input: no moments to merge")
    sx = np.zeros(dim)
    g_flat = np.zeros(dim * (dim + 1) // 2)
    for r in rows:
        sx += np.asarray(r["sx"])
        g_flat += np.asarray(r["gram"])
    g = np.zeros((dim, dim))
    g[np.triu_indices(dim)] = g_flat
    g = g + np.triu(g, 1).T
    mean = sx / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca_model(cov, mean, k: int):
    """Eigendecompose the covariance (driver-side: dim×dim is model
    metadata) into the top-k principal components with a deterministic
    sign convention (largest-|entry| made positive; first index on ties).
    Returns (components [k×dim], eigenvalues [k], mean [dim])."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx].copy()
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
    return np.asarray(comps), vals[order], np.asarray(mean)


def pca_project(
    df: DataFrame, vec_col: str, components, mean, score_prefix: str = "pc"
) -> DataFrame:
    """Project each vector onto the components: score_c = Σ_d comp[c][d] ·
    (v[d] − mean[d]).  Components/mean are embedded as float literals and
    each score is ONE statically-unrolled arithmetic expression, so the
    whole projection runs inside whole-stage codegen — no Python per row,
    no shuffle (narrow map)."""
    out = df
    dim = len(mean)
    v = F.col(vec_col)
    for c, comp in enumerate(components):
        expr = None
        for d in range(dim):
            term = (v[d].cast("double") - F.lit(float(mean[d]))) * F.lit(float(comp[d]))
            expr = term if expr is None else expr + term
        out = out.withColumn(f"{score_prefix}{c + 1}", expr)
    return out


def fit_pca(emb: DataFrame, vec_col: str, dim: int, k: int):
    """End-to-end fit: one distributed moments pass + driver eigh."""
    n, mean, cov = moments_from_partials(gram_partials(emb, vec_col, dim), dim)
    comps, evals, mean = pca_model(cov, mean, k)
    return comps, evals, mean, n
