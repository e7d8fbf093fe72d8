"""Embedding-statistics queries (X3/X5 support): exact covariance with a
positional SQL twin, and PCA projection for whitening / semantic-space
reduction ahead of ANN indexing.

Both register ``extra=True`` — the X3 similarity family keeps its driver
rows; these stay under the CI exact gate / rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.embedding_stats import covariance_long, fit_pca, pca_project
from . import register

_DIM = 64


@register(
    "embedding_covariance",
    extra=True,
    oracle="""
    WITH e AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, range(1, 65) r(i)
    ),
    pairs AS (
        SELECT a.i AS i, b.i AS j, a.x AS xi, b.x AS xj
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    ),
    agg AS (
        SELECT i, j,
               CAST(SUM(CAST(xi * xj AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(xi * 8796093022208.0 AS DECIMAL(38,0))) AS DOUBLE)
                   / 8796093022208.0 AS sx,
               CAST(SUM(CAST(xj * 8796093022208.0 AS DECIMAL(38,0))) AS DOUBLE)
                   / 8796093022208.0 AS sy,
               COUNT(*) AS n
        FROM pairs GROUP BY i, j
    )
    SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j,
           (sxy - sx * sy / n) / n AS cov
    FROM agg
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding corpus in long form
    (dim_i ≤ dim_j, 2080 rows at dim=64) — the moment statistics behind
    whitening and PCA.  Exactness shape: decimal-exact sums per dim pair,
    one fixed double expression, bit-identical to the positional SQL twin.
    The 100 TB shape is ``operators.embedding_stats.gram_partials`` (one
    constant-size XᵀX partial per partition, pytest-pinned ≈ this to
    1e-9 relative); this row exists so that scale path has an
    oracle-anchored reference to be compared against.  The raw-value sums
    use the exact 2^43 integer scaling — NOT a DECIMAL(38,12) cast — because
    raw float32 short dyadics can land exactly on the rounding boundary
    where Spark (HALF_UP) and DuckDB (HALF_EVEN) legally split (found at
    sf0.01: 0.1983642578125 in dim 38; see covariance_long's docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return covariance_long(emb, "embedding", "vec_id")


@register(
    "pca_projection_top2",
    extra=True,
    oracle=None,  # eigendecomposition has no SQL twin; the moments feeding it
    # are oracle-anchored via embedding_covariance, and the projection's
    # invariants (orthonormality, variance ordering == eigenvalues,
    # determinism, gram≈exact) are pytest-pinned in test_embedding_stats.py
)
def pca_projection_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA projection of every embedding (vec_id, pc1, pc2): one
    distributed moments pass (constant-size partials), driver-side eigh of
    the 64×64 covariance (bounded model metadata, same legitimacy class as
    IVF centroids), then a statically-unrolled codegen projection — no
    Python per row, no shuffle.  Deterministic end to end: moment merge is
    over a fixed partition set, eigh input is therefore bit-stable, and
    the sign convention pins each component."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps, _evals, mean, _n = fit_pca(emb, "embedding", _DIM, k=2)
    out = pca_project(emb, "embedding", comps, mean)
    return out.select(
        "vec_id",
        F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    )
