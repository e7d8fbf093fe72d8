"""K-minimum-values distinct sketch (Bar-Yossef et al. 2002; unbiased
estimator and multiset operations per Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007) — the
SET-OPERATION member of the mergeable-sketch family (HLL distinct, GK
quantiles, MG frequent items, CM point frequency): HLL estimates |A| but
cannot intersect two sketches; a KMV sketch supports union natively (the
k smallest of the merged hash sets is exactly the union's KMV sketch) and
intersection/Jaccard through the union sketch's members — how audience-
overlap questions run at 100 TB without a pairwise distinct scan.

md5-derandomized like the CM sketch: hashes are the first 15 md5 hex
chars of the key's string form read as int64 (normalizing constant
16^15 = 2^60, exactly representable as a double), so build AND estimate
replay in ANSI SQL and an oracle differential covers the sketch itself.
The k-smallest cut is Spark's TakeOrdered path — per-partition top-k
merged over k-row partials, never a global sort — and every estimate is
derived from exact integers by fixed per-row IEEE expression trees (the
engine's χ²/KS float discipline).

Exactness contract: a side with fewer than k distinct hashes IS its own
exhaustive sketch and estimates exactly (the CASE branch both engines
replay); otherwise the basic estimator (k-1)/v_k has ~1/sqrt(k-2)
relative error — k trades accuracy for a fixed k-row footprint per set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^15 = 2^60: the hash-space size for 15 hex chars; a power of two, so
# the double literal is EXACT and the normalization divide is one IEEE op
KMV_NORM = float(16**15)


def kmv_hash(col: Column) -> Column:
    """int64 key hash: first 15 lowercase md5 hex chars of the value's
    string form — byte-identical to the oracle's
    ``hex_prefix_bigint(md5(CAST(x AS VARCHAR)), 15)``."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The k smallest DISTINCT key hashes as a ≤k-row frame of ``h``.

    Plan shape: hash projection → hash-distinct → TakeOrdered(k) — the
    distinct is one key-hashed shuffle and the ordered cut merges k-row
    per-partition partials; nothing global-sorts and nothing larger than
    k rows reaches any single task's output."""
    return (
        df.select(kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(stats: DataFrame, k: int, n_col: str = "n",
                 vk_col: str = "vk", out_col: str = "est") -> DataFrame:
    """Attach the KMV distinct estimate to a stats frame carrying the
    sketch's row count (``n_col``) and largest retained hash (``vk_col``):
    exhaustive sketches (n < k) estimate exactly; full sketches use the
    basic estimator (k-1) · 2^60 / v_k."""
    est = F.when(
        F.col(n_col) < k, F.col(n_col).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_NORM) / F.col(vk_col))
    return stats.withColumn(out_col, est)
