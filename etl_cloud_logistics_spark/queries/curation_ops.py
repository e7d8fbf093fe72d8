"""Training-data curation queries over ``documents`` — benchmark
decontamination, deterministic split/mixture assignment, shard export
stats, sequence packing (LLM-pipeline extensions beyond the reference's
warehouse surface; companions to the X1–X5 dedup/similarity kit).

Every hash decision is ``md5(salt || ':' || key)`` compared as lowercase
hex *strings*, which orders identically in Spark and DuckDB — so even the
sampling queries are bit-exact differential-testable with no RNG seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.curation import (
    contaminated_docs,
    mixture_sample,
    pack_sequences,
    shard_assign,
    split_assign,
)
from . import register

# DuckDB twin of operators.dedup.shingles with n=4 (word 4-grams, distinct)
_GRAMS4_CTE = """
    tok AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    g4 AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        FROM tok, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS i
        ) t
    )
"""

# benchmark membership: every 25th doc plays the held-out eval suite
_BENCH_PRED = "doc_id % 25 = 0"


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH {_GRAMS4_CTE},
    tr AS (SELECT doc_id, s FROM g4 WHERE NOT ({_BENCH_PRED})),
    be AS (SELECT doc_id AS bench_id, s FROM g4 WHERE {_BENCH_PRED})
    SELECT tr.doc_id,
           COUNT(DISTINCT tr.s) AS n_hit_grams,
           COUNT(DISTINCT be.bench_id) AS n_bench_docs
    FROM tr JOIN be ON tr.s = be.s
    GROUP BY tr.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 4-gram
    with the held-out benchmark subset (every 25th doc stands in for an
    eval suite).  The benchmark gram set is broadcast — at 100 TB the
    training side never shuffles for this check (plan test pins the
    broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    bench_flag = F.col("doc_id") % 25 == 0
    return contaminated_docs(
        docs.filter(~bench_flag), docs.filter(bench_flag), n=4
    )


# mixture targets for the sampling battery: downweight the dominant 'en',
# keep all 'de', intermediate rates elsewhere; thresholds are embedded in
# the oracle as the same 8-hex-digit literals _hex_threshold produces
_MIX_RATES = {"en": 0.5, "de": 1.0, "fr": 0.75, "es": 0.25, "zh": 0.5}


@register(
    "curation_split_sample",
    oracle="""
    SELECT doc_id, lang, source,
           CASE WHEN substr(md5('split:' || source), 1, 8) < '19999999' THEN 'val'
                WHEN substr(md5('split:' || source), 1, 8) < '33333333' THEN 'test'
                ELSE 'train' END AS split,
           CASE lang
                WHEN 'en' THEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
                WHEN 'de' THEN TRUE
                WHEN 'fr' THEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000'
                WHEN 'es' THEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
                WHEN 'zh' THEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
                ELSE FALSE END AS keep_mix
    FROM documents
    """,
)
def curation_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curation battery: leakage-safe train/val/test split
    keyed on ``source`` (near-dups from one source stay in one split) plus
    language-mixture downsampling flags (en halved, de kept whole, …).
    Pure column expressions — reproducible on any engine at any
    parallelism, no ``rand()``; thresholds nest, so raising a rate grows
    the kept set monotonically (data-scaling ablations)."""
    docs = load_table(spark, sf_dir, "documents")
    out = split_assign(docs, "source", val=0.1, test=0.1)
    out = mixture_sample(out, _MIX_RATES, group_col="lang", key_col="doc_id")
    return out.select("doc_id", "lang", "source", "split", "keep_mix")


@register(
    "shard_assign_stats",
    oracle="""
    WITH sh AS (
        SELECT source, n_chars,
               CAST(strpos('0123456789abcdef',
                           substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 8, 1)
                    ) - 1 AS INT) AS shard
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM sh GROUP BY shard
    """,
)
def shard_assign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard assignment balance: deterministic md5-keyed
    shard in [0,16) with per-shard row/byte/source counts.  Stable under
    repartitioning and reruns (unlike round-robin ids), so incremental
    re-exports rewrite only changed shards; the oracle reads the same
    shard off the digest's 8th hex nibble (== mod-16 of the 8-hex
    prefix)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        shard_assign(docs, "doc_id", n_shards=16)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "pack_sequences_bins",
    oracle=None,  # greedy FFD bin packing is not SQL-expressible; invariants
    # (capacity, exactly-once, determinism) are pytest-pinned in
    # tests/test_curation.py
    extra=True,
)
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: greedy first-fit-decreasing assignment of
    docs into 256-token bins, hash-bucketed so packing parallelizes (one
    Arrow task per bucket) while staying deterministic."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.lower("text"), " ")).cast("long")
    )
    return pack_sequences(docs, budget=256, n_buckets=8)
