"""Measured scaling evidence for the dedup kit: run MinHash/LSH near-dup
and connected-components over K× replicas of the sf0.1 documents corpus
and report wall time + result counts per scale.

Replica construction keeps the workload honest: each replica interleaves
its replica tag between every pair of words, so (a) per-doc shingle work
is identical at every scale, (b) within-replica near-dup structure is
preserved (pairs scale exactly K×), and (c) cross-replica Jaccard is 0 —
corpus size grows K× without quadratic pair inflation.  A near-linear
wall-time slope is the evidence that candidate generation is evidence-
bounded (equi-joins on shared bands), not all-pairs: an O(n²) stage would
show a ~100× step from K=1 to K=10.

Usage: python tools/scaling_probe.py [K ...]   (default 1 5 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_cloud_logistics_spark.catalog import load_table  # noqa: E402
from etl_cloud_logistics_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_neardup,
    neardup_components,
)
from etl_cloud_logistics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_corpus(spark, k: int):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ws = F.split(F.lower("text"), " ")
    parts = []
    for r in range(k):
        tagged = F.concat_ws(
            " ", F.flatten(F.transform(ws, lambda w: F.array(w, F.lit(f"r{r}"))))
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                tagged.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # materialize the corpus so generation cost is excluded from timings
    # and every K presents the same multi-partition layout
    return out.repartition(spark.sparkContext.defaultParallelism).localCheckpoint(
        eager=True
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark("scaling-probe")
    # warm-up: compile the plans once at the smallest scale
    warm = replicated_corpus(spark, 1)
    minhash_lsh_neardup(warm, threshold=0.5, max_shingle_freq=100).write.mode("overwrite").format(
        "noop"
    ).save()
    print(f"scale probe over {SF_DIR} (base docs replicated K×, tagged)")
    print(f"{'K':>3} {'docs':>7} {'lsh_sec':>8} {'pairs':>7} {'comp_sec':>9} {'clusters':>9}")
    for k in ks:
        corpus = replicated_corpus(spark, k)
        n_docs = corpus.count()
        t0 = time.perf_counter()
        pairs = minhash_lsh_neardup(corpus, threshold=0.5, max_shingle_freq=100).select(
            "doc_a", "doc_b"
        ).persist()
        n_pairs = pairs.count()
        lsh_sec = time.perf_counter() - t0
        nodes = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        t0 = time.perf_counter()
        comp = neardup_components(pairs, nodes)
        n_clusters = comp.select("component").distinct().count()
        comp_sec = time.perf_counter() - t0
        pairs.unpersist()
        print(
            f"{k:>3} {n_docs:>7} {lsh_sec:>8.2f} {n_pairs:>7} {comp_sec:>9.2f} {n_clusters:>9}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
