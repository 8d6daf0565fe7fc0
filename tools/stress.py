#!/usr/bin/env python
"""Scale stress harness: replicate the driver's documents table N×
(default 1000 → 500 k ~1 KB docs from sf0.01) and measure throughput of
the LLM-pipeline hot paths. This is the committed, repeatable source of
the README throughput table.

    python tools/stress.py [--replicate 1000] [--sf-dir /root/testdata/sf0.01]

Prints ONE JSON line: docs/s (or pairs/s) per pipeline, corpus size,
and wall seconds. The replicated corpus is staged to parquet and read
back so every measurement pays a real multi-split scan (and fan_out
stays a no-op, as it would be at scale).

Replication note: doc_id is remapped to doc_id*N + rep so ids stay
unique; text is NOT varied, which makes the corpus adversarial for the
LSH families (every doc sits in an N-member near-dup clique — candidate
pairs grow quadratically per clique; real corpora with small cliques
generate ~O(N) candidates)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--replicate", type=int, default=1000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keep-stage", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.operators.dedup import (
        contamination_check,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from mapreduce_join_comparison_spark.operators.text import (
        boilerplate_stats,
        classifier_score,
        redact_pii,
    )
    from mapreduce_join_comparison_spark.pipeline import training_data_report
    from mapreduce_join_comparison_spark.session import get_spark
    from mapreduce_join_comparison_spark.sources.io import load_table

    spark = get_spark(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    documents = load_table(spark, args.sf_dir, "documents")
    n = args.replicate
    stage = tempfile.mkdtemp(prefix="stress_docs_")
    try:
        (
            documents.crossJoin(
                spark.range(n).withColumnRenamed("id", "rep")
            )
            .withColumn("doc_id", F.col("doc_id") * n + F.col("rep"))
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.parquet(os.path.join(stage, "docs"))
        )
        corpus = spark.read.parquet(os.path.join(stage, "docs"))
        n_docs = corpus.count()  # also warms the page cache

        def timed(df) -> float:
            """Warm wall time: first run pays codegen + page-cache
            misses (discarded), second is the steady-state number the
            README quotes."""
            df.write.format("noop").mode("overwrite").save()
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        results: dict[str, float] = {}

        sec = timed(training_data_report(corpus))
        results["pipeline_docs_per_sec"] = round(n_docs / sec)
        results["pipeline_sec"] = round(sec, 2)

        sec = timed(minhash_signatures(corpus, num_hashes=128, k=3))
        results["minhash128_docs_per_sec"] = round(n_docs / sec)
        results["minhash128_sec"] = round(sec, 2)

        sec = timed(corpus.select("doc_id", redact_pii("text").alias("t")))
        results["pii_redact_docs_per_sec"] = round(n_docs / sec)
        results["pii_redact_sec"] = round(sec, 2)

        sec = timed(contamination_check(corpus, documents.limit(2000)))
        results["decontaminate_docs_per_sec"] = round(n_docs / sec)
        results["decontaminate_sec"] = round(sec, 2)

        sec = timed(classifier_score(corpus))
        results["classifier_docs_per_sec"] = round(n_docs / sec)
        results["classifier_sec"] = round(sec, 2)

        sec = timed(boilerplate_stats(corpus))
        results["boilerplate_docs_per_sec"] = round(n_docs / sec)
        results["boilerplate_sec"] = round(sec, 2)

        # LSH verify throughput is pairs/s (quadratic in the clique
        # size by construction here — see module docstring)
        pairs_df = minhash_lsh_pairs(
            corpus, num_hashes=16, bands=4, k=3, seed=42
        )
        n_pairs = pairs_df.count()  # cold run discarded
        t0 = time.monotonic()
        n_pairs = pairs_df.count()
        sec = time.monotonic() - t0
        results["lsh_verify_pairs_per_sec"] = round(n_pairs / sec)
        results["lsh_verify_pairs"] = n_pairs
        results["lsh_verify_sec"] = round(sec, 2)

        print(json.dumps({"n_docs": n_docs, "replicate": n, **results}))
    finally:
        if not args.keep_stage:
            shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
