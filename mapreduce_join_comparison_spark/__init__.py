"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``arselzer/mapreduce_join_comparison``
(a Hadoop-MapReduce join-algorithm comparison harness), re-expressed
Spark-first: DataFrame/SQL logical plans, Catalyst-optimized physical
execution, explicit join-strategy control via hints.

Reference surface covered (SURVEY.md §2):
  * repartition / broadcast / sort-merge equi-joins (joins.py)
  * Zipf / uniform skewed pair data generation (generator.py)
  * total-order sort, secondary sort, skew handling (sorts.py)
  * benchmark harness with per-strategy timing (bench.py at repo root)

Scale extensions (training-data-pipeline operators):
  * deduplication: exact, minhash-LSH, simhash, n-gram jaccard,
    embedding-cosine (operators/dedup.py)
  * similarity search: brute-force + LSH-bucketed ANN (operators/similarity.py)
  * text analysis: lang-id, quality, tokens, fingerprints (operators/text.py)
  * multimodal binary-column plumbing (operators/multimodal.py)
  * structured streaming over events (streaming/)
"""

__version__ = "0.1.0"
