"""Similarity search over embedding columns (scale extension):
brute-force cosine top-k baseline + random-hyperplane LSH bucketing as
the scale path.

Scale design: brute force is a broadcast of the (small) query set
against a full scan of the corpus — correct at any corpus size but
O(corpus × queries). The LSH variant buckets the corpus once (narrow
pass), then joins queries only against same-bucket candidates; recall
is tunable via number of tables/bits. Dot products run JVM-side via
zip_with/aggregate — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic order, matches any
    engine that folds left-to-right in double)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    return (dot_expr(a, b) / (norm_expr(a) * norm_expr(b))).cast("double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the query set, scan the
    corpus once, windowed top-k. Ties broken on corpus id
    (deterministic)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q))
        .withColumn("cosine", cosine_expr("c_vec", "q_vec"))
        .filter(F.col("corpus_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes (unit-free; only the sign matters).
    Deterministic so oracles can embed the same constants."""
    rng = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rng.randn(n_planes, dim)]


def lsh_bucket_expr(vec: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(v · r_i); packed into a
    bigint bucket id."""
    bits = [
        F.when(
            dot_expr(vec, F.array(*[F.lit(x) for x in plane])) > 0,
            F.lit(1 << i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0).cast("bigint")
    for b in bits:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: L
    independent tables of b planes each; a corpus row is a candidate if
    it shares a bucket with the query in ANY table (recall =
    1-(1-p^b)^L where p = 1-θ/π). Each corpus row hashes L times
    (narrow), the candidate join is bucket-co-partitioned — no cross
    product, so corpus size scales to billions of rows.

    Tune: raise n_planes for precision (smaller buckets → fewer
    candidates to score), raise n_tables for recall.
    """
    from pyspark.sql.window import Window

    tables = [
        hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    bucket_arr = lambda vec: F.array(  # noqa: E731
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket_expr(vec, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    c = (
        corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"))
        .withColumn("tb", F.explode(bucket_arr("c_vec")))
        .select("corpus_id", "c_vec", "tb.table", "tb.bucket")
    )
    q = (
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("tb", F.explode(bucket_arr("q_vec")))
        .select("query_id", "q_vec", "tb.table", "tb.bucket")
    )
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "q_vec", "corpus_id", "c_vec")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine_expr("c_vec", "q_vec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
