"""End-to-end training-data pipeline queries.

The individual operators (text features, language ID, exact dedup,
deterministic split, embedding similarity) each have their own catalog
entry; these queries compose them the way a 100 TB pretraining-data
build actually runs them, as ONE lazy plan:

    documents → featurize (narrow, one scan)
              → quality gate (filter)
              → exact near-dup removal (one shuffle on fingerprint)
              → deterministic train/holdout split (pure filter)
              → corpus report (one aggregate shuffle)

Nothing materializes on the driver; the whole pipeline is three
shuffles end-to-end (fingerprint window + aggregate; the split adds
none), so it scales by partition count alone.

Both queries register full DuckDB oracles — every stage is
deterministic arithmetic, so the driver's strongest value-hash check
covers the composition, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_catalog import register


def _load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    from .sources import load_table

    return [load_table(spark, sf_dir, n) for n in names]


_QUALITY_MIN = 0.55
_TRAIN_PCT = 80


def _pipeline_oracle() -> str:
    from .operators.text import LANG_MARKERS, STOPWORDS

    toks = "string_split_regex(trim(text), '\\s+')"
    stopwords = "(" + ",".join(f"'{s}'" for s in STOPWORDS) + ")"
    codes = sorted(LANG_MARKERS)
    hit_cols = ", ".join(
        "len(list_filter(toks_l, t -> t IN ({m}))) AS h_{c}".format(
            m=",".join(f"'{m}'" for m in LANG_MARKERS[c]), c=c
        )
        for c in codes
    )
    best = "greatest(" + ", ".join(f"h_{c}" for c in codes) + ")"
    lang_case = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN h_{c} = {best} THEN '{c}'" for c in codes)
        + " END"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, text, {toks} AS toks,
             list_transform({toks}, t -> lower(t)) AS toks_l
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks_l, t -> t IN {stopwords})) AS DOUBLE)
               / greatest(len(toks), 1) AS stopword_ratio,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_ratio,
             list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
               / greatest(len(toks), 1) AS mean_token_len,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
             {hit_cols}
      FROM t
    ), q AS (
      SELECT doc_id, n_tokens, fingerprint, {lang_case} AS lang_pred,
             (least(n_tokens / 50.0, 1.0)
              + least(stopword_ratio * 4.0, 1.0)
              + greatest(0.0, 1.0 - punct_ratio * 5.0)
              + CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0
                     THEN 1.0 ELSE 0.5 END) / 4.0 AS quality
      FROM m
    ), gated AS (
      SELECT * FROM q WHERE quality >= {_QUALITY_MIN}
    ), deduped AS (
      SELECT * FROM gated
      QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
    ), split AS (
      SELECT *,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                       % 100 < {_TRAIN_PCT}
                  THEN 'train' ELSE 'holdout' END AS split
      FROM deduped
    )
    SELECT split, lang_pred, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(quality), 5) AS avg_quality
    FROM split
    GROUP BY split, lang_pred
    """


def training_data_report(documents: DataFrame) -> DataFrame:
    """The composed pretraining-data pipeline over any documents frame:
    featurize → quality-gate (≥ 0.55) → exact-dedup (min-doc_id
    survivor per content fingerprint) → deterministic 80/20
    content-hash split → per-split × per-language corpus stats. One
    scan, three shuffles total. (`tools/stress.py` drives this same
    body over a replicated 500 k-doc corpus.)"""
    from .operators.sampling import hash_bucket
    from .operators.text import text_features

    feats = text_features(documents).select(
        "doc_id", "n_tokens", "fingerprint", "lang_pred", "quality"
    )
    gated = feats.filter(F.col("quality") >= _QUALITY_MIN)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    split = deduped.withColumn(
        "split",
        F.when(hash_bucket("doc_id", 100, "split") < _TRAIN_PCT, "train")
        .otherwise("holdout"),
    )
    return split.groupBy("split", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("quality"), 5).alias("avg_quality"),
    )


@register("pipeline_training_data", _pipeline_oracle())
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: `training_data_report` over the driver's
    documents table."""
    (documents,) = _load(spark, sf_dir, "documents")
    return training_data_report(documents)


@register(
    "pipeline_embedding_prep",
    """
    WITH n AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id, label,
             list_transform(emb, x -> CAST(round(x / nrm * 127.0) AS INT)) AS q8,
             emb, nrm
      FROM n WHERE nrm > 0
    ), e AS (
      SELECT vec_id, label,
             list_sum(list_transform(list_zip(emb, q8),
                  p -> abs(p[1] / nrm - p[2] / 127.0))) AS abs_err
      FROM q
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(abs_err), 6) AS avg_quant_err,
           ROUND(MAX(abs_err), 6) AS max_quant_err
    FROM e
    GROUP BY label
    """,
)
def pipeline_embedding_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side pipeline prep: L2-normalize each vector, scalar-
    quantize to int8 (×127), and report per-label reconstruction error
    — the storage/recall tradeoff check run before shipping vectors to
    an ANN index. Narrow until the final tiny aggregate; the quantized
    column is what a real pipeline would write out (8× smaller)."""
    (embeddings,) = _load(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    n = embeddings.select("vec_id", "label", emb.alias("emb"), nrm.alias("nrm")).filter(
        F.col("nrm") > 0
    )
    q = n.select(
        "vec_id", "label", "emb", "nrm",
        F.transform(F.col("emb"),
                    lambda x: F.round(x / F.col("nrm") * 127.0).cast("int"))
        .alias("q8"),
    )
    err = F.aggregate(
        F.zip_with(F.col("emb"), F.col("q8"),
                   lambda x, qv: F.abs(x / F.col("nrm") - qv / 127.0)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    e = q.select("vec_id", "label", err.alias("abs_err"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("abs_err"), 6).alias("avg_quant_err"),
        F.round(F.max("abs_err"), 6).alias("max_quant_err"),
    )


_PACK_BUDGET = 512          # tokens per training chunk
_PACK_SHARDS = 8            # packing shards per lang (cluster-width at scale)


def sequence_packing(
    df: DataFrame,
    budget: int = _PACK_BUDGET,
    n_shards: int = _PACK_SHARDS,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its training-chunk id under GPT-style
    concatenate-then-chunk packing: docs are laid out in a
    deterministic order (doc id) within a (lang, shard) stream, and a
    doc's ``pack_id`` is the chunk its first token lands in
    (``floor(start_offset / budget)`` — docs may straddle chunk
    boundaries, exactly like the real packing step).

    Scale shape: the stream is sharded by a stable md5 bucket of the
    doc id, so the window cumsum parallelizes across lang × n_shards
    partitions instead of serializing per language (set ``n_shards`` ≈
    cluster width at 100 TB). One shuffle total (the window); token
    counting is narrow.
    """
    from .operators.sampling import hash_bucket
    from .operators.text import token_count

    base = df.select(
        F.col(id_col),
        F.col(lang_col),
        hash_bucket(id_col, n_shards).alias("shard"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy(lang_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return base.select(
        id_col,
        lang_col,
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).cast("bigint").alias("pack_id"),
    )


def _packing_oracle(budget: int = _PACK_BUDGET, n_shards: int = _PACK_SHARDS) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(doc_id::VARCHAR || ''), 1, 8))::BIGINT
                  % {n_shards} AS INT) AS shard,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), c AS (
      SELECT *,
             SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM t
    )
    SELECT doc_id, lang, shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST(floor((cum - n_tokens) / {budget}) AS BIGINT) AS pack_id
    FROM c
    """


@register("pipeline_sequence_packing", _packing_oracle())
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GPT-style sequence packing: per-document chunk
    assignment via sharded window cumsum; oracle replays the identical
    md5 shard + cumsum arithmetic."""
    (documents,) = _load(spark, sf_dir, "documents")
    return sequence_packing(documents)


def corpus_card(documents: DataFrame) -> DataFrame:
    """Per-source 'dataset card' statistics in ONE lazy plan — the
    summary a data team reviews before admitting a source into the
    training mix: volume, classifier keep rate, exact-duplicate rate,
    and a token-weighted mean classifier weight.

    Every output number is derived from exact integers (counts, int64
    milli-margins), so the card is bit-identical in any engine with no
    rounding anywhere. Plan: fingerprint window (shuffle 1) → source
    aggregate (shuffle 2); the classifier margin rides along as a
    narrow column. At 100 TB the fingerprint window is the only
    corpus-wide exchange, and it is the same one exact dedup pays.
    """
    from .operators.text import (
        classifier_margin_milli,
        document_fingerprint,
        token_count,
    )

    w = Window.partitionBy("_fp").orderBy("doc_id")
    per_doc = (
        documents.select(
            "doc_id",
            "source",
            token_count("text").alias("_n_tok"),
            classifier_margin_milli("text").alias("_margin"),
            document_fingerprint("text").alias("_fp"),
        )
        .withColumn("_dup", (F.row_number().over(w) > 1).cast("int"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_tok").alias("n_tokens"),
            F.sum(F.when(F.col("_margin") >= 0, 1).otherwise(0)).alias("_n_keep"),
            F.sum("_dup").alias("_n_dup"),
            F.sum("_margin").alias("_sum_margin"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            # unrounded exact-int quotients — bit-identical cross-engine
            (F.col("_n_keep") / F.col("n_docs")).alias("keep_rate"),
            (F.col("_n_dup") / F.col("n_docs")).alias("dup_rate"),
            (
                F.col("_sum_margin") / (F.col("n_tokens") * 1000.0)
            ).alias("mean_token_weight"),
        )
    )


_CARD_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
d AS (
  SELECT doc_id, source, fp,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(toks,
           x -> ((('0x' || substr(md5(x), 1, 8))::BIGINT % 4096)
                 * 2654435761) % 2001 - 1000)) AS BIGINT) AS margin,
         CASE WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS dup
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       SUM(CASE WHEN margin >= 0 THEN 1 ELSE 0 END) / count(*) AS keep_rate,
       SUM(dup) / count(*) AS dup_rate,
       CAST(SUM(margin) AS BIGINT) / (CAST(SUM(n_tok) AS BIGINT) * 1000.0)
         AS mean_token_weight
FROM d GROUP BY source
"""


@register("pipeline_corpus_card", _CARD_ORACLE)
def pipeline_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card report per source: volume, classifier keep rate,
    exact-dup rate, token-weighted mean classifier weight — the
    admission review a 100 TB mix build runs per source, composed as
    one two-shuffle lazy plan over the corpus."""
    (documents,) = _load(spark, sf_dir, "documents")
    return corpus_card(documents)
