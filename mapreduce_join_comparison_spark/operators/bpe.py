"""Distributed BPE merge induction — tokenizer training over a corpus,
the canonical LLM-data-pipeline job the text family was still missing
(scale extension; the reference's WordCount-shaped pipelines stop at
counting — ``RepartitionJoin.java`` tags rows, never learns a vocab).

Algorithm (Sennrich et al. 2016, the public BPE formulation): start
from character sequences of the corpus's distinct words weighted by
word frequency; repeatedly (1) count adjacent symbol pairs, (2) take
the most frequent pair, (3) merge every occurrence of that pair into
one symbol; the learned artifact is the ordered merge table.

Scale design — the part that matters at 100 TB:

- The corpus is scanned EXACTLY ONCE, for the word-frequency
  aggregate (map-side partial combine on the word key). Every
  iteration thereafter runs over the DISTINCT-WORD table — vocabulary
  -sized (millions of rows), corpus-size-independent.
- One iteration = one narrow pair-explode + a map-side-combined pair
  count (the only shuffle), a 1-row argmax collect (the chosen pair
  must parameterize the next plan — same driver-loop shape as
  ``graph.pagerank``), and a NARROW merge rewrite of the sequences.
- The merge rewrite is pure JVM string work, not a Python UDF: the
  sequence round-trips through a delimiter encoding
  ``(s1)(s2)...(sn)`` and the pair merge is a single non-overlapping
  leftmost ``replace('(l)(r)' -> '(lr)')`` — exactly BPE's greedy
  merge semantics, because each symbol carries its own brackets so
  adjacent matches never share a delimiter (a space encoding would
  drop every other adjacent match). Both Spark and DuckDB implement
  plain ``replace`` as leftmost non-overlapping scan, which is what
  makes the whole loop engine-reproducible and the catalog oracle
  expressible as ``n_merges`` chained CTEs.
- Lineage is truncated every ``persist_every`` iterations (persist +
  materialize + drop the previous snapshot), so a deep merge loop
  doesn't accumulate an unbounded plan.

Tie-breaking is total and deterministic: pair count desc, then
(left, right) lexicographic — binary collation in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# symbol-bracket delimiters for the merge encoding; any two characters
# absent from the symbol alphabet work (the catalog corpus is
# whitespace-tokenized printable text with no parens in tokens)
_L, _R = "(", ")"


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies (ALL adjacent pairs, overlap
    included, per the classic formulation), weighted by word freq."""
    n = F.size("seq")
    pairs = F.zip_with(
        F.slice("seq", 1, n - 1),
        F.slice("seq", 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        seqs.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _apply_merge(seqs: DataFrame, left: str, right: str) -> DataFrame:
    enc = F.concat(F.lit(_L), F.concat_ws(_R + _L, "seq"), F.lit(_R))
    merged = F.replace(
        enc,
        F.lit(f"{_L}{left}{_R}{_L}{right}{_R}"),
        F.lit(f"{_L}{left}{right}{_R}"),
    )
    dec = F.split(F.expr("substring(_m, 2, length(_m) - 2)"), r"\)\(")
    passthrough = [c for c in seqs.columns if c != "seq"]
    return seqs.withColumn("_m", merged).select(dec.alias("seq"), *passthrough)


def bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    persist_every: int = 4,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges from a document corpus.

    Returns a DataFrame ``(merge_rank, lhs, rhs, pair_count)`` — the
    ordered merge table, built as a constant-folded VALUES relation
    (the result is driver-sized BY CONSTRUCTION: one row per merge).
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seqs = words.select(F.split("w", "").alias("seq"), "freq")
    seqs = seqs.persist()
    seqs.count()
    persisted = seqs

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((rank, l, r, int(cnt)))
        seqs = _apply_merge(seqs, l, r)
        if persist_every and rank % persist_every == 0 and rank < n_merges:
            nxt = seqs.persist()
            nxt.count()  # materialize before dropping the old snapshot
            persisted.unpersist()
            persisted = nxt
            seqs = nxt
    persisted.unpersist()

    from ..queries_catalog import _values_df

    if not merges:
        # a pairless corpus (all single-symbol words) learns nothing;
        # empty VALUES is unparseable, so build the empty relation
        return spark.sql(
            "SELECT CAST(NULL AS INT) AS merge_rank, "
            "CAST(NULL AS STRING) AS lhs, CAST(NULL AS STRING) AS rhs, "
            "CAST(NULL AS BIGINT) AS pair_count"
        ).filter(F.lit(False))
    return _values_df(
        spark,
        merges,
        ["merge_rank", "lhs", "rhs", "pair_count"],
    ).select(
        F.col("merge_rank").cast("int").alias("merge_rank"),
        "lhs",
        "rhs",
        F.col("pair_count").cast("long").alias("pair_count"),
    )


def bpe_word_segments(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    persist_every: int = 4,
) -> DataFrame:
    """The word → BPE-token-sequence mapping after ``n_merges`` learned
    merges: ``(w, freq, seq)`` over the corpus's distinct words — the
    vocabulary artifact ``bpe_merges`` leaves implicit. Same loop,
    same scale shape (corpus scanned once; iterations vocab-sized)."""
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seqs = words.select("w", F.split("w", "").alias("seq"), "freq")
    seqs = seqs.persist()
    seqs.count()
    persisted = seqs
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r = top[0]["l"], top[0]["r"]
        merged = _apply_merge(seqs.select("seq", "freq", "w"), l, r)
        seqs = merged.select("w", "seq", "freq")
        if persist_every and rank % persist_every == 0 and rank < n_merges:
            nxt = seqs.persist()
            nxt.count()
            persisted.unpersist()
            persisted = nxt
            seqs = nxt
    # the snapshots only accelerate the driver-side argmax loop; the
    # returned mapping recomputes its (vocab-sized) lineage instead of
    # pinning executor storage the caller never asked for
    persisted.unpersist()
    return seqs


def bpe_encode_stats(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE-encode the corpus with its own learned merges and report
    per-document ``(doc_id, n_words, n_tokens)`` — the token-budget
    accounting a training pipeline runs after tokenizer training
    (compression = n_chars → n_tokens).

    Scale shape: the segment table from ``bpe_word_segments`` is
    vocabulary-sized; documents explode to words once and equi-join
    the vocabulary on the word key (AQE picks broadcast when the
    vocab fits, plain shuffle join when it doesn't — never forced),
    then one per-doc re-aggregate. Nothing is ever corpus × vocab.
    """
    vocab = bpe_word_segments(df, n_merges=n_merges, text_col=text_col)
    doc_words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.length("w") > 0)
    return (
        doc_words.join(vocab.select("w", F.size("seq").alias("n_tok")), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
