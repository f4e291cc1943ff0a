"""Benchmark decontamination for training-data pipelines.

Training corpora must not contain the eval/benchmark text they will be
scored against. The standard method (GPT-3 appendix C / PaLM style): build
the set of word n-grams of the benchmark, flag any training document that
shares one. Here parameterized over n and the base hash.

Scale shape: the benchmark side is SMALL (eval sets are thousands of
documents) — its distinct n-gram hashes BROADCAST, so the 100 TB training
side never shuffles: explode -> broadcast hash-join -> partial-agg count
per doc, all map-side until the final per-doc count (which is bounded by
the corpus row count, not the n-gram count). Output keeps every input doc
with a sentinel 0 overlap count (no nullable BIGINT — pandas round-trip
turns those into float64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_ocr_spark.operators.dedup import (
    shingles_from_words,
    with_words,
    xxhash31,
)


def _gram_hashes(df: DataFrame, text_col: str, id_col: str, n: int, base_hash):
    return (
        with_words(df, text_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles_from_words(F.col("words"), n)).alias("g"),
        )
        .select("id", base_hash(F.col("g")).alias("gh"))
    )


def ngram_overlap(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    base_hash=None,
) -> DataFrame:
    """(id, n_overlap, contaminated) for every row of `df`: n_overlap is
    the number of DISTINCT word n-grams shared with `eval_df`,
    contaminated = 1 when any. Normalization (lowercase + pinned
    whitespace class) matches the dedup operators so near-identical
    phrasing hashes identically."""
    base_hash = base_hash or xxhash31
    eval_grams = (
        _gram_hashes(eval_df, text_col, id_col, n, base_hash)
        .select("gh")
        .distinct()
    )
    doc_grams = _gram_hashes(df, text_col, id_col, n, base_hash)
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("id")
        .agg(F.count_distinct("gh").alias("n_overlap"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
