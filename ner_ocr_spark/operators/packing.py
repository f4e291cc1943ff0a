"""Sequence packing for LLM training-data pipelines.

Concat-and-chunk (GPT-style) packing: documents are laid end-to-end in a
deterministic order and the token stream is chopped every `budget` tokens;
a document may span consecutive sequences. The operator emits each
document's PLACEMENT (shard, token offsets, first/last sequence index) —
the metadata a downstream tokenizer/writer needs to materialize packed
training rows.

Scale shape: a single global concatenation order would be one giant window
sort. Instead documents hash into `shards` independent streams and the
running offset is a window partitioned BY SHARD — every shard packs in
parallel, and sequence ids are globalized as (shard, seq_in_shard). This is
exactly how production packers shard: determinism within a shard, no
cross-shard coordination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ner_ocr_spark.operators.textstats import token_count_ws


def shard_hash_md5(col: Column, shards: int) -> Column:
    """Portable shard assignment (DuckDB twin:
    CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) % shards). Built on
    dedup.md5_hash60 so the load-bearing 60-bit md5 idiom has ONE
    definition shared with every oracle twin."""
    from ner_ocr_spark.operators.dedup import md5_hash60

    return F.pmod(md5_hash60(col.cast("string")), F.lit(shards))


def shard_hash_xx(col: Column, shards: int) -> Column:
    """Production shard assignment (xxhash64; JVM-only)."""
    return F.pmod(F.xxhash64(col.cast("string")), F.lit(shards))


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 8,
    token_count: Column | None = None,
    shard_hash=None,
) -> DataFrame:
    """Per-document packing placement:

      (id, shard, n_tokens, start_offset, seq_first, seq_last)

    where start_offset is the document's first token position within its
    shard's concatenated stream (documents ordered by id within shard) and
    seq_first/seq_last = the budget-sized training sequences it lands in
    (a doc spans seq_last - seq_first + 1 sequences). Pure window cumsum —
    one shuffle on the shard key; no python, no global sort."""
    tokens = (token_count if token_count is not None
              else token_count_ws(F.col(text_col))).cast("long")
    sh = (shard_hash or shard_hash_xx)(F.col(id_col), shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(id_col), sh.alias("shard"), tokens.alias("n_tokens")
    ).select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / budget).alias("seq_first"),
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget).alias(
            "seq_last"
        ),
    )
