"""Deduplication operators for training-data pipelines (driver brief).

All distributed-first:
  * exact        — hash groupBy, min-id winner (one shuffle on the hash)
  * minhash_lsh  — shingles -> k minhashes -> b bands -> band-bucket join;
                   candidate pairs only within equal (band, bucket) — the
                   classic MinHash+LSH plan; no O(n^2) pair enumeration
  * simhash      — 64-bit simhash via token-hash bit voting, bucket on
                   rotated prefixes for near-dup candidates
  * ngram_jaccard — exact Jaccard on word n-gram sets for candidate pairs
                   (verification stage after LSH, or standalone on small sets)

Everything uses built-in expressions (xxhash64, transform, aggregate,
explode) — no Python in the hot path; candidate verification is the only
place a pair-level computation happens and it is bounded by LSH bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime for the affine minhash family; hashes are first reduced
# mod 2^31 so the affine map a*h+b stays far below int64 (ANSI overflow)
_MERSENNE = (1 << 31) - 1


def normalize_for_dedup(col: Column) -> Column:
    """lowercase, collapse whitespace — canonical text for hashing."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct normalized text, keeping the min
    id; n_dups counts the group. Single hash-aggregate shuffle; the 128-bit
    content key (two seeded xxhash64) avoids shuffling full texts at scale."""
    h = normalize_for_dedup(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.xxhash64(h).alias("h1"),
            F.xxhash64(h, F.lit(1)).alias("h2"),
        )
        .groupBy("h1", "h2")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) of the normalized text."""
    words = F.split(normalize_for_dedup(col), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """num_hashes-wide minhash signature: min over shingles of seeded
    xxhash64 mapped through an affine family mod a Mersenne prime."""
    def _minhash(a: int, b: int):
        # closure factory: pyspark counts every lambda param as a HOF arg,
        # so the coefficients must be captured, not default-arg'd
        return F.array_min(
            F.transform(
                shingle_col,
                lambda s: F.pmod(
                    F.pmod(F.xxhash64(s), F.lit(1 << 31)) * F.lit(a) + F.lit(b),
                    F.lit(_MERSENNE),
                ),
            )
        )

    return F.array(*[_minhash(2 * i + 1, 7919 * (i + 1)) for i in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Plan: signature (map-only) -> explode bands (xN) -> groupBy-free
    self-equi-join on (band_idx, band_hash) -> distinct (a<b) pairs with
    their estimated signature similarity. The join key is a 64-bit hash of
    the band slice, so only same-bucket docs ever meet — the shuffle is on
    the band hash, never on pairs."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
        )
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_idx", "band.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.lit(float(num_hashes)).alias("_n"),
            F.aggregate(
                F.zip_with(F.col("l.sig"), F.col("r.sig"), lambda a, b: (a == b).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("_eq"),
        )
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_eq") / F.col("_n"), 4).alias("est_jaccard"),
        )
    )
    return pairs


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash: per-shingle xxhash64, bitwise majority vote.
    Pure expressions: for each bit, sum +-1 over shingles, take sign."""
    sh = shingles(col, shingle_n)

    def _vote(bit: int):
        return F.aggregate(
            sh,
            F.lit(0),
            lambda acc, s: acc
            + F.when(
                F.shiftright(F.xxhash64(s), bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    # shiftleft instead of a python literal: 1 << 63 exceeds int64 range
    bits = [
        F.when(
            _vote(bit) > 0, F.shiftleft(F.lit(1).cast("long"), bit)
        ).otherwise(F.lit(0).cast("long"))
        for bit in range(64)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates: equal top-`prefix_bits` of the simhash bucket
    together (one of the 4-table rotation scheme's tables; full scheme =
    union over rotations)."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash")
    )
    bucketed = sh.withColumn(
        "bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(r, on=[F.col("l.bucket") == F.col("r.bucket"),
                      F.col("l.id") < F.col("r.id")])
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            _hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
    )


def _hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    group_col: str | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact word-n-gram Jaccard for pairs within `group_col` (or a prefix
    blocking key when None). Blocking bounds the pair count; built-in
    array_intersect/array_union do the set math JVM-side."""
    block = F.col(group_col) if group_col else F.substring(normalize_for_dedup(F.col(text_col)), 1, 8)
    base = df.select(
        F.col(id_col).alias("id"),
        block.alias("block"),
        shingles(F.col(text_col), n).alias("grams"),
    )
    l, r = base.alias("l"), base.alias("r")
    inter = F.size(F.array_intersect(F.col("l.grams"), F.col("r.grams")))
    union = F.size(F.array_union(F.col("l.grams"), F.col("r.grams")))
    return (
        l.join(r, on=[F.col("l.block") == F.col("r.block"),
                      F.col("l.id") < F.col("r.id")])
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
