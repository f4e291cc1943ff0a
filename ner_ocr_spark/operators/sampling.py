"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be reproducible (re-runs and retried tasks pick
the SAME rows — never rand(), which draws per-task), stateless (no global
count or sort), and cheap (pure codegen expressions over a stable row
key). The standard construction: hash (key, seed) into a unit float and
keep rows under the target rate. Covers:

  * hash_sample        — corpus-wide Bernoulli sample at a fixed rate
  * stratified_sample  — per-stratum rates (domain/language mixing: e.g.
                         keep 50% of en, 20% of de, 10% of the rest)
  * sample_per_stratum — exactly k deterministic exemplars per stratum
                         (hash-ordered row_number, ties broken by key)

Production default is the xxhash64-based unit float (JVM, codegen); the
md5-based variant is bit-identical in DuckDB, which is what makes the
driver queries value-checkable (dedup.md5_hash31 precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT = float(1 << 60)


def unit_hash_md5(col: Column, seed: int = 0) -> Column:
    """Portable unit float in [0, 1): top 60 bits of md5(key ':' seed)
    scaled down (via dedup.md5_hash60 — one definition of the load-bearing
    md5 idiom). DuckDB twin:
    CAST('0x' || substr(md5(key || ':seed'), 1, 15) AS BIGINT)
        / 1152921504606846976.0
    The int->double conversion and the power-of-two division round
    identically under IEEE-754 on both engines."""
    from ner_ocr_spark.operators.dedup import md5_hash60

    keyed = F.concat(col.cast("string"), F.lit(f":{seed}"))
    return md5_hash60(keyed) / F.lit(_UNIT)


def unit_hash_xx(col: Column, seed: int = 0) -> Column:
    """Production unit float: xxhash64 reduced to 60 bits (JVM-only —
    faster; no DuckDB twin)."""
    return (
        F.pmod(F.xxhash64(col.cast("string"), F.lit(seed)), F.lit(1 << 60))
        / F.lit(_UNIT)
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    unit_hash=None,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose unit hash falls
    under `fraction`. A pure filter — pushes below joins, prunes columns,
    and retries reproduce the exact row set."""
    u = (unit_hash or unit_hash_xx)(F.col(key_col), seed)
    return df.filter(u < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
    unit_hash=None,
) -> DataFrame:
    """Per-stratum deterministic rates (domain-mixing weights). The rate
    lookup is a literal CASE chain (codegen; no join), so the whole
    operator is a single filter over the scan."""
    u = (unit_hash or unit_hash_xx)(F.col(key_col), seed)
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def temperature_rates(
    df: DataFrame, strata_col: str = "source", tau: float = 0.5
) -> DataFrame:
    """(stratum, share, rate): per-stratum keep-rates implementing
    temperature sampling — sample distribution q_s ∝ p_s^tau (tau < 1
    flattens toward uniform, upweighting low-resource strata; the
    standard multilingual-LM mixing rule). As a FILTER rate that cannot
    exceed 1, rates are p_s^(tau-1) normalized by the maximum (the
    rarest stratum keeps everything; others downsample toward the target
    distribution). Rates round to 6 dp so the boundary comparison is
    engine-portable (a last-ulp pow() difference cannot flip a row).

    The aggregate is one map-side-combined shuffle to a |strata|-row
    table; the global windows below run on THAT, not the corpus."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    share = F.col("n_docs") / F.sum("n_docs").over(w)
    scored = counts.select(
        strata_col, "n_docs", share.alias("share"),
        F.pow(share, F.lit(float(tau)) - 1.0).alias("_r"),
    )
    return scored.select(
        strata_col, "n_docs", "share",
        F.round(F.col("_r") / F.max("_r").over(w), 6).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str = "source",
    tau: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 0,
    unit_hash=None,
) -> DataFrame:
    """Deterministic temperature-mixed sample: broadcast the tiny rate
    table back onto the corpus and keep rows whose unit hash falls under
    their stratum's rate — one broadcast join + filter, no corpus-side
    extra shuffle."""
    rates = temperature_rates(df, strata_col, tau).select(strata_col, "rate")
    u = (unit_hash or unit_hash_xx)(F.col(key_col), seed)
    return df.join(F.broadcast(rates), strata_col).filter(u < F.col("rate"))


def sample_per_stratum(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    unit_hash=None,
) -> DataFrame:
    """Exactly min(k, stratum size) deterministic exemplars per stratum:
    row_number over the (unit hash, key) order — a uniform draw that is
    stable across runs AND across corpus growth (adding rows only evicts
    by hash order). One shuffle on the stratum; skewed strata pay the
    window sort, so for huge k prefer hash_sample + exact top-off."""
    u = (unit_hash or unit_hash_xx)(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
