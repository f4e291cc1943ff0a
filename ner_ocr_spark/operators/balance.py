"""Size-aware work balancing (SURVEY.md §4.3.2; north rule: "OCR-heavy
partitions are split via size-aware range partitioning").

Hash-spreading on (doc_id, span_idx) equalizes row COUNTS; when per-row
cost varies by orders of magnitude (pixel count of the decoded media), a
partition can still draw several giant rows. `balance_by_cost` assigns rows
to bins by descending-cost round-robin (the classic LPT greedy — every bin
within one max-row of optimal) and then places each bin on its own
partition EXACTLY:

    rank = row_number() over (order by cost desc)   [or monotonic id in
                                                     approximate mode]
    bin  = rank % n
    repartition(n, token[bin])

`repartition(n, col)` hash-partitions, which for raw bin values stacks
several bins on one partition and leaves others empty (repartitionByRange
is no better: its reservoir sample can merge adjacent bins). The fix: a
one-time driver-side probe finds n integer TOKENS such that
pmod(hash(token_i), n) == i — a bijection — so hash partitioning becomes
exact value placement with zero runtime overhead (the token lookup folds
into the plan as an array literal).

Exact mode costs one global order-by of (key, cost) pairs; at 100 TB use
approximate=True: range-partition on cost first (bounded sample sort), then
per-partition round-robin — no global window, same +-1-giant balance within
each cost tier.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_token_cache: dict[int, list[int]] = {}

# exact mode funnels EVERY row through one partition for the global
# row_number window; above this many rows it is a self-inflicted straggler
EXACT_MODE_ROW_LIMIT = 10_000_000


def _partition_tokens(spark, n: int) -> list[int]:
    """n ints whose Murmur3 hash mod n hits each class exactly once."""
    if n in _token_cache:
        return _token_cache[n]
    probe = 32 * n
    while True:
        rows = (
            spark.range(probe)
            .select("id", F.pmod(F.hash("id"), F.lit(n)).alias("cls"))
            .groupBy("cls").agg(F.min("id").alias("tok"))
            .collect()
        )
        if len(rows) == n:
            toks = [0] * n
            for r in rows:
                toks[r["cls"]] = int(r["tok"])
            _token_cache[n] = toks
            return toks
        probe *= 4  # astronomically unlikely to loop more than once


def balance_by_cost(
    df: DataFrame,
    cost_col: str,
    n_partitions: int,
    approximate: bool = False,
    bin_col: str = "_cost_bin",
) -> DataFrame:
    """Repartition so each of n_partitions has ~equal total `cost_col`."""
    tokens = _partition_tokens(df.sparkSession, n_partitions)
    if approximate:
        # scale path: cost-tiered range partition, then round-robin inside
        # each tier (monotonic ids are contiguous per partition, so
        # consecutive similar-cost rows alternate bins)
        # local (shuffle-free) sort so monotonic ids follow cost rank
        # inside each tier — without it, giants land on random bins and
        # collide; with it they round-robin like the exact mode
        ranged = df.repartitionByRange(
            n_partitions, F.desc(cost_col)
        ).sortWithinPartitions(F.desc(cost_col))
        rank = F.monotonically_increasing_id()
    else:
        # LOUD guard (round-2): the global no-partition window serializes
        # the whole input through one task. Fine for interactive/small
        # inputs; at corpus scale callers must pass approximate=True (the
        # pipeline default). The check is plan-free (cheap count only when
        # the input is already materialized is NOT worth a job — warn
        # unconditionally instead so the trade is visible in logs).
        warnings.warn(
            "balance_by_cost(approximate=False) sorts ALL rows through a "
            "single-partition window; use approximate=True beyond "
            f"~{EXACT_MODE_ROW_LIMIT:,} rows",
            stacklevel=2,
        )
        ranged = df
        rank = F.row_number().over(Window.orderBy(F.desc(cost_col)))
    # tokens were probed as LONGs; Murmur3 of int32 differs from int64,
    # so the literals must stay long for the bijection to hold
    tok_arr = F.array(*[F.lit(t).cast("long") for t in tokens])
    binned = ranged.withColumn(
        bin_col,
        F.element_at(tok_arr, (F.pmod(rank, F.lit(n_partitions)) + 1).cast("int")),
    )
    return binned.repartition(n_partitions, bin_col).drop(bin_col)
