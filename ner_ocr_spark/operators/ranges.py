"""Interval (range) join — the operator Spark has no native form for.

A point-in-interval join (`p.ts BETWEEN i.start AND i.end`) is a theta
join: Spark executes it as BroadcastNestedLoopJoin (small side) or a
cartesian product per key — O(|points| x |intervals|) comparisons, a
scale-killer the moment neither side broadcasts. The standard fix is
TIME BUCKETING: each interval explodes to the buckets it covers (bounded
by interval_length / bucket + 1 rows), each point maps to exactly ONE
bucket, the join becomes an EQUI-join on (keys..., bucket), and the exact
BETWEEN predicate refines afterwards. A (point, interval) pair can only
meet in the point's single bucket, so no dedup pass is needed.

Pick `bucket` near the typical interval length: much smaller multiplies
the interval fan-out; much larger degrades bucket selectivity toward the
cartesian it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket: int = 3600,
    how: str = "inner",
    max_fanout: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row (matching `keys`, when
    given) whose [start, end] (inclusive) contains the point's timestamp.
    Columns of both inputs are preserved; name them apart upstream.
    how='inner' only — the bucket trick gives matched pairs; outer
    semantics need an anti-join against the matched set.

    `max_fanout` fails FAST per row instead of letting one pathological
    interval (an open-ended sentinel end date, end < start corruption)
    materialize a multi-million-element bucket array and OOM the stage;
    raise it deliberately for genuinely long intervals, or pre-split them."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    keys = keys or []
    lo = F.floor(F.col(start_col) / bucket)
    hi_raw = F.floor(F.col(end_col) / bucket)
    hi = F.when(
        (F.col(end_col) >= F.col(start_col))
        & (hi_raw - lo < F.lit(int(max_fanout))),
        hi_raw,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"interval_join: interval exceeds max_fanout={max_fanout} "
                      f"buckets (bucket={bucket}) or end < start: start="),
                F.col(start_col).cast("string"),
                F.lit(" end="), F.col(end_col).cast("string"),
            )
        ).cast("long")
    )
    b_iv = intervals.withColumn("_b", F.explode(F.sequence(lo, hi)))
    b_pts = points.withColumn("_b", F.floor(F.col(point_ts) / bucket))
    joined = b_pts.join(b_iv, [*keys, "_b"])
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    ).drop("_b")
