"""Spatial operators (SURVEY.md §2.3 J1-J3).

The reference's positional/semantic search over OCR regions
(/root/reference/src/rpa.py:67-99 rect-intersection, :259-293 positional,
:295-329 semantic neighbourhood) re-expressed as Catalyst column expressions
and joins. All pure JVM — the predicates fold into codegen; the semi-join's
small match side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rect_intersects(
    x1a: Column, y1a: Column, x2a: Column, y2a: Column,
    x1b: Column, y1b: Column, x2b: Column, y2b: Column,
    pad: float = 0.0,
) -> Column:
    """J1: axis-aligned rectangle intersection with padding on rect A
    (/root/reference/src/rpa.py:67-99). Touching edges count as
    intersecting (the reference uses strict > for separation)."""
    p = F.lit(float(pad))
    return ~(
        (x1a - p > x2b) | (x1b > x2a + p) | (y1a - p > y2b) | (y1b > y2a + p)
    )


def positional_search(
    regions: DataFrame, qx1: float, qy1: float, qx2: float, qy2: float
) -> DataFrame:
    """J2: filter regions whose (x1,y1,x2,y2) rect intersects the query
    rect; query coords normalize via min/max like the reference
    (/root/reference/src/rpa.py:275-279). A scalar predicate — constant-
    folded, pushed to the scan."""
    lx1, lx2 = min(qx1, qx2), max(qx1, qx2)
    ly1, ly2 = min(qy1, qy2), max(qy1, qy2)
    return regions.filter(
        rect_intersects(
            F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
            F.lit(lx1), F.lit(ly1), F.lit(lx2), F.lit(ly2),
        )
    )


def spatial_semi_join(
    regions: DataFrame, matches: DataFrame, pad: float = 0.0
) -> DataFrame:
    """J3 stage 2: keep every region intersecting ANY match rect padded by
    `pad` — left-semi (the reference `break`s on first hit, so no dups,
    /root/reference/src/rpa.py:319-327). Match side is small by
    construction -> broadcast; no shuffle of the big side."""
    m = F.broadcast(
        matches.select(
            F.col("x1").alias("mx1"), F.col("y1").alias("my1"),
            F.col("x2").alias("mx2"), F.col("y2").alias("my2"),
        )
    )
    cond = rect_intersects(
        F.col("mx1"), F.col("my1"), F.col("mx2"), F.col("my2"),
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
        pad=pad,
    )
    return regions.join(m, on=cond, how="left_semi")
