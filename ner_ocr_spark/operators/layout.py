"""Layout/windowing operators (SURVEY.md §2.4 A3-A5, §2.5 W1-W4).

The reference's reading-order markdown assembly
(/root/reference/src/pipelines/entity.py:77-134): sort by (y,x), group into
lines when the running y-gap exceeds line_threshold, x-sort within lines,
join tokens with 3 spaces, detect paragraph gaps between line means. All
expressed as window SQL — lag + cumulative sum sessionization + ordered
collect_list; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    gap: float,
    session_col: str = "session_id",
) -> DataFrame:
    """W2: start a new group when the ordered value jumps by more than
    `gap` from the PREVIOUS ROW's value (running comparison, not group
    anchor — the reference quirk at
    /root/reference/src/pipelines/entity.py:104-122). session ids are
    0-based per partition."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    lagged = F.lag(order_col).over(w)
    new_grp = F.when(
        lagged.isNull() | (F.abs(F.col(order_col) - lagged) <= gap), F.lit(0)
    ).otherwise(F.lit(1))
    return df.withColumn(
        session_col,
        F.sum(new_grp).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def group_lines(
    regions: DataFrame,
    line_threshold: float,
    doc_cols: list[str] | None = None,
) -> DataFrame:
    """W1+W2+W3+A3+A4: regions(y, x, text) -> one row per line with
    line_id, avg_y, x-sorted text joined by 3 spaces (the reference's
    separator, /root/reference/src/pipelines/entity.py:131)."""
    doc_cols = doc_cols or ["doc_id"]
    # order by y (W1); x ordering happens inside the line via sort_array
    # (the expression form — ArraySort's default comparator is an
    # interpreted lambda per comparison; identical ordering for struct
    # elements, round 6)
    with_ids = sessionize(regions, doc_cols, "y", line_threshold, "line_id")
    line_text = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("x"), F.col("text")))),
            lambda s: s["text"],
        ),
        "   ",
    )
    return (
        with_ids.groupBy(*doc_cols, "line_id")
        .agg(F.avg("y").alias("avg_y"), line_text.alias("line_text"))
    )


def assemble_page_text(
    lines: DataFrame,
    gap_threshold: float,
    doc_cols: list[str] | None = None,
) -> DataFrame:
    """W4+A5: join lines with newline, inserting 3 blank lines when the
    avg_y gap between consecutive lines exceeds gap_threshold (the
    reference emits ["","",""], i.e. 4 newlines,
    /root/reference/src/pipelines/entity.py:124-134)."""
    doc_cols = doc_cols or ["doc_id"]
    w = Window.partitionBy(*doc_cols).orderBy("line_id")
    with_gap = lines.withColumn(
        "prefix",
        F.when(
            F.lag("avg_y").over(w).isNotNull()
            & ((F.col("avg_y") - F.lag("avg_y").over(w)) > gap_threshold),
            F.lit("\n\n\n"),
        ).otherwise(F.lit("")),
    )
    page_text = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("line_id", "prefix", "line_text"))
            ),
            lambda s: F.concat(s["prefix"], s["line_text"]),
        ),
        "\n",
    )
    return with_gap.groupBy(*doc_cols).agg(page_text.alias("page_text"))


def to_markdown(
    regions: DataFrame,
    line_threshold: float = 10.0,
    gap_threshold: float = 50.0,
    doc_cols: list[str] | None = None,
) -> DataFrame:
    """Full _to_markdown pipeline (reference
    /root/reference/src/pipelines/entity.py:77-134): regions -> page text."""
    return assemble_page_text(
        group_lines(regions, line_threshold, doc_cols), gap_threshold, doc_cols
    )
