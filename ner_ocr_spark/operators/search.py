"""Search operators over OCR region tables (SURVEY.md §3.1 step 4b).

The reference's RPAProcessor.search (/root/reference/src/rpa.py:331-374)
re-expressed over a long-form regions DataFrame
(doc_id, page, region_idx, text, x1, y1, x2, y2, score):

  * positional_query — J2: literal-rect filter (spatial.positional_search)
  * semantic_query   — J3: fuzzy-score every region (Arrow-batched pandas
    UDF), threshold -> matches; then keep every region on the same
    (doc_id, page) whose rect intersects ANY match's rect padded by
    search_padding — a broadcast left-semi join with equi keys + theta
    condition. The reference `break`s on first hit (no duplicates) and
    preserves page order; the semi join + region_idx give the same rows
    and order.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ner_ocr_spark.operators.spatial import positional_search, rect_intersects

DOC_KEYS = ["doc_id", "page"]


def fuzzy_score_udf(query_text: str):
    """Vectorized partial-ratio scorer vs a constant query (F2). The query
    rides the closure; difflib state is per-call."""

    @pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        from ner_ocr_spark.kernels.fuzzy import score

        return texts.map(lambda t: score(t, query_text))

    return _score


def fuzzy_prefilter_expr(
    text_col: Column, query_text: str, threshold: float, mode: str = "fast"
) -> Column:
    """JVM-side gate evaluated BELOW the Arrow UDF so only plausible rows
    pay the O(n*m) difflib cost (the round-1 scale-killer: unbounded
    per-row Python over every region). All codegen — one replace+length per
    distinct query character plus one contains() per query token.

    mode='admissible' — character-multiset bound only, PROVABLY never drops
    a true match: partial_ratio's best window ratio is 2M/(len(s)+L) with
    M <= I (the char-multiset intersection), maximized at L=I, so
    score <= 2I/(len(s)+I); keep iff I*(2-thr) >= thr*len(s). On prose
    corpora this eliminates only ~25% (English text shares most characters).

    mode='fast' (default) — additionally requires >= ceil(T*(2*thr-1)) of
    the T query tokens (len>=3) to be PRESENT, where "present" means the
    text contains at least one 4-gram of the token (not the verbatim
    token: OCR-noisy text like 'vvindow rnerge spark' scores 0.889 against
    'window merge spark' and must pass — a verbatim-token gate drops it,
    the round-2 self-review catch). HEURISTIC still: a true match where
    every 4-gram of ceil(T*(2thr-1)) tokens is corrupted can be dropped —
    that needs 2+ edits inside every window of those tokens while 80% of
    characters still align overall. ~89% of corpus rows eliminated. Use
    mode='admissible' when exactness under adversarial text matters more
    than the ~9x UDF fan-in reduction."""
    q = (query_text or "").lower()
    if not q or threshold <= 0:
        return F.lit(True)
    t = F.lower(F.coalesce(text_col, F.lit("")))
    tlen = F.length(t)
    inter: Column = F.lit(0)
    for ch, qn in Counter(q).items():
        # occurrences of ch in t = len(t) - len(t with ch removed)
        tn = tlen - F.length(F.replace(t, F.lit(ch), F.lit("")))
        inter = inter + F.least(tn, F.lit(qn))
    shorter = F.least(tlen, F.lit(len(q)))
    gate = (inter.cast("double") * F.lit(2.0 - threshold)) >= (
        F.lit(float(threshold)) * shorter
    )
    if mode == "fast":
        toks = [w for w in q.split() if len(w) >= 3]
        need = math.ceil(len(toks) * (2.0 * threshold - 1.0))
        if toks and need > 0:
            hits: Column = F.lit(0)
            for w in toks:
                grams = (
                    [w[i:i + 4] for i in range(len(w) - 3)] if len(w) >= 4
                    else [w]
                )
                present = F.contains(t, F.lit(grams[0]))
                for g in grams[1:]:
                    present = present | F.contains(t, F.lit(g))
                hits = hits + present.cast("int")
            gate = gate & (hits >= F.lit(need))
    return gate


def positional_query(
    regions: DataFrame, x1: float, y1: float, x2: float, y2: float
) -> DataFrame:
    """J2 with reference coord normalization (min/max swap tolerated)."""
    return positional_search(regions, x1, y1, x2, y2)


def semantic_query(
    regions: DataFrame,
    query_text: str,
    threshold: float = 0.75,
    search_padding: float = 50.0,
    keys: list[str] | None = None,
    prefilter: str | None = "fast",
) -> DataFrame:
    """J3: fuzzy stage + spatial neighbourhood expansion.

    Defaults mirror SemanticQuery (/root/reference/src/custom_types/data.py:61-68).
    The match side is small (thresholded) -> broadcast; the big side never
    shuffles. The admissible JVM prefilter (fuzzy_prefilter_expr) sits
    BELOW the Arrow UDF so only plausible rows ever cross into Python."""
    keys = keys if keys is not None else DOC_KEYS
    scored = regions
    if prefilter:
        scored = scored.filter(
            fuzzy_prefilter_expr(F.col("text"), query_text, threshold, prefilter)
        )
    scored = scored.withColumn(
        "fuzzy_score", fuzzy_score_udf(query_text)(F.col("text"))
    )
    matches = scored.filter(F.col("fuzzy_score") >= threshold).select(
        *keys,
        F.col("x1").alias("mx1"), F.col("y1").alias("my1"),
        F.col("x2").alias("mx2"), F.col("y2").alias("my2"),
    )
    cond = rect_intersects(
        F.col("mx1"), F.col("my1"), F.col("mx2"), F.col("my2"),
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
        pad=search_padding,
    )
    on = [regions[k] == matches[k.replace(".", "_")] for k in keys] + [cond]
    return regions.join(F.broadcast(matches), on=on, how="left_semi")


def search(
    regions: DataFrame,
    search_type: str,
    task: str | None = None,
    **query,
) -> DataFrame:
    """Dispatch mirroring /root/reference/src/rpa.py:331-358, tagging the
    result with search_type/search_task literal columns (SearchResult
    analog, /root/reference/src/custom_types/data.py:42-48)."""
    if search_type == "positional":
        out = positional_query(
            regions, query["x1"], query["y1"], query["x2"], query["y2"]
        )
    elif search_type == "semantic":
        out = semantic_query(
            regions,
            query["text"],
            threshold=query.get("threshold", 0.75),
            search_padding=query.get("search_padding", 50.0),
            prefilter=query.get("prefilter", "fast"),
        )
    else:
        raise ValueError(f"Unsupported search type: {search_type}")
    return out.withColumn("search_type", F.lit(search_type)).withColumn(
        "search_task", F.lit(task).cast("string")
    )
