"""Normalizer as Spark column expressions (JVM-side, whole-stage codegen).

Identical semantics to kernels/normalize.normalize_text — the SQL-expressible
half of the shared normalizer (SURVEY.md §2.2 P3/P4: blank filter + coalesce;
north rule: boilerplate strip). Pinned against the python version by tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_expr(col: Column) -> Column:
    """Strip [[boilerplate]], collapse space runs, trim around newlines and
    at the ends. NULL-safe: returns '' for NULL input (P4 coalesce)."""
    t = F.coalesce(col, F.lit(""))
    t = F.regexp_replace(t, r"\[\[.*?\]\]", "")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    return F.trim(t)


def coalesce_text_expr(transformer_text: Column, text: Column) -> Column:
    """Reference P4: `transformer_text or text or ""` — python `or` treats
    empty string as falsy, so empty strings must null out before coalesce
    (/root/reference/src/pipelines/entity.py:94)."""
    return F.coalesce(
        F.nullif(F.trim(F.coalesce(transformer_text, F.lit(""))), F.lit("")),
        F.nullif(F.trim(F.coalesce(text, F.lit(""))), F.lit("")),
        F.lit(""),
    )
