"""Normalizer as Spark column expressions (JVM-side, whole-stage codegen).

Identical semantics to kernels/normalize.normalize_text — the SQL-expressible
half of the shared normalizer (SURVEY.md §2.2 P3/P4: blank filter + coalesce;
north rule: boilerplate strip). Pinned against the python version by tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# edge-whitespace class shared verbatim with kernels/normalize.py and the
# oracle SQL: F.trim strips ASCII spaces ONLY, so '\nabc' survives trim but
# not the python twin's strip — the explicit class keeps all three engines
# in lockstep (round-1 ADVICE)
EDGE_WS = r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$"

# whitespace-RUN class for collapse/split normalizers (dedup, fingerprint,
# token stats). Behaviorally identical to Java's \s, but DuckDB's RE2 \s
# does NOT match vertical tab (\x0B) — a VT in a document would silently
# hash-diverge every value-checked oracle built on the normalizer (round-2
# ADVICE). The explicit class keeps both engines in lockstep; the oracle
# SQL twins carry it verbatim.
WS_RUN = r"[ \t\n\x0B\f\r]+"


def normalize_expr(col: Column) -> Column:
    """Strip [[boilerplate]], collapse space runs, trim around newlines and
    at the ends. NULL-safe: returns '' for NULL input (P4 coalesce).

    Round 6: the first three regex passes are GUARDED by cheap contains()
    pre-checks — each pattern cannot match without its literal anchor
    ('[[' / a tab or double space / a newline), and replacing a lone ' '
    with ' ' is the identity, so the guarded form is value-identical
    (verified corpus-wide + adversarials) while most rows skip three
    regex rewrites (measured 2.15 -> 1.60 s over the sf1 text branch).
    Whole-stage codegen's subexpression elimination keeps the 3x tree
    references per stage from re-evaluating."""
    t = F.coalesce(col, F.lit(""))
    t = F.when(
        t.contains("[["), F.regexp_replace(t, r"\[\[.*?\]\]", "")
    ).otherwise(t)
    t = F.when(
        t.contains("  ") | t.contains("\t"),
        F.regexp_replace(t, r"[ \t]+", " "),
    ).otherwise(t)
    t = F.when(
        t.contains("\n"), F.regexp_replace(t, r" ?\n ?", "\n")
    ).otherwise(t)
    return F.regexp_replace(t, EDGE_WS, "")


def coalesce_text_expr(transformer_text: Column, text: Column) -> Column:
    """Reference P4: `transformer_text or text or ""` — python `or` treats
    empty string as falsy, so empty strings must null out before coalesce
    (/root/reference/src/pipelines/entity.py:94)."""
    return F.coalesce(
        F.nullif(F.trim(F.coalesce(transformer_text, F.lit(""))), F.lit("")),
        F.nullif(F.trim(F.coalesce(text, F.lit(""))), F.lit("")),
        F.lit(""),
    )


def refined_text_expr(transformer_text: Column, text: Column) -> Column:
    """Final span text: the enhanced (transformer) text wins when it
    normalizes non-blank, else the first-pass OCR text — P4 applied over
    NORMALIZED candidates so the choice can't differ between the JVM path
    and the fused python twin (a raw-non-blank transformer_text that
    normalizes to '' must fall through to `text` on both).

    Python twin (pinned by tests):
        normalize_text(transformer_text) or normalize_text(text)
    """
    return coalesce_text_expr(normalize_expr(transformer_text), normalize_expr(text))
