"""Fuzzy partial-ratio scorer (SURVEY.md §2.7 F2).

The reference scores regions with rapidfuzz's `fuzz.partial_ratio(a, b)/100`
(/root/reference/src/rpa.py:41-65). rapidfuzz is not in this container, so
this is a from-scratch implementation of the same published algorithm
family (fuzzywuzzy/rapidfuzz partial_ratio, MIT): align the shorter string
against same-length windows of the longer chosen from SequenceMatcher
matching blocks, return the best window's similarity ratio in [0, 1].

Pure stdlib difflib — deterministic, no C dependency. Batched by the pandas
UDF in operators/search.py.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def ratio(a: str, b: str) -> float:
    """Plain similarity ratio (2*M / (len(a)+len(b)))."""
    if not a and not b:
        return 1.0
    return SequenceMatcher(None, a, b).ratio()


def partial_ratio(a: str, b: str) -> float:
    """Best-matching-substring ratio in [0, 1].

    The shorter string slides over the longer; candidate windows come from
    the matching blocks of one global alignment (the classic fuzzywuzzy
    construction), plus the degenerate full-window fallback."""
    if not a or not b:
        return 1.0 if a == b else 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    # fast paths: equality and containment are the overwhelmingly common
    # hit cases at corpus scale and cost O(n) vs difflib's O(n*m)
    if shorter == longer or shorter in longer:
        return 1.0
    m = SequenceMatcher(None, shorter, longer)
    best = 0.0
    starts = {max(j - i, 0) for i, j, size in m.get_matching_blocks() if size}
    starts.add(0)
    for start in starts:
        window = longer[start : start + len(shorter)]
        r = SequenceMatcher(None, shorter, window).ratio()
        if r > 0.995:
            return 1.0
        best = max(best, r)
    return best


def score(text: str, query: str) -> float:
    """Reference semantics (/root/reference/src/rpa.py:58-63): lowercase
    both, partial_ratio, already normalized to [0, 1]."""
    return partial_ratio((text or "").lower(), (query or "").lower())
