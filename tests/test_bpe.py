"""BPE induction + tokenization semantics (operators/bpe.py): the greedy
merge loop, the '|'-prefix token encoding (back-to-back merges, multi-char
anchor safety, word-boundary isolation), and Spark-vs-python agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_ocr_spark.operators.bpe import (
    learn_bpe,
    n_tokens_expr,
    tokenize_expr,
)


def _tok(spark, text: str, merges) -> tuple[str, int]:
    row = spark.range(1).select(
        tokenize_expr(F.lit(text), merges).alias("t"),
        n_tokens_expr(F.lit(text), merges).alias("n"),
    ).collect()[0]
    return row["t"], row["n"]


def test_learn_bpe_greedy_order():
    # (a,b) pairs appear 6x weighted; after merging, (ab,ab) appears 3x
    merges = learn_bpe([("abab", 3), ("cd", 1)], num_merges=3)
    assert merges[:2] == [("a", "b"), ("ab", "ab")]


def test_learn_bpe_tie_breaks_lexicographically():
    # 'ba' and 'ab' both occur twice: the lexicographically smaller pair
    # ('a','b') must win the tie deterministically
    merges = learn_bpe([("ab", 2), ("ba", 2)], num_merges=1)
    assert merges == [("a", "b")]


def test_back_to_back_merges_apply(spark):
    """'abab' with merges (a,b) then (ab,ab) must become ONE token — the
    reason for the '|'-prefix encoding (a space-separated encoding's
    single-pass replace consumes the boundary and misses the second
    occurrence)."""
    merges = [("a", "b"), ("ab", "ab")]
    t, n = _tok(spark, "abab", merges)
    assert (t, n) == ("abab", 1)
    t, n = _tok(spark, "ababab", merges)
    assert (t, n) == ("abab ab", 2)


def test_multichar_token_never_false_matches(spark):
    """After merging (x,a), the token 'xa' followed by 'b' must NOT match
    a later (a,b) merge — the '|' anchors token starts."""
    merges = [("x", "a"), ("a", "b")]
    t, n = _tok(spark, "xab", merges)
    assert (t, n) == ("xa b", 2)
    t, n = _tok(spark, "ab", merges)
    assert (t, n) == ("ab", 1)


def test_merges_never_cross_word_boundaries(spark):
    merges = [("b", "a")]
    t, n = _tok(spark, "ab ba", merges)
    assert (t, n) == ("a b ba", 3)


def test_spark_matches_python_reference(spark):
    """The codegen replace chain must equal the classic per-word greedy
    merge loop on a mixed corpus."""

    def py_bpe(text: str, merges) -> list[str]:
        out_tokens: list[str] = []
        for word in text.split(" "):
            sym = list(word)
            for a, b in merges:
                res, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(sym[i])
                        i += 1
                sym = res
            out_tokens.extend(sym)
        return out_tokens

    texts = ["the fast table sorts the data",
             "fast sort beats the table scan"]
    freqs: dict[str, int] = {}
    for text, f in zip(texts, (5, 3)):
        for w in text.split(" "):
            freqs[w] = freqs.get(w, 0) + f
    merges = learn_bpe(sorted(freqs.items()), num_merges=6)
    assert len(merges) == 6
    for text in texts:
        t, n = _tok(spark, text, merges)
        want = py_bpe(text, merges)
        assert t == " ".join(want)
        assert n == len(want)


def test_unsplit_word_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsplit"):
        learn_bpe([("two words", 1)], num_merges=1)
