"""BPE vocabulary induction + tokenization (training-data tier).

Spark-first split, the shape production tokenizer training actually uses
(HF tokenizers / SentencePiece train from an aggregated word-frequency
table, not from raw text):

  * word frequencies aggregate DISTRIBUTED — one map-side-combined
    shuffle over the corpus, the only step that touches 100 TB;
  * the greedy merge loop runs on the aggregated table, bounded by
    `max_words` (top-N by count, deterministic tie-break) — a few MB
    regardless of corpus size;
  * the learned merges fold into the APPLY path as literal chained
    `replace` expressions — pure whole-stage-codegen string ops, no
    python, trivially parallel; and into a generated DuckDB twin (the
    lsh_topk/ivf_topk oracle pattern: data-dependent constants become
    SQL literals).

Token-stream encoding: every non-space char is prefixed with '|'
(`regexp_replace(text, '([^ ])', '|$1')`), so a merge (a, b) is the
single-pass string replace '|a|b' -> '|ab'. The '|' prefix anchors each
token's START without consuming the next token's boundary — a
space-separated encoding cannot express back-to-back merges in one
non-overlapping replace pass (' a b a b ' consumes the middle space),
and the prefix form matches the classic left-to-right greedy merge
exactly. Spaces in the text act as natural word boundaries: '|a |b'
never matches '|a|b'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ner_ocr_spark.operators.dedup import normalize_for_dedup


def word_freq_table(
    df: DataFrame, text_col: str = "text", max_words: int = 20000
) -> DataFrame:
    """(word, freq) — normalized word frequencies, top `max_words` by
    (freq desc, word asc). The distributed step: explode + one
    map-side-combined groupBy shuffle; the limit bounds everything
    downstream."""
    words = df.select(
        F.explode(F.split(normalize_for_dedup(F.col(text_col)), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(max_words)
        .select(F.col("w").alias("word"), "freq")
    )


def learn_bpe(
    freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge induction over a word-frequency table: each round
    merges the most frequent adjacent symbol pair (ties broken by the
    lexicographically smallest pair — deterministic across engines).
    Input is the BOUNDED aggregated table, not the corpus; the loop is
    O(num_merges x vocab) on the driver by design (the standard
    tokenizer-training shape — see module docstring)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, f in freqs:
        if " " in word:
            # a space inside a "word" would induce merges the piped
            # replace encoding cannot express (spaces are the word
            # boundary and are never '|'-prefixed) — the freq table is
            # always space-split upstream, so this is a caller bug
            raise ValueError(f"learn_bpe got an unsplit word: {word!r}")
        if "|" in word:
            # '|' is the token-start sentinel of the piped-replace
            # encoding: a literal pipe in a word would be indistinguishable
            # from a marker downstream (tokenize_expr would silently drop
            # it and n_tokens_expr overcount), and the DuckDB twin applies
            # the identical transform — the value oracle cannot see the
            # corruption. Fail loudly instead (round-5 ADVICE).
            raise ValueError(
                f"learn_bpe got a word containing the '|' sentinel: {word!r}"
            )
        key = tuple(word)
        vocab[key] = vocab.get(key, 0) + int(f)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            # left-to-right single pass, skip both on merge — identical
            # to what a non-overlapping string replace of '|a|b' does
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def merges_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 24,
    max_words: int = 20000,
) -> list[tuple[str, str]]:
    """Distributed frequency aggregation + driver-side merge loop.
    The collect is the top-`max_words` AGGREGATE, bounded and tiny."""
    freqs = [
        (r["word"], r["freq"]) for r in word_freq_table(
            df, text_col, max_words
        ).collect()
    ]
    return learn_bpe(freqs, num_merges)


def _piped_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    s = F.regexp_replace(col, "([^ ])", r"|$1")
    for a, b in merges:
        s = F.replace(s, F.lit(f"|{a}|{b}"), F.lit(f"|{a}{b}"))
    return s


def tokenize_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Space-separated BPE tokens of a (normalized) text column — the
    learned merges applied as literal chained replaces, all codegen."""
    s = _piped_expr(col, merges)
    return F.trim(F.regexp_replace(F.replace(s, F.lit("|"), F.lit(" ")),
                                   " +", " "))


def n_tokens_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Token count = number of '|' markers after merging."""
    s = _piped_expr(col, merges)
    return (F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit("")))
            ).cast("long")


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def tokenize_sql(inner: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB expression twin of `_piped_expr` over SQL fragment `inner`
    (already normalized): the same merge chain with the merges as string
    literals."""
    s = f"regexp_replace({inner}, '([^ ])', '|\\1', 'g')"
    for a, b in merges:
        s = (f"replace({s}, '|{_sql_quote(a)}|{_sql_quote(b)}', "
             f"'|{_sql_quote(a)}{_sql_quote(b)}')")
    return s


def word_freqs_duckdb(
    con, source_sql: str, max_words: int = 20000
) -> list[tuple[str, int]]:
    """DuckDB twin of `word_freq_table` for oracle generation: identical
    normalization (pinned WS class), identical (freq desc, word asc) cut,
    so `learn_bpe` yields bitwise-identical merges on both engines."""
    rows = con.execute(
        f"""
        SELECT w AS word, count(*) AS freq FROM (
            SELECT unnest(string_split(trim(regexp_replace(lower(text),
                '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')) AS w
            FROM ({source_sql})
        ) WHERE w <> ''
        GROUP BY w ORDER BY freq DESC, word ASC LIMIT {int(max_words)}
        """
    ).fetchall()
    return [(w, int(f)) for w, f in rows]
