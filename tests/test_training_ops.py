"""Training-data pipeline operators beyond dedup: deterministic sampling,
sequence packing, benchmark decontamination, and the Gopher quality filter
(driver brief; value-oracled in __spark_entry__, semantics pinned here)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ner_ocr_spark.operators.decontam import ngram_overlap
from ner_ocr_spark.operators.packing import pack_sequences, shard_hash_md5
from ner_ocr_spark.operators.sampling import (
    hash_sample,
    sample_per_stratum,
    stratified_sample,
    unit_hash_md5,
    unit_hash_xx,
)
from ner_ocr_spark.operators.textstats import gopher_filter


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, ["en", "de", "fr", "es"][i % 4],
         " ".join(f"w{(i * 31 + j) % 97}" for j in range(5 + i % 20)))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# -- sampling -----------------------------------------------------------------


@pytest.mark.parametrize("unit_hash", [unit_hash_xx, unit_hash_md5])
def test_hash_sample_deterministic_and_nested(spark, corpus, unit_hash):
    s1 = {r["doc_id"] for r in
          hash_sample(corpus, 0.3, unit_hash=unit_hash).collect()}
    s2 = {r["doc_id"] for r in
          hash_sample(corpus, 0.3, unit_hash=unit_hash).collect()}
    assert s1 == s2  # reproducible across runs (retried tasks included)
    small = {r["doc_id"] for r in
             hash_sample(corpus, 0.1, unit_hash=unit_hash).collect()}
    assert small <= s1  # rate increase only ADDS rows (nested samples)
    assert 0.15 < len(s1) / 400 < 0.45  # loose binomial bounds


def test_hash_sample_seed_changes_rows(spark, corpus):
    a = {r["doc_id"] for r in hash_sample(corpus, 0.3, seed=0).collect()}
    b = {r["doc_id"] for r in hash_sample(corpus, 0.3, seed=1).collect()}
    assert a != b


def test_stratified_sample_respects_rates(spark, corpus):
    out = stratified_sample(
        corpus, {"en": 1.0, "de": 0.0}, default_rate=0.5, seed=7
    ).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in out}
    assert counts["en"] == 100  # rate 1.0 keeps every en row
    assert "de" not in counts  # rate 0.0 drops all
    for lang in ("fr", "es"):  # default rate applies to the rest
        assert 25 < counts[lang] < 75


def test_sample_per_stratum_exact_k_and_stable(spark, corpus):
    out = sample_per_stratum(corpus, k=7, seed=3)
    counts = {r["lang"]: r["count"]
              for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7, "es": 7}
    again = sample_per_stratum(corpus, k=7, seed=3)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # k above the stratum size degrades to the whole stratum
    tiny = corpus.filter(F.col("doc_id") < 6)
    assert sample_per_stratum(tiny, k=100).count() == 6


def test_sampling_is_shuffle_free(spark, corpus):
    from tests.test_plans import _executed

    for df in (hash_sample(corpus, 0.3),
               stratified_sample(corpus, {"en": 0.5}, default_rate=0.1)):
        assert "Exchange" not in _executed(df)


# -- sequence packing ---------------------------------------------------------


def test_pack_sequences_offsets_are_contiguous_per_shard(spark, corpus):
    rows = pack_sequences(corpus, budget=64, shards=4,
                          shard_hash=shard_hash_md5).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(rows) == 400 and len(by_shard) == 4
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in shard_rows:
            assert r["start_offset"] == offset  # end-to-end, no gaps/overlap
            assert r["n_tokens"] >= 1
            assert r["seq_first"] == offset // 64
            assert r["seq_last"] == (offset + r["n_tokens"] - 1) // 64
            assert r["seq_last"] >= r["seq_first"]
            offset += r["n_tokens"]


def test_pack_sequences_spanning_doc(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["x"] * 10)), (1, " ".join(["y"] * 100))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, budget=32, shards=1).collect()}
    assert got[0]["seq_first"] == 0 and got[0]["seq_last"] == 0
    # doc 1: tokens 10..109 -> sequences 0..3 (a doc may SPAN sequences)
    assert got[1]["start_offset"] == 10
    assert got[1]["seq_first"] == 0 and got[1]["seq_last"] == 109 // 32


# -- decontamination ----------------------------------------------------------


def test_ngram_overlap_flags_shared_grams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all"),
            (3, "QUICK   Brown\tFOX is here"),  # normalization must catch it
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appears")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in ngram_overlap(train, bench, n=3).collect()}
    assert got[1] == (1, 1)  # 'quick brown fox'
    assert got[2] == (0, 0)  # sentinel zero, not NULL
    assert got[3] == (1, 1)  # case/whitespace-normalized match
    assert len(got) == 3  # every train doc present


def test_ngram_overlap_broadcasts_eval_side(spark, corpus):
    from tests.test_plans import _executed

    ev = corpus.filter(F.col("doc_id") % 37 == 0)
    plan = _executed(ngram_overlap(corpus, ev, n=3))
    assert "BroadcastHashJoin" in plan


# -- gopher quality filter ----------------------------------------------------


def test_gopher_filter_rules_and_attribution(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog today"),  # clean
            (2, "one two"),  # too few words (and no stopword pair)
            (3, "the of " + " ".join(["zq"] * 40)),  # mean word len < 3
            (4, "#### @@@@ **** " + "the of and is on for with a to in"),
            (5, "the of 123 456 789 000 111"),  # alpha ratio too low
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert got[1]["keep"] == 1 and got[1]["reject_reasons"] == ""
    assert got[2]["keep"] == 0
    assert "word_count" in got[2]["reject_reasons"]
    assert got[3]["keep"] == 0
    assert "mean_word_len" in got[3]["reject_reasons"]
    assert got[4]["keep"] == 0
    assert "symbol_ratio" in got[4]["reject_reasons"]
    assert got[5]["keep"] == 0
    assert "alpha_ratio" in got[5]["reject_reasons"]
    # metrics sanity on the clean row
    r1 = got[1]
    assert r1["n_words"] == 10
    assert math.isclose(r1["alpha_ratio"], 1.0)
    assert r1["stopword_hits"] >= 2


def test_gopher_filter_is_shuffle_free(spark, corpus):
    from tests.test_plans import _executed

    assert "Exchange" not in _executed(gopher_filter(corpus))


# -- repetition stats ----------------------------------------------------------


def test_repetition_stats_flags_repetitive_docs(spark):
    from ner_ocr_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 30),            # one 2-gram dominates
            (2, " ".join(f"u{i}" for i in range(40))),  # all grams unique
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["keep"] == 0 and got[1]["top2_frac"] > 0.4
    assert got[1]["dup2_frac"] == 1.0  # every 2-gram repeats
    assert got[2]["keep"] == 1
    assert got[2]["top2_frac"] < 0.1 and got[2]["dup2_frac"] == 0.0


def test_repetition_stats_handles_tiny_docs(spark):
    from ner_ocr_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "word")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # sentinel fractions, never NULL; a single gram is trivially 'top'
    for r in rows.values():
        assert r["top2_frac"] == 1.0 and r["dup2_frac"] == 0.0


# -- int8 quantization ---------------------------------------------------------


def test_quantize_int8_roundtrip_error_bounded(spark):
    from ner_ocr_spark.operators.similarity import quantize_int8

    vecs = [(i, [math.sin(0.3 * i * (j + 1)) for j in range(16)])
            for i in range(1, 20)] + [(99, [0.0] * 16)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    for r in quantize_int8(emb).collect():
        scale = r["q_scale"]
        assert all(-127 <= q <= 127 for q in r["q"])
        for v, q in zip(r["embedding"], r["q"]):
            assert abs(v - q * scale / 127.0) <= scale / 127.0 / 2 + 1e-12
        if r["vec_id"] == 99:  # zero vector: scale sentinel 1, all-zero q
            assert scale == 1.0 and set(r["q"]) == {0}
        else:
            # max-|v| component hits exactly +-127 (symmetric full range)
            assert 127 in {abs(q) for q in r["q"]}


# -- pii scrubbing --------------------------------------------------------------


def test_scrub_pii_redacts_and_counts(spark):
    from ner_ocr_spark.operators.pii import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org and d@e.io now"),
            (2, "call (212) 555-0123 or +44 123-4567 or 555-9876"),
            (3, "server 192.168.1.254 and 10.0.0.1 up"),
            (4, "clean text, no pii, pi is 3.14159, v1.2.3 fine"),
            (5, "mixed bob@x.co at 10.1.2.3 dial 555-1000"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[1]["scrubbed"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[2]["n_email"], got[2]["n_ip"], got[2]["n_phone"]) == (0, 0, 3)
    assert got[2]["scrubbed"] == "call <PHONE> or <PHONE> or <PHONE>"
    assert (got[3]["n_email"], got[3]["n_ip"], got[3]["n_phone"]) == (0, 2, 0)
    assert got[3]["scrubbed"] == "server <IP> and <IP> up"
    # no false positives: dotted versions / decimals are not 4-octet quads
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[4]["scrubbed"] == got[4]["text"]
    assert (got[5]["n_email"], got[5]["n_ip"], got[5]["n_phone"]) == (1, 1, 1)
    assert got[5]["scrubbed"] == "mixed <EMAIL> at <IP> dial <PHONE>"


def test_scrub_pii_idempotent_and_shuffle_free(spark):
    from tests.test_plans import _executed

    from ner_ocr_spark.operators.pii import scrub_pii

    docs = spark.createDataFrame(
        [(1, "x a@b.cc 1.2.3.4 555-0000 y")], "doc_id long, text string"
    )
    once = scrub_pii(docs).select(F.col("scrubbed").alias("text"))
    twice = scrub_pii(once).collect()[0]
    assert twice["scrubbed"] == twice["text"]  # tokens never re-match
    assert (twice["n_email"], twice["n_ip"], twice["n_phone"]) == (0, 0, 0)
    assert "Exchange" not in _executed(scrub_pii(docs))


# -- chunking + term stats -------------------------------------------------------


def test_chunk_text_windows_cover_all_words(spark):
    from ner_ocr_spark.operators.textstats import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(30))),  # 30 words
         (2, "short doc"),                            # < size: one chunk
         (3, " ".join(f"u{i}" for i in range(12)))],  # exactly size
        "doc_id long, text string",
    )
    rows = chunk_text(docs, size=12, overlap=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # 30 words, step 8: starts 0,8,16,24 -> 4 chunks, tail is partial
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3]
    assert c1[0]["chunk_text"].split() == [f"t{i}" for i in range(12)]
    assert c1[1]["chunk_text"].split()[:4] == ["t8", "t9", "t10", "t11"]  # overlap
    assert c1[3]["chunk_words"] == 6  # 24..29
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(30)}  # nothing dropped
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_words"] == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_words"] == 12


def test_chunk_text_rejects_bad_overlap(spark):
    from ner_ocr_spark.operators.textstats import chunk_text

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text(docs, size=8, overlap=8)


def test_term_stats_df_idf(spark):
    from ner_ocr_spark.operators.textstats import term_stats

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in term_stats(docs).collect()}
    assert got["banana"]["doc_freq"] == 3 and got["banana"]["term_count"] == 3
    assert got["apple"]["doc_freq"] == 1 and got["apple"]["term_count"] == 2
    # BM25 idf: rarer terms score higher
    assert got["cherry"]["idf"] > got["banana"]["idf"]
    assert math.isclose(
        got["apple"]["idf"], math.log((3 - 1 + 0.5) / 1.5 + 1), rel_tol=1e-5
    )
    # min_df prunes the hapax tail
    pruned = {r["term"] for r in term_stats(docs, min_df=2).collect()}
    assert pruned == {"banana"}


# -- composed curation pipeline --------------------------------------------------


@pytest.fixture(scope="module")
def wordy_corpus(spark):
    """Unlike `corpus`, these docs contain stopwords (so the gopher
    stopword rule does not reject everything) and varied filler."""
    rows = [
        (i, ["en", "de"][i % 2],
         "the quick fox and dog went to town "
         + " ".join(f"w{(i * 13 + j) % 53} stone" for j in range(4 + i % 9)))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_curation_pipeline_composes(spark, wordy_corpus):
    from ner_ocr_spark.curation import curate
    from ner_ocr_spark.operators.textstats import gopher_filter

    out = curate(wordy_corpus, {"en": 1.0, "de": 1.0}, default_rate=1.0,
                 budget=64, shards=2)
    rows = out.collect()
    # rate 1.0 everywhere: survivors == quality&repetition&dedup keepers
    kept_q = {r["doc_id"] for r in
              gopher_filter(wordy_corpus).filter("keep = 1").collect()}
    got_ids = {r["doc_id"] for r in rows}
    assert got_ids <= kept_q and len(got_ids) > 0
    # packing invariant holds on the curated survivors
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in shard_rows:
            assert r["start_offset"] == offset
            offset += r["n_tokens"]
    # deterministic end to end
    again = {(r["doc_id"], r["start_offset"]) for r in
             curate(wordy_corpus, {"en": 1.0, "de": 1.0}, default_rate=1.0,
                    budget=64, shards=2).collect()}
    assert again == {(r["doc_id"], r["start_offset"]) for r in rows}


def test_curation_pipeline_dedups_exact_clones(spark):
    from ner_ocr_spark.curation import curate

    base = ("the quick brown fox is with a dog and they go to town "
            "for the day in good cheer")
    docs = spark.createDataFrame(
        [(1, "en", base), (2, "en", base.upper()),  # normalized clone
         (3, "en", base + " extra tail words here")],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"] for r in
           curate(docs, {"en": 1.0}, default_rate=1.0, shards=1).collect()}
    assert 1 in got and 2 not in got  # min-id canonical survives
    assert 3 in got


# -- funnel + retention ---------------------------------------------------------


def test_funnel_stage_semantics(spark, monkeypatch, tmp_path):
    """Ordered-funnel rules: steps must occur AFTER the previous step and
    within its 7-day window; out-of-order or late events do not convert."""
    import __spark_entry__ as e

    day = 86400
    rows = []

    def ev(u, t, typ):
        rows.append((len(rows), u, typ, float(len(rows)), t))

    ev("full", 10, "view"); ev("full", 20, "click"); ev("full", 30, "purchase")
    ev("late", 10, "view"); ev("late", 10 + 8 * day, "click")  # click too late
    ev("ooo", 50, "click"); ev("ooo", 60, "view")  # click BEFORE view
    ev("ooo", 70, "click"); ev("ooo", 80, "purchase")  # then a full run
    ev("v", 10, "view")  # stops at stage 1
    ev("none", 10, "error")  # never enters the funnel

    import pandas as pd
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "epoch"]
    )
    pdf["ts"] = pd.to_datetime(pdf.pop("epoch"), unit="s")
    pdf["props"] = "{}"
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(f"{src}/events.parquet")

    got = {r["user_id"]: r for r in e.q_funnel(spark, src).collect()}
    assert got["full"]["stage"] == 3 and got["full"]["t_purchase"] == 30
    assert got["late"]["stage"] == 1 and got["late"]["t_click"] == -1
    # ooo: first view at 60, first click after it at 70, purchase at 80
    assert got["ooo"]["stage"] == 3
    assert (got["ooo"]["t_view"], got["ooo"]["t_click"],
            got["ooo"]["t_purchase"]) == (60, 70, 80)
    assert got["v"]["stage"] == 1
    assert got["none"]["stage"] == 0 and got["none"]["t_view"] == -1


def test_retention_cohort_matrix(spark, tmp_path):
    import pandas as pd

    import __spark_entry__ as e

    week = 604800
    rows = [  # u1 cohort week 0, active weeks 0,1,3; u2 cohort 1, active 1
        (1, "u1", "view", 0.0, 100), (2, "u1", "view", 0.0, week + 5),
        (3, "u1", "view", 0.0, 3 * week + 5), (4, "u2", "view", 0.0, week + 9),
        (5, "u1", "click", 0.0, 110),  # same week, still one distinct user
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "epoch"]
    )
    pdf["ts"] = pd.to_datetime(pdf.pop("epoch"), unit="s")
    pdf["props"] = "{}"
    src = str(tmp_path / "ev2")
    spark.createDataFrame(pdf).write.parquet(f"{src}/events.parquet")

    got = {(r["cohort"], r["week_offset"]): r["n_users"]
           for r in e.q_retention(spark, src).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_repetition_stats_is_map_only(spark, corpus):
    """Round-6 shape: per-doc gram hashes sorted (sort_array, NOT the
    ArraySort HOF whose interpreted comparator was the real cost of the
    round-3 fold attempt) and folded in place — ZERO exchanges; counting
    still rides 64-bit xxhash grams, never gram strings."""
    from ner_ocr_spark.operators.textstats import repetition_stats

    plan = repetition_stats(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "Exchange" not in plan
    assert "sort_array" in plan
    # the sort must be the expression form: ArraySort's comparator lambda
    # is interpreted per COMPARISON (measured ~20x on this operator)
    assert "array_sort" not in plan


def test_repetition_stats_matches_exploded_form(spark, corpus):
    """The map-only fold must reproduce the round-3..5 explode+count
    semantics exactly — including NULL text (one NULL gram per n) and
    empty/whitespace-only docs (single partial gram)."""
    from pyspark.sql import functions as F

    from ner_ocr_spark.operators.textstats import repetition_stats, words_expr

    rows = [(1, "a a a a a a a a"), (2, ""), (3, "x"),
            (4, "b c b c b c d"), (5, None), (6, "  sp   out\tv\nm  "),
            (7, "q w e r t y u i o p " * 3), (8, "   "),
            (9, "one two one two one two one two two one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # reference: the pre-round-6 exploded implementation, inline
    words_col = "_w"
    base = df.select("doc_id", words_expr(F.col("text")).alias(words_col))

    def grams_all(n):
        w = F.col(words_col)
        k = F.greatest(F.size(w) - (n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice(w, i + 1, n), " ").alias("g")))

    exploded = base.select(
        "doc_id", F.explode(F.concat(grams_all(2), grams_all(3))).alias("ng")
    ).select("doc_id", F.col("ng.n").alias("n"),
             F.xxhash64("ng.n", "ng.g").alias("gh"))
    counts = exploded.groupBy("doc_id", "n", "gh").agg(F.count("*").alias("c"))

    def frac(num, den):
        return F.round(
            F.coalesce(num, F.lit(0)) / F.greatest(den, F.lit(1)).cast("double"), 4)

    stats = counts.groupBy("doc_id").agg(
        frac(F.max(F.when(F.col("n") == 2, F.col("c"))),
             F.sum(F.when(F.col("n") == 2, F.col("c")))).alias("top2_frac"),
        frac(F.sum(F.when((F.col("n") == 2) & (F.col("c") > 1), F.col("c"))),
             F.sum(F.when(F.col("n") == 2, F.col("c")))).alias("dup2_frac"),
        frac(F.max(F.when(F.col("n") == 3, F.col("c"))),
             F.sum(F.when(F.col("n") == 3, F.col("c")))).alias("top3_frac"))
    ref = stats.select(
        "doc_id", "top2_frac", "top3_frac", "dup2_frac",
        ((F.col("top2_frac") <= 0.20) & (F.col("top3_frac") <= 0.18)
         & (F.col("dup2_frac") <= 0.60)).cast("int").alias("keep"))

    a = {r[0]: tuple(r)[1:] for r in ref.collect()}
    b = {r[0]: tuple(r)[1:] for r in repetition_stats(df).collect()}
    assert a == b


def test_run_stats_zero_sentinel(spark):
    """The fold's zero prev-sentinel must not confuse a REAL leading 0
    hash: the guard-free merge relies on both branches coinciding at the
    first element (round-6 simplification)."""
    from pyspark.sql import functions as F

    from ner_ocr_spark.operators.textstats import _run_stats

    df = spark.createDataFrame([(1,)], "i long").select(
        _run_stats(F.expr("array(0L, 0L, 1L)")).alias("a"),
        _run_stats(F.expr("array(0L, 1L, 1L, 1L)")).alias("b"),
        _run_stats(F.expr("array(0L)")).alias("c"),
        _run_stats(F.expr("array(5L)")).alias("d"),
    )
    r = df.first()
    assert (r["a"]["mx"], r["a"]["dup"]) == (2, 2)
    assert (r["b"]["mx"], r["b"]["dup"]) == (3, 3)
    assert (r["c"]["mx"], r["c"]["dup"]) == (1, 0)
    assert (r["d"]["mx"], r["d"]["dup"]) == (1, 0)


# -- interval join --------------------------------------------------------------


def test_interval_join_semantics(spark):
    from ner_ocr_spark.operators.ranges import interval_join

    pts = spark.createDataFrame(
        [("u1", 1, 100), ("u1", 2, 7100), ("u1", 5, 7200),
         ("u1", 3, 10_000), ("u2", 4, 100)],
        "user_id string, pid long, epoch long",
    )
    ivs = spark.createDataFrame(
        # u1: [50, 7200] spans 3 buckets at bucket=3600; u2: disjoint
        [("u1", 10, 50, 7200), ("u2", 11, 5000, 6000)],
        "user_id string, iid long, s long, e long",
    )
    got = {(r["pid"], r["iid"]) for r in
           interval_join(pts, ivs, "epoch", "s", "e",
                         keys=["user_id"], bucket=3600).collect()}
    # boundaries inclusive (pid 5 at exactly e); points in a LATER bucket
    # of a spanning interval still match (pid 2); out-of-range (pid 3)
    # and same-user-required (u2's pid 4) both excluded
    assert got == {(1, 10), (2, 10), (5, 10)}
    rows = interval_join(pts, ivs, "epoch", "s", "e",
                         keys=["user_id"], bucket=3600).collect()
    assert len(rows) == 3  # no duplicate matches from bucket fan-out


def test_interval_join_rejects_pathological_intervals(spark):
    from ner_ocr_spark.operators.ranges import interval_join

    pts = spark.createDataFrame([(1, 100)], "pid long, epoch long")
    bad = spark.createDataFrame(
        [(10, 0, 253402300799)],  # year-9999 sentinel end
        "iid long, s long, e long",
    )
    with pytest.raises(Exception, match="max_fanout"):
        interval_join(pts, bad, "epoch", "s", "e", bucket=3600).collect()
    inverted = spark.createDataFrame([(11, 500, 100)], "iid long, s long, e long")
    with pytest.raises(Exception, match="end < start"):
        interval_join(pts, inverted, "epoch", "s", "e", bucket=3600).collect()


# --- temperature mixing (round 5) -------------------------------------------


def test_temperature_rates_and_sample(spark):
    """q_s ∝ p_s^tau as filter rates: the rarest stratum keeps 100%
    (rate 1.0), dominant strata downsample by (p_rare/p_s)^(1-tau), and
    the sampled row set is deterministic across runs."""
    from ner_ocr_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
        unit_hash_md5,
    )

    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {r["source"]: r for r in
             temperature_rates(df, "source", tau=0.5).collect()}
    assert rates["small"]["rate"] == 1.0
    # rate_big = (p_small / p_big)^(1 - tau) = (0.1/0.9)^0.5
    assert abs(rates["big"]["rate"] - (100 / 900) ** 0.5) < 1e-6
    a = sorted(r["doc_id"] for r in temperature_sample(
        df, "source", tau=0.5, unit_hash=unit_hash_md5).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(
        df, "source", tau=0.5, unit_hash=unit_hash_md5).collect())
    assert a == b and a  # deterministic, non-empty
    kept_small = sum(1 for i in a if i >= 1000)
    assert kept_small == 100  # rate 1.0 keeps every small-stratum row
    kept_big = len(a) - kept_small
    assert 0 < kept_big < 900  # genuinely downsampled
