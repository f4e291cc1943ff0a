"""Property-based tests (hypothesis) for the pure kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_ocr_spark.kernels.fuzzy import partial_ratio
from ner_ocr_spark.kernels.ner import GazetteerTagger
from ner_ocr_spark.kernels.normalize import normalize_text
from ner_ocr_spark.png import decode_gray, encode_gray

text_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    max_size=200,
)


@given(text_st)
def test_normalize_idempotent(t):
    once = normalize_text(t)
    assert normalize_text(once) == once


@given(text_st)
def test_normalize_no_edge_space(t):
    n = normalize_text(t)
    # the pinned edge class is ASCII (space/tab/newline/VT/FF/CR) — what
    # Java regex and RE2 \s-style classes can match; unicode spaces like
    # \xa0 are deliberately PRESERVED so the python twin, the JVM
    # expression, and the DuckDB oracle agree byte-for-byte
    assert n == n.strip(" \t\n\x0b\f\r")
    assert "  " not in n


@given(text_st, text_st)
def test_partial_ratio_bounds_and_identity(a, b):
    r = partial_ratio(a, b)
    assert 0.0 <= r <= 1.0
    if a:
        assert partial_ratio(a, a) == 1.0


@given(st.text(alphabet="AB C", min_size=1, max_size=60))
def test_substring_scores_one(t):
    padded = f"XX {t} YY"
    assert partial_ratio(t, padded) == 1.0


@given(st.lists(st.sampled_from(["ALICE", "BOB", "LONDON", "THE", "DOG"]),
                min_size=0, max_size=20))
def test_bio_alignment(tokens):
    tagger = GazetteerTagger([("ALICE", "PERSON"), ("LONDON", "CITY")])
    text = " ".join(tokens)
    ents, bio = tagger.tag(text)
    tags = bio.split() if bio else []
    assert len(tags) == len(text.split())
    for e in ents:
        assert text[e.start:e.end] == e.surface


@settings(max_examples=25)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(decode_gray(encode_gray(img)), img)
