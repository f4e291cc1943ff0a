"""Progressive JPEG (SOF2) decode — round-2 verdict #4, the largest codec
gap for a real crawl corpus (~10-20% progressive).

Verification strategy: progressive transmits the SAME quantized
coefficients as baseline, so `decode(encode_progressive(img)) ==
decode(encode(img))` must hold PIXEL-EXACTLY (the reconstruction uses the
bitwise-identical IDCT). The encoder and decoder implement Annex G from
opposite directions (scan scripts/correction-bit buffering vs coefficient
accumulation), so a shared symmetric bug would have to be wrong the same
way twice across four scan kinds and three scripts.
"""

from __future__ import annotations

import numpy as np
import pytest

from ner_ocr_spark import corpus, jpeg
from ner_ocr_spark.imageio import decode_image_gray
from ner_ocr_spark.kernels import ocr
from ner_ocr_spark.png import decode_gray as png_decode_gray

SPECTRAL_ONLY = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)]
DEEP_SA = [  # 3-level successive approximation, split bands
    ([0], 0, 0, 0, 2),
    ([0], 1, 8, 0, 3), ([0], 9, 63, 0, 3),
    ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
    ([0], 0, 0, 1, 1), ([0], 0, 0, 1, 0),
]


def _rand(shape, seed=7):
    return (np.random.RandomState(seed).rand(*shape) * 255).astype(np.uint8)


@pytest.mark.parametrize("shape,sub", [
    ((41, 67), "444"),          # gray, non-multiple-of-8 dims
    ((33, 50, 3), "444"),       # color 4:4:4
    ((37, 45, 3), "420"),       # color 4:2:0 (interleaved DC over MCUs)
])
def test_progressive_equals_baseline_default_script(shape, sub):
    img = _rand(shape)
    base = jpeg.decode(jpeg.encode(img, quality=85, subsampling=sub))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=85, subsampling=sub))
    assert np.array_equal(base, prog)


def test_progressive_spectral_selection_only():
    img = _rand((40, 40), seed=42)
    base = jpeg.decode(jpeg.encode(img, quality=90))
    prog = jpeg.decode(
        jpeg.encode_progressive(img, quality=90, scan_script=SPECTRAL_ONLY)
    )
    assert np.array_equal(base, prog)


def test_progressive_deep_successive_approximation():
    """Three refinement levels per coefficient: every AC/DC refine path
    runs twice with different bit positions."""
    img = _rand((56, 72), seed=3)
    base = jpeg.decode(jpeg.encode(img, quality=90))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=90, scan_script=DEEP_SA))
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_span_blocks():
    """A flat image makes every AC band empty -> EOB runs cover many
    blocks (the EOBRUN>1 decoder path + the encoder's deferred-bit
    buffer)."""
    img = np.full((128, 128), 200, np.uint8)
    base = jpeg.decode(jpeg.encode(img, quality=85))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=85))
    assert np.array_equal(base, prog)


def test_progressive_smooth_gradient_color():
    g = np.add.outer(np.arange(48), np.arange(64)).astype(np.uint8)
    img = np.dstack([g, g[::-1], np.roll(g, 7, axis=1)])
    base = jpeg.decode(jpeg.encode(img, quality=92, subsampling="420"))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=92, subsampling="420"))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("i", range(2))
def test_ocr_exact_on_progressive_jpeg_pages(i):
    """The full path a crawl corpus exercises: progressive JPEG blob ->
    imageio sniff -> SOF2 decode -> OCR span extraction, output exact."""
    ref = f"doc{i:08d}/m0"
    truth = "\n".join(corpus.media_truth_text(ref))
    gray = png_decode_gray(corpus.render_media_blob(ref))
    blob = jpeg.encode_progressive(gray, quality=95)
    assert decode_image_gray(blob).shape == gray.shape
    got, score = ocr.ocr_text(blob)
    assert got == truth
    assert score > 0.8


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_markers_baseline_and_progressive(ri):
    """DRI/RSTn resync layout (camera JPEGs): predictors and EOB runs
    reset at every marker; output must equal the unrestarted encoding."""
    rng = np.random.RandomState(11)
    g = (rng.rand(48, 80) * 255).astype(np.uint8)
    c = (rng.rand(37, 61, 3) * 255).astype(np.uint8)
    for img, sub in ((g, "444"), (c, "420")):
        plain = jpeg.decode(jpeg.encode(img, quality=88, subsampling=sub))
        assert np.array_equal(plain, jpeg.decode(
            jpeg.encode(img, quality=88, subsampling=sub, restart_interval=ri)))
        assert np.array_equal(plain, jpeg.decode(
            jpeg.encode_progressive(img, quality=88, subsampling=sub,
                                    restart_interval=ri)))


def test_truncated_progressive_absorbs():
    blob = jpeg.encode_progressive(_rand((32, 32)), quality=90)
    assert ocr.ocr_text(blob[: len(blob) // 3]) == ("", 0.0)
