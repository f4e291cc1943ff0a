"""Single-process pure-Python reference oracle (FIXTURES.md §5).

Computes the expected per-document ordered span sequence the way the
reference would: an eager per-document loop mirroring
/root/reference/src/pipelines/ocr.py:45-78 (per-file OCR) and
/root/reference/src/pipelines/entity.py:37-73 (per-page entity pass) — no
Spark. Media spans resolve through `media_truth_text` (the ground truth the
renderer drew), NOT through the OCR kernel: the oracle is independent of the
kernel, so a kernel regression fails the equality test instead of shifting
both sides.
"""

from __future__ import annotations

from ner_ocr_spark import corpus
from ner_ocr_spark.kernels.ner import GazetteerTagger
from ner_ocr_spark.kernels.normalize import normalize_text


def expected_spans(doc_id: str, heavy: bool = False) -> list[dict]:
    """Ordered [(kind, text, media_ref)] rows for one document."""
    out: list[dict] = []
    for span in corpus.doc_spans(doc_id, heavy=heavy):
        if span["kind"] == "text":
            t = normalize_text(span["text"])
            if t:
                out.append({"kind": "text", "text": t, "media_ref": None})
        else:
            for line in corpus.media_truth_text(span["media_ref"]):
                t = normalize_text(line)
                if t:
                    out.append(
                        {"kind": "media", "text": t, "media_ref": span["media_ref"]}
                    )
    return out


def expected_entities(doc_id: str, heavy: bool = False) -> list[dict]:
    """Per-span entity matches in span order (entity pass over the same
    sequence)."""
    tagger = GazetteerTagger(corpus.GAZETTEER)
    out = []
    for i, span in enumerate(expected_spans(doc_id, heavy=heavy)):
        ents, bio = tagger.tag(span["text"])
        out.append(
            {
                "order": i,
                "entities": [
                    {"entity_type": e.entity_type, "surface": e.surface,
                     "start": e.start, "end": e.end}
                    for e in ents
                ],
                "bio": bio,
            }
        )
    return out
