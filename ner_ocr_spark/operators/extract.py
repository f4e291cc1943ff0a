"""mapInPandas stages: vectorized OCR and batched NER.

The engine's two Python-side operators (everything else is JVM-side SQL).
Both follow the Spark ML-inference pattern (SURVEY.md §2.8 M1-M6): state
built once per python worker, Arrow-batched iterators, per-row error
absorption into an `error` column (failures never kill the job,
/root/reference/src/pipelines/base.py:44-57 semantics), and an in-batch
wall-clock guard replacing the reference's thread-pool timeout
(/root/reference/src/utils.py:21-46).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import types as T

# one row per recognized OCR line (reference OCRResult analog, long form)
OCR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("line_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("box", T.ArrayType(T.DoubleType()), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

ENTITY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("entity_type", T.StringType(), False),
            T.StructField("surface", T.StringType(), False),
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )
)


def make_ocr_stage(
    blob_resolver: Callable[[str], bytes] | None = None,
    batch_timeout_s: float = 400.0,
    max_side_limit: int = 1500,
    min_score: float | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the OCR mapInPandas function.

    Input batches: (doc_id, span_idx, media_ref[, image_png]). If an
    `image_png` column is present (blobs joined upstream) it is used;
    otherwise `blob_resolver(media_ref)` fetches/synthesizes the bytes —
    the production shape, where media_ref points into an object store and
    the fetch happens executor-side (no image bytes ever shuffle).

    Output: OCR_SCHEMA, one row per recognized line, line_idx ordered
    top-to-bottom; a failed row degrades to a single (text=None, error=...)
    row so reassembly still sees the span (M6 error absorption).
    batch_timeout_s mirrors the reference's 400 s OCR budget
    (/root/reference/config.yaml:3): on breach, remaining rows in the batch
    emit timeout-error rows instead of running.
    """
    from ner_ocr_spark import corpus
    from ner_ocr_spark.kernels import ocr

    resolver = blob_resolver or (lambda ref: corpus.render_media_blob(ref))

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.monotonic()
            out: dict[str, list] = {k: [] for k in OCR_SCHEMA.fieldNames()}

            def emit(doc_id, span_idx, line_idx, text, media_ref, box, score, error):
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["line_idx"].append(line_idx)
                out["kind"].append("media")
                out["text"].append(text)
                out["media_ref"].append(media_ref)
                out["box"].append(box)
                out["score"].append(score)
                out["error"].append(error)

            has_png = "image_png" in pdf.columns
            for row in pdf.itertuples(index=False):
                if time.monotonic() - t0 > batch_timeout_s:
                    emit(row.doc_id, int(row.span_idx), 0, None, row.media_ref,
                         None, None, "timeout: batch OCR budget exceeded")
                    continue
                try:
                    png = row.image_png if has_png else resolver(row.media_ref)
                    lines = ocr.ocr_page(bytes(png), max_side_limit)
                    if not lines:
                        emit(row.doc_id, int(row.span_idx), 0, None,
                             row.media_ref, None, 0.0, None)
                    for li, lr in enumerate(lines):
                        if min_score is not None and lr.score < min_score:
                            continue
                        emit(row.doc_id, int(row.span_idx), li, lr.text,
                             row.media_ref, lr.box, float(lr.score), None)
                except Exception as e:  # noqa: BLE001 — M6 row-level absorption
                    emit(row.doc_id, int(row.span_idx), 0, None, row.media_ref,
                         None, None, f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return stage


def make_ner_stage(
    gazetteer: list[tuple[str, str]],
    text_col: str = "text",
    passthrough: T.StructType | None = None,
) -> tuple[Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]], T.StructType]:
    """Build the NER mapInPandas function + its output schema.

    Appends `entities` (array<struct>) and `bio` (tag string) to every input
    row. The gazetteer rides the closure (broadcast by Spark's task
    serialization — it is small); the token trie builds once per worker.
    """
    if passthrough is None:
        raise ValueError("passthrough schema required (input schema of the stage)")
    schema = T.StructType(
        list(passthrough.fields)
        + [T.StructField("entities", ENTITY_TYPE, True),
           T.StructField("bio", T.StringType(), True)]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ner_ocr_spark.kernels.ner import GazetteerTagger

        tagger = GazetteerTagger(gazetteer)
        for pdf in batches:
            ents_col, bio_col = [], []
            for text in pdf[text_col]:
                ents, bio = tagger.tag(text if isinstance(text, str) else "")
                ents_col.append(
                    [
                        {"entity_type": e.entity_type, "surface": e.surface,
                         "start": e.start, "end": e.end}
                        for e in ents
                    ]
                )
                bio_col.append(bio)
            pdf = pdf.copy()
            pdf["entities"] = ents_col
            pdf["bio"] = bio_col
            yield pdf

    return stage, schema
