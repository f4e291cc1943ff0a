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

# one row per recognized OCR line (reference OCRResult analog, long form).
# transformer_text/transformer_score carry the enhancement second pass
# SEPARATELY from the first-pass text/score, mirroring OCRResult's dual
# columns (/root/reference/src/custom_types/data.py:20-21) so the P4
# coalesce downstream is real, not a no-op.
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
        T.StructField("transformer_text", T.StringType(), True),
        T.StructField("transformer_score", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

def ocr_ner_schema() -> T.StructType:
    """OCR_SCHEMA + the NER columns (fused-stage output)."""
    return T.StructType(
        list(OCR_SCHEMA.fields)
        + [T.StructField("entities", ENTITY_TYPE, True),
           T.StructField("bio", T.StringType(), True)]
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
    refine_below: float | None = None,
    gazetteer: list[tuple[str, str]] | None = None,
    kind_label: str = "media",
    pdf_rasterizer: Callable[[bytes, float], list[bytes]] | None = None,
    pdf_max_pages: int | None = None,
    pdf_zoom: float = 2.0,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the OCR mapInPandas function.

    Input batches: (doc_id, span_idx, media_ref[, image_png][, line_base]).
    If an `image_png` column is present (blobs joined upstream, or PDF
    pages rasterized upstream) it is used; a NULL image_png — and the
    column's absence — falls back to `blob_resolver(media_ref)`, the
    production shape where media_ref points into an object store and the
    fetch happens executor-side (no image bytes ever shuffle). An optional
    `line_base` column offsets the emitted line_idx — the PDF branch uses
    page_idx * 100000 so multi-page spans keep one global line order.

    Output: OCR_SCHEMA, one row per recognized line, line_idx ordered
    top-to-bottom; a failed row degrades to a single (text=None, error=...)
    row so reassembly still sees the span (M6 error absorption).
    batch_timeout_s mirrors the reference's 400 s OCR budget
    (/root/reference/config.yaml:3): on breach, remaining rows in the batch
    emit timeout-error rows instead of running.

    When `gazetteer` is given, the stage also normalizes each recognized
    line (python twin of operators/normalize.normalize_expr — pinned equal
    by tests) and appends entities/bio columns: media rows then cross the
    Python boundary exactly ONCE (OCR+normalize+NER fused) instead of
    OCR -> JVM normalize -> second python NER hop.

    When `pdf_rasterizer` is given, blobs sniffing as PDF (%PDF- magic)
    expand to pages IN-STAGE — each page OCRs with line_idx base
    page_idx * 100000 and `pdf_max_pages` truncates the page list
    (reference max_num_imgs, /root/reference/src/pdf_processing.py:21-73).
    Fusing the 1:N expansion here (rather than a separate pdf branch with
    its own mapInPandas + posexplode, the round-2 design) keeps the plan at
    ONE source scan, ONE shuffle and ONE python crossing for mixed corpora,
    and page bitmaps never serialize through Arrow at all. A successfully
    parsed zero-page PDF emits one clean no-lines row (never falls back to
    decoding the PDF blob as an image — round-2 ADVICE).
    """
    from ner_ocr_spark import corpus
    from ner_ocr_spark.kernels import ocr
    from ner_ocr_spark.kernels.normalize import normalize_text

    resolver = blob_resolver or (lambda ref: corpus.render_media_blob(ref))

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = None
        if gazetteer is not None:
            from ner_ocr_spark.kernels.ner import GazetteerTagger

            tagger = GazetteerTagger(gazetteer)
        cols = list(OCR_SCHEMA.fieldNames())
        if tagger is not None:
            cols += ["entities", "bio"]
        for pdf in batches:
            t0 = time.monotonic()
            out: dict[str, list] = {k: [] for k in cols}

            def emit(doc_id, span_idx, line_idx, text, media_ref, box, score,
                     error, t_text=None, t_score=None, kind=None):
                if tagger is not None:
                    if error is not None:
                        # error rows are mode-invariant: no normalization,
                        # no tagging — text/entities/bio stay NULL exactly
                        # as the non-fused path leaves them
                        out["entities"].append(None)
                        out["bio"].append(None)
                    else:
                        # P4 for real: the enhanced text wins when it
                        # normalizes non-blank (python twin of
                        # operators/normalize.refined_text_expr)
                        text = normalize_text(t_text) or normalize_text(text)
                        if not text:
                            return  # blank-after-normalize filter (fused)
                        ents, bio = tagger.tag(text)
                        out["entities"].append(
                            [{"entity_type": e.entity_type, "surface": e.surface,
                              "start": e.start, "end": e.end} for e in ents]
                        )
                        out["bio"].append(bio)
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["line_idx"].append(line_idx)
                out["kind"].append(kind if kind is not None else kind_label)
                out["text"].append(text)
                out["media_ref"].append(media_ref)
                out["box"].append(box)
                out["score"].append(score)
                out["transformer_text"].append(t_text)
                out["transformer_score"].append(t_score)
                out["error"].append(error)

            has_png = "image_png" in pdf.columns
            has_base = "line_base" in pdf.columns
            has_kind = "kind" in pdf.columns
            has_pre_err = "error" in pdf.columns
            for row in pdf.itertuples(index=False):
                base = int(row.line_base) if has_base and row.line_base is not None and not pd.isna(row.line_base) else 0
                rk = row.kind if has_kind else None
                if has_pre_err and isinstance(row.error, str):
                    # upstream stage (pdf rasterizer) already failed this
                    # span: pass the error row through untouched
                    emit(row.doc_id, int(row.span_idx), base, None,
                         row.media_ref, None, None, row.error, kind=rk)
                    continue
                if time.monotonic() - t0 > batch_timeout_s:
                    emit(row.doc_id, int(row.span_idx), base, None, row.media_ref,
                         None, None, "timeout: batch OCR budget exceeded", kind=rk)
                    continue
                if has_png and row.image_png is None and has_base:
                    # pdf branch (line_base column present): a successfully
                    # parsed ZERO-page PDF arrives as one posexplode_outer
                    # row with NULL image and NULL error. Falling back to
                    # the resolver here would decode the raw PDF blob as an
                    # image and manufacture a spurious error row (round-2
                    # ADVICE) — emit a clean no-lines row instead.
                    emit(row.doc_id, int(row.span_idx), base, None,
                         row.media_ref, None, 0.0, None, kind=rk)
                    continue
                try:
                    raw = bytes(
                        row.image_png
                        if has_png and row.image_png is not None
                        else resolver(row.media_ref)
                    )
                    if pdf_rasterizer is not None and raw[:5] == b"%PDF-":
                        pages = pdf_rasterizer(raw, pdf_zoom)
                        if pdf_max_pages is not None:
                            pages = pages[: int(pdf_max_pages)]
                        if not pages:
                            # zero-page PDF: one clean no-lines row
                            emit(row.doc_id, int(row.span_idx), base, None,
                                 row.media_ref, None, 0.0, None, kind=rk)
                            continue
                        page_imgs = [(pi * 100000, p) for pi, p in enumerate(pages)]
                    else:
                        page_imgs = [(0, raw)]
                    for page_base, png in page_imgs:
                        if isinstance(png, str):
                            # born-digital PDF page: the rasterizer hook
                            # (pdfio_page_source) extracted the text layer
                            # directly — emit its lines EXACTLY, score 1.0,
                            # no OCR (cheaper AND error-free vs the
                            # reference's rasterize-then-OCR for these
                            # pages). A text page with no lines mirrors
                            # the no-lines OCR row.
                            tlines = [l for l in png.split("\n") if l]
                            if not tlines:
                                emit(row.doc_id, int(row.span_idx),
                                     base + page_base, None, row.media_ref,
                                     None, 0.0, None, kind=rk)
                            for li, tline in enumerate(tlines):
                                emit(row.doc_id, int(row.span_idx),
                                     base + page_base + li, tline,
                                     row.media_ref, None, 1.0, None,
                                     kind=rk)
                            continue
                        lines = ocr.ocr_page(bytes(png), max_side_limit)
                        t_lines = None
                        if refine_below is not None and lines and any(
                            lr.score < refine_below for lr in lines
                        ):
                            # M2 analog: score-gated second pass with a finer
                            # deskew grid; results ride transformer_text/score
                            # per line (never overwrite the first pass)
                            t_lines = _second_pass(bytes(png), max_side_limit, ocr)
                            if t_lines is not None and len(t_lines) != len(lines):
                                # segmentation changed -> per-line alignment is
                                # undefined; keep whichever whole pass scored
                                # higher as the first pass, attach no transformer
                                s1 = sum(lr.score for lr in lines) / max(len(lines), 1)
                                s2 = sum(lr.score for lr in t_lines) / max(len(t_lines), 1)
                                if s2 > s1:
                                    lines = t_lines
                                t_lines = None
                        if not lines:
                            emit(row.doc_id, int(row.span_idx), base + page_base,
                                 None, row.media_ref, None, 0.0, None, kind=rk)
                        for li, lr in enumerate(lines):
                            if min_score is not None and lr.score < min_score:
                                continue
                            tt = t_lines[li].text if t_lines is not None else None
                            ts = float(t_lines[li].score) if t_lines is not None else None
                            emit(row.doc_id, int(row.span_idx),
                                 base + page_base + li, lr.text,
                                 row.media_ref, lr.box, float(lr.score), None,
                                 tt, ts, kind=rk)
                except Exception as e:  # noqa: BLE001 — M6 row-level absorption
                    emit(row.doc_id, int(row.span_idx), base, None, row.media_ref,
                         None, None, f"{type(e).__name__}: {e}", kind=rk)
            # object dtype per column: a batch whose rows were ALL dropped
            # (blank-after-normalize, zero-page PDFs) otherwise yields empty
            # float64 columns that Arrow cannot convert to list/struct types
            # ("NumPyConverter doesn't implement list<double>")
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()}
            )

    return stage


def _second_pass(png: bytes, max_side_limit: int, ocr):
    """Fine-step re-recognition (reference TrOCR enhancement analog,
    /root/reference/src/ui/app.py:525-538). Returns the refined line list,
    or None on failure (caller keeps the first pass — error absorption)."""
    import numpy as np

    try:
        gray = ocr.bounded_resize(ocr.decode_gray(png), max_side_limit)
        mask = ocr.despeckle(ocr.binarize(gray))
        angle = ocr.estimate_skew(mask, step=0.05)
        if abs(angle) > 1e-9:
            gray = ocr.rotate_gray(gray, angle, int(np.median(gray)))
            mask = ocr.despeckle(ocr.binarize(gray))
        return ocr.recognize_mask(mask)
    except Exception:  # noqa: BLE001 — keep the first pass on failure
        return None


def make_refine_stage(
    blob_resolver: Callable[[str], bytes] | None = None,
    max_side_limit: int = 1500,
    fine_step: float = 0.05,
    pdf_rasterizer: Callable[[bytes, float], list[bytes]] | str | None = "auto",
    pdf_zoom: float = 2.0,
    pdf_max_pages: int | None = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Second-pass refinement (reference M2 / TrOCR analog,
    /root/reference/src/transformer_ocr.py:189-283): re-recognize a page
    with a finer deskew grid and record the result in transformer_text /
    transformer_score (never overwriting the first pass — OCRResult carries
    both, /root/reference/src/custom_types/data.py:20-21; downstream P4
    coalesce picks the winner). The caller filters to low-score rows first
    (two-pass enhancement pruning, SURVEY.md §4.3.4 — each region enhanced
    exactly ONCE, unlike the reference CLI's accidental O(k^2) loop).

    PDF-derived rows refine too: a resolved blob sniffing %PDF- is
    rasterized (pdf_rasterizer: "auto" = pypdfium2 else the from-scratch
    pdfio extractor, mirroring pipeline.extract_spans) and each row's page
    comes from its line_idx base (page_idx * 100000 + line — the pdf branch
    ordering invariant), so workbench enhancement covers pdf pages with the
    same semantics as native media. pdf_rasterizer=None keeps pdf rows
    untouched (their rasterization attempt fails closed to []);
    pdf_max_pages truncates rasterization the same way the first pass did
    (rows past it cannot exist, so rasterizing those pages is pure waste).

    When an input batch carries an `image_png` column (the blobs= media
    path, where payloads ride the rows instead of resolving by ref), the
    group's first non-null payload IS the blob — the resolver is only the
    fallback. When it carries an `n_lines` column (the page's TRUE
    first-pass line count — workbench attaches it via a window), the
    index-pairing fast path is judged against that instead of the
    batch-local max line index, which an Arrow batch straddle can fool
    (dense prefix + coincidental count match → wrong lines). Output:
    OCR_SCHEMA rows (extras dropped). Failures — and rows already
    carrying an error — keep the first-pass row (error absorption)."""
    from ner_ocr_spark import corpus
    from ner_ocr_spark.kernels import ocr

    resolver = blob_resolver or (lambda ref: corpus.render_media_blob(ref))
    if pdf_rasterizer == "auto":
        from ner_ocr_spark.operators.pdf import default_page_source

        pdf_rasterizer = default_page_source()

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import OrderedDict

        import numpy as np

        # bounded LRUs that SURVIVE batch boundaries: round 2 cleared the
        # cache per batch, so a page whose rows straddled two Arrow batches
        # decoded twice (round-2 verdict #5). page_cache holds the resolved
        # blob as a page list ([blob] for native images, rasterized pages
        # for PDFs — rasterize once per document, not once per page);
        # line_cache holds recognized lines per (ref, page).
        page_cache: OrderedDict[str, list[bytes]] = OrderedDict()
        line_cache: OrderedDict[tuple[str, int], list] = OrderedDict()
        page_cap, line_cap = 8, 64

        def page_list(ref: str, payload: bytes | None) -> list[bytes]:
            if ref in page_cache:
                page_cache.move_to_end(ref)
                return page_cache[ref]
            raw = bytes(payload) if payload is not None else bytes(resolver(ref))
            if pdf_rasterizer is not None and raw[:5] == b"%PDF-":
                # text pages (str from pdfio_page_source) ride through as
                # str — refined_lines skips them (their first-pass rows are
                # exact, score 1.0; nothing to refine)
                pages = [p if isinstance(p, str) else bytes(p)
                         for p in pdf_rasterizer(raw, pdf_zoom)]
                if pdf_max_pages is not None:
                    pages = pages[: int(pdf_max_pages)]
            else:
                pages = [raw]
            page_cache[ref] = pages
            if len(page_cache) > page_cap:
                page_cache.popitem(last=False)
            return pages

        def refined_lines(ref: str, page: int, payload: bytes | None):
            key = (ref, page)
            if key in line_cache:
                line_cache.move_to_end(key)
                return line_cache[key]
            try:
                pages = page_list(ref, payload)
                if page >= len(pages) or isinstance(pages[page], str):
                    lines = []
                else:
                    gray = ocr.bounded_resize(
                        ocr.decode_gray(pages[page]), max_side_limit
                    )
                    mask = ocr.despeckle(ocr.binarize(gray))
                    angle = ocr.estimate_skew(mask, step=fine_step)
                    if abs(angle) > 1e-9:
                        gray = ocr.rotate_gray(gray, angle, int(np.median(gray)))
                        mask = ocr.despeckle(ocr.binarize(gray))
                    lines = ocr.recognize_mask(mask)
            except Exception:  # noqa: BLE001
                lines = []
            line_cache[key] = lines
            if len(line_cache) > line_cap:
                line_cache.popitem(last=False)
            return lines

        for pdf in batches:
            pdf = pdf.copy()
            li_all = pdf["line_idx"].to_numpy().astype(int)
            # error rows never refine (M6: they carry no geometry/text and
            # must stay NULL through both transformer columns)
            ok_all = pdf["error"].isna().to_numpy()
            has_payload = "image_png" in pdf.columns
            nl_all = (
                pdf["n_lines"].to_numpy() if "n_lines" in pdf.columns else None
            )
            # one decode per page, vectorized assignment per media_ref group
            # (no per-row python loop, no .at writes — round-2 verdict #5)
            for ref, pos in pdf.groupby("media_ref", sort=False).indices.items():
                payload = None
                if has_payload:
                    for v in pdf["image_png"].iloc[pos]:
                        if v is not None:
                            payload = v
                            break
                li = li_all[pos]
                pg = li // 100000  # 0 for native media, page_idx for pdf rows
                for page in np.unique(pg):
                    lines = refined_lines(ref, int(page), payload)
                    if not lines:
                        continue
                    on_page = pg == page
                    lp = li[on_page] % 100000
                    in_range = (lp < len(lines)) & ok_all[pos][on_page]
                    # Pairing rows to refined lines. Fast path: when the
                    # fine-deskew segmentation agrees with the first pass,
                    # indices pair exactly. "Agrees" is judged against the
                    # page's TRUE first-pass line count when the caller
                    # carries it (optional `n_lines` column — workbench
                    # attaches it via a window; a batch-local max is
                    # fooled by a dense-prefix batch straddle whose count
                    # coincidentally matches a changed segmentation).
                    # Without n_lines, fall back to the batch-local
                    # inference tightened to a dense-COMPLETE index set
                    # (max+1 AND row count must both equal len(lines)).
                    # Otherwise pair by LINE GEOMETRY — counts can
                    # disagree legitimately (a partial batch, a low-score
                    # SUBSET from the workbench, or a deskew artifact
                    # adding a spurious line), and index pairing would
                    # then attach the wrong line. Geometry works per row:
                    # both passes run at the same resize scale, so the
                    # refined line with dominant vertical overlap IS the
                    # row's line.
                    if nl_all is not None:
                        nlv = nl_all[pos[on_page]]
                        agree = len(nlv) > 0 and not pd.isna(nlv[0]) \
                            and int(nlv[0]) == len(lines)
                    else:
                        agree = (
                            len(lines) == int(lp.max()) + 1
                            and len(np.unique(lp)) == len(lines)
                        )
                    if agree:
                        hit = lp[in_range]
                    else:
                        boxes = pdf["box"].iloc[pos[on_page]].to_numpy()
                        ly = np.array(
                            [(l.box[1], l.box[3]) if l.box is not None
                             else (np.nan, np.nan) for l in lines]
                        )
                        hit_list, keep = [], []
                        for row_i, box in enumerate(boxes):
                            if not in_range[row_i] or box is None:
                                continue
                            y1, y2 = float(box[1]), float(box[3])
                            ov = np.minimum(ly[:, 1], y2) - np.maximum(ly[:, 0], y1)
                            j = int(np.nanargmax(ov)) if len(ov) else -1
                            # dominant overlap: >= half the row's height
                            if j >= 0 and ov[j] >= 0.5 * max(y2 - y1, 1e-9):
                                hit_list.append(j)
                                keep.append(row_i)
                        if not keep:
                            continue
                        in_range = np.zeros_like(in_range)
                        in_range[keep] = True
                        hit = np.array(hit_list)
                    sel = pdf.index[pos[on_page][in_range]]
                    pdf.loc[sel, "transformer_text"] = [lines[i].text for i in hit]
                    pdf.loc[sel, "transformer_score"] = [
                        float(lines[i].score) for i in hit
                    ]
            # project to the declared output schema (the input batch may
            # carry an extra image_png payload column)
            yield pdf[list(OCR_SCHEMA.fieldNames())]

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
            if "kind" in pdf.columns:
                mask = (pdf["kind"] == "html").to_numpy()
                if mask.any():
                    # kind='html' rows reach this stage with RAW markup:
                    # main-content extraction + the python normalizer twin
                    # ride the SAME crossing (a separate Arrow stage would
                    # re-scan the source — pipeline comment); blanks drop,
                    # failures absorb per row (M6: error set, text NULL)
                    from ner_ocr_spark.htmlx import main_text
                    from ner_ocr_spark.kernels.normalize import (
                        normalize_text,
                    )

                    texts, errs = [], []
                    for h in pdf.loc[mask, text_col]:
                        try:
                            texts.append(normalize_text(main_text(h)))
                            errs.append(None)
                        except Exception as e:  # noqa: BLE001
                            texts.append(None)
                            errs.append(f"html: {type(e).__name__}: {e}")
                    pdf = pdf.copy()
                    pdf.loc[mask, text_col] = texts
                    if "error" in pdf.columns:
                        pdf.loc[mask, "error"] = errs
                    keep = ~(
                        mask & (pdf[text_col].fillna("") == "")
                        & pdf.get("error", pd.Series(index=pdf.index,
                                                     dtype=object)).isna()
                    )
                    pdf = pdf[keep]
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
            if "error" in pdf.columns:
                # M6: error rows never gain tagging output
                em = pdf["error"].notna()
                if em.any():
                    pdf.loc[em, "entities"] = None
                    pdf.loc[em, "bio"] = None
            yield pdf

    return stage, schema
