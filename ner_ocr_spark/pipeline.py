"""The end-to-end extraction pipeline (SURVEY.md §4.4 physical sketch).

    documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)
      -> posexplode (span_idx mints the order the invariant needs)
      -> route kind: text -> JVM normalizer; media -> repartition(doc_id,
         span_idx) [skew defusal] -> mapInPandas OCR -> same normalizer
      -> unionByName -> mapInPandas NER (gazetteer+BIO)
      -> assemble: groupBy(doc_id) sort_array(collect_list(...))

Two shuffles total: the media-branch repartition and the assembly groupBy.
Span order is carried explicitly via (span_idx, line_idx) — never partition
order (SURVEY.md §7 hard part (a)).

Reference parity: the per-file loop of /root/reference/src/pipelines/base.py:31-57
becomes scan parallelism; OCR dispatch /root/reference/src/bounding_box.py:278-309
becomes the kind route; each span is enhanced exactly once (the reference CLI's
accidental O(k^2) re-enhancement, /root/reference/src/pipelines/ocr.py:66-74,
is intentionally not reproduced — the UI path at
/root/reference/src/ui/app.py:525-530 shows intended semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_ocr_spark import corpus as corpus_mod
from ner_ocr_spark.operators.extract import (
    OCR_SCHEMA,
    make_ner_stage,
    make_ocr_stage,
    ocr_ner_schema,
)
from ner_ocr_spark.operators.normalize import normalize_expr, refined_text_expr

SPAN_COLS = ["doc_id", "span_idx", "line_idx", "kind", "text", "media_ref",
             "box", "score", "transformer_text", "transformer_score", "error"]


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents -> long span table; span_idx = array position = order."""
    return documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_spans(
    documents: DataFrame,
    blobs: DataFrame | None = None,
    blob_resolver: Callable[[str], bytes] | None = None,
    media_partitions: int | None = None,
    gazetteer: list[tuple[str, str]] | None = None,
    with_ner: bool = True,
    refine_below: float | None = None,
    pdf_rasterizer: Callable[[bytes, float], list[bytes]] | str | None = "auto",
    pdf_max_pages: int | None = None,
    pdf_zoom: float = 2.0,
) -> DataFrame:
    """Full extraction: ordered (kind, text, media_ref) span rows per doc,
    plus entities/bio when with_ner.

    blobs: optional media table (media_ref, image_png) joined executor-side;
    otherwise blob_resolver(media_ref) fetches bytes inside the OCR UDF
    (default: the synthetic corpus renderer — models an object-store fetch).
    media_partitions: width of the media-branch repartition; defaults to
    spark.sql.shuffle.partitions. Partitioning key is (doc_id, span_idx) so
    one media-heavy document spreads across the cluster (north-rule skew
    clause) — reassembly restores order via span_idx, never partition order.

    PDF spans (kind='pdf'): pdf_rasterizer is any callable
    (bytes, zoom) -> list of page payloads, each either png bytes (OCR'd)
    or a str of newline-joined text lines (emitted directly, score 1.0 —
    the born-digital path). The default "auto" resolves via
    operators/pdf.default_page_source — pypdfium2 when installed, else the
    from-scratch pdfio reader (raster pages composited; born-digital pages
    extracted as positioned Tj/TJ text, skipping OCR entirely), so real
    PDF bytes work out of the box. PDF
    blobs are sniffed (%PDF- magic) and expanded to pages INSIDE the same
    OCR mapInPandas stage with line_idx base page_idx * 100000, so
    per-document order stays exact and mixed corpora keep ONE source scan /
    ONE shuffle / ONE python crossing (a separate rasterize branch — the
    round-2 design — scanned the source an extra time and shipped page
    bitmaps through Arrow twice). pdf_max_pages is the reference's
    max_num_imgs truncation (/root/reference/src/pdf_processing.py:21-73;
    dispatch /root/reference/src/bounding_box.py:300-303). Out-of-subset
    files degrade to per-row error absorption, never a crash; pass
    pdf_rasterizer=None to disable PDF handling (pdf spans then ride the
    media branch and the image sniff rejects them per row).
    """
    spark = documents.sparkSession
    if pdf_rasterizer == "auto":
        from ner_ocr_spark.operators.pdf import default_page_source

        pdf_rasterizer = default_page_source()
    spans = explode_spans(documents)

    # media-branch width: defaults to spark.sql.shuffle.partitions. At
    # corpus scale that is set far above the core count, so the OCR stage
    # schedules in many fine waves; when partitions ≈ cores (small local
    # runs), pass media_partitions explicitly — one wave per core lets the
    # slowest task stretch the whole stage (measured +8% at 16 cores going
    # from 2 to 8 waves), while over-splitting a tiny input pays ~20% in
    # per-task Arrow/python overhead. Granularity follows data volume.
    n_part = media_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # -- text + html branch (ONE source consumer: a third filter-fork of
    # `spans` re-scans and re-explodes the source — measured +16% on the
    # e2e wall for a corpus with zero html spans). text rows normalize
    # JVM-side (codegen); kind='html' rows carry their RAW markup through
    # this projection — main-content extraction (north rule: boilerplate
    # strip / DOM heuristics) happens inside the NER stage's existing
    # python crossing (with_ner) or in a dedicated Arrow branch (no-NER
    # path below), never as an extra stage over text rows.
    # SLIM projection through the python boundary (guide §4.1: pass only
    # the columns the function needs): every other SPAN_COLS field is a
    # literal for text/html rows (line_idx 0, score 1.0, the rest NULL) —
    # round 6 re-attaches them JVM-side after the NER crossing instead of
    # serializing half a million NULL/object cells each way (the
    # passthrough round-trip alone measured 1.5 s at sf1). `error` stays:
    # the NER stage SETS it for failed html rows.
    text_branch = (
        spans.filter(F.col("kind").isin(["text", "html"]))
        .select(
            "doc_id",
            "span_idx",
            "kind",
            F.when(F.col("kind") == "text", normalize_expr(F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
            F.lit(None).cast("string").alias("error"),
        )
        .filter((F.col("kind") == "html") | (F.length("text") > 0))
    )

    def widen_text_rows(df: DataFrame, extra: list[str]) -> DataFrame:
        """Re-attach the literal span columns the slim text branch left
        out, restoring SPAN_COLS order (+ NER extras when present)."""
        return df.select(
            "doc_id",
            "span_idx",
            F.lit(0).alias("line_idx"),
            "kind",
            "text",
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(None).cast("array<double>").alias("box"),
            F.lit(1.0).alias("score"),
            F.lit(None).cast("string").alias("transformer_text"),
            F.lit(None).cast("double").alias("transformer_score"),
            "error",
            *extra,
        )

    # -- media branch: spread heavy docs, then batched OCR ----------------
    # pdf spans ride the SAME branch: the OCR stage sniffs %PDF- blobs and
    # expands pages in-stage (without a rasterizer the image sniff rejects
    # the bytes into a per-row error)
    media = spans.filter(F.col("kind").isin(["media", "pdf"])).select(
        "doc_id", "span_idx", "kind", "media_ref"
    )
    if blobs is not None:
        media = media.join(blobs, "media_ref", "left")
        # size-aware balancing (§4.3.2): payload bytes ~ decoded pixel count
        # ~ OCR cost; LPT round-robin beats count-equal hash spread when row
        # costs vary by orders of magnitude
        from ner_ocr_spark.operators.balance import balance_by_cost

        media = balance_by_cost(
            media.withColumn("_cost", F.length("image_png")),
            "_cost", n_part, approximate=True,
        ).drop("_cost")
    else:
        # (doc_id, span_idx) hash-spread = salted repartition: a
        # 1000-media-span doc lands on ~all partitions, not one straggler
        media = media.repartition(n_part, "doc_id", "span_idx")
    # refinement AND (when with_ner) normalize+NER happen INSIDE the OCR
    # stage: a filter-fork into a second mapInPandas would re-execute the
    # whole OCR plan on both branches, and a separate NER stage would make
    # media rows cross the Python boundary twice (§4.3.4; each page
    # refined exactly once, each row tagged exactly once)
    gaz = gazetteer if gazetteer is not None else corpus_mod.GAZETTEER

    def run_ocr(df, schema, fused_gaz):
        return df.mapInPandas(
            make_ocr_stage(blob_resolver, refine_below=refine_below,
                           gazetteer=fused_gaz,
                           pdf_rasterizer=pdf_rasterizer,
                           pdf_max_pages=pdf_max_pages, pdf_zoom=pdf_zoom),
            schema,
        )

    if with_ner:
        ocr_rows = run_ocr(media, ocr_ner_schema(), gaz)
        # normalize + blank-filter already applied in-stage (python twin)
        media_branch = ocr_rows.filter(
            (F.length("text") > 0) | F.col("error").isNotNull()
        )
        ner_fn, ner_schema = make_ner_stage(gaz, passthrough=text_branch.schema)
        text_tagged = widen_text_rows(
            text_branch.mapInPandas(ner_fn, ner_schema), ["entities", "bio"]
        )
        return text_tagged.unionByName(media_branch).select(
            *SPAN_COLS, "entities", "bio"
        )
    ocr_rows = run_ocr(media, OCR_SCHEMA, None)
    # P4 coalesce (JVM-side): enhanced text wins only when it normalizes
    # non-blank; error rows keep text untouched (mode-invariant with the
    # fused path, which skips normalization on error)
    media_branch = ocr_rows.withColumn(
        "text",
        F.when(F.col("error").isNotNull(), F.col("text")).otherwise(
            refined_text_expr(F.col("transformer_text"), F.col("text"))
        ),
    ).filter((F.length("text") > 0) | F.col("error").isNotNull())
    # no-NER path: html rows still carry raw markup — extract via a
    # dedicated Arrow branch (asNondeterministic pins ONE evaluation: the
    # blank filter would otherwise push below the projection and run the
    # UDF twice, and field accesses on the struct would duplicate it).
    # This forks text_branch (one extra scan) — only on this secondary
    # path; the with_ner path extracts inside the NER stage. Failures
    # become ERROR ROWS (text NULL, error set) exactly like the fused
    # path — dropping them silently would make span sequences differ
    # between NER modes for malformed HTML (M6 mode invariance).
    from ner_ocr_spark.operators.html import _main_text_err_udf

    _main_once = _main_text_err_udf.asNondeterministic()
    texts_only = widen_text_rows(
        text_branch.filter(F.col("kind") == "text"), []
    )
    htmls = widen_text_rows(
        text_branch.filter(F.col("kind") == "html")
        .withColumn("_hx", _main_once(F.col("text")))
        .withColumn("error", F.col("_hx.error"))
        .withColumn(
            "text",
            F.when(F.col("_hx.error").isNotNull(),
                   F.lit(None).cast("string"))
            .otherwise(normalize_expr(F.col("_hx.text"))),
        )
        .drop("_hx")
        .filter((F.length("text") > 0) | F.col("error").isNotNull()),
        [],
    )
    return (
        texts_only.unionByName(htmls).unionByName(media_branch)
        .select(*SPAN_COLS)
    )


def assemble_documents(extracted: DataFrame) -> DataFrame:
    """Re-assemble the per-document ordered span array — the exact shape of
    the span-sequence-equality invariant (kind, text, media_ref, order).
    sort_array on the leading (span_idx, line_idx) struct fields restores
    order without a global sort."""
    ordered = F.transform(
        # sort_array, not array_sort: same ordering ((span_idx, line_idx)
        # is unique per doc, so the nullable tail fields never decide),
        # but ArraySort's default comparator is an interpreted lambda per
        # comparison (round 6)
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("span_idx"),
                    F.col("line_idx"),
                    F.col("kind"),
                    F.col("text"),
                    F.col("media_ref"),
                )
            )
        ),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    return extracted.filter(F.col("error").isNull()).groupBy("doc_id").agg(
        ordered.alias("spans")
    )


def run(
    spark: SparkSession,
    documents: DataFrame,
    **kwargs,
) -> DataFrame:
    """extract + assemble in one plan."""
    return assemble_documents(extract_spans(documents, **kwargs))
