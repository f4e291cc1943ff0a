"""Round-6 optimization harness: noop-sink isolation per stage/query
(guide §1.4) — NOT the driver's bench (bench.py is frozen; this file only
feeds OPTIMIZATION_r06.md evidence).

Usage:
    python bench_extra.py e2e       # extraction pipeline stage breakdown
    python bench_extra.py curation  # curation pipeline stage breakdown
    python bench_extra.py queries [name ...]   # individual bench queries
    python bench_extra.py plans [name ...]     # dump explain("formatted")

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _spark():
    from ner_ocr_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(spark, label, make_df, reps=REPS):
    spark.sparkContext.setJobDescription(label)
    _noop(make_df())  # warm-up
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        _noop(make_df())
        best = min(best, time.monotonic() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:32s} {best:8.3f} s")
    return round(best, 3)


def run_e2e():
    import __spark_entry__ as entry
    from ner_ocr_spark import pipeline
    from ner_ocr_spark.operators.extract import (
        make_ner_stage, make_ocr_stage, ocr_ner_schema,
    )
    from pyspark.sql import functions as F

    spark = _spark()
    docs = entry.interleaved_documents(spark, SF_DIR)
    n = docs.count()
    print(f"docs: {n}")
    out = {}
    out["docs_scan"] = best_of(spark, "docs_scan", lambda: docs)
    out["explode"] = best_of(
        spark, "explode", lambda: pipeline.explode_spans(docs)
    )

    def text_branch_only():
        spans = pipeline.explode_spans(docs)
        from ner_ocr_spark.operators.normalize import normalize_expr

        return (
            spans.filter(F.col("kind").isin(["text", "html"]))
            .select(
                "doc_id", "span_idx",
                F.when(F.col("kind") == "text",
                       normalize_expr(F.col("text")))
                .otherwise(F.col("text")).alias("text"),
            )
            .filter(F.length("text") > 0)
        )

    out["text_branch_jvm"] = best_of(
        spark, "text_branch_jvm", text_branch_only
    )

    def full_no_media():
        # text+html spans through the NER python crossing (no media rows)
        ex = pipeline.extract_spans(
            docs.select(
                "doc_id",
                F.filter(
                    F.col("spans"), lambda s: s["kind"].isin(["text", "html"])
                ).alias("spans"),
            )
        )
        return ex

    out["extract_text_only"] = best_of(
        spark, "extract_text_only", full_no_media
    )

    def media_only():
        ex = pipeline.extract_spans(
            docs.select(
                "doc_id",
                F.filter(
                    F.col("spans"), lambda s: s["kind"].isin(["media", "pdf"])
                ).alias("spans"),
            )
        )
        return ex

    out["extract_media_only"] = best_of(
        spark, "extract_media_only", media_only
    )
    out["extract_full"] = best_of(
        spark, "extract_full", lambda: pipeline.extract_spans(docs)
    )
    out["extract_assemble"] = best_of(
        spark, "extract_assemble",
        lambda: pipeline.assemble_documents(pipeline.extract_spans(docs)),
    )
    print(json.dumps({"sf_dir": SF_DIR, "stages": out}))
    spark.stop()


def run_curation():
    import __spark_entry__ as entry
    from ner_ocr_spark.curation import curate
    from ner_ocr_spark.operators.packing import pack_sequences, shard_hash_md5
    from ner_ocr_spark.operators.sampling import stratified_sample, unit_hash_md5
    from ner_ocr_spark.operators.textstats import gopher_filter, repetition_stats
    from pyspark.sql import functions as F

    spark = _spark()
    docs = entry._t(spark, SF_DIR, "documents")
    print(f"docs: {docs.count()}")
    out = {}
    out["scan"] = best_of(spark, "scan", lambda: docs)
    out["gopher"] = best_of(
        spark, "gopher", lambda: gopher_filter(docs.select("doc_id", "lang", "text"))
    )
    out["repetition"] = best_of(
        spark, "repetition",
        lambda: repetition_stats(docs.select("doc_id", "lang", "text")),
    )
    out["pack_alone"] = best_of(
        spark, "pack_alone",
        lambda: pack_sequences(
            docs.select("doc_id", "text"), budget=256, shards=8,
            shard_hash=shard_hash_md5,
        ),
    )
    out["curate_full"] = best_of(
        spark, "curate_full",
        lambda: curate(
            docs, {"en": 0.6, "de": 0.3}, default_rate=0.2, budget=256,
            shards=8, seed=7, unit_hash=unit_hash_md5,
            shard_hash=shard_hash_md5,
        ),
    )
    print(json.dumps({"sf_dir": SF_DIR, "stages": out}))
    spark.stop()


def run_queries(names):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    out = {}
    for name in names:
        out[name] = best_of(spark, name, lambda n=name: qs[n](spark, SF_DIR))
    print(json.dumps({"sf_dir": SF_DIR, "queries": out}))
    spark.stop()


def dump_plans(names, outdir="plans/r06", suffix="before"):
    import __spark_entry__ as entry
    from ner_ocr_spark import pipeline

    spark = _spark()
    qs = entry.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name == "extraction_e2e":
            df = pipeline.assemble_documents(
                pipeline.extract_spans(entry.interleaved_documents(spark, SF_DIR))
            )
        else:
            df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = Path(outdir) / f"{name}_{suffix}.txt"
        path.write_text(p)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "e2e"
    if mode == "e2e":
        run_e2e()
    elif mode == "curation":
        run_curation()
    elif mode == "queries":
        run_queries(sys.argv[2:])
    elif mode == "plans":
        names = sys.argv[2:]
        suffix = "before"
        if names and names[0].startswith("--suffix="):
            suffix = names[0].split("=", 1)[1]
            names = names[1:]
        dump_plans(names, suffix=suffix)
    else:
        raise SystemExit(f"unknown mode {mode}")
