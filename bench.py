"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ...}.

The headline is the engine's real workload — the end-to-end OCR+NER
extraction pipeline over the interleaved corpus derived from the sf
documents table — plus representative relational/training-data operators.
Scaling-efficiency evidence (local[8] vs local[32]) lives in
scripts/scaling_bench.py -> BENCH.md.
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

BENCH_QUERIES = [
    "tpch_q1",
    "sessionize",
    "markdown_assembly",
    "spatial_semi",
    "dedup_exact",
    "minhash_pairs",
    "cosine_topk",
    "quality_features",
    "token_count",
    # added late round 3 (compare suites across rounds per-query: this
    # entry has no r1/r2 counterpart) — the composed training-data
    # pipeline: quality -> repetition -> dedup -> sample -> pack
    "curation_pipeline",
]


def main() -> None:
    import __spark_entry__ as entry
    from ner_ocr_spark import pipeline
    from ner_ocr_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # headline: end-to-end extraction (docs/sec), steady state — one
    # warm-up pass pays python-worker spawn + whole-stage codegen compile
    # (one-time costs that amortize to zero on a long-running cluster),
    # the second pass is timed
    def run_full(df):
        # noop sink: forces every column's computation (count() would let
        # Catalyst prune projections/collect_lists and under-measure)
        df.write.format("noop").mode("overwrite").save()

    def best_of(make_df, reps: int = 5) -> float:
        # single-shot second-scale timings swing 3-8x on a busy 32-core
        # box; min-of-3 after a warm-up is the stable steady-state figure
        run_full(make_df())  # warm (codegen compile + python workers)
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            run_full(make_df())
            best = min(best, time.monotonic() - t0)
        return best

    docs = entry.interleaved_documents(spark, SF_DIR)
    n_docs = docs.count()
    e2e = best_of(lambda: pipeline.assemble_documents(pipeline.extract_spans(docs)))
    n_out = n_docs
    timings["extraction_e2e"] = round(e2e, 3)

    qs = entry.queries()
    for name in BENCH_QUERIES:
        timings[name] = round(
            best_of(lambda name=name: qs[name](spark, SF_DIR)), 3
        )

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall (e2e OCR+NER extraction + operator set)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "docs_per_sec": round(n_out / e2e, 2) if e2e > 0 else None,
                "n_docs": n_docs,
                "cpus": CPUS,
                "timing": "steady-state, min of 5 reps post warm-up",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
