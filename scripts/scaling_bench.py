"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster in this sandbox, so the same job runs at two parallelism
levels on identical input (driver instruction) and reports docs/sec at
both plus efficiency = speedup / (cores_hi / cores_lo). Two modes:

  SCALING_MODE=local (default): local[N] vs local[4N] — thread-level
  parallelism in one JVM.
  SCALING_MODE=local-cluster: local-cluster[n_exec, cores_per_exec, mem]
  — REAL separate executor JVMs with isolated heaps on this box, the
  closest single-machine analog to the north rule's N -> 4N executors
  (round-2 verdict #7). Levels are interpreted as TOTAL cores and split
  into executors of SCALING_EXEC_CORES (default 4) cores each, e.g.
  4,16 -> local-cluster[1,4,m] vs local-cluster[4,4,m].

Each parallelism level runs in a fresh JVM (spark.stop() + new session with
a different master does not rebuild the local backend reliably, so this
script re-execs itself per level).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# N and 4N cores. Default 4/16 leaves machine headroom so the measurement
# captures parallel scaling, not this single box's memory-bus saturation
# (which a multi-executor cluster does not share); set SCALING_LEVELS=8,32
# to measure the fully-saturated pair too.
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(",")
)
# pin BLAS threads so per-worker numpy cannot steal idle cores and inflate
# the low-parallelism baseline
_PIN = {"OMP_NUM_THREADS": "1", "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1", "VECLIB_MAXIMUM_THREADS": "1"}


N_DOCS = int(os.environ.get("SCALING_DOCS", "8000"))
MEDIA_PER_DOC = int(os.environ.get("SCALING_MEDIA", "2"))
MODE = os.environ.get("SCALING_MODE", "local")
EXEC_CORES = int(os.environ.get("SCALING_EXEC_CORES", "4"))
EXEC_MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "3072"))
# SCALING_WORKLOAD=extract (default): the OCR+NER pipeline — python-kernel
# bound, exercises mapInPandas scaling. SCALING_WORKLOAD=curation: the
# composed training-data pipeline (gopher -> repetition -> dedup -> sample
# -> pack) — pure-JVM shuffle/agg bound, the complementary scaling axis.
WORKLOAD = os.environ.get("SCALING_WORKLOAD", "extract")
CURATION_DOCS = int(os.environ.get("SCALING_CURATION_DOCS", "300000"))


def _master_for(cores: int) -> tuple[str, dict[str, str]]:
    if MODE == "local-cluster":
        n_exec = max(cores // EXEC_CORES, 1)
        master = f"local-cluster[{n_exec},{EXEC_CORES},{EXEC_MEM_MB}]"
        return master, {
            "spark.executor.memory": f"{EXEC_MEM_MB}m",
            # ship the repo package to the executor JVMs' python workers
            "spark.executorEnv.PYTHONPATH":
                str(Path(__file__).resolve().parent.parent),
        }
    return f"local[{cores}]", {}


def scaling_corpus(spark, n_docs: int, media_per_doc: int):
    """Compute-bound interleaved corpus: every doc carries media spans so
    the job is OCR-dominated (the sf0.1 driver corpus finishes in ~5 s wall
    and measures scheduler overhead, not scaling). Built with expressions;
    blobs synthesize executor-side from media_ref."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.concat(F.lit("doc"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("doc_id")
    )
    spans = []
    for j in range(media_per_doc + 1):
        if j % 2 == 0:
            spans.append(F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("THE QUICK BROWN FOX SEGMENT "), F.lit(str(j))).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(j).cast("int").alias("offset"),
            ))
        if j < media_per_doc:
            spans.append(F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(F.col("doc_id"), F.lit(f"/m{j}")).alias("media_ref"),
                F.lit(100 + j).cast("int").alias("offset"),
            ))
    return base.select("doc_id", F.array(*spans).alias("spans"))


def curation_corpus(spark, n_docs: int):
    """Expression-built ~115-word documents: stopword head (passes the
    gopher rules), per-(doc, position) varying filler (2-grams stay
    distinct, so repetition keeps), text repeats every 99991 ids (a small
    exact-dup population for the dedup window)."""
    from pyspark.sql import functions as F

    segs = [F.lit("the fox and of dog is here")]
    for j in range(36):
        segs.append(
            F.concat(
                F.lit(" w"),
                F.pmod(F.col("id") * (2 * j + 7), F.lit(99991)).cast("string"),
                F.lit(f" red{j} blue{j}"),
            )
        )
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.element_at(langs, (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int")).alias("lang"),
        F.concat(*segs).alias("text"),
    )


def run_level_curation(cores: int) -> dict:
    from ner_ocr_spark.curation import curate
    from ner_ocr_spark.session import get_spark

    master, extra = _master_for(cores)
    spark = get_spark(
        app_name=f"scaling-cur-{cores}", master=master,
        shuffle_partitions=max(cores * 4, 32), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = curation_corpus(spark, CURATION_DOCS).cache()
    n = docs.count()
    rates = {"en": 0.8, "de": 0.5}

    def job(df):
        # shards FIXED across levels: tying shards to the core count would
        # make the two levels different jobs (different shard hashing and
        # window partitioning), so speedup would conflate resource scaling
        # with workload change. 128 gives every level >= 4 waves.
        curate(df, rates, default_rate=0.3, budget=2048, shards=128) \
            .write.format("noop").mode("overwrite").save()

    job(docs.limit(1024))  # warm codegen
    # min-of-3: single-shot walls on this box swing ±40% between runs
    # (hypervisor steal windows — bench.py uses min-of-5 for the same
    # reason); the minimum is the least-contended estimate of the true cost
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        job(docs)
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    spark.stop()
    return {"cores": cores, "n_docs": n, "wall_s": round(wall, 3),
            "walls": [round(w, 3) for w in walls],
            "docs_per_sec": round(n / wall, 2)}


def run_level(cores: int) -> dict:
    from ner_ocr_spark import pipeline
    from ner_ocr_spark.session import get_spark

    master, extra = _master_for(cores)
    spark = get_spark(
        app_name=f"scaling-{cores}", master=master,
        shuffle_partitions=max(cores, 32), extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = scaling_corpus(spark, N_DOCS, MEDIA_PER_DOC).cache()
    n = docs.count()  # warm: build + cache outside the timed window
    # fine-grained OCR waves (8 tasks/core): at corpus scale shuffle
    # partitions >> cores gives this for free; this harness's input is
    # small, so one-wave-per-core scheduling would measure straggler tails,
    # not scaling
    width = 8 * cores
    # warm python workers/codegen on a small slice, not the full job
    pipeline.assemble_documents(
        pipeline.extract_spans(docs.limit(64))
    ).write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    pipeline.assemble_documents(
        pipeline.extract_spans(docs, media_partitions=width)
    ).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "n_docs": n, "n_media": n * MEDIA_PER_DOC,
            "wall_s": round(wall, 3), "docs_per_sec": round(n / wall, 2)}


def main() -> None:
    if len(sys.argv) > 1:
        fn = run_level_curation if WORKLOAD == "curation" else run_level
        print(json.dumps(fn(int(sys.argv[1]))))
        return
    results = []
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, str(cores)],
            capture_output=True, text=True, check=True,
            cwd=str(Path(__file__).resolve().parent.parent),
            env={**os.environ, **_PIN},
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = results[0], results[-1]
    ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = ratio / (hi["cores"] / lo["cores"])
    summary = {
        "mode": MODE,
        "workload": WORKLOAD,
        "levels": results,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "sf_dir": SF_DIR,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
