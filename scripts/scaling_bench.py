"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster in this sandbox, so the same job runs at local[8] and
local[32] on identical input (driver instruction) and reports docs/sec at
both plus efficiency = (T_8 / T_32) / 4. Results are written into BENCH.md.

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
LEVELS = (8, 32)


def run_level(cores: int) -> dict:
    import __spark_entry__ as entry
    from ner_ocr_spark import pipeline
    from ner_ocr_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = entry.interleaved_documents(spark, SF_DIR)
    docs = docs.cache()
    n = docs.count()  # warm: read + cache outside the timed window
    t0 = time.monotonic()
    pipeline.assemble_documents(pipeline.extract_spans(docs)).count()
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "n_docs": n, "wall_s": round(wall, 3),
            "docs_per_sec": round(n / wall, 2)}


def main() -> None:
    if len(sys.argv) > 1:
        print(json.dumps(run_level(int(sys.argv[1]))))
        return
    results = []
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, str(cores)],
            capture_output=True, text=True, check=True,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = results[0], results[-1]
    ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = ratio / (hi["cores"] / lo["cores"])
    summary = {
        "levels": results,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "sf_dir": SF_DIR,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
