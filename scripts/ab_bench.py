"""Interleaved same-window A/B between two repo checkouts (round-3
verdict #4): BENCH_r03 showed four sub-0.5 s queries 13-18% slower than
BENCH_r02 in the driver's window while the builder's idle-box run showed
them at-or-faster — consistent with documented hypervisor-steal variance,
but "almost certainly noise" is not evidence. This script alternates
A-code and B-code subprocesses within ONE window (so both arms sample the
same box conditions), min-of-N per (arm, query), and reports the paired
deltas plus the window's /proc/stat steal.

Usage:
  python scripts/ab_bench.py <repoA> <repoB> [reps]          # parent
  python scripts/ab_bench.py --child <repo> <query> [...]    # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DEFAULT_QUERIES = os.environ.get(
    "AB_QUERIES",
    "minhash_pairs,cosine_topk,quality_features,token_count",
).split(",")


def child(repo: str, queries: list[str]) -> None:
    sys.path.insert(0, repo)
    import __spark_entry__ as entry
    from ner_ocr_spark.session import get_spark

    spark = get_spark(app_name="ab-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out: dict[str, float] = {}
    for name in queries:
        mk = qs[name]
        mk(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        mk(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = time.monotonic() - t0
    print("AB_RESULT " + json.dumps(out))
    spark.stop()


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def parent(repo_a: str, repo_b: str, reps: int) -> None:
    samples: dict[str, dict[str, list[float]]] = {
        "A": {q: [] for q in DEFAULT_QUERIES},
        "B": {q: [] for q in DEFAULT_QUERIES},
    }
    steal0, wall0 = _steal_jiffies(), time.monotonic()
    for i in range(reps):
        for arm, repo in (("A", repo_a), ("B", repo_b)):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", repo]
                + DEFAULT_QUERIES,
                capture_output=True, text=True, timeout=600,
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("AB_RESULT ")]
            if not line:
                print(f"arm {arm} iter {i} FAILED:\n{p.stderr[-2000:]}")
                sys.exit(1)
            got = json.loads(line[0][len("AB_RESULT "):])
            for q, v in got.items():
                samples[arm][q].append(v)
            print(f"iter {i} arm {arm}: "
                  + " ".join(f"{q}={v:.3f}" for q, v in got.items()))
    steal_pct = (
        100.0 * (_steal_jiffies() - steal0)
        / (os.cpu_count() * 100 * (time.monotonic() - wall0))
    )
    report = {"reps": reps, "sf": SF_DIR, "cpus": CPUS,
              "window_steal_pct": round(steal_pct, 3), "queries": {}}
    for q in DEFAULT_QUERIES:
        a, b = samples["A"][q], samples["B"][q]
        report["queries"][q] = {
            "A_min": round(min(a), 3), "B_min": round(min(b), 3),
            "B_over_A": round(min(b) / min(a), 3),
            "A_spread": round(max(a) / min(a), 2),
            "B_spread": round(max(b) / min(b), 2),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:] or DEFAULT_QUERIES)
    else:
        repo_a, repo_b = sys.argv[1], sys.argv[2]
        parent(repo_a, repo_b, int(sys.argv[3]) if len(sys.argv) > 3 else 5)
