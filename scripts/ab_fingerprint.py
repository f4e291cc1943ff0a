"""A/B: fingerprint winnowing forms on LONG documents (round-2 verdict #6).

A = shipped HOF form (textstats.fingerprint): k-gram hash array via
    F.transform, sliding window-min via F.slice + array_min inside a second
    transform. Interpreted lambdas, O(n*w) work, NO shuffle, no row blowup.
B = explode + window form (the "minhash pattern" suggestion): posexplode
    the k-gram hash array, sliding min() OVER (PARTITION BY doc ORDER BY
    pos ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING), then
    collect_list/array_distinct back per doc. Codegen aggregates but
    O(n*w) too, PLUS a full shuffle of every k-gram hash (8 B x n_chars
    per doc crosses the wire) and a per-doc regroup.

Usage: python scripts/ab_fingerprint.py [repeat_factor]
Writes one line per variant; equality of outputs is asserted first.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ner_ocr_spark.operators.textstats import fingerprint
from ner_ocr_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
K, W = 8, 16


def fingerprint_exploded(df, k=K, window=W):
    """Variant B: explode -> codegen sliding window min -> regroup."""
    from ner_ocr_spark.operators.normalize import WS_RUN
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), WS_RUN, " "))
    out = df.select("doc_id", norm.alias("_n"))
    n_pos = F.greatest(F.length("_n") - (k - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: F.xxhash64(F.substring(F.col("_n"), i, k)),
    )
    long = out.select("doc_id", F.posexplode(hs).alias("pos", "h"))
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    n_win = F.greatest(F.size(hs) - (window - 1), F.lit(1))
    sel = long.withColumn("wmin", F.min("h").over(win)).join(
        out.select("doc_id", n_win.alias("_nw")), "doc_id"
    ).filter(F.col("pos") < F.col("_nw"))
    return (
        sel.groupBy("doc_id")
        .agg(F.array_sort(F.array_distinct(F.collect_list("wmin"))).alias("fingerprint"))
        .withColumn(
            "fingerprint_digest",
            F.md5(F.array_join(
                F.transform(F.col("fingerprint"), lambda x: x.cast("string")), ","
            )),
        )
    )


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        # inflate each text ~rep x (10-100 KB docs: the long-document regime)
        .select(
            "doc_id",
            F.array_join(F.array_repeat(F.col("text"), rep), " ").alias("text"),
        )
        .cache()
    )
    n = docs.count()
    avg_len = docs.select(F.avg(F.length("text"))).first()[0]
    print(f"docs={n} avg_chars={avg_len:.0f}")

    a = fingerprint(docs).select("doc_id", "fingerprint_digest")
    b = fingerprint_exploded(docs).select("doc_id", "fingerprint_digest")
    mismatch = a.join(b, "doc_id").filter(
        a["fingerprint_digest"] != b["fingerprint_digest"]
    ).count()
    assert mismatch == 0, f"variants disagree on {mismatch} docs"
    print("outputs identical: True")

    for name, build in (("A_hof", lambda: fingerprint(docs)),
                        ("B_explode", lambda: fingerprint_exploded(docs))):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            build().select(F.count("fingerprint_digest")).collect()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.3f}s times={[f'{t:.3f}' for t in times]}")


if __name__ == "__main__":
    main()
