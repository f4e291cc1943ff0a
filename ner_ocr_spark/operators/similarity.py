"""Similarity search over embedding columns (driver brief).

  * brute-force cosine top-k: exact baseline — broadcast the query set,
    JVM-side dot product via zip_with/aggregate, per-query top-k window.
  * LSH-bucketed (random hyperplane / SRP) variant: the scale path — sign
    bits of fixed seeded hyperplanes bucket vectors; candidates only meet
    within a bucket, then exact cosine re-rank. At 100 TB the bucket join
    shuffles hashes, never the O(n*q) cross product.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. queries is small -> broadcast; the big
    side streams map-side (no shuffle of vectors); the only shuffle is the
    per-query top-k window over n_queries*k' rows."""
    q = F.broadcast(queries.select(F.col(qid_col), F.col(qvec_col)))
    scored = vectors.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        qid_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col(qvec_col)), 4).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "srp") -> np.ndarray:
    """Deterministic random hyperplanes (seeded from hashlib, not global
    RNG state)."""
    h = hashlib.sha256(f"{seed}|{dim}|{n_planes}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randn(n_planes, dim).astype(np.float64)


def srp_bucket_expr(vec_col, planes: np.ndarray):
    """Signed-random-projection bucket id: sign bit per hyperplane packed
    into a long. Pure expressions over the array column — the plane
    coefficients fold in as literals."""
    bits = []
    for i, plane in enumerate(planes):
        dot = None
        for j, w in enumerate(plane):
            term = F.element_at(vec_col, j + 1) * F.lit(float(w))
            dot = term if dot is None else dot + term
        bits.append(F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, equi-join on bucket, exact
    cosine re-rank inside buckets. Recall grows with fewer planes /
    multi-probe; this is the single-table variant."""
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn("bucket", srp_bucket_expr(F.col(vec_col), planes))
    q = F.broadcast(
        queries.withColumn("bucket", srp_bucket_expr(F.col(qvec_col), planes))
    )
    scored = v.join(q, "bucket").select(
        qid_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col(qvec_col)), 4).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )
