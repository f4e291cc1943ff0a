"""Similarity search over embedding columns (driver brief).

  * brute-force cosine top-k: exact baseline — broadcast the query set,
    JVM-side dot product via zip_with/aggregate, per-query top-k window.
  * LSH-bucketed (random hyperplane / SRP) variant: the scale path — sign
    bits of fixed seeded hyperplanes bucket vectors; candidates only meet
    within a bucket, then exact cosine re-rank. At 100 TB the bucket join
    shuffles hashes, never the O(n*q) cross product.
  * IVF (inverted-file) variant: k-means coarse quantizer trained on a
    BOUNDED sample driver-side (fixed cost at any corpus size), centroids
    fold into the plan as literals, every vector assigns to its nearest
    centroid JVM-side (codegen, no python), queries probe their n_probe
    nearest lists — the classic FAISS-style IVF recall/cost dial.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf resolves 'pd.Series' hints here

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
    # norms materialize ON EACH SIDE of the join (round 6): inline
    # cosine_expr re-folded ||a|| and ||b|| per PAIR — 3 interpreted
    # O(dim) folds per pair instead of 1; same doubles, so the rounded
    # output is bit-identical (guide §1.2 "don't compute things twice")
    q = F.broadcast(
        queries.select(F.col(qid_col), F.col(qvec_col))
        .withColumn("_qn", _norm(F.col(qvec_col)))
    )
    scored = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .withColumn("_vn", _norm(F.col(vec_col)))
        .crossJoin(q)
        .select(
            qid_col,
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col(qvec_col))
                / (F.col("_vn") * F.col("_qn")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the standard ANN memory
    diet: 4x smaller than float32, 8x than double): scale = max |component|,
    q_i = round(v_i / scale * 127) in [-127, 127]. Adds `{out_col}`
    (array<int>) and `{out_col}_scale` (the dequantization factor;
    v ~ q * scale / 127). Zero vectors quantize to zeros with scale 1.

    Rounding is written explicitly as sign(y)*floor(|y| + 0.5) — identical
    half-away-from-zero semantics in Spark and DuckDB regardless of either
    engine's round() mode, which keeps the operator value-checkable. The
    scale column materializes BEFORE the transform lambda (an inline
    array_max there would re-reduce the vector once per element)."""
    scale_col = f"{out_col}_scale"
    v = F.col(vec_col)
    raw = F.array_max(F.transform(v, lambda x: F.abs(x)))
    out = df.withColumn(
        scale_col, F.when(raw > 0, raw).otherwise(F.lit(1.0))
    )

    def q_elem(x):
        y = x / F.col(scale_col) * 127.0
        return (F.signum(y) * F.floor(F.abs(y) + 0.5)).cast("int")

    return out.withColumn(out_col, F.transform(v, q_elem))


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
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, equi-join on bucket, exact
    cosine re-rank inside buckets.

    multi_probe (default on, round-2): each query additionally probes
    every bucket at Hamming distance 1 from its own — near-plane queries
    stop missing neighbours that landed one sign-bit away, at n_planes+1
    broadcast probe rows per query (the VECTORS side still maps once and
    never shuffles; only the tiny query side fans out)."""
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn(
        "bucket", srp_bucket_expr(F.col(vec_col), planes)
    ).withColumn("_vn", _norm(F.col(vec_col)))
    qb = srp_bucket_expr(F.col(qvec_col), planes)
    if multi_probe:
        # flip masks via a HOF so the 512-term bucket expression appears
        # ONCE in the plan (an F.array of qb^bit copies duplicated it
        # n_planes+1 times and blew the 64 KB codegen method limit)
        masks = F.array(F.lit(0).cast("long"), *[
            F.lit(1 << i).cast("long") for i in range(n_planes)
        ])
        probes = F.transform(masks, lambda m: qb.bitwiseXOR(m))
        q = F.broadcast(
            queries.select(
                qid_col, qvec_col, F.explode(probes).alias("bucket")
            ).withColumn("_qn", _norm(F.col(qvec_col)))
        )
    else:
        q = F.broadcast(
            queries.withColumn("bucket", qb)
            .withColumn("_qn", _norm(F.col(qvec_col)))
        )
    # no distinct needed: a vector owns ONE bucket and the probe buckets
    # are pairwise different, so each (query, vector) pair meets at most
    # once — a distinct() here would buy nothing and cost a shuffle.
    # norms ride the join sides (round 6: one O(dim) fold per pair, not 3;
    # bit-identical — see brute_force_topk)
    scored = v.join(q, "bucket").select(
        qid_col,
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col(qvec_col))
            / (F.col("_vn") * F.col("_qn")),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    sample_n: int = 2048,
    iters: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "ivf",
) -> np.ndarray:
    """Coarse quantizer: Lloyd k-means over a BOUNDED ordered sample.

    orderBy(id).limit(n) compiles to TakeOrdered (a top-N, not a full
    sort), so the training step costs O(sample) at any corpus size and is
    deterministic. The centroids are small (k x dim) and ride the plan as
    literals afterwards."""
    rows = (
        vectors.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty vectors table")
    x = np.array([r[0] for r in rows], dtype=np.float64)
    if dim is not None and x.shape[1] != dim:
        raise ValueError(f"expected dim {dim}, got {x.shape[1]}")
    return lloyd_kmeans(x, n_centroids, iters=iters, seed=seed)


def lloyd_kmeans(
    x: np.ndarray, n_centroids: int, iters: int = 10, seed: str = "ivf"
) -> np.ndarray:
    """Seeded Lloyd iteration over an in-memory float64 sample. Shared by
    the Spark trainer and the DuckDB oracle generator so both sides hold
    BITWISE-identical centroids (the oracle folds them in as literals)."""
    # degrade gracefully on tiny corpora: one list per vector at most
    n_centroids = min(n_centroids, len(x))
    h = hashlib.sha256(f"{seed}|{n_centroids}|{x.shape}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    cents = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """Nearest-centroid id (argmin squared distance = argmax v.c - |c|^2/2)
    as a VECTORIZED Arrow kernel: one numpy matmul per batch.

    Why not literal-folded column expressions like srp_bucket_expr: at
    k x d >= ~512 terms the generated Java method exceeds the 64 KB JVM
    limit ("Code grows beyond 64 KB", measured) and Spark silently falls
    back to interpreted evaluation — a BLAS matmul over the Arrow batch is
    both faster and scales with k. Ties break to the LOWER centroid id
    (numpy argmax takes the first maximum)."""
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(centroids, dtype=np.float64)
    half_norms = (c * c).sum(axis=1) / 2.0

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy())
        scores = x @ c.T - half_norms
        return pd.Series(scores.argmax(axis=1).astype("int32"))

    return _assign


def ivf_probe_udf(centroids: np.ndarray, n_probe: int):
    """The query side's n_probe nearest centroid ids (array<int>), same
    Arrow kernel shape as ivf_assign_udf (queries are few; this runs
    once per query row)."""
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(centroids, dtype=np.float64)
    half_norms = (c * c).sum(axis=1) / 2.0

    @pandas_udf("array<int>")
    def _probe(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy())
        d = half_norms - x @ c.T  # asc = nearest
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return _probe


def _sql_double_list(vals) -> str:
    """DuckDB DOUBLE[] literal with full round-trip precision (repr of a
    python float is the shortest string that parses back to the same
    double under correct rounding, which DuckDB's DECIMAL->DOUBLE and
    scientific-notation paths both honor)."""
    return "CAST([" + ", ".join(repr(float(v)) for v in vals) + "] AS DOUBLE[])"


def lsh_topk_oracle_sql(
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    multi_probe: bool = True,
    emb_table: str = "embeddings",
    query_pred: str = "vec_id < 3",
) -> str:
    """DuckDB value-twin of lsh_topk. The hyperplanes are deterministic
    seeded literals (the same _hyperplanes call), so SRP bucketing IS
    SQL-expressible (round-2 verdict): fold the plane coefficients in as
    DOUBLE[] literals, pack sign bits, expand the Hamming-1 probe masks
    with xor, and re-rank with the exact cosine — same shape as the Spark
    plan. Only cross-engine float risk: a plane dot within one ulp of 0
    flipping a sign bit (probability ~0 on continuous data)."""
    planes = _hyperplanes(dim, n_planes)
    bucket_terms = "\n                 + ".join(
        f"(CASE WHEN list_dot_product(e, {_sql_double_list(p)}) >= 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    masks = [0] + ([1 << i for i in range(n_planes)] if multi_probe else [])
    mask_list = ", ".join(f"CAST({m} AS BIGINT)" for m in masks)
    return f"""
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                     FROM {emb_table}),
        v AS (SELECT vec_id, e, {bucket_terms} AS bucket FROM emb),
        q AS (SELECT vec_id AS query_id, e AS qv, bucket AS qb
              FROM v WHERE {query_pred}),
        probes AS (
            SELECT query_id, qv, xor(qb, m) AS bucket
            FROM q, LATERAL (SELECT unnest([{mask_list}]) AS m) t
        ),
        scored AS (
            SELECT p.query_id, v.vec_id,
                   round(list_dot_product(v.e, p.qv)
                         / (sqrt(list_dot_product(v.e, v.e))
                            * sqrt(list_dot_product(p.qv, p.qv))), 4) AS cosine
            FROM v JOIN probes p USING (bucket)
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def ivf_topk_oracle_sql(
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    emb_table: str = "embeddings",
    query_pred: str = "vec_id < 3",
) -> str:
    """DuckDB value-twin of ivf_topk for a GIVEN trained centroid set —
    the caller trains the identical centroids via lloyd_kmeans over the
    same deterministic sample and this folds them in as literals.
    Assignment is argmax(v.c - |c|^2/2) with ties to the LOWER centroid id:
    list_position(s, list_max(s)) picks the first maximum exactly like
    numpy argmax in ivf_assign_udf."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    half_norms = (c * c).sum(axis=1) / 2.0
    score_terms = ",\n                   ".join(
        f"list_dot_product(e, {_sql_double_list(cc)})"
        f" - CAST({float(h)!r} AS DOUBLE)"
        for cc, h in zip(c, half_norms)
    )
    n_cent = len(c)
    return f"""
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                     FROM {emb_table}),
        sc AS (SELECT vec_id, e,
                  [{score_terms}] AS s
               FROM emb),
        v AS (SELECT vec_id, e,
                     CAST(list_position(s, list_max(s)) - 1 AS INT) AS _ivf
              FROM sc),
        q AS (SELECT vec_id AS query_id, e AS qv, s AS qs
              FROM sc WHERE {query_pred}),
        probes AS (
            SELECT query_id, qv, CAST(c AS INT) AS _ivf FROM (
                SELECT query_id, qv, c,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY qs[c + 1] DESC, c ASC) AS pr
                FROM q, LATERAL (SELECT unnest(range(0, {n_cent})) AS c) t
            ) WHERE pr <= {n_probe}
        ),
        scored AS (
            SELECT p.query_id, v.vec_id,
                   round(list_dot_product(v.e, p.qv)
                         / (sqrt(list_dot_product(v.e, v.e))
                            * sqrt(list_dot_product(p.qv, p.qv))), 4) AS cosine
            FROM v JOIN probes p USING (_ivf)
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroids: np.ndarray | None = None,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via IVF: assign vectors to inverted lists, probe
    each query's n_probe nearest lists, exact cosine re-rank inside them.
    n_probe = n_centroids degrades to exact brute force. The big side maps
    once (assignment is codegen) and joins the broadcast probe set on the
    list id — vectors never shuffle."""
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, n_centroids, id_col=id_col, vec_col=vec_col
        )
    v = vectors.withColumn(
        "_ivf", ivf_assign_udf(centroids)(F.col(vec_col))
    ).withColumn("_vn", _norm(F.col(vec_col)))
    probes = F.broadcast(
        queries.select(
            qid_col, qvec_col,
            F.explode(
                ivf_probe_udf(centroids, n_probe)(F.col(qvec_col))
            ).alias("_ivf"),
        ).withColumn("_qn", _norm(F.col(qvec_col)))
    )
    # norms ride the join sides (round 6: one O(dim) fold per pair, not 3;
    # bit-identical — see brute_force_topk)
    scored = v.join(probes, "_ivf").select(
        qid_col,
        id_col,
        F.round(
            _dot(F.col(vec_col), F.col(qvec_col))
            / (F.col("_vn") * F.col("_qn")),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine", "rank")
    )
