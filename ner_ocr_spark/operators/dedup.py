"""Deduplication operators for training-data pipelines (driver brief).

All distributed-first:
  * exact        — hash groupBy, min-id winner (one shuffle on the hash)
  * minhash_lsh  — shingles -> k minhashes -> b bands -> band-bucket join;
                   candidate pairs only within equal (band, bucket) — the
                   classic MinHash+LSH plan; no O(n^2) pair enumeration
  * simhash      — 64-bit simhash via token-hash bit voting, bucket on
                   rotated prefixes for near-dup candidates
  * ngram_jaccard — exact Jaccard on word n-gram sets for candidate pairs
                   (verification stage after LSH, or standalone on small sets)
  * connected_components / dup_clusters — transitive-closes candidate pairs
                   into clusters (min-label star contraction, O(log n)
                   rounds) and picks one canonical doc per cluster

Everything uses built-in expressions (xxhash64, transform, aggregate,
explode) — no Python in the hot path; candidate verification is the only
place a pair-level computation happens and it is bounded by LSH bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mersenne prime for the affine minhash family; hashes are first reduced
# mod 2^31 so the affine map a*h+b stays far below int64 (ANSI overflow)
_MERSENNE = (1 << 31) - 1


def normalize_for_dedup(col: Column) -> Column:
    """lowercase, collapse whitespace — canonical text for hashing.

    Uses the pinned ASCII whitespace class (not \\s): DuckDB's RE2 \\s skips
    vertical tab, so \\s here would hash-diverge the value oracles on any
    VT-bearing document (round-2 ADVICE)."""
    from ner_ocr_spark.operators.normalize import WS_RUN

    return F.trim(F.regexp_replace(F.lower(col), WS_RUN, " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct normalized text, keeping the min
    id; n_dups counts the group. Single hash-aggregate shuffle; the 128-bit
    content key (two seeded xxhash64) avoids shuffling full texts at scale."""
    h = normalize_for_dedup(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.xxhash64(h).alias("h1"),
            F.xxhash64(h, F.lit(1)).alias("h2"),
        )
        .groupBy("h1", "h2")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from a word-array column.

    IMPORTANT: pass a MATERIALIZED column (one select upstream). An inline
    split(normalize(text)) expression here re-evaluates the regex for every
    lambda element — measured ~20 ms/row on KB-scale texts vs ~40 us with
    the words column materialized."""
    k = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def with_words(df: DataFrame, text_col: str = "text", out_col: str = "words") -> DataFrame:
    """Materialize the normalized word array once per row."""
    return df.withColumn(out_col, F.split(normalize_for_dedup(F.col(text_col)), " "))


def shingles(col: Column, n: int = 3) -> Column:
    """Inline variant for short texts/tests; see shingles_from_words for the
    hot path."""
    return shingles_from_words(F.split(normalize_for_dedup(col), " "), n)


def md5_hash31(col: Column) -> Column:
    """Portable 31-bit string hash: top 60 bits of md5 reduced mod 2^31.
    Identical in DuckDB as `CAST('0x' || substr(md5(s),1,15) AS BIGINT) %
    2147483648` — the shared base hash that makes the minhash signature
    oracle-checkable (xxhash64 has no DuckDB twin)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), F.lit(1 << 31)
    )


def xxhash31(col: Column) -> Column:
    """Production base hash: xxhash64 reduced to 31 bits (JVM-only, faster
    than the md5 path — default everywhere except the oracle)."""
    return F.pmod(F.xxhash64(col), F.lit(1 << 31))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    base_hash=None,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) minhash signatures.

    explode-then-aggregate instead of per-row higher-order transforms:
    HOF lambdas evaluate interpreted (no codegen); k min() aggregates over
    exploded shingle hashes stay in whole-stage codegen, and partial
    (map-side) aggregation collapses to one row per doc before the shuffle."""
    base_hash = base_hash or xxhash31
    hashed = (
        with_words(df, text_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles_from_words(F.col("words"), shingle_n)).alias("sh"),
        )
        .select("id", base_hash(F.col("sh")).alias("h"))
    )
    mins = [
        F.min(
            F.pmod(F.col("h") * F.lit(2 * i + 1) + F.lit(7919 * (i + 1)), F.lit(_MERSENNE))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return (
        hashed.groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig"))
    )


def _cap_bucket_df(
    bucketed: DataFrame, keys: list[str], max_bucket_df: int | None
) -> DataFrame:
    """Stop-hash guard for the candidate-pair generators: drop every bucket
    whose document frequency exceeds `max_bucket_df` BEFORE the bucket
    self-join. Pairs within a bucket are quadratic in bucket size, so at
    corpus scale one hot hash (a license header, a templated page, boiler-
    plate shared by 10^5 docs) turns into 10^10 pairs inside a single
    straggler task; a df cap bounds per-bucket work at max_bucket_df^2/2.
    The window count partitions on the SAME keys the self-join shuffles on,
    so the cap rides the exchange the join already needs (no extra
    shuffle). None disables the cap (exact small-scale behavior)."""
    if max_bucket_df is None:
        return bucketed
    w = Window.partitionBy(*keys)
    return (
        bucketed.withColumn("_bdf", F.count("*").over(w))
        .filter(F.col("_bdf") <= F.lit(max_bucket_df))
        .drop("_bdf")
    )


def hot_bucket_report(
    bucketed: DataFrame, keys: list[str], max_bucket_df: int
) -> DataFrame:
    """Dropped-mass report companion to `_cap_bucket_df`: per over-cap
    bucket, its document frequency and the pair count the cap avoided
    (df*(df-1)/2). Run alongside a capped pair generation so the dropped
    mass is OBSERVED, never silent (a curation run should log/persist it
    and alert when pairs_avoided is a large fraction of the corpus)."""
    return (
        bucketed.groupBy(*keys)
        .agg(F.count("*").alias("bucket_df"))
        .filter(F.col("bucket_df") > F.lit(max_bucket_df))
        # integer `div`, not float `/`: a 10^9-doc bucket's pair count
        # exceeds 2^53 and float division would round it
        .withColumn(
            "pairs_avoided",
            F.expr("bucket_df * (bucket_df - 1) div 2"),
        )
    )


def minhash_band_table(
    sig: DataFrame, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(id, band_idx, band_hash) banded projection of a minhash-signature
    table — the bucket table minhash LSH self-joins on."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")


def minhash_hot_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    base_hash=None,
    max_bucket_df: int = 1000,
) -> DataFrame:
    """(band_idx, band_hash, bucket_df, pairs_avoided) for every band
    bucket a `minhash_lsh_pairs(..., max_bucket_df=...)` run would drop."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, base_hash)
    banded = minhash_band_table(sig, num_hashes, bands)
    return hot_bucket_report(banded, ["band_idx", "band_hash"], max_bucket_df)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    base_hash=None,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Plan (shuffle diet, round-2): the banded self-join carries ONLY
    (id, band_idx, band_hash) — signatures never ride the band shuffle
    (round 1 duplicated the 32-long sig 2x bands times through it). The
    (id_a, id_b) candidates are distinct()ed FIRST, then one re-join per
    side fetches the two signatures for est_jaccard. The signature subtree
    is built three times in the plan, but Spark's ReuseExchange collapses
    the identical shuffle; and since `sig` is groupBy(id)-partitioned, the
    id_a/id_b joins reuse that partitioning instead of re-shuffling the
    big side.

    `max_bucket_df` is the stop-hash cap (see `_cap_bucket_df`): buckets
    with more than that many member docs are dropped before the self-join
    so boilerplate-hot band hashes can't go quadratic at corpus scale;
    `minhash_hot_buckets` reports the dropped mass."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, base_hash)
    banded = _cap_bucket_df(
        minhash_band_table(sig, num_hashes, bands),
        ["band_idx", "band_hash"],
        max_bucket_df,
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sig_a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    eq = F.aggregate(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(eq / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
    )


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    base_hash=None, n_bits: int = 64, shingle_n: int = 2,
) -> DataFrame:
    """(id, simhash) n_bits-wide SimHash per document.

    base_hash defaults to xxhash64 (production); the md5-based portable
    hash (md5_hash60) with n_bits=60 makes the signature oracle-checkable
    against DuckDB (see q_simhash_sig)."""
    # exploded-codegen form (see minhash_lsh_pairs): n_bits conditional-sum
    # aggregates beat n_bits interpreted HOF folds by an order of magnitude
    base_hash = base_hash or F.xxhash64
    hashed = (
        with_words(df, text_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles_from_words(F.col("words"), shingle_n)).alias("sh"),
        )
        .select("id", base_hash(F.col("sh")).alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(n_bits)
    ]
    packed = None
    for bit in range(n_bits):
        term = F.when(
            F.col(f"v{bit}") > 0, F.shiftleft(F.lit(1).cast("long"), bit)
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed.bitwiseOR(term)
    return hashed.groupBy("id").agg(*votes).select("id", packed.alias("simhash"))


def md5_hash60(col: Column) -> Column:
    """Portable 60-bit string hash (top 15 hex digits of md5) — the DuckDB
    twin is CAST('0x' || substr(md5(s),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _rotl64(col: Column, r: int) -> Column:
    if r % 64 == 0:
        return col
    r = r % 64
    return F.shiftleft(col, r).bitwiseOR(F.shiftrightunsigned(col, 64 - r))


def simhash_bucket_table(
    sh: DataFrame, prefix_bits: int = 16, rotations: int = 4
) -> DataFrame:
    """(id, simhash, rot, bucket) rotation-bucket projection of a
    (id, simhash) table — the bucket table the rotation scheme joins on."""
    step = 64 // rotations
    return sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("rot"),
                    F.shiftrightunsigned(
                        _rotl64(F.col("simhash"), r * step), 64 - prefix_bits
                    ).alias("bucket"),
                )
                for r in range(rotations)
            ])
        ).alias("rb"),
    ).select("id", "simhash", "rb.rot", "rb.bucket")


def simhash_hot_buckets(
    sh: DataFrame,
    prefix_bits: int = 16,
    rotations: int = 4,
    max_bucket_df: int = 1000,
) -> DataFrame:
    """(rot, bucket, bucket_df, pairs_avoided) for every rotation bucket a
    `simhash_bucket_pairs(..., max_bucket_df=...)` run would drop."""
    bucketed = simhash_bucket_table(sh, prefix_bits, rotations).drop("simhash")
    return hot_bucket_report(bucketed, ["rot", "bucket"], max_bucket_df)


def simhash_bucket_pairs(
    sh: DataFrame, prefix_bits: int = 16, rotations: int = 4,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Candidate pairs from a (id, simhash) table via the rotation scheme
    (Manku et al., WWW'07): bucket on the top `prefix_bits` of each of
    `rotations` rotated copies of the simhash, then self-join per
    (rotation, bucket). A pair within Hamming distance d collides in at
    least one table whenever the d differing bits avoid one rotation's
    prefix window — with 4 rotations of 16 bits, any 1-2-bit difference
    always survives in some table (round 1 used ONE table and missed
    flips landing in the prefix).

    `max_bucket_df` is the stop-hash cap (see `_cap_bucket_df`) — a hot
    rotation bucket (identical boilerplate => identical simhash prefix)
    is dropped from EVERY table it exceeds the cap in, bounding per-bucket
    join work; `simhash_hot_buckets` reports the dropped mass."""
    bucketed = _cap_bucket_df(
        simhash_bucket_table(sh, prefix_bits, rotations),
        ["rot", "bucket"],
        max_bucket_df,
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(r, on=[F.col("l.rot") == F.col("r.rot"),
                      F.col("l.bucket") == F.col("r.bucket"),
                      F.col("l.id") < F.col("r.id")])
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            _hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .distinct()
    )


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    prefix_bits: int = 16, rotations: int = 4,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Near-dup candidates: simhash + rotation-scheme bucketing (see
    simhash_bucket_pairs). rotations=1 degrades to the single-prefix table."""
    return simhash_bucket_pairs(
        simhash_table(df, text_col, id_col), prefix_bits, rotations,
        max_bucket_df=max_bucket_df,
    )


def _hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def fingerprint_hot_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    base_hash=None,
    max_bucket_df: int = 1000,
) -> DataFrame:
    """(h, bucket_df, pairs_avoided) for every winnowing hash a
    `fingerprint_pairs(..., max_bucket_df=...)` run would drop."""
    from ner_ocr_spark.operators.textstats import fingerprint

    fp = fingerprint(df.select(id_col, text_col), text_col=text_col,
                     k=k, window=window, base_hash=base_hash)
    hashes = fp.select(F.col(id_col).alias("id"), F.explode("fingerprint").alias("h"))
    return hot_bucket_report(hashes, ["h"], max_bucket_df)


def fingerprint_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 16,
    min_shared: int = 2,
    base_hash=None,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Containment/plagiarism candidate pairs via WINNOWING fingerprints
    (the 5th dedup family, complementing exact/MinHash/SimHash/Jaccard):
    two documents sharing >= min_shared selected winnowing hashes share
    that many >= (window+k-1)-char runs. Bucket join on the selected
    hashes — each doc contributes only its fingerprint set (~2/window of
    its k-gram count), so the join input is a small fraction of the text,
    and pairs count shared hashes with one aggregate. Catches asymmetric
    CONTAINMENT (a paragraph lifted into a larger doc) that whole-document
    Jaccard/minhash dilutes away.

    `max_bucket_df` is the stop-hash cap (see `_cap_bucket_df`): a
    winnowing hash shared by more docs than the cap (license header,
    templated boilerplate) is dropped before the self-join — stop-hash
    semantics, so surviving pairs count only retained hashes in n_shared
    (fp_jaccard keeps the FULL fingerprint sizes in its denominator);
    `fingerprint_hot_hashes` reports the dropped mass."""
    from ner_ocr_spark.operators.textstats import fingerprint

    fp = fingerprint(df.select(id_col, text_col), text_col=text_col,
                     k=k, window=window, base_hash=base_hash)
    # PERF barrier, do not "simplify": exploding the fingerprint column
    # directly lets the optimizer fold the whole winnowing chain into the
    # generator as ONE expression tree, where the k-gram hash array lands
    # inside the window-min lambda and is RE-EVALUATED per window position
    # (the CLAUDE.md HOF sharp edge, reached through CollapseProject +
    # Generate — reference-counting tricks do NOT survive the Generate
    # pull-in; measured 324 s vs 3 s on 200 docs). A cache boundary
    # (InMemoryRelation) is the one barrier optimization cannot cross; the
    # cached table is tiny (id + ~2/window of the k-gram count as longs)
    # and BOTH join sides read it, so fingerprints compute exactly once.
    fp = fp.select(F.col(id_col).alias("id"), "fingerprint").persist()
    hashes = _cap_bucket_df(
        fp.select(
            "id",
            F.size("fingerprint").alias("n_fp"),
            F.explode("fingerprint").alias("h"),
        ),
        ["h"],
        max_bucket_df,
    )
    l, r = hashes.alias("l"), hashes.alias("r")
    shared = F.count("*")
    return (
        l.join(r, on=[F.col("l.h") == F.col("r.h"),
                      F.col("l.id") < F.col("r.id")])
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(
            shared.alias("n_shared"),
            F.first(F.col("l.n_fp")).alias("_na"),
            F.first(F.col("r.n_fp")).alias("_nb"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "id_a", "id_b", "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")).cast("double"),
                4,
            ).alias("fp_jaccard"),
        )
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component is
    the MINIMUM node id of its connected component.

    This is dup-CLUSTER resolution — the step after LSH/SimHash candidate
    generation that the pairwise operators stop short of: near-dup pairs
    are not transitive-closed, so keeping `min(id_a, id_b)` per pair both
    over- and under-deletes. Grouping pairs into components gives one
    canonical (min-id) document per cluster (`node == component` is the
    keep predicate).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    published O(log^2 n)-round MapReduce algorithm. (Naive min-label
    contraction is O(n) on a path: each round the relabeled path is again
    a path, one node shorter.) Per round:

      * large-star: every node connects its STRICTLY LARGER neighbors to
        the minimum of its closed neighborhood — one groupBy-min + one
        join, no adjacency lists materialized;
      * small-star: with edges oriented large->small, every node connects
        its smaller neighbors (and itself) to their minimum.

    The edge set converges to per-component stars centered on the
    component minimum; the loop stops when a round leaves the edge set
    unchanged (count + order-independent hash — one scalar action per
    round, never a data collect), with `max_iter` as a runaway guard.
    The per-round checkpoint is LAZY (`localCheckpoint(eager=False)`): the
    convergence-signature aggregate is the action that materializes it, so
    each round runs exactly ONE job instead of the round-3 two
    (eager-checkpoint job + separate signature job) — halves the
    job-latency floor on small inputs. localCheckpoint truncates per-round
    lineage (on a real cluster prefer reliable checkpoint() for executor
    fault tolerance at 100 TB — same plan otherwise).
    """
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("s") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            # decimal sum: ANSI mode hard-errors on int64 overflow
            F.sum(F.xxhash64("s", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("s").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("s").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("s"), F.greatest("v", "m").alias("b"))
            .filter(F.col("s") != F.col("b"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # oriented large -> small: u is the big endpoint, v the small
        oriented = e.select(F.col("b").alias("u"), F.col("s").alias("v"))
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            oriented.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("s"), F.col("v").alias("b"))
        )
        selfed = mins.select(F.col("m").alias("s"), F.col("u").alias("b"))
        return (
            linked.unionByName(selfed)
            .filter(F.col("s") != F.col("b"))
            .distinct()
        )

    sig = _signature(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged edges are stars (child -> component min): component(node) =
    # min over incident edges, and the root/singleton keeps itself
    incident = edges.select(F.col("b").alias("node"), F.col("s").alias("c")).unionByName(
        edges.select(F.col("s").alias("node"), F.col("s").alias("c"))
    )
    return (
        nodes.join(incident.groupBy("node").agg(F.min("c").alias("component")),
                   "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-document cluster assignment + keep flag from candidate pairs:
    (id, cluster_id, keep) where cluster_id is the component min and
    keep=1 marks the canonical survivor. Documents in NO pair keep
    themselves (cluster_id = own id) via a broadcast-friendly left join —
    the full corpus never shuffles on the pair graph."""
    cc = connected_components(pairs, src, dst)
    return (
        df.select(F.col(id_col))
        .join(cc, df[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col))
            .cast("int")
            .alias("keep"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    group_col: str | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact word-n-gram Jaccard for pairs within `group_col` (or a prefix
    blocking key when None). Blocking bounds the pair count; built-in
    array_intersect/array_union do the set math JVM-side."""
    block = F.col(group_col) if group_col else F.substring(normalize_for_dedup(F.col(text_col)), 1, 8)
    base = with_words(df, text_col).select(
        F.col(id_col).alias("id"),
        block.alias("block"),
        shingles_from_words(F.col("words"), n).alias("grams"),
    )
    l, r = base.alias("l"), base.alias("r")
    inter = F.size(F.array_intersect(F.col("l.grams"), F.col("r.grams")))
    union = F.size(F.array_union(F.col("l.grams"), F.col("r.grams")))
    raw = inter.cast("double") / union
    # filter on the RAW ratio, round only in the projection — filtering on
    # the rounded value includes pairs in [threshold-5e-5, threshold) that
    # an exact-threshold consumer (and the oracle SQL) excludes
    return (
        l.join(r, on=[F.col("l.block") == F.col("r.block"),
                      F.col("l.id") < F.col("r.id")])
        .filter(raw >= threshold)
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.round(raw, 4).alias("jaccard"),
        )
    )
