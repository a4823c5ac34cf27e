"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus; dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side, no
  Python). The correctness baseline.
- LSH-bucketed ANN: deterministic random-hyperplane signatures -> bucket
  equi-join -> cosine within bucket -> top-k. The scale path: candidate set
  shrinks by ~2^bits, recall tunable via multiple tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


# Above this many embedded model floats (centroids x dim, or hyperplanes x
# dim), scoring switches from plan-literal column expressions (codegen, used
# by the value-level oracles at small dim) to an Arrow-batched pandas UDF
# over a broadcast numpy matrix: a 768-dim x 16-centroid model would
# otherwise be a ~12k-literal expression tree evaluated per row (plan bloat,
# no codegen benefit).
_LITERAL_MODEL_LIMIT = 4096


def _cell_assigner(spark, cents: list, nprobe: int):
    """Returns ``fn(vec_col) -> array<long>`` of the ``nprobe`` best centroid
    cell ids by cosine, descending (ties -> smallest cell id).

    ``cents`` is a list of (cell_id, vector). Small models inline as literal
    expressions; large models broadcast one numpy matrix and score with a
    single BLAS matmul per Arrow batch.
    """
    dim = len(cents[0][1])
    if len(cents) * dim <= _LITERAL_MODEL_LIMIT:

        def lit_fn(vec):
            opts = []
            for cid, c in cents:
                arr = F.array(*[F.lit(float(x)) for x in c])
                cn = float(np.linalg.norm(c))
                cos = _dot(vec, arr) / (_norm(vec) * F.lit(cn))
                opts.append(F.struct(cos.alias("c"), F.lit(-cid).alias("negid")))
            ranked = F.slice(F.sort_array(F.array(*opts), False), 1, nprobe)
            return F.transform(ranked, lambda s: -s["negid"])

        return lit_fn

    from pyspark.sql.types import ArrayType, LongType

    cids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    norms = np.linalg.norm(C, axis=1)
    Cn = C / np.where(norms > 0, norms, 1.0)[:, None]
    b_mat = spark.sparkContext.broadcast(Cn)
    b_ids = spark.sparkContext.broadcast(cids)
    np_ = nprobe

    @F.pandas_udf(ArrayType(LongType()))
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # zero-row Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        try:
            X = np.stack(v.to_numpy())
        except ValueError as exc:
            raise ValueError(
                f"ragged or null vector in embedding batch (expected dim {dim})"
            ) from exc
        if X.ndim != 2 or X.shape[1] != dim:
            raise ValueError(
                f"embedding dim mismatch: got {X.shape[1:]}, expected dim {dim}"
            )
        # |x| is constant per row: argsort of dot(x, c/|c|) == argsort of
        # cosine. Stable sort keeps ascending matrix order (= ascending
        # cell id, cents are sorted) on ties.
        S = X @ b_mat.value.T
        order = np.argsort(-S, axis=1, kind="stable")[:, :np_]
        ids = b_ids.value[order]
        return pd.Series(list(ids))

    return lambda vec: probe(vec)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, vec_id, cosine, rank); rank ties broken by vec_id
    (deterministic). ``queries`` is broadcast — suitable for query sets that
    fit an executor; the corpus side streams.
    """
    c = with_norm(corpus, vec_col).withColumnRenamed("_norm", "_cnorm")
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
        "_qvec",
    ).withColumnRenamed("_norm", "_qnorm")
    joined = c.join(F.broadcast(q))
    sim = joined.select(
        "query_id",
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col("_qvec"))
            / (F.col("_cnorm") * F.col("_qnorm"))
        ).alias("cosine"),
    ).filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return sim.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _seed_centroids(v: DataFrame, n: int) -> list:
    """First ``n`` vectors in id order as (cell_id, numpy vector) — sparse
    or offset id spaces still yield a full centroid set."""
    cents = [
        (int(r["vid"]), np.asarray(r["v"], dtype=float))
        for r in v.orderBy("vid").limit(n).collect()
    ]
    if not cents:
        raise ValueError("corpus is empty, no centroids to seed")
    cents.sort(key=lambda t: t[0])
    return cents


def _lloyd_rounds(spark, v: DataFrame, cents: list, iters: int, round_dp: int | None = None):
    """``iters`` rounds of Lloyd/k-means over ``v`` (vid, v): assign each
    vector to its argmax-cosine centroid (ties -> smallest cell id), then
    replace each centroid with its cell's elementwise mean. Each round is
    one groupBy over the corpus + a driver collect of n_centroids x dim —
    the centroids ARE the model. Cells that end a round empty drop out.

    ``round_dp`` (optional) rounds every updated centroid coordinate to
    that many decimals: the mean is the ONE place where partition-order
    floating summation could diverge from a sequential ANSI-SQL replay, so
    rounding both sides to 9 dp makes the whole clustering run
    value-reproducible in the DuckDB oracle regardless of parallelism."""
    for _ in range(iters):
        assign1 = _cell_assigner(spark, cents, 1)
        assigned = v.withColumn("cell", assign1(F.col("v"))[0])
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_agg(F.struct("pos", "m")).alias("pm"))
            .collect()
        )
        new_cents = []
        for r in means:
            pm = sorted((p["pos"], p["m"]) for p in r["pm"])
            vec = np.array([m for _, m in pm])
            if round_dp is not None:
                vec = np.round(vec, round_dp)
            new_cents.append((int(r["cell"]), vec))
        if new_cents:
            cents = sorted(new_cents, key=lambda t: t[0])
    return cents


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: assign every vector to its nearest
    centroid cell, probe only the query's ``nprobe`` nearest cells.

    Centroids seed deterministically from the first ``n_centroids`` vectors
    (id order) and optionally refine with ``lloyd_iters`` rounds of
    Lloyd/k-means (cell-mean update; each round = one groupBy over the
    corpus + a driver collect of n_centroids x dim — the centroids are the
    model, broadcast back as literals). With ``lloyd_iters=0`` the whole
    pipeline is deterministic arithmetic on the input, reproducible in
    ANSI SQL for the value-level oracle. At 100 TB the cell equi-join
    replaces the full cross product — candidates shrink by
    ~nprobe/n_centroids; recall is tuned by nprobe.

    Returns (query_id, vec_id, cosine, rank).
    """
    spark = corpus.sparkSession
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # seed from the actual first n_centroids rows in id order — sparse or
    # offset id spaces still yield a full centroid set (round-2 advisory);
    # no round_dp: lloyd_iters=0 (the oracled config) never hits the mean,
    # and lloyd_iters>0 keeps its historical exact-mean behavior
    cents = _lloyd_rounds(spark, v, _seed_centroids(v, n_centroids), lloyd_iters)

    assign1 = _cell_assigner(spark, cents, 1)
    c = (
        with_norm(corpus.withColumn(vec_col, F.col(vec_col).cast("array<double>")), vec_col)
        .withColumn("cell", assign1(F.col(vec_col).cast("array<double>"))[0])
    )
    # query probe cells: nprobe best centroids, descending cosine
    probe_n = _cell_assigner(spark, cents, nprobe)
    q = (
        with_norm(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("_qvec"),
            ),
            "_qvec",
        )
        .withColumnRenamed("_norm", "_qnorm")
        .withColumn("cell", F.explode(probe_n(F.col("_qvec"))))
    )
    joined = c.join(F.broadcast(q), "cell")
    sim = joined.select(
        "query_id",
        F.col(id_col),
        (_dot(F.col(vec_col), F.col("_qvec")) / (F.col("_norm") * F.col("_qnorm"))).alias(
            "cosine"
        ),
    ).filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return sim.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(float)


def lsh_signature(vec_col, planes: np.ndarray):
    """Sign-bit signature as a long (column expression; planes are literals)."""
    sig = None
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sig


def lsh_bucket_assigner(spark, all_planes: list):
    """Returns ``fn(vec_col) -> array<string>`` of "table:signature" bucket
    keys, one per hash table.

    Small models (tables x bits x dim literals under the plan-size limit)
    inline as codegen column expressions; large ones broadcast the stacked
    plane tensor and compute all signatures with one matmul per Arrow batch.
    """
    tables = len(all_planes)
    bits, dim = all_planes[0].shape
    if tables * bits * dim <= _LITERAL_MODEL_LIMIT:

        def lit_fn(vec):
            return F.array(
                *[
                    F.concat_ws(":", F.lit(t), lsh_signature(vec, p))
                    for t, p in enumerate(all_planes)
                ]
            )

        return lit_fn

    from pyspark.sql.types import ArrayType, StringType

    P = np.concatenate(all_planes, axis=0)  # (tables*bits, dim)
    b_planes = spark.sparkContext.broadcast(P)
    shifts = np.int64(1) << np.arange(bits, dtype=np.int64)

    @F.pandas_udf(ArrayType(StringType()))
    def bucket_keys(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # zero-row Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        try:
            X = np.stack(v.to_numpy())
        except ValueError as exc:
            raise ValueError(
                f"ragged or null vector in embedding batch (expected dim {dim})"
            ) from exc
        if X.ndim != 2 or X.shape[1] != dim:
            raise ValueError(
                f"embedding dim mismatch: got {X.shape[1:]}, expected dim {dim}"
            )
        D = X @ b_planes.value.T  # (n, tables*bits)
        sigs = ((D >= 0).astype(np.int64).reshape(len(X), tables, bits) @ shifts)
        return pd.Series([[f"{t}:{int(s)}" for t, s in enumerate(row)] for row in sigs])

    return lambda vec: bucket_keys(vec)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane buckets.

    At 100TB the bucket join replaces the full cross product; recall/cost is
    tuned via ``bits`` (bucket selectivity) × ``tables`` (independent hash
    tables, unioned candidates — the standard LSH recall lever). ``dim`` is
    required (the hyperplane model is built at plan time; probing the data
    for it would cost an extra job — round-2 advisory).
    """
    if dim is None:
        raise ValueError(
            "cosine_topk_lsh: pass dim=<embedding dimension> explicitly "
            "(the array<double> schema does not carry it)"
        )
    all_planes = [_hyperplanes(dim, bits, seed + 977 * t) for t in range(tables)]
    buckets = lsh_bucket_assigner(corpus.sparkSession, all_planes)

    c = with_norm(corpus, vec_col).withColumn(
        "_bucket", F.explode(buckets(F.col(vec_col)))
    )
    q = (
        with_norm(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
            "_qvec",
        )
        .withColumnRenamed("_norm", "_qnorm")
        .withColumn("_bucket", F.explode(buckets(F.col("_qvec"))))
    )
    joined = c.join(F.broadcast(q), "_bucket").dropDuplicates(["query_id", id_col])
    sim = joined.select(
        "query_id",
        F.col(id_col),
        (_dot(F.col(vec_col), F.col("_qvec")) / (F.col("_norm") * F.col("_qnorm"))).alias(
            "cosine"
        ),
    ).filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return sim.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_clusters(
    vectors: DataFrame,
    k: int = 8,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means cluster assignment over an embedding column — the
    clustering stage of SemDeDup (Abbas et al., 2023, arXiv:2303.09540)
    and of cluster-balanced data mixing. Fully deterministic: centroids
    seed from the ``k`` smallest ids, refine with ``rounds`` Lloyd
    cell-mean updates (each coordinate rounded to 9 dp so the run is
    replayable in sequential ANSI SQL regardless of partition/summation
    order), final assignment is argmax cosine (ties -> smallest cluster
    id; a cell that empties mid-run drops out, matching the oracle).

    Scale design: the model is k x dim doubles. Each Lloyd round is one
    codegen groupBy over the corpus plus a driver collect of the k x dim
    means; assignment is one :func:`_cell_assigner` pass — plan-literal
    codegen at small k*dim, one BLAS matmul per Arrow batch over a
    broadcast matrix above ``_LITERAL_MODEL_LIMIT``. No shuffle of the
    corpus at any point (the only wide op is the partial-agg mean).

    Returns ``(id_col, cluster, cosine)`` — cosine to the assigned
    centroid. The reference repo has no analog; semantics are the
    published SemDeDup/k-means definitions.
    """
    if k < 1:
        raise ValueError(f"kmeans_clusters: k must be >= 1, got {k}")
    if rounds < 0:
        raise ValueError(f"kmeans_clusters: rounds must be >= 0, got {rounds}")
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = _lloyd_rounds(spark, v, _seed_centroids(v, k), rounds, round_dp=9)
    assign1 = _cell_assigner(spark, cents, 1)
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in c], float(np.linalg.norm(c))) for cid, c in cents],
        "cluster long, _cv array<double>, _cn double",
    )
    return (
        v.withColumn("cluster", assign1(F.col("v"))[0])
        .join(F.broadcast(cent_df), "cluster")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            (_dot(F.col("v"), F.col("_cv")) / (_norm(F.col("v")) * F.col("_cn"))).alias(
                "cosine"
            ),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    rounds: int = 1,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic near-duplicate pruning by
    clustering first, comparing only WITHIN clusters. A vector is a
    duplicate iff some lower-id vector in its cluster has cosine >=
    ``threshold``; survivors are the id-minimal representatives of each
    epsilon-ball (the paper keeps one exemplar per group; lowest id is the
    deterministic choice, mirroring every other dedup op here).

    Scale design: clustering bounds the quadratic term per cluster —
    SemDeDup ran 110k clusters over LAION-440M for exactly this reason, so
    ``k`` grows with the corpus and cluster sizes stay ~n/k. The pairwise
    stage is a cluster-keyed equi-join (hash-partitioned by cluster, no
    cross product), cosine in codegen via zip_with/aggregate, and the
    duplicate set is a semi-join back. Returns ``(id_col, cluster, keep)``.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    assigned = (
        kmeans_clusters(vectors, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col)
        .select(F.col(id_col).alias("vid"), "cluster")
        .join(v, "vid")
    )
    a = assigned.select(F.col("vid").alias("_a"), "cluster", F.col("v").alias("_av"))
    b = assigned.select(F.col("vid").alias("_b"), "cluster", F.col("v").alias("_bv"))
    dup = (
        a.join(b, "cluster")
        .filter(F.col("_a") < F.col("_b"))
        .filter(
            _dot(F.col("_av"), F.col("_bv")) / (_norm(F.col("_av")) * _norm(F.col("_bv")))
            >= F.lit(float(threshold))
        )
        .select(F.col("_b").alias("vid"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return assigned.join(dup, "vid", "left").select(
        F.col("vid").alias(id_col), "cluster", F.col("_dup").isNull().alias("keep")
    )
