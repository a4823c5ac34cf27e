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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


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
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = [
        (int(r["vid"]), np.asarray(r["v"], dtype=float))
        for r in v.filter(F.col("vid") < n_centroids).collect()
    ]
    cents.sort(key=lambda t: t[0])

    def cell_expr(vec, cent_list):
        # argmax cosine over centroids; ties -> smallest centroid id
        opts = []
        for cid, c in cent_list:
            arr = F.array(*[F.lit(float(x)) for x in c])
            cn = float(np.linalg.norm(c))
            cos = _dot(vec, arr) / (_norm(vec) * F.lit(cn))
            opts.append(F.struct(cos.alias("c"), F.lit(-cid).alias("negid")))
        return -F.array_max(F.array(*opts))["negid"]

    for _ in range(lloyd_iters):
        assigned = v.withColumn("cell", cell_expr(F.col("v"), cents))
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
            new_cents.append((int(r["cell"]), np.array([m for _, m in pm])))
        if new_cents:
            cents = sorted(new_cents, key=lambda t: t[0])

    c = (
        with_norm(corpus.withColumn(vec_col, F.col(vec_col).cast("array<double>")), vec_col)
        .withColumn("cell", cell_expr(F.col(vec_col).cast("array<double>"), cents))
    )
    # query probe cells: nprobe best centroids, descending cosine
    probe_arr = F.array(
        *[
            F.struct(
                (_dot(F.col("_qvec"), F.array(*[F.lit(float(x)) for x in cv]))
                 / (F.col("_qnorm") * F.lit(float(np.linalg.norm(cv))))).alias("c"),
                F.lit(-cid).alias("negid"),
            )
            for cid, cv in cents
        ]
    )
    q = (
        with_norm(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("_qvec"),
            ),
            "_qvec",
        )
        .withColumnRenamed("_norm", "_qnorm")
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(F.sort_array(probe_arr, False), 1, nprobe),
                    lambda s: -s["negid"],
                )
            ),
        )
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
    tables, unioned candidates — the standard LSH recall lever).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    all_planes = [_hyperplanes(dim, bits, seed + 977 * t) for t in range(tables)]

    def buckets(vec):
        return F.array(
            *[
                F.struct(F.lit(t).alias("t"), lsh_signature(vec, p).alias("b"))
                for t, p in enumerate(all_planes)
            ]
        )

    c = (
        with_norm(corpus, vec_col)
        .withColumn("_tb", F.explode(buckets(F.col(vec_col))))
        .withColumn("_bucket", F.concat_ws(":", F.col("_tb.t"), F.col("_tb.b")))
        .drop("_tb")
    )
    q = (
        with_norm(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
            "_qvec",
        )
        .withColumnRenamed("_norm", "_qnorm")
        .withColumn("_tb", F.explode(buckets(F.col("_qvec"))))
        .withColumn("_bucket", F.concat_ws(":", F.col("_tb.t"), F.col("_tb.b")))
        .drop("_tb")
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
