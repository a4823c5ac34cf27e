"""Edge-table sources: the engine's graph data model.

The reference consumes in-memory NetworkX graphs (OllivierRicci.py:627);
our data model is an ``edges(src LONG, dst LONG, weight DOUBLE)`` DataFrame
plus optional ``vertices(id LONG, ...)``. Undirected graphs are stored
canonically (src < dst, one row per edge); directed graphs one row per arc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def make_edges(spark: SparkSession, pairs, weights=None) -> DataFrame:
    """Build an edge DataFrame from python pairs (test fixture helper)."""
    if weights is None:
        rows = [(int(s), int(d), 1.0) for s, d in pairs]
    else:
        rows = [(int(s), int(d), float(w)) for (s, d), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def prepare_edges(edges: DataFrame, weight_default: float = 1.0) -> DataFrame:
    """Impute missing weights and drop self-loops.

    Mirrors reference default-weight imputation (OllivierRicci.py:410-413,
    696-699) and self-loop removal (OllivierRicci.py:701-704).
    """
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(float(weight_default)))
    edges = edges.withColumn(
        "weight", F.coalesce(F.col("weight").cast("double"), F.lit(float(weight_default)))
    )
    return edges.filter(F.col("src") != F.col("dst"))


def canonicalize(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (least, greatest) endpoints, deduped."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both-direction view of an undirected (canonical) edge table."""
    return edges.select("src", "dst", "weight").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def edges_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic link graph over the ``documents`` table (FIXTURES.md F2).

    Outlinks of doc i: ``dst_j = (i*31 + j*17 + 7) % N`` for ``j in
    range(i % 5)``; self-loops dropped, (src, dst) deduped, weight 1.0.
    The same arithmetic is reproducible in ANSI SQL for DuckDB oracles
    (see __spark_entry__.oracle_sql). N is joined in as a broadcast scalar
    so the plan stays fully declarative (no driver-side collect).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.agg(F.count("*").alias("n"))
    out = (
        docs.filter(F.col("doc_id") % 5 > 0)
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.col("doc_id") % 5 - 1)))
        .join(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 31 + F.col("j") * 17 + 7) % F.col("n")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    return out


def dense_edges_from_documents(
    spark: SparkSession, sf_dir: str, out_degree: int = 16, multiply: int = 1
) -> DataFrame:
    """Denser deterministic variant of the F2 link graph (bench workload).

    Every doc gets exactly ``out_degree`` outlinks
    ``dst_j = (i*31 + j*127 + 7) % N`` — avg degree ~2*out_degree, which
    makes the per-edge ego-net OT work dominate fixed Spark overhead so
    parallel-scaling measurements reflect compute, not job setup.
    ``multiply`` scales the vertex count (virtual ids beyond the document
    table, same formula) — more total compute at identical per-edge shape,
    for amortizing fixed overhead in scaling measurements.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if multiply > 1:
        n_virtual = docs.count() * multiply
        docs = spark.range(n_virtual).select(F.col("id").alias("doc_id"))
        n = docs.agg(F.count("*").alias("n"))
    else:
        n = docs.agg(F.count("*").alias("n"))
    return (
        docs.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(out_degree - 1))))
        .join(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 31 + F.col("j") * 127 + 7) % F.col("n")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def clustered_edges_from_documents(
    spark: SparkSession, sf_dir: str, comm_size: int = 50, intra_deg: int = 4
) -> DataFrame:
    """Deterministic planted-partition graph over the ``documents`` table.

    Communities of ``comm_size`` consecutive doc_ids; each doc links to
    ``intra_deg`` pseudo-random members of its own community, and the first
    member of each community links to the next community (a chain, so the
    graph is connected). This gives the Ricci-flow community pipeline real
    cluster structure to find — the plain F2 link graph is structureless
    pseudo-random and has no modularity drop.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.agg(F.count("*").alias("n"))
    intra = (
        docs.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(intra_deg - 1))))
        .select(
            F.col("doc_id").alias("src"),
            (
                (F.col("doc_id") - F.col("doc_id") % comm_size)
                + (F.col("doc_id") * 7 + F.col("j") * 13 + 1) % comm_size
            ).alias("dst"),
        )
    )
    inter = (
        docs.filter(F.col("doc_id") % comm_size == 0)
        .join(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + comm_size) % F.col("n")).alias("dst"),
        )
    )
    return (
        intra.union(inter)
        .join(F.broadcast(n))
        .filter((F.col("dst") < F.col("n")) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def clique_chain_edges(
    spark: SparkSession, n_cliques: int = 6, clique_size: int = 10
) -> DataFrame:
    """Deterministic equal-clique ring: ``n_cliques`` cliques of
    ``clique_size`` nodes, chained into a ring by one bridge edge per
    clique (node 0 of clique c -> node 0 of clique c+1).

    This is the *converging* Ricci-flow fixture (VERDICT r3 #7): under
    flow the edges around the community boundary stretch (measured: the
    bridge-endpoint vertices' intra-clique edges stretch hardest), the
    reference surgery hook (my_surgery.py:54-92) removes them, and the
    surviving equal cliques have identical curvature on every edge — so
    ``max(kappa)-min(kappa)`` hits exactly 0 and the loop stops on its own
    convergence test rather than the iteration cap. Fully declarative
    generation (range + explode), no driver-side loops.
    """
    k, m = n_cliques, clique_size
    nodes = spark.range(k * m).select(
        (F.col("id") / m).cast("long").alias("c"),
        (F.col("id") % m).alias("i"),
        F.col("id").alias("src"),
    )
    intra = (
        nodes.filter(F.col("i") < m - 1)
        .withColumn("j", F.explode(F.sequence(F.col("i") + 1, F.lit(m - 1))))
        .select("src", (F.col("c") * m + F.col("j")).alias("dst"))
    )
    bridges = nodes.filter(F.col("i") == 0).select(
        "src", (((F.col("c") + 1) % k) * m).alias("dst")
    )
    return canonicalize(
        intra.union(bridges)
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )


def edges_sql_cte(table: str = "documents") -> str:
    """DuckDB CTE producing the identical edge table (for oracle_sql)."""
    return f"""
links AS (
    SELECT d.doc_id AS src,
           (d.doc_id * 31 + j.j * 17 + 7) % (SELECT count(*) FROM {table}) AS dst
    FROM {table} d, LATERAL (SELECT unnest(generate_series(0, d.doc_id % 5 - 1)) AS j) j
    WHERE d.doc_id % 5 > 0
),
edges AS (
    SELECT DISTINCT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM links WHERE dst <> src
)"""
