"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine top-k: the exactness baseline. Cross-join of a
  tiny broadcast query set against the corpus — at 100 TB the corpus
  side streams through executors once, queries are broadcast, and the
  top-k is a per-query TakeOrdered (no global sort).
- Random-hyperplane LSH signatures: the scale path. Hyperplanes are
  generated from a fixed seed and inlined as literals, so the DuckDB
  oracle reproduces the exact bucket assignment — candidate
  generation becomes an equi-join on the signature, subquadratic.

All vector math is JVM-side (``zip_with`` + ``aggregate`` fold) — no
Python UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table

TOP_K = 10
N_QUERIES = 5          # vec_id < N_QUERIES form the query set
EMB_DIM = 64
N_PLANES = 16          # hyperplane signature bits

# Deterministic hyperplanes (public numpy RNG, fixed seed) — inlined as
# literals in both the Spark plan and the SQL oracle.
_rng = np.random.RandomState(7)
HYPERPLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.randn(EMB_DIM)] for _ in range(N_PLANES)
]


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < N_QUERIES),
    excluding self. Query side is broadcast; corpus scanned once."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).crossJoin(F.broadcast(queries)).filter(F.col("vec_id") != F.col("q_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id", "vec_id", cos.alias("cosine_raw")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine_raw", 4).alias("cosine"),
            "rank",
        )
    )


def q_sim_hyperplane_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: sig bit p = [dot(v, plane_p) > 0];
    signature = Σ 2^p. Vectors in the same bucket are ANN candidates."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sig = None
    for p, plane in enumerate(HYPERPLANES):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col("v"), plane_col) > 0, F.lit(2 ** p)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig + bit
    return emb.select("vec_id", sig.cast("long").alias("signature"))


def q_sim_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN bucket histogram: how many vectors share each signature —
    the candidate-set-size diagnostic for the LSH index."""
    sig = q_sim_hyperplane_signatures(spark, sf_dir)
    return (
        sig.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .filter(F.col("n_vectors") > 1)
    )


QUERIES = {
    "sim_topk_bruteforce": q_sim_topk_bruteforce,
    "sim_hyperplane_signatures": q_sim_hyperplane_signatures,
    "sim_bucket_sizes": q_sim_bucket_sizes,
}


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"


_SIG_TERMS = " + ".join(
    f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_sql(pl)}) > 0 "
    f"THEN {2 ** p} ELSE 0 END)"
    for p, pl in enumerate(HYPERPLANES)
)

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[])
                       AS cosine_raw
            FROM q JOIN embeddings e ON e.vec_id != q.q_id
        )
        SELECT q_id, vec_id AS neighbor_id,
               ROUND(cosine_raw, 4) AS cosine, rank
        FROM (
            SELECT q_id, vec_id, cosine_raw,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cosine_raw DESC, vec_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    "sim_hyperplane_signatures": f"""
        SELECT vec_id, CAST({_SIG_TERMS} AS BIGINT) AS signature
        FROM embeddings
    """,
    "sim_bucket_sizes": f"""
        SELECT signature, count(*) AS n_vectors FROM (
            SELECT vec_id, CAST({_SIG_TERMS} AS BIGINT) AS signature
            FROM embeddings
        ) GROUP BY signature HAVING count(*) > 1
    """,
}
