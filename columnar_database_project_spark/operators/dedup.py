"""Deduplication operators over ``documents`` / ``embeddings``.

Large-scale training-data dedup surface (beyond the reference's scope):

- exact dedup (hash-groupBy),
- n-gram (shingle) Jaccard via inverted-index join,
- MinHash signatures + LSH banding (deterministic hash family → fully
  oracle-checkable, unlike typical randomized LSH),
- SimHash (bitwise majority of token hashes),
- embedding-cosine near-dup pairs (label-blocked).

Everything is built from JVM-side ``pyspark.sql.functions`` — no
Python UDFs — so the hot path is whole-stage codegen over the corpus
scan.

Hashing contract shared with the DuckDB oracles:
``base_hash(s) = int(md5(s)[:8 hex], 16)`` (32 bits), and the minhash
family is the affine family ``h_i(x) = (A_i * base + B_i) mod P`` with
P = 2^61 - 1 and fixed pseudorandom (A_i, B_i) — one md5 per shingle
regardless of signature length, and bit-for-bit reproducible in SQL.

Scale notes: the corpus scan side (shingling, hashing) is
embarrassingly parallel map work; local parquet files arrive as a
single input split, so compute-heavy pipelines repartition first
(at cluster scale the splits provide this parallelism natively and
the repartition collapses into the existing shuffle boundaries).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table

SHINGLE_W = 5          # words per shingle
N_MINHASH = 16         # minhash signature length
N_BANDS = 4            # LSH bands (4 rows/band)
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = 32
COSINE_TAU = 0.3       # near-dup cosine threshold (label-blocked pairs)
MERSENNE_P = (1 << 61) - 1

# Fixed affine minhash family (deterministic, shared with the oracle).
_rng = random.Random(1234)
MINHASH_AB: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 28), _rng.randrange(0, 1 << 28))
    for _ in range(N_MINHASH)
]


def base_hash32(col: Column) -> Column:
    """32-bit deterministic content hash shared with the oracle:
    first 8 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _parallel(df: DataFrame) -> DataFrame:
    """Spread a single-split local scan across all cores before
    compute-heavy per-row work (no-op semantics; pure parallelism)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-5-gram shingles per document."""
    docs = _parallel(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), "\\s+")
    n = F.size(toks)
    shingle_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(n - SHINGLE_W, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_W), " "),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, emit groups with >1
    member (keeper = min doc_id). One shuffle on the 128-bit key."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text"))
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_dupes"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_dupes") > 1)
    )


def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keep-first: the surviving doc_ids (min per group)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-Jaccard near-dup pairs via inverted-index join: only
    docs sharing ≥1 shingle ever meet (never all-pairs). At 100 TB
    you'd add a stop-shingle frequency cut; join skew is bounded by
    shingle document-frequency."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with mh_0..mh_{N-1} columns: a single groupBy
    with N min-aggregates (map-side partial min, one shuffle, no row
    blowup — the scalable signature layout)."""
    sh = _shingles(spark, sf_dir).select(
        "doc_id", base_hash32(F.col("shingle")).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures in long form (doc_id, seed, minhash) —
    deterministic affine family over the md5 base hash, so the oracle
    reproduces every value exactly."""
    wide = _minhash_wide(spark, sf_dir)
    stack_args = ", ".join(f"{i}, mh_{i}" for i in range(N_MINHASH))
    return wide.selectExpr(
        "doc_id", f"stack({N_MINHASH}, {stack_args}) AS (seed, minhash)"
    )


def _band_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_key): md5 of the comma-joined minhash values
    in each band — the LSH bucket key. Built from the wide signature
    frame with no extra shuffle."""
    wide = _minhash_wide(spark, sf_dir)
    bands = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{band * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                )
            ).alias("band_key"),
        )
        for band in range(N_BANDS)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def q_dedup_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: per-(doc, band) bucket keys. Docs sharing a bucket
    key in any band are near-dup candidates."""
    return _band_keys(spark, sf_dir)


def q_dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: distinct (doc_a < doc_b) sharing any band
    bucket. The equi-join on (band, band_key) is what makes
    MinHash-LSH subquadratic at scale."""
    bk = _band_keys(spark, sf_dir)
    a = bk.alias("a")
    b = bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 32-bit signature = per-bit majority vote of token
    hashes weighted by token frequency. Near-dup = small Hamming
    distance (asserted in tests); here we emit the deterministic
    signature so the oracle verifies every bit."""
    docs = _parallel(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), "\\s+")
    tok_counts = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hashed = tok_counts.withColumn("h", base_hash32(F.col("tok")))
    bits = hashed.select(
        "doc_id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
    )
    signed = bits.select(
        "doc_id",
        "b",
        (
            F.col("cnt")
            * (F.expr("shiftright(h, b)").bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias("contrib"),
    )
    per_bit = signed.groupBy("doc_id", "b").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.pow(F.lit(2.0), F.col("b")).cast("long")
            ).otherwise(F.lit(0))
        ).alias("simhash")
    )


def _normalized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, nv): unit-normalized embedding — computed ONCE
    per vector before any join, so each candidate pair costs a single
    dot product."""
    emb = _parallel(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    return emb.select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / norm).alias("nv"),
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (the blocking key
    stands in for an ANN bucket at scale): cosine ≥ COSINE_TAU.
    Vectors are pre-normalized so the pair cost is one dot product."""
    ne = _normalized_embeddings(spark, sf_dir)
    a = ne.alias("a")
    b = ne.alias("b")
    cos = F.aggregate(
        F.zip_with(F.col("a.nv"), F.col("b.nv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_TAU)
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_exact_survivors": q_dedup_exact_survivors,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_signatures": q_dedup_minhash_signatures,
    "dedup_lsh_buckets": q_dedup_lsh_buckets,
    "dedup_lsh_candidates": q_dedup_lsh_candidates,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
}

# ---------------------------------------------------------------- oracles

_SHINGLES_SQL = f"""
    shingles AS (
        SELECT doc_id, unnest(list_distinct(sh)) AS shingle
        FROM (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, greatest(len(toks) - {SHINGLE_W - 1}, 1)),
                       i -> array_to_string(toks[i : i + {SHINGLE_W - 1}], ' ')
                   ) AS sh
            FROM (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents
            )
        )
    )
"""

_MH_TERMS = ",\n               ".join(
    f"min(({a} * h + {b}) % {MERSENNE_P}) AS mh_{i}"
    for i, (a, b) in enumerate(MINHASH_AB)
)

_MINHASH_WIDE_SQL = f"""
    {_SHINGLES_SQL},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h
        FROM shingles
    ),
    sig AS (
        SELECT doc_id,
               {_MH_TERMS}
        FROM hashed GROUP BY doc_id
    )
"""

_SIG_LONG_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {i} AS seed, mh_{i} AS minhash FROM sig"
    for i in range(N_MINHASH)
)

_BAND_ROWS = []
for band in range(N_BANDS):
    cols = [f"mh_{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
    concat = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    _BAND_ROWS.append(
        f"SELECT doc_id, {band} AS band, md5({concat}) AS band_key FROM sig"
    )
_BANDKEY_SQL = " UNION ALL ".join(_BAND_ROWS)

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS fingerprint, count(*) AS n_dupes, min(doc_id) AS keeper
        FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """,
    "dedup_exact_survivors": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
    """,
    "dedup_minhash_signatures": f"""
        WITH {_MINHASH_WIDE_SQL}
        SELECT doc_id, CAST(seed AS INT) AS seed, minhash
        FROM ({_SIG_LONG_SQL})
    """,
    "dedup_lsh_buckets": f"""
        WITH {_MINHASH_WIDE_SQL}
        SELECT doc_id, CAST(band AS INT) AS band, band_key
        FROM ({_BANDKEY_SQL})
    """,
    "dedup_lsh_candidates": f"""
        WITH {_MINHASH_WIDE_SQL},
        bandkeys AS ({_BANDKEY_SQL})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bandkeys a JOIN bandkeys b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    """,
    "dedup_simhash": f"""
        WITH tok_counts AS (
            SELECT doc_id, tok, count(*) AS cnt FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents
            ) GROUP BY doc_id, tok
        ),
        hashed AS (
            SELECT doc_id, cnt,
                   ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
            FROM tok_counts
        ),
        per_bit AS (
            SELECT doc_id, b,
                   sum(cnt * (((h >> b) & 1) * 2 - 1)) AS s
            FROM hashed, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b)
            GROUP BY doc_id, b
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM per_bit GROUP BY doc_id
    """,
    "dedup_embedding_cosine": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                   AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
              >= {COSINE_TAU}
    """,
}
