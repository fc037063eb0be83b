"""Deduplication operators over ``documents`` / ``embeddings``.

Large-scale training-data dedup surface (beyond the reference's scope):

- exact dedup (hash-groupBy),
- n-gram (shingle) Jaccard via inverted-index join,
- MinHash signatures + LSH banding (deterministic hash family → fully
  oracle-checkable, unlike typical randomized LSH),
- SimHash (bitwise majority of token hashes),
- embedding-cosine near-dup pairs (label-blocked).

Shingling, MinHash, and SimHash are computed fully JVM-side (md5 +
bigint/bit arithmetic in whole-stage codegen — measured 6-8× faster
than the Arrow-batched numpy kernels they replaced, bit-identical
output). The only remaining python kernel in this module is the
per-bucket cosine matmul for embedding near-dups, where numpy earns
its Arrow roundtrip. Joins, groupBys, and banding stay JVM-side where
whole-stage codegen applies.

Hashing contract shared with the DuckDB oracles:
``base_hash(s) = int(md5(s)[:8 hex], 16)`` (32 bits), and the minhash
family is the affine family ``h_i(x) = (A_i * base + B_i) mod P`` with
P = 2^61 - 1 and fixed pseudorandom (A_i, B_i) — one md5 per shingle
regardless of signature length, and bit-for-bit reproducible in SQL.

Scale notes: the corpus scan side (shingling, hashing) is
embarrassingly parallel map work running at scan-split parallelism;
every signature aggregate is map-side partially aggregated, so the
shuffles carry per-document rows, never per-shingle/per-token rows.
"""

from __future__ import annotations

import os
import warnings
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnar_database_project_spark.functions.broadcast_policy import (
    bounded_broadcast,
)
from columnar_database_project_spark.catalog import (
    cache_put,
    file_freshness,
    load_table,
)
from columnar_database_project_spark.functions import hashing as H
from columnar_database_project_spark.functions.vector import (
    normalize_rows,
    stack_embeddings,
)

SHINGLE_W = H.SHINGLE_W
N_MINHASH = H.N_MINHASH
N_BANDS = 4            # LSH bands (4 rows/band)
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = H.SIMHASH_BITS
COSINE_TAU = 0.3       # near-dup cosine threshold (label-blocked pairs)
MERSENNE_P = H.MERSENNE_P
MINHASH_AB = H.MINHASH_AB


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-5-gram shingles per document.

    JVM-side: explode the window index (lambda-free — see
    ``_minhash_wide`` for why), join tokens positionally, then a
    distinct for the per-document SET semantics Jaccard requires. The
    distinct is one shuffle the python set-kernel didn't need, but the
    downstream inverted-index join materializes this frame anyway
    (localCheckpoint) and end-to-end Jaccard measured ~25% faster with
    zero python stages (outputs identical)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_sh = F.greatest(F.size(F.col("toks")) - SHINGLE_W, F.lit(0)) + 1
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.col("toks"),
            F.explode(F.sequence(F.lit(1), n_sh)).alias("i"),
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("toks"), F.col("i"), SHINGLE_W), " ").alias(
                "shingle"
            ),
        )
        .distinct()
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


def ngram_jaccard_pairs(
    sh: DataFrame, tau: float = 0.2, max_doc_freq: int | None = None
) -> DataFrame:
    """Jaccard pairs from (doc_id, shingle) rows via inverted-index
    join — only docs sharing ≥1 shingle ever meet (never all-pairs).

    ``max_doc_freq`` is the stop-shingle frequency cut a 100 TB run
    needs: a shingle appearing in k docs contributes k² join rows, so
    one boilerplate shingle (a license header) explodes the join.
    Dropping shingles with document-frequency > ``max_doc_freq``
    bounds per-key join fan-out at max_doc_freq²; Jaccard is then
    computed over the surviving shingle sets on BOTH the intersection
    and the size side, so high-similarity pairs keep (approximately)
    their score while the join input shrinks.
    """
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sh = sh.localCheckpoint()
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
        .filter(F.col("jaccard") >= tau)
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-Jaccard near-dup pairs (exact, no frequency cut, so the
    SQL oracle reproduces every pair; at 100 TB pass ``max_doc_freq``
    to ``ngram_jaccard_pairs`` — see its docstring)."""
    return ngram_jaccard_pairs(_shingles(spark, sf_dir))


CONTAIN_TAU = 0.6  # containment threshold on the smaller document's side


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B| / min(|A|, |B|): flags a
    short document embedded inside a longer one (quote expansion,
    boilerplate wrapping, page-within-crawl), which symmetric Jaccard
    under-scores because the union is dominated by the longer doc —
    the standard complement to Jaccard in web-crawl dedup (Broder's
    resemblance vs containment).

    Same inverted-index shape as ``ngram_jaccard_pairs`` — documents
    only meet on a shared shingle, never all-pairs; the intersection
    count is one shuffle on the shingle key plus one on the pair key,
    and at 100 TB the same ``max_doc_freq`` stop-shingle cut applies
    upstream. Reference has no analog (delegates dedup entirely)."""
    sh = _shingles(spark, sf_dir).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
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
    contain = F.round(
        F.col("n_inter") / F.least("n_a", "n_b").cast("double"), 6
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_inter", contain.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_TAU)
    )


_MINHASH_WIDE_CACHE: dict[tuple[int, str, tuple], DataFrame] = {}


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with mh_0..mh_{N-1} signature columns.

    Computed entirely JVM-side: shingle windows via transform/slice,
    ``base_hash32`` as ``conv(substring(md5(shingle),1,8),16,10)``,
    and the affine family as plain bigint arithmetic (A, B < 2^28 and
    h < 2^32, so A*h+B < 2^61 never overflows — the same bound the
    numpy kernel relies on). The min-per-seed aggregate gets map-side
    partial aggregation, so the only shuffle carries one 17-column row
    per document. Measured ~6x faster than the earlier Arrow-batched
    python kernel (functions/hashing.minhash_signature, kept for the
    library surface + tests) and bit-identical to it and to the SQL
    oracle. Shingle duplicates are NOT dropped before hashing: min()
    is duplicate-insensitive, so the set-dedup would be pure cost.

    Two codegen-cache details worth keeping:
    - shingling avoids higher-order-function lambdas (explode the
      window index, then ``slice(toks, i, W)``): a ``transform``
      lambda mints fresh NamedLambdaVariable ids on every build, so
      the generated Java source differs per query and Janino
      recompiles (~2 s) on each fresh DataFrame — measured 5× slower
      than this formulation;
    - the built frame is memoized per (session, table) like
      ``load_table`` relations, since three operators (signatures,
      buckets, candidates) all derive from it."""
    doc_path = os.path.realpath(os.path.join(sf_dir, "documents.parquet"))
    cache_key = (id(spark), doc_path, file_freshness(doc_path))
    cached = _MINHASH_WIDE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_sh = F.greatest(F.size(F.col("toks")) - SHINGLE_W, F.lit(0)) + 1
    shingle = F.array_join(
        F.slice(F.col("toks"), F.col("i"), SHINGLE_W), " "
    ).alias("shingle")
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast(
        "long"
    ).alias("h")
    # SQL-text aggregates: one py4j roundtrip per seed instead of ~8
    # (see q_dedup_simhash for the measured build-latency rationale).
    per_seed_min = [
        F.expr(f"min((h * {a}L + {b}L) % {MERSENNE_P}L) AS mh_{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    wide = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.col("toks"),
            F.explode(F.sequence(F.lit(1), n_sh)).alias("i"),
        )
        .select("doc_id", shingle)
        .select("doc_id", base)
        .groupBy("doc_id")
        .agg(*per_seed_min)
    )
    cache_put(_MINHASH_WIDE_CACHE, cache_key, wide)
    return wide


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


# At 100 TB one hot bucket (a boilerplate band shared by millions of
# docs) explodes quadratically; over-full buckets therefore switch to
# KEEPER semantics — every member pairs with the bucket's min-id doc
# (a star, O(n) pairs) instead of the full clique (O(n²)). The star
# spans the same vertex set as the clique, so connected components —
# and therefore near-dup clusters and survivors — are IDENTICAL; only
# the pair enumeration is linearized (pinned by the capped-vs-uncapped
# fuzz in tests/test_round9.py). 2000 caps the worst bucket at ~2k
# emitted rows while leaving every honest near-dup bucket untouched.
LSH_MAX_BUCKET: int | None = 2000


def _clique_pairs(bk: DataFrame) -> DataFrame:
    """Full within-bucket pair enumeration: ONE shuffle (the groupBy)
    gathers each bucket, then sorted pairs are emitted JVM-side with
    higher-order array functions — no join-side row explosion.
    Replaces the round-1 self-join + distinct (15.6 s → sub-join
    cost). Caller is responsible for bounding bucket sizes — the
    ``collect_set`` buffer and the pair expansion are both quadratic
    hazards on a degenerate bucket."""
    return (
        bk.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)), y ->"
                    " struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
    )


def lsh_candidate_pairs(bk: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Candidate pairs from (doc_id, band, band_key) rows.

    Buckets with ≤ ``max_bucket`` members enumerate the full clique
    (bucket-grouped HOF expansion, see ``_clique_pairs``); larger ones
    emit keeper-star pairs — min-id member × each other member. The
    star spans the bucket's whole vertex set, so connected components
    (near-dup clusters, survivors) are IDENTICAL to the clique form;
    only pair enumeration is linearized.

    Scale shape: the over-full path never materializes a bucket array
    at all — big-bucket keys come from a count-only aggregate (map-side
    combined, no ``collect_set``), members reach the clique aggregation
    only via a LEFT ANTI join against those keys, so every collected
    array is ≤ ``max_bucket`` by construction. Hot-key (boilerplate)
    buckets are rare by nature, so the big-keys side is tiny and AQE
    broadcasts the anti/semi joins; keeper-star output is plain
    column selection (no arrays, no quadratic term anywhere).
    """
    if max_bucket is None:
        return _clique_pairs(bk).distinct()
    # The capped plan reads the band-key frame three times (size agg,
    # anti-join clique branch, semi-join star branch); materialize it
    # ONCE so the upstream signature scan — the expensive part — runs
    # once instead of three times (A/B at sf2.5: 12.0 s → ~uncapped
    # cost). Same localCheckpoint pattern as the simhash candidates;
    # the stored frame is linear in the corpus (rows × bands) and
    # replaces re-reading + re-hashing the corpus itself.
    bk = bk.localCheckpoint()
    on = ["band", "band_key"]
    big_keys = (
        bk.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select(*on)
    )
    pairs = _clique_pairs(bk.join(big_keys, on, "left_anti"))
    big_members = bk.join(big_keys, on, "left_semi")
    keepers = big_members.groupBy(*on).agg(F.min("doc_id").alias("keeper"))
    star = (
        big_members.join(keepers, on)
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(F.col("keeper").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return pairs.unionByName(star).distinct()


def q_dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: distinct (doc_a < doc_b) sharing any band
    bucket, with keeper-star linearization for buckets past
    ``LSH_MAX_BUCKET`` (the production default — no bucket at the test
    SFs comes near it, so output equals the exact clique form there).
    Pair generation is bucket-grouped (see ``lsh_candidate_pairs``) so
    the only shuffles are the bucket groupBy and the final distinct."""
    return lsh_candidate_pairs(_band_keys(spark, sf_dir), LSH_MAX_BUCKET)


# Exercises the keeper-star path at test scale: sf0.01 has buckets of
# size 3 (> cap 2), so the capped output genuinely diverges from the
# clique form and the oracle checks the star semantics themselves.
LSH_DEMO_CAP = 2


def q_dedup_lsh_candidates_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper-star LSH candidates with a cap small enough (2) that the
    star path fires on the test corpus — the hash-checkable twin of the
    production cap in ``q_dedup_lsh_candidates``."""
    return lsh_candidate_pairs(_band_keys(spark, sf_dir), LSH_DEMO_CAP)


SIMHASH_BANDS = 4                       # 32 bits → 4 × 8-bit bands
HAMMING_K = 3                           # pigeonhole: ≤3 flipped bits
                                        # can touch ≤3 of 4 bands, so a
                                        # matching band ALWAYS exists —
                                        # banding is exact, not approximate
_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def q_dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_a, sig_b) <= HAMMING_K.

    Scale path: band the 32-bit signature into 4 × 8-bit keys and
    self-join on band equality with the hamming filter applied INSIDE
    the join, carrying the full signature on both sides. By pigeonhole
    the band pass loses nothing, so the result equals the all-pairs
    hamming filter the SQL oracle runs — exactness AND subquadratic
    candidate generation.

    Unlike the minhash LSH path (md5 band keys → sparse buckets →
    in-array pair enumeration wins), 8-bit band keys give at most 256
    DENSE buckets per band, where the interpreted array pair generator
    was measured ~4× slower than this codegen'd self-join whose
    bit_count filter discards pairs before the distinct ever sees
    them."""
    # Materialize the signature once: both join branches would
    # otherwise recompute the full token-hash aggregate — column
    # re-aliasing gives each branch fresh exprIds, so Spark's
    # ReusedExchange never unifies them. Same localCheckpoint pattern
    # as the CC loops: one signature-sized frame in executor storage.
    sig = q_dedup_simhash(spark, sf_dir).localCheckpoint()
    # posexplode: the band index disambiguates equal keys from
    # different bands
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", i * _BAND_BITS)
                    .bitwiseAND(F.lit((1 << _BAND_BITS) - 1))
                    .cast("int")
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sig_a"),
        "band",
        "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sig_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("band_key_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("band_key") == F.col("band_key_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .withColumn("hamming", F.expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
        .filter(F.col("hamming") <= HAMMING_K)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


CLUSTER_MAX_ITERS = 20


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the Jaccard-pair
    graph, cluster_id = min doc_id in the component — the step a real
    pipeline needs between "candidate pairs" and "pick one canonical
    doc per duplicate group".

    Min-label propagation plus pointer-jumping with a driver
    convergence loop: each round takes the min over neighbours' labels
    AND shortcuts to the label's own label (label(x) ←
    min(label(x), label(label(x)))), so convergence is O(log diameter)
    rounds, not O(diameter) — a 1M-doc duplicate chain converges in
    ~20 rounds instead of 1M. Two shuffles per round;
    ``localCheckpoint`` truncates the growing lineage. (The alternating
    large-star/small-star formulation — Kiveris et al., "Connected
    Components in MapReduce" — drops in here if edge-list rewriting
    beats label joins on a given cluster.)"""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


def q_dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup output: keep one canonical doc per
    near-dup cluster (the min-id representative) plus every
    unclustered doc — the doc-id list a pipeline actually feeds
    downstream after dedup. Left-anti join against the non-canonical
    cluster members. The anti side is UNHINTED by policy: duplicates
    are routinely 30-50% of a web crawl, so the non-canonical list is
    corpus-proportional and a forced broadcast would OOM at 100 TB.
    AQE size-gates the strategy — broadcast-anti while small, a
    doc_id-keyed shuffle anti-join at scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_clusters(spark, sf_dir)
    non_canonical = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    return docs.join(non_canonical, "doc_id", "left_anti")


def connected_components(
    pairs: DataFrame, max_iters: int = CLUSTER_MAX_ITERS
) -> DataFrame:
    """(doc_id, cluster_id) for every node in ``pairs`` (doc_a, doc_b);
    cluster_id = min doc_id of the connected component. See
    ``q_dedup_clusters`` for the algorithm and scale notes."""
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy(edges["doc_a"].alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                "label"
            ),
        )
        # pointer jumping: follow the label one hop (label of my label)
        parent = propagated.select(
            F.col("doc_id").alias("label"), F.col("label").alias("parent_label")
        )
        new_labels = (
            propagated.join(parent, "label", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("parent_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # With pointer jumping, realistic graphs converge in O(log
        # diameter) rounds — exhausting the cap means the labels are
        # TRUNCATED (components may carry non-minimal ids). Callers
        # must be able to tell that from converged output.
        warnings.warn(
            f"connected_components stopped at max_iters={max_iters} "
            "without converging; cluster ids may be non-minimal",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star step: every node links its strictly-larger neighbors
    to the minimum of its neighborhood (including itself). One
    symmetric groupBy + broadcast-sized min join per round."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star step: orient edges large→small, then link each
    node's smaller neighbors (and itself) to the neighborhood min."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    joined = d.join(
        d.groupBy("u").agg(F.min("v").alias("m")), "u"
    )
    relinked = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_link = joined.select("u", F.col("m").alias("v")).distinct()
    return (
        relinked.union(self_link)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame, max_iters: int = CLUSTER_MAX_ITERS
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — same (doc_id, cluster_id) contract as
    ``connected_components``, different physical strategy: the edge
    LIST is rewritten toward star graphs instead of joining a label
    table, converging in O(log n) rounds with per-round cost
    proportional to the (shrinking) edge set. Preferable when edges ≪
    nodes×rounds or when the label table itself would be the skew
    point; the fixed point is detected by an edge-set checksum, and
    ``localCheckpoint`` truncates lineage each round."""
    # Materialize the input once: the contraction loop re-plans
    # against it every round, and complex upstream plans — e.g. the
    # capped LSH unionByName of the clique and keeper-star branches —
    # trip a Catalyst attribute-rewrite failure when re-planned inside
    # the loop (observed on Spark 4.1 under AQE: "key not found:
    # u#…"; r10 skew stress). A LogicalRDD seed sidesteps it and is
    # standard lineage hygiene for iterative graph algorithms anyway.
    pairs = pairs.localCheckpoint()
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    e = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    prev_e = None
    converged = False
    for _ in range(max_iters):
        new_e = _small_star(_large_star(e)).localCheckpoint()
        row = new_e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.hash("u", "v")), F.lit(0)).alias("chk"),
        ).collect()[0]
        sig = (row["n"], row["chk"])
        if sig == prev_sig and prev_e is not None:
            # The (count, hash-sum) signature is a cheap per-round
            # fixed-point probe; before trusting it, confirm EXACT
            # multiset equality (counts already match via n, so one
            # empty exceptAll suffices) — a checksum collision between
            # distinct edge sets must continue contracting, never
            # terminate early with wrong components. Costs one extra
            # comparison at the true fixed point only.
            if prev_e.exceptAll(new_e).count() == 0:
                e = new_e
                converged = True
                break
        prev_sig = sig
        prev_e = new_e
        e = new_e
    if not converged:
        warnings.warn(
            f"connected_components_star stopped at max_iters={max_iters} "
            "without reaching the edge-set fixed point; components may "
            "be under-contracted",
            RuntimeWarning,
            stacklevel=2,
        )
    roots = e.groupBy("u").agg(F.min("v").alias("cluster_id")).select(
        F.col("u").alias("doc_id"), "cluster_id"
    )
    return nodes.join(roots, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of near-dup candidates: Levenshtein
    + length-normalized similarity for every Jaccard candidate pair —
    the expensive exact check a pipeline runs ONLY on the subquadratic
    candidate set, never all-pairs. The pair list is UNHINTED by
    policy: the tau-thresholded candidate set is unbounded in
    adversarial corpora (boilerplate-heavy crawls), so a forced
    broadcast would OOM at 100 TB; AQE size-gates the strategy
    (broadcast while small, doc_a/doc_b-keyed shuffle joins at
    scale). Levenshtein runs JVM-side (codegen), no Python in the
    loop."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    joined = a.join(pairs, "doc_a").join(b, "doc_b")
    lev = F.levenshtein("ta", "tb")
    denom = F.greatest(F.length("ta"), F.length("tb"))
    return joined.select(
        "doc_a",
        "doc_b",
        lev.alias("edit_distance"),
        F.round(1 - lev / denom.cast("double"), 6).alias("edit_sim"),
    )


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering over the same Jaccard-pair graph as
    ``dedup_clusters`` but via star contraction — two independent
    physical strategies for the same logical operator, both
    oracle-checked against the recursive-SQL transitive closure."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components_star(pairs)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 32-bit signature = per-bit majority vote of token
    hashes weighted by token frequency. Near-dup = small Hamming
    distance (asserted in tests); here we emit the deterministic
    signature so the oracle verifies every bit.

    Computed JVM-side in one shuffle: explode token INSTANCES (the
    per-instance ±1 sum equals the frequency-weighted majority over
    distinct tokens, so no Counter stage is needed), hash each with
    the md5 base hash, and take 32 partial-aggregated sign-sums per
    doc — the shuffle carries one 33-column row per document, and the
    bit recombination is plain integer arithmetic in codegen.
    Replaced the Arrow-batched numpy kernel (functions/
    hashing.simhash32, kept for the library surface + tests): the
    python md5-per-token loop measured ~8× slower at equal output."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # All 33 aggregates and the 32-term bit recombination are built as
    # SQL-text expressions: constructing them through the Column API
    # costs ~500 py4j roundtrips (~0.4 s of pure driver latency per
    # query build); F.expr ships each as one string parsed JVM-side.
    # sum(±1) is rewritten as the duplicate-insensitive pair
    # (2*sum(bit) > count) so each aggregate is a bare bit sum.
    bit_sums = [
        F.expr(f"sum(shiftright(h, {j}) & 1) AS b_{j}")
        for j in range(SIMHASH_BITS)
    ]
    sig_terms = " + ".join(
        f"IF(2 * b_{j} > n, {1 << j}L, 0L)" for j in range(SIMHASH_BITS)
    )
    return (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) AS h"
            ),
        )
        .groupBy("doc_id")
        .agg(F.expr("count(1) AS n"), *bit_sums)
        .select("doc_id", F.expr(f"CAST({sig_terms} AS BIGINT) AS simhash"))
    )


# Tile edge for the in-group similarity matmul: peak extra memory is
# one EMB_TILE × EMB_TILE float64 block (~32 MB at 2048) regardless of
# group size, so one giant blocking group degrades to more tiles, not
# an n² allocation that OOMs the executor.
EMB_TILE = 2048


def _cosine_pairs_kernel(block_col: str, block_np_dtype: str):
    """Factory for the in-group pairwise-cosine kernel, parameterized
    by the blocking column carried through to the output (``label``
    for the label-blocked dedup, ``cluster_id`` for the k-means
    semantic dedup). Pairs with round(cos, 4) >= COSINE_TAU,
    vec_a < vec_b. Exact semantics; the n×n similarity matrix is
    computed in EMB_TILE-square tiles so peak memory stays bounded for
    oversized groups (the 100 TB skew guard)."""
    import numpy as np

    empty = pd.DataFrame(
        {"vec_a": [], "vec_b": [], block_col: [], "cosine": []}
    ).astype(
        {
            "vec_a": "int64",
            "vec_b": "int64",
            block_col: block_np_dtype,
            "cosine": "float64",
        }
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return empty
        m = normalize_rows(stack_embeddings(pdf["embedding"]))
        ids = pdf["vec_id"].values
        blocks = pdf[block_col].values
        va, vb, la, cos = [], [], [], []
        for i0 in range(0, n, EMB_TILE):
            i1 = min(i0 + EMB_TILE, n)
            for j0 in range(i0, n, EMB_TILE):
                j1 = min(j0 + EMB_TILE, n)
                sims = np.round(m[i0:i1] @ m[j0:j1].T, 4)
                ia, ib = np.nonzero(sims >= COSINE_TAU)
                if i0 == j0:
                    keep = ia < ib  # upper triangle inside the diagonal tile
                    ia, ib = ia[keep], ib[keep]
                if len(ia):
                    va.append(ids[i0:i1][ia])
                    vb.append(ids[j0:j1][ib])
                    la.append(blocks[i0:i1][ia])
                    cos.append(sims[ia, ib])
        if not va:
            return empty
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(va),
                "vec_b": np.concatenate(vb),
                block_col: np.concatenate(la),
                "cosine": np.concatenate(cos),
            }
        )

    return fn


_cosine_pairs_in_group = _cosine_pairs_kernel("label", "int32")


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (the blocking key
    stands in for an ANN bucket at scale): cosine >= COSINE_TAU.

    applyInPandas per blocking group: one shuffle on the blocking key,
    then an in-group numpy matmul — the scalable shape (at 100 TB the
    blocking key is an LSH bucket and groups stay small)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").applyInPandas(
        _cosine_pairs_in_group,
        schema="vec_a long, vec_b long, label int, cosine double",
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup candidates: block the corpus
    by nearest k-means centroid (the deterministic seed-step
    assignment from ``operators/similarity.q_emb_kmeans_step``, so the
    blocking is oracle-reproducible), then emit intra-cluster pairs
    with cosine >= COSINE_TAU. This is the published SemDeDup recipe
    (Abbas et al. 2023): cluster once, compare only within clusters —
    pairwise work drops from O(n²) to sum of per-cluster squares, and
    at 100 TB the per-group tiled matmul plus the EMB_TILE cap bound
    executor memory regardless of cluster skew. One scan assigns
    (kernel closure holds the K x D centroids — bounded), one shuffle
    on cluster_id groups for the pair kernel."""
    from columnar_database_project_spark.operators.similarity import (
        _seed_centroids,
        stack_embeddings as _stack,
    )
    import numpy as np

    C = _seed_centroids(sf_dir)

    def assign(batches):
        for pdf in batches:
            V = _stack(pdf["embedding"])
            d2 = np.empty((V.shape[0], C.shape[0]))
            for k in range(C.shape[0]):
                diff = V - C[k]
                d2[:, k] = np.einsum("ij,ij->i", diff, diff)
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["cluster_id"] = np.round(np.sqrt(d2), 6).argmin(axis=1).astype(
                np.int32
            )
            yield pdf

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<float>, cluster_id int"
    )
    return assigned.groupBy("cluster_id").applyInPandas(
        _cosine_pairs_kernel("cluster_id", "int32"),
        schema="vec_a long, vec_b long, cluster_id int, cosine double",
    )


INCR_SPLIT_FRAC = 0.8   # ids below this fraction of the id space = historical corpus


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: screen a NEW ingestion batch against the
    EXISTING corpus without re-clustering anything — the shape a
    continuously-fed 100 TB pipeline actually runs (full-corpus
    re-dedup per drop is not an option). The batch boundary here is
    derived from the id space (top 20% of doc_ids = the new drop) so
    the query is deterministic and SF-stable for the oracle; in
    production it is the ingestion partition.

    Per new document: exact verdict (content fingerprint seen before →
    dup_of = canonical old doc) and a near-dup signal (how many
    distinct old docs share at least one LSH band key). Scale shape:
    both joins are equi-joins of the SMALL new-batch side against the
    historical fingerprint / band-key store (pre-aggregated,
    persisted in production) — AQE size-gates a broadcast of the batch
    side; no pairwise work, no re-clustering of the historical corpus.
    Hot band keys fall under the same LSH_MAX_BUCKET production cap as
    the batch path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.agg(
        F.floor((F.max("doc_id") + 1) * INCR_SPLIT_FRAC).cast("bigint").alias("t")
    )
    d = docs.crossJoin(bounded_broadcast(split, 1, "1-row id-split threshold"))
    new_fp = d.filter(F.col("doc_id") >= F.col("t")).select(
        "doc_id", F.md5("text").alias("fp")
    )
    old_fp = (
        d.filter(F.col("doc_id") < F.col("t"))
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("dup_of"))
    )
    exact = new_fp.join(old_fp, "fp", "left").select("doc_id", "dup_of")
    bk = _band_keys(spark, sf_dir).crossJoin(
        bounded_broadcast(split, 1, "1-row id-split threshold")
    )
    bk_new = bk.filter(F.col("doc_id") >= F.col("t")).select(
        "doc_id", "band", "band_key"
    )
    bk_old = bk.filter(F.col("doc_id") < F.col("t")).select(
        F.col("doc_id").alias("old_id"), "band", "band_key"
    )
    hits = (
        bk_new.join(bk_old, ["band", "band_key"])
        .groupBy("doc_id")
        .agg(F.countDistinct("old_id").alias("n_band_hits"))
    )
    return exact.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_band_hits", F.lit(0)).alias("n_band_hits"),
        F.col("dup_of").isNotNull().alias("exact_dup"),
        "dup_of",
    )


def q_dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the corpus-health metric
    every dedup run reports (how much of the corpus is 1-of-N copies,
    and how heavy the tail of mega-duplicates is): exact-fingerprint
    cluster sizes histogrammed into (cluster_size → n_clusters,
    n_docs, share of corpus). Two shuffles, both shrinking: content-
    key groupBy (bounded by distinct content) then a size-keyed
    groupBy over the cluster frame (bounded by the largest cluster —
    dozens of rows); the corpus total rides along as sum(n_docs) over
    the tiny histogram, no second scan. The key is the opening-20-
    token prefix fingerprint (the ``text_contamination`` contract):
    copied-page prefixes collide where whole-text hashes don't, so
    the histogram reports the near-copy tail, not just byte-exact
    dupes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    fp = F.md5(F.concat_ws(" ", F.slice(toks, 1, 20)))
    clusters = (
        docs.groupBy(fp.alias("fp"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    hist = clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"),
    )
    total = F.sum("n_docs").over(W.partitionBy())
    return hist.select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("corpus_share"),
    )


def q_dedup_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash quality audit: for every true near-dup pair (exact
    shingle Jaccard ≥ τ), the signature-estimated Jaccard (fraction
    of the 16 seeds whose min-hashes agree) next to the true value
    and the absolute error — the "measure, don't guess" check that
    tells you whether N_MINHASH/band geometry is adequate BEFORE a
    100 TB dedup run trusts it. Per-pair rows (not just a mean) so
    the oracle hash pins every estimate.

    Scale shape: the pair set is the inverted-index output (bounded,
    never all-pairs); each side joins the signature frame on its
    doc_id key — two equi-joins, unhinted (pairs are corpus-
    proportional in a duplicate-heavy crawl; AQE size-gates, see
    DEPLOY.md broadcast policy)."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    wide = _minhash_wide(spark, sf_dir)
    a = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(N_MINHASH)],
    )
    b = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(N_MINHASH)],
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = matches / F.lit(float(N_MINHASH))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(est, 6).alias("est_jaccard"),
            F.round(F.abs(est - F.col("jaccard")), 6).alias("abs_err"),
        )
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_exact_survivors": q_dedup_exact_survivors,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_containment": q_dedup_containment,
    "dedup_minhash_signatures": q_dedup_minhash_signatures,
    "dedup_lsh_buckets": q_dedup_lsh_buckets,
    "dedup_lsh_candidates": q_dedup_lsh_candidates,
    "dedup_lsh_candidates_capped": q_dedup_lsh_candidates_capped,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_candidates": q_dedup_simhash_candidates,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_star": q_dedup_clusters_star,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_near_survivors": q_dedup_near_survivors,
    "dedup_incremental": q_dedup_incremental,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_semantic": q_dedup_semantic,
    "dedup_cluster_size_hist": q_dedup_cluster_size_hist,
    "dedup_minhash_est_error": q_dedup_minhash_est_error,
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
    "dedup_containment": f"""
        WITH {_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, n_inter,
               ROUND(n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6)
                   AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6) >= 0.6
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
    # NOTE: the dedup_lsh_candidates oracle above is the exact clique
    # form — valid because no test-SF bucket approaches LSH_MAX_BUCKET
    # (=2000), where the Spark side provably equals the clique (pinned
    # by the capped-subset fuzz). The capped entry below exercises the
    # keeper-star divergence with its own star-semantics oracle.
    "dedup_simhash": None,   # filled below from _SIMHASH_CTES
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

# dedup_semantic: same pair predicate, blocked by the k-means seed-step
# assignment (nearest of the first KMEANS_K vectors, L2 rounded to 6dp
# with lowest-centroid-id tiebreak — identical to the emb_kmeans_step
# oracle's assignment CTE).


def _dedup_semantic_oracle() -> str:
    from columnar_database_project_spark.operators.similarity import KMEANS_K

    return f"""
        WITH c AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < {KMEANS_K}
        ), a AS (
            SELECT e.vec_id, c.cid, e.embedding,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], c.cv), 6),
                                c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN c
        ), m AS (
            SELECT vec_id, CAST(cid AS INT) AS cluster_id, embedding
            FROM a WHERE rn = 1
        )
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cluster_id,
               ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4)
                   AS cosine
        FROM m x JOIN m y
          ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
        WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 4)
              >= {COSINE_TAU}
    """


ORACLES["dedup_semantic"] = _dedup_semantic_oracle()

# Keeper-star capped LSH: buckets with > cap members contribute
# (min-id keeper, member) star pairs instead of the full clique.
ORACLES["dedup_lsh_candidates_capped"] = f"""
    WITH {_MINHASH_WIDE_SQL},
    bandkeys AS ({_BANDKEY_SQL}),
    b AS (
        SELECT band, band_key, count(*) AS n, min(doc_id) AS keeper
        FROM bandkeys GROUP BY band, band_key HAVING count(*) >= 2
    ),
    small AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bandkeys x
        JOIN bandkeys y
          ON x.band = y.band AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
        JOIN b ON b.band = x.band AND b.band_key = x.band_key
        WHERE b.n <= {LSH_DEMO_CAP}
    ),
    big AS (
        SELECT b.keeper AS doc_a, k.doc_id AS doc_b
        FROM bandkeys k
        JOIN b ON b.band = k.band AND b.band_key = k.band_key
        WHERE b.n > {LSH_DEMO_CAP} AND k.doc_id <> b.keeper
    )
    SELECT DISTINCT doc_a, doc_b FROM (
        SELECT doc_a, doc_b FROM small
        UNION ALL
        SELECT doc_a, doc_b FROM big
    )
"""

_MH_MATCHES = " + ".join(
    f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END"
    for i in range(N_MINHASH)
)

ORACLES["dedup_minhash_est_error"] = f"""
        WITH {_MINHASH_WIDE_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles s1 JOIN shingles s2
              ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
            GROUP BY s1.doc_id, s2.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b,
                   ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
        )
        SELECT p.doc_a, p.doc_b, p.jaccard,
               ROUND(({_MH_MATCHES}) / {float(N_MINHASH)}, 6) AS est_jaccard,
               ROUND(abs(({_MH_MATCHES}) / {float(N_MINHASH)} - p.jaccard), 6)
                   AS abs_err
        FROM pairs p
        JOIN sig a ON a.doc_id = p.doc_a
        JOIN sig b ON b.doc_id = p.doc_b
    """

ORACLES["dedup_cluster_size_hist"] = """
        WITH clusters AS (
            SELECT md5(array_to_string(
                       regexp_split_to_array(trim(text), '\\s+')[1:20], ' '
                   )) AS fp,
                   CAST(count(*) AS BIGINT) AS cluster_size
            FROM documents GROUP BY 1
        ), hist AS (
            SELECT cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(count(*) * cluster_size AS BIGINT) AS n_docs
            FROM clusters GROUP BY cluster_size
        )
        SELECT cluster_size, n_clusters, n_docs,
               ROUND(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)
                   AS corpus_share
        FROM hist
    """


# Shared SimHash CTE chain (signature per doc) — used by the signature
# oracle and the banded-candidates oracle.
_SIMHASH_CTES = f"""tok_counts AS (
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
        ),
        sims AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM per_bit GROUP BY doc_id
        )"""

ORACLES["dedup_simhash"] = f"""
        WITH {_SIMHASH_CTES}
        SELECT doc_id, simhash FROM sims
    """

# The oracle runs the quadratic all-pairs hamming filter; the Spark
# query's banded candidate generation is *provably* equal to it
# (pigeonhole over SIMHASH_BANDS bands), so the hash compare is an
# exactness proof for the subquadratic plan.
ORACLES["dedup_simhash_candidates"] = f"""
        WITH {_SIMHASH_CTES}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_K}
    """

# Connected components via transitive closure (fine at oracle scale);
# the Spark side label-propagates to the same min-id-per-component.
_CC_CTES = f"""{_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        cc AS (
            SELECT u AS doc_id, CAST(min(v) AS BIGINT) AS cluster_id
            FROM (SELECT u, v FROM reach UNION SELECT u, u FROM edges)
            GROUP BY u
        )"""

ORACLES["dedup_clusters"] = f"""
        WITH RECURSIVE {_CC_CTES}
        SELECT doc_id, cluster_id FROM cc
    """

# Same logical result as dedup_clusters (the strategies must agree).
ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]

ORACLES["dedup_edit_distance"] = f"""
        WITH {_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
        )
        SELECT p.doc_a, p.doc_b,
               CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
               ROUND(1 - levenshtein(da.text, db.text)
                     / CAST(greatest(length(da.text), length(db.text))
                            AS DOUBLE), 6) AS edit_sim
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    """

# End-to-end near-dedup output: one canonical doc per cluster survives
# (the cluster representative), plus every unclustered doc.
ORACLES["dedup_near_survivors"] = f"""
        WITH RECURSIVE {_CC_CTES}
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (
            SELECT doc_id FROM cc WHERE doc_id != cluster_id
        )
    """

# Incremental dedup: new-batch screening against the historical corpus
# (split threshold derived from the id space, see q_dedup_incremental).
ORACLES["dedup_incremental"] = f"""
        WITH {_MINHASH_WIDE_SQL},
        bandkeys AS ({_BANDKEY_SQL}),
        t AS (
            SELECT CAST(floor((max(doc_id) + 1) * {INCR_SPLIT_FRAC}) AS BIGINT)
                AS t
            FROM documents
        ),
        newdocs AS (
            SELECT doc_id, md5(text) AS fp FROM documents, t
            WHERE doc_id >= t.t
        ),
        oldfp AS (
            SELECT md5(text) AS fp, min(doc_id) AS dup_of
            FROM documents, t WHERE doc_id < t.t GROUP BY md5(text)
        ),
        hits AS (
            SELECT n.doc_id, count(DISTINCT o.doc_id) AS n_band_hits
            FROM bandkeys n
            JOIN t ON n.doc_id >= t.t
            JOIN bandkeys o
              ON o.band = n.band AND o.band_key = n.band_key
            JOIN t t2 ON o.doc_id < t2.t
            GROUP BY n.doc_id
        )
        SELECT newdocs.doc_id,
               CAST(COALESCE(h.n_band_hits, 0) AS BIGINT) AS n_band_hits,
               (ofp.dup_of IS NOT NULL) AS exact_dup,
               ofp.dup_of
        FROM newdocs
        LEFT JOIN oldfp ofp USING (fp)
        LEFT JOIN hits h ON h.doc_id = newdocs.doc_id
    """
