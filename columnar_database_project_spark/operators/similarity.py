"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine top-k: the exactness baseline. The (tiny) query
  set is collected once and shipped to executors inside an
  Arrow-batched mapInPandas kernel; the corpus streams through a numpy
  matmul per batch — one corpus scan, no join, no shuffle before the
  per-query top-k. At 100 TB this is the canonical "broadcast the
  queries, scan the corpus once" plan.
- Random-hyperplane LSH signatures: the scale path. Hyperplanes are
  generated from a fixed seed and inlined as literals in the DuckDB
  oracle, so bucket assignment is exactly reproducible — candidate
  generation becomes an equi-join on the signature, subquadratic.

Spark's interpreted higher-order functions were measured 30-200×
slower than numpy/DuckDB kernels on this shape, so all vector math
here is Arrow-batched numpy (see functions/vector.py).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.functions.broadcast_policy import (
    bounded_broadcast,
)
from columnar_database_project_spark.functions.vector import (
    cosine_matrix,
    normalize_rows,
    stack_embeddings,
)

TOP_K = 10
N_QUERIES = 5          # vec_id < N_QUERIES form the query set
EMB_DIM = 64
N_PLANES = 16          # hyperplane signature bits

# Deterministic hyperplanes (public numpy RNG, fixed seed) — inlined as
# literals in the SQL oracle.
_rng = np.random.RandomState(7)
HYPERPLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.randn(EMB_DIM)] for _ in range(N_PLANES)
]
_PLANES = np.array(HYPERPLANES, dtype=np.float64)   # (P, D)


# The embedding kernels are Arrow-batched matmuls — memory-bandwidth
# bound, NOT compute-heavy like the md5 shingling kernels in dedup, so
# a pre-kernel repartition buys less than its full-corpus shuffle
# costs. Scan splits set kernel parallelism: one split for a tiny
# local file, one task per ~128 MB split at cluster scale.


_QUERY_VECTOR_CACHE: dict = {}


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The N_QUERIES query vectors as (ids, raw matrix), read driver-
    side with pyarrow. The query set is a PARAMETER of the search (a
    client would hand it in), so fetching it is a pushdown-filtered
    row-group read — not a Spark job scheduled ahead of every search.
    Freshness-keyed cache (same pattern as the centroids): the read
    is a fixed per-call cost on the single-query serving path, and a
    serving process answers many searches against one table version."""
    import pyarrow.dataset as ds

    from columnar_database_project_spark.catalog import file_freshness

    path = os.path.join(sf_dir, "embeddings.parquet")
    key = (os.path.realpath(path), file_freshness(os.path.realpath(path)))
    hit = _QUERY_VECTOR_CACHE.get(key)
    if hit is not None:
        return hit
    t = (
        ds.dataset(path)
        .to_table(
            columns=["vec_id", "embedding"],
            filter=ds.field("vec_id") < N_QUERIES,
        )
        .sort_by("vec_id")
    )
    q_ids = np.asarray(t["vec_id"], dtype=np.int64)
    q_mat = np.array(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    if len(_QUERY_VECTOR_CACHE) > 16:   # bound: stale tokens never pile up
        _QUERY_VECTOR_CACHE.clear()
    _QUERY_VECTOR_CACHE[key] = (q_ids, q_mat)
    return q_ids, q_mat


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < N_QUERIES),
    excluding self; deterministic tiebreak on neighbor id."""
    emb = load_table(spark, sf_dir, "embeddings")
    q_ids, q_raw = _query_vectors(sf_dir)
    q_mat = normalize_rows(q_raw)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-PARTITION top-k: score every batch, keep only the k best
        # neighbors per query across the whole partition, emit once.
        # The downstream global sort then sees Q×k×n_partitions rows
        # instead of Q×N — the full sort-shuffle of scored rows is gone.
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(q): (np.empty(0, dtype=np.int64), np.empty(0)) for q in q_ids
        }
        for pdf in batches:
            v = normalize_rows(stack_embeddings(pdf["embedding"]))
            sims = q_mat @ v.T                      # (Q, batch)
            vid = pdf["vec_id"].values.astype(np.int64)
            for qi, q in enumerate(q_ids):
                mask = vid != q                     # exclude self
                ids = np.concatenate([best[int(q)][0], vid[mask]])
                cs = np.concatenate([best[int(q)][1], sims[qi][mask]])
                if len(ids) > TOP_K:
                    # top-k by (cosine desc, vec_id asc) — lexsort keys
                    order = np.lexsort((ids, -cs))[:TOP_K]
                    ids, cs = ids[order], cs[order]
                best[int(q)] = (ids, cs)
        rows = {"q_id": [], "vec_id": [], "cosine_raw": []}
        for q, (ids, cs) in best.items():
            rows["q_id"].extend([q] * len(ids))
            rows["vec_id"].extend(ids.tolist())
            rows["cosine_raw"].extend(cs.tolist())
        yield pd.DataFrame(rows)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score_batches, schema="q_id long, vec_id long, cosine_raw double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine_raw", 4).alias("cosine"),
            "rank",
        )
    )


def q_sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification over the embedding space —
    the label-propagation / weak-labeling step of a training-data
    pipeline (tag unlabeled items with their neighbors' consensus).
    Composes [[sim_topk_bruteforce]]'s exact per-query top-k with a
    label equi-join and a votes-desc/label-asc deterministic argmax;
    also reports the query's own label and a correctness flag, so the
    query doubles as a leave-one-out label-quality audit.

    Scale shape: everything downstream of the top-k runs on
    Q×TOP_K rows — the expensive part is the search itself, which
    keeps its per-partition-top-k mapInPandas shape; swap in the IVF
    or LSH-bucketed search for the 100 TB corpus without touching the
    vote logic."""
    topk = q_sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    emb = load_table(spark, sf_dir, "embeddings")
    votes = (
        topk.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    actual = emb.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("actual_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(actual, "q_id")
        .select(
            "q_id",
            F.col("label").alias("predicted_label"),
            "votes",
            F.round(F.col("votes") / F.lit(float(TOP_K)), 6).alias("vote_share"),
            "actual_label",
            (F.col("label") == F.col("actual_label")).cast("int").alias("correct"),
        )
    )


def q_sim_hyperplane_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: sig bit p = [dot(v, plane_p) > 0];
    signature = Σ 2^p. Vectors in the same bucket are ANN candidates.
    Per-row map work (numpy matmul per Arrow batch) — zero shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    powers = (1 << np.arange(N_PLANES)).astype(np.int64)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])     # float64 cast
            bits = (v @ _PLANES.T) > 0                 # (batch, P)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "signature": (bits.astype(np.int64) * powers).sum(axis=1),
                }
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(sig_batches, schema="vec_id long, signature long")
    )


def q_sim_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN bucket histogram: how many vectors share each signature —
    the candidate-set-size diagnostic for the LSH index."""
    sig = q_sim_hyperplane_signatures(spark, sf_dir)
    return (
        sig.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .filter(F.col("n_vectors") > 1)
    )


# Hot-bucket guard for the exact re-rank: a degenerate signature
# shared by B vectors costs B² cosines; production caps it. None =
# exact (oracle-checkable) semantics, mirroring dedup.LSH_MAX_BUCKET.
RERANK_MAX_BUCKET: int | None = None


def q_sim_bucket_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine re-rank inside LSH buckets — the second half of
    the ANN pipeline: the signature equi-group restricts candidates to
    co-bucketed vectors (subquadratic), then exact cosine is computed
    only within each bucket. One kernel pass computes signatures while
    carrying the embedding (zero extra join), one shuffle groups the
    buckets, and pair cosines are a per-bucket numpy matmul whose cost
    is bounded by the bucket-size guard."""
    emb = load_table(spark, sf_dir, "embeddings")

    def sig_with_vec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            bits = (v @ _PLANES.T) > 0
            powers = (1 << np.arange(N_PLANES)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "signature": (bits.astype(np.int64) * powers).sum(axis=1),
                    "embedding": list(v),
                }
            )

    sigs = emb.select("vec_id", "embedding").mapInPandas(
        sig_with_vec, schema="vec_id long, signature long, embedding array<double>"
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"vec_id_a": [], "vec_id_b": [], "signature": [], "cosine": []}
        n = len(pdf)
        if n >= 2 and (RERANK_MAX_BUCKET is None or n <= RERANK_MAX_BUCKET):
            pdf = pdf.sort_values("vec_id")
            ids = pdf["vec_id"].to_numpy()
            sims = cosine_matrix(
                stack_embeddings(pdf["embedding"]),
                stack_embeddings(pdf["embedding"]),
            )
            ia, ib = np.triu_indices(n, k=1)
            out["vec_id_a"] = ids[ia]
            out["vec_id_b"] = ids[ib]
            out["signature"] = np.full(len(ia), pdf["signature"].iloc[0])
            out["cosine"] = np.round(sims[ia, ib], 4)
        return pd.DataFrame(out)

    # Prune single-member buckets BEFORE the python stage: with P
    # hyperplane bits most signatures are unique, and applyInPandas
    # invokes the kernel once per GROUP — thousands of single-row
    # pandas frames cost ~2 s of pure per-group overhead for zero
    # output (pairs need ≥2 members). The signature frame is
    # checkpointed once (it is small: id + sig + vector), bucket sizes
    # come from it JVM-side, and the broadcast semi join keeps only
    # rerankable buckets.
    sigs = sigs.localCheckpoint()
    multi = (
        sigs.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("signature")
    )
    return (
        sigs.join(
            bounded_broadcast(
                multi, 2**N_PLANES, "signature space is 2^N_PLANES"
            ),
            "signature",
            "left_semi",
        )
        .groupBy("signature")
        .applyInPandas(
            bucket_pairs,
            schema="vec_id_a long, vec_id_b long, signature long, cosine double",
        )
    )


N_IVF_CELLS = 16
# Default operating point: smallest probe level with measured
# recall@10 ≥ 0.75 on the sf0.5 recall curve (r8 BENCH: 0.44 @ 3,
# 0.92 @ 12, 1.0 @ 16 — near-linear in probed fraction because the
# synthetic embeddings are close to isotropic; see PLANS.md round-6).
# A corpus with real cluster structure reaches the target at a much
# smaller probed fraction; re-derive with ivf_nprobe_for_recall.
N_PROBE = 12
IVF_KMEANS_ITERS = 10
IVF_SAMPLE_TARGET = 2000
IVF_SIM_DECIMALS = 6     # rounded before argmax → cross-engine stable


def _ivf_centroids(emb_rows: np.ndarray) -> np.ndarray:
    """Deterministic k-means (fixed seed, fixed iterations) over a
    driver-side sample — at 100 TB you'd sample ~100k vectors, which
    still fits the driver; assignment stays distributed."""
    rng = np.random.RandomState(13)
    cent = emb_rows[rng.choice(len(emb_rows), N_IVF_CELLS, replace=False)].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(cosine_matrix(emb_rows, cent), axis=1)
        for c in range(N_IVF_CELLS):
            members = emb_rows[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return normalize_rows(cent)


# Diagnostics for the last _ivf_sample call: how many embedding rows
# the driver actually materialized vs the table size — the scale
# contract (asserted by tests/test_similarity.py) is that this stays
# O(IVF_SAMPLE_TARGET), never O(n_table).
_LAST_SAMPLE_STATS: dict[str, int] = {}


def _ivf_sample(sf_dir: str) -> np.ndarray:
    """Centroid-training sample, deterministic for a given table.

    Tables at or under IVF_SAMPLE_TARGET rows are read whole (sorted
    by vec_id — identical to the pre-r5 behavior, so centroids at the
    oracle-checked test scales are bit-identical). Larger tables are
    STREAMED in record batches with a positional stride applied per
    batch: the driver holds one scan batch plus the ~IVF_SAMPLE_TARGET
    selected rows at any moment — never the whole table, which at
    100 TB would OOM the driver before sampling (the pre-r5 code's
    failure mode). IO is still one sequential pass; at true cluster
    scale that pass runs as a Spark job collecting only the strided
    rows — the driver-memory contract (O(sample), not O(table)) is the
    same and is what tests/test_similarity.py asserts.
    """
    import pyarrow as pa
    import pyarrow.dataset as _ds

    path = os.path.join(sf_dir, "embeddings.parquet")
    dset = _ds.dataset(path)
    n = dset.count_rows()  # parquet metadata only — no data read
    cols = ["vec_id", "embedding"]

    def finish(vid: np.ndarray, emb: np.ndarray) -> np.ndarray:
        order = np.argsort(vid, kind="stable")
        _LAST_SAMPLE_STATS.update(n_table=n, rows_materialized=len(emb))
        return emb[order][: 2 * IVF_SAMPLE_TARGET]

    if n <= max(IVF_SAMPLE_TARGET, N_IVF_CELLS):
        t = dset.to_table(columns=cols)
        return finish(
            np.asarray(t["vec_id"].to_numpy(zero_copy_only=False)),
            np.array(t["embedding"].to_pylist(), dtype=np.float64),
        )
    step = max(1, n // IVF_SAMPLE_TARGET)
    sel_vid: list[np.ndarray] = []
    sel_emb: list[list] = []
    idx = 0  # global row index across batches (file order: deterministic)
    for batch in dset.scanner(columns=cols, batch_size=8192).to_batches():
        m = batch.num_rows
        pos = np.arange((-idx) % step, m, step)
        if len(pos):
            picked = batch.take(pa.array(pos, type=pa.int64()))
            sel_vid.append(
                np.asarray(picked["vec_id"].to_numpy(zero_copy_only=False))
            )
            sel_emb.extend(picked["embedding"].to_pylist())
        idx += m
    return finish(
        np.concatenate(sel_vid), np.array(sel_emb, dtype=np.float64)
    )


_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def ivf_centroids(sf_dir: str) -> np.ndarray:
    """Normalized (N_IVF_CELLS, D) centroids for one table directory —
    deterministic given the data, shared by the queries AND the SQL
    oracle builder so both sides see bit-identical centroids. Keyed by
    a file freshness token so a table regenerated at the same path is
    re-sampled, not served stale centroids."""
    from columnar_database_project_spark.catalog import file_freshness

    path = os.path.realpath(os.path.join(sf_dir, "embeddings.parquet"))
    key = (path, file_freshness(path))
    if key not in _CENTROID_CACHE:
        if len(_CENTROID_CACHE) > 16:  # bound: stale tokens never pile up
            _CENTROID_CACHE.clear()
        _CENTROID_CACHE[key] = _ivf_centroids(_ivf_sample(sf_dir))
    return _CENTROID_CACHE[key]


def q_sim_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic part of the IVF pipeline, oracle-checked: every
    vector's cell assignment (argmax cosine to the k-means centroids,
    similarity rounded to IVF_SIM_DECIMALS first, ties → lowest cell).
    Zero-shuffle Arrow-batched map — the exact scan shape the full ANN
    query fuses its scoring into."""
    cents = ivf_centroids(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((v @ cents.T) / norms, IVF_SIM_DECIMALS)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cell": np.argmax(sims, axis=1).astype(np.int32),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cell int"
    )


def q_sim_ivf_probes(
    spark: SparkSession, sf_dir: str, n_probe: int = N_PROBE
) -> DataFrame:
    """Oracle-checked probe plan: for each query vector, the
    ``n_probe`` cells it searches, ranked by (rounded) cosine to the
    centroids."""
    cents = ivf_centroids(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((v @ cents.T) / norms, IVF_SIM_DECIMALS)
            rows = {"q_id": [], "cell": [], "probe_rank": []}
            for i in range(v.shape[0]):
                # sort by (-sim, cell): deterministic under rounded ties
                order = np.lexsort((np.arange(N_IVF_CELLS), -sims[i]))
                for rank, c in enumerate(order[:n_probe], start=1):
                    rows["q_id"].append(pdf["vec_id"].iloc[i])
                    rows["cell"].append(int(c))
                    rows["probe_rank"].append(rank)
            yield pd.DataFrame(rows)

    return (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(probe, schema="q_id long, cell int, probe_rank int")
    )


def q_sim_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_probe: int = N_PROBE,
    n_queries: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells over a sample, each
    vector assigned to its nearest cell, queries probe the ``n_probe``
    nearest cells only — the corpus side touched per query shrinks by
    ~cells/probes. The default is the recall@10 ≥ 0.75 operating
    point (see N_PROBE); pass a smaller ``n_probe`` to trade recall
    for probe cost along the measured frontier (BENCH "ivf_recall").

    Scale path: assignment is a batched matmul scan (zero shuffle);
    the search is an equi-join on cell id — same subquadratic shape as
    LSH but with data-adaptive partitions."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Deterministic centroids shared with the oracle-checked
    # assignment/probe queries (sorted stride sample, NOT limit() —
    # an unordered limit picks whatever partitions schedule first, so
    # centroids and results would vary run-to-run at scale).
    cents = ivf_centroids(sf_dir)

    q_ids, q_raw = _query_vectors(sf_dir)
    if n_queries is not None:
        q_ids, q_raw = q_ids[:n_queries], q_raw[:n_queries]
    q_mat = normalize_rows(q_raw)
    # cells each query probes — same rounded deterministic ordering as
    # the oracle-checked probe plan (q_sim_ivf_probes)
    q_sims = np.round(q_mat @ cents.T, IVF_SIM_DECIMALS)
    q_cells = np.stack(
        [np.lexsort((np.arange(N_IVF_CELLS), -q_sims[i]))[:n_probe]
         for i in range(len(q_ids))]
    )
    # (Q, cells) boolean probe mask — the vectorized form of the
    # per-(query, cell) membership test: row qi is True at exactly the
    # n_probe cells query qi searches.
    probe_mask = np.zeros((len(q_ids), N_IVF_CELLS), dtype=bool)
    for qi in range(len(q_ids)):
        probe_mask[qi, q_cells[qi]] = True
    # cells NO query probes are dead: their vectors get assignment
    # (one cheap batch × cells matmul) but never a query dot product —
    # the compute-side analogue of partition pruning, and the reason a
    # low-probe single-query search costs ~probed-fraction of the
    # exact scan rather than all of it (r10; results are identical,
    # skipped products were masked out anyway).
    active_cells = probe_mask.any(axis=0)

    def assign_and_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = normalize_rows(stack_embeddings(pdf["embedding"]))
            # rounded-argmax assignment, identical to q_sim_ivf_assignments
            cell = np.argmax(np.round(v @ cents.T, IVF_SIM_DECIMALS), axis=1)
            ids = pdf["vec_id"].values
            act = active_cells[cell]
            if not act.all():
                v, cell, ids = v[act], cell[act], ids[act]
            sims = q_mat @ v.T                        # (Q, active batch)
            keep = probe_mask[:, cell]                # (Q, active batch)
            qi_idx, bi_idx = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "q_id": q_ids[qi_idx],
                    "vec_id": ids[bi_idx],
                    "cell": cell[bi_idx].astype(np.int32),
                    "cosine_raw": sims[qi_idx, bi_idx],
                }
            )

    scored = (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            assign_and_score,
            schema="q_id long, vec_id long, cell int, cosine_raw double",
        )
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine_raw", 4).alias("cosine"),
            "rank",
        )
    )


PROBE_LEVELS = (1, 2, 3, 4, 6, 8, 12, 16)


def q_sim_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality audit: recall@TOP_K of the IVF search as a function
    of probe count — the tuning table an operator reads to pick the
    n_probe that hits a recall target on THEIR data (on clustered
    embeddings recall saturates early; on isotropic data it grows
    ~linearly with the probed fraction, which is a data property, not
    an index defect — r6 measured exactly that on the synthetic
    corpus, see PLANS.md).

    Cost shape: ground truth NEEDS the exact scan, so a recall audit
    is inherently O(Q x N) like the brute-force baseline it compares
    against — it runs over the bounded N_QUERIES sample, never
    per-corpus-vector. ONE corpus scan emits each (query, vector)
    cosine tagged with the probe rank of the vector's cell for that
    query; every probe level then reduces from the same persisted
    frame (per-level top-k windows over Q x N rows, output
    len(PROBE_LEVELS) rows). Approximate-op audit → rows-only driver
    check; invariants (monotone, exact at full probe, agreement with
    q_sim_ivf_topk at N_PROBE) are pytest-asserted."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(sf_dir)
    q_ids, q_raw = _query_vectors(sf_dir)
    q_mat = normalize_rows(q_raw)
    q_sims = np.round(q_mat @ cents.T, IVF_SIM_DECIMALS)
    # cell_rank[qi, c] = 1-based probe rank of cell c for query qi,
    # same deterministic (rounded sim, cell) ordering as q_sim_ivf_probes
    cell_rank = np.empty((len(q_ids), N_IVF_CELLS), dtype=np.int32)
    for qi in range(len(q_ids)):
        order = np.lexsort((np.arange(N_IVF_CELLS), -q_sims[qi]))
        cell_rank[qi, order] = np.arange(1, N_IVF_CELLS + 1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = normalize_rows(stack_embeddings(pdf["embedding"]))
            cell = np.argmax(np.round(v @ cents.T, IVF_SIM_DECIMALS), axis=1)
            sims = q_mat @ v.T                          # (Q, batch)
            nq, nb = sims.shape
            qi_idx = np.repeat(np.arange(nq), nb)
            bi_idx = np.tile(np.arange(nb), nq)
            yield pd.DataFrame(
                {
                    "q_id": q_ids[qi_idx],
                    "vec_id": pdf["vec_id"].values[bi_idx],
                    "cosine_raw": sims[qi_idx, bi_idx],
                    "cell_rank": cell_rank[qi_idx, cell[bi_idx]],
                }
            )

    scored = (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            score,
            schema="q_id long, vec_id long, cosine_raw double, cell_rank int",
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .persist()
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_raw").desc(), "vec_id")
    exact_k = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id")
    )
    n_exact = exact_k.select(F.count(F.lit(1)).alias("n_exact"))
    levels = None
    for p in PROBE_LEVELS:
        topp = (
            scored.filter(F.col("cell_rank") <= p)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select(F.lit(p).alias("n_probe"), "q_id", "vec_id")
        )
        levels = topp if levels is None else levels.unionByName(topp)
    hits = (
        levels.join(exact_k, ["q_id", "vec_id"], "left_semi")
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.crossJoin(bounded_broadcast(n_exact, 1, "1-row exact-pair count"))
        .select(
            "n_probe",
            "n_hits",
            "n_exact",
            F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall"),
        )
        .orderBy("n_probe")
    )


def ivf_nprobe_for_recall(
    spark: SparkSession, sf_dir: str, target_recall: float = 0.8
) -> dict:
    """Close the ANN tuning loop: run the recall-curve audit and
    return the SMALLEST probe level whose measured recall@TOP_K meets
    ``target_recall`` — the decision an operator otherwise makes by
    eyeballing the curve. Falls back to probing every cell (exact by
    construction, recall 1.0) if no cheaper level reaches the target,
    so the returned setting ALWAYS meets it. Returns {"n_probe",
    "recall", "target", "curve"} — the curve rides along so the
    choice is auditable."""
    rows = q_sim_ivf_recall_curve(spark, sf_dir).collect()
    curve = {r["n_probe"]: r["recall"] for r in rows}
    for p in sorted(curve):
        if curve[p] >= target_recall:
            return {
                "n_probe": p,
                "recall": curve[p],
                "target": target_recall,
                "curve": curve,
            }
    return {
        "n_probe": N_IVF_CELLS,
        "recall": 1.0,
        "target": target_recall,
        "curve": curve,
    }


def q_emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix G = sum_v v v^T over the embedding
    column — the one-pass building block for PCA/whitening/covariance
    drift audits (covariance = G/n - mean mean^T, means from
    q_emb_label_centroids' machinery).

    Scale shape — the map-side partial-aggregation pattern: each Arrow
    batch contributes ONE D x D partial (a local matmul, BLAS), so the
    shuffle carries tasks x D(D+1)/2 partial cells, independent of row
    count; the final groupBy(dim_i, dim_j) sums ~2k cells. The naive
    alternative (explode to row x dim_i x dim_j) would shuffle
    rows x D^2 — 4096x the corpus — which is why this one is a kernel,
    not a DataFrame explode."""
    emb = load_table(spark, sf_dir, "embeddings")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            g = v.T @ v
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame(
            {
                "dim_i": iu[0].astype(np.int32),
                "dim_j": iu[1].astype(np.int32),
                "partial": acc[iu],
            }
        )

    return (
        emb.select("embedding")
        .mapInPandas(partial, schema="dim_i int, dim_j int, partial double")
        .groupBy("dim_i", "dim_j")
        .agg(F.round(F.sum("partial"), 4).alias("gram"))
    )


def emb_top_principal_components(
    spark: SparkSession, sf_dir: str, k: int = 4
) -> dict:
    """Top-k principal directions of the embedding corpus from the
    distributed Gram matrix — the whitening/drift-monitoring building
    block on top of ``q_emb_gram_matrix``. The heavy lifting (one
    corpus scan, D x D partial matmuls) is the Spark job; the eigen
    decomposition runs driver-side on the collected D x D matrix —
    bounded control-plane work (D = 64 here; even D = 4096 is a
    ~130 MB symmetric eig, still laptop-sized), the same policy as
    IVF centroid training. Returns {"explained": [k variances as
    fraction of trace], "components": (k, D) ndarray, "dim": D}."""
    rows = q_emb_gram_matrix(spark, sf_dir).collect()
    d = max(r["dim_j"] for r in rows) + 1
    g = np.zeros((d, d))
    for r in rows:
        g[r["dim_i"], r["dim_j"]] = r["gram"]
        g[r["dim_j"], r["dim_i"]] = r["gram"]
    vals, vecs = np.linalg.eigh(g)          # ascending
    order = np.argsort(vals)[::-1][:k]
    top = vals[order]
    return {
        "explained": [float(v / vals.sum()) for v in top],
        "components": vecs[:, order].T,
        "dim": d,
    }


def q_emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (mean-pooled class centroid) as flat
    (label, dim, centroid) rows — the building block for class
    prototypes, centroid-init IVF, and per-cluster drift monitoring.
    Scale shape: posexplode multiplies rows by EMB_DIM *before* the
    shuffle, but hash aggregation runs partial (map-side) combine, so
    the shuffle carries at most labels x EMB_DIM partial sums per task
    — the 100 TB shuffle volume is O(tasks x labels x dim), independent
    of row count. avg() accumulates in double precision in both
    engines; ROUND(.,6) matches the verifier's float canonicalization."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )


def q_emb_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit: per-dimension [lo, hi] bounds
    and the mean absolute round-trip error of the 8-bit code — the
    memory-planning query for a compressed ANN store (float32 → int8
    cuts a 100 TB embedding corpus to 25 TB; this measures what that
    costs in fidelity, per dimension). Two shuffles, both on the
    64-value dim key with map-side partial agg; all arithmetic forced
    to double on BOTH engines so the oracle is exact (float32→double
    is lossless; float32 arithmetic is not cross-engine-stable). A
    constant dimension (hi == lo) quantizes losslessly, so its error
    is 0 by definition — guarded explicitly (in both engines) because
    0/0 would otherwise yield NaN with engine-divergent handling."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    b = e.groupBy("dim").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    span = F.col("hi") - F.col("lo")
    qv = F.round((F.col("v") - F.col("lo")) / span * 255)
    deq = F.col("lo") + qv * span / 255
    err = F.when(span != 0, F.abs(F.col("v") - deq)).otherwise(F.lit(0.0))
    return (
        e.join(bounded_broadcast(b, EMB_DIM, "per-dimension bounds table"), "dim")
        .select("dim", "lo", "hi", err.alias("err"))
        .groupBy("dim")
        .agg(
            F.round(F.min(F.col("lo")), 6).alias("lo"),
            F.round(F.min(F.col("hi")), 6).alias("hi"),
            F.round(F.avg("err"), 6).alias("mean_abs_err"),
        )
    )


KNN_GRAPH_K = 5      # out-degree of the within-block kNN graph


def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-block exact k-NN graph — the neighbor-list construction
    step of graph-based ANN (NSW/HNSW bottom layer) and of kNN-graph
    clustering: for every vector, its KNN_GRAPH_K nearest same-label
    neighbors by cosine, ranked, deterministic tiebreak on neighbor id.

    Scale shape mirrors [[dedup_embedding_cosine]]: one shuffle on the
    blocking key (label here; an LSH bucket or k-means cell at 100 TB
    — see ``q_dedup_semantic`` — so group size is bounded by
    construction, never corpus-proportional), then an in-group numpy
    kernel. The kernel scores one EMB_TILE row-block against the
    group per step, so peak memory is EMB_TILE × group, and emits
    only n × k edges — the quadratic similarity matrix never leaves
    the executor. Ranking uses RAW cosine (rounding only the output
    column) so the rank order is exactly the oracle's."""
    emb = load_table(spark, sf_dir, "embeddings")

    empty = pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "label": pd.Series([], dtype="int32"),
            "neighbor_id": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
            "rank": pd.Series([], dtype="int32"),
        }
    )

    def knn_in_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return empty
        m = normalize_rows(stack_embeddings(pdf["embedding"]))
        ids = pdf["vec_id"].values.astype(np.int64)
        label = pdf["label"].iloc[0]
        k = min(KNN_GRAPH_K, n - 1)
        frames = []
        for i0 in range(0, n, EMB_TILE_ROWS):
            i1 = min(i0 + EMB_TILE_ROWS, n)
            sims = m[i0:i1] @ m.T                   # (tile, n)
            for r in range(i1 - i0):
                row = sims[r].copy()
                row[i0 + r] = -np.inf               # exclude self
                order = np.lexsort((ids, -row))[:k]  # (cos desc, id asc)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": np.full(k, ids[i0 + r]),
                            "label": np.full(k, label, dtype="int32"),
                            "neighbor_id": ids[order],
                            "cosine": np.round(row[order], 4),
                            "rank": np.arange(1, k + 1, dtype="int32"),
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True)

    return emb.groupBy("label").applyInPandas(
        knn_in_group,
        schema="vec_id long, label int, neighbor_id long,"
        " cosine double, rank int",
    )


EMB_TILE_ROWS = 2048  # kNN-graph kernel row-tile (peak mem = tile × group)


def q_emb_knn_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN clustering: an undirected edge exists iff each
    vector appears in the OTHER's k-nearest list (the mutual-kNN
    criterion prunes hub-induced false merges that plain kNN-graph
    clustering suffers), then clusters = connected components with
    min-id labels — the unsupervised duplicate/theme grouping step
    that SemDeDup-style curation runs after neighbor search.

    Composition, not new machinery: [[sim_knn_graph]] supplies the
    directed edges (one blocking shuffle + kernel), the mutual filter
    is a self-equi-join on the reversed edge (n × k rows), and the
    O(log diameter) pointer-jumping loop is shared with
    [[dedup_clusters]]. Nodes with no mutual edge are singletons and
    are omitted, mirroring the pair-graph contract of the dedup CC."""
    from columnar_database_project_spark.operators.dedup import (
        connected_components,
    )

    g = q_sim_knn_graph(spark, sf_dir).select("vec_id", "neighbor_id")
    rev = g.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
    )
    mutual = (
        g.intersect(rev)
        .filter(F.col("vec_id") < F.col("neighbor_id"))
        .select(
            F.col("vec_id").alias("doc_a"),
            F.col("neighbor_id").alias("doc_b"),
        )
    )
    return connected_components(mutual).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )

LABEL_SPACE = 4096   # declared bound on distinct labels (bounded taxonomy)
OUTLIER_Z = 2.0      # distance z-score flag threshold


def q_emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel/outlier audit over the embedding corpus: per vector,
    the L2 distance to its OWN label's centroid, standardized within
    the label (z-score); vectors with z ≥ OUTLIER_Z are flagged — the
    standard first-pass filter for label noise before training a
    classifier on weak labels.

    Scale shape: centroids are the [[emb_label_centroids]] partial-agg
    shape (shuffle O(tasks × labels × dim)); the centroid table
    (≤ LABEL_SPACE × EMB_DIM rows by construction) broadcasts via the
    size-guarded hint, so the per-vector distance is computed map-side
    and the distance aggregate's partial combine collapses each
    vector's dims within its original partition — the only
    row-proportional shuffle carries ONE row per vector. The per-label
    stats table (≤ LABEL_SPACE rows) broadcasts for the final z-score.
    Constant-distance labels (sd = 0) are guarded to z = 0 in both
    engines, like [[emb_quantize_stats]] guards its span."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "label", "dim", F.col("v").cast("double").alias("v"))
    c = e.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    dist = (
        e.join(
            bounded_broadcast(
                c, LABEL_SPACE * EMB_DIM, "label-centroid table"
            ),
            ["label", "dim"],
        )
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("v") - F.col("c")) ** 2)).alias("dist"))
        # dist feeds BOTH the per-label stats (broadcast side) and the
        # output; without materialization the explode+distance subtree
        # is planned twice — at 100 TB that doubles the whole scan.
        # One row per vector, so the checkpoint is corpus-row-sized.
        .localCheckpoint()
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sd")
    )
    z = F.round(
        F.when(F.col("sd") != 0, (F.col("dist") - F.col("mu")) / F.col("sd"))
        .otherwise(F.lit(0.0)),
        4,
    )
    return (
        dist.join(
            bounded_broadcast(stats, LABEL_SPACE, "per-label distance stats"),
            "label",
        )
        .select(
            "vec_id",
            "label",
            F.round("dist", 6).alias("dist"),
            z.alias("z"),
        )
        .filter(F.col("z") >= OUTLIER_Z)
    )


KMEANS_K = 8
KMEANS_ITERS = 5


def _seed_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic k-means init: the first KMEANS_K vectors by
    vec_id, read driver-side with a pushdown-filtered pyarrow scan
    (same bounded pattern as ``_query_vectors`` — the centroids are a
    K x D parameter of the job, not a Spark stage)."""
    import pyarrow.dataset as ds

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = (
        ds.dataset(path)
        .to_table(
            columns=["vec_id", "embedding"],
            filter=ds.field("vec_id") < KMEANS_K,
        )
        .sort_by("vec_id")
    )
    return np.array(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )


def _kmeans_partials(cents: np.ndarray):
    """mapInPandas kernel: assign each vector to its nearest centroid
    (L2, rounded to 6dp with lowest-centroid-id tiebreak so assignment
    is reproducible cross-engine) and emit per-batch PARTIAL sums —
    (cluster_id, dim, psum, pcnt) — the Gram-matrix pattern: the
    shuffle carries O(tasks x K x D) cells regardless of row count.
    Distances use the direct (v-c)^2 form, not the expanded-dot-product
    form, to match the oracle's summation error profile."""
    C = np.ascontiguousarray(cents, dtype=np.float64)  # (K, D)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_sum: np.ndarray | None = None
        acc_cnt: np.ndarray | None = None
        for pdf in batches:
            V = stack_embeddings(pdf["embedding"])  # (n, D)
            d2 = np.empty((V.shape[0], C.shape[0]))
            for k in range(C.shape[0]):
                diff = V - C[k]
                d2[:, k] = np.einsum("ij,ij->i", diff, diff)
            assign = np.round(np.sqrt(d2), 6).argmin(axis=1)  # first-min = low cid
            if acc_sum is None:
                acc_sum = np.zeros((C.shape[0], C.shape[1]))
                acc_cnt = np.zeros(C.shape[0], dtype=np.int64)
            np.add.at(acc_sum, assign, V)
            np.add.at(acc_cnt, assign, 1)
        if acc_sum is None:
            return
        ks, ds_ = np.nonzero(np.broadcast_to(acc_cnt[:, None] > 0, acc_sum.shape))
        yield pd.DataFrame(
            {
                "cluster_id": ks.astype(np.int32),
                "dim": ds_.astype(np.int32),
                "psum": acc_sum[ks, ds_],
                "pcnt": acc_cnt[ks],
            }
        )

    return fn


_PARTIAL_SCHEMA = "cluster_id int, dim int, psum double, pcnt long"


def q_emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration from the deterministic seed centroids:
    assign every vector to its nearest centroid, output the updated
    per-(cluster, dim) mean and member count — the oracle-checkable
    unit of the k-means loop (``kmeans_fit`` iterates exactly this).
    Scale shape: a single corpus scan; the kernel pre-aggregates to
    K x D partials per task, so the one shuffle is row-count
    independent. The K-row centroid set rides into executors as a
    closure constant (bounded by construction: K x D doubles)."""
    cents = _seed_centroids(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        _kmeans_partials(cents), schema=_PARTIAL_SCHEMA
    )
    return partials.groupBy("cluster_id", "dim").agg(
        F.sum("pcnt").alias("n_members"),
        F.round(F.sum("psum") / F.sum("pcnt"), 6).alias("centroid"),
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> tuple[np.ndarray, list[float]]:
    """Distributed Lloyd's algorithm: ``iters`` rounds of one-scan
    partial-aggregated assignment (see ``q_emb_kmeans_step``). The
    driver collects only the K x D partial table per round (bounded
    control plane, like the connected-components fixed-point probe);
    vectors never leave executors. Empty clusters keep their previous
    centroid. Returns (centroids, per-round inertia) — inertia is
    non-increasing by Lloyd's convergence argument, asserted in
    tests/test_round6.py."""
    cents = _seed_centroids(sf_dir)[:k]
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    inertias: list[float] = []
    for _ in range(iters):
        rows = (
            emb.mapInPandas(
                _kmeans_summary(cents), schema=_SUMMARY_SCHEMA
            )
            .groupBy("cluster_id", "dim")
            .agg(
                F.sum("psum").alias("ssum"),
                F.sum("pcnt").alias("scnt"),
                F.sum("pd2").alias("sd2"),
            )
            .collect()
        )  # ≤ K x D rows — bounded driver collect
        new = cents.copy()
        inertia = 0.0
        for r in rows:
            new[r["cluster_id"], r["dim"]] = r["ssum"] / r["scnt"]
            if r["dim"] == 0:
                inertia += r["sd2"]
        inertias.append(inertia)
        cents = new
    return cents, inertias


def _kmeans_summary(cents: np.ndarray):
    """Like ``_kmeans_partials`` but also carries the batch's summed
    squared distance (inertia partial) on each cluster's dim-0 row."""
    C = np.ascontiguousarray(cents, dtype=np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_sum: np.ndarray | None = None
        acc_cnt: np.ndarray | None = None
        acc_d2: np.ndarray | None = None
        for pdf in batches:
            V = stack_embeddings(pdf["embedding"])
            d2 = np.empty((V.shape[0], C.shape[0]))
            for k in range(C.shape[0]):
                diff = V - C[k]
                d2[:, k] = np.einsum("ij,ij->i", diff, diff)
            assign = np.round(np.sqrt(d2), 6).argmin(axis=1)
            if acc_sum is None:
                acc_sum = np.zeros((C.shape[0], C.shape[1]))
                acc_cnt = np.zeros(C.shape[0], dtype=np.int64)
                acc_d2 = np.zeros(C.shape[0])
            np.add.at(acc_sum, assign, V)
            np.add.at(acc_cnt, assign, 1)
            np.add.at(acc_d2, assign, d2[np.arange(len(assign)), assign])
        if acc_sum is None:
            return
        ks, ds_ = np.nonzero(np.broadcast_to(acc_cnt[:, None] > 0, acc_sum.shape))
        yield pd.DataFrame(
            {
                "cluster_id": ks.astype(np.int32),
                "dim": ds_.astype(np.int32),
                "psum": acc_sum[ks, ds_],
                "pcnt": acc_cnt[ks],
                "pd2": np.where(ds_ == 0, acc_d2[ks], 0.0),
            }
        )

    return fn


_SUMMARY_SCHEMA = _PARTIAL_SCHEMA + ", pd2 double"


def q_emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-means fit (KMEANS_ITERS Lloyd rounds) followed by a
    final assignment pass: per-cluster member count and mean distance
    to the fitted centroid — the semantic-clustering audit that
    SemDeDup-style dedup and cluster-balanced sampling build on.
    Hash-checked since r8 against an unrolled-Lloyd DuckDB twin
    (``_kmeans_unrolled_sql`` — the fixed KMEANS_ITERS unrolls into
    chained CTE rounds); the Lloyd invariant (non-increasing inertia)
    stays pytest-asserted."""
    cents, _ = kmeans_fit(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    return (
        emb.mapInPandas(_kmeans_summary(cents), schema=_SUMMARY_SCHEMA)
        .groupBy("cluster_id")
        .agg(
            F.sum(F.when(F.col("dim") == 0, F.col("pcnt"))).alias("n_members"),
            F.round(
                F.sqrt(
                    F.sum("pd2")
                    / F.sum(F.when(F.col("dim") == 0, F.col("pcnt")))
                ),
                6,
            ).alias("rms_dist"),
        )
    )


def kmeans_min_argmin_margin(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> float:
    """Audit for the hash-gate stability of ``q_emb_kmeans``: the
    smallest raw (unrounded) gap between any vector's best and
    second-best centroid distance, minimized over every Lloyd round
    the fit actually performs.

    The emb_kmeans oracles hash-check quantities whose cross-engine
    equality rests on ROUND(dist, 6) absorbing float drift: a distance
    landing within drift of a 0.5e-6 rounding boundary could flip an
    argmin between engines and turn benign drift into a hash FAIL. A
    min-margin comfortably above 2e-6 (two rounding quanta) proves no
    such boundary tie exists on this corpus for these rounds —
    asserted in tests/test_round9.py so a future data change degrades
    to a diagnosable margin failure instead of a mysterious hash
    mismatch."""
    cents = _seed_centroids(sf_dir)[:k]
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    overall = float("inf")
    for _ in range(iters):
        C = np.ascontiguousarray(cents, dtype=np.float64)

        def margin_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            m = float("inf")
            for pdf in batches:
                V = stack_embeddings(pdf["embedding"])
                d2 = np.empty((V.shape[0], C.shape[0]))
                for kk in range(C.shape[0]):
                    diff = V - C[kk]
                    d2[:, kk] = np.einsum("ij,ij->i", diff, diff)
                d = np.sort(np.sqrt(d2), axis=1)
                m = min(m, float(np.min(d[:, 1] - d[:, 0])))
            if np.isfinite(m):
                yield pd.DataFrame({"m": [m]})

        row = (
            emb.mapInPandas(margin_fn, schema="m double")
            .agg(F.min("m").alias("m"))
            .first()
        )
        overall = min(overall, float(row["m"]))
        # advance the centroids exactly as kmeans_fit does
        rows = (
            emb.mapInPandas(_kmeans_summary(cents), schema=_SUMMARY_SCHEMA)
            .groupBy("cluster_id", "dim")
            .agg(F.sum("psum").alias("ssum"), F.sum("pcnt").alias("scnt"))
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster_id"], r["dim"]] = r["ssum"] / r["scnt"]
        cents = new
    return overall


CLUSTER_SAMPLE_M = 20


def q_emb_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: up to CLUSTER_SAMPLE_M vectors per
    k-means cell (seed-step assignment, so the blocking is
    oracle-reproducible), chosen by a deterministic hash-uniform draw
    — the diversity-sampling recipe that keeps a downsampled corpus
    covering every semantic region instead of letting the head
    clusters dominate. Scale shape: one scan assigns (K x D closure
    constant), one shuffle on cluster_id; the per-cluster window sorts
    only within cells. The hash draw (md5 of vec_id) makes the sample
    stable across runs and incremental batches."""
    import numpy as np

    C = _seed_centroids(sf_dir)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = stack_embeddings(pdf["embedding"])
            d2 = np.empty((V.shape[0], C.shape[0]))
            for k in range(C.shape[0]):
                diff = V - C[k]
                d2[:, k] = np.einsum("ij,ij->i", diff, diff)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cluster_id": np.round(np.sqrt(d2), 6)
                    .argmin(axis=1)
                    .astype(np.int32),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cluster_id int"
    )
    u = F.round(
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0),
        6,
    )
    w = W.partitionBy("cluster_id").orderBy("u", "vec_id")
    return (
        assigned.select("vec_id", "cluster_id", u.alias("u"))
        .withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= CLUSTER_SAMPLE_M)
    )


QUERIES = {
    "sim_topk_bruteforce": q_sim_topk_bruteforce,
    "sim_knn_classify": q_sim_knn_classify,
    "sim_hyperplane_signatures": q_sim_hyperplane_signatures,
    "sim_bucket_sizes": q_sim_bucket_sizes,
    "sim_bucket_rerank": q_sim_bucket_rerank,
    "sim_ivf_assignments": q_sim_ivf_assignments,
    "sim_ivf_probes": q_sim_ivf_probes,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_ivf_recall_curve": q_sim_ivf_recall_curve,
    "emb_label_centroids": q_emb_label_centroids,
    "emb_centroid_outliers": q_emb_centroid_outliers,
    "sim_knn_graph": q_sim_knn_graph,
    "emb_knn_clusters": q_emb_knn_clusters,
    "emb_quantize_stats": q_emb_quantize_stats,
    "emb_gram_matrix": q_emb_gram_matrix,
    "emb_kmeans_step": q_emb_kmeans_step,
    "emb_kmeans": q_emb_kmeans,
    "emb_cluster_sample": q_emb_cluster_sample,
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
    "sim_knn_classify": f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[])
                       AS cosine_raw
            FROM q JOIN embeddings e ON e.vec_id != q.q_id
        ),
        topk AS (
            SELECT q_id, vec_id AS neighbor_id FROM (
                SELECT q_id, vec_id,
                       row_number() OVER (
                           PARTITION BY q_id ORDER BY cosine_raw DESC, vec_id
                       ) AS rank
                FROM scored
            ) WHERE rank <= {TOP_K}
        ),
        votes AS (
            SELECT t.q_id, e.label, CAST(count(*) AS BIGINT) AS votes
            FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
            GROUP BY t.q_id, e.label
        )
        SELECT v.q_id, v.label AS predicted_label, v.votes,
               ROUND(v.votes / {float(TOP_K)}, 6) AS vote_share,
               qe.label AS actual_label,
               CAST(v.label = qe.label AS INT) AS correct
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY votes DESC, label
            ) AS rn
            FROM votes
        ) v
        JOIN embeddings qe ON qe.vec_id = v.q_id
        WHERE v.rn = 1
    """,
    "sim_hyperplane_signatures": f"""
        SELECT vec_id, CAST({_SIG_TERMS} AS BIGINT) AS signature
        FROM embeddings
    """,
    "sim_bucket_sizes": f"""
        WITH sigs AS (
            SELECT CAST({_SIG_TERMS} AS BIGINT) AS signature
            FROM embeddings
        )
        SELECT signature, COUNT(*) AS n_vectors
        FROM sigs
        GROUP BY signature
        HAVING COUNT(*) > 1
    """,
    "sim_bucket_rerank": f"""
        WITH sigs AS (
            SELECT vec_id, embedding,
                   CAST({_SIG_TERMS} AS BIGINT) AS signature
            FROM embeddings
        )
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.signature,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) AS cosine
        FROM sigs a JOIN sigs b
          ON a.signature = b.signature AND a.vec_id < b.vec_id
    """,
}


def _ivf_oracle_sqls() -> dict[str, str]:
    """SQL twins for the deterministic IVF stages (assignment + probe
    plan). Centroids are data-dependent, so the literals are derived —
    via the same ``ivf_centroids`` the queries use — from the table the
    oracle will run against: ``SPARK_GRAFT_ORACLE_SF_DIR`` (default
    /root/testdata/sf0.01, the driver's correctness scale). Empty dict
    when that table is absent → those queries fall back to the
    rows-only check."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        return {}
    try:
        cents = ivf_centroids(sf_dir)
    except Exception:
        # A corrupt/unreadable embeddings table must not take down the
        # whole query registry at import time (this runs on module
        # import): degrade these two queries to the rows-only check,
        # exactly like the absent-file path above.
        return {}
    values = ",\n            ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    sims = f"""
        WITH cents(cell, c) AS (VALUES
            {values}
        ),
        sims AS (
            SELECT e.vec_id, c.cell,
                   round(
                       list_dot_product(e.embedding::DOUBLE[], c.c)
                       / sqrt(list_dot_product(e.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[])),
                       {IVF_SIM_DECIMALS}
                   ) AS sim_r
            FROM embeddings e CROSS JOIN cents c
        )"""
    return {
        "sim_ivf_assignments": f"""{sims}
        SELECT vec_id, CAST(cell AS INT) AS cell FROM (
            SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim_r DESC, cell
            ) AS rn FROM sims
        ) WHERE rn = 1
    """,
        "sim_ivf_probes": f"""{sims}
        SELECT q_id, CAST(cell AS INT) AS cell,
               CAST(probe_rank AS INT) AS probe_rank FROM (
            SELECT vec_id AS q_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim_r DESC, cell
            ) AS probe_rank
            FROM sims WHERE vec_id < {N_QUERIES}
        ) WHERE probe_rank <= {N_PROBE}
    """,
        # Full IVF search twin (VERDICT r7 #4): assignment + probe plan
        # are deterministic (rounded-sim argmax, proven by the two
        # oracles above), and the scored candidate set is their
        # composition — so the WHOLE approximate search result is
        # SQL-expressible and hash-checkable, same raw-cosine ordering
        # contract as the green sim_topk_bruteforce oracle.
        "sim_ivf_topk": f"""{sims},
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim_r DESC, cell
                ) AS rn FROM sims
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim_r DESC, cell
                ) AS pr FROM sims WHERE vec_id < {N_QUERIES}
            ) WHERE pr <= {N_PROBE}
        ),
        q AS (
            SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_cosine_similarity(q.qv::DOUBLE[],
                                          e.embedding::DOUBLE[])
                       AS cosine_raw
            FROM q
            JOIN probes p ON p.q_id = q.q_id
            JOIN assign a ON a.cell = p.cell
            JOIN embeddings e
              ON e.vec_id = a.vec_id AND e.vec_id != q.q_id
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
        # Recall-curve twin: every (query, vector) cosine is tagged
        # with the probe rank of the vector's cell for that query; a
        # per-level top-k against the exact top-k gives the recall
        # fraction — all deterministic, so the curve itself is now
        # hash-checked instead of rows-only.
        "sim_ivf_recall_curve": f"""{sims},
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim_r DESC, cell
                ) AS rn FROM sims
            ) WHERE rn = 1
        ),
        cellrank AS (
            SELECT vec_id AS q_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim_r DESC, cell
            ) AS probe_rank
            FROM sims WHERE vec_id < {N_QUERIES}
        ),
        q AS (
            SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_cosine_similarity(q.qv::DOUBLE[],
                                          e.embedding::DOUBLE[])
                       AS cosine_raw,
                   cr.probe_rank
            FROM q
            JOIN cellrank cr ON cr.q_id = q.q_id
            JOIN assign a ON a.cell = cr.cell
            JOIN embeddings e
              ON e.vec_id = a.vec_id AND e.vec_id != q.q_id
        ),
        exact_k AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id, row_number() OVER (
                    PARTITION BY q_id ORDER BY cosine_raw DESC, vec_id
                ) AS rank FROM scored
            ) WHERE rank <= {TOP_K}
        ),
        levels(n_probe) AS (VALUES {", ".join(f"({p})" for p in PROBE_LEVELS)}),
        topp AS (
            SELECT n_probe, q_id, vec_id FROM (
                SELECT l.n_probe, s.q_id, s.vec_id,
                       row_number() OVER (
                           PARTITION BY l.n_probe, s.q_id
                           ORDER BY s.cosine_raw DESC, s.vec_id
                       ) AS rank
                FROM levels l JOIN scored s ON s.probe_rank <= l.n_probe
            ) WHERE rank <= {TOP_K}
        ),
        hits AS (
            SELECT t.n_probe, count(*) AS n_hits
            FROM topp t
            JOIN exact_k x ON x.q_id = t.q_id AND x.vec_id = t.vec_id
            GROUP BY t.n_probe
        ),
        tot AS (SELECT count(*) AS n_exact FROM exact_k)
        SELECT CAST(h.n_probe AS INT) AS n_probe,
               CAST(h.n_hits AS BIGINT) AS n_hits,
               CAST(tot.n_exact AS BIGINT) AS n_exact,
               ROUND(h.n_hits * 1.0 / tot.n_exact, 4) AS recall
        FROM hits h CROSS JOIN tot
    """,
    }


ORACLES.update(_ivf_oracle_sqls())

ORACLES["emb_kmeans_step"] = f"""
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
            SELECT CAST(cid AS INT) AS cluster_id, embedding
            FROM a WHERE rn = 1
        )
        SELECT cluster_id, CAST(gs - 1 AS INT) AS dim,
               count(*) AS n_members,
               ROUND(avg(v), 6) AS centroid
        FROM (
            SELECT cluster_id,
                   unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding, 1) AS gs
            FROM m
        )
        GROUP BY cluster_id, dim
    """

def _kmeans_unrolled_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Full Lloyd fit as ONE DuckDB query (VERDICT r7 #4): the fixed
    iteration count unrolls into ``iters`` chained CTE rounds —
    distance → rounded-argmin assignment (ties to the lowest cluster,
    = np.argmin first-hit) → per-(cluster, dim) mean with empty
    clusters carrying the previous centroid (COALESCE), exactly
    ``kmeans_fit``'s semantics. Cross-engine float drift (~1 ulp in
    the means) is absorbed by the ROUND(sqrt(d2), 6) before every
    argmin — the same determinism contract the green emb_kmeans_step
    oracle already relies on — so the final per-cluster (count,
    rms_dist) is hash-checkable."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        d{i} AS (
            SELECT ev.vec_id, c.cluster_id,
                   ROUND(sqrt(SUM((ev.v - c.val) * (ev.v - c.val))), 6)
                       AS dist
            FROM ev JOIN c{i - 1} c USING (dim)
            GROUP BY ev.vec_id, c.cluster_id
        ),
        a{i} AS (
            SELECT vec_id, cluster_id FROM (
                SELECT vec_id, cluster_id, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cluster_id
                ) AS rn FROM d{i}
            ) WHERE rn = 1
        ),
        c{i} AS (
            SELECT c.cluster_id, c.dim, COALESCE(m.val, c.val) AS val
            FROM c{i - 1} c LEFT JOIN (
                SELECT a.cluster_id, ev.dim, avg(ev.v) AS val
                FROM a{i} a JOIN ev ON ev.vec_id = a.vec_id
                GROUP BY a.cluster_id, ev.dim
            ) m ON m.cluster_id = c.cluster_id AND m.dim = c.dim
        )""")
    return f"""
        WITH ev AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS dim,
                   unnest(embedding::DOUBLE[]) AS v
            FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS cluster_id, dim, v AS val
            FROM ev WHERE vec_id < {k}
        ),{",".join(rounds)},
        dfin AS (
            SELECT ev.vec_id, c.cluster_id,
                   SUM((ev.v - c.val) * (ev.v - c.val)) AS d2
            FROM ev JOIN c{iters} c USING (dim)
            GROUP BY ev.vec_id, c.cluster_id
        ),
        afin AS (
            SELECT vec_id, cluster_id, d2 FROM (
                SELECT vec_id, cluster_id, d2, row_number() OVER (
                    PARTITION BY vec_id
                    ORDER BY ROUND(sqrt(d2), 6), cluster_id
                ) AS rn FROM dfin
            ) WHERE rn = 1
        )
        SELECT CAST(cluster_id AS INT) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               ROUND(sqrt(SUM(d2) / count(*)), 6) AS rms_dist
        FROM afin GROUP BY cluster_id
    """


ORACLES["emb_kmeans"] = _kmeans_unrolled_sql()

ORACLES["emb_cluster_sample"] = f"""
        WITH c AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < {KMEANS_K}
        ), a AS (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], c.cv), 6),
                                c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN c
        ), m AS (
            SELECT vec_id, CAST(cid AS INT) AS cluster_id
            FROM a WHERE rn = 1
        ), drawn AS (
            SELECT vec_id, cluster_id,
                   ROUND(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                         / 4294967296.0, 6) AS u
            FROM m
        )
        SELECT vec_id, cluster_id, u, samp_rank FROM (
            SELECT vec_id, cluster_id, u,
                   row_number() OVER (
                       PARTITION BY cluster_id ORDER BY u, vec_id
                   ) AS samp_rank
            FROM drawn
        ) WHERE samp_rank <= {CLUSTER_SAMPLE_M}
    """

ORACLES["emb_label_centroids"] = """
        SELECT label,
               CAST(gs - 1 AS INT) AS dim,
               ROUND(avg(v), 6) AS centroid
        FROM (
            SELECT label,
                   unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS gs
            FROM embeddings
        )
        GROUP BY label, dim
    """

ORACLES["sim_knn_graph"] = f"""
        WITH pairs AS (
            SELECT a.vec_id, a.label, b.vec_id AS neighbor_id,
                   list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]
                   ) AS cosine_raw
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id != b.vec_id
        )
        SELECT vec_id, label, neighbor_id,
               ROUND(cosine_raw, 4) AS cosine, rank
        FROM (
            SELECT vec_id, label, neighbor_id, cosine_raw,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY cosine_raw DESC, neighbor_id
                   ) AS rank
            FROM pairs
        ) WHERE rank <= {KNN_GRAPH_K}
    """

ORACLES["emb_knn_clusters"] = f"""
        WITH RECURSIVE knn AS (
            SELECT vec_id, neighbor_id FROM (
                SELECT a.vec_id, b.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(
                               a.embedding::DOUBLE[], b.embedding::DOUBLE[]
                           ) DESC, b.vec_id
                       ) AS rank
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id != b.vec_id
            ) WHERE rank <= {KNN_GRAPH_K}
        ),
        mutual AS (
            SELECT a.vec_id AS u, a.neighbor_id AS v
            FROM knn a JOIN knn b
              ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
            WHERE a.vec_id < a.neighbor_id
        ),
        edges AS (
            SELECT u, v FROM mutual UNION SELECT v, u FROM mutual
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        cc AS (
            SELECT u AS vec_id, CAST(min(v) AS BIGINT) AS cluster_id
            FROM (SELECT u, v FROM reach UNION SELECT u, u FROM edges)
            GROUP BY u
        )
        SELECT vec_id, cluster_id FROM cc
    """

ORACLES["emb_centroid_outliers"] = f"""
        WITH e AS (
            SELECT vec_id, label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ), c AS (
            SELECT label, dim, avg(v) AS c FROM e GROUP BY label, dim
        ), dist AS (
            SELECT e.vec_id, e.label,
                   sqrt(sum((e.v - c.c) * (e.v - c.c))) AS dist
            FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
            GROUP BY e.vec_id, e.label
        ), stats AS (
            SELECT label, avg(dist) AS mu, stddev_samp(dist) AS sd
            FROM dist GROUP BY label
        )
        SELECT d.vec_id, d.label,
               ROUND(d.dist, 6) AS dist,
               ROUND(CASE WHEN s.sd != 0 THEN (d.dist - s.mu) / s.sd
                          ELSE 0.0 END, 4) AS z
        FROM dist d JOIN stats s USING (label)
        WHERE ROUND(CASE WHEN s.sd != 0 THEN (d.dist - s.mu) / s.sd
                         ELSE 0.0 END, 4) >= {OUTLIER_Z}
    """

ORACLES["emb_quantize_stats"] = """
        WITH e AS (
            SELECT CAST(gs - 1 AS INT) AS dim, v::DOUBLE AS v
            FROM (
                SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS gs
                FROM embeddings
            )
        ), b AS (
            SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY dim
        )
        SELECT e.dim,
               ROUND(min(lo), 6) AS lo,
               ROUND(min(hi), 6) AS hi,
               ROUND(avg(CASE WHEN hi - lo != 0 THEN abs(
                   v - (lo + round((v - lo) / (hi - lo) * 255)
                            * (hi - lo) / 255)
               ) ELSE 0.0 END), 6) AS mean_abs_err
        FROM e JOIN b USING (dim)
        GROUP BY e.dim
    """

ORACLES["emb_gram_matrix"] = """
        WITH e AS (
            SELECT vec_id,
                   unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS gs
            FROM embeddings
        )
        SELECT CAST(a.gs - 1 AS INT) AS dim_i,
               CAST(b.gs - 1 AS INT) AS dim_j,
               ROUND(sum(a.v::DOUBLE * b.v::DOUBLE), 4) AS gram
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.gs <= b.gs
        GROUP BY 1, 2
    """


# ------------------------------------------------------------------ PQ
# Product quantization: the compression half of a production ANN index
# (IVF above is the pruning half; IVF-PQ composes the two). Each
# vector is split into PQ_M subspaces and every subvector replaced by
# the id of its nearest codebook entry: 64 float32 dims (256 B) become
# PQ_M uint8 codes (8 B) — a 32x in-memory shrink, which is what lets
# a 100 TB embedding corpus fit an in-RAM search tier. No reference
# analog (the reference delegates all vector work to DuckDB); the
# codebook-training / assignment / distortion-audit / ADC-search split
# mirrors the public FAISS IVFPQ design.

PQ_M = 8                     # subspaces
PQ_SUB = EMB_DIM // PQ_M     # dims per subspace
PQ_K = 16                    # codebook entries per subspace
PQ_KMEANS_ITERS = 10
PQ_DECIMALS = 6              # distances rounded before argmin/rank →
                             # cross-engine deterministic (IVF pattern)

_PQ_CACHE: dict[tuple, np.ndarray] = {}


def pq_codebooks(sf_dir: str) -> np.ndarray:
    """(PQ_M, PQ_K, PQ_SUB) codebooks — deterministic per-subspace
    k-means (fixed seed, fixed iterations) over the same streamed
    strided sample the IVF centroids train on, so driver memory stays
    O(sample) regardless of table size. Freshness-keyed cache shared
    by the Spark queries AND the SQL-oracle builder: both sides see
    bit-identical codebooks."""
    from columnar_database_project_spark.catalog import file_freshness

    path = os.path.realpath(os.path.join(sf_dir, "embeddings.parquet"))
    key = (path, file_freshness(path))
    if key not in _PQ_CACHE:
        if len(_PQ_CACHE) > 16:
            _PQ_CACHE.clear()
        sample = _ivf_sample(sf_dir)          # raw (unnormalized) rows
        rng = np.random.RandomState(29)
        books = np.empty((PQ_M, PQ_K, PQ_SUB))
        for m in range(PQ_M):
            sub = sample[:, m * PQ_SUB:(m + 1) * PQ_SUB]
            cent = sub[rng.choice(len(sub), PQ_K, replace=False)].copy()
            for _ in range(PQ_KMEANS_ITERS):
                d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
                assign = np.argmin(d, axis=1)
                for k in range(PQ_K):
                    members = sub[assign == k]
                    if len(members):
                        cent[k] = members.mean(axis=0)
            books[m] = cent
        _PQ_CACHE[key] = books
    return _PQ_CACHE[key]


def _pq_assign(v: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, D) → (n, PQ_M) int32 codes: per-subspace argmin of the
    PQ_DECIMALS-rounded Euclidean distance; np.argmin takes the first
    (= lowest code) on rounded ties, matching the oracle's
    ORDER BY dist, code."""
    n = v.shape[0]
    sub = v.reshape(n, PQ_M, PQ_SUB)
    codes = np.empty((n, PQ_M), dtype=np.int32)
    for m in range(PQ_M):
        d = np.round(
            np.linalg.norm(sub[:, m, None, :] - books[m][None, :, :], axis=-1),
            PQ_DECIMALS,
        )
        codes[:, m] = np.argmin(d, axis=1)
    return codes


def q_emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's PQ code, one row per (vector, subspace) —
    oracle-checked against the same codebooks inlined as SQL literals.
    Zero-shuffle Arrow-batched scan (the same shape assignment takes
    inside a real index build, where the codes would stream straight
    into the index writer)."""
    books = pq_codebooks(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            codes = _pq_assign(v, books)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, PQ_M),
                    "subspace": np.tile(
                        np.arange(PQ_M, dtype=np.int32), n
                    ),
                    "code": codes.reshape(-1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, subspace int, code int"
    )


def q_emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace quantization MSE — the audit that tells an
    operator whether PQ_M/PQ_K suffice for their corpus before they
    pay for a full index build. The kernel emits one (subspace,
    squared-error) row per vector-subspace; the groupBy's map-side
    partial aggregation collapses that to PQ_M rows per task, so the
    shuffle is O(PQ_M x tasks) regardless of corpus size. Uses the
    rounded assignment distance squared, identically to the oracle."""
    books = pq_codebooks(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            n = len(pdf)
            sub = v.reshape(n, PQ_M, PQ_SUB)
            errs = np.empty((n, PQ_M))
            for m in range(PQ_M):
                d = np.round(
                    np.linalg.norm(
                        sub[:, m, None, :] - books[m][None, :, :], axis=-1
                    ),
                    PQ_DECIMALS,
                )
                errs[:, m] = d[np.arange(n), np.argmin(d, axis=1)] ** 2
            yield pd.DataFrame(
                {
                    "subspace": np.tile(np.arange(PQ_M, dtype=np.int32), n),
                    "sqerr": errs.reshape(-1),
                }
            )

    return (
        emb.select("embedding")
        .mapInPandas(kernel, schema="subspace int, sqerr double")
        .groupBy("subspace")
        .agg(
            F.round(F.avg("sqerr"), 4).alias("mse"),
            F.count("*").alias("n_vectors"),
        )
    )


def q_emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: queries keep full precision,
    the corpus is its PQ codes, and each query precomputes a
    (PQ_M, PQ_K) lookup table of subspace distances — scoring a coded
    vector is then PQ_M table lookups instead of a D-dim multiply.
    Fully oracle-checked (unusual for an ANN query) because the whole
    chain is deterministic: rounded-argmin codes, LUT sums rounded to
    PQ_DECIMALS before ranking, ties broken by vec_id.

    Scale shape: the LUT (Q x PQ_M x PQ_K doubles) ships inside the
    kernel closure — bounded by the query set, never by the corpus —
    and the per-partition top-k keeps the downstream sort at
    Q x k x n_partitions rows, exactly like the brute-force baseline
    it approximates."""
    books = pq_codebooks(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q_ids, q_raw = _query_vectors(sf_dir)
    q_sub = q_raw.reshape(len(q_ids), PQ_M, PQ_SUB)
    lut = np.empty((len(q_ids), PQ_M, PQ_K))
    for m in range(PQ_M):
        lut[:, m, :] = np.sum(
            (q_sub[:, m, None, :] - books[m][None, :, :]) ** 2, axis=-1
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(q): (np.empty(0, dtype=np.int64), np.empty(0)) for q in q_ids
        }
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            codes = _pq_assign(v, books)
            ad = np.zeros((len(q_ids), len(pdf)))
            for m in range(PQ_M):
                ad += lut[:, m, codes[:, m]]
            ad = np.round(ad, PQ_DECIMALS)
            vid = pdf["vec_id"].values.astype(np.int64)
            for qi, q in enumerate(q_ids):
                mask = vid != q
                ids = np.concatenate([best[int(q)][0], vid[mask]])
                ds = np.concatenate([best[int(q)][1], ad[qi][mask]])
                if len(ids) > TOP_K:
                    order = np.lexsort((ids, ds))[:TOP_K]
                    ids, ds = ids[order], ds[order]
                best[int(q)] = (ids, ds)
        rows = {"q_id": [], "vec_id": [], "adist": []}
        for q, (ids, ds) in best.items():
            rows["q_id"].extend([q] * len(ids))
            rows["vec_id"].extend(ids.tolist())
            rows["adist"].extend(ds.tolist())
        yield pd.DataFrame(rows)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="q_id long, vec_id long, adist double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "adist", "rank")
    )


QUERIES["emb_pq_codes"] = q_emb_pq_codes
QUERIES["emb_pq_distortion"] = q_emb_pq_distortion
QUERIES["emb_pq_adc_topk"] = q_emb_pq_adc_topk


def _pq_oracle_sqls() -> dict[str, str]:
    """SQL twins for the PQ stages, codebooks inlined as literals —
    same data-dependent-oracle pattern (and same degrade-to-rows-only
    guards) as ``_ivf_oracle_sqls``."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        return {}
    try:
        books = pq_codebooks(sf_dir)
    except Exception:
        return {}
    values = ",\n            ".join(
        f"({m}, {k}, [{', '.join(repr(float(x)) for x in books[m, k])}]::DOUBLE[])"
        for m in range(PQ_M)
        for k in range(PQ_K)
    )
    codes = f"""
        WITH books(m, code, c) AS (VALUES
            {values}
        ),
        d AS (
            SELECT e.vec_id, b.m, b.code,
                   round(list_distance(
                       list_slice(e.embedding::DOUBLE[],
                                  b.m * {PQ_SUB} + 1, (b.m + 1) * {PQ_SUB}),
                       b.c), {PQ_DECIMALS}) AS dist
            FROM embeddings e CROSS JOIN books b
        ),
        codes AS (
            SELECT vec_id, m, code, dist FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY dist, code
                ) AS rn FROM d
            ) WHERE rn = 1
        )"""
    return {
        "emb_pq_codes": f"""{codes}
        SELECT vec_id, CAST(m AS INT) AS subspace, CAST(code AS INT) AS code
        FROM codes
    """,
        "emb_pq_distortion": f"""{codes}
        SELECT CAST(m AS INT) AS subspace,
               ROUND(avg(dist * dist), 4) AS mse,
               count(*) AS n_vectors
        FROM codes GROUP BY m
    """,
        "emb_pq_adc_topk": f"""{codes},
        q AS (
            SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        lut AS (
            SELECT q.q_id, b.m, b.code,
                   pow(list_distance(
                       list_slice(q.qv, b.m * {PQ_SUB} + 1,
                                  (b.m + 1) * {PQ_SUB}),
                       b.c), 2) AS sq
            FROM q CROSS JOIN books b
        ),
        approx AS (
            SELECT l.q_id, c.vec_id,
                   round(sum(l.sq), {PQ_DECIMALS}) AS adist
            FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
            GROUP BY l.q_id, c.vec_id
        )
        SELECT q_id, vec_id AS neighbor_id, adist, rank FROM (
            SELECT q_id, vec_id, adist, row_number() OVER (
                PARTITION BY q_id ORDER BY adist, vec_id
            ) AS rank
            FROM approx WHERE vec_id != q_id
        ) WHERE rank <= {TOP_K}
    """,
    }


ORACLES.update(_pq_oracle_sqls())


def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed search — the canonical at-scale ANN index shape
    (FAISS IVFPQ): IVF cells prune the corpus to the N_PROBE probed
    partitions per query, PQ codes + a per-query lookup table score
    the survivors without touching full-precision vectors. Fully
    oracle-checked: every stage (cell argmax, code argmin, LUT sums)
    rounds before compare, so the composition stays cross-engine
    deterministic like its two halves.

    Scale shape: one corpus scan computes cell + codes per batch
    (zero shuffle); per-query work is probe-mask lookups + PQ_M
    table-gathers; the per-partition top-k bounds the downstream sort
    at Q x k x n_partitions rows. At 100 TB the codes (8 B/vector)
    are what an index build would persist — search then scans 8 B
    not 256 B per vector, on N_PROBE/N_IVF_CELLS of the corpus."""
    cents = ivf_centroids(sf_dir)
    books = pq_codebooks(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q_ids, q_raw = _query_vectors(sf_dir)
    q_norm = normalize_rows(q_raw)
    q_sims = np.round(q_norm @ cents.T, IVF_SIM_DECIMALS)
    probe_mask = np.zeros((len(q_ids), N_IVF_CELLS), dtype=bool)
    for qi in range(len(q_ids)):
        order = np.lexsort((np.arange(N_IVF_CELLS), -q_sims[qi]))
        probe_mask[qi, order[:N_PROBE]] = True
    q_sub = q_raw.reshape(len(q_ids), PQ_M, PQ_SUB)
    lut = np.empty((len(q_ids), PQ_M, PQ_K))
    for m in range(PQ_M):
        lut[:, m, :] = np.sum(
            (q_sub[:, m, None, :] - books[m][None, :, :]) ** 2, axis=-1
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(q): (np.empty(0, dtype=np.int64), np.empty(0)) for q in q_ids
        }
        for pdf in batches:
            v = stack_embeddings(pdf["embedding"])
            vn = normalize_rows(v)
            cell = np.argmax(
                np.round(vn @ cents.T, IVF_SIM_DECIMALS), axis=1
            )
            codes = _pq_assign(v, books)
            ad = np.zeros((len(q_ids), len(pdf)))
            for m in range(PQ_M):
                ad += lut[:, m, codes[:, m]]
            ad = np.round(ad, PQ_DECIMALS)
            vid = pdf["vec_id"].values.astype(np.int64)
            keep = probe_mask[:, cell]              # (Q, batch)
            for qi, q in enumerate(q_ids):
                mask = keep[qi] & (vid != q)
                ids = np.concatenate([best[int(q)][0], vid[mask]])
                ds = np.concatenate([best[int(q)][1], ad[qi][mask]])
                if len(ids) > TOP_K:
                    order = np.lexsort((ids, ds))[:TOP_K]
                    ids, ds = ids[order], ds[order]
                best[int(q)] = (ids, ds)
        rows = {"q_id": [], "vec_id": [], "adist": []}
        for q, (ids, ds) in best.items():
            rows["q_id"].extend([q] * len(ids))
            rows["vec_id"].extend(ids.tolist())
            rows["adist"].extend(ds.tolist())
        yield pd.DataFrame(rows)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="q_id long, vec_id long, adist double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("adist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "adist", "rank")
    )


QUERIES["sim_ivfpq_topk"] = q_sim_ivfpq_topk


def _ivfpq_oracle_sql() -> dict[str, str]:
    """SQL twin of the composed IVF-PQ search: the IVF centroid CTEs
    (cell assignment + per-query probe sets) joined with the PQ CTEs
    (codes + LUT). Same data-dependent-literal pattern and degrade
    guards as the two component builders."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        return {}
    try:
        cents = ivf_centroids(sf_dir)
        books = pq_codebooks(sf_dir)
    except Exception:
        return {}
    cent_values = ",\n            ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    book_values = ",\n            ".join(
        f"({m}, {k}, [{', '.join(repr(float(x)) for x in books[m, k])}]::DOUBLE[])"
        for m in range(PQ_M)
        for k in range(PQ_K)
    )
    return {
        "sim_ivfpq_topk": f"""
        WITH cents(cell, cv) AS (VALUES
            {cent_values}
        ),
        books(m, code, c) AS (VALUES
            {book_values}
        ),
        csims AS (
            SELECT e.vec_id, ct.cell,
                   round(
                       list_dot_product(e.embedding::DOUBLE[], ct.cv)
                       / sqrt(list_dot_product(e.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[])),
                       {IVF_SIM_DECIMALS}
                   ) AS sim_r
            FROM embeddings e CROSS JOIN cents ct
        ),
        assign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim_r DESC, cell
                ) AS rn FROM csims
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim_r DESC, cell
                ) AS pr FROM csims WHERE vec_id < {N_QUERIES}
            ) WHERE pr <= {N_PROBE}
        ),
        d AS (
            SELECT e.vec_id, b.m, b.code,
                   round(list_distance(
                       list_slice(e.embedding::DOUBLE[],
                                  b.m * {PQ_SUB} + 1, (b.m + 1) * {PQ_SUB}),
                       b.c), {PQ_DECIMALS}) AS dist
            FROM embeddings e CROSS JOIN books b
        ),
        codes AS (
            SELECT vec_id, m, code FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, m ORDER BY dist, code
                ) AS rn FROM d
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        lut AS (
            SELECT q.q_id, b.m, b.code,
                   pow(list_distance(
                       list_slice(q.qv, b.m * {PQ_SUB} + 1,
                                  (b.m + 1) * {PQ_SUB}),
                       b.c), 2) AS sq
            FROM q CROSS JOIN books b
        ),
        cand AS (
            SELECT a.vec_id, p.q_id
            FROM assign a JOIN probes p ON a.cell = p.cell
            WHERE a.vec_id != p.q_id
        ),
        approx AS (
            SELECT cd.q_id, cd.vec_id,
                   round(sum(l.sq), {PQ_DECIMALS}) AS adist
            FROM cand cd
            JOIN codes c ON c.vec_id = cd.vec_id
            JOIN lut l ON l.q_id = cd.q_id
                      AND l.m = c.m AND l.code = c.code
            GROUP BY cd.q_id, cd.vec_id
        )
        SELECT q_id, vec_id AS neighbor_id, adist, rank FROM (
            SELECT q_id, vec_id, adist, row_number() OVER (
                PARTITION BY q_id ORDER BY adist, vec_id
            ) AS rank
            FROM approx
        ) WHERE rank <= {TOP_K}
    """
    }


_IVFPQ_ORACLE = _ivfpq_oracle_sql()
ORACLES.update(_IVFPQ_ORACLE)


def q_sim_ivfpq_store_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-backed twin of ``q_sim_ivfpq_topk``: search the streamed,
    cell-partitioned on-disk index instead of recomputing codes in the
    scan (impl + rationale: ``streaming/vectors.py``). Registered here
    with the SAME oracle SQL as the batch query — identical results by
    construction is the subsystem's core claim, and this entry puts it
    under the external hash-compare."""
    from columnar_database_project_spark.streaming.vectors import (
        q_sim_ivfpq_store_topk as impl,
    )

    return impl(spark, sf_dir)


QUERIES["sim_ivfpq_store_topk"] = q_sim_ivfpq_store_topk
if "sim_ivfpq_topk" in _IVFPQ_ORACLE:
    ORACLES["sim_ivfpq_store_topk"] = _IVFPQ_ORACLE["sim_ivfpq_topk"]


FILTER_LABEL = 3   # the metadata predicate of the filtered search


def q_sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact cosine top-k restricted to rows
    matching a metadata predicate (label = FILTER_LABEL) — the
    filter+ANN composition every production vector store is asked for
    and many bolt on as a post-filter (which silently returns < k
    when the filter is selective). Here the predicate is pushed INTO
    the scan (parquet row-group pruning applies) and the kernel
    scores only survivors, so k results come back whenever k matches
    exist — pre-filtering, the correct semantics.

    Scale shape: identical to the brute-force baseline (query set in
    the kernel closure, per-partition top-k) on the FILTERED scan; at
    100 TB the predicate prunes row groups before any vector math,
    and the same composition applies unchanged over the IVF-PQ store
    (partition filter on cell AND predicate on metadata)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label") == FILTER_LABEL
    )
    q_ids, q_raw = _query_vectors(sf_dir)
    q_mat = normalize_rows(q_raw)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {
            int(q): (np.empty(0, dtype=np.int64), np.empty(0)) for q in q_ids
        }
        for pdf in batches:
            v = normalize_rows(stack_embeddings(pdf["embedding"]))
            sims = q_mat @ v.T
            vid = pdf["vec_id"].values.astype(np.int64)
            for qi, q in enumerate(q_ids):
                mask = vid != q
                ids = np.concatenate([best[int(q)][0], vid[mask]])
                cs = np.concatenate([best[int(q)][1], sims[qi][mask]])
                if len(ids) > TOP_K:
                    order = np.lexsort((ids, -cs))[:TOP_K]
                    ids, cs = ids[order], cs[order]
                best[int(q)] = (ids, cs)
        rows = {"q_id": [], "vec_id": [], "cosine_raw": []}
        for q, (ids, cs) in best.items():
            rows["q_id"].extend([q] * len(ids))
            rows["vec_id"].extend(ids.tolist())
            rows["cosine_raw"].extend(cs.tolist())
        yield pd.DataFrame(rows)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="q_id long, vec_id long, cosine_raw double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine_raw", 4).alias("cosine"),
            "rank",
        )
    )


QUERIES["sim_filtered_topk"] = q_sim_filtered_topk

ORACLES["sim_filtered_topk"] = f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[])
                       AS cosine_raw
            FROM q JOIN embeddings e
              ON e.vec_id != q.q_id AND e.label = {FILTER_LABEL}
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
    """
