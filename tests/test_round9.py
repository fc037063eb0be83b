"""Round-9 closures.

1. LSH production bucket cap (VERDICT r8 "What's wrong #1"): keeper-star
   semantics for over-full buckets — capped pairs ⊆ uncapped pairs,
   connected components (→ clusters, survivors) identical, exact
   equality when no bucket exceeds the cap.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from columnar_database_project_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    connected_components,
    lsh_candidate_pairs,
)


def _bk_df(spark, buckets: list[list[int]]):
    """(doc_id, band, band_key) rows: bucket i lives in band i % 4."""
    rows = [
        (doc, i % 4, f"key_{i}")
        for i, docs in enumerate(buckets)
        for doc in docs
    ]
    return spark.createDataFrame(rows, "doc_id bigint, band int, band_key string")


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def _components(spark, pairs: set[tuple[int, int]]) -> dict[int, int]:
    if not pairs:
        return {}
    pdf = spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a bigint, doc_b bigint"
    )
    return {r.doc_id: r.cluster_id for r in connected_components(pdf).collect()}


class TestLshCap:
    def test_default_is_finite(self):
        # The production default must bound hot buckets (VERDICT r8 #1).
        assert LSH_MAX_BUCKET is not None and LSH_MAX_BUCKET >= 2

    def test_star_fires_and_is_linear(self, spark):
        # One bucket of 6 docs, cap 3: expect the 5 star pairs from the
        # min-id keeper, not the 15-pair clique.
        bk = _bk_df(spark, [[10, 11, 12, 13, 14, 15]])
        capped = _pairs(lsh_candidate_pairs(bk, max_bucket=3))
        assert capped == {(10, b) for b in (11, 12, 13, 14, 15)}

    def test_untouched_corpus_is_exact(self, spark):
        # No bucket over the cap → capped output equals the clique form.
        rng = random.Random(9)
        buckets = [
            rng.sample(range(100), rng.randint(2, 4)) for _ in range(20)
        ]
        bk = _bk_df(spark, buckets)
        assert _pairs(lsh_candidate_pairs(bk, max_bucket=4)) == _pairs(
            lsh_candidate_pairs(bk, None)
        )

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_fuzz_subset_and_cluster_parity(self, spark, seed):
        # Random corpora with buckets straddling the cap: capped pairs
        # are a subset of uncapped pairs, and the keeper-star rewrite
        # preserves connected components exactly (same clusters → same
        # survivors).
        rng = random.Random(seed)
        cap = 4
        buckets = [
            rng.sample(range(200), rng.randint(2, 10)) for _ in range(25)
        ]
        bk = _bk_df(spark, buckets)
        capped = _pairs(lsh_candidate_pairs(bk, max_bucket=cap))
        uncapped = _pairs(lsh_candidate_pairs(bk, None))
        assert capped <= uncapped
        assert any(len(b) > cap for b in buckets)  # the star path fired
        assert capped < uncapped  # ...and actually linearized something
        assert _components(spark, capped) == _components(spark, uncapped)

    def test_duplicate_doc_band_rows_do_not_inflate(self, spark):
        # collect_set semantics: a doc listed twice in a bucket is one
        # member; count-based big-key detection must agree. With the
        # dup row, naive count(*)=4 > cap=3 but the distinct bucket is
        # 3 docs — either path must yield the same 3 pairs here because
        # star-of-3 ∪ nothing vs clique-of-3 only differ beyond size 3.
        bk = _bk_df(spark, [[1, 1, 2, 3]])
        capped = _pairs(lsh_candidate_pairs(bk, max_bucket=3))
        uncapped = _pairs(lsh_candidate_pairs(bk, None))
        assert uncapped == {(1, 2), (1, 3), (2, 3)}
        assert capped <= uncapped
        assert _components(spark, capped) == _components(spark, uncapped)
