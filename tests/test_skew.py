"""Salted join: identical results to the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_database_project_spark.functions.skew import salted_join


class TestSaltedJoin:
    def test_matches_plain_join_on_skewed_data(self, spark):
        # 90% of fact rows share one hot key
        fact = spark.range(0, 5000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
        )
        plain = fact.join(dim, "k").select("k", "payload", "dim_val")
        salted = salted_join(fact, dim, "k").select("k", "payload", "dim_val")
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0

    def test_left_join_preserves_unmatched(self, spark):
        fact = spark.range(0, 100).select((F.col("id") % 150).alias("k"))
        dim = spark.range(0, 50).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        plain = fact.join(dim, "k", "left")
        salted = salted_join(fact, dim, "k", how="left")
        assert salted.count() == plain.count()
        assert (
            salted.filter(F.col("v").isNull()).count()
            == plain.filter(F.col("v").isNull()).count()
        )

    def test_refuses_outer_joins_that_would_duplicate(self, spark):
        """right/full outer would emit each unmatched small-side row
        once per salt — refused loudly instead of silently wrong."""
        import pytest

        fact = spark.range(0, 10).select((F.col("id") % 5).alias("k"))
        dim = spark.range(0, 8).select(F.col("id").alias("k"))
        for how in ("right", "full", "full_outer", "outer"):
            with pytest.raises(ValueError, match="duplicate"):
                salted_join(fact, dim, "k", how=how)
