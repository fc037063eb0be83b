"""Bucketed co-located join: assert the fact-to-fact join plans with
ZERO shuffle exchanges (the layout carries the partitioning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import load_table
from columnar_database_project_spark.plans.verify import count_shuffles
from columnar_database_project_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, str(base / "li"))
    write_bucketed(orders, "ord_bucketed", "l_orderkey", 8, str(base / "ord"))
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


class TestBucketedJoin:
    def test_join_is_shuffle_free(self, spark, bucketed_tables):
        left, right = bucketed_tables
        joined = bucketed_join(spark, left, right, "l_orderkey")
        agg = joined.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
        # join itself: no Exchange (bucket layout provides partitioning);
        # the follow-up groupBy on the SAME key also reuses it
        assert count_shuffles(joined) == 0
        assert count_shuffles(agg) == 0

    def test_join_result_correct(self, spark, sf_dir, bucketed_tables):
        left, right = bucketed_tables
        n_bucketed = bucketed_join(spark, left, right, "l_orderkey").count()
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        n_plain = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        assert n_bucketed == n_plain > 0
