"""Bucketed tables — shuffle-free co-located joins.

The reference is single-file/single-table and has no notion of
physical co-location; at 100 TB the dominant cost of fact-to-fact
joins (lineitem ⋈ orders) is the shuffle. Bucketing both tables on the
join key at write time lets Spark's SortMergeJoin read bucket-aligned
splits with NO Exchange on either side — the partitioning is baked
into the layout. This module writes/registers bucketed copies and is
asserted shuffle-free in tests via plans.verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    ``path`` makes it an external table (keeps test warehouses in
    tmp dirs). Sorting within buckets lets SortMergeJoin skip the
    per-task sort as well.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two bucketed tables on their bucket column — planned
    without a shuffle when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on)
