"""Microblock writer / converter — block-granular Parquet layout.

The reference writes 16,384-row row groups (reference
microblock_writer.py:4-17, parquet_to_microblocks.py:11) so its
block-level cache/prefetch can address small units. On Spark, the
architectural decision (SURVEY §7) is **block = file**: one
row-group-sized parquet FILE per block via ``maxRecordsPerFile``,
because Spark's observability (input splits, persisted datasets,
listeners) is file-granular. This makes block identity first-class for
the cache/prefetch/logging subsystems while remaining a plain parquet
directory any engine can read.

The reference's own benchmark note — "optimal row group size 100k-1M
rows; 16k row groups have overhead" (reference benchmark2.py:242-243)
— is preserved as the tunable ``block_rows`` default of 131_072 for
scan-oriented tables, with 16_384 available for cache-oriented parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_database_project_spark.sources.index import MicroBlockIndex

REFERENCE_BLOCK_ROWS = 16_384    # reference microblock_writer.py:5
DEFAULT_BLOCK_ROWS = 131_072     # reference benchmark2.py:242-243 guidance
ROW_ID_COL = "_rid"


class MicroBlockWriter:
    """Write a DataFrame as a directory of block-sized columnar files.

    ``format``: ``"parquet"`` (default) or ``"orc"`` — the two
    columnar layouts the reference's approach line names
    (BASELINE "columnar Parquet/ORC"). Block = file holds for both:
    ``maxRecordsPerFile`` is a format-independent write conf, and the
    per-format row-group/stripe size is set large so each file is one
    scan unit."""

    def __init__(
        self,
        block_rows: int = DEFAULT_BLOCK_ROWS,
        compression: str = "snappy",
        format: str = "parquet",
    ) -> None:
        if format not in ("parquet", "orc"):
            raise ValueError(f"unsupported microblock format: {format!r}")
        self.block_rows = block_rows
        self.compression = compression
        self.format = format

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        """One row group (parquet) / stripe (orc) per file,
        ``block_rows`` rows per block.

        ``parquet.block.size`` / ``orc.stripe.size`` is set large so
        each file holds exactly one scan unit; ``maxRecordsPerFile``
        caps the rows per file. Partition count determines write
        parallelism — each task emits ⌈task_rows / block_rows⌉ blocks.
        """
        w = (
            df.write.mode(mode)
            .option("maxRecordsPerFile", self.block_rows)
            .option("compression", self.compression)
        )
        if self.format == "orc":
            w.option("orc.stripe.size", 1 << 30).orc(path)
        else:
            w.option("parquet.block.size", 1 << 30).parquet(path)

    def convert(self, spark: SparkSession, src: str, dst: str) -> None:
        """Rewrite any parquet source into microblock layout (reference
        parquet_to_microblocks.py:11)."""
        self.write(spark.read.parquet(src), dst)


def build_index(path: str, table_id: str = "t1") -> MicroBlockIndex:
    """Footer-scan a microblock directory (or any parquet file) into a
    MicroBlockIndex."""
    return MicroBlockIndex.build(path, table_id=table_id)


def read_block(spark: SparkSession, index: MicroBlockIndex, block_id: int) -> DataFrame:
    """Load exactly one block as a DataFrame (the block = file mapping
    makes this a single-file scan — the Spark analog of
    ``pf.read_row_group`` in reference query_enginev5.py:278-282)."""
    return spark.read.parquet(index.block_file(block_id))


def write_with_row_ids(
    df: DataFrame,
    path: str,
    order_by: list[str],
    block_rows: int = DEFAULT_BLOCK_ROWS,
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> None:
    """Write a microblock layout with an explicit global row-id column
    (0-based, dense, ordered by ``order_by``).

    This makes the reference's row-range scan (S8 —
    ``MicroBlockReader.scan_range``, broken in the reference:
    microblock_reader.py:8-19 calls methods that never existed) a
    first-class, *pruned* operation: the row id is a physically sorted
    column, so a BETWEEN filter on it prunes to exactly the covering
    blocks via ordinary zone maps.

    Scale path — no global window, no single-task sort:

    1. range-partition by ``order_by`` (global order across
       partitions) and sort within each partition,
    2. persist, then count rows per partition (tiny agg → driver),
    3. assign ``_rid = partition_offset + local_index`` with a narrow
       Arrow-batched map — zero additional shuffles, parallel write.

    The persist pins the range partitioning so the count pass and the
    id-assignment pass see identical partitions.
    """
    import numpy as np
    from pyspark import StorageLevel, TaskContext
    from pyspark.sql import types as T

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_by])
        .sortWithinPartitions(*order_by)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        sizes = {
            r["pid"]: r["n"]
            for r in sorted_df.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in range(max(sizes, default=-1) + 1):
            offsets[pid] = acc
            acc += sizes.get(pid, 0)

        out_schema = T.StructType(
            sorted_df.schema.fields + [T.StructField(ROW_ID_COL, T.LongType())]
        )

        def assign(iterator):
            ctx = TaskContext.get()
            nxt = offsets.get(ctx.partitionId() if ctx else 0, 0)
            for pdf in iterator:
                pdf[ROW_ID_COL] = np.arange(nxt, nxt + len(pdf), dtype="int64")
                nxt += len(pdf)
                yield pdf

        with_rid = sorted_df.mapInPandas(assign, schema=out_schema)
        MicroBlockWriter(block_rows=block_rows).write(with_rid, path, mode=mode)
    finally:
        sorted_df.unpersist()


def scan_range(
    spark: SparkSession, path: str, row_start: int, row_end: int
) -> DataFrame:
    """Rows with row_start <= _rid <= row_end (inclusive), reference
    S8 semantics. The filter reaches the parquet scan, so only blocks
    whose _rid zone maps intersect the range are read."""
    return spark.read.parquet(path).filter(
        F.col(ROW_ID_COL).between(row_start, row_end)
    )


def block_count(path: str) -> int:
    files = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") or (f.startswith("part-") and "crc" not in f)
    ]
    return len(files)


def compact_blocks(
    spark: SparkSession,
    path: str,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    min_fill: float = 0.5,
    sort_by: list[str] | None = None,
) -> dict:
    """Compact a microblock directory whose blocks have fragmented
    below ``min_fill * block_rows`` rows — the small-file problem every
    incrementally-ingested table develops (each drop writes its own
    tail block; at 100 TB a table ingested in 10k drops carries 10k
    undersized files whose per-file open/footer/task overhead dominates
    scans).

    Idempotent and conservative: if no block is under the fill
    threshold, nothing is rewritten. Otherwise the WHOLE table is
    rewritten through ``MicroBlockWriter`` into a staging directory,
    row-count-verified against the source, and swapped in via two
    renames. The swap is NOT a single atomic operation (POSIX has no
    two-directory exchange): a crash between the renames leaves no
    table at ``path`` — but the pre-swap copy is retained at
    ``<path>.compact_old`` until the swapped-in table is verified, so
    no data is ever lost. Recovery after a crash: if ``path`` is
    missing and ``<path>.compact_old`` exists, restore it with
    ``recover_compaction(path)`` (also clears stale ``.compact_tmp``
    / ``.compact_old`` leftovers on healthy state; crash-simulation
    test in tests/test_round6.py). Block identity changes on
    compaction by design — callers holding a ``MicroBlockIndex``
    rebuild it from the new footers (cheap driver-side metadata scan).

    ``sort_by``: optionally re-cluster while compacting.
    Interleaved/out-of-order ingests spread every key range across
    every block, so zone maps (and parquet row-group stats) stop
    excluding anything; a plain coalesce-compaction PRESERVES that
    damage forever. With ``sort_by`` the rewrite range-partitions on
    the keys and sorts within partitions — one opt-in shuffle that
    restores tight per-block min/max, i.e. the layout
    ``bench_layout_pruning`` measures at 3/47 blocks for a 5% window.

    Returns {"compacted": bool, "blocks_before": n, "blocks_after": m}.
    """
    import shutil

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    if not files:
        return {"compacted": False, "blocks_before": 0, "blocks_after": 0}
    import pyarrow.parquet as pq

    n_before = len(files)
    undersized = sum(
        1
        for f in files
        if pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        < block_rows * min_fill
    )
    if undersized <= 1:  # a single tail block is the expected remainder
        return {
            "compacted": False,
            "blocks_before": n_before,
            "blocks_after": n_before,
        }
    staging = path.rstrip("/") + ".compact_tmp"
    shutil.rmtree(staging, ignore_errors=True)
    df = spark.read.parquet(path)
    # coalesce (no shuffle) down to ~one task per target block:
    # maxRecordsPerFile enforces the block size, the task count only
    # sets write parallelism — at cluster scale this is a pure
    # scan+rewrite with no exchange.
    n_rows = df.count()
    n_tasks = max(1, n_rows // block_rows + 1)
    if sort_by:
        df = df.repartitionByRange(n_tasks, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.coalesce(n_tasks)
    MicroBlockWriter(block_rows=block_rows).write(df, staging)
    # verify the staging copy BEFORE touching the live table (footer
    # metadata only — no data read)
    staged_rows = sum(
        pq.ParquetFile(os.path.join(staging, f)).metadata.num_rows
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    if staged_rows != n_rows:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compaction aborted: staging has {staged_rows} rows, "
            f"source has {n_rows}; original table untouched"
        )
    old = path.rstrip("/") + ".compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    # the .compact_old backup outlives the swap until the new table is
    # verified in place — the recovery point the docstring documents
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    if n_after > 0:
        shutil.rmtree(old)
    return {
        "compacted": True,
        "blocks_before": n_before,
        "blocks_after": n_after,
    }


def recover_compaction(path: str) -> dict:
    """The crash-recovery procedure ``compact_blocks``'s docstring
    documents, as a callable (run it before opening any table — it is
    a cheap no-op on healthy state):

    - live table present → stale ``.compact_tmp`` / ``.compact_old``
      are leftovers of an interrupted run AFTER the point of no data
      loss; delete them.
    - live table MISSING and ``.compact_old`` present → the crash hit
      between the two swap renames; restore the backup with one
      rename. A ``.compact_tmp`` still present alongside was verified
      row-count-equal before the swap began, but the backup is the
      conservative choice (it is the exact pre-compaction bytes).

    Returns {"state": "healthy" | "restored" | "missing",
    "cleaned": [...]} — "missing" means neither live nor backup
    exists, which recovery cannot invent."""
    import shutil

    tmp = path.rstrip("/") + ".compact_tmp"
    old = path.rstrip("/") + ".compact_old"
    cleaned: list[str] = []
    if os.path.isdir(path):
        for stale in (tmp, old):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
                cleaned.append(os.path.basename(stale))
        return {"state": "healthy", "cleaned": cleaned}
    if os.path.isdir(old):
        os.rename(old, path)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
            cleaned.append(os.path.basename(tmp))
        return {"state": "restored", "cleaned": cleaned}
    return {"state": "missing", "cleaned": cleaned}


Z_BITS = 16   # bucket resolution per dimension (2 dims → 32-bit z key)


def zorder_key(col_a, col_b, bounds: tuple) -> "F.Column":
    """Interleaved-bit (Morton) key over two numeric columns, each
    scaled to a ``Z_BITS``-bit bucket within its [min, max] bounds.
    Pure bitwise/arithmetic column expressions — whole-stage codegen,
    no UDF. ``bounds`` = (min_a, max_a, min_b, max_b), computed once
    driver-side (1-row agg — control plane, like the reference's
    footer stats pass)."""
    min_a, max_a, min_b, max_b = bounds
    top = (1 << Z_BITS) - 1

    def bucket(c, lo, hi):
        span = float(hi - lo) or 1.0
        return F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((c.cast("double") - float(lo)) / span * top).cast("long"),
            ),
        )

    ba, bb = bucket(col_a, min_a, max_a), bucket(col_b, min_b, max_b)
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    num_partitions: int | None = None,
) -> None:
    """Write a microblock layout Z-ORDERED on two numeric columns, so
    zone-map pruning stays selective for box predicates on EITHER or
    BOTH columns — single-column sorting only ever helps one dimension.
    The Morton curve keeps spatially-close (a, b) pairs in the same
    blocks, so each block covers a small rectangle of the value space
    and min/max stats become tight on both columns simultaneously —
    the same technique Delta/Iceberg expose as OPTIMIZE ZORDER.

    Scale shape: one 1-row bounds agg, one range shuffle on the z key,
    per-partition sort, parallel block write — identical cost to any
    globally-sorted write.
    """
    a, b = cols
    spark = df.sparkSession
    r = df.agg(
        F.min(a).alias("la"), F.max(a).alias("ha"),
        F.min(b).alias("lb"), F.max(b).alias("hb"),
    ).first()
    z = zorder_key(F.col(a), F.col(b), (r["la"], r["ha"], r["lb"], r["hb"]))
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    zdf = (
        df.withColumn("_z", z)
        .repartitionByRange(n_parts, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")   # narrow projection — preserves the sort order
    )
    MicroBlockWriter(block_rows=block_rows).write(zdf, path)


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> None:
    """Hive-style partitioned microblock layout (``path/col=value/...``)
    — the third pruning mechanism next to zone maps and Z-order:
    a filter on a partition column never LISTS the other directories,
    so pruning happens at metadata time before any footer is read.
    Right for low-cardinality routing columns (lang, source, date);
    wrong for high-cardinality keys (one directory per value — small
    files, listing storms). Blocks inside each partition still follow
    block=file."""
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("maxRecordsPerFile", block_rows)
        .option("parquet.block.size", 1 << 30)
        .parquet(path)
    )
