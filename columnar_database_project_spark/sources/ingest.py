"""Raw-corpus ingestion: JSONL document drops → normalized parquet
microblocks.

The reference engine only ever reads parquet it was handed
(SURVEY §2.1); a real pretraining pipeline starts one step earlier —
crawl/partner drops arrive as JSONL. This module is that entry path,
built for the 100 TB case:

- **Explicit schema, never inference**: ``inferSchema`` makes Spark
  scan the data twice and silently unions drifting types across files;
  the documents contract is fixed, so ingestion declares it.
- **PERMISSIVE with corrupt-record routing**: one mangled line in a
  TB-sized drop must quarantine THAT line, not kill the job or
  (worse) silently vanish.
- **Normalization before write**: types coerced, ``n_chars``
  backfilled from the text when the producer omitted it, so every
  downstream operator sees the same contract as the curated tables.
- **Microblock layout out**: blocks are the unit of the cache /
  prefetch / index subsystems, so ingestion writes through
  ``MicroBlockWriter`` (one row group per file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_database_project_spark.sources.microblock import MicroBlockWriter

CORRUPT_COL = "_corrupt_record"

# The documents contract (matches testdata documents.parquet exactly).
DOCUMENTS_INGEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL document drop with the declared contract schema.

    PERMISSIVE mode parses what it can and routes unparseable lines
    into ``_corrupt_record`` — split downstream by ``split_corrupt``.
    """
    return (
        spark.read.schema(DOCUMENTS_INGEST_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): rows with a populated corrupt-record column
    are quarantined verbatim for offline triage; good rows drop the
    carrier column.

    Call this on the PARSED (staged) frame, not directly on the JSON
    scan: Spark disallows plans whose raw-JSON scan references only
    the corrupt column (each such query would re-parse the raw text).
    ``ingest_documents_jsonl`` therefore stages the parse once as
    parquet — the bronze/silver pattern — and splits from there."""
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def normalize_documents(docs: DataFrame) -> DataFrame:
    """Enforce the documents contract on parsed rows: required fields
    present, ``n_chars`` backfilled from the text when the producer
    omitted it, empty-text rows dropped. Pure scan-local column work."""
    return (
        docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .withColumn(
            "n_chars",
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
        )
        .withColumn("lang", F.coalesce(F.col("lang"), F.lit("und")))
        .withColumn("source", F.coalesce(F.col("source"), F.lit("unknown")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def ingest_documents_jsonl(
    spark: SparkSession,
    src: str,
    dst: str,
    block_rows: int | None = None,
) -> dict:
    """JSONL drop → normalized documents microblocks at ``dst``.

    Bronze/silver shape: the raw text is parsed EXACTLY ONCE into a
    columnar staging table (``dst + "_staging"``, all columns incl.
    the corrupt-record carrier), and every downstream step — the
    good/quarantine split, normalization, counts — reads the staging
    parquet, never the raw JSON again. At 100 TB re-parsing raw text
    per consumer is the dominant cost (and Spark's analyzer outright
    rejects corrupt-column-only queries against the raw scan for that
    reason); one parse + cheap columnar re-reads is the production
    pattern. Quarantined lines land verbatim at ``dst +
    "_quarantine"`` for offline triage.

    Returns counts {"rows": good, "quarantined": bad} — the numbers an
    ingestion job must report."""
    staging = dst.rstrip("/") + "_staging"
    read_documents_jsonl(spark, src).write.mode("overwrite").parquet(staging)
    parsed = spark.read.parquet(staging)
    good, quarantine = split_corrupt(parsed)
    normalized = normalize_documents(good)
    writer = MicroBlockWriter(**({"block_rows": block_rows} if block_rows else {}))
    writer.write(normalized, dst)
    quarantine.write.mode("overwrite").parquet(dst.rstrip("/") + "_quarantine")
    return {"rows": normalized.count(), "quarantined": quarantine.count()}


def read_documents_csv(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True
) -> DataFrame:
    """CSV variant of the document-drop reader: same declared contract
    schema (headers are NOT trusted for types — inference on a 100 TB
    drop means a second full scan and silent type drift), PERMISSIVE
    parse with the same corrupt-record routing, so
    ``ingest_documents_csv`` shares the bronze/silver path."""
    return (
        spark.read.schema(DOCUMENTS_INGEST_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def ingest_documents_csv(
    spark: SparkSession,
    src: str,
    dst: str,
    block_rows: int | None = None,
    sep: str = ",",
) -> dict:
    """CSV drop → normalized documents microblocks (same staged
    single-parse + quarantine shape as ``ingest_documents_jsonl``)."""
    staging = dst.rstrip("/") + "_staging"
    read_documents_csv(spark, src, sep=sep).write.mode("overwrite").parquet(
        staging
    )
    parsed = spark.read.parquet(staging)
    good, quarantine = split_corrupt(parsed)
    normalized = normalize_documents(good)
    writer = MicroBlockWriter(**({"block_rows": block_rows} if block_rows else {}))
    writer.write(normalized, dst)
    quarantine.write.mode("overwrite").parquet(dst.rstrip("/") + "_quarantine")
    return {"rows": normalized.count(), "quarantined": quarantine.count()}


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC variant of the document-drop reader. ORC is already typed
    and self-describing, so there is no corrupt-record carrier —
    schema enforcement happens structurally (missing columns surface
    as nulls via the contract select in ``normalize_documents``;
    type mismatches fail fast at scan time, which is the correct
    behavior for a typed columnar drop)."""
    df = spark.read.orc(path)
    for field in DOCUMENTS_INGEST_SCHEMA.fields:
        if field.name == CORRUPT_COL:
            continue
        if field.name not in df.columns:
            df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    return df


def ingest_documents_orc(
    spark: SparkSession,
    src: str,
    dst: str,
    block_rows: int | None = None,
) -> dict:
    """ORC drop → normalized documents microblocks. No staging step:
    ORC is already columnar, so re-reads are cheap and there is no
    one-parse-only constraint (that exists for raw-text formats) —
    the contract normalize runs straight off the scan. Rows failing
    the contract (null id/text) are quarantined as parquet, mirroring
    the JSONL/CSV shape so downstream triage is format-agnostic."""
    parsed = read_documents_orc(spark, src)
    normalized = normalize_documents(parsed)
    quarantine = parsed.filter(
        F.col("doc_id").isNull() | F.col("text").isNull()
    )
    writer = MicroBlockWriter(**({"block_rows": block_rows} if block_rows else {}))
    writer.write(normalized, dst)
    quarantine.write.mode("overwrite").parquet(dst.rstrip("/") + "_quarantine")
    return {"rows": normalized.count(), "quarantined": quarantine.count()}
