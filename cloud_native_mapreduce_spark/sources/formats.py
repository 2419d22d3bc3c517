"""Row-format sources/sinks beyond parquet: CSV and JSON Lines.

Reference parity note (SURVEY.md §2 S3): the reference's only format is
newline-delimited text in blob storage; its output contract is TSV lines.
An engine users can switch to also needs the interchange formats every
pipeline meets in practice — delimited text with schema, and JSONL.
Both are Spark built-ins; what this module pins down is the ROUND-TRIP
contract: write → read with explicit schema must be lossless for the
driver tables (the oracle then checks the read-back result against the
original parquet).

Scale posture: CSV/JSON are row formats — no column pruning, no
predicate pushdown, no min/max skipping. The loaders here exist for
interchange; steady-state 100 TB storage should convert to parquet at
ingest (one `df.write.parquet` away).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from cloud_native_mapreduce_spark.sources.tables import load_table

#: timestamp layout used for CSV round-trips — second precision is enough
#: for the driver tables (dates); sub-second data would use a finer fmt.
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (df.write.mode(mode)
       .option("header", "true")
       .option("timestampFormat", _TS_FMT)
       .csv(path))


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-first CSV read — NEVER inferSchema in production paths
    (inference is an extra full scan and type-unstable across files)."""
    return (spark.read
            .option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .schema(schema)
            .csv(path))


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def _staging_dir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"cnms_{tag}_")


def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV → back; the read-back rows ARE the query result, so
    the oracle (reading the original parquet) proves losslessness."""
    nation = load_table(spark, sf_dir, "nation")
    stage = os.path.join(_staging_dir("csv"), "nation")
    write_csv(nation, stage)
    return read_csv(spark, stage, nation.schema)


def jsonl_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSON Lines → back (schema-first read)."""
    supplier = load_table(spark, sf_dir, "supplier")
    stage = os.path.join(_staging_dir("jsonl"), "supplier")
    write_jsonl(supplier, stage)
    return read_jsonl(spark, stage, supplier.schema)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def orc_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → back. ORC keeps the columnar properties parquet has
    (pruning, pushdown, stripe-level min/max), so unlike CSV/JSONL it is
    a legitimate steady-state storage format, not just interchange."""
    part = load_table(spark, sf_dir, "part")
    stage = os.path.join(_staging_dir("orc"), "part")
    write_orc(part, stage)
    return read_orc(spark, stage)


def partitioned_events_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning: events written
    `partitionBy(event_type)`, then read back filtered to one type. The
    scan's PartitionFilters prune to a single directory — at 100 TB the
    query reads 1/N of the files before any row is decoded. The layout is
    written once per (process, sf_dir) and reused.

    The partition column comes back as a directory-derived string, so it
    is re-selected explicitly to keep the driver-facing schema identical
    to the source table's.
    """
    events = load_table(spark, sf_dir, "events")
    tag = sf_dir.strip("/").replace("/", "_")
    stage = os.path.join(tempfile.gettempdir(), f"cnms_evpart_{tag}")
    marker = os.path.join(stage, "_SUCCESS" )
    if not os.path.exists(marker):
        events.write.mode("overwrite").partitionBy("event_type").parquet(stage)
    from pyspark.sql import functions as F
    return (spark.read.parquet(stage)
            .where(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .orderBy("user_id"))
