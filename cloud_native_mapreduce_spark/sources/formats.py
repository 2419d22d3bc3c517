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
from pyspark.sql import functions as F

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
                 F.round(F.sum("value"), 2).alias("total_value")))


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: an OLD-schema partition (doc_id,
    n_chars) and an EVOLVED partition adding a `lang` column land in
    the same dataset directory; `mergeSchema=true` reconciles them
    (old files surface NULL for the added column) — the
    append-only-dataset reality every long-lived 100 TB table hits.
    The split is deterministic (doc_id parity) so the oracle replays
    the union-by-name semantics from the source table without
    touching the files. Emits per-lang counts with the NULL bucket =
    the old partition.

    Scale note: mergeSchema footer reconciliation reads every file's
    footer at planning time — production tables register the merged
    schema in a catalog instead; the READ semantics pinned here are
    identical either way."""
    import pyspark.sql.functions as F
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="schema_evo_")
    (docs.where(F.col("doc_id") % 2 == 0)
     .select("doc_id", "n_chars")
     .write.mode("overwrite").parquet(os.path.join(out, "p=0")))
    (docs.where(F.col("doc_id") % 2 == 1)
     .select("doc_id", "n_chars",
             F.concat(F.lit("lang_"), (F.col("doc_id") % 3)
                      .cast("string")).alias("lang"))
     .write.mode("overwrite").parquet(os.path.join(out, "p=1")))
    merged = spark.read.option("mergeSchema", "true") \
        .parquet(os.path.join(out, "p=0"), os.path.join(out, "p=1"))
    return (merged.groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars"))
            .orderBy(F.col("lang").asc_nulls_first()))


def corrupt_records_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust JSONL ingestion with a dead-letter lane: a dataset with
    deterministically planted corrupt lines (every 13th record loses
    its closing brace) read in PERMISSIVE mode with
    `columnNameOfCorruptRecord` — parseable rows flow through, broken
    ones land whole in the corrupt column instead of killing the job
    (FAILFAST) or vanishing (DROPMALFORMED): the quarantine pattern
    production ingestion needs, since at 100 TB some upstream writer
    is always mid-crash. Emits the good/quarantined split and exact
    stats over the GOOD lane only; the planted corruption is
    formula-deterministic so the oracle replays it from the source
    table."""
    import pyspark.sql.functions as F
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="corrupt_ingest_")
    line = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
                 F.lit(', "n_chars": '))  # truncated mid-object
    ).otherwise(
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
                 F.lit(', "n_chars": '),
                 F.col("n_chars").cast("string"), F.lit("}")))
    docs.select(line.alias("value")).write.mode("overwrite").text(out)
    parsed = (spark.read.schema(
        "doc_id bigint, n_chars bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(out))
    return parsed.agg(
        F.sum(F.col("_bad").isNull().cast("int")).cast("bigint")
        .alias("n_good"),
        F.sum(F.col("_bad").isNotNull().cast("int")).cast("bigint")
        .alias("n_quarantined"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("n_chars")))
        .cast("bigint").alias("sum_chars_good"))


def fixed_width_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (COBOL-copybook style) text ingestion: orders are
    serialized to a 60-byte record layout — zero-padded numerics, an
    IMPLIED-2-decimal price field (no decimal point, the PIC 9(12)V99
    convention), yyyyMMdd date, space-padded text — REALLY written to
    disk, then read back with `spark.read.text` + pure-substring
    column carving into typed columns. The mainframe-extract format
    every enterprise lake still lands, and the one ingestion family
    (after csv/jsonl/orc/parquet/custom-datasource) the repo lacked.

    Record layout (1-based): orderkey 1-12, custkey 13-22, status 23,
    price-cents 24-37, date 38-45, priority 46-60. The layout is
    deterministic from the source table, so the oracle REPLAYS the
    aggregate from base columns — round-trip losslessness is exactly
    what the value match proves (zero-pad → cast, implied decimal →
    integer cents, space-pad → trim, yyyyMMdd → date all invert).

    Scale shape: text source splits by line; substring carving is
    whole-stage-codegen'd JVM work (no regex, no UDF); one map-side
    combined aggregate after.

    Unrepresentable values fail LOUDLY instead of corrupting:
    Spark's lpad/rpad silently TRUNCATE overlong input (the record
    stays 60 bytes but the value is destroyed), a multi-char status
    would shift every later field, and a priority with trailing
    spaces round-trips to a different string under trim — so the
    encoder asserts per-field representability (widths, 1-char
    status, trim-stable priority) before writing: the fixed-width
    analogue of `corrupt_records_ingest` refusing to let a torn
    writer poison the lake."""
    import pyspark.sql.functions as F
    orders = load_table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="fixed_width_")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 10, "0"),
        F.col("o_orderstatus"),
        F.lpad(cents.cast("string"), 14, "0"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyyMMdd"),
        F.rpad(F.col("o_orderpriority"), 15, " "))
    unrepresentable = (
        (F.length(F.col("o_orderkey").cast("string")) > 12)
        | (F.length(F.col("o_custkey").cast("string")) > 10)
        | (F.length(F.col("o_orderstatus")) != 1)
        | (F.length(cents.cast("string")) > 14)
        | (F.length(F.col("o_orderpriority")) > 15)
        | (F.col("o_orderpriority")
           != F.trim(F.col("o_orderpriority"))))
    bad = orders.where(unrepresentable).limit(1).count()
    if bad:
        raise ValueError(
            "fixed-width encode: a value does not fit its layout "
            "field (lpad/rpad would silently truncate, a non-1-char "
            "status would shift the record, a space-padded priority "
            "would not round-trip) — refusing to write a corrupt "
            "file")
    orders.select(line.alias("value")).write.mode("overwrite").text(out)
    rec = spark.read.text(out).select(
        F.substring("value", 1, 12).cast("bigint").alias("orderkey"),
        F.substring("value", 13, 10).cast("bigint").alias("custkey"),
        F.substring("value", 23, 1).alias("status"),
        F.substring("value", 24, 14).cast("bigint").alias("cents"),
        F.to_date(F.substring("value", 38, 8), "yyyyMMdd").alias("day"),
        F.trim(F.substring("value", 46, 15)).alias("priority"))
    return (rec.groupBy("status")
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.sum("cents").cast("bigint").alias("sum_cents"),
                 F.countDistinct("priority").cast("bigint")
                 .alias("n_priorities"),
                 F.date_format(F.min("day"), "yyyy-MM-dd")
                 .alias("first_day"),
                 F.date_format(F.max("day"), "yyyy-MM-dd")
                 .alias("last_day"))
            .orderBy("status"))


def encoding_advisor(lineitem: DataFrame) -> DataFrame:
    """Columnar-encoding advisor — the storage-layout pass a
    warehouse runs before (re)writing a big table: per column,
    distinct ratio and mode share decide DICTIONARY / RLE-DICT /
    PLAIN (the parquet encoding heuristics, made explicit and
    auditable instead of buried in writer defaults).

    One scan UNPIVOTS the profiled columns (numerics as exact
    doubles, strings as-is, dates as epoch days — never
    double→string casts, whose spelling is engine-specific) into a
    (column, value) stream; per-column value counts are map-side
    combined and every statistic after is |columns × values|-bounded.
    Ratios are integer basis points (DIV); the recommendation is a
    CASE over integers. Output: one row per profiled column."""
    num = lineitem.select(F.expr(
        "stack(4, 'l_quantity', CAST(l_quantity AS DOUBLE), "
        "'l_extendedprice', CAST(l_extendedprice AS DOUBLE), "
        "'l_partkey', CAST(l_partkey AS DOUBLE), "
        "'l_shipdate', CAST(datediff(to_date(l_shipdate), "
        "DATE '1970-01-01') AS DOUBLE)) AS (col, v)"))
    txt = lineitem.select(F.expr(
        "stack(2, 'l_returnflag', l_returnflag, "
        "'l_linestatus', l_linestatus) AS (col, s)"))

    def stats(df, val):
        per_val = (df.groupBy("col", val)
                   .agg(F.count(F.lit(1)).alias("c")))
        return (per_val.groupBy("col")
                .agg(F.sum("c").alias("n"),
                     F.count(F.lit(1)).alias("n_distinct"),
                     F.max("c").alias("top1")))
    st = stats(num, "v").unionByName(stats(txt, "s"))
    rec = ("CASE WHEN n_distinct <= 64 THEN 'RLE_DICT' "
           "WHEN (n_distinct * 10000) DIV n <= 500 THEN 'DICT' "
           "ELSE 'PLAIN' END")
    return st.select(
        F.col("col").alias("column_name"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.expr("(n_distinct * 10000) DIV n").cast("bigint")
        .alias("distinct_bp"),
        F.expr("(top1 * 10000) DIV n").cast("bigint").alias("top1_bp"),
        F.expr(rec).alias("recommendation"))


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              mode: str = "overwrite") -> None:
    """Native XML sink (built into Spark since 4.0 — the former
    spark-xml package promoted to a first-class source)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag) \
        .save(path)


def read_xml(spark: SparkSession, path: str, schema,
             row_tag: str = "row") -> DataFrame:
    """Schema-first XML read (schema-first for the same reason as
    CSV/JSONL: inference is a second full pass AND type-lossy —
    an all-digit VARCHAR column comes back BIGINT)."""
    return (spark.read.format("xml").option("rowTag", row_tag)
            .schema(schema).load(path))


def xml_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → XML (rowTag elements) → back, lossless — the
    interchange format enterprise feeds still arrive in; column
    order is re-projected after the read because XML readers return
    fields alphabetically, not in element order."""
    region = load_table(spark, sf_dir, "region")
    stage = os.path.join(_staging_dir("xml"), "region")
    write_xml(region, stage)
    return read_xml(spark, stage, region.schema) \
        .select(*region.columns)
