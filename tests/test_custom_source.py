"""Custom Python DataSource: schema, partition planning, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.sources import custom


def _load(spark, n_docs=200, n_partitions=5):
    custom.register(spark)
    return (spark.read.format("synthetic_corpus")
            .option("n_docs", n_docs)
            .option("n_partitions", n_partitions).load())


def test_schema_rows_and_partitions(spark):
    df = _load(spark)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text"]
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 5
    # exactly the ids 0..199, once each
    assert df.agg(F.count_distinct("doc_id")).collect()[0][0] == 200


def test_reads_are_deterministic(spark):
    a = {(r["doc_id"], r["text"]) for r in _load(spark).collect()}
    b = {(r["doc_id"], r["text"]) for r in
         _load(spark, n_partitions=3).collect()}
    assert a == b  # content independent of partitioning


def test_composes_with_engine_operators(spark):
    from cloud_native_mapreduce_spark.functions.text import word_count
    wc = word_count(_load(spark))
    rows = {r["word"]: r["cnt"] for r in wc.collect()}
    assert set(rows) <= set(custom._WORDS)
    assert sum(rows.values()) > 0
