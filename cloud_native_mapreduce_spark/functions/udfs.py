"""User-function registration surface: scalar pandas UDFs and Python
UDTFs, callable from SQL.

This is the engine-native successor of the reference's entire query
language — arbitrary user Python over the data (SURVEY.md §2.1). The
reference ships code as stdin/stdout scripts (covered by
`cloud_native_mapreduce_spark.mapreduce`); the native surface here is:
  * scalar vectorized UDFs (`pandas_udf`, Arrow batches, 10-100× the
    row-at-a-time Python UDF) registered into the SQL catalog;
  * Python UDTFs (table functions) consuming and producing relations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import WORD_RE
from cloud_native_mapreduce_spark.sources.tables import load_table


def register_udfs(spark: SparkSession) -> None:
    """Register the engine's SQL-callable user functions. Idempotent."""
    import re

    token_re = re.compile(WORD_RE)

    @F.pandas_udf("bigint")
    def tok_count(text: pd.Series) -> pd.Series:
        # vectorized over the Arrow batch; regex in Python mirrors the
        # reference mapper exactly (client/scripts/mapper.py:13)
        return text.fillna("").map(
            lambda t: len(token_re.findall(t.lower())))

    spark.udf.register("tok_count", tok_count)


def udf_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts through a REGISTERED pandas UDF invoked
    from SQL — exercises catalog registration, Arrow transfer, and the
    SQL entry point in one query."""
    register_udfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "cnms_documents_udf")
    return spark.sql("""
        SELECT doc_id, tok_count(text) AS n_tokens
        FROM cnms_documents_udf
    """)


def udtf_word_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequency through a Python UDTF (user table function): each
    input row expands to (word) rows — the reference mapper's flatMap
    contract as a first-class SQL relation — then a plain aggregate."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class WordSplit:
        def __init__(self) -> None:
            self._re = re.compile(WORD_RE)

        def eval(self, text: str):  # noqa: A002 - UDTF contract
            if text:
                for w in self._re.findall(text.lower()):
                    yield (w,)

    spark.udtf.register("cnms_word_split", WordSplit)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cnms_documents_udtf")
    return spark.sql("""
        SELECT t.word, count(*) AS cnt
        FROM cnms_documents_udtf d,
             LATERAL cnms_word_split(d.text) t
        GROUP BY t.word
    """)
