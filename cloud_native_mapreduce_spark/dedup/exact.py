"""Exact deduplication: hash-groupBy on a content fingerprint.

The canonical first pass of a training-data pipeline. One shuffle keyed on
the 128-bit md5 of normalized text; survivors are the min doc_id per group.
At 100 TB this is exactly the plan you want — the shuffle carries
(hash, doc_id) pairs only, never the documents themselves; the surviving
ids are joined back (broadcast if small, shuffle otherwise) to materialize
the deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens


def normalized_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + md5 over the normalized (tokenized, space-joined) text."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    return docs.select("doc_id", F.md5(norm).alias("fp_md5"))


def dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct content: fingerprint, surviving doc_id, dup count."""
    return (normalized_fingerprint(docs, text_col)
            .groupBy("fp_md5")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_dups")))


def deduplicate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The deduplicated corpus itself: keep the min-doc_id row per content
    group. Window-free formulation: aggregate to survivors, then semi-join —
    both sides shuffle on the same key so AQE plans a single exchange."""
    survivors = dedup_groups(docs, text_col).select(
        F.col("keep_doc_id").alias("doc_id"))
    return docs.join(survivors, "doc_id", "left_semi")


def cluster_size_histogram(docs: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """Duplicate-cluster size histogram: how many content groups have
    exactly s members, and how many documents they account for — the
    one-screen dedup health readout (a heavy tail here means the
    corpus is template- or mirror-dominated and near-dup passes will
    pay off; all-singletons means exact dedup is already done). Two
    combinable aggregates on top of `dedup_groups`; output is bounded
    by the largest cluster size, never the corpus."""
    return (dedup_groups(docs, text_col)
            .groupBy(F.col("n_dups").cast("bigint").alias("group_size"))
            .agg(F.count("*").cast("bigint").alias("n_groups"))
            .select("group_size", "n_groups",
                    (F.col("group_size") * F.col("n_groups"))
                    .cast("bigint").alias("n_docs")))
