"""Exact duplicate-substring detection over token k-grams.

The span-level dedup signal from Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better" — public literature): a
k-token span that occurs MORE THAN ONCE anywhere in the corpus is a
duplicated substring, and the fraction of a document's spans that are
duplicated is the curation signal (their suffix-array finds arbitrary-
length repeats; fixed-k span hashing is the standard MapReduce-able
approximation — every repeat of length >= k contains a duplicated
k-gram, so the per-document signal is recall-complete at granularity
k). Tokenization is the reference-parity word regex
(`functions/text.WORD_RE`), so the span vocabulary matches the word
surface every other text operator shares.

Spark shape, all JVM builtins: one narrow map tokenizes ONCE per row
then builds the span-hash ARRAY (md5 over the space-joined k-token
window — md5, not xxhash64, because the DuckDB oracle must replay the
identical hash), explode → one map-side-combined count per span hash
→ one keyed join back + per-doc aggregate. No Python, no window, no
driver collect.

Scale posture: the exploded span frame is ~n_tokens rows (one per
position) — the same magnitude every shingle operator here already
handles; the count aggregate combines map-side (duplicated spans
collapse before the shuffle), and the join back is keyed on the hash
string. At 100 TB the only knob is k: bigger k = fewer positions per
doc and longer minimal repeats. Docs shorter than k tokens have zero
spans and surface with n_spans = 0 through the left join back onto
the corpus — never silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions import text as T

#: Default span length in tokens. Lee et al. run 50 on web corpora;
#: 10 keeps spans meaningful on this corpus' shorter documents.
SPAN_K = 10


def duplicate_span_stats(docs: DataFrame, k: int = SPAN_K,
                         text_col: str = "text") -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_ratio): per document, the
    number of k-token spans, how many of them occur >= 2 times in the
    whole corpus (its own other positions included — self-repetition
    is duplication too, per the paper), and their ratio (0.0 for docs
    shorter than k tokens).

    The span array is guarded on size(t) >= k because Spark's
    sequence(1, n) with n < 1 generates a DESCENDING sequence, not an
    empty one.
    """
    toks = docs.select("doc_id", T.tokens(F.col(text_col)).alias("t"))
    span_arr = F.when(
        F.size("t") >= k,
        F.expr(f"transform(sequence(1, size(t) - {k} + 1), "
               f"i -> md5(concat_ws(' ', slice(t, i, {k}))))")
    ).otherwise(F.expr("array()"))
    from pyspark import StorageLevel

    # spans feeds the global count AND the join-back leg — persist so
    # tokenize + md5 over the corpus runs once, not twice
    spans = (toks.select("doc_id", F.explode(span_arr).alias("h"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    counts = spans.groupBy("h").agg(F.count("*").alias("c"))
    per_doc = (spans.join(counts, "h")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_spans"),
                    F.count(F.when(F.col("c") >= 2, 1))
                    .alias("n_dup_spans")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
                F.when(F.coalesce("n_spans", F.lit(0)) == 0, F.lit(0.0))
                .otherwise(F.round(F.col("n_dup_spans")
                                   / F.col("n_spans"), 4))
                .alias("dup_ratio")))
