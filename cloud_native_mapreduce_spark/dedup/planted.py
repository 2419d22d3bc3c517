"""Deterministic planted-duplicate corpora for the text-dedup oracles.

The natural test corpus has no guarantee about where its near-dup pairs
sit relative to an LSH detector's recall curve, so the approximate
detectors (`minhash`, `simhash`) could only get rows-only checks. These
helpers build corpora where the detector's recall at the registered
threshold is deterministic, upgrading both registry entries to full
value-level DuckDB oracles (same trick as
`similarity/lsh.py:with_planted_duplicates` for embeddings):

* `with_appended_near_copies` — every doc gains a copy with a short
  token suffix appended. Appending never removes a shingle, so the
  copy's exact 3-gram Jaccard to its original is S/(S+Δ) with Δ ≤ 4 new
  shingles — docs with ≥ 38 tokens land at J ≥ 0.9, where 16-band×4-row
  minhash banding miss probability is (1-J⁴)¹⁶ ≤ 4e-8 per pair:
  measured-deterministic recall 1.0, and the truth set is exact
  SQL-computable Jaccard (the oracle needs no minhash at all).
* `with_exact_copies` — every doc gains a byte-identical copy:
  identical text ⇒ identical simhash ⇒ Hamming 0, which the 4×16-bit
  block join finds by construction. Simhash itself is not
  SQL-expressible (seeded xxhash64 + bit sums), so the simhash registry
  entry checks the PLANTED pair subset — the one whose truth an oracle
  can state without computing simhash — while natural-corpus behavior
  stays covered by pytest property tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Suffix appended by `with_appended_near_copies` (4 tokens ⇒ ≤ 4 new
#: 3-gram shingles at the junction). Mirrored literally in the oracle.
NEAR_COPY_SUFFIX = " planted near duplicate copy"

ID_OFFSET = 1_000_000


def with_appended_near_copies(docs: DataFrame,
                              suffix: str = NEAR_COPY_SUFFIX,
                              id_offset: int = ID_OFFSET) -> DataFrame:
    """documents ∪ near-copies (doc_id + id_offset, text ‖ suffix)."""
    dup = docs.select(
        (F.col("doc_id") + id_offset).cast("bigint").alias("doc_id"),
        F.concat(F.col("text"), F.lit(suffix)).alias("text"))
    return docs.select("doc_id", "text").unionByName(dup)


def with_exact_copies(docs: DataFrame,
                      id_offset: int = ID_OFFSET) -> DataFrame:
    """documents ∪ byte-identical copies (doc_id + id_offset)."""
    dup = docs.select(
        (F.col("doc_id") + id_offset).cast("bigint").alias("doc_id"),
        F.col("text"))
    return docs.select("doc_id", "text").unionByName(dup)
