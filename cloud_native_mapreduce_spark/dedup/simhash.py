"""SimHash (64-bit) document fingerprints + near-dup pairs by Hamming
distance, pure DataFrame ops.

Classic Charikar simhash over token hashes: for each of 64 bit positions,
sum +1/-1 across tokens depending on the token-hash bit; the sign of each
sum is the fingerprint bit. Implemented as one explode + one groupBy with
64 conditional-sum aggregates — map-side partial aggregation keeps the
shuffle at 64 longs per doc per partition.

Near-dup join uses the standard 4-block trick: two fingerprints within
Hamming distance 3 must share at least one of 4 16-bit blocks exactly;
block equality is the join key, Hamming distance the post-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens

BITS = 64
BLOCKS = 4  # 16-bit blocks → guarantees recall for hamming <= BLOCKS-1


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 64-bit simhash (bigint)."""
    tok = (docs.select("doc_id",
                       F.explode(tokens(F.col(text_col))).alias("token"))
           .select("doc_id", F.xxhash64("token").alias("h")))
    aggs = [
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"b{i}")
        for i in range(BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    fp = None
    for i in range(BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return sums.select("doc_id", fp.alias("simhash"))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    max_hamming: int = 3) -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(simhash) <= max_hamming."""
    fp = simhash(docs, text_col)
    blocks = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("block_id"),
                     F.shiftright("simhash", i * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("block_val"))
            for i in range(BLOCKS)
        ])).alias("blk"))
    blocks = blocks.select("doc_id", "simhash", "blk.block_id",
                           "blk.block_val")
    a = blocks.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sh_a"),
                      "block_id", "block_val")
    b = blocks.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sh_b"),
                      "block_id", "block_val")
    pairs = (a.join(b, ["block_id", "block_val"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b",
                     hamming(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
             .distinct()
             .where(F.col("hamming") <= max_hamming))
    return pairs
