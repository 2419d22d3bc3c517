"""SimHash (64-bit) document fingerprints + near-dup pairs by Hamming
distance.

Classic Charikar simhash over token hashes: for each of 64 bit
positions, sum +1/-1 across tokens depending on the token-hash bit; the
sign of each sum is the fingerprint bit.

Physical shape (same playbook as minhash.py, measured at sf0.1):
  1. JVM side: hash every token to a 64-bit long once (narrow map);
  2. Arrow batch → numpy: the 64 bit-sums per document vectorized as an
     (n_tokens × 64) ±1 matrix reduction — zero shuffle. The pure-SQL
     alternative (explode + groupBy with 64 conditional-sum aggregates)
     shuffled one row per token and ran 3.1 s vs 0.7 s.

Near-dup join uses the standard 4-block trick: two fingerprints within
Hamming distance 3 must share at least one of 4 16-bit blocks exactly;
block equality is the join key, Hamming distance the post-filter. Hot
blocks (shared boilerplate bit patterns) above MAX_BLOCK_DF are dropped
before the self-join — the Σdf² guardrail; at corpus scale a block
value carried by thousands of docs identifies a template, not a pair.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens

BITS = 64
BLOCKS = 4  # 16-bit blocks → guarantees recall for hamming <= BLOCKS-1
MAX_BLOCK_DF = 256  # drop hotter block values before the pair join


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 64-bit simhash (bigint). Token multiplicity counts
    (simhash weights by occurrence), so hashes come from the raw token
    array, not a distinct set."""
    th = docs.select(
        "doc_id",
        F.transform(tokens(F.col(text_col)),
                    lambda t: F.xxhash64(t)).alias("th"))

    @F.pandas_udf("bigint")
    def fp_udf(col: pd.Series) -> pd.Series:
        import numpy as np
        shifts = np.arange(BITS, dtype=np.uint64)[None, :]
        out = []
        for hashes in col:
            h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out.append(0)
                continue
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            sums = (2 * bits - 1).sum(axis=0)
            val = 0
            for i in np.nonzero(sums > 0)[0]:
                val |= 1 << int(i)
            if val >= 1 << 63:  # two's-complement into BIGINT
                val -= 1 << 64
            out.append(val)
        return pd.Series(out, dtype="int64")

    return th.select("doc_id", fp_udf("th").alias("simhash"))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def _blocks(fp: DataFrame) -> DataFrame:
    return fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("block_id"),
                     F.shiftright("simhash", i * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("block_val"))
            for i in range(BLOCKS)
        ])).alias("blk")).select("doc_id", "simhash",
                                 "blk.block_id", "blk.block_val")


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    max_hamming: int = 3,
                    max_block_df: int = MAX_BLOCK_DF,
                    dedup_identical: bool | str = "auto") -> DataFrame:
    """Pairs (doc_a < doc_b) with Hamming(simhash) <= max_hamming.

    `dedup_identical`: identical texts have identical
    fingerprints, so duplication multiplies block-bucket pair work
    quadratically AND can push a block past max_block_df, where the
    naive plan drops the bucket and LOSES its pairs. Fingerprints and
    the block join run on one md5-content representative per distinct
    text (the convention shared by exact/minhash/ngram dedup); member
    pairs expand back afterwards with Hamming 0 for intra-group pairs.
    Recall-positive only — the round-7 duplication-immunity rule
    applied to the fourth and last pair operator. The default "auto"
    (canonical.resolve) turns the machinery on only at
    membership-weighted duplication
    factor Σ gsz²/n >= canonical.AUTO_RATIO: below it (including the 2×
    planted bench corpus, where naive measured 0.9 s vs 2.4 s
    canonicalized at sf0.1) the direct plan wins and matches the
    registered naive-semantics oracle; above it the canonical plan
    keeps its soak-proven quadratic immunity.
    """
    # persist: the fingerprint table feeds the hot-block scan and BOTH
    # join sides — without the barrier the tokenize+hash+UDF pipeline
    # runs three times (Spark does not dedup common subplans)
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.dedup import canonical

    # "auto" runs the gate's pre-aggregate as ONE eager job at
    # plan-construction time; persist the projected input first so that
    # job doubles as the cache materialization downstream legs reuse
    if dedup_identical == "auto":
        docs = (docs.select("doc_id", F.col(text_col))
                .persist(StorageLevel.MEMORY_AND_DISK))
    dedup_identical = canonical.resolve(
        docs, F.col(text_col), dedup_identical)
    if dedup_identical:
        keyed = docs.select("doc_id", F.col(text_col),
                            F.md5(F.col(text_col)).alias("_ckey"))
        groups = (keyed.groupBy("_ckey")
                  .agg(F.min("doc_id").alias("rep_id"),
                       F.first(text_col).alias(text_col))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        source = groups.select(F.col("rep_id").alias("doc_id"), text_col)
        members = (keyed.select("doc_id", "_ckey")
                   .join(groups.select("_ckey", "rep_id"), "_ckey")
                   .select("doc_id", "rep_id")
                   .persist(StorageLevel.MEMORY_AND_DISK))
    else:
        members = None
        source = docs.select("doc_id", F.col(text_col))

    fp = simhash(source, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    blocks = _blocks(fp)
    hot = (blocks.groupBy("block_id", "block_val")
           .agg(F.count("*").alias("df"))
           .where(F.col("df") > max_block_df)
           .select("block_id", "block_val"))
    blocks = blocks.join(F.broadcast(hot), ["block_id", "block_val"],
                         "left_anti")
    a = blocks.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sh_a"),
                      "block_id", "block_val")
    b = blocks.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sh_b"),
                      "block_id", "block_val")
    rep_pairs = (a.join(b, ["block_id", "block_val"])
                 .where(F.col("doc_a") < F.col("doc_b"))
                 .select("doc_a", "doc_b",
                         hamming(F.col("sh_a"), F.col("sh_b"))
                         .alias("hamming"))
                 .distinct()
                 .where(F.col("hamming") <= max_hamming))
    if members is None:
        return rep_pairs

    # cross-group expansion: member pairs inherit their reps' distance
    ma = members.select(F.col("rep_id").alias("doc_a"),
                        F.col("doc_id").alias("ida"))
    mb = members.select(F.col("rep_id").alias("doc_b"),
                        F.col("doc_id").alias("idb"))
    cross = (rep_pairs.join(ma, "doc_a").join(mb, "doc_b")
             .select(F.least("ida", "idb").alias("doc_a"),
                     F.greatest("ida", "idb").alias("doc_b"),
                     "hamming"))
    # intra-group pairs: identical fingerprints → Hamming 0, emitted
    # when the representative still holds >= 1 non-hot block (the
    # naive plan needs a surviving block to meet on)
    live = blocks.select(F.col("doc_id").alias("rep_id")).distinct()
    dup = members.join(live, "rep_id")
    ia = dup.select("rep_id", F.col("doc_id").alias("ida"))
    ib = dup.select("rep_id", F.col("doc_id").alias("idb"))
    intra = (ia.join(ib, "rep_id")
             .where(F.col("ida") < F.col("idb"))
             .select(F.col("ida").alias("doc_a"),
                     F.col("idb").alias("doc_b"),
                     F.lit(0).alias("hamming")))
    return cross.unionByName(intra)
