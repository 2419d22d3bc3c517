"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline (all deterministic — seeded xxhash64, no RNG state):
  1. shingle: k-word shingles from the reference-parity tokenizer;
  2. signature: per doc, NUM_PERM minhash values — one shuffle
     (explode shingles → groupBy doc → NUM_PERM min() aggregates, with
     map-side partial min so the shuffle carries signatures, not shingles);
  3. band: split the signature into BANDS bands of ROWS_PER_BAND values,
     hash each band → (band_key, doc_id);
  4. bucket-join: docs sharing any band key become candidate pairs
     (groupBy band key, emit intra-bucket pairs — never a cross join);
  5. verify: exact Jaccard over distinct shingle sets for candidates only.

Scale posture: the only data-proportional shuffles are keyed on shingle
hash and band key; candidate verification touches |candidates| pairs, not
|docs|^2. Hot buckets (boilerplate text) are capped at MAX_BUCKET to bound
the pair blowup — the standard guardrail in web-scale dedup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.text import tokens

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 3
MAX_BUCKET = 64  # ignore hot LSH buckets larger than this (pair-blowup cap)


def shingles_from_tokens(toks, k: int = SHINGLE_K):
    """array<string> of k-word shingles (distinct) from a token-array
    COLUMN. Pass a real column reference, not the tokenizer expression:
    the regex extract would otherwise be re-evaluated for every
    element_at reference (observed 7× slowdown at sf0.1)."""
    # slice+array_join, not per-element element_at concat: generators
    # (explode) re-evaluate the collection expression per emitted row, so
    # construction cost multiplies — the slice form measured 3.7× faster
    # at sf0.1 under explode.
    return F.array_distinct(F.when(
        F.size(toks) < k,
        # short docs: fall back to the whole token string as one shingle
        F.array(F.concat_ws(" ", toks)),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )))


def doc_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # two-step projection: tokenize once into a column, then shingle from
    # the column. CollapseProject keeps the split because the token array
    # is non-cheap and referenced multiple times.
    toks = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    return toks.select(
        "doc_id", shingles_from_tokens(F.col("toks")).alias("shingles"))


def doc_shingle_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → array<bigint> of 64-bit shingle hashes. One string hash
    per shingle; all downstream minhash/Jaccard work runs on longs.
    (64-bit collisions are negligible at any realistic corpus size.)"""
    sh = doc_shingles(docs, text_col)
    return sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.xxhash64(s)).alias("sh_h"))


def _perm_constants(num_perm: int):
    """Deterministic (a_i, b_i) universal-hash constants via splitmix64
    (public-domain mixer) from a fixed seed — no RNG state, identical on
    every executor and every run."""
    import numpy as np

    def splitmix64(x: "np.ndarray") -> "np.ndarray":
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & mask
        z = x
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
        return z ^ (z >> np.uint64(31))

    idx = np.arange(1, num_perm + 1, dtype=np.uint64)
    a = splitmix64(idx) | np.uint64(1)          # odd multipliers
    b = splitmix64(idx + np.uint64(num_perm))
    return a, b


def _sig_udf_for(num_perm: int):
    """Arrow-batched pandas UDF: array<bigint> of shingle hashes →
    array<bigint> minhash signature of length num_perm, vectorized."""
    a_const, b_const = _perm_constants(num_perm)

    @F.pandas_udf("array<bigint>")
    def sig_udf(sh_h: pd.Series) -> pd.Series:
        import numpy as np
        a = a_const[:, None]
        b = b_const[:, None]
        empty = np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        out = []
        for hashes in sh_h:
            h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out.append(empty)
                continue
            # uint64 arithmetic wraps mod 2^64 — the permutation family
            perms = a * h[None, :] + b
            out.append(perms.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig_udf


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_perm: int = NUM_PERM) -> DataFrame:
    """doc_id → array<bigint> signature of length num_perm.

    Two-phase, shuffle-free:
      1. JVM side: hash each shingle string to a 64-bit long ONCE;
      2. Arrow batch → numpy: num_perm universal-hash permutations
         ``(a_i * h + b_i) mod 2^64`` and their mins, fully vectorized.

    The pure-SQL alternative (num_perm × array_min(transform(xxhash64)))
    evaluates interpreted higher-order lambdas per (shingle, perm) —
    measured 13.5 s at sf0.1 vs ~0.9 s for this formulation. The explode
    → groupBy → num_perm min() shape additionally shuffles one row per
    shingle. A narrow map with one Arrow crossing wins at every scale.
    """
    return (doc_shingle_hashes(docs, text_col)
            .select("doc_id", _sig_udf_for(num_perm)("sh_h").alias("sig")))


def band_keys(signatures: DataFrame, bands: int = BANDS,
              rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(doc_id, band_key) rows: one hashed band per signature slice.
    Exposed separately so tests can measure the bucket-size distribution
    the MAX_BUCKET cap acts on."""
    return signatures.select(
        "doc_id",
        F.explode(F.array(*[
            F.xxhash64(F.lit(b), *[F.col("sig")[b * rows_per_band + r]
                                   for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band_key"))


def candidate_pairs(signatures: DataFrame, bands: int = BANDS,
                    rows_per_band: int = ROWS_PER_BAND,
                    max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(doc_a < doc_b) candidate pairs sharing at least one LSH band."""
    band_rows = band_keys(signatures, bands, rows_per_band)
    buckets = (band_rows.groupBy("band_key")
               .agg(F.collect_list("doc_id").alias("ids"))
               .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket)))
    # intra-bucket pairs via self-product of the (small, capped) id list
    pairs = buckets.select(
        F.explode(F.filter(
            F.flatten(F.transform(
                F.col("ids"),
                lambda a: F.transform(F.col("ids"),
                                      lambda b: F.struct(a.alias("doc_a"),
                                                         b.alias("doc_b"))))),
            lambda p: p["doc_a"] < p["doc_b"])).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    threshold: float = 0.8,
                    dedup_identical: bool | str = "auto") -> DataFrame:
    """Verified near-dup pairs: candidates whose exact shingle-set Jaccard
    >= threshold. Columns: doc_a, doc_b, jaccard (rounded 4).

    Verification compares hashed shingle sets (long arrays), not strings
    — same Jaccard modulo negligible 64-bit collisions, far cheaper
    array_intersect/union. The hash arrays are computed once and shared
    by the signature and verify subtrees via the same logical subplan.

    `dedup_identical`: byte-identical texts produce identical
    signatures, so duplication multiplies the Arrow-UDF signature
    compute linearly AND the intra-bucket pair work quadratically —
    the same law the round-7 sf1 soak exposed on the exact-Jaccard and
    SRP-LSH paths. Signatures/bands/verify run on one md5-content
    representative per distinct text (dedup/exact.py's identity
    convention); member pairs expand back afterwards. Identical pairs
    are J = 1.0 by definition — emitted only when the representative
    has a non-empty shingle set, because the naive verify computes
    0/0 → null for empty docs and drops them. Recall-positive only:
    duplicates can no longer saturate a band bucket past MAX_BUCKET.
    The default "auto" gates the machinery on one cheap pre-aggregate
    of the MEMBERSHIP-WEIGHTED duplication factor Σ gsz²/n
    (canonical.resolve): corpora
    below canonical.AUTO_RATIO run the naive plan —
    whose semantics the registered DuckDB oracle encodes — at zero
    premium, while duplicate-heavy corpora keep the soak win; there
    the two plans agree except in bucket saturation, where the
    canonical one is recall-positive (see tests/test_properties.py's
    differential pin for the agreeing regime).
    """
    # the hash arrays feed BOTH the signature subtree and the verify join;
    # persist so tokenize+shingle+hash runs once, not twice (Spark never
    # dedups common subplans on its own). MEMORY_AND_DISK: spills, never
    # recomputes — the right default when the input scan is the expensive
    # part. ~16 bytes/shingle, orders of magnitude smaller than the text.
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
        # members feeds four join legs (cross a/b, intra a/b) — persist
        # or each leg recomputes the scan+agg+join pipeline
        members = (keyed.select("doc_id", "_ckey")
                   .join(groups.select("_ckey", "rep_id"), "_ckey")
                   .select("doc_id", "rep_id")
                   .persist(StorageLevel.MEMORY_AND_DISK))
    else:
        members = None
        source = docs.select("doc_id", F.col(text_col))

    hashes = (doc_shingle_hashes(source, text_col)
              .persist(StorageLevel.MEMORY_AND_DISK))
    sigs = (hashes.select(
        "doc_id", _sig_udf_for(NUM_PERM)(F.col("sh_h")).alias("sig")))
    cands = candidate_pairs(sigs)
    a = hashes.select(F.col("doc_id").alias("doc_a"),
                      F.col("sh_h").alias("sh_a"))
    b = hashes.select(F.col("doc_id").alias("doc_b"),
                      F.col("sh_h").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    rep_pairs = (joined
                 .select("doc_a", "doc_b",
                         F.round(jac, 4).alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))
    if members is None:
        return rep_pairs

    # cross-group expansion: member pairs inherit their reps' jaccard
    ma = members.select(F.col("rep_id").alias("doc_a"),
                        F.col("doc_id").alias("ida"))
    mb = members.select(F.col("rep_id").alias("doc_b"),
                        F.col("doc_id").alias("idb"))
    cross = (rep_pairs.join(ma, "doc_a").join(mb, "doc_b")
             .select(F.least("ida", "idb").alias("doc_a"),
                     F.greatest("ida", "idb").alias("doc_b"),
                     "jaccard"))
    # intra-group pairs: identical shingle sets → J = 1.0, except the
    # empty set, whose naive verify is 0/0 → null → dropped
    live = hashes.where(F.size("sh_h") > 0).select(
        F.col("doc_id").alias("rep_id"))
    dup = members.join(live, "rep_id")
    ia = dup.select("rep_id", F.col("doc_id").alias("ida"))
    ib = dup.select("rep_id", F.col("doc_id").alias("idb"))
    intra = (ia.join(ib, "rep_id")
             .where(F.col("ida") < F.col("idb"))
             .select(F.col("ida").alias("doc_a"),
                     F.col("idb").alias("doc_b"),
                     F.lit(1.0).alias("jaccard")))
    return cross.unionByName(intra)
