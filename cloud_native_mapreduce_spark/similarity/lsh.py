"""Random-hyperplane LSH (SRP) bucketed approximate nearest neighbors.

Scale path for similarity search: sign-random-projection hashes each
embedding to an n-bit bucket; candidates are scored only within the query's
bucket (optionally multi-probe: buckets at Hamming distance 1). Planes are
generated from a fixed seed and shipped as literal arrays — deterministic,
no fitted model state, no driver-side collect of data.

At 100 TB: bucketing is a narrow map (no shuffle); the candidate scan reads
only matching buckets if the table is written partitioned/bucketed by
`bucket` — the registry query demonstrates the operator; the write-side
layout note lives in sources/tables.py.

`near_duplicate_pairs` is the scalable sibling of the exact all-pairs
`bruteforce.pairwise_near_duplicates`: same candidate→verify shape as
`dedup/minhash.py` (multi-table buckets bound the join; every emitted pair
carries its EXACT cosine), so precision is 1.0 by construction and only
recall is probabilistic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_native_mapreduce_spark.functions.vectors import cosine, dot

SEED = 42
N_PLANES = 8  # 256 buckets
N_TABLES = 8          # near-dup: independent hash tables OR'd for recall
MAX_BUCKET = 1024     # near-dup: hot-bucket pair-blowup cap
TARGET_BUCKET = 64    # near-dup auto-sizing: expected vectors per bucket


def auto_size(n_vectors: int, threshold: float,
              target_bucket_size: int = TARGET_BUCKET,
              target_recall: float = 0.99) -> tuple[int, int]:
    """Corpus-scaled (n_planes, n_tables) for `near_duplicate_pairs`.

    n_planes = ceil(log2(N / target_bucket_size)): 2^n_planes buckets
    keep the EXPECTED bucket size at target_bucket_size, so the
    max_bucket drop-cap stays a skew guard instead of the common case —
    a fixed plane count saturates around N ≈ 2^planes · max_bucket and
    silently drops everything beyond it.

    n_tables = ceil(log(1-R) / log(1-p^n_planes)) restores recall R at
    the cosine THRESHOLD: SRP collision probability per plane is
    p = 1 - acos(threshold)/π, a candidate needs all n_planes bits to
    agree in at least one table, and tables are independent. Sizing at
    the threshold is conservative for everything above it (true
    near-dups sit well inside the threshold, where p is larger).

    Caps: planes ≤ 62 (bucket ids are one bigint of plane-sign bits),
    tables ≤ 64 (each table costs one corpus-sized explode row).
    """
    import math
    n_planes = min(62, max(2, math.ceil(
        math.log2(max(n_vectors, 2) / target_bucket_size))))
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_cand = p ** n_planes
    if p_cand >= 1.0:
        return n_planes, 1
    n_tables = math.ceil(math.log(1.0 - target_recall)
                         / math.log(1.0 - p_cand))
    return n_planes, min(64, max(1, n_tables))


def _planes(dim: int, n_planes: int = N_PLANES, seed: int = SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_col(vec_col, dim: int, n_planes: int = N_PLANES,
               seed: int = SEED):
    """Integer SRP bucket id for an embedding column."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec_col, plane) > 0,
                     F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def bucketed(embeddings: DataFrame, dim: int,
             vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn(
        "bucket", bucket_col(F.col(vec_col), dim))


def _table_buckets_udf(dim: int, n_planes: int = N_PLANES,
                       n_tables: int = N_TABLES, seed: int = SEED):
    """Arrow-batched pandas UDF: embedding → array<bigint> of n_tables SRP
    bucket ids, one numpy GEMM per batch.

    The JVM-HOF `bucket_col` evaluates n_planes interpreted dot-product
    lambdas per row — fine for ONE table (the top-k path), but n_tables
    tables × n_planes planes × dim element-ops per row is exactly the
    interpreted-HOF blowup `dedup/minhash.py` measured 15× slower than a
    vectorized Arrow crossing. Here all tables' projections are a single
    (batch × dim) @ (dim × n_tables·n_planes) multiply."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<bigint>")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        bits = (mat @ planes.T) > 0
        bits = bits.reshape(len(mat), n_tables, n_planes)
        return pd.Series(list((bits * weights).sum(axis=2)))

    return bucket_udf


def with_planted_duplicates(embeddings: DataFrame,
                            amplitude: float = 0.1,
                            id_offset: int = 1_000_000,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Corpus ∪ one deterministically perturbed copy of every vector
    (dup id = id + id_offset; element i scaled by 1 + amplitude·sin(
    97·id + i)). At amplitude 0.1 the dup sits at cosine ≈0.997 from its
    original while unrelated pairs stay far below (max 0.513 on the test
    embeddings) — the ground-truth near-dup corpus for recall gates and
    the LSH registry demo, since the synthetic embeddings contain no true
    near-dups of their own. Fully deterministic: no RNG, a pure column
    expression, so Spark and any re-run agree bit-for-bit."""
    # the sin() must see the ORIGINAL id: referencing `id_col` directly
    # beside the `id + offset AS id_col` alias trips Spark's lateral
    # column alias resolution inside the lambda (the perturbation would
    # silently key off the offset id) — rename through an intermediate
    wiggle = F.transform(
        F.col(vec_col),
        lambda x, i: (x.cast("double") *
                      (F.lit(1.0) + amplitude *
                       F.sin(F.col("__plant_src_id") * 97 + i))).cast("float"))
    dup = (embeddings
           .select(F.col(id_col).alias("__plant_src_id"), F.col(vec_col))
           .select((F.col("__plant_src_id") + id_offset).alias(id_col),
                   wiggle.alias(vec_col)))
    return embeddings.select(id_col, vec_col).unionByName(dup)


def with_planted_copies(embeddings: DataFrame, src_id: int = 0,
                        n_copies: int = 10, id_offset: int = 1_000_000,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Corpus ∪ `n_copies` EXACT copies of vector `src_id` (copy j gets
    id id_offset + j). The ground-truth corpus that upgrades the
    approximate top-k queries to full value-level oracles: an identical
    embedding PROVABLY maps to the identical SRP bucket (bucket bits
    are a deterministic function of the vector) and the identical IVF
    list (same argmin over the same centroid distances), so the
    approximate scan's recall of the copies is exactly 1.0 — not
    measured-1.0, provable — and the true top-k (the copies at cosine
    1.0, far above the natural max ≈0.51) is reproducible by an exact
    all-pairs oracle."""
    src = embeddings.where(F.col(id_col) == src_id).select(F.col(vec_col))
    dup = (src.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_copies))).alias("j"),
        F.col(vec_col))
        .select((F.col("j") + F.lit(id_offset)).cast("bigint").alias(id_col),
                F.col(vec_col)))
    return embeddings.select(id_col, vec_col).unionByName(dup)


def near_duplicate_pairs(embeddings: DataFrame, dim: int,
                         threshold: float = 0.95,
                         n_planes: int | None = None,
                         n_tables: int | None = None,
                         max_bucket: int = MAX_BUCKET,
                         target_bucket_size: int = TARGET_BUCKET,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dedup_identical: bool | str = "auto") -> DataFrame:
    """All pairs (vec_a < vec_b, cosine) with cosine >= threshold, found
    via SRP-LSH candidate generation + exact cosine verification.

    The 100 TB shape for embedding-space near-dup (the exact
    `bruteforce.pairwise_near_duplicates` is O(N²) by contract):
      1. bucket every vector into n_tables independent SRP tables
         (one Arrow GEMM, narrow map — no shuffle);
      2. candidates = pairs sharing a bucket in ANY table (groupBy
         (table, bucket), intra-bucket pairs; buckets larger than
         max_bucket are dropped — a degenerate bucket means the planes
         don't discriminate that region, and the pair blowup is bounded
         at max_bucket² per bucket);
      3. verify every candidate with the EXACT cosine and filter.

    Emitted pairs are therefore exact (precision 1.0); only recall is
    probabilistic: P(candidate) = 1-(1-p^n_planes)^n_tables with
    p = 1 - angle/pi, ≈0.99 at cosine 0.95 for the 8×8 default.
    tests/test_similarity.py pins the measured recall floor vs the exact
    operator.

    SIZING (the knob that matters at 100 TB): n_planes must grow with
    the corpus — 2^n_planes buckets means expected bucket size
    N/2^n_planes, and a bucket beyond max_bucket is DROPPED, so a fixed
    8-plane table (256 buckets) saturates around N ≈ 256·max_bucket.
    When n_planes/n_tables are None (the default) they are DERIVED from
    a corpus count via `auto_size`: n_planes = ceil(log2(N /
    target_bucket_size)) keeps buckets at target size (e.g. 24 planes →
    ~16M buckets → ~64-vector buckets at N=10⁹), and n_tables =
    ceil(log(1-recall)/log(1-p^n_planes)) restores recall as the
    per-table candidate probability falls. The count is one
    metadata-cheap job against the (typically parquet) source. Pass
    explicit values to pin a configuration — the registry query pins
    8×8, whose planted-dup miss probability (≈2e-6 per pair) makes its
    exact-oracle match deterministic in practice.

    `dedup_identical`: byte-identical vectors ALWAYS share
    every SRP bucket (bucket bits are a pure function of the vector),
    so duplication multiplies intra-bucket pair work quadratically —
    the round-7 sf1 soak measured 222 s on a 10×-duplicated corpus.
    Canonicalizing to one representative per distinct vector runs
    bucketing/candidates/verify on distinct vectors only and expands
    member pairs afterwards (duplicate pairs are cosine 1.0 by
    definition). Semantic delta is recall-POSITIVE only: bucket
    occupancy now counts distinct vectors, so duplicates can no longer
    saturate a bucket past max_bucket and knock out its candidates;
    identical-vector pairs are recovered exactly instead of
    probabilistically. Precision is untouched (verification is exact
    either way). The default "auto" (dedup/canonical.resolve) runs
    one cheap pre-aggregate of the membership-weighted duplication
    factor Σ gsz²/n over vector hashes
    and canonicalizes only at
    canonical.AUTO_RATIO — duplicate-free corpora (including the
    planted-perturbed registry corpus, whose duplicates are NOT
    byte-identical) pay zero premium and match the naive-semantics
    oracle; duplicate-heavy corpora keep the 222 s → 57 s soak win.
    """
    from pyspark import StorageLevel

    from cloud_native_mapreduce_spark.dedup import canonical

    # "auto" runs the gate's pre-aggregate as ONE eager job at
    # plan-construction time; persist the projected input first so that
    # job doubles as the cache materialization downstream legs reuse
    if dedup_identical == "auto":
        embeddings = (embeddings.select(id_col, vec_col)
                      .persist(StorageLevel.MEMORY_AND_DISK))
    dedup_identical = canonical.resolve(
        embeddings, F.col(vec_col), dedup_identical)
    if dedup_identical:
        # hash AGGREGATE keyed on the vector itself (array equality is
        # exact — no content-hash convention needed): map-side combine
        # collapses duplicates before the shuffle, no sort, and the
        # representative corpus falls out of the aggregate
        groups = (embeddings.groupBy(vec_col)
                  .agg(F.min(id_col).alias("rep_id"))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        source = groups.select(F.col("rep_id").alias(id_col), vec_col)
        # members feeds FOUR join legs (cross a/b, intra a/b) — persist
        # or each leg recomputes the scan+agg+join pipeline
        members = (embeddings.select(id_col, vec_col)
                   .join(groups, vec_col)
                   .select(id_col, "rep_id")
                   .persist(StorageLevel.MEMORY_AND_DISK))
    else:
        members = None
        source = embeddings
    if n_planes is None or n_tables is None:
        auto_planes, auto_tables = auto_size(source.count(), threshold,
                                             target_bucket_size)
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables
    embeddings = source
    bucketed_tables = embeddings.select(
        id_col,
        F.posexplode(_table_buckets_udf(dim, n_planes, n_tables, seed=SEED)
                     (F.col(vec_col))).alias("table", "bucket"))
    buckets = (bucketed_tables.groupBy("table", "bucket")
               .agg(F.collect_list(id_col).alias("ids"))
               .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket)))
    pairs = (buckets.select(
        F.explode(F.filter(
            F.flatten(F.transform(
                F.col("ids"),
                lambda a: F.transform(F.col("ids"),
                                      lambda b: F.struct(a.alias("vec_a"),
                                                         b.alias("vec_b"))))),
            lambda p: p["vec_a"] < p["vec_b"])).alias("p"))
        .select("p.vec_a", "p.vec_b").distinct())
    a = embeddings.select(F.col(id_col).alias("vec_a"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"),
                          F.col(vec_col).alias("vb"))

    # Vectorized verify: the candidate set is ~1M pairs at sf0.1, and the
    # zip_with/aggregate cosine is interpreted per element — measured
    # 6.9 s vs ~2 s with one einsum per Arrow batch. Rounding stays in
    # Spark (F.round is HALF_UP like the DuckDB oracle; np.round is
    # banker's and could flip a boundary value).
    @F.pandas_udf("double")
    def cos_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=float)
        ma = np.array(va.tolist(), dtype=np.float64)
        mb = np.array(vb.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        return pd.Series(dots / (na * nb))

    rep_pairs = (pairs.join(a, "vec_a").join(b, "vec_b")
                 .select("vec_a", "vec_b",
                         F.round(cos_udf(F.col("va"), F.col("vb")), 4)
                          .alias("cosine"))
                 .where(F.col("cosine") >= threshold))
    if members is None:
        return rep_pairs

    memb = members.select(F.col(id_col).alias("m_id"), "rep_id")
    # cross-group expansion: member pairs inherit their reps' cosine
    ma = memb.select(F.col("rep_id").alias("vec_a"),
                     F.col("m_id").alias("ida"))
    mb = memb.select(F.col("rep_id").alias("vec_b"),
                     F.col("m_id").alias("idb"))
    cross = (rep_pairs.join(ma, "vec_a").join(mb, "vec_b")
             .select(F.least("ida", "idb").alias("vec_a"),
                     F.greatest("ida", "idb").alias("vec_b"),
                     "cosine"))
    # intra-group pairs: byte-identical vectors, cosine 1.0 exactly
    # (threshold <= 1 always holds for a cosine operator). Keyed
    # self-join on the rep id — spillable and parallel per group, no
    # collect_list row that a million-copy group would blow up
    ia = memb.select("rep_id", F.col("m_id").alias("ida"))
    ib = memb.select("rep_id", F.col("m_id").alias("idb"))
    intra = (ia.join(ib, "rep_id")
             .where(F.col("ida") < F.col("idb"))
             .select(F.col("ida").alias("vec_a"),
                     F.col("idb").alias("vec_b"),
                     F.lit(1.0).alias("cosine")))
    return cross.unionByName(intra)


def top_k_similar(embeddings: DataFrame, query_vec_id: int, dim: int,
                  k: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: score only rows in the query's bucket (plus
    Hamming-1 neighbor buckets when multiprobe)."""
    b = bucketed(embeddings, dim, vec_col)
    q = (b.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("query_vec"),
                 F.col("bucket").alias("q_bucket")))
    cand = b.crossJoin(F.broadcast(q))
    if multiprobe:
        probe = F.bit_count(F.col("bucket").bitwiseXOR(F.col("q_bucket"))) <= 1
    else:
        probe = F.col("bucket") == F.col("q_bucket")
    return (cand.where(probe)
            .select(id_col,
                    F.round(cosine(F.col(vec_col), F.col("query_vec")), 4)
                     .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))
