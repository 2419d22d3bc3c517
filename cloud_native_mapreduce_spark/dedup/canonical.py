"""Adaptive gate for exact-duplicate canonicalization in pair operators.

The four pair operators (``dedup/ngram_jaccard.near_duplicates`` /
``containment_pairs``, ``dedup/minhash.near_duplicates``,
``dedup/simhash.near_duplicates``, ``similarity/lsh.near_duplicate_pairs``)
can canonicalize byte-identical inputs to one representative before the
quadratic pair stage and expand member pairs back afterwards. That
machinery is duplication-immunity insurance: on a corpus where every
item has D exact copies it divides pair-stage work by D² (the round-7
sf1 soak measured 415 s → 26.6 s at D = 10 for exact n-gram Jaccard),
but on a (nearly) duplicate-free corpus it is pure overhead — three
extra corpus-sized shuffles (group aggregate, member join, pair
expansion), measured at a 1.3–1.7× premium on the sf0.1 bench corpora
(SimHash's 2×-duplicated planted corpus: 0.905 s naive vs 2.41 s
canonicalized — even a full doubling sits below break-even at that
scale).

``should_canonicalize`` decides with ONE cheap pre-aggregate over
8-byte key hashes and turns the machinery on only when the
MEMBERSHIP-WEIGHTED duplication factor Σ gsz² / n — the expected
number of exact copies of a randomly chosen item, itself included —
reaches ``AUTO_RATIO``. The weighted statistic, not the corpus-mean
n/distinct, is the one that tracks the actual cost law: a bucket
containing a group of D identical items does D² the pair work, so
concentrated duplication (10 copies of half the corpus diluted by a
distinct other half: weighted 5.5, mean 1.8) must fire the gate, while
uniformly mild duplication (every item exactly twice: weighted 2.0,
where the machinery measured slower than the naive plan at bench
scale) must not. The 3.0 default separates the measured regimes:
weighted 2.0 (bench SimHash corpus, naive wins 0.9 s vs 2.4 s) vs
weighted ≥ 5.5 (sf1 soak corpora, canonical wins up to 15×). Hash
collisions can only OVERSTATE duplication (they merge groups), i.e.
only ever err toward the duplication-immune path, never away from it.

Scale posture: the gate is a map-side-combined count-per-hash plus a
scalar aggregate — one scan, a tiny 8-byte-key shuffle, one row to the
driver. It costs one extra job (~0.2 s at sf0.1, dominated by job
latency) and is the reason duplicate-free corpora no longer pay the
canonicalization premium. Callers that know their corpus can pin
``True``/``False`` explicitly; ``"auto"`` is the default everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Membership-weighted duplication factor Σ gsz²/n at which
#: canonicalization turns on in "auto" mode. Below it the fixed
#: machinery cost (3 extra shuffles) outweighs the pair-work reduction
#: at every measured scale; above it the reduction dominates.
AUTO_RATIO = 3.0


def duplication_factor(df: DataFrame, key: Column) -> float:
    """Membership-weighted duplication factor Σ gsz² / n over exact-key
    groups (gsz = group size by xxhash64(key)).

    1.0 = all distinct; D = a randomly chosen item has D exact copies
    (itself included) in expectation — the factor by which ITS bucket
    memberships multiply downstream, whose square governs pair-stage
    inflation. Two-phase aggregate: count per 8-byte hash (map-side
    combined), then one scalar (Σ gsz², Σ gsz) row to the driver.
    Empty input → 1.0 (nothing to canonicalize).
    """
    per_key = df.groupBy(F.xxhash64(key).alias("_k")) \
        .agg(F.count("*").alias("gsz"))
    row = per_key.select(F.sum(F.col("gsz") * F.col("gsz")).alias("sq"),
                         F.sum("gsz").alias("n")).first()
    if not row.n:
        return 1.0
    return row.sq / row.n


def resolve(df: DataFrame, key: Column,
            mode: bool | str, ratio: float = AUTO_RATIO) -> bool:
    """Resolve a ``dedup_identical`` argument to a concrete bool.

    ``True``/``False`` pass through (explicit pins, used by the
    differential tests to force both paths); ``"auto"`` runs the
    pre-aggregate and fires at duplication factor >= ``ratio``.
    NOTE: "auto" is an EAGER Spark job at plan-construction time —
    callers should pass an already-persisted frame so the job doubles
    as cache materialization (every pair operator here persists its
    projected input before calling this; do the same for expensive
    upstream plans, or pin True/False). Any
    other value is an error — silently coercing a typo like
    ``"Auto"`` through ``bool()`` would pin the expensive path with
    no signal beyond a performance regression.
    """
    if mode == "auto":
        return duplication_factor(df, key) >= ratio
    if not isinstance(mode, bool):
        raise ValueError(
            f"dedup_identical must be True, False, or 'auto'; got {mode!r}")
    return mode
