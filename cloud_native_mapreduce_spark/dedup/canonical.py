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

``should_canonicalize`` decides with ONE cheap pre-aggregate —
``count(*)`` vs ``count(distinct xxhash64(key))`` — and turns the
machinery on only when the corpus-wide duplication factor n/d reaches
``AUTO_RATIO``. The threshold separates the two measured regimes:
factor 2.0 (bench, naive wins) and factor ≥ 10 (soak, canonical wins
15×); at the 3.0 default the pair stage shrinks ≥ 9× when the gate
fires, which dominates the fixed machinery cost at every scale we
measured. Hash collisions can only OVERSTATE duplication (distinct
hashes ≤ distinct values), i.e. only ever err toward the
duplication-immune path, never away from it.

Scale posture: the gate is a map-side-combined distinct-count over
8-byte hashes — one scan, a tiny shuffle, a scalar to the driver. It
costs one extra job (~0.2 s at sf0.1, dominated by job latency) and is
the reason duplicate-free corpora no longer pay the canonicalization
premium. Callers that know their corpus can pin ``True``/``False``
explicitly; ``"auto"`` is the default everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Duplication factor n/d at which canonicalization turns on in "auto"
#: mode. Below it the fixed machinery cost (3 extra shuffles) outweighs
#: the ≤ ratio² pair-work reduction at every measured scale; above it
#: the reduction dominates.
AUTO_RATIO = 3.0


def duplication_factor(df: DataFrame, key: Column) -> float:
    """Corpus duplication factor n / count(distinct xxhash64(key)).

    1.0 = all distinct; D = every item has D exact copies on average.
    One aggregate job; the hash keeps the distinct shuffle at 8 bytes a
    row regardless of how wide ``key`` is (full document text, a
    64-float embedding). Empty input → 1.0 (nothing to canonicalize).
    """
    row = df.select(F.count("*").alias("n"),
                    F.count_distinct(F.xxhash64(key)).alias("d")).first()
    if not row.d:
        return 1.0
    return row.n / row.d


def resolve(df: DataFrame, key: Column,
            mode: bool | str, ratio: float = AUTO_RATIO) -> bool:
    """Resolve a ``dedup_identical`` argument to a concrete bool.

    ``True``/``False`` pass through (explicit pins, used by the
    differential tests to force both paths); ``"auto"`` runs the
    pre-aggregate and fires at duplication factor >= ``ratio``.
    """
    if mode == "auto":
        return duplication_factor(df, key) >= ratio
    return bool(mode)
