"""Small-edit-distance vocabulary matching via symmetric-delete
blocking (distance 1 or 2), plus frequency-prior typo
canonicalization on top.

North-star scope (the reference has no fuzzy-matching surface): record
linkage / typo clustering is a standard curation step — map misspelled
or OCR-mangled tokens onto their canonical forms before dedup and
quality scoring. The naive formulation is an all-pairs levenshtein
over the vocabulary (quadratic — a non-starter at web-corpus vocab
sizes); this operator is the SymSpell / FastSS symmetric-delete
construction (Bocek et al., "Fast Similarity Search in Large
Dictionaries", U. Zurich TR 2007):

  two words are within edit distance k  ⇔  their depth-k delete
  neighborhoods ({word} ∪ deletions ∪ ... ∪ k-fold deletions)
  intersect,

so candidates come from ONE equality join on delete-keys (postings
linear in the vocab: len+1 keys per word at depth 1, O(len²/2) at
depth 2), and an explicit `levenshtein <= k` filter keeps precision
exact (key-sharing pairs can exceed k — e.g. 'abc'/'bca' share 'bc').
Recall is exact too, per the equivalence above — unlike prefix- or
soundex-blocking there is no blocking-miss semantics knob for the
oracle to mirror.

Scale posture at 100 TB:
  * runs over the word-frequency table (corpus touched once, same
    vocab trick as `functions/bpe`) — postings are Σ(len+1) over the
    VOCAB, not the corpus;
  * the candidate join is a keyed equality join; per-key groups are
    naturally tiny (a key collides only with the ≤ alphabet-size ×
    length words one edit away from it), so no hot-bucket cap is
    needed — there is no power-law key here by construction;
  * levenshtein runs JVM-side (`F.levenshtein`) on candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: Minimum word length: shorter words produce degenerate 2-3 char
#: delete keys whose matches are noise ('the'~'she'), and the short
#: head of the vocab is where Zipf mass concentrates.
MIN_LEN = 4

def _d1(s: str) -> str:
    """SQL fragment: array of all single-char deletions of `s`
    (repeated letters give duplicate deletions: 'food' -> 'fod'
    twice — deduped at the key level)."""
    return (f"transform(sequence(1, length({s})), "
            f"i -> concat(substr({s}, 1, i - 1), "
            f"substr({s}, i + 1, length({s}))))")


#: depth-1 delete neighborhood: the word plus every single deletion.
_DELETE_KEYS_1 = f"array_distinct(concat(array(word), {_d1('word')}))"

#: depth-2: additionally every deletion of every deletion — the
#: SymSpell property extends: lev(a, b) <= 2 ⇒ their depth-2 delete
#: neighborhoods intersect, so recall stays exact at max_edits=2.
_DELETE_KEYS_2 = (
    f"array_distinct(concat(array(word), {_d1('word')}, "
    f"flatten(transform({_d1('word')}, d -> {_d1('d')}))))")


def fuzzy_token_join(docs: DataFrame, text_col: str = "text",
                     max_edits: int = 1) -> DataFrame:
    """All vocabulary pairs within edit distance `max_edits` (1 or 2;
    words of length >= MIN_LEN), with corpus frequencies: (word_a,
    word_b, cnt_a, cnt_b), word_a < word_b. Exact — symmetric-delete
    candidates at matching depth + levenshtein verify. Depth-2 key
    fan-out is O(len²/2) per vocab word — still linear in the vocab,
    never all-pairs."""
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    keys = _DELETE_KEYS_1 if max_edits == 1 else _DELETE_KEYS_2
    wc = (docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
          .where(F.length("word") >= MIN_LEN)
          .groupBy("word").agg(F.count("*").alias("cnt")))
    posting = wc.select("word", "cnt",
                        F.explode(F.expr(keys)).alias("key"))
    a = posting.select(F.col("key"), F.col("word").alias("word_a"),
                       F.col("cnt").alias("cnt_a"))
    b = posting.select(F.col("key"), F.col("word").alias("word_b"),
                       F.col("cnt").alias("cnt_b"))
    return (a.join(b, "key")
            .where(F.col("word_a") < F.col("word_b"))
            .select("word_a", "word_b", "cnt_a", "cnt_b")
            .distinct()
            .where(F.levenshtein("word_a", "word_b") <= max_edits))


def typo_canonicalize(docs: DataFrame, text_col: str = "text",
                      min_ratio: int = 10) -> DataFrame:
    """Spell-correction canonicalization map: for each vocabulary word,
    the edit-distance-1 neighbor that is at least `min_ratio`× more
    frequent (the classic Norvig-style corpus prior — a typo is rare,
    its correction is common). Returns (typo, canonical, cnt_typo,
    cnt_canonical); each typo maps to its MOST frequent qualifying
    neighbor, ties broken by lexicographically smallest canonical so
    the map is deterministic and value-level oracle-able.

    Built on the exact symmetric-delete candidates of
    `fuzzy_token_join` — the corrective step a curation pipeline runs
    between tokenization and dedup, with the same never-all-pairs
    scale shape.
    """
    from pyspark.sql import Window
    pairs = fuzzy_token_join(docs, text_col, max_edits=1)
    directed = (pairs.select(
        F.col("word_a").alias("typo"), F.col("cnt_a").alias("cnt_typo"),
        F.col("word_b").alias("canonical"),
        F.col("cnt_b").alias("cnt_canonical"))
        .unionAll(pairs.select(
            F.col("word_b").alias("typo"),
            F.col("cnt_b").alias("cnt_typo"),
            F.col("word_a").alias("canonical"),
            F.col("cnt_a").alias("cnt_canonical")))
        .where(F.col("cnt_canonical") >= min_ratio * F.col("cnt_typo")))
    w = Window.partitionBy("typo").orderBy(
        F.col("cnt_canonical").desc(), F.col("canonical").asc())
    return (directed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("typo", "canonical", "cnt_typo", "cnt_canonical"))
