"""Symmetric-delete fuzzy vocabulary join (`dedup/fuzzy.py`):
exact recall per edit operation, precision on key-sharing lev-2
pairs, and frequency carry-through."""

from __future__ import annotations

from cloud_native_mapreduce_spark.dedup.fuzzy import fuzzy_token_join


def _run(spark, texts):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    return sorted((r.word_a, r.word_b, r.cnt_a, r.cnt_b)
                  for r in fuzzy_token_join(docs).collect())


def test_all_three_edit_operations_found(spark):
    got = _run(spark, ["table tible",      # substitution
                       "window windo",     # deletion
                       "merge mergee"])    # insertion
    assert got == [("merge", "mergee", 1, 1),
                   ("table", "tible", 1, 1),
                   ("windo", "window", 1, 1)]


def test_key_sharing_distance_two_pair_is_rejected(spark):
    # 'abcd' and 'bcda' share delete-key 'bcd' but are edit distance 2
    # — the candidate join surfaces them, the levenshtein verify must
    # drop them. 'abcd'/'axyd' (distance 2, no shared key) never even
    # becomes a candidate.
    assert _run(spark, ["abcd bcda axyd"]) == []


def test_frequencies_and_min_len(spark):
    got = _run(spark, ["cart cart carts", "car cat"])
    # 'car'/'cat' are below MIN_LEN=4 and must be ignored
    assert got == [("cart", "carts", 2, 1)]


def test_depth2_exact_vs_brute_force(spark):
    from cloud_native_mapreduce_spark.dedup.fuzzy import fuzzy_token_join

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    words = ["table", "tible", "tuble", "tab", "cable", "fable",
             "tales", "stable", "tablet", "treble", "marble"]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = sorted((r.word_a, r.word_b) for r in
                 fuzzy_token_join(docs, max_edits=2).collect())
    vocab = sorted(w for w in set(words) if len(w) >= 4)
    want = sorted((a, b) for i, a in enumerate(vocab)
                  for b in vocab[i + 1:] if lev(a, b) <= 2)
    assert got == want
    # distance-2-only pairs really are found (recall past depth 1)
    assert ("table", "treble") in got and lev("table", "treble") == 2


def test_typo_canonicalize_picks_dominant_neighbor(spark):
    from cloud_native_mapreduce_spark.dedup.fuzzy import typo_canonicalize
    # 'tible' occurs once; 'table' x20 dominates 'fable' x12 (both
    # distance 1 from... only 'table' is distance 1 from 'tible').
    # 'cable' x5 has no >=10x neighbor and must not map.
    text = " ".join(["table"] * 20 + ["fable"] * 12 + ["tible"]
                    + ["cable"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.typo: (r.canonical, r.cnt_typo, r.cnt_canonical)
           for r in typo_canonicalize(docs).collect()}
    assert got == {"tible": ("table", 1, 20)}


def test_typo_canonicalize_tiebreak_is_lexicographic(spark):
    from cloud_native_mapreduce_spark.dedup.fuzzy import typo_canonicalize
    # 'tible' is distance 1 from both 'table' and 'tibls'? no — build
    # an exact tie: 'wordx' x1 with neighbors 'worda' x10, 'wordb' x10
    text = " ".join(["worda"] * 10 + ["wordb"] * 10 + ["wordx"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.typo: r.canonical for r in typo_canonicalize(docs).collect()}
    assert got["wordx"] == "worda"


def test_empty_corpus_yields_no_pairs(spark):
    from cloud_native_mapreduce_spark.dedup.fuzzy import (
        fuzzy_token_join, typo_canonicalize)
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert fuzzy_token_join(docs).count() == 0
    assert typo_canonicalize(docs).count() == 0
