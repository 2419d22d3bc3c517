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
