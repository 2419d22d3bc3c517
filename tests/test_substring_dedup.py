"""Semantic pins for duplicate-substring detection (Lee et al. span
hashing): constructed corpora with known answers, the independent
check beside the registry's value-level oracle."""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def _stats(spark, texts, k=10):
    from cloud_native_mapreduce_spark.dedup import substring
    out = substring.duplicate_span_stats(_docs(spark, texts), k=k)
    return {r["doc_id"]: (r["n_spans"], r["n_dup_spans"],
                          r["dup_ratio"]) for r in out.collect()}


def test_shared_span_counts_both_sides(spark):
    """Two docs sharing one exact 10-token run (unique elsewhere):
    each has exactly one duplicated span; a third all-unique doc has
    zero. Span counts are n_tokens - k + 1."""
    shared = " ".join("common" + chr(97 + i) for i in range(10))
    a = "aa bb cc " + shared + " dd ee"
    b = "ff gg " + shared + " hh ii jj"
    c = " ".join("only" + chr(97 + i) for i in range(15))
    got = _stats(spark, [a, b, c])
    # a: 15 tokens -> 6 spans; b: 15 tokens -> 6 spans; c: 15 -> 6
    assert got[0] == (6, 1, round(1 / 6, 4))
    assert got[1] == (6, 1, round(1 / 6, 4))
    assert got[2] == (6, 0, 0.0)


def test_self_repetition_counts(spark):
    """A doc that repeats its own 10-token block twice back-to-back:
    every span that lies inside one period duplicates its twin one
    period later — self-repetition is duplication (the paper's
    within-document case). NOTE tokens must be pure letters: the
    reference tokenizer regex excludes digits."""
    block = " ".join("w" + chr(97 + i) for i in range(10))
    got = _stats(spark, [block + " " + block])
    n_spans, n_dup, ratio = got[0]
    assert n_spans == 11  # 20 tokens
    # spans at offsets 0 and 10 are identical; every other span is
    # unique (w_i sequences shifted across the seam differ)
    assert n_dup == 2
    assert ratio == round(2 / 11, 4)


def test_short_docs_surface_with_zero_spans(spark):
    got = _stats(spark, ["one two three", ""])
    assert got[0] == (0, 0, 0.0)
    assert got[1] == (0, 0, 0.0)


def test_exact_duplicate_docs_fully_covered(spark):
    """Byte-identical docs: every span duplicated, ratio 1.0."""
    t = " ".join("tok" + chr(97 + i) for i in range(25))
    got = _stats(spark, [t, t])
    assert got[0] == got[1] == (16, 16, 1.0)
