"""Word-count golden tests: tokenizer parity with the reference's mapper
regex (client/scripts/mapper.py:13) and reducer semantics
(client/scripts/reducer.py:14-27), validated against an independent
single-process Python implementation — the same strategy as the reference's
golden harness (SURVEY.md §5)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Row

from cloud_native_mapreduce_spark.functions.text import WORD_RE, word_count

# independent oracle implementation (plain Python re, like
# generate/gen_word_count.py in the reference validation harness)
_PY_RE = re.compile(WORD_RE)


def py_word_count(texts):
    c = Counter()
    for t in texts:
        c.update(_PY_RE.findall(t.lower()))
    return dict(c)


EDGE_CASES = [
    "The quick brown fox",                 # mixed case
    "don't can't won't",                   # ASCII apostrophe inside word
    "it‘s o’clock",                        # Unicode apostrophes inside words
    "'leading trailing' 'both'",           # apostrophes stripped at edges
    "a b c single letters",                # single-letter words
    "digits123 and42mixed 99",             # digits break tokens
    "",                                    # empty line
    "  spaces\t\ttabs  ",                  # whitespace only-ish
    "rock'n'roll",                         # multiple internal apostrophes
]


def test_tokenizer_parity_edge_cases(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t)
                                for i, t in enumerate(EDGE_CASES)])
    got = {r["word"]: r["cnt"] for r in word_count(df).collect()}
    want = py_word_count(EDGE_CASES)
    assert got == want


def test_word_count_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["word"]: r["cnt"] for r in word_count(docs).collect()}
    want = py_word_count([r["text"] for r in docs.select("text").collect()])
    assert got == want
    # invariant from the reference validator: sum of counts == token count
    assert sum(got.values()) == sum(want.values())


def test_word_count_is_distributed(spark, sf_dir):
    # plan must contain a partial/final hash aggregate, not a collect
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = word_count(docs)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan


def test_ship_package_is_idempotent(spark):
    """ship_package zips the package onto executors via addPyFile; a
    second call must be a no-op (addPyFile would warn/fail on dup)."""
    from cloud_native_mapreduce_spark.session import ship_package
    ship_package(spark)
    ship_package(spark)
    assert getattr(spark, "_cnms_shipped", False)
