"""BPE merge training: hand-built semantics + cross-engine replace
parity on the overlapping-run edge (`functions/bpe.py`)."""

from __future__ import annotations

from cloud_native_mapreduce_spark.functions.bpe import bpe_train_merges


def _train(spark, texts, n_merges):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    rows = bpe_train_merges(docs, n_merges=n_merges).collect()
    return sorted((r.merge_rank, r.pair, r.merged, r.pair_count)
                  for r in rows)


def test_textbook_merge_order(spark):
    # 'low' x4, 'lower' x2: round 1 the pair (l,o) and (o,w) both
    # occur 6 times -> tie broken lexicographically: 'l o' wins.
    got = _train(spark, ["low low low low lower lower"], 2)
    assert got[0] == (1, "l o", "lo", 6)
    # after fusing 'lo', pair (lo, w) occurs 6 times and wins round 2
    assert got[1] == (2, "lo w", "low", 6)


def test_merged_symbol_participates_in_later_pairs(spark):
    # 'aaab' x3: round 1 (a,a) counts 2 per word (overlap counted at
    # the pair-count stage: positions 1-2 and 2-3) -> 6.
    got = _train(spark, ["aaab aaab aaab"], 2)
    assert got[0] == (1, "a a", "aa", 6)
    # rewrite is LEFT-TO-RIGHT NON-OVERLAPPING: 'a a a b' -> 'aa a b',
    # so round 2 counts (aa,a)=3 and (a,b)=3 -> tie, 'a b' wins lex.
    assert got[1] == (2, "a b", "ab", 3)


def test_overlap_rewrite_matches_duckdb(spark, duck):
    # The engine-parity pin for the greedy tokenwise fuse: runs of
    # the same symbol ('aaaa') exercise exactly the adjacency a
    # boundary-consuming string replace would mis-merge.
    from cloud_native_mapreduce_spark.registry import _bpe_fuse_sql
    texts = ["aaaa aaaa aa baab", "aaab caa aaaa"]
    got = _train(spark, texts, 3)
    corpus = " ".join(texts)
    rounds = []
    for k in range(1, 4):
        prev = f"r{k - 1}"
        rounds.append(f"""
        p{k} AS (
          SELECT pair, sum(cnt) AS c
          FROM (SELECT cnt,
                       unnest([arr[i] || ' ' || arr[i+1]
                               for i in generate_series(1, len(arr) - 1)])
                       AS pair
                FROM (SELECT cnt, string_split(trim(seq), ' ') AS arr
                      FROM {prev})
                WHERE len(arr) > 1)
          GROUP BY pair),
        b{k} AS (SELECT pair, c, string_split(pair, ' ')[1] AS a,
                        string_split(pair, ' ')[2] AS b
                 FROM p{k} ORDER BY c DESC, pair ASC LIMIT 1),
        r{k} AS (SELECT cnt,
                 CASE WHEN bb.a IS NULL THEN seq
                      ELSE {_bpe_fuse_sql('seq', 'bb.a', 'bb.b')} END
                     AS seq
                 FROM {prev} LEFT JOIN b{k} bb ON TRUE)""")
    selects = "\n        UNION ALL\n".join(
        f"        SELECT {k} AS merge_rank, pair,"
        f" replace(pair, ' ', '') AS merged, c FROM b{k}"
        for k in range(1, 4))
    sql = f"""
    WITH wc AS (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split('{corpus}', ' ')) AS word)
      GROUP BY word),
    r0 AS (SELECT cnt,
           ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
           FROM wc),{','.join(rounds)}
{selects}
    """
    want = sorted((int(r[0]), r[1], r[2], int(r[3]))
                  for r in duck.execute(sql).fetchall())
    assert got == want


def test_train_apply_roundtrip(spark):
    from cloud_native_mapreduce_spark.functions.bpe import (
        segment_vocab, subword_counts)
    docs = spark.createDataFrame(
        [(1, "low low low low lower lower")],
        "doc_id long, text string")
    seg = {r.word: r.seg for r in
           segment_vocab(docs, [("l o", "lo"), ("lo w", "low")])
           .collect()}
    # 'low' fully fuses; 'lower' becomes low+e+r
    assert seg == {"low": "low", "lower": "low e r"}
    got = {r.doc_id: r.n_subwords for r in
           subword_counts(docs, [("l o", "lo"), ("lo w", "low")])
           .collect()}
    # 4x 'low' (1 subword) + 2x 'lower' (3 subwords) = 10
    assert got == {1: 10}


def test_segment_without_merges_is_characters(spark):
    from cloud_native_mapreduce_spark.functions.bpe import segment_vocab
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    assert segment_vocab(docs, []).collect()[0].seg == "a b c"


def test_empty_corpus_yields_no_merges(spark):
    from cloud_native_mapreduce_spark.functions.bpe import bpe_train_merges
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train_merges(docs, n_merges=3).count() == 0


def test_single_char_vocab_yields_no_merges(spark):
    # every word is one symbol -> no adjacent pairs in any round
    from cloud_native_mapreduce_spark.functions.bpe import bpe_train_merges
    docs = spark.createDataFrame([(1, "a b a c")],
                                 "doc_id long, text string")
    assert bpe_train_merges(docs, n_merges=2).count() == 0
