"""Custom connector via the Python DataSource API (Spark 4).

The reference's only "connector" is hand-rolled Azure-blob I/O
(SURVEY.md §2 S3). Spark's answer is a pluggable source: this module
registers a deterministic synthetic-corpus source exercising the full
connector contract — schema declaration, partition planning (the
reference's shard planner, S2), and per-partition iteration — in ~50
lines of Python, batch and streaming-ready.

Usage:
    register(spark)
    df = (spark.read.format("synthetic_corpus")
          .option("n_docs", 1000).option("n_partitions", 8).load())

Every value is a pure function of (doc_id), so reads are idempotent and
retry-safe — the same property the reference gets from deterministic
blob names + overwrite (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel", "india", "juliet")


def _doc_text(doc_id: int) -> str:
    # deterministic pseudo-text: word choice driven by a splitmix-style
    # integer mix of the doc id — no RNG state, identical on every read
    words = []
    x = (doc_id * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) % (1 << 64)
    for i in range(5 + doc_id % 7):
        x = (x ^ (x >> 31)) * 0x94D049BB133111EB % (1 << 64)
        words.append(_WORDS[x % len(_WORDS)])
    return " ".join(words)


class SyntheticCorpusDataSource(DataSource):
    """doc_id + deterministic text, sharded into n_partitions splits."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> "SyntheticCorpusReader":
        return SyntheticCorpusReader(
            n_docs=int(self.options.get("n_docs", 100)),
            n_partitions=int(self.options.get("n_partitions", 4)))


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, n_docs: int, n_partitions: int) -> None:
        self._n = n_docs
        self._p = max(1, n_partitions)

    def partitions(self):
        # size-balanced split planning — the S2 shard planner's job,
        # expressed as the connector contract intends
        return [InputPartition(i) for i in range(self._p)]

    def read(self, partition: InputPartition):
        # contiguous doc ranges per partition; executor-side generator
        start = partition.value * self._n // self._p
        end = (partition.value + 1) * self._n // self._p
        for doc_id in range(start, end):
            yield (doc_id, _doc_text(doc_id))


def register(spark) -> None:
    """Register the source on this session. Idempotent."""
    if not getattr(spark, "_cnms_custom_source", False):
        spark.dataSource.register(SyntheticCorpusDataSource)
        spark._cnms_custom_source = True
