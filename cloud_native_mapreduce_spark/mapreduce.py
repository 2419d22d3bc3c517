"""MapReduce job-spec façade: the reference's entire user-facing API,
re-expressed on Spark.

Reference surface (SURVEY.md §2 J1/E1/E2, §2.1): a client submits a
``MapReduceSpec`` naming input files, task counts, and user-supplied
Python mapper/reducer *scripts*; the framework byte-shards the input,
pipes shard lines through ``python3 <mapper>`` stdin/stdout, hash-
partitions the ``key\tvalue`` output lines on the key prefix, sorts each
reduce partition lexicographically, pipes the sorted lines through
``python3 <reducer>``, and writes one output file per reducer
(cmd/master/mr_master.go:26-100, cmd/azure/azure_util.go:156-257,
cmd/worker/mr_worker.go:163-249).

Spark mapping — this is the ONLY RDD-level code in the engine, because
the Hadoop-Streaming pipe contract is inherently line/partition
imperative:

=========================  =========================================
reference mechanism        Spark primitive
=========================  =========================================
byte-shard planner (S2)    ``sc.textFile(minPartitions=M)`` — Spark's
                           FileInputFormat does size-balanced splits
                           with line realignment natively
mapper pipe (M1)           ``rdd.pipe(cmd, checkCode=True)``
FNV-hash shuffle (P1/P2)   ``repartitionAndSortWithinPartitions`` with
                           ``portable_hash`` on the key prefix (§2 P1:
                           partition *assignment* parity is explicitly
                           a non-goal; per-key results are identical)
partition sort (R1)        the same transformation's keyfunc ordering
reducer pipe (R2)          ``rdd.pipe(cmd, checkCode=True)``
one blob per reducer       ``saveAsTextFile`` (one part file per
                           partition)
infinite task retry (D1)   ``spark.task.maxFailures`` + lineage
checkpoint/resume (F2)     lineage recompute; no state to persist
=========================  =========================================

Scale posture: the pipe path streams partition → child-process stdin →
stdout without materializing a partition in memory; the shuffle is
Spark's spillable sort shuffle (the reference's whole-partition
in-memory ``sort.Strings`` was its 2 GiB ceiling — SURVEY.md §4.5).
Native-callable jobs (Python functions instead of scripts) skip the
child process entirely.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator

from pyspark.rdd import portable_hash
from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class MapReduceSpec:
    """Job spec mirroring the reference's MapReduceSpec
    (cmd/master/master_utils.go:21-30), minus cloud plumbing.

    ``mapper`` / ``reducer`` may each be:
      * a path to an executable Python script (Hadoop-Streaming
        contract: lines on stdin → lines on stdout), or
      * a Python callable (native fast path; see ``submit_job``).
    """
    input_paths: tuple[str, ...]
    mapper: str | Callable[[str], Iterable[tuple[str, str]]]
    reducer: str | Callable[[str, list[str]], Iterable[tuple[str, str]]]
    num_map_tasks: int = 8
    num_reduce_tasks: int = 4
    job_id: int = 0
    user_id: str = "local"
    key_sep: str = "\t"
    extra_env: dict[str, str] = field(default_factory=dict)
    # Cluster deployments MUST set an executor-reachable URI (hdfs://…,
    # s3a://…, a shared file:// mount). None = driver-local tmp, which is
    # only correct on local[*] — submit_job refuses it on a cluster.
    output_dir: str | None = None


def _key_of(line: str, sep: str) -> str:
    """Key = bytes before the first separator — the reference's only
    structural convention (cmd/azure/azure_util.go:241)."""
    idx = line.find(sep)
    return line if idx < 0 else line[:idx]


def _pipe_cmd(script: str) -> str:
    """Command string for RDD.pipe. The reference executes
    ``python3 -c <source>``; invoking the script file is the same
    stdin/stdout contract without shell-quoting hazards."""
    return f"python3 {script}"


def _shuffled(mapped, spec: MapReduceSpec):
    """Hash-partition mapper output on the key prefix and sort each
    reduce partition lexicographically (reference P1 + R1).

    Keyed by ``(key, line)`` so the partitioner sees only the key while
    the sort covers the full line — byte-equivalent ordering to the
    reference's whole-line ``sort.Strings`` because keys never contain
    the separator and the separator sorts below every key byte.
    """
    sep = spec.key_sep
    keyed = mapped.map(lambda ln: ((_key_of(ln, sep), ln), None))
    parts = keyed.repartitionAndSortWithinPartitions(
        numPartitions=spec.num_reduce_tasks,
        partitionFunc=lambda k: portable_hash(k[0]))
    return parts.map(lambda kv: kv[0][1])


def _run_pipe_job(spark: SparkSession, spec: MapReduceSpec):
    sc = spark.sparkContext
    lines = sc.textFile(",".join(spec.input_paths),
                        minPartitions=spec.num_map_tasks)
    env = dict(spec.extra_env) or None
    mapped = lines.pipe(_pipe_cmd(spec.mapper), env=env, checkCode=True)
    sorted_lines = _shuffled(mapped, spec)
    return sorted_lines.pipe(_pipe_cmd(spec.reducer), env=env,
                             checkCode=True)


def _run_native_job(spark: SparkSession, spec: MapReduceSpec):
    """Native path: mapper/reducer are Python callables — no child
    process, no line (re-)parsing anywhere. mapper(line) → iterable of
    (k, v); reducer(key, [values]) → iterable of (k, v). Returns the
    (key, value) pair RDD: keys containing key_sep are perfectly legal
    here (the no-separator-in-key invariant binds only the pipe path,
    whose lines genuinely are text)."""
    mapper, reducer = spec.mapper, spec.reducer
    sc = spark.sparkContext
    lines = sc.textFile(",".join(spec.input_paths),
                        minPartitions=spec.num_map_tasks)
    mapped = lines.flatMap(
        lambda ln: ((str(k), str(v)) for k, v in mapper(ln)))
    parts = mapped.repartitionAndSortWithinPartitions(
        numPartitions=spec.num_reduce_tasks,
        partitionFunc=portable_hash)

    def reduce_partition(it: Iterator[tuple[str, str]]):
        cur_key, vals = None, []
        for k, v in it:
            if k != cur_key:
                if cur_key is not None:
                    yield from reducer(cur_key, vals)
                cur_key, vals = k, []
            vals.append(v)
        if cur_key is not None:
            yield from reducer(cur_key, vals)

    return (parts.mapPartitions(reduce_partition)
                 .map(lambda kv: (str(kv[0]), str(kv[1]))))


def _default_local_dir(spark: SparkSession, kind: str, suffix: str = "") -> str:
    """Driver-local tmp dir — valid ONLY on local[*], where driver and
    executors share one filesystem. On a cluster a driver-local path is
    silently wrong (executors write to their own disks), so refuse."""
    master = spark.sparkContext.master
    if not master.startswith("local"):
        raise ValueError(
            f"no {kind} URI given and master is {master!r}: on a cluster "
            f"pass an executor-reachable URI (hdfs://…, s3a://…, or a "
            f"shared file:// mount); driver-local tmp is only correct on "
            f"local[*]")
    d = tempfile.mkdtemp(prefix=f"mr_{kind}_")
    return os.path.join(d, suffix) if suffix else d


def _list_part_files(spark: SparkSession, output_dir: str) -> list[str]:
    """Path-scheme-aware listing of the job's part files via the Hadoop
    FileSystem API — works for file:, hdfs:, s3a:, … (os.listdir only
    ever worked for driver-local paths). Local files come back as plain
    paths (open()-able); remote ones as full URIs."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(output_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(path):
        p = st.getPath()
        if p.getName().startswith("part-"):
            uri = p.toUri()
            local = uri.getScheme() in (None, "file")
            out.append(uri.getPath() if local else p.toString())
    return sorted(out)


def submit_job(spark: SparkSession, spec: MapReduceSpec,
               output_dir: str | None = None) -> list[str]:
    """Run a MapReduce job end-to-end and return output file paths —
    the reference's ``MapReduce(mrSpec) ([]string, error)`` entry point
    (cmd/master/mr_master.go:26-100) + HTTP handler response shape
    (cmd/master/http_server.go:52-57).

    ``output_dir`` (argument, else ``spec.output_dir``) may be any
    Hadoop-filesystem URI; both the text write and the part-file listing
    are scheme-aware. With neither set, a driver-local tmp dir is used —
    allowed only on local[*] masters (see ``_default_local_dir``)."""
    if output_dir is None:
        output_dir = spec.output_dir
    if output_dir is None:
        output_dir = _default_local_dir(
            spark, "out", f"{spec.user_id}_j{spec.job_id}")
    from pyspark.sql import functions as F
    (result_df(spark, spec)
     .select(F.concat_ws(spec.key_sep, "key", "value").alias("value"))
     .write.mode("overwrite").text(output_dir))
    return _list_part_files(spark, output_dir)


def result_df(spark: SparkSession, spec: MapReduceSpec) -> DataFrame:
    """The job's output as a lazy 2-column DataFrame
    ``(key string, value string)`` — the engine-native view of the same
    computation (nothing materializes until an action runs)."""
    if callable(spec.mapper) != callable(spec.reducer):
        raise TypeError("mapper and reducer must both be scripts or "
                        "both be callables")
    if callable(spec.mapper):
        # native path: (k, v) tuples end-to-end — never serialized to a
        # line, so a key containing key_sep cannot corrupt the boundary
        pairs = _run_native_job(spark, spec)
    else:
        sep = spec.key_sep
        pairs = _run_pipe_job(spark, spec).map(
            lambda ln: tuple(ln.split(sep, 1)) if sep in ln else (ln, ""))
    return spark.createDataFrame(pairs, schema="key string, value string")


# --- word count via the pipe path (the reference's validated workload) ----

_SCRIPTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def wordcount_spec(input_paths: Iterable[str],
                   num_map_tasks: int = 8,
                   num_reduce_tasks: int = 4) -> MapReduceSpec:
    """The demo job (client/mr_spec.json): word count with the
    reference's tokenizer, as external pipe scripts."""
    return MapReduceSpec(
        input_paths=tuple(input_paths),
        mapper=os.path.join(_SCRIPTS_DIR, "wordcount_mapper.py"),
        reducer=os.path.join(_SCRIPTS_DIR, "wordcount_reducer.py"),
        num_map_tasks=num_map_tasks,
        num_reduce_tasks=num_reduce_tasks)


def pipe_word_count(spark: SparkSession, sf_dir: str,
                    staging_dir: str | None = None) -> DataFrame:
    """Word count over the documents corpus executed through the FULL
    Hadoop-Streaming pipe path (textFile → pipe mapper → hash-partition
    + sort → pipe reducer), returned as ``(word, cnt)``.

    The documents table is exported once per call to a text staging dir
    (one line per row; tokens never span lines, so line-splitting is
    count-preserving for this tokenizer). ``staging_dir`` may be any
    Hadoop-filesystem URI (both the export write and the textFile read
    are scheme-aware); on a cluster it is REQUIRED — the driver-local
    tmp default is refused off local[*].
    """
    from pyspark.sql import functions as F
    from cloud_native_mapreduce_spark.sources.tables import load_table

    stage = staging_dir or _default_local_dir(spark, "in")
    docs = load_table(spark, sf_dir, "documents")
    (docs.select(F.coalesce(F.col("text"), F.lit("")).alias("value"))
         .write.mode("overwrite").text(stage))
    out = result_df(spark, wordcount_spec([stage]))
    return out.select(F.col("key").alias("word"),
                      F.col("value").cast("bigint").alias("cnt"))
