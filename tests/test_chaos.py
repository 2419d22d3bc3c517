"""Fault-injection parity (reference F4).

The reference chaos-tests by killing workers/masters mid-job and
asserting the output still validates (kubernetes/worker-failure-
deployment.yaml:32-33, cmd/master/mr_master.go:298-303,
cmd/worker/mr_worker.go:105-112). The Spark analogue of a killed worker
is a failed task attempt: Spark's DAG scheduler re-runs the attempt from
lineage. This test injects a first-attempt failure in every map task via
TaskContext.attemptNumber() and asserts the job output still matches the
golden word count.

Task retries need ``local[N, maxFailures]`` at SparkContext creation, so
the job runs in a subprocess — the session-scoped fixture context (which
has maxFailures=1, failures fatal) cannot be reused.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_CHAOS_JOB = textwrap.dedent("""
    import collections, re, sys
    sys.path.insert(0, {repo!r})
    from pyspark import TaskContext
    from cloud_native_mapreduce_spark import mapreduce as MR
    from cloud_native_mapreduce_spark.session import get_spark

    TOKEN = re.compile(r"[a-z](?:[a-z'\\u2018\\u2019]*[a-z])?")
    CORPUS = ["the quick brown fox", "jumps over the lazy dog",
              "the fox again", "dog days", "", "over and over and over"]

    import os, tempfile
    d = tempfile.mkdtemp(prefix="chaos_corpus_")
    for i in range(3):
        with open(os.path.join(d, f"{{i}}.txt"), "w") as fh:
            fh.write("\\n".join(CORPUS[i * 2:i * 2 + 2]))

    # local[4,2]: 4 threads, maxFailures=2 — one retry per task
    spark = get_spark("chaos", master="local[4,2]",
                      extra_conf={{"spark.ui.enabled": "false"}})

    def mapper(line):
        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            raise RuntimeError("chaos: injected first-attempt failure "
                               f"(partition {{tc.partitionId()}})")
        for tok in TOKEN.findall(line.lower()):
            yield tok, 1

    def reducer(key, values):
        yield key, sum(int(v) for v in values)

    spec = MR.MapReduceSpec(input_paths=(d,), mapper=mapper,
                            reducer=reducer, num_map_tasks=3,
                            num_reduce_tasks=2)
    got = {{r["key"]: int(r["value"])
           for r in MR.result_df(spark, spec).collect()}}
    golden = collections.Counter()
    for ln in CORPUS:
        golden.update(TOKEN.findall(ln.lower()))
    assert got == dict(golden), f"chaos output diverged: {{got}}"
    print("CHAOS_OK", len(got))
    spark.stop()
""")


def test_first_attempt_failure_recovers_golden_output(tmp_path):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CHAOS_JOB.format(repo=repo)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CHAOS_OK" in proc.stdout
    # the injection genuinely fired: Spark logged the failed attempts
    assert "chaos: injected first-attempt failure" in (
        proc.stderr + proc.stdout)
