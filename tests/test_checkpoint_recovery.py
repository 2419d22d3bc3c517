"""Streaming checkpoint & resume — the reference's F2 capability
(per-task etcd checkpoints, resume skips completed work) expressed as
Spark Structured Streaming state recovery: a restarted query resumes
from checkpointLocation, reprocesses nothing, and keeps its dedup state
across restarts (exactly-once file sink)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_batch(spark, d, name, rows):
    path = os.path.join(d, "stage_" + name)
    pdf = spark.createDataFrame(rows, "k long, v string")
    pdf.coalesce(1).write.mode("overwrite").parquet(path)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    os.rename(os.path.join(path, part),
              os.path.join(d, "in", name + ".parquet"))


def _run_once(spark, src, ckpt, out):
    sdf = (spark.readStream.schema("k long, v string").parquet(src)
           .dropDuplicates(["k"]))
    q = (sdf.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    assert q.exception() is None


def test_restart_resumes_state_and_skips_done_work(spark, tmp_path):
    d = str(tmp_path)
    src, ckpt, out = (os.path.join(d, "in"), os.path.join(d, "ckpt"),
                      os.path.join(d, "out"))
    os.makedirs(src)

    # run 1: keys 1,2 (2 is duplicated in-batch)
    _write_batch(spark, d, "b1", [(1, "a"), (2, "b"), (2, "b2")])
    _run_once(spark, src, ckpt, out)
    first = spark.read.parquet(out)
    assert first.count() == 2

    # run 2 (a "restarted master"): new file with one new key and two
    # already-seen keys — state survives the restart, so only key 3 lands
    _write_batch(spark, d, "b2", [(2, "dup"), (3, "c"), (1, "dup")])
    _run_once(spark, src, ckpt, out)
    final = spark.read.parquet(out)
    assert final.count() == 3
    assert {r["k"] for r in final.collect()} == {1, 2, 3}
    # and nothing was reprocessed: keys 1,2 keep their first-run values
    vals = {r["k"]: r["v"] for r in final.collect()}
    assert vals[1] == "a" and vals[2] in ("b", "b2")

    # run 3 with NO new input: a no-op restart (the reference's resumed
    # job skipping completed tasks) — output unchanged
    _run_once(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == 3
