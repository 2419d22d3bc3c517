"""Streaming sinks: the foreachBatch production pattern.

Structured Streaming's built-in file sink is append-only; real pipelines
need arbitrary batch logic (upsert, partition overwrite, external
systems). `foreachBatch` hands each micro-batch to a plain batch
function together with a monotonically increasing `batch_id` that is
STABLE ACROSS RETRIES — after a crash the engine replays the same batch
with the same id. Exactly-once delivery therefore reduces to making the
batch write idempotent in `batch_id`, which `partition-overwrite by
batch id` gives for free: a replay overwrites its own partition instead
of appending duplicates.

This mirrors the reference's recovery design — deterministic blob names
+ idempotent overwrite + per-task checkpoint (SURVEY.md §1.3, §2 F2:
cmd/master/master_replicate.go:10-72) — re-expressed on Spark's
checkpointed source-offset tracking.

Scale posture: each micro-batch write is a normal distributed batch job;
nothing funnels through the driver. The partition-per-batch layout also
keeps the sink append-cheap (no read-modify-write of existing data).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_batch_writer(out_dir: str):
    """Return a foreachBatch function writing each batch to its own
    `batch_id=N` subdirectory with overwrite — replay-safe."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch_id={batch_id}")))
    return write_batch


def run_foreach_batch(sdf: DataFrame, out_dir: str, checkpoint_dir: str,
                      timeout_sec: float = 300.0) -> None:
    """Drain a streaming DataFrame through the idempotent foreachBatch
    sink (AvailableNow trigger), with offsets tracked in
    `checkpoint_dir` so a restart resumes instead of reprocessing."""
    import time
    q = (sdf.writeStream
         .foreachBatch(idempotent_batch_writer(out_dir))
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    deadline = time.time() + timeout_sec
    while q.isActive and time.time() < deadline:
        q.awaitTermination(1)
    if q.isActive:  # pragma: no cover - defensive
        q.stop()
        raise TimeoutError("foreachBatch stream did not finish")
    if q.exception() is not None:  # pragma: no cover - defensive
        raise q.exception()
