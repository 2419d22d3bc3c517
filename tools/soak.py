"""Scale soak: run every registry query's SPARK side at a larger SF.

Correctness is owned by the sf0.01 oracle gate (tools/check_oracle.py)
and pytest; what small SFs cannot stress are the SCALE assumptions —
hot-bucket caps (MAX_BUCKET), packing fan-out (PACK_BUCKETS), hot-set
broadcast caps, partition counts, iterative-loop round counts, driver
collect sizes. This runner materializes every query through the noop
sink at an sf1-scale corpus (see DESIGN.md round-7 for how it's built)
and reports per-query wall time, so a cap that silently turns into a
blowup at 10× data fails HERE, not on a cluster.

Usage: python tools/soak.py <sf_dir> [log_path] [query ...]

Appends one line per query to log_path (default .scratch/soak.log):
  "<name> ok <sec>" or "<name> FAIL <exc-type>: <msg>". Queries already
  marked ok in the log are skipped, so an interrupted soak resumes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402
from cloud_native_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    log_path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/.scratch/soak.log"
    names = sys.argv[3:] or list(QUERIES)

    done: set[str] = set()
    if os.path.exists(log_path):
        with open(log_path) as fh:
            done = {ln.split()[0] for ln in fh if " ok " in ln}

    spark = get_spark("soak")
    spark.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    with open(log_path, "a", buffering=1) as log:
        for name in names:
            if name in done:
                continue
            t0 = time.time()
            try:
                (QUERIES[name].builder(spark, sf_dir)
                 .write.format("noop").mode("overwrite").save())
                log.write(f"{name} ok {time.time() - t0:.2f}\n")
            except Exception as exc:  # noqa: BLE001 — soak must keep going
                n_fail += 1
                msg = str(exc).replace("\n", " ")[:300]
                log.write(f"{name} FAIL {type(exc).__name__}: {msg}\n")
            finally:
                # session hygiene between queries: persisted frames
                # accumulating across a long soak starved Tungsten
                # execution memory at sf3 (round-10 UNABLE_TO_ACQUIRE_
                # MEMORY finding) — same rule bench.py applies
                spark.catalog.clearCache()
    spark.stop()
    print(f"soak done: {len(names) - n_fail}/{len(names)} ok -> {log_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
