"""Per-round trend line for the headline-EXCLUDED heavies.

bench.py deliberately excludes work-bound queries (the kcore_full
rule: one ~20-50 s line would dominate the headline total and drown
the movers the headline exists to catch), which left their round-
over-round trend living only in sf1 soak lines — min-of-1 and
machine-sensitive (round-12 verdict, "What's missing" #4). This tool
gives the excluded set the same measurement discipline as the
headline: load-gated, min-of-2 through the noop sink, fresh JVM —
and APPENDS one JSON line per run to HEAVY_BENCH.jsonl at the repo
root, so the file accumulates the cross-round trend.

Usage: python tools/heavy_bench.py [query ...]   (default: the
current exclusion list below; sf dir from $SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402
from cloud_native_mapreduce_spark.session import get_spark  # noqa: E402

#: The headline exclusion list (each documented in bench.py where it
#: was cut): iteration- or work-bound queries whose wall time is a
#: property of the algorithm, not the plan.
HEAVIES = ["kcore_full", "ktruss_edges", "jaccard_prefix_join",
           "jaccard_join_summary", "local_bridges",
           "pca_top2_components"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEAVIES
    deadline = time.time() + 600  # bounded like bench.py's gate
    while os.getloadavg()[0] >= 1.5 and time.time() < deadline:
        time.sleep(5)
    spark = get_spark("heavy_bench", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in names:
        spec = QUERIES[name]

        def one() -> float:
            t0 = time.time()
            (spec.builder(spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            return time.time() - t0

        timings[name] = round(min(one(), one()), 3)
        spark.catalog.clearCache()
    spark.stop()
    line = {"sf_dir": sf_dir, "queries": timings,
            "loadavg_1m": round(os.getloadavg()[0], 2)}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "..", "HEAVY_BENCH.jsonl")
    with open(os.path.normpath(path), "a") as f:
        f.write(json.dumps(line, separators=(",", ":")) + "\n")
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
