"""Per-query job/stage profile: run one registry query through the
noop sink in a fresh session and break its wall time into Spark jobs
and the heaviest stages (duration, task time, shuffle bytes), via the
local UI's REST API.

This is the measurement half of the optimization loop (guide §1): the
bench says *which* query is slow; this says *which stage* of it.

Usage: python tools/profile_query.py <query> [query ...]
       (sf dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402
from cloud_native_mapreduce_spark.session import get_spark  # noqa: E402


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: profile_query.py <query> [query ...]")
        return
    spark = get_spark("profile", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    # warm the JVM once so the first profiled query isn't charged
    # codegen/parquet-reader init (bench.py's warmup discipline)
    import pyspark.sql.functions as F
    (spark.range(1000)
     .select(F.md5(F.col("id").cast("string")).alias("h"))
     .groupBy(F.substring("h", 1, 1)).count().collect())

    for name in names:
        if name not in QUERIES:
            print(f"?? unknown query {name}")
            continue
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        (QUERIES[name].builder(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in _api(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        stages = {s["stageId"]: s for s in _api(
            port, f"applications/{app_id}/stages?status=complete")}
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        rows = []
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            dur = None
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (datetime.strptime(comp.replace("GMT", ""), fmt.replace("%Z", ""))
                       - datetime.strptime(sub.replace("GMT", ""), fmt.replace("%Z", ""))
                       ).total_seconds()
            except Exception:
                pass
            rows.append((j["jobId"], dur, j.get("numTasks", 0),
                         sorted(j.get("stageIds", []))))
        total_dur = sum(d for _, d, _, _ in rows if d)
        print(f"  sum of job durations {total_dur:.2f}s "
              f"(gap to wall = driver/planning time "
              f"{wall - total_dur:.2f}s)")
        rows.sort(key=lambda r: -(r[1] or 0))
        for jid, dur, ntasks, sids in rows[:12]:
            sdesc = []
            for sid in sids:
                st = stages.get(sid)
                if not st:
                    continue
                sdesc.append(
                    f"s{sid}:{st['name'].split(' at ')[0]}"
                    f"[{st['numTasks']}t "
                    f"{st.get('executorRunTime', 0)/1000:.1f}s-task "
                    f"shR={st.get('shuffleReadBytes', 0)>>20}M "
                    f"shW={st.get('shuffleWriteBytes', 0)>>20}M]")
            print(f"  job {jid}: {dur if dur is not None else -1:.2f}s "
                  f"{ntasks}t :: " + " ".join(sdesc[:4]))
        if len(rows) > 12:
            rest = sum(d for _, d, _, _ in rows[12:] if d)
            print(f"  ... {len(rows)-12} more jobs, {rest:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
