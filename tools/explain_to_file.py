"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/explain_to_file.py <tag> <suffix> <query> [query ...]
e.g.   python tools/explain_to_file.py r14 before bootstrap_ci_mean
Writes plans/r14/bootstrap_ci_mean_before.txt (sf dir from
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402
from cloud_native_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
