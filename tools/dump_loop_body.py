"""Dump loop-BODY plans for iterative operators (round-15, VERDICT r14
item #8): the per-round localCheckpoint turns every round's frame into
a `Scan ExistingRDD` stub in the final explain, so pinned-width / SHJ /
layout claims about loop internals were not plan-verifiable from
plans/<tag>/<query>_{before,after}.txt alone.

Mechanism: ``DataFrame.localCheckpoint`` is wrapped so that every
frame is EXPLAINED at the moment it is checkpointed — i.e. with its
own round's operators still in the plan and all PRIOR rounds already
truncated to stubs. That is exactly "one loop-body plan per round",
from the real operator code, with no reconstruction. The real
checkpoint then proceeds unchanged, so eager loops and convergence
probes behave normally.

Usage: python tools/dump_loop_body.py <tag> <suffix> <query> [query ...]
Writes plans/<tag>/<query>_loop_body_<suffix>.txt (tree sections of
every checkpointed frame, in call order; sf dir from
$SPARK_GRAFT_SF_DIR, default sf0.001 to keep probe replay cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the ABC facade; the concrete
# method lives on the classic subclass — patch that one
try:
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # Spark 3.x
    from pyspark.sql import DataFrame  # type: ignore # noqa: E402

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402
from cloud_native_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    tag, suffix, *names = sys.argv[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("loopdump", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    captured: list[str] = []
    real = DataFrame.localCheckpoint

    def capturing(self, eager=True):
        txt = self._sc._jvm.PythonSQLUtils.explainString(
            self._jdf.queryExecution(), "formatted")
        captured.append(txt.split("\n\n")[0])  # tree section only
        return real(self, eager=eager)

    DataFrame.localCheckpoint = capturing  # type: ignore
    try:
        for name in names:
            captured.clear()
            df = QUERIES[name].builder(spark, sf_dir)
            # force the lazy tail so late-round checkpoints register
            df.write.format("noop").mode("overwrite").save()
            path = os.path.join(out_dir,
                                f"{name}_loop_body_{suffix}.txt")
            with open(path, "w") as f:
                f.write("-- loop-body evidence: each section is the "
                        "plan of a frame AT ITS localCheckpoint call "
                        "(own round un-truncated, prior rounds "
                        "stubs); tree sections only --\n")
                for i, tree in enumerate(captured):
                    f.write(f"\n== checkpoint call {i} ==\n{tree}\n")
            print(f"wrote {path} ({len(captured)} checkpointed "
                  f"frames)")
            spark.catalog.clearCache()
    finally:
        DataFrame.localCheckpoint = real  # type: ignore
    spark.stop()


if __name__ == "__main__":
    main()
