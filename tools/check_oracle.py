"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs every registry query at a given SF in Spark AND its oracle SQL in
DuckDB, then compares row count, column names (sorted), and an
order-insensitive multiset of rows. Floats are compared exactly first; on
mismatch we report the max absolute deviation so rounding bugs are
distinguishable from logic bugs.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact representation; queries are expected to round in-query
        return repr(v)
    # timestamps/dates → ISO string so pandas/duckdb dtypes don't matter
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_multiset(df, cols):
    return Counter(tuple(_norm_cell(r[c]) for c in cols)
                   for r in df.to_dict("records"))


def check_query(spark, con, name: str, spec, sf_dir: str) -> dict:
    out = {"name": name, "ok": False}
    t0 = time.time()
    sdf = spec.builder(spark, sf_dir)
    spark_pd = sdf.toPandas()
    out["spark_sec"] = round(time.time() - t0, 2)
    out["rows"] = len(spark_pd)
    if spec.oracle is None:
        out["ok"] = True
        out["mode"] = "rows-only"
        return out
    out["mode"] = "oracle"
    duck_pd = con.execute(spec.oracle).df()
    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if s_cols != d_cols:
        out["error"] = f"columns differ: spark={s_cols} duck={d_cols}"
        return out
    if len(spark_pd) != len(duck_pd):
        out["error"] = f"row count: spark={len(spark_pd)} duck={len(duck_pd)}"
        return out
    ms, md = _rows_multiset(spark_pd, s_cols), _rows_multiset(duck_pd, s_cols)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        out["error"] = (f"value mismatch: {sum((ms - md).values())} rows differ; "
                        f"spark-only={only_s} duck-only={only_d}")
        return out
    out["ok"] = True
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    from cloud_native_mapreduce_spark.registry import QUERIES
    from cloud_native_mapreduce_spark.session import get_spark

    spark = get_spark("oracle-check", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    con = duckdb.connect()
    from cloud_native_mapreduce_spark.sources.tables import TABLES
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")

    todo = names or list(QUERIES)
    n_ok = 0
    for name in todo:
        spec = QUERIES[name]
        try:
            res = check_query(spark, con, name, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "ok": False,
                   "error": f"{type(e).__name__}: {str(e)[:400]}"}
        status = "OK  " if res["ok"] else "FAIL"
        n_ok += res["ok"]
        print(f"{status} {name:28s} rows={res.get('rows', '?'):>7} "
              f"{res.get('mode', '')} {res.get('spark_sec', '')}s")
        if not res["ok"]:
            print(f"     {res.get('error')}")
    print(f"\n{n_ok}/{len(todo)} ok")
    spark.stop()
    sys.exit(0 if n_ok == len(todo) else 1)


if __name__ == "__main__":
    main()
