"""Every registered query with an oracle must match DuckDB at sf0.001 —
the same gate the driver applies at sf0.01 (order-insensitive multiset
compare after sorting columns by name)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from cloud_native_mapreduce_spark.registry import QUERIES


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _multiset(pdf, cols):
    return Counter(tuple(_norm(r[c]) for c in cols)
                   for r in pdf.to_dict("records"))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    spark_pd = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pd) >= 0  # rows-only check, mirroring the driver
        return
    duck_pd = duck.execute(spec.oracle).df()
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns)
    assert len(spark_pd) == len(duck_pd)
    cols = sorted(spark_pd.columns)
    assert _multiset(spark_pd, cols) == _multiset(duck_pd, cols)
