"""Build a scaled soak corpus by tiling driver testdata N× with key offsets.

Correctness oracles always run on the driver's testdata verbatim; this
corpus exists solely so ``tools/soak.py`` can stress SCALE assumptions
(hot-bucket caps, packing fan-out, broadcast caps, iterative round
counts) at ~10× bench scale without touching /root/testdata.

Tiling rules (copy i of N):
- facts + dims that grow with the corpus get their surrogate keys
  offset by ``i * stride`` where stride = max(key)+1 in the source, so
  uniqueness and FK joins (orders↔lineitem, orders↔customer,
  lineitem↔part/supplier, events↔user) hold across tiles;
- ``nation`` / ``region`` are genuinely fixed-cardinality dims and are
  copied once, unchanged (their FKs from customer/supplier are not
  offset);
- payload columns (text, embedding, value, dates) are copied verbatim —
  every document/vector therefore has N exact twins across tiles. That
  is deliberate: duplicate-heavy corpora are the worst case for LSH
  bucket fan-out and exact-dedup group size, which is precisely what
  the caps (MAX_BUCKET, max_df, hot-set limits) must bound.

Usage: python tools/make_scale_corpus.py [src_dir] [dst_dir] [n_tiles]
Defaults: /root/testdata/sf0.1 -> /root/repo/.scratch/sf1, 10 tiles.
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {key_column: stride_group}; columns in the same stride group
# share one stride so FK pairs stay aligned across tiles.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    n_tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    # one stride per group: max over every key column in the group, +1
    strides: dict[str, int] = {}
    for table, keys in KEYED.items():
        for col, group in keys.items():
            mx = con.sql(
                f"SELECT max({col}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            strides[group] = max(strides.get(group, 0), int(mx) + 1)

    for table in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
            f"'{dst}/{table}.parquet' (FORMAT parquet)")
        print(f"{table}: copied unchanged")

    for table, keys in KEYED.items():
        cols = con.sql(
            f"SELECT * FROM '{src}/{table}.parquet' LIMIT 0").columns
        selects = []
        for i in range(n_tiles):
            exprs = []
            for c in cols:
                if c in keys:
                    off = i * strides[keys[c]]
                    exprs.append(f"{c} + {off} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'")
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{dst}/{table}.parquet' "
                f"(FORMAT parquet)")
        n = con.sql(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows ({n_tiles} tiles)")


if __name__ == "__main__":
    main()
