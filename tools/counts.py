"""Single source of truth for registry counts cited in README/DESIGN.

Docs lagged the registry three rounds running (137→144→156→159→161,
each stale once) because the numbers were hand-copied. This prints them
from the registry itself; cite its output verbatim and re-run it after
registering operators.

Usage: python tools/counts.py [--check N_TOTAL N_ORACLE]
  --check exits 1 unless the registry matches the given counts — used
  by tests/test_registry_oracle.py-style doc pins if needed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_native_mapreduce_spark.registry import QUERIES  # noqa: E402


def counts() -> tuple[int, int]:
    total = len(QUERIES)
    with_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    return total, with_oracle


def main() -> None:
    total, with_oracle = counts()
    print(f"queries_total={total}")
    print(f"queries_with_oracle={with_oracle}")
    print(f"queries_rows_only={total - with_oracle}")
    if len(sys.argv) >= 4 and sys.argv[1] == "--check":
        want = (int(sys.argv[2]), int(sys.argv[3]))
        if (total, with_oracle) != want:
            print(f"MISMATCH: registry has {(total, with_oracle)}, "
                  f"docs claim {want}")
            sys.exit(1)


if __name__ == "__main__":
    main()
