#!/usr/bin/env python3
"""Hadoop-Streaming word-count reducer (reference-parity semantics).

Contract (SURVEY.md §2.1): stdin = the lexicographically sorted
``key\tvalue`` lines of ONE reduce partition (all occurrences of a key
contiguous); stdout = final ``key\ttotal`` lines. Non-numeric counts are
skipped, matching the reference reducer's ValueError-discard behavior
(client/scripts/reducer.py:23-27).

Fresh implementation of the public Hadoop-Streaming contract — not a
copy of the reference script. Uses a current-key accumulator loop (the
canonical streaming-reducer shape) instead of groupby.
"""
import sys


def main() -> None:
    out = sys.stdout
    cur_key = None
    cur_sum = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        key, _, val = line.partition("\t")
        if key != cur_key:
            if cur_key is not None:
                out.write(f"{cur_key}\t{cur_sum}\n")
            cur_key = key
            cur_sum = 0
        try:
            cur_sum += int(val)
        except ValueError:
            pass  # drop malformed counts, like the reference
    if cur_key is not None:
        out.write(f"{cur_key}\t{cur_sum}\n")


if __name__ == "__main__":
    main()
