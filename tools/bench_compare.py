"""Bench regression gate: compare two bench.py JSON outputs per-query.

Usage:
    python tools/bench_compare.py BENCH_r01.json current.json [--max-ratio 1.5]

Exits 1 if any query present in BOTH files regressed by more than
--max-ratio (new_time > ratio * old_time), with a floor of 0.5 s on the
old time so JVM noise on sub-second queries can't trip the gate. New
queries (no baseline) and removed queries are reported but never fail.
"""

from __future__ import annotations

import argparse
import json
import sys

NOISE_FLOOR_SEC = 0.5


def load(path: str) -> dict[str, float]:
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    if "parsed" in data:  # driver BENCH_r{N}.json wraps bench.py's line
        wrapper, data = data, data["parsed"]
        if "queries" not in data:
            # Driver recordings keep only the LAST ~2000 chars of
            # bench output (the round-7 truncation note in bench.py):
            # the per-query dict lives in the raw `tail`, possibly cut
            # at the FRONT. Recover what survived — a partial baseline
            # beats silently comparing zero shared queries (which made
            # every query print as "new" in the round-10 session).
            import re
            pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)',
                               wrapper.get("tail", ""))
            qs = {k: float(v) for k, v in pairs
                  if k not in ("value", "sf", "idle_wait_sec",
                               "runs_per_query", "n_queries")}
            if qs:
                print(f"note: {path} is a driver tail capture — "
                      f"recovered {len(qs)} per-query timings "
                      f"(head of the dict may be truncated)")
                return qs
    return {k: float(v) for k, v in data.get("queries", {}).items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    args = ap.parse_args()

    old, new = load(args.baseline), load(args.current)
    regressed: list[tuple[str, float, float, float]] = []
    for name in sorted(old.keys() & new.keys()):
        o, n = old[name], new[name]
        ratio = n / o if o > 0 else float("inf")
        # the ratio the gate actually tests (noise floor applied) — the
        # raw ratio can read 4.00x on a 0.1s->0.4s query the gate passes
        gated = n / max(o, NOISE_FLOOR_SEC)
        marker = ""
        if gated > args.max_ratio:
            regressed.append((name, o, n, ratio))
            marker = "  <-- REGRESSION"
        print(f"{name:32s} {o:7.2f}s -> {n:7.2f}s  "
              f"({ratio:5.2f}x raw, {gated:5.2f}x gated){marker}")
    for name in sorted(new.keys() - old.keys()):
        print(f"{name:32s}    new -> {new[name]:7.2f}s")
    for name in sorted(old.keys() - new.keys()):
        print(f"{name:32s} {old[name]:7.2f}s -> removed")

    o_tot = sum(old[k] for k in old.keys() & new.keys())
    n_tot = sum(new[k] for k in old.keys() & new.keys())
    print(f"{'TOTAL (shared queries)':32s} {o_tot:7.2f}s -> {n_tot:7.2f}s  "
          f"({(n_tot / o_tot if o_tot else 1):5.2f}x)")

    if regressed:
        print(f"\n{len(regressed)} quer{'y' if len(regressed) == 1 else 'ies'} "
              f"regressed beyond {args.max_ratio}x:", file=sys.stderr)
        for name, o, n, r in regressed:
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)",
                  file=sys.stderr)
        return 1
    print("\nno per-query regression beyond "
          f"{args.max_ratio}x (noise floor {NOISE_FLOOR_SEC}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
