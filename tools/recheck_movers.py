"""Mover adjudication tool (round-13 verdict #3).

Every round the bench comparison surfaces a handful of queries whose
recorded time moved past the noise gate, and every round the
"load vs plan" adjudication has been done by hand and written into
DESIGN prose — which left an uncommitted, manually-reconciled
BENCH_SELF.json dangling in rounds 12 AND 13. This tool makes the
protocol executable and its output a committed artifact:

  python3 tools/recheck_movers.py BENCH_r12.json BENCH_r13.json \
      [--ratio 1.3] [--abs 0.5] [--out BENCH_ADJUDICATION.json]

1. Loads both payloads and finds the shared queries whose NEW time is
   both >= ratio x OLD and >= abs seconds above it (the same 1.3x /
   0.5 s gate tools/bench_compare.py reports against).
2. Re-runs each mover ISOLATED: one fresh interpreter + fresh JVM per
   query via ``bench.py --worker`` (which load-gates on 1-minute
   loadavg, warms the JVM on the query itself as the throwaway
   warmup, then measures min-of-2 with an extra run past the slow
   threshold). Two independent worker JVMs per mover; the min of the
   two isolated measurements is the adjudicating number.
3. Emits a JSON block mapping each mover to a verdict:
     - ``load``       isolated <= ratio x OLD: the recorded delta was
                      host load / session state, not the plan.
     - ``regression`` isolated still past the gate: a real change —
                      needs a plan diff, not a narrative.
     - ``partial``    isolated between OLD and the gate: some residue
                      remains (the cms_heavy_change shape from r13);
                      flagged for a plan diff but below the gate.
   The block also records loadavg brackets and idle waits so the
   adjudication run is itself auditable for load.

The output file is meant to be committed next to the bench record it
adjudicates — clean ``git status`` at close-out, no prose-only
reconciliation.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        payload = json.load(f)
    # driver BENCH_r*.json wraps the contract line under "parsed"/"tail";
    # the contract payload itself carries the per-query dict.
    if "queries" in payload:
        return payload["queries"]
    tail = payload.get("tail", "")
    # the tail window may clip the head of the big JSON line; recover
    # the complete dict from the durable artifact if it is pointed at
    parsed = payload.get("parsed", {})
    ref = parsed.get("full_payload")
    if ref:
        ref_path = os.path.join(os.path.dirname(os.path.abspath(path)), ref)
        if os.path.exists(ref_path):
            with open(ref_path) as f:
                return json.load(f)["queries"]
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                return json.loads(line)["queries"]
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no per-query dict found")


def _isolated_run(name: str, sf_dir: str) -> tuple[float, dict]:
    """One fresh-JVM measurement of a single query via bench.py
    --worker (load-gated, self-warmed, min-of-2 inside the JVM)."""
    bench = os.path.join(_REPO, "bench.py")
    with tempfile.NamedTemporaryFile(
            mode="r", suffix=".json", delete=False) as tf:
        out_path = tf.name
    try:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        subprocess.run([sys.executable, bench, "--worker", out_path, name],
                       check=True, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out_path) as f:
            frag = json.load(f)
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass
    return frag["queries"][name], {
        "loadavg_1m": frag["loadavg_1m"],
        "idle_wait_sec": frag["idle_wait_sec"],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--abs", dest="abs_sec", type=float, default=0.5)
    ap.add_argument("--jvms", type=int, default=2,
                    help="independent fresh-JVM measurements per mover")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "BENCH_ADJUDICATION.json"))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    old_q, new_q = _queries(args.old), _queries(args.new)
    shared = sorted(set(old_q) & set(new_q))
    movers = [n for n in shared
              if new_q[n] >= args.ratio * old_q[n]
              and new_q[n] - old_q[n] >= args.abs_sec]
    print(f"{len(shared)} shared queries; {len(movers)} movers past "
          f"{args.ratio}x/{args.abs_sec}s gate: {movers}", file=sys.stderr)

    adjudications: dict[str, dict] = {}
    for name in movers:
        runs, meta = [], []
        for _ in range(args.jvms):
            sec, m = _isolated_run(name, args.sf_dir)
            runs.append(sec)
            meta.append(m)
        isolated = min(runs)
        gate = args.ratio * old_q[name] + args.abs_sec
        if isolated <= args.ratio * old_q[name]:
            verdict = ("load" if isolated <= old_q[name] * 1.1
                       else "partial")
        elif isolated <= gate:
            verdict = "partial"
        else:
            verdict = "regression"
        adjudications[name] = {
            "old_sec": old_q[name],
            "new_sec": new_q[name],
            "isolated_sec": isolated,
            "isolated_runs": [round(r, 3) for r in runs],
            "ratio_recorded": round(new_q[name] / old_q[name], 2),
            "ratio_isolated": round(isolated / old_q[name], 2),
            "verdict": verdict,
            "run_meta": meta,
        }
        print(f"  {name}: {old_q[name]:.2f} -> {new_q[name]:.2f} "
              f"recorded; {isolated:.2f} isolated -> {verdict}",
              file=sys.stderr)

    block = {
        "old": os.path.basename(args.old),
        "new": os.path.basename(args.new),
        "gate": {"ratio": args.ratio, "abs_sec": args.abs_sec,
                 "jvms_per_mover": args.jvms},
        "sf_dir": args.sf_dir,
        "n_shared": len(shared),
        "movers": adjudications,
        "n_load": sum(1 for a in adjudications.values()
                      if a["verdict"] == "load"),
        "n_partial": sum(1 for a in adjudications.values()
                         if a["verdict"] == "partial"),
        "n_regression": sum(1 for a in adjudications.values()
                            if a["verdict"] == "regression"),
    }
    with open(args.out, "w") as f:
        json.dump(block, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in block.items() if k != "movers"}))


if __name__ == "__main__":
    main()
