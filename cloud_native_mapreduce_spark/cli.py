"""Command-line client — the reference's `mrclient` re-expressed
(SURVEY.md §2 E2: `-upload` pushes a scripts dir, `-mrspec` submits a
job spec and downloads outputs; client/mrclient.go:59-198).

Subcommands:
  run   <spec.json>        run a MapReduce job (local SparkSession, or
                           --endpoint to POST to a running JobServer)
  serve [--port N]         start the HTTP job endpoint
  query <name> [--sf DIR]  run a registry query and print N rows

Spec JSON = the JobServer payload shape (see `server.py`); relative
mapper/reducer paths resolve against the spec file's directory — the
analogue of the reference's uploaded-scripts container. Local runs
execute under the user's own authority, so no script confinement
applies here; submitting to --endpoint subjects the spec to the
server's scripts_dir allowlist.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_spec(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        payload = json.load(fh)
    base = os.path.dirname(os.path.abspath(path))
    for key in ("mapper", "reducer"):
        if key in payload and not os.path.isabs(payload[key]):
            payload[key] = os.path.join(base, payload[key])
    return payload


def cmd_run(args) -> int:
    payload = _load_spec(args.spec)
    if args.endpoint:
        from cloud_native_mapreduce_spark.server import submit_http
        files = submit_http(args.endpoint, payload)
    else:
        from cloud_native_mapreduce_spark.mapreduce import submit_job
        from cloud_native_mapreduce_spark.server import _spec_from_json
        from cloud_native_mapreduce_spark.session import get_spark
        # local run = the user's own authority; no confinement needed
        # (the HTTP endpoint is where the allowlist binds)
        spec, out_dir = _spec_from_json(payload)
        files = submit_job(get_spark("cnms-cli"), spec, out_dir)
    print(json.dumps({"files": files}))
    return 0


def cmd_serve(args) -> int:
    from cloud_native_mapreduce_spark.server import JobServer
    from cloud_native_mapreduce_spark.session import get_spark

    srv = JobServer(get_spark("cnms-server"), port=args.port).start()
    print(srv.address, flush=True)
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_query(args) -> int:
    from cloud_native_mapreduce_spark.registry import QUERIES
    from cloud_native_mapreduce_spark.session import get_spark

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; known: "
              f"{', '.join(sorted(QUERIES))}", file=sys.stderr)
        return 2
    df = QUERIES[args.name].builder(get_spark("cnms-cli"), args.sf)
    df.show(args.rows, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cnms")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a MapReduce job spec")
    pr.add_argument("spec")
    pr.add_argument("--endpoint", default=None,
                    help="POST to a running JobServer instead of local")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("serve", help="start the HTTP job endpoint")
    ps.add_argument("--port", type=int, default=8199)
    ps.set_defaults(fn=cmd_serve)

    pq = sub.add_parser("query", help="run a registry query")
    pq.add_argument("name")
    pq.add_argument("--sf", default="/root/testdata/sf0.001")
    pq.add_argument("--rows", type=int, default=20)
    pq.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
