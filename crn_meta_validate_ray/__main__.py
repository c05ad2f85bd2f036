"""Job entry point: ``python -m crn_meta_validate_ray <cmd> ...``.

Designed for ``ray job submit --working-dir . -- python -m
crn_meta_validate_ray resumable --turns ... --out ...`` on a cluster; in
this sandbox it runs against the local Ray instance.  This module OWNS
the Ray session (guarded init) — the library itself never calls
``ray.init``.

Commands:
- ``validate``  — one-shot flagship validation (collect mode), prints the
  verdict as one JSON line and the reference-format text report.
- ``resumable`` — partitioned run with per-partition checkpoint
  manifests; re-running the same command after a kill resumes from the
  last committed partition.  ``--max-partitions`` simulates a kill;
  ``--commit-protocol marker`` publishes through the object-store
  manifest-pointer protocol instead of atomic renames.
- ``gc`` — reclaim abandoned staging state (uncommitted attempts, torn
  PUT temps) in a run directory; committed artifacts are never touched.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crn_meta_validate_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate", help="one-shot flagship validation")
    pv.add_argument("--turns", required=True,
                    help="parquet file/dir of transcript turns")
    pv.add_argument("--conversations", default=None,
                    help="parquet of conversation headers (referential "
                         "target)")
    pv.add_argument("--batch-size", type=int, default=16384)
    pv.add_argument("--report", action="store_true",
                    help="also print the text report")

    pr = sub.add_parser("resumable", help="partitioned resumable run")
    pr.add_argument("--turns", required=True)
    pr.add_argument("--conversations", default=None)
    pr.add_argument("--out", required=True,
                    help="output dir (findings + manifests); rerun with "
                         "the same dir to resume")
    pr.add_argument("--files-per-partition", type=int, default=1)
    pr.add_argument("--max-partitions", type=int, default=None,
                    help="stop after N partitions (simulated kill)")
    pr.add_argument("--batch-size", type=int, default=16384)
    pr.add_argument("--commit-protocol", choices=["posix", "marker"],
                    default="posix",
                    help="output commit protocol: 'posix' (atomic rename; "
                         "local disk / shared POSIX mount) or 'marker' "
                         "(PUT/GET/LIST manifest-pointer; object stores)")

    pg = sub.add_parser(
        "gc", help="reclaim abandoned staging state in a run directory "
                   "(uncommitted attempts, torn PUT temps); committed "
                   "artifacts are never touched")
    pg.add_argument("--out", required=True, help="run directory to sweep")
    pg.add_argument("--commit-protocol", choices=["posix", "marker"],
                    default="posix",
                    help="protocol the run was written with")

    args = ap.parse_args(argv)

    if args.cmd == "gc":  # pure filesystem sweep — no Ray session needed
        from crn_meta_validate_ray.pipelines.resumable import gc_run
        from crn_meta_validate_ray.state.commit import MarkerCommit
        proto = MarkerCommit() if args.commit_protocol == "marker" else None
        removed = gc_run(args.out, commit_protocol=proto)
        print(json.dumps({"removed": removed}))
        return 0

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from crn_meta_validate_ray.registry import transcript_rules

    rc = 0
    if args.cmd == "validate":
        from crn_meta_validate_ray.pipelines.transcripts import (
            validate_transcripts)
        run = validate_transcripts(args.turns, args.conversations,
                                   batch_size=args.batch_size)
        print(json.dumps({**run.verdict_row(),
                          "violation_counts":
                              run.extras.get("violation_counts", {})}))
        if args.report:
            print(run.report.get_log())
        rc = 0 if run.passed else 1
    elif args.cmd == "resumable":
        from crn_meta_validate_ray.pipelines.resumable import run_resumable
        from crn_meta_validate_ray.state.commit import MarkerCommit
        proto = MarkerCommit() if args.commit_protocol == "marker" else None
        run = run_resumable(args.turns, args.conversations, args.out,
                            transcript_rules(),
                            batch_size=args.batch_size,
                            files_per_partition=args.files_per_partition,
                            max_partitions=args.max_partitions,
                            commit_protocol=proto)
        if run is None:
            print(json.dumps({"stopped_early": True,
                              "resume": "re-run the same command"}))
            rc = 3  # partial by request; manifests are committed
        else:
            print(json.dumps({**run.verdict_row(),
                              "violation_counts":
                                  run.extras.get("violation_counts", {})}))
            rc = 0 if run.passed else 1
    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
