"""Spill rehearsal: run the flagship pipeline with the object store capped
far below the pipeline's working set and verify (a) it completes without
OOM/livelock, (b) the verdict is identical to an uncapped run, (c) Ray
actually spilled (the cap was real, not slack).

At 100 TB the object store can never hold the stream — the engine's scale
story rests on Ray Data's streaming executor + object-store spilling
carrying the exchange through disk.  The biggest in-sandbox corpus fits in
RAM, so this tool manufactures the pressure instead: a fresh Ray session
with ``object_store_memory`` capped (default 1 GiB against a ~4 GiB-on-disk
/ tens-of-GiB-decompressed 48M-turn corpus) runs the identical flagship
job, and the driver compares verdict rows + violation counts against the
uncapped run's.

Usage::

    python tools/spill_rehearsal.py              # capped vs uncapped, 48M turns
    SPILL_CAP_BYTES=2e9 SPILL_CONVS=1700000 python tools/spill_rehearsal.py

Each measurement runs in a fresh subprocess (one Ray session each), like
bench.py --scaling.  Prints one JSON line; record the result in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# run as a script from tools/ — the library resolves from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPILL_CONVS = int(os.environ.get("SPILL_CONVS", "3400000"))
SPILL_CAP_BYTES = int(float(os.environ.get("SPILL_CAP_BYTES", "1e9")))


def _corpus():
    from crn_meta_validate_ray.sources.synth import CorpusSpec, cached_corpus
    spec = CorpusSpec(
        n_convs=SPILL_CONVS, seed=11,
        inject=("V1", "V2", "V4", "V5", "V10", "V11", "V12", "V14"),
        mega_conv_turns=400_000)
    return cached_corpus(spec, files=64)


def _session_dir() -> str:
    """This process's Ray session directory (host tmp layout varies — ask
    the live node rather than hardcoding /tmp/ray/...)."""
    import ray
    return ray._private.worker._global_node.get_session_dir_path()


def _spill_stats() -> tuple[int, int]:
    """(bytes, files) currently sitting in this session's spill directory
    (the stats endpoint needs grpc, which this sandbox lacks — the spill
    dir on disk is the ground truth anyway)."""
    import glob
    tot = files = 0
    for d in glob.glob(os.path.join(_session_dir(), "ray_spilled_objects*")):
        for f in glob.glob(os.path.join(d, "**"), recursive=True):
            if os.path.isfile(f):
                tot += os.path.getsize(f)
                files += 1
    return tot, files


def run_child(cap_bytes: int) -> None:
    import ray
    kwargs = {}
    if cap_bytes:
        kwargs["object_store_memory"] = cap_bytes
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", **kwargs)
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts

    info = _corpus()

    # spill files are DELETED as their objects free, so an end-of-run scan
    # can read 0 after heavy spilling — sample the dir while running and
    # keep the peak; the raylet log's cumulative counter is the backstop
    import threading
    peak = {"bytes": 0, "files": 0}
    stop = threading.Event()

    def monitor():
        while not stop.is_set():
            b, f = _spill_stats()
            if b > peak["bytes"]:
                peak["bytes"], peak["files"] = b, f
            stop.wait(0.25)

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()
    t0 = time.perf_counter()
    run = validate_transcripts(info["turns_dir"], info["conversations"],
                               batch_size=16384)
    dt = time.perf_counter() - t0
    stop.set()
    mon.join()

    spilled_mib = peak["bytes"] >> 20
    spilled_objects = peak["files"]
    cum_mib = cum_objects = 0
    try:
        import re
        with open(os.path.join(_session_dir(), "logs", "raylet.out")) as f:
            for m in re.finditer(r"Spilled (\d+) MiB, (\d+) objects",
                                 f.read()):
                cum_mib = max(cum_mib, int(m.group(1)))
                cum_objects = max(cum_objects, int(m.group(2)))
    except OSError:
        pass
    spilled_mib = max(spilled_mib, cum_mib)
    spilled_objects = max(spilled_objects, cum_objects)
    print("CHILD" + json.dumps({
        "cap_bytes": cap_bytes,
        "sec": round(dt, 2),
        "rows": info["n_turns"],
        "rows_per_sec": round(info["n_turns"] / dt, 1),
        "spilled_mib": spilled_mib,
        "spilled_objects": spilled_objects,
        "verdict": run.verdict_row(),
        "violation_counts": run.extras.get("violation_counts", {}),
    }))
    ray.shutdown()


def main() -> None:
    _corpus()  # generate once, outside either measured session
    here = os.path.abspath(__file__)

    def one(cap: int) -> dict:
        out = subprocess.run(
            [sys.executable, here, "--child", str(cap)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(here)))
        for line in out.stdout.splitlines():
            if line.startswith("CHILD"):
                return json.loads(line[len("CHILD"):])
        raise RuntimeError(f"child produced no result: {out.stderr[-2000:]}")

    uncapped = one(0)
    capped = one(SPILL_CAP_BYTES)
    parity = (capped["verdict"] == uncapped["verdict"]
              and capped["violation_counts"] == uncapped["violation_counts"])
    print(json.dumps({
        "pipeline": "transcript_validate (full constraint suite)",
        "rows": capped["rows"],
        "cap_bytes": SPILL_CAP_BYTES,
        "uncapped_sec": uncapped["sec"],
        "capped_sec": capped["sec"],
        "slowdown": round(capped["sec"] / uncapped["sec"], 2),
        "spilled_mib_uncapped": uncapped["spilled_mib"],
        "spilled_mib_capped": capped["spilled_mib"],
        "spilled_objects_capped": capped["spilled_objects"],
        "verdict_parity": parity,
        "errors": capped["verdict"].get("errors"),
        "warnings": capped["verdict"].get("warnings"),
    }))
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
