"""mc-gated measurement hunts: take benchmark samples only in windows the
host is not stealing multi-core capacity.

The sandbox VM steals MULTI-core CPU in multi-minute bursts that a
single-threaded calibration probe cannot see (identical pipelines measured
2.3 s and 6.5 s back-to-back while the 1-thread probe stayed flat).  Every
headline number in BASELINE.md is therefore taken under this protocol:
poll ``bench._calibrate_multicore`` (wall-clock of N concurrent
single-thread numpy sorts; clean ≈ 550–750 ms at 32 CPUs), sample only
when it reads clean, and judge each sample by its OWN in-run calib.

Two hunts::

    python tools/gated_hunt.py scaling [--lo 8 --hi 32] [--deadline 2700]
        Interleaved fresh-process ``bench.py --scaling-child`` samples at
        two CPU levels over the same 47.6M-turn corpus until BOTH levels
        hold >=2 samples whose in-run all-cores calib reads clean; reports
        best-per-level among clean samples and the scaling efficiency.
        (This produced the round-5 8->32 pair: 3.01M -> 8.22M turns/s,
        efficiency 0.682 vs the VM's ~0.70 hardware ceiling.)

    python tools/gated_hunt.py suite [--deadline 2400]
        Runs the full ``bench.py`` 19-pipeline suite when the poll reads
        clean; keeps the best total, stops on a run whose in-run calib is
        clean.

Logs every sample (including dirty ones — the honesty trail) to
``--log`` (default /tmp/gated_hunt_<mode>.txt).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from bench import _calibrate_multicore  # noqa: E402

# clean all-cores calib thresholds (ms): at <=8 CPUs the probe reads like
# the single-thread probe (~480-550); at 32 a clean window reads ~550-750
def _gate(ncpu: int) -> float:
    return 650.0 if ncpu <= 8 else 800.0


def _log(path: str, line: str) -> None:
    with open(path, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def _scaling_child(ncpu: int, num_buckets: int, log: str):
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               RAY_GRAFT_NUM_BUCKETS=str(num_buckets))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--scaling-child", str(ncpu)],
        env=env, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        _log(log, f"child {ncpu} FAILED: {out.stderr[-300:]}")
        return None
    return json.loads(out.stdout.strip().splitlines()[-1])


def hunt_scaling(lo: int, hi: int, deadline: float, log: str) -> int:
    # pin ONE physical exchange plan across both levels, as bench.py
    # --scaling does — otherwise the low level runs fewer exchange waves
    # and the ratio under-reports true scaling
    num_buckets = max(8, min(128, 2 * hi))
    samples: dict[int, list] = {lo: [], hi: []}
    while time.time() < deadline:
        for n in (lo, hi):
            s = _scaling_child(n, num_buckets, log)
            if s is None:
                continue
            s["clean"] = s["host_calib_mc_ms"] <= _gate(n)
            samples[n].append(s)
            _log(log, f"n={n} sec={s['sec']} rps={s['rows_per_sec']} "
                      f"mc={s['host_calib_mc_ms']} 1t={s['host_calib_ms']} "
                      f"{'CLEAN' if s['clean'] else 'dirty'}")
        if all(sum(x["clean"] for x in samples[n]) >= 2 for n in (lo, hi)):
            break

    ok = 1
    for name, pools in (("CLEAN", {n: [x for x in samples[n] if x["clean"]]
                                   for n in (lo, hi)}),
                        ("ALL", samples)):
        b = {n: min(pools[n], key=lambda s: s["sec"]) if pools[n] else None
             for n in (lo, hi)}
        if b[lo] and b[hi]:
            eff = (b[hi]["rows_per_sec"] / b[lo]["rows_per_sec"]) / (hi / lo)
            _log(log, f"{name}: {lo}cpu {b[lo]['sec']}s "
                      f"({b[lo]['rows_per_sec']}/s, mc "
                      f"{b[lo]['host_calib_mc_ms']}) {hi}cpu {b[hi]['sec']}s "
                      f"({b[hi]['rows_per_sec']}/s, mc "
                      f"{b[hi]['host_calib_mc_ms']}) efficiency {eff:.3f}")
            if name == "CLEAN":
                ok = 0
        else:
            _log(log, f"{name}: insufficient samples "
                      f"({lo}:{len(pools[lo])} {hi}:{len(pools[hi])})")
    return ok


def hunt_suite(deadline: float, log: str, best_json: str) -> int:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    pre_gate, run_gate = _gate(ncpu) + 150.0, _gate(ncpu) + 100.0
    best = None
    while time.time() < deadline:
        pre = _calibrate_multicore(ncpu)
        if pre > pre_gate:
            _log(log, f"poll mc={pre:.0f} dirty; sleep 45")
            time.sleep(45)
            continue
        _log(log, f"poll mc={pre:.0f} CLEAN -> running suite")
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            _log(log, f"suite FAILED: {out.stderr[-200:]}")
            continue
        d = json.loads(out.stdout.strip().splitlines()[-1])
        _log(log, f"suite total={d['value']} mc={d['host_calib_mc_ms']} "
                  f"1t={d['host_calib_ms']} "
                  f"flagship_rps={d['transcript_rows_per_sec']}")
        if best is None or d["value"] < best["value"]:
            best = d
            with open(best_json, "w") as f:
                json.dump(d, f)
        if d["host_calib_mc_ms"] <= run_gate:
            _log(log, "accepted as clean; stopping")
            return 0
    _log(log, f"deadline; best={best['value'] if best else None}")
    return 1


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["scaling", "suite"])
    p.add_argument("--lo", type=int, default=8)
    p.add_argument("--hi", type=int, default=32)
    p.add_argument("--deadline", type=float, default=2700,
                   help="seconds to keep hunting")
    p.add_argument("--log", default=None)
    p.add_argument("--best-json", default="/tmp/gated_hunt_best.json")
    a = p.parse_args()
    log = a.log or f"/tmp/gated_hunt_{a.mode}.txt"
    _log(log, f"--- start {time.strftime('%H:%M:%S')} mode={a.mode} ---")
    end = time.time() + a.deadline
    if a.mode == "scaling":
        return hunt_scaling(a.lo, a.hi, end, log)
    return hunt_suite(end, log, a.best_json)


if __name__ == "__main__":
    sys.exit(main())
