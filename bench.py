"""Benchmark harness — prints ONE JSON line with headline wall-clock.

Headline pipelines:
- transcript_validate: flagship full-constraint validation (cell rules +
  sketches + salted group checks + referential) over a ~2M-turn seeded
  synthetic corpus (cached under /tmp, includes a 100k-turn
  mega-conversation to exercise skew salting);
- lineitem_validate: full suite over $GRAFT_SF_DIR lineitem;
- dedup + text stage over documents; knn over embeddings; windows over
  events.

`python bench.py`            → one JSON line (driver contract)
`python bench.py --scaling`  → two fresh processes at 8 and 32 CPUs on the
                               same inputs; prints both + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "170000"))


def _corpus():
    from crn_meta_validate_ray.sources.synth import CorpusSpec, cached_corpus
    spec = CorpusSpec(
        n_convs=BENCH_CONVS, seed=7,
        inject=("V1", "V2", "V4", "V5", "V10", "V11", "V12", "V14"),
        mega_conv_turns=100_000)
    return cached_corpus(spec, files=32)


def _warm(paths):
    for p in paths:
        if os.path.isdir(p):
            for f in os.listdir(p):
                with open(os.path.join(p, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
        elif os.path.isfile(p):
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from crn_meta_validate_ray.pipelines import queries as q
    from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts

    info = _corpus()
    _warm([info["turns_dir"], info["conversations"], SF_DIR])

    timings: dict[str, float] = {}
    meta: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # 1. flagship transcript validation (headline)
    run = timed("transcript_validate",
                lambda: validate_transcripts(info["turns_dir"],
                                             info["conversations"],
                                             batch_size=16384))
    meta["transcript_rows"] = info["n_turns"]
    meta["transcript_rows_per_sec"] = round(
        info["n_turns"] / timings["transcript_validate"], 1)
    meta["transcript_errors"] = run.errors

    # 2. generic-table validation + relational ops on the sf tables
    def consume(ds):
        if hasattr(ds, "count"):
            return ds.count()
        return ds.num_rows if hasattr(ds, "num_rows") else len(ds)

    timed("lineitem_checks", lambda: (
        consume(q.sequence_violations_lineitem(SF_DIR)),
        consume(q.unique_violations_lineitem(SF_DIR)),
        consume(q.integer_violations_lineitem(SF_DIR))))
    timed("pricing_summary", lambda: consume(q.pricing_summary(SF_DIR)))
    timed("dedup_minhash", lambda: consume(q.minhash_pairs_documents(SF_DIR)))
    timed("text_stats", lambda: (consume(q.token_stats_documents(SF_DIR)),
                                 consume(q.quality_documents(SF_DIR)),
                                 consume(q.langid_documents(SF_DIR))))
    timed("knn_embeddings", lambda: consume(q.knn_embeddings(SF_DIR)))
    timed("windows_events", lambda: (consume(q.tumbling_events(SF_DIR)),
                                     consume(q.sessions_events(SF_DIR))))

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "end-to-end wall-clock, full validation + dataprep suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **meta,
    }
    ray.shutdown()
    return result


def run_scaling():
    """Same job at two parallelism levels in fresh processes — the sandbox
    substitute for the N vs 4N node-count rule."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(
                                 os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo_n, hi_n = 8, 32
    lo = one(lo_n)   # first run also warms the corpus cache
    hi = one(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    print(json.dumps({
        "sec_8": lo["value"], "sec_32": hi["value"],
        "turns_per_sec_8": lo["transcript_rows_per_sec"],
        "turns_per_sec_32": hi["transcript_rows_per_sec"],
        "transcript_eff": round(
            (hi["transcript_rows_per_sec"] / lo["transcript_rows_per_sec"])
            / (hi_n / lo_n), 3),
        "scaling_efficiency": round(eff, 3),
        "queries_8": lo["queries"], "queries_32": hi["queries"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
