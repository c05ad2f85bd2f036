"""Kill-and-resume semantics of the partitioned run (north_rule:
"resumable from checkpoint with per-partition lineage + metrics")."""

import json
import os

import pytest

from crn_meta_validate_ray.registry import transcript_rules
from crn_meta_validate_ray.sources.synth import CorpusSpec, write_corpus
from crn_meta_validate_ray.pipelines.resumable import merge_run, run_resumable
from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("resume_corpus")
    spec = CorpusSpec(n_convs=50,
                      inject=("V1", "V10", "V11", "V12"))
    return write_corpus(spec, str(out), files=4)


def _mtimes(mdir, include_meta=False):
    return {f: os.path.getmtime(os.path.join(mdir, f))
            for f in os.listdir(mdir)
            if f.endswith(".json")
            and (include_meta or not f.startswith("_"))}


def test_kill_and_resume(corpus, tmp_path):
    out = str(tmp_path / "run")
    rules = transcript_rules()

    # "killed" run: only 2 partitions complete
    got = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                        rules, max_partitions=2)
    assert got is None
    mdir = os.path.join(out, "manifests")
    assert len(_mtimes(mdir)) == 2
    before = _mtimes(mdir)

    # resumed run completes the remaining partitions + group phase
    run = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                        rules)
    assert run is not None and not run.passed
    after = _mtimes(mdir)
    # committed partitions were NOT recomputed
    for f, t in before.items():
        assert after[f] == t
    assert len(after) == 4  # 4 partition manifests (+_groupcheck/_run meta)
    assert len(_mtimes(mdir, include_meta=True)) == 4 + 2

    # merged verdict matches a fresh single-pass run
    fresh = validate_transcripts(corpus["turns_dir"], corpus["conversations"])
    assert (run.errors, run.warnings) == (fresh.errors, fresh.warnings)
    assert run.extras["violation_counts"] == fresh.extras["violation_counts"]
    assert run.n_rows == fresh.n_rows

    # report + summary artifacts exist and agree
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["errors"] == run.errors
    assert os.path.exists(os.path.join(out, "report.txt"))

    # merge_run alone (no recompute) reproduces the same verdict
    again = merge_run(out, rules)
    assert (again.errors, again.warnings) == (run.errors, run.warnings)


def test_constraint_change_invalidates_manifests(corpus, tmp_path):
    out = str(tmp_path / "run2")
    rules = transcript_rules()
    run_resumable(corpus["turns_dir"], corpus["conversations"], out, rules)
    before = _mtimes(os.path.join(out, "manifests"))

    # same rules → all partitions skipped (mtimes unchanged)
    run_resumable(corpus["turns_dir"], corpus["conversations"], out, rules)
    assert _mtimes(os.path.join(out, "manifests")) == before

    # changed registry → lineage mismatch → recompute
    import copy
    from crn_meta_validate_ray.registry import FieldRule
    rules2 = copy.deepcopy(rules)
    rules2.fields[2] = FieldRule("role", "Required", "Enum",
                                ["system", "user", "assistant"],
                                fillnull=["NA"])
    run2 = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                         rules2)
    after = _mtimes(os.path.join(out, "manifests"))
    assert all(after[f] > before[f] for f in before)
    # stricter enum now flags 'tool' roles too
    assert run2.extras["violation_counts"]["enum:role"] > 0


def test_validate_table_core_public_api():
    """Headless public API parity surface (reference validate_table_core,
    utils/validate_core.py:488-531)."""
    import pandas as pd

    from crn_meta_validate_ray.oracle import validate_table_core
    from crn_meta_validate_ray.registry import transcript_rules
    from crn_meta_validate_ray.report import ReportCollector

    df = pd.DataFrame({
        "conv_id": ["conv_00000001", "NOPE"], "turn_idx": ["0", "1"],
        "role": ["system", "wizard"], "text": ["a", ""],
        "tool": ["NA", "NA"], "ts": ["2024-01-01", "2024-01-01"]})
    rep = ReportCollector()
    rep.add_header("custom")
    out = validate_table_core(df, "turns", transcript_rules(), report=rep)
    # errors: invalid conv_id + invalid role; warnings: all-null optional
    # `tool` column + partial-null `text`
    assert out["errors"] == 2 and out["warnings"] == 2
    assert out["report"] is rep
    log = rep.get_log()
    assert log.startswith("# custom") and "'wizard'" in log


def test_regroup_does_not_double_count(corpus, tmp_path):
    """Re-running with a different files_per_partition leaves the old
    partition manifests on disk — merge_run must fold only the CURRENT
    grouping's manifests (run-level lineage), not double-count stale ones."""
    out = str(tmp_path / "run")
    rules = transcript_rules()
    first = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                          rules, files_per_partition=1)
    # second run over the same out_dir with coarser grouping: every
    # partition id changes, the four old manifests stay behind
    second = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                           rules, files_per_partition=2)
    assert (second.errors, second.warnings, second.n_rows) == \
        (first.errors, first.warnings, first.n_rows)
    assert second.extras["violation_counts"] == \
        first.extras["violation_counts"]


def test_merge_refuses_incomplete_lineage(corpus, tmp_path):
    """merge_run on a killed (incomplete) run raises instead of silently
    under-counting."""
    out = str(tmp_path / "run")
    rules = transcript_rules()
    assert run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                         rules, max_partitions=2) is None
    with pytest.raises(ValueError, match="lineage-stale"):
        merge_run(out, rules)


def test_group_phase_fused_ref_big_target(corpus, tmp_path, monkeypatch):
    """Target table over the broadcast limit: the referential check moves
    into the group phase, fused into the gpart partial exchange — verdict
    and counts must match the one-shot broadcast-path run."""
    import crn_meta_validate_ray.pipelines.transcripts as tr

    monkeypatch.setattr(tr, "REF_BROADCAST_MAX_TARGET", 1)
    out = str(tmp_path / "run")
    rules = transcript_rules()
    run = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                        rules)
    fresh = validate_transcripts(corpus["turns_dir"], corpus["conversations"])
    assert (run.errors, run.warnings) == (fresh.errors, fresh.warnings)
    ref_cids = [c for c in fresh.extras["violation_counts"]
                if c.startswith("ref:")]
    assert ref_cids  # V12 injected orphans
    for c in ref_cids:
        # broadcast counts orphan ROWS, the fused/shuffle path distinct
        # KEYS — the synthetic corpus drops whole conversations, so V12
        # orphan turns per conv ≥ 1 and counts only match at key level
        assert run.extras["violation_counts"][c] <= \
            fresh.extras["violation_counts"][c]
        assert run.extras["violation_counts"][c] > 0


def test_concurrent_partition_failure_propagates_then_resumes(
        ray_session, tmp_path):
    """A failing partition in the CONCURRENT loop must raise out of
    run_resumable (not hang, not swallow); after the input is repaired a
    re-run completes, reusing any partitions that committed before the
    failure."""
    import shutil

    src = write_corpus(CorpusSpec(n_convs=30, inject=("V1",)),
                       str(tmp_path / "corpus"), files=4)
    turns_dir = src["turns_dir"]
    files = sorted(f for f in os.listdir(turns_dir)
                   if f.endswith(".parquet"))
    bad = os.path.join(turns_dir, files[2])
    orig = open(bad, "rb").read()
    with open(bad, "wb") as f:
        f.write(b"this is not a parquet file")

    out = str(tmp_path / "run")
    rules = transcript_rules()
    try:
        with pytest.raises(Exception):
            run_resumable(turns_dir, src["conversations"], out, rules,
                          files_per_partition=1)
    finally:
        with open(bad, "wb") as f:
            f.write(orig)

    run = run_resumable(turns_dir, src["conversations"], out, rules,
                        files_per_partition=1)
    assert run is not None and not run.passed  # V1 injects enum errors
    assert run.extras["violation_counts"].get("enum:role", 0) > 0
    mdir = os.path.join(out, "manifests")
    names = {f for f in os.listdir(mdir) if f.endswith(".json")}
    assert len([n for n in names if not n.startswith("_")]) == 4


def test_resumable_missing_index_col_big_target_ref(ray_session, tmp_path,
                                                    monkeypatch):
    """Resumable analogue of the one-shot missing-index-col test (advice
    r4, medium): turns WITHOUT the sequence index column + a referential
    target too big to broadcast.  The schema guard disables the fused
    group path (spec becomes None); _run_group_phase must NOT rebuild an
    unguarded spec and ride the empty gpart exchange — the standalone
    shuffle anti-join must still report the orphan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import crn_meta_validate_ray.pipelines.transcripts as tr

    turns = pa.table({
        "conv_id": ["c1", "c1", "orphan_x", "c2"],
        "role": ["user", "assistant", "user", "user"],
        "text": ["a", "b", "c", "d"],
    })
    convs = pa.table({"conv_id": ["c1", "c2", "c3"]})
    tdir = tmp_path / "turns"
    tdir.mkdir()
    pq.write_table(turns.slice(0, 2), str(tdir / "part-0.parquet"))
    pq.write_table(turns.slice(2, 2), str(tdir / "part-1.parquet"))
    pq.write_table(convs, str(tmp_path / "convs.parquet"))

    monkeypatch.setattr(tr, "REF_BROADCAST_MAX_TARGET", 1)
    out = str(tmp_path / "run")
    run = run_resumable(str(tdir), str(tmp_path / "convs.parquet"), out,
                        transcript_rules())
    counts = run.extras["violation_counts"]
    ref_cids = [c for c in counts if c.startswith("ref:")]
    assert ref_cids and counts[ref_cids[0]] == 1  # orphan_x reported


def test_crash_after_group_phase_before_partition_commit(corpus, tmp_path):
    """The overlapped group phase can commit its manifest BEFORE a
    partition commits its own (both run concurrently).  A crash in that
    window leaves _groupcheck valid but a partition manifest missing —
    resume must recompute only that partition, and the already-committed
    group verdict stays correct because the recomputed partition emits
    identical (deterministic) gpart partials."""
    out = str(tmp_path / "run")
    rules = transcript_rules()
    first = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                          rules)
    mdir = os.path.join(out, "manifests")
    parts = sorted(f for f in os.listdir(mdir)
                   if f.endswith(".json") and not f.startswith("_"))
    # simulate the crash window: drop one partition manifest, keep the
    # committed _groupcheck + _run manifests
    os.remove(os.path.join(mdir, parts[1]))
    with pytest.raises(ValueError, match="lineage-stale"):
        merge_run(out, rules)  # half-committed state is not mergeable
    gc_mtime = os.path.getmtime(os.path.join(mdir, "_groupcheck.json"))
    run = run_resumable(corpus["turns_dir"], corpus["conversations"], out,
                        rules)
    # group phase was NOT recomputed (its manifest is still valid) ...
    assert os.path.getmtime(os.path.join(mdir, "_groupcheck.json")) \
        == gc_mtime
    # ... and the merged verdict matches the pre-crash run exactly
    assert (run.errors, run.warnings, run.n_rows) == \
        (first.errors, first.warnings, first.n_rows)
    assert run.extras["violation_counts"] == first.extras["violation_counts"]


def test_resumable_heterogeneous_schema_disables_fused(ray_session,
                                                       tmp_path,
                                                       monkeypatch):
    """One partition file missing the index column: the for_schema guard
    must see the INTERSECTION of all partition schemas (advice r4, low) —
    partials from a subset of partitions would under-count — and the
    big-target referential check must still run standalone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import crn_meta_validate_ray.pipelines.transcripts as tr

    with_idx = pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": [0, 1],
        "role": ["user", "assistant"],
        "text": ["a", "b"],
    })
    without_idx = pa.table({
        "conv_id": ["orphan_x", "c2"],
        "role": ["user", "user"],
        "text": ["c", "d"],
    })
    convs = pa.table({"conv_id": ["c1", "c2", "c3"]})
    tdir = tmp_path / "turns"
    tdir.mkdir()
    pq.write_table(with_idx, str(tdir / "part-0.parquet"))
    pq.write_table(without_idx, str(tdir / "part-1.parquet"))
    pq.write_table(convs, str(tmp_path / "convs.parquet"))

    monkeypatch.setattr(tr, "REF_BROADCAST_MAX_TARGET", 1)
    out = str(tmp_path / "run")
    run = run_resumable(str(tdir), str(tmp_path / "convs.parquet"), out,
                        transcript_rules())
    counts = run.extras["violation_counts"]
    ref_cids = [c for c in counts if c.startswith("ref:")]
    assert ref_cids and counts[ref_cids[0]] == 1
    # no fused-group false findings from the partial-coverage partition
    assert not any(c.startswith("seq:") or c.startswith("dup:")
                   for c in counts if counts[c] > 0)
