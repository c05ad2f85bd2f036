"""Output-commit protocol (state/commit.py): POSIX rename vs object-store
marker semantics, and the resumable pipeline running end-to-end through the
marker protocol (VERDICT r4 item 2 — no directory renames on object
stores)."""

import json
import os

import pytest

from crn_meta_validate_ray.state.commit import (MARKER, MarkerCommit,
                                                PosixCommit)


@pytest.mark.parametrize("proto", [PosixCommit(), MarkerCommit()],
                         ids=["posix", "marker"])
def test_stage_publish_read_roundtrip(proto, tmp_path):
    final = str(tmp_path / "findings")
    assert not proto.is_committed_dir(final)
    assert proto.committed_files(final) == []

    staged = proto.stage_dir(final)
    os.makedirs(os.path.join(staged, "kind=violation"))
    for i in range(2):
        with open(os.path.join(staged, "kind=violation",
                               f"part-{i:05d}.parquet"), "w") as f:
            f.write("x")
    # uncommitted: invisible to readers
    assert not proto.is_committed_dir(final)
    assert proto.committed_files(final, "kind=violation") == []

    proto.publish_dir(staged, final)
    assert proto.is_committed_dir(final)
    files = proto.committed_files(final, "kind=violation")
    assert [os.path.basename(f) for f in files] == ["part-00000.parquet",
                                                    "part-00001.parquet"]
    assert all(os.path.isfile(f) for f in files)
    d = proto.data_dir(final, "kind=violation")
    assert d is not None and os.path.isdir(d)
    # absent hive partition: no files, no dir
    assert proto.committed_files(final, "kind=sketch") == []
    assert proto.data_dir(final, "kind=sketch") is None


@pytest.mark.parametrize("proto", [PosixCommit(), MarkerCommit()],
                         ids=["posix", "marker"])
def test_restage_replaces_previous_attempt(proto, tmp_path):
    """A retried partition must never append to a previous attempt —
    readers see exactly the last published attempt's files."""
    final = str(tmp_path / "out")
    s1 = proto.stage_dir(final)
    with open(os.path.join(s1, "a.parquet"), "w") as f:
        f.write("1")
    proto.publish_dir(s1, final)
    s2 = proto.stage_dir(final)
    with open(os.path.join(s2, "b.parquet"), "w") as f:
        f.write("2")
    proto.publish_dir(s2, final)
    assert [os.path.basename(f) for f in proto.committed_files(final)] \
        == ["b.parquet"]


@pytest.mark.parametrize("proto", [PosixCommit(), MarkerCommit()],
                         ids=["posix", "marker"])
def test_torn_json_reads_as_absent(proto, tmp_path):
    p = str(tmp_path / "m.json")
    assert proto.get_json(p) is None
    with open(p, "w") as f:
        f.write('{"committed": tru')  # torn write
    assert proto.get_json(p) is None
    proto.put_json({"committed": True}, p)
    assert proto.get_json(p) == {"committed": True}


def test_marker_torn_marker_reads_as_uncommitted(tmp_path):
    proto = MarkerCommit()
    final = str(tmp_path / "out")
    staged = proto.stage_dir(final)
    with open(os.path.join(staged, "a.parquet"), "w") as f:
        f.write("1")
    proto.publish_dir(staged, final)
    with open(os.path.join(final, MARKER), "w") as f:
        f.write("{garbage")
    assert not proto.is_committed_dir(final)
    assert proto.committed_files(final) == []
    assert proto.data_dir(final) is None


def test_marker_never_renames_directories(tmp_path):
    """The marker protocol must restrict itself to the object-store
    primitives: data files live under the attempt prefix inside the final
    path (no sibling .tmp dir ever exists), and commit is one marker
    object."""
    proto = MarkerCommit()
    final = str(tmp_path / "out")
    staged = proto.stage_dir(final)
    assert os.path.dirname(staged) == final  # attempt INSIDE final
    assert not os.path.exists(final + ".tmp")
    with open(os.path.join(staged, "a.parquet"), "w") as f:
        f.write("1")
    proto.publish_dir(staged, final)
    assert os.path.isdir(staged)  # publish moved nothing
    m = json.load(open(os.path.join(final, MARKER)))
    assert m["attempt"] == os.path.basename(staged)
    assert m["files"] == ["a.parquet"]
    # publishing a staged dir that is not an attempt of final is a bug
    with pytest.raises(ValueError):
        proto.publish_dir(str(tmp_path / "elsewhere"), final)


def test_resumable_end_to_end_marker_protocol(ray_session, tmp_path):
    """Kill → resume → verdict parity under MarkerCommit: the full
    resumable pipeline (partition findings, gpart read-back in the group
    phase, manifests, report/summary) runs on PUT/GET/LIST semantics and
    matches the one-shot verdict; abandoned attempts stay on disk as inert
    garbage."""
    from crn_meta_validate_ray.registry import transcript_rules
    from crn_meta_validate_ray.sources.synth import CorpusSpec, write_corpus
    from crn_meta_validate_ray.pipelines.resumable import run_resumable
    from crn_meta_validate_ray.pipelines.transcripts import (
        validate_transcripts)

    corpus = write_corpus(
        CorpusSpec(n_convs=40, inject=("V1", "V10", "V11", "V12")),
        str(tmp_path / "corpus"), files=3)
    out = str(tmp_path / "run")
    rules = transcript_rules()
    proto = MarkerCommit()

    killed = run_resumable(corpus["turns_dir"], corpus["conversations"],
                           out, rules, max_partitions=1,
                           commit_protocol=proto)
    assert killed is None
    run = run_resumable(corpus["turns_dir"], corpus["conversations"],
                        out, rules, commit_protocol=proto)
    fresh = validate_transcripts(corpus["turns_dir"],
                                 corpus["conversations"])
    assert (run.errors, run.warnings) == (fresh.errors, fresh.warnings)
    assert run.extras["violation_counts"] == fresh.extras["violation_counts"]
    assert run.n_rows == fresh.n_rows

    # layout: findings published via markers, data under attempt prefixes
    pdirs = sorted(os.listdir(os.path.join(out, "partitions")))
    assert len(pdirs) == 3
    for pid in pdirs:
        fp = os.path.join(out, "partitions", pid, "findings")
        assert proto.is_committed_dir(fp)
        assert not os.path.exists(fp + ".tmp")  # no rename protocol used
        assert proto.committed_files(fp, "kind=gpart")
    assert os.path.exists(os.path.join(out, "summary.json"))

    # tear one partition's manifest: only that partition recomputes, its
    # findings get a NEW attempt, the old attempt stays as unreadable
    # garbage, and the verdict is unchanged
    victim = pdirs[0]
    fp = os.path.join(out, "partitions", victim, "findings")
    old_attempt = proto.data_dir(fp)
    with open(os.path.join(out, "manifests", f"{victim}.json"), "w") as f:
        f.write("{torn")
    gc_manifest = os.path.join(out, "manifests", "_groupcheck.json")
    os.remove(gc_manifest)  # force the group phase to re-merge partials
    run2 = run_resumable(corpus["turns_dir"], corpus["conversations"],
                         out, rules, commit_protocol=proto)
    assert (run2.errors, run2.warnings) == (run.errors, run.warnings)
    assert run2.extras["violation_counts"] == run.extras["violation_counts"]
    new_attempt = proto.data_dir(fp)
    assert new_attempt != old_attempt
    assert os.path.isdir(old_attempt)  # garbage, never read


@pytest.mark.parametrize("proto", [PosixCommit(), MarkerCommit()],
                         ids=["posix", "marker"])
def test_gc_reclaims_abandoned_staging_only(proto, tmp_path):
    """gc removes every abandoned attempt / staging dir and nothing a
    reader can reach; the committed artifact reads identically after."""
    final = str(tmp_path / "findings")
    s1 = proto.stage_dir(final)
    with open(os.path.join(s1, "a.parquet"), "w") as f:
        f.write("1")
    proto.publish_dir(s1, final)
    # abandoned writer: staged but never published
    s2 = proto.stage_dir(final)
    with open(os.path.join(s2, "b.parquet"), "w") as f:
        f.write("2")
    before = proto.committed_files(final)
    removed = proto.gc(final)
    assert removed and all(not os.path.exists(p) for p in removed)
    assert proto.committed_files(final) == before
    assert [os.path.basename(f) for f in before] == ["a.parquet"]
    assert proto.gc(final) == []  # idempotent


def test_marker_gc_without_marker_reclaims_all_attempts(tmp_path):
    proto = MarkerCommit()
    final = str(tmp_path / "never_committed")
    s = proto.stage_dir(final)
    with open(os.path.join(s, "x.parquet"), "w") as f:
        f.write("x")
    removed = proto.gc(final)
    assert removed == [s]
    assert not proto.is_committed_dir(final)


def test_gc_run_sweeps_run_layout(tmp_path):
    """gc_run over a synthetic run directory: abandoned attempts under
    partition/groupcheck findings and torn PUT temps next to manifests go;
    committed markers, manifests, data and reports stay."""
    from crn_meta_validate_ray.pipelines.resumable import gc_run

    proto = MarkerCommit()
    out = str(tmp_path / "run")
    keep_files = []
    for fp in [os.path.join(out, "partitions", "p0", "findings"),
               os.path.join(out, "groupcheck", "findings")]:
        s = proto.stage_dir(fp)
        with open(os.path.join(s, "a.parquet"), "w") as f:
            f.write("1")
        proto.publish_dir(s, fp)
        keep_files.extend(proto.committed_files(fp))
        proto.stage_dir(fp)  # abandoned second attempt
    os.makedirs(os.path.join(out, "manifests"))
    proto.put_json({"ok": 1}, os.path.join(out, "manifests", "p0.json"))
    torn = os.path.join(out, "manifests", "p0.json.put-deadbeef")
    with open(torn, "w") as f:
        f.write("{torn")
    torn2 = os.path.join(out, "summary.json.tmp")
    with open(torn2, "w") as f:
        f.write("{torn")
    proto.put_text("report", os.path.join(out, "report.txt"))

    removed = gc_run(out, commit_protocol=proto)
    assert torn in removed and torn2 in removed
    assert sum("_attempt-" in p for p in removed) == 2
    assert all(os.path.isfile(f) for f in keep_files)
    assert proto.get_json(os.path.join(out, "manifests", "p0.json")) \
        == {"ok": 1}
    assert os.path.isfile(os.path.join(out, "report.txt"))
    assert gc_run(out, commit_protocol=proto) == []
