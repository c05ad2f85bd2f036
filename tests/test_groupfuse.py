"""Fused group checks (stages/groupfuse.py): exact parity with the
exchange path across adversarial layouts, and the spanning-group
gap-outlier regression both paths must now agree on."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.registry import TableRules, transcript_rules
from crn_meta_validate_ray.stages.groupcheck import group_check_findings
from crn_meta_validate_ray.stages.groupfuse import (GroupFuseSpec,
                                                    fused_group_reduce)
from crn_meta_validate_ray.stages.validate import BatchValidator


def _violations(rows):
    return sorted((r["constraint_id"], r["row_key"], r["value"],
                   r["severity"], r["column"])
                  for r in rows if r["kind"] == "violation")


def _run_fused(ds, rules, batch_size):
    spec = GroupFuseSpec.from_rules(rules)
    v = BatchValidator(TableRules(table=rules.table, fields=[],
                                  locator=rules.locator), group_fuse=spec)
    findings = ds.map_batches(v, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    return fused_group_reduce(findings, spec).take_all()


def _rand_corpus(seed: int) -> pd.DataFrame:
    """Shuffled layout with gaps, multi-duplicates, wrong starts and
    gap-outlier conversations; ts monotone in turn_idx (the transcript
    contract both engines define span semantics over)."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(rng.integers(5, 40)):
        n = int(rng.integers(1, 60))
        start = int(rng.integers(0, 2))
        idxs = list(range(start, start + n))
        if rng.random() < 0.4 and n > 3:
            idxs.remove(idxs[rng.integers(1, len(idxs) - 1)])
        if rng.random() < 0.5:
            idxs += [idxs[int(rng.integers(0, len(idxs)))]] \
                * int(rng.integers(1, 4))
        gap = 600 if c % 5 == 0 else 10
        for i in idxs:
            rows.append({"conv_id": f"conv_{c:08d}", "turn_idx": i,
                         "ts_us": (1_700_000_000_000_000 + c * 10**10
                                   + i * gap * 1_000_000)})
    rng.shuffle(rows)
    df = pd.DataFrame(rows)
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    return df.drop(columns=["ts_us"])


@pytest.mark.parametrize("seed", [1, 2, 3, 5, 8])
def test_fused_equals_exchange_randomized(ray_session, seed):
    rules = transcript_rules()
    df = _rand_corpus(seed)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    old = group_check_findings(
        ds.select_columns(["conv_id", "turn_idx", "ts"]), rules,
        salt_every=8).take_all()
    new = _run_fused(ds, rules, batch_size=int(17 + seed * 13))
    assert _violations(old) == _violations(new)


def test_fused_cross_file_duplicates(ray_session):
    """A whole conversation duplicated far away in the table (different
    batch AND block) — run-coverage overlap must detect every idx as a
    duplicate with exact counts, and contiguity must not double-count."""
    rules = transcript_rules()
    base = pd.DataFrame({
        "conv_id": ["conv_00000001"] * 4 + ["conv_00000002"] * 3,
        "turn_idx": [0, 1, 2, 3, 0, 1, 2],
    })
    filler = pd.DataFrame({
        "conv_id": [f"conv_{i + 10:08d}" for i in range(50)
                    for _ in range(2)],
        "turn_idx": [0, 1] * 50,
    })
    dup = base[base["conv_id"] == "conv_00000001"]
    df = pd.concat([base, filler, dup], ignore_index=True)
    df["ts"] = pd.to_datetime(1_700_000_000 + np.arange(len(df)) * 10,
                              unit="s")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(5)
    new = _run_fused(ds, rules, batch_size=8)
    dups = {(r["row_key"], r["value"]) for r in new
            if r["constraint_id"] == "unique:conv_id,turn_idx"}
    assert dups == {(f"conv_00000001|{i}", "count=2") for i in range(4)}
    seqs = {r["row_key"] for r in new
            if r["constraint_id"] == "seq:turn_idx@conv_id"}
    assert seqs == set()  # duplication alone is not a sequence gap
    old = group_check_findings(
        ds.select_columns(["conv_id", "turn_idx", "ts"]), rules,
        salt_every=8).take_all()
    assert _violations(old) == _violations(new)


def test_fused_null_group_rows_excluded(ray_session):
    """NULL group keys are excluded from group checks (oracle pandas
    groupby semantics); the group containing real rows is still checked."""
    rules = transcript_rules()
    df = pd.DataFrame({
        "conv_id": ["c1", "c1", None, "c1"],
        "turn_idx": [0, 1, 7, 3],
        "ts": pd.to_datetime([0, 10, 20, 30], unit="s"),
    })
    new = _run_fused(rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)), rules,
        batch_size=2)
    seqs = [(r["row_key"], r["value"]) for r in new
            if r["constraint_id"] == "seq:turn_idx@conv_id"]
    assert seqs == [("c1", "n=3 distinct=3 min=0 max=3")]


def test_spanning_group_gap_outlier_single_row(ray_session):
    """Regression (old-path bug found by the fused differential): a group
    spanning salt buckets whose gaps are outliers must emit exactly ONE
    gap-outlier row with the FULL-group mean on both engines."""
    rules = transcript_rules()
    n = 40  # spans 5 buckets at salt_every=8
    df = pd.DataFrame({
        "conv_id": ["conv_00000042"] * n,
        "turn_idx": np.arange(n),
        "ts": pd.to_datetime(np.arange(n) * 600, unit="s"),  # 600 s gaps
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    old = group_check_findings(
        ds.select_columns(["conv_id", "turn_idx", "ts"]), rules,
        salt_every=8).take_all()
    new = _run_fused(ds, rules, batch_size=7)
    for rows in (old, new):
        out = [r for r in rows
               if r["constraint_id"] == "drift:ts_gap:ts:group"]
        assert len(out) == 1
        assert out[0]["value"].startswith("mean_gap_s=600.0 ")


def test_fused_shuffle_ref_parity(ray_session, tmp_path):
    """Big-target referential path: the fused anti-join (target keys
    through the gpart exchange) must produce exactly the standalone
    shuffle anti-join's orphan-key rows — same distinct keys, one row
    each — plus identical group-check results."""
    from crn_meta_validate_ray.sources.synth import CorpusSpec, write_corpus
    from crn_meta_validate_ray.pipelines.transcripts import (
        validate_transcripts)

    spec = CorpusSpec(n_convs=60, inject=("V10", "V11", "V12"))
    info = write_corpus(spec, str(tmp_path), files=3)

    def run(engine):
        r = validate_transcripts(info["turns_dir"], info["conversations"],
                                 group_engine=engine, batch_size=128,
                                 ref_mode="shuffle")
        return (r.errors, r.warnings,
                dict(sorted(r.extras["violation_counts"].items())),
                _violations(r.violations.take_all()))

    fused, exchange = run("fused"), run("exchange")
    assert fused == exchange
    assert any(cid.startswith("ref:") for cid in fused[2])  # V5 orphans


def test_fused_flagship_corpus_full_parity(ray_session, tmp_path):
    """End-to-end validate_transcripts: fused vs exchange engines agree on
    the verdict, every violation row, and every count over the injected
    corpus (V1-V14)."""
    from crn_meta_validate_ray.sources.synth import CorpusSpec, write_corpus
    from crn_meta_validate_ray.pipelines.transcripts import (
        validate_transcripts)

    spec = CorpusSpec(n_convs=50,
                      inject=("V1", "V2", "V4", "V5", "V10", "V11", "V12",
                              "V14"),
                      mega_conv_turns=200)
    info = write_corpus(spec, str(tmp_path), files=3)

    def run(engine):
        r = validate_transcripts(info["turns_dir"], info["conversations"],
                                 group_engine=engine, batch_size=256)
        return (r.errors, r.warnings, r.n_rows,
                dict(sorted(r.extras["violation_counts"].items())),
                _violations(r.violations.take_all()))

    assert run("fused") == run("exchange")


def _inner_table(runs, extras=()):
    """Build a gpart inner-schema table: runs = [(grp, mn, mx)], extras =
    [(grp, idx, excess)]."""
    rows = [{"k": 0, "grp": g, "a": mn, "b": mx, "fts": 0, "lts": 0}
            for g, mn, mx in runs]
    rows += [{"k": 1, "grp": g, "a": i, "b": v, "fts": 0, "lts": 0}
             for g, i, v in extras]
    from crn_meta_validate_ray.stages.groupfuse import _INNER_SCHEMA
    return pa.Table.from_pylist(rows, schema=_INNER_SCHEMA)


def _reduce_dups(spec, inner):
    from crn_meta_validate_ray.stages.groupfuse import _gpart_reduce
    out = _gpart_reduce(spec, 1, inner).to_pylist()
    return [(r["row_key"], r["value"]) for r in out
            if r["kind"] == "violation"
            and r["constraint_id"] == spec.uniq_cid]


_UNIQ_SPEC = GroupFuseSpec(table="t", group_col="g", index_col="i",
                           uniq_cid="unique:g,i", uniq_columns=("g", "i"))


def test_gpart_reduce_mega_duplicated_conversation_no_expansion():
    """A wholesale-duplicated mega-conversation (runs overlapping across
    many batches over a 50M-index span): the endpoint sweep must emit the
    first dup_cap duplicates in (grp, idx) order WITHOUT materializing
    per-index coverage — the old flat expansion allocated 2×span rows and
    would blow this reduce task at 100× scale (VERDICT r4 item 1)."""
    span, step = 50_000_000, 100_000
    runs = [("mega", s, s + step - 1) for s in range(0, span, step)]
    inner = _inner_table(runs + runs)  # duplicated batch-by-batch
    dups = _reduce_dups(_UNIQ_SPEC, inner)
    assert len(dups) == _UNIQ_SPEC.dup_cap
    assert dups == [(f"mega|{i}", "count=2")
                    for i in range(_UNIQ_SPEC.dup_cap)]


def test_gpart_reduce_sweep_matches_bruteforce():
    """Randomized runs + in-batch extras across groups (overlaps, adjacent
    non-overlapping runs, extras-only groups, negative indices): the sweep
    must equal a per-index brute-force occurrence count."""
    from collections import Counter
    rng = np.random.default_rng(17)
    for trial in range(30):
        runs, extras = [], []
        counts: Counter = Counter()
        for g in range(int(rng.integers(1, 8))):
            grp = f"g{rng.integers(0, 50):03d}"
            for _ in range(int(rng.integers(0, 6))):
                mn = int(rng.integers(-2, 40))
                mx = mn + int(rng.integers(0, 12))
                runs.append((grp, mn, mx))
                for i in range(mn, mx + 1):
                    counts[(grp, i)] += 1
            for _ in range(int(rng.integers(0, 3))):
                i, v = int(rng.integers(-2, 45)), int(rng.integers(1, 4))
                extras.append((grp, i, v))
                counts[(grp, i)] += v
        if not runs and not extras:
            continue
        expect = sorted((g, i, c) for (g, i), c in counts.items()
                        if c >= 2)[:_UNIQ_SPEC.dup_cap]
        got = _reduce_dups(_UNIQ_SPEC, _inner_table(runs, extras))
        assert got == [(f"{g}|{i}", f"count={c}") for g, i, c in expect], \
            f"trial {trial}"


def test_gpart_reduce_dup_cap_truncates_mid_segment():
    """dup_cap smaller than one coverage segment: the partial segment is
    truncated to exactly the remaining budget, in index order."""
    from dataclasses import replace
    spec = replace(_UNIQ_SPEC, dup_cap=5)
    inner = _inner_table([("a", 0, 99), ("a", 0, 99),
                          ("b", 0, 3), ("b", 0, 3)])
    assert _reduce_dups(spec, inner) == [(f"a|{i}", "count=2")
                                         for i in range(5)]


def test_dup_cap_matches_exchange_bound():
    """Fused-vs-exchange violation parity requires the same dup-detail
    truncation bound on both engines (review finding r4)."""
    from crn_meta_validate_ray.stages.groupcheck import _MAX_DUPS_PER_BUCKET
    assert GroupFuseSpec(table="t", group_col="g",
                         index_col="i").dup_cap == _MAX_DUPS_PER_BUCKET


def test_for_schema_strips_gap_check_when_ts_absent(ray_session):
    """Declared ts_gap drift rule but no ts column in the data: the gap
    check is stripped instead of flagging every group with mean_gap=0
    (review finding r4)."""
    rules = transcript_rules()
    spec = GroupFuseSpec.from_rules(rules)
    stripped = spec.for_schema({"conv_id", "turn_idx", "role", "text"})
    assert stripped is not None
    assert stripped.ts_col is None and stripped.gap_expectation is None
    df = pd.DataFrame({"conv_id": ["a"] * 3 + ["b"] * 2,
                       "turn_idx": [0, 1, 2, 0, 1]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    v = BatchValidator(TableRules(table=rules.table, fields=[],
                                  locator=rules.locator),
                       group_fuse=stripped)
    findings = ds.map_batches(v, batch_format="pyarrow",
                              batch_size=3).materialize()
    out = fused_group_reduce(findings, stripped).take_all()
    assert not [r for r in out if r["kind"] == "violation"]


def test_for_schema_none_when_index_absent():
    spec = GroupFuseSpec.from_rules(transcript_rules())
    assert spec.for_schema({"conv_id", "role", "text"}) is None


def test_missing_index_col_big_target_ref_still_runs(ray_session, tmp_path):
    """Turns without the sequence index column + a referential target too
    big to broadcast: the anti-join must fall back to the standalone
    shuffle path, not ride the (empty) gpart exchange (review finding
    r4). Verified via the one-shot pipeline with the broadcast ceiling
    forced down."""
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.pipelines import transcripts as tr

    turns = pa.table({
        "conv_id": ["c1", "c1", "orphan_x", "c2"],
        "role": ["user", "assistant", "user", "user"],
        "text": ["a", "b", "c", "d"],
    })
    convs = pa.table({"conv_id": ["c1", "c2", "c3"]})
    tdir = tmp_path / "turns"
    tdir.mkdir()
    pq.write_table(turns, str(tdir / "part-0.parquet"))
    pq.write_table(convs, str(tmp_path / "convs.parquet"))
    old = tr.REF_BROADCAST_MAX_TARGET
    tr.REF_BROADCAST_MAX_TARGET = 1  # force the big-target route
    try:
        run = tr.validate_transcripts(str(tdir), str(tmp_path /
                                                     "convs.parquet"))
    finally:
        tr.REF_BROADCAST_MAX_TARGET = old
    counts = run.extras["violation_counts"]
    ref_cid = [k for k in counts if k.startswith("ref:")]
    assert ref_cid and counts[ref_cid[0]] == 1  # orphan_x reported
