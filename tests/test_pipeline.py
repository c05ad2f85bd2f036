"""End-to-end pipeline tests over the synthetic corpus: violation
archetypes V1-V15 (FIXTURES.md) and oracle parity."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from crn_meta_validate_ray.oracle import (
    oracle_group_checks,
    oracle_normalize,
    oracle_report,
    oracle_violation_rows,
)
from crn_meta_validate_ray.registry import (
    FieldRule,
    TableRules,
    transcript_rules,
)
from crn_meta_validate_ray.sources.synth import CorpusSpec, make_corpus, write_corpus
from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts
from crn_meta_validate_ray.pipelines.validate_pipeline import validate_dataset
from crn_meta_validate_ray.stages.normalize import normalize_stage, write_sanitized

ALL_INJECT = ("V1", "V2", "V4", "V5", "V10", "V11", "V12", "V14")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("corpus")
    spec = CorpusSpec(n_convs=60, inject=ALL_INJECT, mega_conv_turns=300)
    info = write_corpus(spec, str(out), files=3)
    info["spec"] = spec
    return info


@pytest.fixture(scope="module")
def run(corpus):
    return validate_transcripts(corpus["turns_dir"], corpus["conversations"])


def test_archetype_verdicts(corpus, run):
    exp = corpus["expected"]
    counts = run.extras["violation_counts"]
    assert counts["enum:role"] == len(exp["V1_role_rows"])          # V1
    assert counts["enum:tool"] == len(exp["V2_tool_rows"])          # V2
    assert counts["regex:conv_id"] > 0                              # V4
    assert counts["unique:conv_id,turn_idx"] == len(exp["V10_dup_rows"])
    assert counts["seq:turn_idx@conv_id"] >= len(exp["V11_gap_convs"])
    assert counts["ref:conv_id->conversations.conv_id"] > 0         # V12
    assert run.errors > 0 and not run.passed


def test_violation_rows_match_expected_locators(corpus, run):
    exp = corpus["expected"]
    rows = run.violations.take_all()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["constraint_id"], set()).add(r["row_key"])
    assert by_cid["enum:role"] == {f"{c}|{i}" for c, i in exp["V1_role_rows"]}
    assert by_cid["enum:tool"] == {f"{c}|{i}" for c, i in exp["V2_tool_rows"]}
    assert by_cid["unique:conv_id,turn_idx"] == \
        {f"{c}|{i}" for c, i in exp["V10_dup_rows"]}
    # every orphan-turn violation points at a dropped conversation
    orphan_convs = {rk.split("|")[0] for rk
                    in by_cid["ref:conv_id->conversations.conv_id"]}
    assert orphan_convs == set(exp["V12_orphan_convs"])


def test_cell_violations_equal_oracle(corpus, run):
    rules = transcript_rules()
    turns = rd.read_parquet(corpus["turns_dir"]).to_pandas()
    norm = oracle_normalize(turns)
    want = oracle_violation_rows(norm, rules)
    got = {(r["column"], r["constraint_id"], r["row_key"], r["value"])
           for r in run.violations.take_all()
           if r["constraint_id"].split(":")[0] in
           ("regex", "enum", "integer", "string", "timestamp", "float")}
    assert got == want


def test_group_checks_equal_oracle(corpus, run):
    rules = transcript_rules()
    turns = rd.read_parquet(corpus["turns_dir"]).to_pandas()
    want = oracle_group_checks(turns, rules)
    rows = run.violations.take_all()
    got_seq = sorted(r["row_key"] for r in rows
                     if r["constraint_id"] == "seq:turn_idx@conv_id")
    got_dup = sorted(r["row_key"] for r in rows
                     if r["constraint_id"] == "unique:conv_id,turn_idx")
    assert got_seq == want["seq:turn_idx@conv_id"]
    assert got_dup == want["unique:conv_id,turn_idx"]


def test_report_counters_match_oracle_for_cell_rules(corpus):
    """Engine per-cell verdict == single-process oracle verdict (the
    distributed extensions are excluded on both sides)."""
    rules = transcript_rules()
    cellonly = TableRules(table=rules.table, fields=rules.fields,
                          locator=rules.locator)
    turns_pd = rd.read_parquet(corpus["turns_dir"]).to_pandas()
    want = oracle_report(turns_pd, cellonly)

    got = validate_transcripts(corpus["turns_dir"], None, rules=cellonly,
                               sketches=False)
    assert (got.errors, got.warnings) == (want["errors"], want["warnings"])
    w, g = want["result"], got.eval_result
    assert g.null_columns == w.null_columns
    assert g.invalid_required == w.invalid_required
    assert g.invalid_optional == w.invalid_optional
    # distinct-failing-value counts per column match
    got_counts = {e[1]: e[2] for e in g.invalid_entries}
    want_counts = {e[1]: e[2] for e in w.invalid_entries}
    assert got_counts == want_counts
    # failing-value *sets* match (engine orders by locator, oracle by
    # first occurrence — sets must be equal)
    got_vals = {e[1]: set(e[4].split(", ")) for e in g.invalid_entries}
    want_vals = {e[1]: set(e[4].split(", ")) for e in w.invalid_entries}
    assert got_vals == want_vals


def test_per_turn_text_equality_under_stable_ordering(corpus, ray_session):
    """north_star: per-turn `text` equality under stable (conv_id, turn_idx)
    ordering between the engine's normalized output and the oracle."""
    def stable_sort(df):
        # oracle_normalize stringifies every column (reference semantics) —
        # sort both sides on a numeric turn_idx so ordering is comparable
        df = df.assign(__ti=pd.to_numeric(df["turn_idx"]))
        return (df.sort_values(["conv_id", "__ti"], kind="stable")
                .drop(columns="__ti").reset_index(drop=True))

    ds = rd.read_parquet(corpus["turns_dir"])
    engine = stable_sort(normalize_stage(ds).to_pandas())
    oracle = stable_sort(
        oracle_normalize(rd.read_parquet(corpus["turns_dir"]).to_pandas()))
    assert engine["text"].astype(str).tolist() == \
        oracle["text"].astype(str).tolist()


def _mini_rules():
    return TableRules(
        table="mini",
        locator=("pk",),
        fields=[
            FieldRule("pk", "Required", "Integer"),
            FieldRule("req_enum", "Required", "Enum", ["a", "b"],
                      fillnull=["NA"]),
            FieldRule("opt_str", "Optional", "String"),
            FieldRule("req_missing_col", "Required", "String"),
            FieldRule("opt_missing_col", "Optional", "String"),
        ],
    )


def test_missing_and_extra_columns_V7_V8(ray_session):
    t = pa.table({"pk": [1, 2], "req_enum": ["a", "b"],
                  "opt_str": ["x", None], "not_in_registry": ["u", "v"]})
    run = validate_dataset(rd.from_arrow(t), _mini_rules())
    r = run.eval_result
    assert r.missing_required == ["req_missing_col"]        # V7 → error
    assert r.missing_optional == ["opt_missing_col"]
    assert r.extra_columns == ["not_in_registry"]           # V8 → warning
    assert run.errors == 1


def test_write_corpus_rewrite_clears_stale_shards(tmp_path):
    """Re-writing a corpus into the same directory with fewer shards must
    remove the previous write's extra part files — readers glob the turns
    directory, so a stale shard silently blends two corpora (observed as
    phantom referential orphans in a 'clean' corpus)."""
    import os

    out = str(tmp_path / "c")
    write_corpus(CorpusSpec(n_convs=8, inject=()), out, files=3)
    info = write_corpus(CorpusSpec(n_convs=4, inject=()), out, files=1)
    parts = sorted(f for f in os.listdir(info["turns_dir"])
                   if f.endswith(".parquet"))
    assert parts == ["part-00000.parquet"]


def test_write_mode_findings_mat_is_opt_in(ray_session, tmp_path):
    """extras['findings_mat'] pins the materialized findings blocks in the
    object store for the lifetime of the run object, so write mode attaches
    it only when the caller asks (the resumable group phase consumes it);
    every other write-mode caller must get a run WITHOUT the pin."""
    t = pa.table({"pk": [1, 2], "req_enum": ["a", "zzz"],
                  "opt_str": ["x", None], "req_missing_col": ["ok", "ok"],
                  "opt_missing_col": ["z", "z"]})
    run = validate_dataset(rd.from_arrow(t), _mini_rules(),
                           mode="write", out_dir=str(tmp_path / "w1"))
    assert "findings_mat" not in run.extras
    run2 = validate_dataset(rd.from_arrow(t), _mini_rules(),
                            mode="write", out_dir=str(tmp_path / "w2"),
                            return_findings_mat=True)
    assert run2.extras["findings_mat"]
    # the opt-in must not change the verdict
    assert (run.errors, run.warnings) == (run2.errors, run2.warnings)


def test_all_null_is_global_not_per_partition_V6(ray_session):
    """A column all-null in one block but not globally must be partial-null
    (two-phase aggregation; reference utils/validate_core.py:232-236)."""
    t1 = pa.table({"pk": [1, 2], "req_enum": ["NA", "NA"],
                   "opt_str": ["x", "y"], "req_missing_col": ["ok", "ok"],
                   "opt_missing_col": ["z", "z"]})
    t2 = pa.table({"pk": [3], "req_enum": ["a"], "opt_str": ["x"],
                   "req_missing_col": ["ok"], "opt_missing_col": ["z"]})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2)).repartition(2)
    run = validate_dataset(ds, _mini_rules(), batch_size=2)
    r = run.eval_result
    assert r.all_null_required == []
    assert ("REQUIRED", "req_enum", 2) in r.null_columns
    # and globally-all-null IS an error
    t3 = pa.table({"pk": [1], "req_enum": ["NA"], "opt_str": ["x"],
                   "req_missing_col": ["ok"], "opt_missing_col": ["z"]})
    run2 = validate_dataset(rd.from_arrow(t3), _mini_rules())
    assert run2.eval_result.all_null_required == ["req_enum"]


def test_empty_partition_V9(ray_session, tmp_path):
    spec = CorpusSpec(n_convs=5, inject=())
    turns, convs, _ = make_corpus(spec)
    p = tmp_path / "turns"
    p.mkdir()
    pq.write_table(turns, str(p / "a.parquet"))
    pq.write_table(turns.schema.empty_table(), str(p / "empty.parquet"))
    pq.write_table(convs, str(tmp_path / "conversations.parquet"))
    run = validate_transcripts(str(p), str(tmp_path / "conversations.parquet"))
    assert run.n_rows == turns.num_rows  # empty file contributes nothing
    assert run.passed


def test_clean_corpus_passes_V15(ray_session, tmp_path):
    spec = CorpusSpec(n_convs=40, inject=())
    info = write_corpus(spec, str(tmp_path), files=2)
    run = validate_transcripts(info["turns_dir"], info["conversations"])
    assert run.passed and run.errors == 0
    assert run.violations.count() == 0
    # success lines never reach the text log
    assert "✅" not in run.report.get_log()
    # sanitized write gated on verdict
    assert write_sanitized(rd.read_parquet(info["turns_dir"]),
                           transcript_rules(), str(tmp_path / "sanitized"),
                           run.errors)
    out = rd.read_parquet(str(tmp_path / "sanitized"))
    assert out.count() == run.n_rows
    # a re-run into the same sanitized dir replaces rather than blends
    assert write_sanitized(rd.read_parquet(info["turns_dir"]),
                           transcript_rules(), str(tmp_path / "sanitized"),
                           run.errors)
    assert rd.read_parquet(str(tmp_path / "sanitized")).count() == run.n_rows


def test_string_typed_corpus_with_V3(ray_session, tmp_path):
    """String-staged variant (reference CSV world): non-integer turn_idx
    strings are Integer-rule violations."""
    spec = CorpusSpec(n_convs=20, inject=("V3",), string_typed=True)
    turns, convs, exp = make_corpus(spec)
    pq.write_table(turns, str(tmp_path / "turns.parquet"))
    rules = transcript_rules()
    cellonly = TableRules(table=rules.table, fields=rules.fields,
                          locator=rules.locator)
    run = validate_dataset(rd.read_parquet(str(tmp_path / "turns.parquet")),
                           cellonly)
    bad = {r["value"] for r in run.violations.take_all()
           if r["constraint_id"] == "integer:turn_idx"}
    # "3.5","three","x9" invalid; "2.0","1e1"," 4 " valid per pandas
    # to_numeric semantics (reference utils/validate_core.py:240-241)
    want_bad = {v for v in exp["V3_turn_idx_values"]
                if v in ("3.5", "three", "x9")}
    assert bad == want_bad

    # oracle agrees on the full string-typed table
    want = oracle_violation_rows(
        oracle_normalize(turns.to_pandas()), cellonly)
    got = {(r["column"], r["constraint_id"], r["row_key"], r["value"])
           for r in run.violations.take_all()}
    assert got == want


def test_dual_registry_versions(ray_session):
    """Old-vs-new registry toggle (reference app.py:865-932): same data,
    two rule versions, comparable verdicts."""
    from crn_meta_validate_ray.pipelines.validate_pipeline import (
        validate_against_versions,
    )
    t = pa.table({"pk": [1, 2], "req_enum": ["a", "x"], "opt_str": ["s", "t"],
                  "req_missing_col": ["ok", "ok"],
                  "opt_missing_col": ["z", "z"]})
    new_rules = _mini_rules()
    old_rules = TableRules(
        table="mini", locator=("pk",),
        fields=[FieldRule("pk", "Required", "Integer"),
                FieldRule("req_enum", "Required", "Enum", ["a", "x"]),
                FieldRule("opt_str", "Optional", "String"),
                FieldRule("req_missing_col", "Required", "String"),
                FieldRule("opt_missing_col", "Optional", "String")])
    out = validate_against_versions(rd.from_arrow(t),
                                    {"v_old": old_rules, "v_new": new_rules})
    cmp_ = out["__comparison__"]
    # old vocab accepts 'x' → clean pass; new vocab rejects it → error
    assert cmp_["verdicts"] == {"v_old": True, "v_new": False}
    assert cmp_["errors"] == {"v_old": 0, "v_new": 1}
    assert not cmp_["agree"]


def test_group_checks_randomized_vs_oracle(ray_session):
    """Randomized corpora (varying sizes, injected dups/gaps, small salt so
    conversations straddle salt buckets) — salted exchange must equal the
    in-memory oracle exactly."""
    import numpy as np

    from crn_meta_validate_ray.stages.groupcheck import group_check_findings

    rules = transcript_rules()
    for seed in (1, 2, 3, 4, 5):
        rng = np.random.default_rng(seed)
        rows = []
        for c in range(rng.integers(5, 30)):
            n = int(rng.integers(1, 40))
            start = int(rng.integers(0, 2))       # some start at 1 → gap
            idxs = list(range(start, start + n))
            if rng.random() < 0.4 and n > 3:      # drop one → gap
                idxs.remove(idxs[rng.integers(1, len(idxs) - 1)])
            if rng.random() < 0.4:                # duplicate one
                idxs.append(idxs[int(rng.integers(0, len(idxs)))])
            for i in idxs:
                rows.append({"conv_id": f"conv_{c:08d}", "turn_idx": i})
        rng.shuffle(rows)
        df = pd.DataFrame(rows)
        df["ts"] = pd.to_datetime(1_700_000_000 + np.arange(len(df)),
                                  unit="s")
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        # salt_every=8 forces conversations across salt buckets
        findings = group_check_findings(ds, rules, salt_every=8).take_all()
        got_seq = sorted(r["row_key"] for r in findings
                         if r["constraint_id"] == "seq:turn_idx@conv_id")
        got_dup = sorted(r["row_key"] for r in findings
                         if r["constraint_id"] == "unique:conv_id,turn_idx")
        want = oracle_group_checks(df, rules)
        assert got_seq == want["seq:turn_idx@conv_id"], f"seed {seed}"
        assert got_dup == want["unique:conv_id,turn_idx"], f"seed {seed}"


def test_per_group_drift_outlier_V14(corpus, run):
    """V14: the conversation with the shifted ts-gap distribution is flagged
    as a per-group drift outlier (warning), and only that conversation."""
    exp = corpus["expected"]
    rows = [r for r in run.violations.take_all()
            if r["constraint_id"] == "drift:ts_gap:ts:group"]
    assert {r["row_key"] for r in rows} == {exp["V14_drift_conv"]}
    assert all(r["severity"] == "warning" for r in rows)
    assert "mean_gap_s=" in rows[0]["value"]


def test_validate_conversations_table(corpus, ray_session):
    """conv_rules / validate_conversations runs the conversations table
    through the validator and attaches its verdict to extras."""
    run = validate_transcripts(corpus["turns_dir"], corpus["conversations"],
                               validate_conversations=True)
    conv = run.extras["conversations"]
    assert conv["verdict"]["n_rows"] > 0
    assert "errors" in conv["verdict"]


def test_prefold_block_parity(ray_session):
    """fold_findings over the raw findings stream and over the
    _prefold_block-reduced stream produce identical colstats, violation
    counts, and merged sketch estimates."""
    import base64

    import pyarrow as pa

    from crn_meta_validate_ray.registry import transcript_rules
    from crn_meta_validate_ray.pipelines.validate_pipeline import (
        _prefold_block, fold_findings)
    from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA
    from crn_meta_validate_ray.state.sketches import HyperLogLog

    import numpy as np

    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.update(np.array([str(i) for i in range(500)], dtype=object))
    h2.update(np.array([str(i) for i in range(300, 800)], dtype=object))
    rows = []
    for i in range(40):
        rows.append({"kind": "violation", "table": "turns", "column": "role",
                     "constraint_id": "enum:role", "severity": "error",
                     "value": f"bad{i % 3}", "row_key": f"c{i}|0",
                     "sort_key": f"{i:08d}", "n_rows": 0, "n_null": 0,
                     "n_invalid": 0, "invalid_values": None,
                     "invalid_value_keys": None, "exact": True})
    for j, (nn, ni) in enumerate([(5, 2), (0, 1), (3, 0)]):
        rows.append({"kind": "colstat", "table": "turns", "column": "role",
                     "constraint_id": "enum:role", "severity": "error",
                     "value": None, "row_key": None, "sort_key": None,
                     "n_rows": 100, "n_null": nn, "n_invalid": ni,
                     "invalid_values": [f"v{j}"],
                     "invalid_value_keys": [f"{j:08d}"], "exact": True})
    for h in (h1, h2):
        rows.append({"kind": "sketch", "table": "turns",
                     "column": "hll:conv_id", "constraint_id": "sketch",
                     "severity": "info",
                     "value": base64.b64encode(h.to_bytes()).decode(),
                     "row_key": None, "sort_key": None, "n_rows": 0,
                     "n_null": 0, "n_invalid": 0, "invalid_values": None,
                     "invalid_value_keys": None, "exact": True})
    t = pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA)
    rules = transcript_rules()

    cs_raw, counts_raw, sk_raw = fold_findings(iter([t]), rules)
    cs_pre, counts_pre, sk_pre = fold_findings(
        iter([_prefold_block(t)]), rules)
    assert counts_raw == counts_pre == {"enum:role": 40}
    assert cs_raw.keys() == cs_pre.keys()
    for col in cs_raw:
        a, b = cs_raw[col], cs_pre[col]
        assert (a.n_rows, a.n_null, a.n_invalid) == \
            (b.n_rows, b.n_null, b.n_invalid)
        assert a.distinct_invalid == b.distinct_invalid
    assert sk_raw.keys() == sk_pre.keys()
    for k in sk_raw:
        assert abs(sk_raw[k].estimate() - sk_pre[k].estimate()) < 1e-9


def test_empty_exemplar_skips_zero_schema_blocks(ray_session):
    """map_batches skips empty input blocks and emits a zero-schema empty
    block; to_arrow_refs order is nondeterministic, so the exemplar scan
    must not trust the first ref (regression: flaky KeyError '__grp' in
    the group-check exchange when the empty block landed first)."""
    import ray

    from crn_meta_validate_ray.stages.common import empty_exemplar

    real = pa.table({"__grp": ["a"], "__idx": [1]})
    refs = [ray.put(pa.table({})), ray.put(real)]
    ex = empty_exemplar(refs, ["__grp", "__idx"])
    assert ex.num_rows == 0
    assert ex.column_names == ["__grp", "__idx"]
    assert ex.schema.field("__idx").type == pa.int64()
    # all-stale: falls back to a zero-column table (bucket fns guard empty)
    ex2 = empty_exemplar([ray.put(pa.table({}))], ["__grp"])
    assert ex2.num_rows == 0 and ex2.num_columns == 0


def test_flatten_turns_order_and_nulls(ray_session):
    import pandas as pd
    import ray.data as rd

    from crn_meta_validate_ray.pipelines.queries import flatten_turns

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", None, "c2"],
        "turn_idx": pd.array([1, 0, 0, None, 0, 5], dtype="Int64"),
        "role": ["assistant", "user", "user", "tool", "user", None],
        "text": ["hi there", "hello", "abc", "late", "dropped", None],
    })
    out = flatten_turns(rd.from_pandas(df).repartition(3)).to_pandas()
    got = {r.conv_id: r for r in out.itertuples()}
    assert set(got) == {"c1", "c2"}  # null conv_id dropped
    # duplicate turn_idx 0 tie-broken by rendered line; idx 1 last
    assert got["c1"].conv_text == "user: abc\nuser: hello\nassistant: hi there"
    assert got["c1"].n_turns == 3
    # null turn_idx sorts last; null role/text coalesce to NA / ''
    assert got["c2"].conv_text == "NA: \ntool: late"
    assert got["c2"].n_chars == len("NA: \ntool: late")


def test_extract_pairs_null_turn_idx(ray_session):
    import pandas as pd
    import ray.data as rd

    from crn_meta_validate_ray.pipelines.queries import extract_pairs

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": pd.array([0, None, 0, 1], dtype="Int64"),
        "role": ["user", "assistant", "user", "assistant"],
        "text": ["q1", "a1", "q2", "a2"],
    })
    out = extract_pairs(rd.from_pandas(df).repartition(2)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    # null turn_idx sorts last, so the pair is still extracted (SQL lag
    # parity) and the null survives into the output instead of crashing
    assert out["prompt"].tolist() == ["q1", "q2"]
    assert out["response"].tolist() == ["a1", "a2"]
    assert pd.isna(out["turn_idx"].iloc[0]) and out["turn_idx"].iloc[1] == 1


def test_persist_findings_layout_matches_hive_contract(ray_session, tmp_path):
    """The direct chunked sink writes the same hive layout the old
    write_parquet(partition_cols=['kind']) produced: kind in the dir name,
    dropped from the file, readable back through _read_kind."""
    import pyarrow as pa

    import ray.data as rd

    from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA
    from crn_meta_validate_ray.pipelines.validate_pipeline import (
        _read_kind, persist_findings)

    def row(kind, cid):
        return {"kind": kind, "table": "t", "column": "c",
                "constraint_id": cid, "severity": "error", "value": "v",
                "row_key": "k", "sort_key": "k", "n_rows": 1, "n_null": 0,
                "n_invalid": 1, "invalid_values": [], "invalid_value_keys": [],
                "exact": True}

    t = pa.Table.from_pylist(
        [row("violation", "a"), row("violation", "b"), row("sketch", "s"),
         row("gpart", "g")], schema=FINDINGS_SCHEMA)
    ds = rd.from_arrow(t).materialize()
    out = str(tmp_path / "findings")
    persist_findings([ds], out, drop_gpart=True)
    import os
    assert sorted(os.listdir(out)) == ["kind=sketch", "kind=violation"]
    back = _read_kind(out, "violation").take_all()
    assert sorted(r["constraint_id"] for r in back) == ["a", "b"]
    assert all(r["kind"] == "violation" for r in back)
    # empty input: directory created, nothing else (atomic-swap caller
    # still gets a valid, empty findings dir)
    out2 = str(tmp_path / "empty")
    persist_findings([rd.from_arrow(FINDINGS_SCHEMA.empty_table())], out2)
    assert os.listdir(out2) == []
