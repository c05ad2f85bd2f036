"""Round-3 operators: t-digest approximate quantiles, single-scan
dual-registry verdict comparison, near-dup broadcast byte budget."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------- quantiles

def test_approx_quantiles_error_bound(ray_session):
    """t-digest quantiles of a continuous column: rank error of every
    answer ≤ 3/max_centroids vs the exact empirical distribution."""
    from crn_meta_validate_ray.stages.quantile import approx_quantiles

    rng = np.random.default_rng(7)
    # lognormal = skewed continuous, the case exact_quantiles can't take
    vals = rng.lognormal(mean=1.0, sigma=1.2, size=200_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = approx_quantiles(ds, "v", qs, max_centroids=200).to_pydict()
    svals = np.sort(vals)
    for q, v in zip(got["q"], got["value"]):
        true_rank = np.searchsorted(svals, v) / len(svals)
        assert abs(true_rank - q) <= 3.0 / 200, (q, v, true_rank)


def test_approx_quantiles_nulls_and_empty(ray_session):
    from crn_meta_validate_ray.stages.quantile import approx_quantiles

    ds = rd.from_arrow(pa.table(
        {"v": pa.array([1.0, None, 3.0, None, 2.0], type=pa.float64())}))
    got = approx_quantiles(ds, "v", [0.5]).to_pydict()
    assert got["value"][0] == pytest.approx(2.0, abs=0.5)
    empty = rd.from_arrow(pa.table(
        {"v": pa.array([], type=pa.float64())}))
    got = approx_quantiles(empty, "v", [0.5]).to_pydict()
    assert got["value"][0] is None


def test_quantile_rank_check_within_tol(ray_session):
    from crn_meta_validate_ray.stages.quantile import quantile_rank_check

    rng = np.random.default_rng(11)
    ds = rd.from_arrow(pa.table(
        {"v": rng.standard_normal(50_000)})).repartition(4)
    got = quantile_rank_check(ds, "v", [0.1, 0.5, 0.9]).to_pydict()
    assert got["within_tol"] == [True, True, True]


def test_quantile_rank_check_with_nans(ray_session):
    """NaN rows (not Arrow nulls) must not deflate the rank denominator —
    the digest ranks over finite values only (review regression)."""
    from crn_meta_validate_ray.stages.quantile import quantile_rank_check

    rng = np.random.default_rng(5)
    vals = rng.standard_normal(50_000)
    vals[rng.integers(0, 50_000, 10_000)] = np.nan
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(4)
    got = quantile_rank_check(ds, "v", [0.1, 0.5, 0.9]).to_pydict()
    assert got["within_tol"] == [True, True, True]


def test_group_approx_quantiles_error_bound(ray_session):
    """Per-group t-digest quantiles: every group's answers satisfy the
    rank bound vs that group's exact empirical distribution."""
    from crn_meta_validate_ray.stages.quantile import (
        group_approx_quantiles, group_quantile_rank_check)

    rng = np.random.default_rng(9)
    n = 120_000
    groups = rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1])
    vals = rng.lognormal(1.0, 1.0, n) + (groups == "b") * 5.0
    ds = rd.from_arrow(pa.table({"g": groups, "v": vals})).repartition(6)
    got = group_approx_quantiles(ds, "g", "v",
                                 [0.1, 0.5, 0.9]).to_pandas()
    assert set(got["g"]) == {"a", "b", "c"}
    for g in "abc":
        sv = np.sort(vals[groups == g])
        sub = got[got["g"] == g]
        for q, v in zip(sub["q"], sub["value"]):
            rank = np.searchsorted(sv, v) / len(sv)
            assert abs(rank - q) <= 3.0 / 200, (g, q, v, rank)
    check = group_quantile_rank_check(ds, "g", "v",
                                      [0.1, 0.5, 0.9]).to_pydict()
    assert all(check["within_tol"])
    assert len(check["q"]) == 9


def test_group_approx_quantiles_null_groups_and_values(ray_session):
    """Null group labels survive as Arrow nulls; a group whose values are
    all null/NaN emits no rows (no quantiles exist); empty exchange
    buckets emit the same schema (review regressions)."""
    from crn_meta_validate_ray.stages.quantile import (
        group_approx_quantiles, group_quantile_rank_check)

    t = pa.table({
        "g": pa.array(["a", "a", None, None, "b", "b", "c"]),
        "v": pa.array([1.0, 3.0, 10.0, 20.0, None, float("nan"), 5.0]),
    })
    ds = rd.from_arrow(t).repartition(2)
    import pandas as pd

    got = group_approx_quantiles(ds, "g", "v", [0.5]).to_pandas()
    by_g = {(None if pd.isna(g) else g): v
            for g, v in zip(got["g"], got["value"])}
    assert set(by_g) == {"a", None, "c"}  # 'b' has no finite values
    assert by_g["c"] == pytest.approx(5.0)
    assert 10.0 <= by_g[None] <= 20.0
    check = group_quantile_rank_check(ds, "g", "v", [0.5]).to_pydict()
    assert len(check["q"]) == 3
    assert all(check["within_tol"])


def test_quantile_rank_check_heavy_ties(ray_session):
    """Discrete column with mass points: the [rank_lo, rank_hi] interval
    (not a point rank) is what makes the check pass on ties."""
    from crn_meta_validate_ray.stages.quantile import quantile_rank_check

    vals = np.repeat([1.0, 2.0, 3.0], [5000, 90000, 5000])
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(4)
    got = quantile_rank_check(ds, "v", [0.25, 0.5, 0.75]).to_pydict()
    assert got["within_tol"] == [True, True, True]


# -------------------------------------------------- dual-registry comparison

def _mk_docs_table() -> pa.Table:
    # no nulls in lang: null-like normalizes to the "NA" sentinel, which
    # fails an Enum whose vocab omits it (reference null model) — this
    # fixture isolates the vocab-widening delta instead
    langs = ["en", "fr", "de", "xx", "en"] * 20
    ids = [f"d{i:04d}" for i in range(100)]
    scores = [str(i % 7) for i in range(100)]
    return pa.table({"doc_id": ids, "lang": langs, "score": scores})


def test_compare_verdicts_deltas(ray_session):
    from crn_meta_validate_ray.pipelines.validate_pipeline import \
        compare_verdicts
    from crn_meta_validate_ray.registry import FieldRule, TableRules

    ds = rd.from_arrow(_mk_docs_table()).repartition(3)
    old = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("doc_id", "Required", "String"),
        # old vocab misses 'xx' -> fails
        FieldRule("lang", "Optional", "Enum", ["en", "fr", "de"]),
        FieldRule("score", "Required", "Integer"),
    ])
    new = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("doc_id", "Required", "String"),
        # new vocab includes 'xx' -> fixed
        FieldRule("lang", "Optional", "Enum", ["en", "fr", "de", "xx"]),
        # new regex constraint -> broken (ids are d0000..)
        FieldRule("doc_id2", "Required", "String"),  # added rule
    ])
    delta = compare_verdicts(ds, old, new).to_pylist()
    by_col = {r["column"]: r for r in delta}
    assert by_col["lang"]["change"] == "fixed"
    assert by_col["lang"]["n_invalid_old"] == 20
    assert by_col["lang"]["n_invalid_new"] == 0
    assert by_col["score"]["change"] == "removed"
    assert by_col["score"]["verdict_new"] == "absent"
    assert by_col["doc_id2"]["change"] == "added"
    assert by_col["doc_id"]["change"] == "unchanged_pass"


def test_registry_rejects_duplicate_field_rules():
    """compare_verdicts' one-colstat-row-per-(version, column, constraint)
    assumption (advice r03) is guaranteed at the REGISTRY level: a
    TableRules carrying two rules on one field never constructs (the
    reference's validate_cde_completeness analogue), and the delta is
    additionally keyed by (column, constraint_id) as defense in depth."""
    import pytest

    from crn_meta_validate_ray.registry import (FieldRule, RegistryError,
                                                TableRules)

    with pytest.raises(RegistryError, match="duplicate rule"):
        TableRules(table="docs", locator=("doc_id",), fields=[
            FieldRule("lang", "Optional", "String"),
            FieldRule("lang", "Optional", "Enum", ["en", "fr", "de"]),
        ])


def test_compare_verdicts_matches_two_full_runs(ray_session):
    """The single-scan comparison must agree with two independent
    validate_dataset runs on per-constraint invalid counts."""
    from crn_meta_validate_ray.pipelines.validate_pipeline import (
        compare_verdicts, validate_dataset)
    from crn_meta_validate_ray.registry import FieldRule, TableRules

    ds = rd.from_arrow(_mk_docs_table()).repartition(3)
    old = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("lang", "Required", "Enum", ["en", "fr"]),
        FieldRule("score", "Required", "Integer"),
    ])
    new = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("lang", "Required", "Enum", ["en", "fr", "de", "xx"]),
        FieldRule("score", "Required", "Float"),
    ])
    delta = {r["column"]: r for r in compare_verdicts(ds, old, new)
             .to_pylist()}
    for name, rules in (("old", old), ("new", new)):
        run = validate_dataset(ds, rules)
        for col, cs in run.colstats.items():
            assert delta[col][f"n_invalid_{name}"] == cs.n_invalid, \
                (name, col)


def test_compare_verdicts_no_ruled_columns(ray_session):
    """Every rule targets a column absent from the data (or the input is
    empty): all rules surface as schema-level rows instead of raising
    (review regression: KeyError on an empty colstat stream)."""
    from crn_meta_validate_ray.pipelines.validate_pipeline import \
        compare_verdicts
    from crn_meta_validate_ray.registry import FieldRule, TableRules

    old = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("ghost", "Required", "String")])
    new = TableRules(table="docs", locator=("doc_id",), fields=[
        FieldRule("ghost", "Required", "String"),
        FieldRule("ghost2", "Required", "Integer")])
    ds = rd.from_arrow(pa.table({"other": ["a", "b"]}))
    delta = {r["column"]: r for r in compare_verdicts(ds, old, new)
             .to_pylist()}
    assert delta["ghost"]["verdict_old"] == "missing"
    assert delta["ghost"]["verdict_new"] == "missing"
    assert delta["ghost2"]["change"] == "added"

    empty = rd.from_arrow(pa.table({"ghost": pa.array([], pa.string())}))
    delta = compare_verdicts(empty, old, new).to_pylist()
    assert {r["column"] for r in delta} == {"ghost", "ghost2"}


# ------------------------------------------------- near-dup path auto-switch

def _embed_ds(n=60, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base[n - 1] = base[0] * 3.0  # parallel pair => cosine 1
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(base.tolist(), type=pa.list_(pa.float32())),
    }))


def test_near_dup_auto_byte_budget(ray_session, monkeypatch):
    """mode='auto' must route to LSH when the reference matrix would
    exceed the object-store byte budget, even under the row-count guard;
    and to broadcast when both guards hold."""
    import crn_meta_validate_ray.stages.similarity as sim

    ds = _embed_ds()

    def boom(*a, **k):
        raise AssertionError("wrong path chosen")

    # tiny byte budget -> broadcast must NOT be used
    monkeypatch.setattr(sim, "_near_dup_broadcast", boom)
    pairs = {(r["id_a"], r["id_b"])
             for r in sim.embedding_near_dup_pairs(
                 ds, threshold=0.99, byte_budget=8,
                 n_tables=8).take_all()}
    assert (0, 59) in pairs
    monkeypatch.undo()

    # default budgets -> LSH must NOT be used
    monkeypatch.setattr(sim, "_near_dup_lsh", boom)
    pairs = {(r["id_a"], r["id_b"])
             for r in sim.embedding_near_dup_pairs(
                 ds, threshold=0.99).take_all()}
    assert (0, 59) in pairs
