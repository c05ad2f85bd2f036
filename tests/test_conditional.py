"""Cross-column conditional constraints (CondRule)."""

import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.registry import (CondRule, ConstraintSet,
                                            RegistryError, TableRules)
from crn_meta_validate_ray.pipelines.validate_pipeline import validate_dataset


@pytest.fixture(scope="module")
def table():
    return pa.table({
        "rid": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "role": ["tool", "tool", "user", "tool", None, "tool"],
        # row 0 ok; row 1 missing (whitespace); row 3 null-like token;
        # row 5 value outside the allowed set
        "tool": ["search", "   ", "whatever", "none", "x", "hammer"],
    })


def _rules(then_values=()):
    return TableRules(
        table="t", locator=("rid",),
        conditionals=[CondRule("role", ("tool",), "tool",
                               then_values=then_values)])


def test_cond_non_missing(ray_session, table):
    run = validate_dataset(rd.from_arrow(table), _rules())
    rows = run.violations.take_all()
    # rows 1 ("   " -> NA) and 3 ("none" -> NA) violate; rows 2/4 have a
    # non-matching/missing if-value; row 5 is non-missing so it passes
    assert sorted(r["row_key"] for r in rows) == ["1", "3"]
    assert all(r["constraint_id"] == "cond:role->tool" for r in rows)
    assert all(r["value"] == "NA" for r in rows)
    assert run.errors == 1  # one violated conditional family
    assert run.extras["violation_counts"]["cond:role->tool"] == 2


def test_cond_value_set(ray_session, table):
    run = validate_dataset(
        rd.from_arrow(table),
        _rules(then_values=("search", "code", "browser", "calculator")))
    rows = run.violations.take_all()
    # "NA" is not in the accept set, so missings violate too; "hammer"
    # (row 5) now also violates
    assert sorted(r["row_key"] for r in rows) == ["1", "3", "5"]


def test_cond_warning_severity(ray_session, table):
    rules = TableRules(
        table="t", locator=("rid",),
        conditionals=[CondRule("role", ("tool",), "tool",
                               severity="warning")])
    run = validate_dataset(rd.from_arrow(table), rules)
    assert run.errors == 0 and run.warnings >= 1
    assert run.passed


def test_cond_registry_roundtrip_and_hash():
    cs = ConstraintSet().add(_rules(then_values=("search",)))
    again = ConstraintSet.from_json(cs.to_json())
    assert again.content_hash() == cs.content_hash()
    cond = again.for_table("t").conditionals[0]
    assert cond.if_values == ("tool",)
    assert cond.then_values == ("search",)
    # changing the conditional changes checkpoint lineage
    other = ConstraintSet().add(_rules(then_values=("code",)))
    assert other.content_hash() != cs.content_hash()


def test_cond_empty_if_values_rejected():
    with pytest.raises(RegistryError):
        CondRule("role", (), "tool")
