"""referential_findings: broadcast + shuffle anti-join semantics, incl.
the multi-RefRule regression (lazy map_batches must not late-bind the
loop's rule/key-set to the last iteration)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.registry import RefRule, TableRules
from crn_meta_validate_ray.stages.refcheck import referential_findings


def _rules():
    return TableRules(
        table="t", locator=("id",),
        references=[RefRule("a", "ta", "k"), RefRule("b", "tb", "k")])


def _inputs():
    ds = rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3, 4],
        "a": ["x", "x", "orphan_a", "y"],
        "b": ["p", "orphan_b", "p", "orphan_b"],
    }))
    targets = {
        "ta": rd.from_pandas(pd.DataFrame({"k": ["x", "y"]})),
        "tb": rd.from_pandas(pd.DataFrame({"k": ["p", "q"]})),
    }
    return ds, targets


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_two_ref_rules_each_checked_against_own_target(ray_session, mode):
    ds, targets = _inputs()
    out = referential_findings(ds, _rules(), targets, mode=mode).to_pandas()
    by_col = out.groupby("column")["value"].apply(
        lambda s: sorted(set(s))).to_dict()
    assert by_col["a"] == ["orphan_a"]
    # broadcast reports per ROW (2 orphan_b rows); shuffle per distinct KEY
    assert by_col["b"] == ["orphan_b"]
    n_b = (out["column"] == "b").sum()
    assert n_b == (2 if mode == "broadcast" else 1)
    cids = set(out["constraint_id"])
    assert cids == {"ref:a->ta.k", "ref:b->tb.k"}
