"""The local correctness-gate emulation must be at least as strict as the
driver's typed value hash: dtype-KIND mismatches (the round-2
props_stats_events HUGEINT→float64 bug class) must fail even when values
are numerically identical."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")
from tools.check_oracle import dtype_kind, normalize  # noqa: E402


def test_dtype_kind_families():
    assert dtype_kind("int32") == dtype_kind("int64") == "int"
    assert dtype_kind("uint32") == "int"
    assert dtype_kind("float64") == "float"
    assert dtype_kind("Float64") == "float"
    assert dtype_kind("bool") == "bool"
    assert dtype_kind("datetime64[us]") == dtype_kind("datetime64[ns]")
    assert dtype_kind("object") == dtype_kind("string") == "object"
    # THE lesson: int64 engine vs float64 oracle must NOT be same-kind
    assert dtype_kind("int64") != dtype_kind("float64")


def test_normalize_preserves_value_equality_not_type():
    got = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], "int64")})
    want = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1.0, 2.0],
                                                        "float64")})
    g, w = normalize(got), normalize(want)
    # values equal after normalize — the old checker stopped here and
    # passed; the kind gate is what rejects this pair
    assert list(g["k"]) == list(w["k"])
    assert dtype_kind(got["n"].dtype) != dtype_kind(want["n"].dtype)


def test_normalize_unifies_benign_differences():
    got = pd.DataFrame({
        "s": pd.array(["x", "y"], dtype="string"),
        "t": pd.to_datetime(["2024-01-01", "2024-01-02"])
        .astype("datetime64[ns]"),
        "n": pd.array([7, 8], dtype="int32"),
        "f": [1.0000004, 2.0],
    })
    want = pd.DataFrame({
        "s": ["x", "y"],
        "t": pd.to_datetime(["2024-01-01", "2024-01-02"])
        .astype("datetime64[us]"),
        "n": pd.array([7, 8], dtype="int64"),
        "f": [1.0000001, 2.0],
    })
    g, w = normalize(got), normalize(want)
    assert g.equals(w)  # string-vs-object, ns-vs-us, int widths, 6dp float
