"""Null-model semantics (reference: utils/find_missing_values.py)."""

import pyarrow as pa

from crn_meta_validate_ray.functions.nulls import (
    missing_mask,
    normalize_null_like,
    normalize_table,
    table_has_missing_values,
)


def test_missing_iff_true_na_or_blank():
    arr = pa.array(["a", "", " ", "\t\n", None, "NA", "nan", "none", "N/A", "0"])
    got = missing_mask(arr).to_pylist()
    # textual null-likes ("NA","nan","none","N/A") are NOT missing
    assert got == [False, True, True, True, True, False, False, False, False,
                   False]


def test_normalize_rewrites_missing_and_null_like_tokens():
    arr = pa.array(["a", "", "  ", None, "none", "None", "nan", "NaN", "NAN",
                    "N/A", "n/a", "NA", "Na", "null"])
    got = normalize_null_like(arr).to_pylist()
    assert got == ["a", "NA", "NA", "NA", "NA", "NA", "NA", "NA", "NA", "NA",
                   "NA", "NA", "Na", "null"]
    # "Na" and "null" are NOT in the reference token set and survive


def test_normalize_table_only_touches_string_columns():
    t = pa.table({"s": pa.array(["", "x", None]),
                  "i": pa.array([1, None, 3], type=pa.int32())})
    out = normalize_table(t)
    assert out["s"].to_pylist() == ["NA", "x", "NA"]
    assert out["i"].to_pylist() == [1, None, 3]


def test_table_has_missing_values():
    assert table_has_missing_values(pa.table({"a": ["x", " "]}))
    assert not table_has_missing_values(pa.table({"a": ["x", "NA", "nan"]}))
