"""Per-datatype constraint kernels — the reference's nasty edge cases
(utils/validate_core.py:238-341)."""

import numpy as np
import pyarrow as pa
import pytest

from crn_meta_validate_ray.functions.checks import CompiledFieldRule
from crn_meta_validate_ray.registry import FieldRule, parse_allow_multi


def run(rule, values):
    valid, _, n_null = CompiledFieldRule(rule).check(pa.array(values))
    return list(valid), n_null


def test_integer_accepts_pandas_to_numeric_set():
    rule = FieldRule("x", "Required", "Integer", fillnull=["unk"])
    vals = ["1", "-3", "3.0", "1e3", " 7 ", "3.5", "abc", "NA", "unk", "0x1A"]
    valid, n_null = run(rule, vals)
    #        1     -3    3.0   1e3   " 7 "  3.5    abc    NA    unk   0x1A
    assert valid == [True, True, True, True, True, False, False, True, True,
                     False]
    assert n_null == 1


def test_float_accepts_numeric():
    rule = FieldRule("x", "Required", "Float")
    valid, _ = run(rule, ["1.5", "-2e-3", "inf", "abc", "NA", ""])
    # "" normalizes to NA first → valid special
    assert valid == [True, True, True, False, True, True]


def test_single_enum_sentinel_not_implicitly_allowed():
    # reference utils/validate_core.py:270-275 — single-value Enum accepts
    # Validation ∪ FillNull only; "NA" is invalid unless listed
    rule = FieldRule("x", "Required", "Enum", ["a", "b"])
    valid, _ = run(rule, ["a", "b", "NA", "c", ""])
    assert valid == [True, True, False, False, False]
    rule2 = FieldRule("x", "Required", "Enum", ["a", "b"], fillnull=["NA"])
    valid2, _ = run(rule2, ["a", "NA", ""])
    assert valid2 == [True, True, True]


def test_multi_enum_semantics():
    rule = FieldRule("x", "Required", "Enum", ["a", "b", "c"],
                     fillnull=["Other"], allow_multi=True)
    vals = ["a", "a;b", " a ; c ", "a;;b", "a;z", ";", "", "NA", "Other",
            "Other;a"]
    valid, _ = run(rule, vals)
    # multi-enum allows FillNull ∪ {"NA"} as whole-cell specials; token lists
    # must be non-empty and all-in-vocab ("Other" is NOT a valid token)
    assert valid == [True, True, True, True, False, False, True, True, True,
                     False]


def test_allow_multi_truthiness_excel_quirk():
    # reference utils/validate_core.py:284-285
    assert parse_allow_multi("1.0")
    assert parse_allow_multi("TRUE ")
    assert parse_allow_multi("yes")
    assert not parse_allow_multi("0")
    assert not parse_allow_multi("t")
    assert not parse_allow_multi(None)


def test_regex_fullmatch_and_specials():
    rule = FieldRule("x", "Required", "Regex", r"conv_[0-9]{8}",
                     fillnull=["pending"])
    valid, _ = run(rule, ["conv_00000001", "conv_123", "xconv_00000001x",
                          "NA", "pending", ""])
    assert valid == [True, False, False, True, True, True]


def test_invalid_regex_pattern_makes_all_nonspecial_invalid():
    # reference utils/validate_core.py:324-327 (except re.error → False)
    rule = FieldRule("x", "Required", "Regex", r"([unclosed")
    valid, _ = run(rule, ["anything", "NA"])
    assert valid == [False, True]


def test_native_typed_fast_paths():
    int_col = pa.array([1, 2, None], type=pa.int32())
    rule = FieldRule("x", "Required", "Integer")
    valid, _, n_null = CompiledFieldRule(rule).check(int_col)
    assert list(valid) == [True, True, True] and n_null == 1

    f_col = pa.array([1.0, 2.5, float("nan"), None])
    valid, _, n_null = CompiledFieldRule(rule).check(f_col)
    assert list(valid) == [True, False, True, True] and n_null == 2

    ts_col = pa.array(np.array([1, 2], dtype="datetime64[us]"))
    rule_ts = FieldRule("x", "Required", "Timestamp")
    valid, _, n_null = CompiledFieldRule(rule_ts).check(ts_col)
    assert list(valid) == [True, True] and n_null == 0


def test_timestamp_string_parsing():
    rule = FieldRule("x", "Required", "Timestamp")
    valid, _, _ = CompiledFieldRule(rule).check(
        pa.array(["2024-01-01T10:00:00", "2024-01-01 10:00:00.250",
                  "2024-01-01", "not a date", "NA"]))
    assert list(valid) == [True, True, True, False, True]


def test_timestamp_fraction_strip_is_anchored():
    """The fractional-seconds strip only removes a trailing '.ffff' after a
    seconds field — a dot-digit run elsewhere ('2024-01.5-01') must NOT be
    deleted into a valid-looking date (false negative regression)."""
    rule = FieldRule("x", "Required", "Timestamp")
    valid, _, _ = CompiledFieldRule(rule).check(
        pa.array(["2024-01.5-01",             # mid-string dot: invalid
                  "2024-01-01.5",             # fraction without seconds: invalid
                  "2024-01-01T10:00:00.999",  # genuine fraction: valid
                  "2024-01-01 10:00:00.1"]))  # genuine fraction: valid
    assert list(valid) == [False, False, True, True]


def test_custom_check_hook():
    """SURVEY §2.11 UDF hook: a registered named vectorized predicate runs
    as a first-class constraint; specials still pass; unregistered name
    raises loudly."""
    import pyarrow.compute as pc_

    from crn_meta_validate_ray.registry import (RegistryError,
                                                register_custom_check)

    register_custom_check(
        "even_length", lambda s: pc_.equal(
            pc_.bit_wise_and(pc_.utf8_length(s), 1), 0))
    rule = FieldRule("x", "Required", "Custom", "even_length",
                     fillnull=["skip"])
    valid, _, n_null = CompiledFieldRule(rule).check(
        pa.array(["ab", "abc", "abcd", "skip", None, "NA"]))
    # None normalizes to 'NA' (len 2 → even anyway); specials always pass
    assert list(valid) == [True, False, True, True, True, True]

    bad = FieldRule("x", "Required", "Custom", "no_such_check")
    with pytest.raises(RegistryError, match="not registered"):
        CompiledFieldRule(bad).check(pa.array(["a"]))

    with pytest.raises(RegistryError, match="needs the registered"):
        FieldRule("x", "Required", "Custom")
