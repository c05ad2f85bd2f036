"""Differential property tests: the materialization-free check fast paths
(String/Enum/Regex over string columns, `functions/checks.py`) must agree
bit-for-bit with the reference-parity slow path (normalize_null_like →
_check_string) on arbitrary strings — including exotic whitespace, textual
null tokens, the sentinel itself, and true nulls.  These lock the
semantics the round-3 performance work relies on."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from crn_meta_validate_ray.functions.checks import (CompiledFieldRule,
                                                    _LazyNormTake, _combine,
                                                    null_like_mask)
from crn_meta_validate_ray.functions.nulls import (_BLANK_CHARS, _BLANK_RE,
                                                   normalize_null_like)
from crn_meta_validate_ray.registry import (NULL_LIKE_TOKENS, NULL_SENTINEL,
                                            FieldRule)

# strings biased toward the interesting classes: null tokens, sentinel,
# whitespace soup, vocab members, regex hits/misses
_special = st.sampled_from(
    list(NULL_LIKE_TOKENS) + [NULL_SENTINEL, "", " ", "  ",
                              "en", "fr", "xx", "src1", "src42", "NA ",
                              " none", "\x1c", "　\t"])
_anytext = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("L", "N", "Z", "C", "P")),
    max_size=8)
_cell = st.one_of(st.none(), _special, _anytext)
_column = st.lists(_cell, min_size=0, max_size=40)


def _slow_check(rule: FieldRule, col: pa.Array):
    """The pre-round-3 reference shape: materialize the normalized view,
    then run the string-staged kernel on it."""
    k = CompiledFieldRule(rule)
    s = _combine(normalize_null_like(col))
    n_null = int(pc.sum(pc.cast(pc.equal(s, NULL_SENTINEL),
                                pa.int64())).as_py() or 0)
    return k._check_string(s), s, n_null


def _assert_paths_agree(rule: FieldRule, values: list):
    col = pa.array(values, type=pa.string())
    fast_valid, fast_sv, fast_null = CompiledFieldRule(rule).check(col)
    slow_valid, slow_sv, slow_null = _slow_check(rule, col)
    assert fast_null == slow_null
    assert np.array_equal(np.asarray(fast_valid), np.asarray(slow_valid))
    # violation VALUES at the invalid rows must match the normalized view
    bad = np.nonzero(~np.asarray(slow_valid))[0]
    if bad.size:
        assert isinstance(fast_sv, _LazyNormTake)
        got = fast_sv.take_pylist(bad)
        want = pc.take(slow_sv, pa.array(bad)).to_pylist()
        assert got == want


@settings(max_examples=150, deadline=None)
@given(_column)
def test_enum_fast_path_matches_slow(values):
    _assert_paths_agree(
        FieldRule("c", "Required", "Enum", ["en", "fr", "de"]), values)


@settings(max_examples=150, deadline=None)
@given(_column)
def test_enum_with_sentinel_vocab_matches_slow(values):
    # vocab containing the sentinel: null-like rows become VALID
    _assert_paths_agree(
        FieldRule("c", "Optional", "Enum", ["en", "NA"]), values)


@settings(max_examples=150, deadline=None)
@given(_column)
def test_regex_fast_path_matches_slow(values):
    _assert_paths_agree(
        FieldRule("c", "Required", "Regex", r"src[0-9]"), values)


@settings(max_examples=150, deadline=None)
@given(_column)
def test_regex_fillnull_fast_path_matches_slow(values):
    _assert_paths_agree(
        FieldRule("c", "Required", "Regex", r"[a-z]+",
                  fillnull=("xx", "none")), values)


@settings(max_examples=100, deadline=None)
@given(_column)
def test_string_fast_path_matches_slow(values):
    col = pa.array(values, type=pa.string())
    rule = FieldRule("c", "Required", "String")
    fast_valid, _, fast_null = CompiledFieldRule(rule).check(col)
    slow_valid, _, slow_null = _slow_check(rule, col)
    assert fast_null == slow_null
    assert np.array_equal(np.asarray(fast_valid), np.asarray(slow_valid))


@settings(max_examples=150, deadline=None)
@given(_column)
def test_null_like_mask_matches_normalize(values):
    col = pa.array(values, type=pa.string())
    nl = null_like_mask(col)
    s = _combine(normalize_null_like(col))
    want = np.asarray(pc.equal(s, NULL_SENTINEL))
    assert np.array_equal(nl, want)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=6))
def test_blank_chars_equivalent_to_blank_regex(s):
    arr = pa.array([s], type=pa.string())
    via_trim = pc.equal(pc.utf8_trim(arr, _BLANK_CHARS), "")[0].as_py()
    via_re = pc.match_substring_regex(arr, _BLANK_RE)[0].as_py()
    assert via_trim == via_re


def test_lazy_norm_take_large_idx_branch():
    """Force the >2048-row vectorized branch of the lazy handle."""
    vals = ["bad"] * 3000 + [None, " ", "none"]
    col = pa.array(vals, type=pa.string())
    rule = FieldRule("c", "Required", "Enum", ["good"])
    valid, sv, _ = CompiledFieldRule(rule).check(col)
    bad = np.nonzero(~valid)[0]
    assert bad.size == 3003
    got = sv.take_pylist(bad)
    s = _combine(normalize_null_like(col))
    assert got == pc.take(s, pa.array(bad)).to_pylist()
