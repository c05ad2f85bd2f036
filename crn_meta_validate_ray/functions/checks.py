"""Compiled per-column constraint checkers — vectorized, batch-local.

Each ``FieldRule`` compiles (once, on the driver) into a ``CompiledFieldRule``
whose ``check(column)`` evaluates a whole Arrow column chunk at once and
returns a numpy validity mask plus the null census for that batch.  The
semantics replicate the reference's string-staged checks
(utils/validate_core.py:238-341) exactly:

- numeric parsing uses ``pd.to_numeric(errors="coerce")`` (same accept-set as
  the reference, :240, :256) on the *normalized string view*;
- single-value Enum membership is ``value ∈ Validation ∪ FillNull`` — the
  sentinel "NA" is NOT implicitly allowed (:270-275, :297-298);
- multi-value Enum (AllowMultiEnum) allows FillNull ∪ {"NA"}, else requires
  ≥1 non-empty ';'-token with every token in Validation (:287-296) —
  vectorized here via split + flatten + bincount instead of a per-cell
  Python lambda;
- Regex is full-match with specials allowed; an invalid pattern makes every
  non-special cell invalid (:317-339).

Native (non-string) Arrow columns take fast paths: an int32 column trivially
satisfies an Integer rule, nulls stand in for the sentinel.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from crn_meta_validate_ray.functions.nulls import normalize_null_like
from crn_meta_validate_ray.registry import NULL_SENTINEL, FieldRule

# Arrow strptime has no %f — fractional seconds are stripped before parsing.
# The strip is anchored to a trailing fraction after a seconds field
# (":SS.ffff" at end-of-string) so a dot-digit run elsewhere in the value
# (e.g. "2024-01.5-01") is NOT removed and still fails to parse.
_TS_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
)
_TS_FRACTION_RE = r"(:[0-9]{2})\.[0-9]+$"


def _combine(arr) -> pa.Array:
    """Flatten a possibly-chunked array into one contiguous Array."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _to_bool_np(mask: pa.Array | pa.ChunkedArray, default: bool = False) -> np.ndarray:
    m = pc.fill_null(mask, default)
    return np.asarray(_combine(m))


class CompiledFieldRule:
    """A FieldRule compiled to vectorized batch kernels.

    ``check(col)`` returns ``(valid, strvals, n_null)`` where

    - ``valid``  : np.ndarray[bool] — True where the cell satisfies the rule;
    - ``strvals``: pa.StringArray   — the normalized string view of the column
      (what the reference reports as the failing value, post-normalization);
    - ``n_null`` : int              — count of sentinel/"null" cells
      (reference: ``(col == "NA").sum()``, utils/validate_core.py:232).
    """

    def __init__(self, rule: FieldRule):
        self.rule = rule
        specials = set(rule.fillnull) | {NULL_SENTINEL}
        self._specials = pa.array(sorted(str(s) for s in specials), type=pa.string())
        if rule.datatype == "Enum":
            vocab = [str(v) for v in rule.enum_vocab()]
            self._vocab = pa.array(sorted(set(vocab)), type=pa.string())
            # Single-enum accept set: Validation ∪ FillNull, *without* the
            # sentinel (utils/validate_core.py:272).
            single = set(vocab) | set(str(f) for f in rule.fillnull)
            self._single_accept = pa.array(sorted(single), type=pa.string())
            # Multi-enum specials: FillNull ∪ {"NA"} (:291).
            multi_special = set(str(f) for f in rule.fillnull) | {NULL_SENTINEL}
            self._multi_special = pa.array(sorted(multi_special), type=pa.string())
        if rule.datatype == "Regex":
            self._pattern_ok = rule.pattern_is_valid()
            self._anchored = f"^(?:{rule.regex_pattern()})$"
            self._py_regex = re.compile(rule.regex_pattern()) if self._pattern_ok else None

    # -- public ------------------------------------------------------------

    def check(self, col: pa.ChunkedArray | pa.Array):
        col = _combine(col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            s = _combine(normalize_null_like(col))
            n_null = int(pc.sum(pc.cast(pc.equal(s, NULL_SENTINEL), pa.int64())).as_py() or 0)
            valid = self._check_string(s)
            return valid, s, n_null
        return self._check_native(col)

    # -- string-staged semantics ------------------------------------------

    def _special_mask(self, s: pa.Array) -> np.ndarray:
        return _to_bool_np(pc.is_in(s, value_set=self._specials))

    def _check_string(self, s: pa.Array) -> np.ndarray:
        dt = self.rule.datatype
        n = len(s)
        if dt == "String":
            return np.ones(n, dtype=bool)
        if dt in ("Integer", "Float"):
            special = self._special_mask(s)
            ser = s.to_pandas()
            num = pd.to_numeric(ser, errors="coerce")
            if dt == "Integer":
                ok = num.notna() & ((num % 1) == 0)
            else:
                ok = num.notna()
            return special | ok.to_numpy(dtype=bool, na_value=False)
        if dt == "Enum":
            if self.rule.allow_multi:
                return self._check_multi_enum(s)
            return _to_bool_np(pc.is_in(s, value_set=self._single_accept))
        if dt == "Regex":
            special = self._special_mask(s)
            if not self._pattern_ok:
                return special
            try:
                m = _to_bool_np(pc.match_substring_regex(s, self._anchored))
            except pa.ArrowInvalid:
                # RE2 rejects some Python-re constructs (e.g. backreferences);
                # fall back to the Python engine on the distinct values.
                uniq = pc.unique(s).to_pylist()
                ok_set = {u for u in uniq if u is not None
                          and self._py_regex.fullmatch(u) is not None}
                m = _to_bool_np(pc.is_in(s, value_set=pa.array(sorted(ok_set),
                                                               type=pa.string())))
            return special | m
        if dt == "Custom":
            # user-extension hook (SURVEY §2.11): registered vectorized
            # predicate over the normalized string view; specials always pass
            from crn_meta_validate_ray.registry import get_custom_check
            special = self._special_mask(s)
            mask = get_custom_check(self.rule.validation)(s)
            if isinstance(mask, (pa.Array, pa.ChunkedArray)):
                mask = _to_bool_np(mask)
            return special | np.asarray(mask, dtype=bool)
        if dt == "Timestamp":
            special = self._special_mask(s)
            stripped = pc.replace_substring_regex(s, _TS_FRACTION_RE, r"\1")
            parsed = None
            for fmt in _TS_FORMATS:
                got = pc.strptime(stripped, format=fmt, unit="us",
                                  error_is_null=True)
                parsed = got if parsed is None else pc.if_else(
                    pc.is_valid(parsed), parsed, got)
            return special | _to_bool_np(pc.is_valid(parsed))
        raise AssertionError(f"unreachable datatype {dt}")

    def _check_multi_enum(self, s: pa.Array) -> np.ndarray:
        n = len(s)
        special = _to_bool_np(pc.is_in(s, value_set=self._multi_special))
        lst = _combine(pc.split_pattern(s, ";"))
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lst))
        parent = np.asarray(_combine(pc.list_parent_indices(lst)))
        nonempty = _to_bool_np(pc.not_equal(flat, ""))
        in_vocab = _to_bool_np(pc.is_in(flat, value_set=self._vocab))
        bad_token = nonempty & ~in_vocab
        n_bad = np.bincount(parent[bad_token], minlength=n)
        n_tok = np.bincount(parent[nonempty], minlength=n)
        return special | ((n_bad == 0) & (n_tok > 0))

    # -- native-typed fast paths ------------------------------------------

    def _check_native(self, col: pa.Array):
        """Typed (non-string) columns: native nulls stand in for the
        sentinel; values that trivially satisfy the logical type pass
        without a string round-trip."""
        dt = self.rule.datatype
        n = len(col)
        null_mask = _to_bool_np(pc.is_null(col), default=False)
        if pa.types.is_floating(col.type):
            # NaN in a float column is null-like (it would normalize to the
            # sentinel in the string-staged world).
            null_mask |= _to_bool_np(pc.is_nan(col), default=False)
        n_null = int(null_mask.sum())

        if dt == "String":
            return np.ones(n, dtype=bool), None, n_null
        if dt == "Integer":
            if pa.types.is_integer(col.type):
                return np.ones(n, dtype=bool), None, n_null
            if pa.types.is_floating(col.type):
                frac0 = pc.equal(pc.round(col), col)
                return null_mask | _to_bool_np(frac0), None, n_null
        if dt == "Float":
            if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                return np.ones(n, dtype=bool), None, n_null
        if dt == "Timestamp":
            if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
                return np.ones(n, dtype=bool), None, n_null
        # Fallback: run the string-staged semantics on a cast view.
        s = _combine(normalize_null_like(pc.cast(col, pa.string())))
        n_null_s = int(pc.sum(pc.cast(pc.equal(s, NULL_SENTINEL),
                                      pa.int64())).as_py() or 0)
        return self._check_string(s), s, n_null_s


def compile_rules(rules: list[FieldRule]) -> dict[str, CompiledFieldRule]:
    """Compile active rules to kernels, keyed by field name."""
    return {r.field: CompiledFieldRule(r) for r in rules}
