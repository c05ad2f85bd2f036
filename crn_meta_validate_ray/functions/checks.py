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

from crn_meta_validate_ray.functions.nulls import (missing_mask,
                                                   normalize_null_like)
from crn_meta_validate_ray.registry import (NULL_LIKE_TOKENS, NULL_SENTINEL,
                                            FieldRule)

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


_NULL_LIKE_PLUS_SENTINEL = pa.array(
    sorted(set(NULL_LIKE_TOKENS) | {NULL_SENTINEL}), type=pa.string())


def null_like_mask(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """True where the cell NORMALIZES to the sentinel (true-null, blank,
    null-like token, or the literal sentinel) — the null census and the
    branch predicate of the materialization-free check fast paths, computed
    without building the normalized string copy."""
    tok = pc.is_in(col, value_set=_NULL_LIKE_PLUS_SENTINEL)
    return _to_bool_np(pc.or_kleene(missing_mask(col),
                                    pc.fill_null(tok, False)))


class _LazyNormTake:
    """Deferred normalized-string view: the reference reports violation
    VALUES post-normalization, but materializing a normalized copy of
    every batch just for the (rare) invalid rows dominates clean-batch
    cost — so the fast-path kernels return this handle and the caller
    materializes only the rows it reports."""

    def __init__(self, col: pa.Array, nl: np.ndarray):
        self._col = col
        self._nl = nl

    def take_pylist(self, idx: np.ndarray) -> list:
        if len(idx) > 2048:  # degenerate batch: vectorized full normalize
            s = _combine(normalize_null_like(self._col))
            return pc.take(s, pa.array(idx)).to_pylist()
        sub = pc.cast(pc.take(self._col, pa.array(idx)),
                      pa.string()).to_pylist()
        nl = self._nl[idx]
        return [NULL_SENTINEL if m else v for m, v in zip(nl, sub)]


def take_strvals(strvals, col, invalid_idx: np.ndarray) -> list:
    """Violation values at ``invalid_idx`` from whatever the kernel
    returned: a lazy handle, a materialized normalized array, or None
    (native typed column — cast the raw values)."""
    if strvals is None:
        return pc.cast(pc.take(_combine(col), pa.array(invalid_idx)),
                       pa.string()).to_pylist()
    if isinstance(strvals, _LazyNormTake):
        return strvals.take_pylist(invalid_idx)
    return pc.take(strvals, pa.array(invalid_idx)).to_pylist()


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
            # fast path: a null-like cell normalizes to the sentinel, which
            # is valid iff it is LITERALLY in the accept set (not implicit)
            self._sentinel_accepted = NULL_SENTINEL in single
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
            dt = self.rule.datatype
            if dt in ("String", "Enum", "Regex") \
                    and not (dt == "Enum" and self.rule.allow_multi):
                return self._check_string_fast(col, dt)
            s = _combine(normalize_null_like(col))
            n_null = int(pc.sum(pc.cast(pc.equal(s, NULL_SENTINEL), pa.int64())).as_py() or 0)
            valid = self._check_string(s)
            return valid, s, n_null
        return self._check_native(col)

    def _check_string_fast(self, col: pa.Array, dt: str):
        """Materialization-free fast paths: rows that normalize to the
        sentinel are identified by mask (``null_like_mask``); every other
        row's normalized value IS its raw value, so membership / regex run
        on the raw column and the normalized copy is never built (the
        violation values come back through a lazy handle).  Semantics are
        identical to ``normalize_null_like`` → ``_check_string``."""
        nl = null_like_mask(col)
        n_null = int(nl.sum())
        lazy = _LazyNormTake(col, nl)
        if dt == "String":
            return np.ones(len(col), dtype=bool), lazy, n_null
        if dt == "Enum":
            raw_ok = _to_bool_np(pc.is_in(col, value_set=self._single_accept))
            valid = np.where(nl, self._sentinel_accepted, raw_ok)
            return valid, lazy, n_null
        # Regex: sentinel ∈ specials always, so null-like rows pass;
        # non-null-like rows check raw ∈ specials or full-match
        special_raw = _to_bool_np(pc.is_in(col, value_set=self._specials))
        if not self._pattern_ok:
            return nl | special_raw, lazy, n_null
        return nl | special_raw | self._regex_mask(col), lazy, n_null

    def _regex_mask(self, s: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """Full-match mask, evaluated once per DISTINCT value: group-id
        and code-like columns repeat heavily, so dictionary-encode first
        and gather the per-dictionary verdict through the codes (nulls →
        False)."""
        arr = _combine(s)
        enc = pc.dictionary_encode(arr)
        d = enc.dictionary
        try:
            md = pc.match_substring_regex(d, self._anchored)
        except pa.ArrowInvalid:
            # RE2 rejects some Python-re constructs (e.g. backreferences);
            # fall back to the Python engine on the distinct values.
            vals = d.to_pylist()
            md = pa.array([u is not None
                           and self._py_regex.fullmatch(u) is not None
                           for u in vals], type=pa.bool_())
        md_np = _to_bool_np(md)
        codes = np.asarray(pc.fill_null(enc.indices, -1)).astype(np.int64)
        out = np.zeros(len(codes), dtype=bool)
        hit = codes >= 0
        out[hit] = md_np[codes[hit]]
        return out

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
            return special | self._regex_mask(s)
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
