"""The three-layer null model, vectorized over Arrow arrays.

Reference semantics (utils/find_missing_values.py):

- *missing*  = true NA or empty/whitespace-only string; textual tokens like
  "NA"/"none"/"nan" are NOT missing (:18-34, compute_missing_mask).
- *normalize* = missing cells plus the textual null-like tokens
  none/None/nan/NaN/NAN/N/A/n/a are rewritten to the sentinel "NA"
  (:4, :7-15, :37-56).
- at check time, FillNull ∪ {"NA"} is always valid (utils/validate_core.py:228-229).

All kernels are pure ``pyarrow.compute`` — zero Python per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from crn_meta_validate_ray.registry import NULL_LIKE_TOKENS, NULL_SENTINEL

# Python's re (the reference's engine) counts \x1c-\x1f, \x85 and Unicode
# separators as \s; RE2's \s is ASCII-only, so the class is widened to match
# pandas ``str.fullmatch(r"\s*")`` exactly (found by hypothesis).
_BLANK_RE = r"^[\s\x0b\x1c-\x1f\x85\p{Z}]*$"
# The same class enumerated as characters: a string is blank iff trimming
# every class char empties it — ``utf8_trim`` + ``equal ''`` measures 3×
# faster than the RE2 class match and runs on every string column per
# batch.  \p{Z} = Zs ∪ Zl ∪ Zp (Unicode 15).  Equivalence is pinned by the
# hypothesis suite in tests/test_null_robustness.py.
_BLANK_CHARS = "".join(map(chr, (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20,          # \\s (RE2) + \\x0b
    0x1C, 0x1D, 0x1E, 0x1F, 0x85,                # widened ASCII / NEL
    0xA0, 0x1680, *range(0x2000, 0x200B),        # Zs
    0x2028, 0x2029,                              # Zl, Zp
    0x202F, 0x205F, 0x3000)))                    # Zs narrow/math/ideographic
_NULL_LIKE_ARR = pa.array(list(NULL_LIKE_TOKENS), type=pa.string())


def _as_string(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return pc.cast(arr, pa.string())


def missing_mask(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Boolean mask: True where the cell is missing (true-null or
    blank/whitespace-only). Mirrors compute_missing_mask
    (utils/find_missing_values.py:18-34); blank = trimming every
    ``_BLANK_CHARS`` char empties the string (≡ ``_BLANK_RE``, 3× faster)."""
    s = _as_string(arr)
    blank = pc.equal(pc.utf8_trim(s, _BLANK_CHARS), "")
    return pc.or_kleene(pc.is_null(s), pc.fill_null(blank, False))


def normalize_null_like(arr: pa.ChunkedArray | pa.Array,
                        sentinel: str = NULL_SENTINEL) -> pa.ChunkedArray | pa.Array:
    """Rewrite missing cells and null-like tokens to ``sentinel``; returns a
    non-null string array. Mirrors normalize_null_like_series
    (utils/find_missing_values.py:37-56)."""
    s = _as_string(arr)
    sent = pa.scalar(sentinel, type=pa.string())
    out = pc.if_else(missing_mask(s), sent, s)
    null_like = pc.is_in(out, value_set=_NULL_LIKE_ARR)
    return pc.if_else(null_like, sent, out)


def normalize_table(table: pa.Table, columns: list[str] | None = None,
                    sentinel: str = NULL_SENTINEL) -> pa.Table:
    """Null-normalize string columns of an Arrow table in place-ish
    (mirrors normalize_null_like_dataframe, utils/find_missing_values.py:59-70).

    Only string-typed columns are rewritten; typed columns keep their native
    nulls (the validator treats native nulls as the sentinel at check time).
    """
    names = columns if columns is not None else table.column_names
    for name in names:
        if name not in table.column_names:
            continue
        col = table[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            idx = table.column_names.index(name)
            table = table.set_column(idx, name, normalize_null_like(col, sentinel))
    return table


def table_has_missing_values(table: pa.Table) -> bool:
    """Any missing cell anywhere (mirrors utils/find_missing_values.py:73-84)."""
    for name in table.column_names:
        if bool(pc.any(missing_mask(table[name])).as_py()):
            return True
    return False
