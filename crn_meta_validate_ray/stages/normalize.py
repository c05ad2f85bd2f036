"""Normalization + repair stages (reference M2 / M9 / W2).

- ``normalize_stage``   — dataset-wide null-like → sentinel rewrite
  (utils/find_missing_values.py:59-70), a stateless vectorized
  ``map_batches``;
- ``apply_fill_stage``  — config-driven fill of *missing* cells with a
  per-column chosen value (the batch analogue of the interactive
  ``apply_fill_choice`` coalesce, app.py:770-808: where missing-mask, fill;
  else keep);
- ``write_sanitized``   — writes the repaired table as partitioned Parquet,
  gated on a zero-error verdict exactly like the reference's sanitized-CSV
  export (app.py:1020, gate at :1064-1082).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.functions.nulls import missing_mask, normalize_table
from crn_meta_validate_ray.registry import TableRules


def normalize_stage(ds: "rd.Dataset", columns: list[str] | None = None
                    ) -> "rd.Dataset":
    return ds.map_batches(
        lambda t: normalize_table(t, columns),
        batch_format="pyarrow", zero_copy_batch=True)


def apply_fill_stage(ds: "rd.Dataset", fill_choices: dict[str, str]
                     ) -> "rd.Dataset":
    """Coalesce: where a cell is *missing* (true-NA or blank — textual "NA"
    is not missing, reference app.py:770-808), substitute the configured
    fill value; otherwise keep the original."""
    choices = dict(fill_choices)

    def fill(t: pa.Table) -> pa.Table:
        for col, value in choices.items():
            if col not in t.column_names:
                continue
            arr = t[col]
            if not (pa.types.is_string(arr.type)
                    or pa.types.is_large_string(arr.type)):
                continue
            filled = pc.if_else(missing_mask(arr),
                                pa.scalar(str(value), pa.string()), arr)
            t = t.set_column(t.column_names.index(col), col, filled)
        return t

    return ds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def write_sanitized(ds: "rd.Dataset", rules: TableRules, out_dir: str,
                    errors: int, *, min_rows_per_file: int = 500_000) -> bool:
    """Write the normalized table only when the validation verdict has zero
    blocking errors (reference gate app.py:1064-1082). Adds registry fields
    missing from the table as all-sentinel columns so the output is
    schema-complete (reference utils/validate_ui.py:395-397)."""
    if errors != 0:
        return False
    schema_names = set(ds.schema().names)
    missing = [r.field for r in rules.active_fields()
               if r.field not in schema_names]

    def complete(t: pa.Table) -> pa.Table:
        for col in missing:
            t = t.append_column(
                col, pa.array(["NA"] * t.num_rows, type=pa.string()))
        return t

    out = normalize_stage(ds)
    if missing:
        out = out.map_batches(complete, batch_format="pyarrow",
                              zero_copy_batch=True)
    # the parquet writer names files per-run, so a re-run into the same
    # directory would BLEND old and new output; clear a stale local dir
    # first (no-op for object-store URIs — route those through
    # state/commit.py's MarkerCommit instead)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    out.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    return True
