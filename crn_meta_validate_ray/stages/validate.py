"""The per-batch validation kernel — the engine's hot path.

One stateless ``map_batches`` pass over zero-copy Arrow batches evaluates
every compiled per-column rule and emits a *findings* table per batch:

- ``kind='violation'`` rows: one per invalid cell, carrying
  ``(table, column, constraint_id, severity, value, row_key, sort_key)`` —
  the scalable replacement for the reference's dense ``invalid_cell_mask``
  (utils/validate_core.py:202), which only exists there to color a UI
  preview;
- ``kind='colstat'`` rows: one per (rule column × batch) partial aggregate
  ``(n_rows, n_null, n_invalid, distinct invalid sample ≤ K with min sort
  key per value, exact flag)`` — merged downstream into the reference's
  global per-column verdicts (all-null / partial-null / distinct-failing-
  value counts, utils/validate_core.py:232-252).

Everything is vectorized (pyarrow.compute / numpy / pandas C kernels); no
Python-per-row loops.  The compiled ConstraintSet is tiny and ships in the
task closure; regexes and vocab arrays are prebuilt at compile time on the
driver (reference analogue: the cached CDE registry, utils/cde.py:574-601).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from crn_meta_validate_ray.functions.checks import (CompiledFieldRule,
                                                    _combine, _to_bool_np,
                                                    take_strvals)
from crn_meta_validate_ray.functions.nulls import normalize_null_like
from crn_meta_validate_ray.registry import NULL_SENTINEL, TableRules


def normalized_view(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Null-normalized string view of any column: string columns get the
    reference null model (whitespace / null-like tokens → "NA"); other
    types cast to string with nulls → "NA"."""
    col = _combine(col)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return _combine(normalize_null_like(col))
    return _combine(pc.fill_null(pc.cast(col, pa.string()), NULL_SENTINEL))

# Findings schema — shared by the per-cell validator and the distributed
# check stages (uniqueness / referential / sequence / drift) so all
# violation streams union cleanly.
FINDINGS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),           # 'violation' | 'colstat'
        ("table", pa.string()),
        ("column", pa.string()),
        ("constraint_id", pa.string()),
        ("severity", pa.string()),       # 'error' | 'warning'
        ("value", pa.string()),          # offending value (normalized view)
        ("row_key", pa.string()),        # display locator, e.g. "conv_00000001|3"
        ("sort_key", pa.string()),       # zero-padded locator for stable ordering
        ("n_rows", pa.int64()),
        ("n_null", pa.int64()),
        ("n_invalid", pa.int64()),
        ("invalid_values", pa.list_(pa.string())),
        ("invalid_value_keys", pa.list_(pa.string())),
        ("exact", pa.bool_()),
    ]
)

_PAD = 20  # zero-pad width for numeric locator parts (covers int64)


def empty_findings() -> pa.Table:
    return FINDINGS_SCHEMA.empty_table()


def make_locator_keys(batch: pa.Table, locator: tuple) -> tuple[pa.Array, pa.Array]:
    """Build (row_key, sort_key) string arrays from the locator columns.

    ``row_key`` is the human-readable joined locator; ``sort_key`` zero-pads
    numeric parts so lexicographic order == numeric order, giving the
    deterministic "first occurrence" ordering used for distinct-failing-value
    reporting (SURVEY §2 A2)."""
    if not locator or any(c not in batch.column_names for c in locator):
        n = batch.num_rows
        idx = pa.array(np.arange(n), type=pa.int64())
        s = pc.cast(idx, pa.string())
        return s, _combine(pc.utf8_lpad(s, _PAD, "0"))
    raws, pads = [], []
    for c in locator:
        col = batch[c]
        s = pc.cast(col, pa.string())
        s = pc.fill_null(s, "")
        raws.append(s)
        if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
            pads.append(pc.utf8_lpad(s, _PAD, "0"))
        else:
            pads.append(s)
    sep = pa.scalar("|", type=pa.string())
    if len(raws) == 1:
        return _combine(raws[0]), _combine(pads[0])
    row_key = pc.binary_join_element_wise(*raws, sep)
    sort_key = pc.binary_join_element_wise(*pads, sep)
    return _combine(row_key), _combine(sort_key)


class BatchValidator:
    """Callable used with ``ds.map_batches(BatchValidator(rules), ...)``.

    Stateless w.r.t. data; holds only the compiled rule kernels.  Used as a
    plain function object so Ray schedules it as cheap stateless tasks; the
    compile step runs once on the driver (pickled kernels are small —
    regex patterns and vocab arrays).

    Optional fused stages (so the wide input is read ONCE per run):

    - ``sketch_spec=(hll_keys, cm_columns)`` — emit the per-batch sketch
      partial rows inline (see stages/sketch.SketchStage for the
      stand-alone actor-pool variant);
    - ``ref_rules_keys=[(RefRule, object_ref_of_key_array)]`` — broadcast
      referential anti-join evaluated per batch (small target side,
      ``ray.put`` once on the driver);
    - ``group_fuse=GroupFuseSpec`` — emit run-length group-check partials
      per batch (``kind='gpart'`` rows; see stages/groupfuse.py) so the
      sequence/uniqueness/drift exchange needs no second read.
    """

    def __init__(self, table_rules: TableRules, sample_k: int = 1000,
                 emit_violations: bool = True, sketch_spec=None,
                 ref_rules_keys=None, group_fuse=None):
        self.table = table_rules.table
        self.locator = table_rules.locator
        self.sample_k = sample_k
        self.emit_violations = emit_violations
        self.rules = [r for r in table_rules.active_fields()]
        self.compiled = {r.field: CompiledFieldRule(r) for r in self.rules}
        self.sketch_spec = sketch_spec
        self.ref_rules_keys = list(ref_rules_keys or [])
        # cross-column conditionals: precompile the value sets once
        self.cond_rules = [
            (c,
             pa.array(sorted(set(c.if_values)), type=pa.string()),
             pa.array(sorted(set(c.then_values)), type=pa.string())
             if c.then_values else None)
            for c in getattr(table_rules, "conditionals", []) or []]
        self.group_fuse = group_fuse
        self._sketcher = None
        if sketch_spec is not None:
            from crn_meta_validate_ray.stages.sketch import SketchStage
            self._sketcher = SketchStage(self.table,
                                         hll_keys=sketch_spec[0],
                                         cm_columns=sketch_spec[1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty_findings()
        # locator keys (row_key/sort_key string arrays over the WHOLE
        # batch) are only consumed by violation rows — lazily built and
        # memoized so a clean batch (the overwhelming case) never pays the
        # cast+pad+join over every row
        keys_cache: list = []

        def locator_keys():
            if not keys_cache:
                rk, sk = make_locator_keys(batch, self.locator)
                keys_cache.append((rk, sk, np.asarray(sk).astype(object)))
            return keys_cache[0]

        out_cols: dict[str, list] = {name: [] for name in FINDINGS_SCHEMA.names}

        def emit(kind, column, cid, severity, value=None, rk=None, sk=None,
                 n_rows=None, n_null=None, n_invalid=None,
                 inv_vals=None, inv_keys=None, exact=None, count=1):
            out_cols["kind"].append(np.repeat(kind, count))
            out_cols["table"].append(np.repeat(self.table, count))
            out_cols["column"].append(np.repeat(column, count))
            out_cols["constraint_id"].append(np.repeat(cid, count))
            out_cols["severity"].append(np.repeat(severity, count))
            out_cols["value"].append(
                value if value is not None else np.repeat(None, count))
            out_cols["row_key"].append(
                rk if rk is not None else np.repeat(None, count))
            out_cols["sort_key"].append(
                sk if sk is not None else np.repeat(None, count))
            out_cols["n_rows"].append(np.repeat(n_rows, count))
            out_cols["n_null"].append(np.repeat(n_null, count))
            out_cols["n_invalid"].append(np.repeat(n_invalid, count))
            out_cols["invalid_values"].append([inv_vals] * count)
            out_cols["invalid_value_keys"].append([inv_keys] * count)
            out_cols["exact"].append(np.repeat(exact, count))

        for rule in self.rules:
            col_name = rule.field
            if col_name not in batch.column_names:
                continue  # missing columns are a schema-level (driver) verdict
            kernel = self.compiled[col_name]
            valid, strvals, n_null = kernel.check(batch[col_name])
            invalid_idx = np.nonzero(~valid)[0]
            n_invalid = int(invalid_idx.size)
            severity = "error" if rule.is_required else "warning"

            inv_vals_list: list = []
            inv_keys_list: list = []
            exact = True
            if n_invalid:
                vals = take_strvals(strvals, batch[col_name], invalid_idx)
                row_key, _sk, np_sort_key = locator_keys()
                keys = np_sort_key[invalid_idx]
                if self.emit_violations:
                    emit("violation", col_name, rule.constraint_id, severity,
                         value=vals,
                         rk=np.asarray(row_key).astype(object)[invalid_idx],
                         sk=keys, count=n_invalid)
                # distinct sample with min sort key per value
                ser = pd.Series(keys, index=pd.Index(vals, name="v"), name="k")
                firsts = ser.groupby(level=0, sort=False).min().sort_values()
                if len(firsts) > self.sample_k:
                    firsts = firsts.iloc[: self.sample_k]
                    exact = False
                inv_vals_list = [str(v) for v in firsts.index.tolist()]
                inv_keys_list = [str(k) for k in firsts.tolist()]

            emit("colstat", col_name, rule.constraint_id, severity,
                 n_rows=n, n_null=n_null, n_invalid=n_invalid,
                 inv_vals=inv_vals_list, inv_keys=inv_keys_list, exact=exact)

        for cond, if_set, then_set in self.cond_rules:
            if (cond.if_col not in batch.column_names
                    or cond.then_col not in batch.column_names):
                continue
            iv = normalized_view(batch[cond.if_col])
            tv = normalized_view(batch[cond.then_col])
            if_hit = _to_bool_np(pc.is_in(iv, value_set=if_set))
            if then_set is not None:
                ok = _to_bool_np(pc.is_in(tv, value_set=then_set))
            else:  # non-missing requirement
                ok = ~_to_bool_np(pc.equal(tv, NULL_SENTINEL))
            idx = np.nonzero(if_hit & ~ok)[0]
            if idx.size and self.emit_violations:
                row_key, _sk, np_sort_key = locator_keys()
                emit("violation", cond.then_col, cond.constraint_id,
                     cond.severity,
                     value=pc.take(tv, pa.array(idx)).to_pylist(),
                     rk=np.asarray(row_key).astype(object)[idx],
                     sk=np_sort_key[idx], count=int(idx.size))

        arrays = []
        for fld in FINDINGS_SCHEMA:
            chunks = out_cols[fld.name]
            if not chunks:
                arrays.append(pa.array([], type=fld.type))
                continue
            if fld.name in ("invalid_values", "invalid_value_keys"):
                flat: list = []
                for ch in chunks:
                    flat.extend(ch)
                arrays.append(pa.array(flat, type=fld.type))
            else:
                flat = np.concatenate([np.asarray(c, dtype=object) for c in chunks])
                arrays.append(pa.array(flat, type=fld.type))
        result = pa.Table.from_arrays(arrays, schema=FINDINGS_SCHEMA)

        extras = []
        if self._sketcher is not None:
            extras.append(self._sketcher(batch))
        if self.ref_rules_keys:
            extras.append(self._ref_check(batch, locator_keys))
        if self.group_fuse is not None:
            from crn_meta_validate_ray.stages.groupfuse import (
                emit_group_partials)
            extras.append(emit_group_partials(self.group_fuse, batch))
        if extras:
            result = pa.concat_tables([result] + extras)
        return result

    def _ref_check(self, batch: pa.Table, locator_keys) -> pa.Table:
        import ray

        from crn_meta_validate_ray.stages.refcheck import (_violation_table,
                                                           membership_mask,
                                                           sorted_key_array)

        out = [empty_findings()]
        for rule, keys_ref in self.ref_rules_keys:
            keys = ray.get(keys_ref) \
                if not isinstance(keys_ref, (pa.Array, np.ndarray)) \
                else keys_ref
            if not isinstance(keys, np.ndarray):
                # legacy arrow input: sort once per task, cache on self —
                # the driver path ships a pre-sorted numpy array so
                # membership is a 3 ms searchsorted, not a 255 ms per-batch
                # is_in value-set rebuild (measured at 1.7M keys)
                cache = getattr(self, "_sorted_ref_keys", None)
                if cache is None:
                    cache = self._sorted_ref_keys = {}
                keys = cache.get(rule.constraint_id)
                if keys is None:
                    keys = cache[rule.constraint_id] = sorted_key_array(
                        ray.get(keys_ref)
                        if not isinstance(keys_ref, pa.Array) else keys_ref)
            if rule.column not in batch.column_names:
                continue
            col = pc.cast(batch[rule.column], pa.string())
            bad = np.nonzero(~membership_mask(col, keys))[0]
            if bad.size:
                take = pa.array(bad)
                row_key, sort_key, _np_sk = locator_keys()
                out.append(_violation_table(
                    self.table, rule,
                    pc.take(_combine(col), take),
                    pc.take(row_key, take), pc.take(sort_key, take)))
        return pa.concat_tables(out)
