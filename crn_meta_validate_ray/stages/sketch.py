"""Stateful actor-pool sketch stage (ST3 in SURVEY §2.3).

``SketchStage`` is a callable CLASS used with
``map_batches(SketchStage, concurrency=N, batch_size=B)`` — sketch objects
and hash seeds are built once per actor in ``__init__`` and reused across
batches; each batch emits a handful of ``kind='sketch'`` findings rows
carrying base64-serialized partial sketch state:

- ``hll:<col>`` / ``hll:<col1>|<col2>``  — HyperLogLog of distinct keys
  (uniqueness screening for conv_id and (conv_id, turn_idx));
- ``cm:<col>``                           — Count-Min of value frequencies
  (role/tool controlled-vocabulary distributions).

Partials are merged driver-side (sketches are mergeable by construction);
no actor ever holds unbounded state and an actor restart merely recomputes
that batch (the emitted rows are deterministic per batch).
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA
from crn_meta_validate_ray.state.sketches import CountMin, HyperLogLog


def sketch_row(table: str, metric: str, payload: bytes, n_rows: int) -> dict:
    return {
        "kind": "sketch", "table": table, "column": metric,
        "constraint_id": metric, "severity": "info",
        "value": base64.b64encode(payload).decode("ascii"),
        "row_key": None, "sort_key": None,
        "n_rows": n_rows, "n_null": 0, "n_invalid": 0,
        "invalid_values": [], "invalid_value_keys": [], "exact": True,
    }


class SketchStage:
    """Per-batch partial sketches over selected columns."""

    def __init__(self, table: str, hll_keys: list[tuple] | None = None,
                 cm_columns: list[str] | None = None, hll_p: int = 14):
        self.table = table
        self.hll_keys = [tuple(k) for k in (hll_keys or [])]
        self.cm_columns = list(cm_columns or [])
        self.hll_p = hll_p

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crn_meta_validate_ray.state.sketches import hash64

        rows = []
        n = batch.num_rows
        for key in self.hll_keys:
            if any(c not in batch.column_names for c in key):
                continue
            # combine per-column hashes instead of concatenating strings —
            # hash64 over an int column is pure numpy, over strings one
            # vectorized pandas hash; mixing keeps the composite uniform
            combined = np.zeros(n, dtype=np.uint64)
            for j, c in enumerate(key):
                col = batch[c]
                if pa.types.is_integer(col.type):
                    vals = np.asarray(col.combine_chunks().fill_null(-1)) \
                        .astype(np.uint64)
                else:
                    vals = np.asarray(col.cast(pa.string()).combine_chunks()
                                      .to_pandas(), dtype=object)
                h = hash64(vals, seed=j)
                combined = (combined * np.uint64(0x100000001B3)) ^ h
            hll = HyperLogLog(self.hll_p)
            hll.update_hashes(hash64(combined, seed=99))
            rows.append(sketch_row(self.table, f"hll:{'|'.join(key)}",
                                   hll.to_bytes(), n))
        for col in self.cm_columns:
            if col not in batch.column_names:
                continue
            # pre-aggregate: enum columns have tiny cardinality, so update
            # the sketch with (distinct value, count) instead of hashing
            # every row 4× (one Arrow value_counts vs depth× full-array work)
            vc = pc.value_counts(batch[col].cast(pa.string()).combine_chunks())
            uniq = np.asarray(vc.field("values").to_pandas(), dtype=object)
            counts = np.asarray(vc.field("counts")).astype(np.int64)
            keep = np.array([u is not None for u in uniq], dtype=bool)
            cm = CountMin()
            cm.update(uniq[keep], counts[keep])
            rows.append(sketch_row(self.table, f"cm:{col}", cm.to_bytes(), n))
        if not rows:
            return FINDINGS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA)
