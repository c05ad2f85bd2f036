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
        rows = []
        n = batch.num_rows
        for key in self.hll_keys:
            if any(c not in batch.column_names for c in key):
                continue
            parts = [np.asarray(batch[c].cast(pa.string()).combine_chunks())
                     .astype(object) for c in key]
            joined = parts[0]
            for p in parts[1:]:
                joined = np.char.add(np.char.add(joined.astype(str), "|"),
                                     p.astype(str)).astype(object)
            hll = HyperLogLog(self.hll_p)
            hll.update(joined)
            rows.append(sketch_row(self.table, f"hll:{'|'.join(key)}",
                                   hll.to_bytes(), n))
        for col in self.cm_columns:
            if col not in batch.column_names:
                continue
            vals = np.asarray(batch[col].cast(pa.string()).combine_chunks()
                              ).astype(object)
            vals = vals[vals != None]  # noqa: E711
            cm = CountMin()
            cm.update(vals)
            rows.append(sketch_row(self.table, f"cm:{col}", cm.to_bytes(), n))
        if not rows:
            return FINDINGS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA)
