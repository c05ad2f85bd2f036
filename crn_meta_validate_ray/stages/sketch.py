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
        # Count-Min bucket indices per distinct value, cached across the
        # batches one deserialized instance processes: enum columns have a
        # handful of distinct values, and the per-depth string hashing
        # (4 pandas hash_array calls per batch) otherwise dominates the
        # tiny bincount update
        self._cm_idx_cache: dict = {}
        self._CM_CACHE_MAX = 8192  # see overflow handling in __call__

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
                    h = hash64(vals, seed=j)
                else:
                    # hash once per DISTINCT string and gather through the
                    # dictionary codes — group-id columns repeat heavily,
                    # and element-wise string hashing is the hot kernel.
                    # hash64 is element-independent, so this is exact.
                    enc = pc.dictionary_encode(
                        col.cast(pa.string()).combine_chunks())
                    duniq = np.asarray(enc.dictionary.to_pandas(),
                                       dtype=object)
                    codes = np.asarray(pc.fill_null(enc.indices, -1)) \
                        .astype(np.int64)
                    h = np.empty(n, dtype=np.uint64)
                    isnull = codes < 0
                    if isnull.any():
                        h[isnull] = hash64(np.array([None], dtype=object),
                                           seed=j)[0]
                    if duniq.size:
                        hd = hash64(duniq, seed=j)
                        h[~isnull] = hd[codes[~isnull]]
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
            vals, cnts = uniq[keep], counts[keep]
            fresh = [v for v in vals if v not in self._cm_idx_cache]
            lookup = self._cm_idx_cache
            if fresh:
                fv = np.asarray(fresh, dtype=object)
                stacked = np.stack([
                    (hash64(fv, seed=d + 1) % np.uint64(cm.width))
                    .astype(np.int64) for d in range(cm.depth)], axis=1)
                # bounded cache: a misconfigured single-value Enum rule on
                # a high-cardinality column must not grow a long-lived
                # actor without limit — overflow values use this batch's
                # computed indices without being remembered
                room = self._CM_CACHE_MAX - len(lookup)
                for i, v in enumerate(fresh[:max(0, room)]):
                    lookup[v] = stacked[i]
                if room < len(fresh):
                    from collections import ChainMap
                    lookup = ChainMap(
                        {v: stacked[i] for i, v in enumerate(fresh)},
                        self._cm_idx_cache)
            for d in range(cm.depth):
                idx = np.fromiter(
                    (lookup[v][d] for v in vals),
                    dtype=np.int64, count=len(vals))
                np.add.at(cm.table[d], idx, cnts)
            rows.append(sketch_row(self.table, f"cm:{col}", cm.to_bytes(), n))
        if not rows:
            return FINDINGS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA)
