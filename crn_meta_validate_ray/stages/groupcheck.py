"""Shuffle-stage checks keyed on the group column (conv_id):

- **uniqueness** of (group, index)  — exact duplicate detection;
- **sequence contiguity**           — index must be start..start+n-1 per group;
- **ts-gap / group-size drift**     — t-digest partials for distribution checks.

Scale design (north_rule: "partitioning / shuffle / skew handled
explicitly"):

1. only the narrow columns (group, index[, ts]) are selected before the
   shuffle — at transcript shape this is a few % of table bytes, and the
   wide ``text`` column never moves;
2. the first groupby keys on **(group, salt_bucket)** where
   ``salt_bucket = index // salt_every`` — a mega-conversation with 10^8
   turns lands in many bounded sub-groups instead of one worker-killing
   group (skew-aware salting, V13);
3. per-bucket partials are *exact* within their disjoint index range
   (count, distinct-count, min, max, dup list, boundary timestamps, gap
   digest), so the second, tiny groupby on (group) merges them losslessly:
   contiguous ⇔ min==start ∧ sum(distinct)==max-start+1 ∧ dups==0.

Violations are emitted in the shared FINDINGS schema; drift partials ride
along as ``kind='sketch'`` rows so the whole check remains a single
consumable stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.registry import SeqRule, TableRules, UniqueRule
from crn_meta_validate_ray.stages.sketch import sketch_row
from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA, _PAD
from crn_meta_validate_ray.state.sketches import TDigest

_MAX_DUPS_PER_GROUP = 100  # cap emitted dup detail rows per group (bounded output)


def _bucket_partial(ts_enabled: bool):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        idx = g["__idx"].to_numpy()
        order = np.argsort(idx, kind="stable")
        sidx = idx[order]
        uniq, counts = np.unique(sidx, return_counts=True)
        dup_vals = uniq[counts > 1][:_MAX_DUPS_PER_GROUP]
        dup_counts = counts[counts > 1][:_MAX_DUPS_PER_GROUP]
        row = {
            "group": g["__grp"].iloc[0],
            "bucket": g["__bkt"].iloc[0],
            "n": len(sidx),
            "n_distinct": len(uniq),
            "min_idx": int(sidx[0]),
            "max_idx": int(sidx[-1]),
            "dup_vals": dup_vals.astype(np.int64).tolist(),
            "dup_counts": dup_counts.astype(np.int64).tolist(),
        }
        if ts_enabled:
            ts_sorted = (g["__ts"].to_numpy()[order]
                         .astype("datetime64[us]").astype(np.int64))
            gaps = (np.diff(ts_sorted) / 1e6 if len(ts_sorted) > 1
                    else np.empty(0))
            td = TDigest()
            td.update(gaps)
            row["first_ts"] = int(ts_sorted[0]) if len(ts_sorted) else 0
            row["last_ts"] = int(ts_sorted[-1]) if len(ts_sorted) else 0
            row["gap_digest"] = td.to_bytes()
        else:
            row["first_ts"] = 0
            row["last_ts"] = 0
            row["gap_digest"] = b""
        return pd.DataFrame([row])

    return fn


def _merge_group(start: int, ts_enabled: bool):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        n = int(g["n"].sum())
        n_distinct = int(g["n_distinct"].sum())  # buckets hold disjoint ranges
        mn = int(g["min_idx"].min())
        mx = int(g["max_idx"].max())
        n_dups = n - n_distinct
        # contiguity is judged on the distinct index set so duplicate rows
        # are reported only by the uniqueness rule, not double-flagged here
        contiguous = (mn == start) and (n_distinct == mx - start + 1)
        dup_vals: list = []
        dup_counts: list = []
        for dv, dc in zip(g["dup_vals"], g["dup_counts"]):
            dup_vals.extend(dv)
            dup_counts.extend(dc)
        row = {
            "group": g["group"].iloc[0],
            "n": n, "n_distinct": n_distinct, "min_idx": mn, "max_idx": mx,
            "n_dups": n_dups, "contiguous": contiguous,
            "dup_vals": dup_vals[:_MAX_DUPS_PER_GROUP],
            "dup_counts": dup_counts[:_MAX_DUPS_PER_GROUP],
        }
        if ts_enabled:
            td = TDigest()
            for raw in g["gap_digest"]:
                if raw:
                    td.merge(TDigest.from_bytes(raw))
            # boundary gaps between consecutive buckets
            if len(g) > 1:
                boundary = (g["first_ts"].to_numpy()[1:]
                            - g["last_ts"].to_numpy()[:-1]) / 1e6
                td.update(boundary)
            row["gap_digest"] = td.to_bytes()
        else:
            row["gap_digest"] = b""
        return pd.DataFrame([row])

    return fn


class _PerGroupFindings:
    """per-conv verdict rows → FINDINGS violations + drift sketch partials."""

    def __init__(self, table: str, seq: SeqRule | None, uniq: UniqueRule | None,
                 gap_metric: str | None, size_metric: str | None):
        self.table = table
        self.seq = seq
        self.uniq = uniq
        self.gap_metric = gap_metric
        self.size_metric = size_metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for _, r in df.iterrows():
            grp = r["group"]
            pad = str(grp)
            if self.seq is not None and not r["contiguous"]:
                rows.append({
                    "kind": "violation", "table": self.table,
                    "column": self.seq.index_col,
                    "constraint_id": self.seq.constraint_id,
                    "severity": self.seq.severity,
                    "value": (f"n={r['n']} distinct={r['n_distinct']} "
                              f"min={r['min_idx']} max={r['max_idx']}"),
                    "row_key": str(grp), "sort_key": pad,
                    "n_rows": None, "n_null": None, "n_invalid": None,
                    "invalid_values": None, "invalid_value_keys": None,
                    "exact": None,
                })
            if self.uniq is not None and r["n_dups"] > 0:
                for dv, dc in zip(r["dup_vals"], r["dup_counts"]):
                    rows.append({
                        "kind": "violation", "table": self.table,
                        "column": ",".join(self.uniq.columns),
                        "constraint_id": self.uniq.constraint_id,
                        "severity": self.uniq.severity,
                        "value": f"count={int(dc)}",
                        "row_key": f"{grp}|{int(dv)}",
                        "sort_key": f"{grp}|{str(int(dv)).zfill(_PAD)}",
                        "n_rows": None, "n_null": None, "n_invalid": None,
                        "invalid_values": None, "invalid_value_keys": None,
                        "exact": None,
                    })
        # block-level drift partials
        if self.gap_metric:
            td = TDigest()
            for raw in df["gap_digest"]:
                if raw:
                    td.merge(TDigest.from_bytes(raw))
            rows.append(sketch_row(self.table, self.gap_metric, td.to_bytes(),
                                   int(df["n"].sum())))
        if self.size_metric:
            td = TDigest()
            td.update(df["n"].to_numpy(dtype=np.float64))
            rows.append(sketch_row(self.table, self.size_metric, td.to_bytes(),
                                   int(df["n"].sum())))
        if not rows:
            return FINDINGS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA)


def group_check_findings(
    ds: "rd.Dataset",
    rules: TableRules,
    *,
    salt_every: int = 65536,
) -> "rd.Dataset | None":
    """Run sequence/uniqueness/drift group checks; returns a FINDINGS-schema
    dataset (or None when the registry declares none of these checks).

    ``ds`` should already be pruned to the needed columns when built from
    Parquet (the caller passes a narrow read); this function additionally
    selects only (group, index[, ts]) before the shuffle.
    """
    seq = rules.sequences[0] if rules.sequences else None
    uniq = rules.unique[0] if rules.unique else None
    gap_rules = [d for d in rules.drift if d.metric == "ts_gap"]
    size_rules = [d for d in rules.drift if d.metric == "group_size"]
    if seq is None and uniq is None and not gap_rules and not size_rules:
        return None

    group_col = seq.group_col if seq else (
        uniq.columns[0] if uniq else (gap_rules + size_rules)[0].group_col)
    index_col = seq.index_col if seq else (
        uniq.columns[1] if uniq and len(uniq.columns) > 1 else None)
    ts_col = gap_rules[0].column if gap_rules else None
    if index_col is None:
        raise ValueError("group checks need an index column")

    cols = [group_col, index_col] + ([ts_col] if ts_col else [])
    narrow = ds.select_columns(cols)

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        grp = pc.cast(t[group_col], pa.string())
        idx = pc.cast(t[index_col], pa.int64())
        bkt = pc.if_else(pc.is_null(idx), pa.scalar(-1, pa.int64()),
                         pc.floor(pc.divide(pc.cast(idx, pa.float64()),
                                            float(salt_every))))
        out = {"__grp": grp, "__idx": pc.fill_null(idx, -1),
               "__bkt": pc.cast(bkt, pa.int64())}
        if ts_col:
            out["__ts"] = t[ts_col]
        return pa.table(out)

    prepped = narrow.map_batches(prep, batch_format="pyarrow",
                                 zero_copy_batch=True)
    partials = prepped.groupby(["__grp", "__bkt"]).map_groups(
        _bucket_partial(bool(ts_col)), batch_format="pandas")
    per_group = partials.groupby("group").map_groups(
        _merge_group(seq.start if seq else 0, bool(ts_col)),
        batch_format="pandas")
    conv = _PerGroupFindings(
        rules.table, seq, uniq,
        gap_rules[0].constraint_id if gap_rules else None,
        size_rules[0].constraint_id if size_rules else None)
    return per_group.map_batches(conv, batch_format="pyarrow")
