"""Shuffle-stage checks keyed on the group column (conv_id):

- **uniqueness** of (group, index)  — exact duplicate detection;
- **sequence contiguity**           — index must be start..start+n-1 per group;
- **ts-gap / group-size drift**     — t-digest partials for distribution checks.

Scale design (north_rule: "partitioning / shuffle / skew handled
explicitly"):

1. only the narrow columns (group, index[, ts]) are selected before the
   shuffle — at transcript shape this is a few % of table bytes, and the
   wide ``text`` column never moves;
2. rows are co-located by **hash(group, salt_bucket)** where
   ``salt_bucket = index // salt_every`` — a mega-conversation with 10^8
   turns spreads over many bounded sub-groups instead of one worker-killing
   group (skew-aware salting, V13), and the number of *physical* groups is
   capped at ``num_buckets`` so per-group Python overhead never dominates
   (see stages/common.grouped_map);
3. per-(group, salt_bucket) partials are exact within their disjoint index
   range — count, distinct-count, min, max, duplicate detail, boundary
   timestamps, gap-digest — so the per-group merge is lossless:
   contiguous ⇔ min==start ∧ Σdistinct==max-start+1; duplicates ⇔
   Σn > Σdistinct.

Everything inside a bucket is one vectorized pandas groupby — no Python
loop over conversations anywhere.  Violations are emitted in the shared
FINDINGS schema; drift partials ride along as ``kind='sketch'`` rows so the
whole check remains a single consumable stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.registry import SeqRule, TableRules, UniqueRule
from crn_meta_validate_ray.stages.common import grouped_map, pd_to_arrow
from crn_meta_validate_ray.stages.sketch import sketch_row
from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA, _PAD
from crn_meta_validate_ray.state.sketches import TDigest

_MAX_DUPS_PER_BUCKET = 10_000  # bound dup-detail rows per physical bucket


def _bucket_partials(ts_enabled: bool, salt_every: int = 65536):
    """Stage A: all rows of each (group, salt_bucket) → one partial row,
    plus dup-detail rows and one gap-digest row per physical bucket.

    Fully vectorized: one composite-key argsort on integer codes, then
    group boundaries via change-flags and per-group reductions via
    ``np.bincount`` — no pandas groupby over (many) string keys in the hot
    path.  The salt bucket is *recomputed* from the index here (cheaper
    than shipping it through the exchange), and the group column arrives
    dictionary-encoded so no per-row string is ever hashed reduce-side."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_partials()
        s = df["__grp"]
        if isinstance(s.dtype, pd.CategoricalDtype):
            # dictionary-encoded through the exchange: codes are free
            codes = s.cat.codes.to_numpy().astype(np.int64, copy=False)
            uniques = np.asarray(s.cat.categories, dtype=object)
        else:
            codes, uniques = pd.factorize(s.to_numpy(), sort=False)
            codes = codes.astype(np.int64, copy=False)
            uniques = np.asarray(uniques, dtype=object)
        idx = df["__idx"].to_numpy()
        bkt = np.floor_divide(idx, salt_every)
        # single argsort on a (code, index) composite — the salt bucket is
        # monotone in the index, so (code, idx) order ⇒ (code, bkt, idx)
        # order.  NaN groups (code -1) sort last instead of first; group
        # reductions are position-independent, so that is immaterial.
        mn_i = int(idx.min()) if len(idx) else 0
        span = int(idx.max()) - mn_i if len(idx) else 0
        if len(uniques) < 2**31 and span < 2**32:
            key = (codes.astype(np.uint64) << np.uint64(32)) \
                | (idx - mn_i).astype(np.uint64)
            order = np.argsort(key)
        else:
            order = np.lexsort((idx, bkt, codes))
        c, b, i = codes[order], bkt[order], idx[order]
        n_rows = len(c)

        new_grp = np.ones(n_rows, dtype=bool)
        new_grp[1:] = (c[1:] != c[:-1]) | (b[1:] != b[:-1])
        gid = np.cumsum(new_grp) - 1
        n_groups = int(gid[-1]) + 1
        starts = np.nonzero(new_grp)[0]
        ends = np.concatenate([starts[1:] - 1, [n_rows - 1]])

        n = np.diff(np.concatenate([starts, [n_rows]])).astype(np.int64)
        new_val = new_grp.copy()
        new_val[1:] |= i[1:] != i[:-1]
        nd = np.bincount(gid, weights=new_val, minlength=n_groups) \
            .astype(np.int64)
        mn, mx = i[starts], i[ends]

        out = pd.DataFrame({
            "kind": "p", "grp": uniques[c[starts]], "bkt": b[starts],
            "n": n, "nd": nd, "mn": mn, "mx": mx,
            "first_ts": np.int64(0), "last_ts": np.int64(0),
            "idx": np.int64(0), "cnt": np.int64(0),
            "payload": b"", "weight": 0.0,
        })
        frames = [out]

        # duplicate detail: rows where the (group, index) repeats — rare,
        # so the detail aggregation runs on the small subset only
        dup_mask = ~new_val
        if dup_mask.any():
            dup_rows = np.nonzero(dup_mask)[0]
            dd = pd.DataFrame({"c": c[dup_rows], "i": i[dup_rows]})
            counts = dd.groupby(["c", "i"], sort=False).size().reset_index()
            counts = counts.head(_MAX_DUPS_PER_BUCKET)
            frames.append(pd.DataFrame({
                "kind": "d", "grp": uniques[counts["c"].to_numpy()],
                "bkt": np.int64(0), "n": np.int64(0), "nd": np.int64(0),
                "mn": np.int64(0), "mx": np.int64(0),
                "first_ts": np.int64(0), "last_ts": np.int64(0),
                "idx": counts["i"].astype(np.int64),
                "cnt": (counts[0] + 1).astype(np.int64),  # +1: first is kept
                "payload": b"", "weight": 0.0,
            }))

        if ts_enabled:
            ts = df["__ts"].to_numpy()[order] \
                .astype("datetime64[us]").astype(np.int64)
            gaps = np.diff(ts) / 1e6
            gaps = gaps[~new_grp[1:]]
            td = TDigest()
            td.update(gaps)
            out["first_ts"] = ts[starts]
            out["last_ts"] = ts[ends]
            frames.append(pd.DataFrame([{
                "kind": "g", "grp": "", "bkt": 0, "n": 0, "nd": 0,
                "mn": 0, "mx": 0, "first_ts": 0, "last_ts": 0, "idx": 0,
                "cnt": 0, "payload": td.to_bytes(),
                "weight": float(len(gaps)),
            }]))
        return pd.concat(frames, ignore_index=True)

    return fn


def _empty_partials() -> pd.DataFrame:
    return pd.DataFrame({
        "kind": pd.Series(dtype=object), "grp": pd.Series(dtype=object),
        "bkt": pd.Series(dtype=np.int64), "n": pd.Series(dtype=np.int64),
        "nd": pd.Series(dtype=np.int64), "mn": pd.Series(dtype=np.int64),
        "mx": pd.Series(dtype=np.int64),
        "first_ts": pd.Series(dtype=np.int64),
        "last_ts": pd.Series(dtype=np.int64),
        "idx": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64),
        "payload": pd.Series(dtype=object),
        "weight": pd.Series(dtype=np.float64),
    })


def _stage_a_reduce(fn, empty: pa.Table, *parts):
    """Ray task (num_returns=2): concat bucket parts → (ship, kept)."""
    parts = [p for p in parts if p is not None and p.num_rows]
    t = pa.concat_tables(parts) if parts else empty
    ship_df, kept_df = fn(t.to_pandas())
    return (pd_to_arrow(ship_df),
            pd_to_arrow(kept_df))


def _extract_groups(grps: list, kept: pa.Table):
    """Ray task: re-extract the kept partials of groups that turned out to
    span salt buckets (broadcast membership filter; `grps` is tiny)."""
    if kept is None or not kept.num_rows:
        return None
    mask = pc.is_in(kept["grp"],
                    value_set=pa.array(grps, type=pa.string()))
    return kept.filter(mask)


def _stage_a(ts_enabled: bool, salt_every: int, start: int,
             require_contiguity: bool,
             gap_expectation: tuple | None,
             size_metric_enabled: bool):
    """Exchange reduce with LOCAL finalization: the full per-(group,
    salt_bucket) partials are computed, then every single-bucket group
    whose verdict is decidable here (the overwhelming majority — a group
    spans salt buckets only past ``salt_every`` turns) is finalized
    in-place: its gap-outlier check runs locally and its size joins a
    local t-digest partial.  Only the rows the merge genuinely needs ship
    onward: imperfect / multi-bucket partials, dup details and digest
    partials — thousands of rows instead of one per group, so the second
    exchange degenerates to a driver-side fold.

    Returns ``fn(df) -> (ship_df, kept_df)``; ``kept_df`` (the finalized
    single-bucket partials) stays in the object store and is re-read only
    for groups that turn out to span buckets elsewhere."""
    partials_fn = _bucket_partials(ts_enabled, salt_every)

    def fn(df: pd.DataFrame):
        out = partials_fn(df)
        if out.empty:
            return out, _empty_partials()
        p_mask = out["kind"].to_numpy() == "p"
        perfect = p_mask & (out["bkt"].to_numpy() == 0)
        if require_contiguity:
            perfect &= (out["mn"].to_numpy() == start) \
                & (out["nd"].to_numpy()
                   == out["mx"].to_numpy() - start + 1)
        kept = out[perfect]
        ship = out[~perfect]
        frames = [ship]
        if len(kept):
            n = kept["n"].to_numpy()
            if ts_enabled and gap_expectation is not None:
                expected, tol = gap_expectation
                multi = n > 1
                mean_gap = (kept["last_ts"].to_numpy()[multi]
                            - kept["first_ts"].to_numpy()[multi]) / 1e6 \
                    / (n[multi] - 1)
                denom = abs(expected) if expected else 1.0
                bad = np.abs(mean_gap - expected) / denom > tol
                if bad.any():
                    frames.append(pd.DataFrame({
                        "kind": "o",
                        "grp": kept["grp"].to_numpy()[multi][bad],
                        "bkt": np.int64(0), "n": np.int64(0),
                        "nd": np.int64(0), "mn": np.int64(0),
                        "mx": np.int64(0), "first_ts": np.int64(0),
                        "last_ts": np.int64(0), "idx": np.int64(0),
                        "cnt": np.int64(0), "payload": b"",
                        "weight": mean_gap[bad],
                    }))
            if size_metric_enabled:
                td = TDigest()
                td.update(n.astype(np.float64))
                frames.append(pd.DataFrame([{
                    "kind": "s", "grp": "", "bkt": 0, "n": 0, "nd": 0,
                    "mn": 0, "mx": 0, "first_ts": 0, "last_ts": 0,
                    "idx": 0, "cnt": 0, "payload": td.to_bytes(),
                    "weight": float(n.sum()),
                }]))
        ship_df = pd.concat(frames, ignore_index=True) \
            if len(frames) > 1 else ship.reset_index(drop=True)
        return ship_df, kept.reset_index(drop=True)

    return fn


def _merge_stage(start: int, ts_enabled: bool, size_metric_enabled: bool,
                 gap_expectation: tuple | None = None):
    """Stage B: merge per-(group, salt_bucket) partials per group —
    vectorized verdicts, dup pass-through, digest fold.

    ``gap_expectation = (expected_median_gap_s, tolerance)`` additionally
    flags individual groups whose mean ts gap deviates from the declared
    expectation by more than ``tolerance`` (relative) — the per-conversation
    drift verdict (archetype V14), computed vectorized from the per-group
    duration and row count."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        p = df[df["kind"] == "p"]
        if len(p):
            agg = p.groupby("grp", sort=False).agg(
                n=("n", "sum"), nd=("nd", "sum"),
                mn=("mn", "min"), mx=("mx", "max")).reset_index()
            # contiguity on the distinct index set (duplicates are the
            # uniqueness rule's finding, not a sequence gap)
            bad = agg[~((agg["mn"] == start)
                        & (agg["nd"] == agg["mx"] - start + 1))]
            if len(bad):
                frames.append(pd.DataFrame({
                    "ftype": "seq", "grp": bad["grp"],
                    "value": ("n=" + bad["n"].astype(str)
                              + " distinct=" + bad["nd"].astype(str)
                              + " min=" + bad["mn"].astype(str)
                              + " max=" + bad["mx"].astype(str)),
                    "idx": 0, "payload": b"", "weight": 0.0,
                }))
            if ts_enabled and gap_expectation is not None:
                expected, tol = gap_expectation
                span = p.groupby("grp", sort=False).agg(
                    n=("n", "sum"), first=("first_ts", "min"),
                    last=("last_ts", "max")).reset_index()
                multi = span[span["n"] > 1]
                mean_gap = (multi["last"] - multi["first"]) / 1e6 \
                    / (multi["n"] - 1)
                denom = abs(expected) if expected else 1.0
                bad = multi[np.abs(mean_gap - expected) / denom > tol]
                if len(bad):
                    bg = mean_gap.loc[bad.index]
                    frames.append(pd.DataFrame({
                        "ftype": "gap_outlier", "grp": bad["grp"],
                        "value": ("mean_gap_s="
                                  + bg.round(3).astype(str)
                                  + f" expected~{expected:g}"),
                        "idx": 0, "payload": b"", "weight": 0.0,
                    }))
        if size_metric_enabled:
            # sizes of the merge's own groups + the stage-A digest partials
            # over locally-finalized groups (kind='s')
            td = TDigest()
            total_w = 0.0
            if len(p):
                agg_n = p.groupby("grp", sort=False)["n"].sum()
                td.update(agg_n.to_numpy(dtype=np.float64))
                total_w += float(agg_n.sum())
            s = df[df["kind"] == "s"]
            for raw, w in zip(s["payload"], s["weight"]):
                if raw:
                    td.merge(TDigest.from_bytes(raw))
                    total_w += float(w)
            if len(p) or len(s):
                frames.append(pd.DataFrame([{
                    "ftype": "size_digest", "grp": "", "value": "",
                    "idx": 0, "payload": td.to_bytes(),
                    "weight": total_w,
                }]))
        o = df[df["kind"] == "o"]
        if len(o) and len(p):
            # a group finalized as a gap outlier in stage A under the
            # single-bucket assumption can turn out to SPAN salt buckets —
            # its complete partials (shipped + re-extracted kept) are then
            # in `p` and the merge-side computation above already covers
            # it with the full-group mean; the stage-A row (bucket-0-only
            # mean) would be a duplicate with a wrong value
            o = o[~o["grp"].isin(set(p["grp"]))]
        if len(o):
            # gap outliers finalized in stage A (weight carries the mean
            # gap); formatted identically to the merge-side path above
            expected = gap_expectation[0] if gap_expectation else 0.0
            frames.append(pd.DataFrame({
                "ftype": "gap_outlier", "grp": o["grp"],
                "value": ("mean_gap_s="
                          + o["weight"].round(3).astype(str)
                          + f" expected~{expected:g}"),
                "idx": 0, "payload": b"", "weight": 0.0,
            }))
        d = df[df["kind"] == "d"]
        if len(d):
            frames.append(pd.DataFrame({
                "ftype": "dup", "grp": d["grp"],
                "value": "count=" + d["cnt"].astype(str),
                "idx": d["idx"].astype(np.int64),
                "payload": b"", "weight": 0.0,
            }))
        if ts_enabled:
            td = TDigest()
            total = 0.0
            g = df[df["kind"] == "g"]
            for raw, w in zip(g["payload"], g["weight"]):
                if raw:
                    td.merge(TDigest.from_bytes(raw))
                    total += float(w)
            if len(p) > 1:
                # cross-salt-bucket boundary gaps within each group
                ps = p.sort_values(["grp", "bkt"], kind="stable")
                same = ps["grp"].to_numpy()[1:] == ps["grp"].to_numpy()[:-1]
                bg = (ps["first_ts"].to_numpy()[1:]
                      - ps["last_ts"].to_numpy()[:-1]) / 1e6
                bg = bg[same]
                td.update(bg)
                total += float(len(bg))
            if total or len(g):
                frames.append(pd.DataFrame([{
                    "ftype": "gap_digest", "grp": "", "value": "",
                    "idx": 0, "payload": td.to_bytes(), "weight": total,
                }]))
        if not frames:
            return pd.DataFrame({
                "ftype": pd.Series(dtype=object),
                "grp": pd.Series(dtype=object),
                "value": pd.Series(dtype=object),
                "idx": pd.Series(dtype=np.int64),
                "payload": pd.Series(dtype=object),
                "weight": pd.Series(dtype=np.float64),
            })
        return pd.concat(frames, ignore_index=True)

    return fn


class _ToFindings:
    """Stage C: compact stage-B rows → shared FINDINGS schema (vectorized,
    explicit types so unions line up)."""

    def __init__(self, table: str, seq: SeqRule | None, uniq: UniqueRule | None,
                 gap_metric: str | None, size_metric: str | None):
        self.table = table
        self.seq = seq
        self.uniq = uniq
        self.gap_metric = gap_metric
        self.size_metric = size_metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows: list[pa.Table] = [FINDINGS_SCHEMA.empty_table()]

        def violations(sub: pd.DataFrame, column: str, cid: str, sev: str,
                       row_key: pd.Series, sort_key: pd.Series):
            n = len(sub)
            if not n:
                return
            nulls_i = pa.nulls(n, pa.int64())
            nulls_l = pa.nulls(n, pa.list_(pa.string()))
            rows.append(pa.Table.from_arrays([
                pa.array(np.repeat("violation", n)),
                pa.array(np.repeat(self.table, n)),
                pa.array(np.repeat(column, n)),
                pa.array(np.repeat(cid, n)),
                pa.array(np.repeat(sev, n)),
                pa.array(sub["value"].astype(str), type=pa.string()),
                pa.array(row_key.astype(str), type=pa.string()),
                pa.array(sort_key.astype(str), type=pa.string()),
                nulls_i, nulls_i, nulls_i, nulls_l, nulls_l,
                pa.nulls(n, pa.bool_()),
            ], schema=FINDINGS_SCHEMA))

        if self.seq is not None:
            s = df[df["ftype"] == "seq"]
            violations(s, self.seq.index_col, self.seq.constraint_id,
                       self.seq.severity, s["grp"], s["grp"])
        if self.gap_metric:
            o = df[df["ftype"] == "gap_outlier"]
            violations(o, "ts", f"{self.gap_metric}:group", "warning",
                       o["grp"], o["grp"])
        if self.uniq is not None:
            d = df[df["ftype"] == "dup"]
            if len(d):
                rk = d["grp"].astype(str) + "|" + d["idx"].astype(str)
                sk = (d["grp"].astype(str) + "|"
                      + d["idx"].astype(str).str.zfill(_PAD))
                violations(d, ",".join(self.uniq.columns),
                           self.uniq.constraint_id, self.uniq.severity,
                           rk, sk)
        sk_rows = []
        if self.gap_metric:
            for _, r in df[df["ftype"] == "gap_digest"].iterrows():
                if r["payload"]:
                    sk_rows.append(sketch_row(self.table, self.gap_metric,
                                              r["payload"], int(r["weight"])))
        if self.size_metric:
            for _, r in df[df["ftype"] == "size_digest"].iterrows():
                if r["payload"]:
                    sk_rows.append(sketch_row(self.table, self.size_metric,
                                              r["payload"], int(r["weight"])))
        if sk_rows:
            rows.append(pa.Table.from_pylist(sk_rows, schema=FINDINGS_SCHEMA))
        return pa.concat_tables(rows)


def group_check_findings(
    ds: "rd.Dataset",
    rules: TableRules,
    *,
    salt_every: int = 65536,
    num_buckets: int | None = None,
    driver_merge_max_rows: int = 200_000,
) -> "rd.Dataset | None":
    """Run sequence/uniqueness/drift group checks; returns a FINDINGS-schema
    dataset (or None when the registry declares none of these checks).

    ``ds`` should already be pruned to the needed columns when built from
    Parquet (the caller passes a narrow read)."""
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
        grp = pc.cast(t[group_col], pa.string())
        idx = pc.fill_null(pc.cast(t[index_col], pa.int64()), -1)
        bkt = pc.cast(
            pc.floor(pc.divide(pc.cast(idx, pa.float64()),
                               float(salt_every))), pa.int64())
        out = {"__grp": grp, "__idx": idx, "__bkt": bkt}
        if ts_col:
            out["__ts"] = t[ts_col]
        return pa.table(out)

    ship = ["__grp", "__idx"] + (["__ts"] if ts_col else [])
    prepped = narrow.map_batches(prep, batch_format="pyarrow",
                                 zero_copy_batch=True)
    gap_expectation = None
    if gap_rules and gap_rules[0].expected_quantiles \
            and gap_rules[0].group_tolerance is not None:
        # per-group outlier flagging against the declared median gap (V14)
        med = dict(gap_rules[0].expected_quantiles).get(0.5)
        if med is not None:
            gap_expectation = (float(med),
                               float(gap_rules[0].group_tolerance))
    start = seq.start if seq else 0
    stage_a = _stage_a(bool(ts_col), salt_every, start,
                       require_contiguity=seq is not None,
                       gap_expectation=gap_expectation,
                       size_metric_enabled=bool(size_rules))
    merge_fn = _merge_stage(start, bool(ts_col), bool(size_rules),
                            gap_expectation)
    conv = _ToFindings(
        rules.table, seq, uniq,
        gap_rules[0].constraint_id if gap_rules else None,
        size_rules[0].constraint_id if size_rules else None)

    # Exchange with local finalization (see _stage_a): __bkt is hashed for
    # co-location but NOT shipped (the reduce recomputes it from __idx);
    # the group id ships dictionary-encoded per bucket part (int32 codes +
    # compact dictionary) which the reduce reuses as ready-made factorize
    # codes.  Each reduce returns (ship, kept): kept = finalized
    # single-bucket partials that stay in the object store; ship = the few
    # rows the merge needs.  Groups that turn out to span salt buckets
    # (ship rows with bkt != 0) get their kept partials re-extracted by a
    # broadcast-membership filter — exact, and the merge input stays tiny.
    import ray

    from crn_meta_validate_ray.stages.common import (_split_block,
                                                     empty_exemplar,
                                                     resolve_num_buckets)
    nb = resolve_num_buckets(num_buckets)
    # NOTE (measured, round 3): launching split tasks from
    # iter_internal_ref_bundles to overlap the narrow read with the
    # hash-partition work is a 4× REGRESSION here — the output iterator's
    # consumption backpressure paces the read down to a trickle.  The
    # materialize-then-split shape keeps the read at full width; overlap
    # with the fused per-cell pass comes from the caller's thunk thread.
    block_refs = prepped.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(conv(pd_to_arrow(merge_fn(_empty_partials()))))
    split_task = ray.remote(num_returns=nb)(_split_block)
    reduce_task = ray.remote(num_returns=2)(_stage_a_reduce)
    # NOT block_refs[0]: an empty input file yields a zero-schema empty
    # block (map_batches skips empty blocks) that may land first
    empty_ref = ray.put(empty_exemplar(block_refs, ship))
    n_split = max(1, min(len(block_refs), nb))
    chunk = -(-len(block_refs) // n_split)
    chunks = [block_refs[i:i + chunk]
              for i in range(0, len(block_refs), chunk)]
    per_chunk = [split_task.remote(["__grp", "__bkt"], nb, *c,
                                   ship_columns=ship,
                                   encode_columns=["__grp"])
                 for c in chunks]
    if nb == 1:
        per_chunk = [[r] for r in per_chunk]
    pairs = [reduce_task.remote(stage_a, empty_ref,
                                *[p[b] for p in per_chunk])
             for b in range(nb)]
    ship_tbls = ray.get([p[0] for p in pairs])
    frames = [t.to_pandas() for t in ship_tbls if t.num_rows]
    shipped = pd.concat(frames, ignore_index=True) if frames \
        else _empty_partials()
    spanning = shipped.loc[(shipped["kind"] == "p")
                           & (shipped["bkt"] != 0), "grp"].unique()
    if len(spanning):
        extract = ray.remote(_extract_groups)
        extra = ray.get([extract.remote(list(spanning), p[1])
                         for p in pairs])
        shipped = pd.concat([shipped] + [t.to_pandas() for t in extra
                                         if t is not None and t.num_rows],
                            ignore_index=True)
    if len(shipped) <= driver_merge_max_rows:
        merged_tbl = pd_to_arrow(merge_fn(shipped))
        return rd.from_arrow(conv(merged_tbl))
    # degenerate corpus (≈ every group violating): distributed merge
    part = rd.from_arrow(pd_to_arrow(shipped))
    merged = grouped_map(part, ["grp"], merge_fn, num_buckets=None)
    return merged.map_batches(conv, batch_format="pyarrow")
