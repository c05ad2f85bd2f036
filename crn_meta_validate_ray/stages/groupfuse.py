"""Fused group checks: run-length partials emitted from the per-cell pass.

The exchange-based group checks (stages/groupcheck.py) pay a second pruned
``read_parquet`` of (conv_id, turn_idx, ts) plus a row-level shuffle — at
48M turns that second read + exchange IS the flagship critical path.  This
module removes both: the fused per-cell ``map_batches`` pass (which already
holds every batch) additionally emits **run-length partials** — one row per
maximal consecutive ``turn_idx`` run per conversation per batch — and a
tiny keyed exchange over those partials computes the exact same verdicts:

- **sequence contiguity** (reference analogue: the per-table structural
  checks of utils/validate_core.py; SeqRule V11): a group passes iff the
  union of its runs is exactly ``start..max`` — interval arithmetic over
  runs is lossless, so the verdict is EXACT for any row layout;
- **uniqueness** (UniqueRule V10): occurrences(idx) = coverage by runs +
  in-batch duplicate extras; duplicates are idx with occurrences ≥ 2 —
  also exact, including duplicates split across batches/files;
- **ts-gap drift** (DriftRule V14): within-batch gaps are digested map-side
  (one t-digest row per batch, riding the normal ``kind='sketch'`` fold);
  run-boundary gaps are added reduce-side from per-run first/last ts;
- **group-size drift**: group sizes are exact reduce-side sums.

Scale design: a run row is (grp, mn, mx, first_ts, last_ts) — at transcript
shape ~1 row per (conversation × batch), i.e. 10-20× fewer rows than the
row-level exchange, and the wide input is read ONCE for everything.  A
mega-conversation contributes turns/batch_size partials (not turns rows),
so skew needs no salting: the per-group merge input is already compressed.
Partials travel inside the findings stream as ``kind='gpart'`` rows whose
``value`` is a base64 Arrow-IPC payload, so the resumable pipeline persists
them per partition for free and its group phase reads only partials —
never the raw input again.

Semantics notes (documented differences from stages/groupcheck.py):
- rows with a NULL group key are excluded from group checks (matches the
  in-memory oracle's pandas ``groupby`` semantics; the old exchange path
  misattributed them).  The null itself is still flagged by the
  required-field cell check.
- per-group first/last timestamps are min(first)/max(last) over runs —
  identical to the bucket aggregation for monotone-in-idx timestamps (the
  transcript contract) and deterministic otherwise.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from crn_meta_validate_ray.registry import TableRules
from crn_meta_validate_ray.stages.sketch import sketch_row
from crn_meta_validate_ray.stages.validate import (FINDINGS_SCHEMA, _PAD,
                                                   empty_findings)
from crn_meta_validate_ray.state.sketches import TDigest

GPART_KIND = "gpart"

# inner (IPC-encoded) partial schema: k=0 run rows use (a=mn, b=mx) with
# first/last ts; k=1 dup-extra rows use (a=idx, b=excess occurrences)
_INNER_SCHEMA = pa.schema([
    ("k", pa.int8()),
    ("grp", pa.string()),
    ("a", pa.int64()),
    ("b", pa.int64()),
    ("fts", pa.int64()),
    ("lts", pa.int64()),
])


@dataclass(frozen=True)
class GroupFuseSpec:
    """Compiled parameters for the fused group checks (driver-built once,
    shipped in task closures — same pattern as the compiled field rules)."""

    table: str
    group_col: str
    index_col: str
    ts_col: str | None = None
    start: int = 0
    require_contiguity: bool = False
    seq_cid: str | None = None
    seq_severity: str = "error"
    uniq_cid: str | None = None
    uniq_severity: str = "error"
    uniq_columns: tuple = ()
    gap_metric: str | None = None
    gap_expectation: tuple | None = None   # (expected_median_s, rel_tol)
    size_metric: str | None = None
    # detail rows per reduce bucket — the SAME bound the exchange engine
    # applies per physical bucket (stages/groupcheck._MAX_DUPS_PER_BUCKET),
    # so fused-vs-exchange violation parity holds on dup-heavy data too
    dup_cap: int = 10_000
    # fused referential anti-join (set via with_ref): when the FK column IS
    # the group column, orphan keys fall out of the partial merge for free —
    # the target side ships its distinct keys through the same bucket hash
    # and the reduce marks groups with no target key (shuffle-path
    # semantics: one violation per distinct orphan KEY, stages/refcheck.py)
    ref_cid: str | None = None
    ref_severity: str = "error"
    ref_column: str | None = None

    def with_ref(self, rule) -> "GroupFuseSpec":
        """Fuse a RefRule's anti-join into the partial exchange; only valid
        when the FK column is the group column (callers check)."""
        from dataclasses import replace
        if rule.column != self.group_col:
            raise ValueError(
                f"fused ref needs fk column == group column "
                f"({rule.column!r} != {self.group_col!r})")
        return replace(self, ref_cid=rule.constraint_id,
                       ref_severity=rule.severity, ref_column=rule.column)

    def for_schema(self, available: set) -> "GroupFuseSpec | None":
        """Adapt the spec to the input's actual columns.

        - group or index column absent → None (no partials would ever be
          emitted; callers must route group-dependent work — notably a
          fused referential anti-join — elsewhere instead of silently
          losing it).  The missing column itself is flagged by the
          schema-level verdict.
        - ts column absent → strip the gap metric/expectation: partials
          would carry fts=lts=0 placeholders and the reduce would flag
          every multi-turn group as a mean_gap=0 outlier."""
        from dataclasses import replace
        if self.group_col not in available or self.index_col not in available:
            return None
        if self.ts_col and self.ts_col not in available:
            return replace(self, ts_col=None, gap_metric=None,
                           gap_expectation=None)
        return self

    @classmethod
    def from_rules(cls, rules: TableRules) -> "GroupFuseSpec | None":
        """Mirror stages/groupcheck.group_check_findings' rule selection:
        first sequence / unique rule + ts_gap / group_size drift rules."""
        seq = rules.sequences[0] if rules.sequences else None
        uniq = rules.unique[0] if rules.unique else None
        gap_rules = [d for d in rules.drift if d.metric == "ts_gap"]
        size_rules = [d for d in rules.drift if d.metric == "group_size"]
        if seq is None and uniq is None and not gap_rules and not size_rules:
            return None
        group_col = seq.group_col if seq else (
            uniq.columns[0] if uniq
            else (gap_rules + size_rules)[0].group_col)
        index_col = seq.index_col if seq else (
            uniq.columns[1] if uniq and len(uniq.columns) > 1 else None)
        if index_col is None:
            raise ValueError("group checks need an index column")
        gap_expectation = None
        if gap_rules and gap_rules[0].expected_quantiles \
                and gap_rules[0].group_tolerance is not None:
            med = dict(gap_rules[0].expected_quantiles).get(0.5)
            if med is not None:
                gap_expectation = (float(med),
                                   float(gap_rules[0].group_tolerance))
        return cls(
            table=rules.table, group_col=group_col, index_col=index_col,
            ts_col=gap_rules[0].column if gap_rules else None,
            start=seq.start if seq else 0,
            require_contiguity=seq is not None,
            seq_cid=seq.constraint_id if seq else None,
            seq_severity=seq.severity if seq else "error",
            uniq_cid=uniq.constraint_id if uniq else None,
            uniq_severity=uniq.severity if uniq else "error",
            uniq_columns=tuple(uniq.columns) if uniq else (),
            gap_metric=gap_rules[0].constraint_id if gap_rules else None,
            gap_expectation=gap_expectation,
            size_metric=size_rules[0].constraint_id if size_rules else None,
        )


def _encode_inner(tbl: pa.Table) -> str:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return base64.b64encode(sink.getvalue()).decode("ascii")


def _decode_inner(val: str) -> pa.Table:
    tbl = pa.ipc.open_stream(base64.b64decode(val)).read_all()
    # grp may arrive dictionary-encoded; normalize so concat unifies
    if pa.types.is_dictionary(tbl.schema.field("grp").type):
        i = tbl.column_names.index("grp")
        tbl = tbl.set_column(i, "grp", pc.cast(tbl["grp"], pa.string()))
    return tbl


def emit_group_partials(spec: GroupFuseSpec, batch: pa.Table) -> pa.Table:
    """Map side (runs inside the fused per-cell pass): one vectorized
    argsort per batch → run rows + in-batch dup extras (IPC-packed into a
    single ``kind='gpart'`` finding) + the within-batch gap digest as a
    normal sketch row."""
    if (spec.group_col not in batch.column_names
            or spec.index_col not in batch.column_names
            or batch.num_rows == 0):
        return empty_findings()
    grp = batch[spec.group_col]
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    if not pa.types.is_dictionary(grp.type):
        grp = pc.dictionary_encode(pc.cast(grp, pa.string()))
    codes = np.asarray(pc.fill_null(grp.indices, -1)
                       if grp.indices.null_count else grp.indices
                       ).astype(np.int64, copy=False)
    uniques = np.asarray(pc.cast(grp.dictionary, pa.string()), dtype=object)
    idx = np.asarray(pc.fill_null(pc.cast(batch[spec.index_col], pa.int64()),
                                  -1))
    ts_enabled = bool(spec.ts_col and spec.ts_col in batch.column_names)
    ts = None
    if ts_enabled:
        ts = np.asarray(batch[spec.ts_col].combine_chunks()
                        if isinstance(batch[spec.ts_col], pa.ChunkedArray)
                        else batch[spec.ts_col]) \
            .astype("datetime64[us]").astype(np.int64)
    valid = codes >= 0
    if not valid.all():
        # null group keys: excluded (oracle groupby semantics; see module
        # docstring) — the required-field cell check flags the null itself
        codes, idx = codes[valid], idx[valid]
        if ts is not None:
            ts = ts[valid]
        if not len(codes):
            return empty_findings()

    mn_i = int(idx.min())
    span = int(idx.max()) - mn_i
    if len(uniques) < 2**31 and span < 2**32:
        key = (codes.astype(np.uint64) << np.uint64(32)) \
            | (idx - mn_i).astype(np.uint64)
        order = np.argsort(key)
    else:
        order = np.lexsort((idx, codes))
    c, i = codes[order], idx[order]
    m = len(c)
    new_grp = np.ones(m, dtype=bool)
    new_grp[1:] = c[1:] != c[:-1]
    new_val = new_grp.copy()
    new_val[1:] |= i[1:] != i[:-1]

    extra_rows: list[dict] = []
    if ts_enabled:
        ts = ts[order]
        gaps = np.diff(ts) / 1e6
        gaps = gaps[~new_grp[1:]]
        if spec.gap_metric is not None:
            td = TDigest()
            td.update(gaps)
            extra_rows.append(sketch_row(spec.table, spec.gap_metric,
                                         td.to_bytes(), int(len(gaps))))

    p = np.nonzero(new_val)[0]
    dc, di = c[p], i[p]
    run_start = np.ones(len(p), dtype=bool)
    run_start[1:] = (dc[1:] != dc[:-1]) | (di[1:] != di[:-1] + 1)
    rs = np.nonzero(run_start)[0]
    re_ = np.concatenate([rs[1:] - 1, [len(p) - 1]])
    mn_r, mx_r = di[rs], di[re_]
    grp_r = uniques[dc[rs]]
    if ts_enabled:
        # per-run MIN/MAX ts (reduceat over the run's row segment, which
        # includes trailing duplicate occurrences): the group span is then
        # min/max over runs — exact and batch-size-independent, unlike
        # fragment-boundary ts (identical for ts monotone in idx, the
        # transcript contract)
        start_row = p[rs]
        fts_r = np.minimum.reduceat(ts, start_row)
        lts_r = np.maximum.reduceat(ts, start_row)
    else:
        fts_r = lts_r = np.zeros(len(rs), dtype=np.int64)

    k_arr = [np.zeros(len(rs), dtype=np.int8)]
    grp_arr = [grp_r]
    a_arr, b_arr = [mn_r], [mx_r]
    f_arr, l_arr = [fts_r], [lts_r]
    dup_mask = ~new_val
    if dup_mask.any():
        dd = pd.DataFrame({"c": c[dup_mask], "i": i[dup_mask]})
        cnt = dd.groupby(["c", "i"], sort=False).size()
        mi = cnt.index
        k_arr.append(np.ones(len(cnt), dtype=np.int8))
        grp_arr.append(uniques[mi.get_level_values(0).to_numpy()])
        a_arr.append(mi.get_level_values(1).to_numpy().astype(np.int64))
        b_arr.append(cnt.to_numpy().astype(np.int64))  # excess occurrences
        z = np.zeros(len(cnt), dtype=np.int64)
        f_arr.append(z)
        l_arr.append(z)

    inner = pa.Table.from_arrays([
        pa.array(np.concatenate(k_arr), type=pa.int8()),
        pc.dictionary_encode(pa.array(np.concatenate(grp_arr),
                                      type=pa.string())),
        pa.array(np.concatenate(a_arr), type=pa.int64()),
        pa.array(np.concatenate(b_arr), type=pa.int64()),
        pa.array(np.concatenate(f_arr), type=pa.int64()),
        pa.array(np.concatenate(l_arr), type=pa.int64()),
    ], names=["k", "grp", "a", "b", "fts", "lts"])
    gpart = {
        "kind": GPART_KIND, "table": spec.table, "column": "",
        "constraint_id": "", "severity": "info",
        "value": _encode_inner(inner),
        "row_key": None, "sort_key": None,
        "n_rows": m, "n_null": 0, "n_invalid": 0,
        "invalid_values": [], "invalid_value_keys": [], "exact": True,
    }
    return pa.Table.from_pylist([gpart] + extra_rows, schema=FINDINGS_SCHEMA)


def _gpart_split(keys: list[str], num_buckets: int, *findings_blocks,
                 **_ignored) -> list:
    """Map side of the partial exchange (Ray task, num_returns=buckets):
    extract + decode the gpart rows of a chunk of findings blocks and
    hash-partition the inner rows by group id."""
    from crn_meta_validate_ray.stages.common import _split_block

    inners = []
    for t in findings_blocks:
        if t is None or not t.num_rows or "value" not in t.column_names:
            continue
        if "kind" in t.column_names:
            g = t.filter(pc.equal(t["kind"], GPART_KIND))
        else:
            # hive read of a findings/kind=gpart directory: the constant
            # kind column lives in the path — every row IS a partial
            g = t
        for v in g["value"].to_pylist():
            if v:
                inners.append(_decode_inner(v))
    if not inners:
        return [None] * num_buckets
    tbl = pa.concat_tables(inners)
    return _split_block(keys, num_buckets, tbl, encode_columns=["grp"])


def _ref_target_split(path: str, row_groups, column: str,
                      num_buckets: int) -> list:
    """Ray task (num_returns=buckets): distinct target keys of ONE shard,
    hash-partitioned with the SAME bucket hash as the gpart exchange so an
    FK group and its target key meet in one reduce task."""
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.stages.common import _split_block

    if row_groups is None:
        t = pq.read_table(path, columns=[column])
    else:
        t = pq.ParquetFile(path).read_row_groups(row_groups,
                                                 columns=[column])
    col = pc.cast(t[column], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    keys = pc.unique(col).drop_null()
    return _split_block(["grp"], num_buckets, pa.table({"grp": keys}))


def plan_fused_ref(spec: "GroupFuseSpec | None", ref, target_path: str,
                   num_buckets: int | None = None):
    """Single source of the fused-referential placement decision, shared
    by the one-shot and resumable pipelines (they must stay in lockstep —
    a resumed run re-derives the same placement).  Returns
    ``(spec_with_ref, num_buckets, ref_splits)`` with the target-key build
    LAUNCHED (it overlaps the caller's other work), or ``None`` when the
    anti-join cannot ride the gpart exchange — no live group spec (e.g.
    the group/index column is absent from the input, so no partials would
    ever carry the FK keys) or the FK column is not the group column —
    and the caller must run the standalone shuffle anti-join instead."""
    if spec is None or ref is None or ref.column != spec.group_col:
        return None
    from crn_meta_validate_ray.stages.common import resolve_num_buckets

    nb = resolve_num_buckets(num_buckets)
    return (spec.with_ref(ref), nb,
            build_ref_target_splits(target_path, ref.target_column, nb))


def presplit_gparts(findings_ds: "rd.Dataset", num_buckets: int) -> list:
    """Launch the map side of the gpart exchange for ONE partition's
    materialized findings and return its per-chunk bucket-part refs (the
    same shape ``split_exchange`` yields).  Lets the resumable pipeline
    split each partition's partials as soon as that partition commits:
    the split work overlaps the remaining partitions, and only the
    compressed gpart bucket parts stay alive in the object store — not
    the partition's full findings blocks."""
    import ray

    from crn_meta_validate_ray.stages.common import split_exchange

    refs = findings_ds.to_arrow_refs()
    if not refs:
        return []
    split_task = ray.remote(num_returns=num_buckets)(_gpart_split)
    return split_exchange(split_task, refs, ["grp"], num_buckets)


def build_ref_target_splits(target_path: str, target_column: str,
                            num_buckets: int) -> list:
    """Launch the target-side distinct-key build + bucket split eagerly
    (one Ray task per target shard) so it overlaps the fused per-cell
    pass; returns per-shard lists of bucket part refs for
    :func:`fused_group_reduce`."""
    import ray

    from crn_meta_validate_ray.pipelines.transcripts import _ref_key_shards

    task = ray.remote(num_returns=num_buckets)(_ref_target_split)
    per_shard = [task.remote(f, rgs, target_column, num_buckets)
                 for f, rgs in _ref_key_shards(target_path)]
    if num_buckets == 1:
        per_shard = [[r] for r in per_shard]
    return per_shard


def _gpart_reduce(spec: GroupFuseSpec, n_gpart: int, *parts) -> pa.Table:
    """Reduce side: all partials of a group land in one bucket → exact
    interval-union merge (vectorized pandas/numpy) → FINDINGS rows.
    ``parts[:n_gpart]`` are gpart splits; the rest are target-key splits
    for the fused referential anti-join."""
    from crn_meta_validate_ray.stages.common import flatten_parts

    ref_tbls = [p for p in flatten_parts(parts[n_gpart:])
                if p is not None and p.num_rows]
    tbls = [p for p in flatten_parts(parts[:n_gpart])
            if p is not None and p.num_rows]
    if not tbls:
        return empty_findings()
    t = pa.concat_tables([tb.select(_INNER_SCHEMA.names) for tb in tbls],
                         promote_options="permissive")
    grp_col = t["grp"]
    if isinstance(grp_col, pa.ChunkedArray):
        grp_col = grp_col.combine_chunks()
    if pa.types.is_dictionary(grp_col.type):
        grp_col = pc.cast(grp_col, pa.string())
    labels_all = np.asarray(grp_col, dtype=object)
    codes_all, uniques = pd.factorize(labels_all, sort=False)
    k = np.asarray(t["k"])
    a = np.asarray(t["a"])
    b = np.asarray(t["b"])
    fts = np.asarray(t["fts"])
    lts = np.asarray(t["lts"])

    rmask = k == 0
    rdf = pd.DataFrame({
        "code": codes_all[rmask], "mn": a[rmask], "mx": b[rmask],
        "fts": fts[rmask], "lts": lts[rmask],
    }).sort_values(["code", "mn", "mx"], kind="stable", ignore_index=True)
    dmask = ~rmask
    extras = pd.Series(b[dmask]) \
        .groupby([codes_all[dmask], a[dmask]]).sum() if dmask.any() else None

    gb = rdf.groupby("code", sort=True)
    cummax = gb["mx"].cummax()
    prev_cov = cummax.groupby(rdf["code"]).shift(1)
    cov_from = np.maximum(rdf["mn"].to_numpy(),
                          prev_cov.fillna(rdf["mn"] - 1).to_numpy() + 1)
    contrib = np.clip(rdf["mx"].to_numpy() - cov_from + 1,
                      0, None).astype(np.int64)
    run_len = rdf["mx"].to_numpy() - rdf["mn"].to_numpy() + 1

    agg = gb.agg(mn=("mn", "min"), mx=("mx", "max"),
                 fts=("fts", "min"), lts=("lts", "max"))
    agg["union"] = pd.Series(contrib).groupby(rdf["code"]).sum()
    agg["n_runs"] = pd.Series(run_len).groupby(rdf["code"]).sum()
    excess = pd.Series(0, index=agg.index, dtype=np.int64)
    if extras is not None:
        per_group = extras.groupby(level=0).sum()
        excess = excess.add(per_group, fill_value=0).astype(np.int64)
    agg["n"] = agg["n_runs"] + excess
    agg["grp"] = uniques[agg.index.to_numpy()]

    frames: list[pa.Table] = [empty_findings()]

    def violations(n_rows: int, column: str, cid: str, sev: str,
                   value: pd.Series, row_key: pd.Series,
                   sort_key: pd.Series):
        if not n_rows:
            return
        nulls_i = pa.nulls(n_rows, pa.int64())
        nulls_l = pa.nulls(n_rows, pa.list_(pa.string()))
        frames.append(pa.Table.from_arrays([
            pa.array(np.repeat("violation", n_rows)),
            pa.array(np.repeat(spec.table, n_rows)),
            pa.array(np.repeat(column, n_rows)),
            pa.array(np.repeat(cid, n_rows)),
            pa.array(np.repeat(sev, n_rows)),
            pa.array(value.astype(str), type=pa.string()),
            pa.array(row_key.astype(str), type=pa.string()),
            pa.array(sort_key.astype(str), type=pa.string()),
            nulls_i, nulls_i, nulls_i, nulls_l, nulls_l,
            pa.nulls(n_rows, pa.bool_()),
        ], schema=FINDINGS_SCHEMA))

    if spec.ref_cid is not None:
        # fused referential anti-join: the target side shipped its distinct
        # keys through the same bucket hash, so orphans = this bucket's
        # groups minus its target keys (one violation per distinct key —
        # shuffle-path semantics, stages/refcheck.py:193)
        if ref_tbls:
            tkeys = np.unique(np.concatenate([
                np.asarray(pc.cast(
                    rt["grp"].combine_chunks()
                    if isinstance(rt["grp"], pa.ChunkedArray) else rt["grp"],
                    pa.string()), dtype=object)
                for rt in ref_tbls]))
        else:
            tkeys = np.array([], dtype=object)
        grp_vals = agg["grp"].to_numpy()
        # hash-based membership: np.isin on object arrays falls back to a
        # quadratic element loop (measured 36 s on 53k×53k keys)
        orphan = ~pd.Index(grp_vals).isin(tkeys)
        if orphan.any():
            keys = pd.Series(np.sort(grp_vals[orphan].astype(str)))
            violations(len(keys), spec.ref_column, spec.ref_cid,
                       spec.ref_severity, keys, keys, keys)

    if spec.require_contiguity and spec.seq_cid:
        bad = agg[~((agg["mn"] == spec.start)
                    & (agg["union"] == agg["mx"] - spec.start + 1))]
        if len(bad):
            value = ("n=" + bad["n"].astype(str)
                     + " distinct=" + bad["union"].astype(str)
                     + " min=" + bad["mn"].astype(str)
                     + " max=" + bad["mx"].astype(str))
            violations(len(bad), spec.index_col, spec.seq_cid,
                       spec.seq_severity, value, bad["grp"], bad["grp"])

    if spec.ts_col and spec.gap_expectation is not None and spec.gap_metric:
        expected, tol = spec.gap_expectation
        multi = agg[agg["n"] > 1]
        mean_gap = (multi["lts"] - multi["fts"]) / 1e6 / (multi["n"] - 1)
        denom = abs(expected) if expected else 1.0
        bad = multi[np.abs(mean_gap - expected) / denom > tol]
        if len(bad):
            bg = mean_gap.loc[bad.index]
            value = ("mean_gap_s=" + bg.round(3).astype(str)
                     + f" expected~{expected:g}")
            violations(len(bad), "ts", f"{spec.gap_metric}:group",
                       "warning", value, bad["grp"], bad["grp"])

    if spec.uniq_cid:
        overlap = agg.index[(agg["n_runs"] != agg["union"])]
        affected = set(overlap.to_numpy().tolist())
        if extras is not None:
            affected |= set(extras.index.get_level_values(0))
        if affected:
            # endpoint sweep, NOT per-index expansion: a wholesale-
            # duplicated mega-conversation must not blow this reduce task
            # by materializing its full index span.  Events are run
            # endpoints (+1 at mn, -1 past mx) and in-batch dup extras
            # (+v at idx, -v past idx); each group's event deltas sum to
            # zero, so ONE global cumsum over (group-rank, position)-
            # sorted events yields exact per-segment occurrence counts.
            # Groups are ranked by str(label) so segments arrive already
            # in the final (str(grp), idx) report order and only the
            # first dup_cap detail rows are ever expanded — O(runs log
            # runs) regardless of index span.  (Which rows survive a
            # saturated dup_cap is a per-task convention, not a parity
            # contract: the exchange path caps per batch in arrival
            # order — groupcheck.py:119.)
            aff = np.fromiter(affected, dtype=np.int64)
            aff = aff[np.argsort(uniques[aff].astype(str), kind="stable")]
            rank = np.full(len(uniques), -1, dtype=np.int64)
            rank[aff] = np.arange(len(aff))
            rk_all = rank[rdf["code"].to_numpy()]
            sel_mask = rk_all >= 0
            rk_sel = rk_all[sel_mask]
            mn_sel = rdf["mn"].to_numpy()[sel_mask]
            mx_sel = rdf["mx"].to_numpy()[sel_mask]
            one = np.ones(len(rk_sel), dtype=np.int64)
            ev_r = [rk_sel, rk_sel]
            ev_p = [mn_sel, mx_sel + 1]
            ev_d = [one, -one]
            if extras is not None:
                ec = rank[extras.index.get_level_values(0).to_numpy()]
                ei = extras.index.get_level_values(1).to_numpy()
                ev = extras.to_numpy().astype(np.int64)
                ev_r += [ec, ec]
                ev_p += [ei, ei + 1]
                ev_d += [ev, -ev]
            er = np.concatenate(ev_r)
            ep = np.concatenate(ev_p)
            ed = np.concatenate(ev_d)
            if len(er):
                order = np.lexsort((ep, er))
                er, ep, ed = er[order], ep[order], ed[order]
                cov = np.cumsum(ed)
                nxt = np.empty_like(ep)
                nxt[:-1] = ep[1:]
                nxt[-1] = ep[-1]
                same = np.empty(len(er), dtype=bool)
                same[:-1] = er[1:] == er[:-1]
                same[-1] = False
                # segment [ep_j, next event) inside the same group holds
                # constant coverage cov_j; a group's last event always has
                # cov 0 (deltas balance) so cross-group gaps never leak
                seg_len = np.where(same, nxt - ep, 0)
                segmask = (cov >= 2) & (seg_len > 0)
                sp = ep[segmask]
                sl = seg_len[segmask]
                sc = cov[segmask]
                sr = er[segmask]
                start_cum = np.concatenate([[0], np.cumsum(sl)[:-1]])
                keep = start_cum < spec.dup_cap
                sp, sc, sr = sp[keep], sc[keep], sr[keep]
                sl = np.minimum(sl[keep], spec.dup_cap - start_cum[keep])
                total = int(sl.sum())
                if total:
                    cum0 = np.concatenate([[0], np.cumsum(sl)[:-1]])
                    idx_f = (np.arange(total) - np.repeat(cum0, sl)
                             + np.repeat(sp, sl))
                    det = pd.DataFrame({
                        "grp": uniques[aff[np.repeat(sr, sl)]],
                        "idx": idx_f,
                        "cnt": np.repeat(sc, sl),
                    })
                    rk = (det["grp"].astype(str) + "|"
                          + det["idx"].astype(str))
                    sk = (det["grp"].astype(str) + "|"
                          + det["idx"].astype(str).str.zfill(_PAD))
                    violations(len(det), ",".join(spec.uniq_columns),
                               spec.uniq_cid, spec.uniq_severity,
                               "count=" + det["cnt"].astype(str), rk, sk)

    sk_rows: list[dict] = []
    if spec.ts_col and spec.gap_metric and len(rdf) > 1:
        # run-boundary gaps within each group (runs sorted by mn)
        same = rdf["code"].to_numpy()[1:] == rdf["code"].to_numpy()[:-1]
        bg = (rdf["fts"].to_numpy()[1:] - rdf["lts"].to_numpy()[:-1]) / 1e6
        bg = bg[same]
        if len(bg):
            td = TDigest()
            td.update(bg)
            sk_rows.append(sketch_row(spec.table, spec.gap_metric,
                                      td.to_bytes(), int(len(bg))))
    if spec.size_metric and len(agg):
        td = TDigest()
        td.update(agg["n"].to_numpy(dtype=np.float64))
        sk_rows.append(sketch_row(spec.table, spec.size_metric,
                                  td.to_bytes(), int(agg["n"].sum())))
    if sk_rows:
        frames.append(pa.Table.from_pylist(sk_rows, schema=FINDINGS_SCHEMA))
    return pa.concat_tables(frames)


def fused_group_reduce(findings: "rd.Dataset | None", spec: GroupFuseSpec,
                       num_buckets: int | None = None,
                       ref_splits: list | None = None,
                       presplit: list | None = None
                       ) -> "rd.Dataset | None":
    """Run the partial exchange over a (materialized) findings dataset that
    carries ``kind='gpart'`` rows; returns a FINDINGS dataset with the
    group-check verdict rows.  The exchange moves only the compressed
    partials — thousands of rows per bucket, never the input.

    ``ref_splits`` (from :func:`build_ref_target_splits`, same bucket
    count) adds the fused referential anti-join: each reduce also receives
    its bucket's distinct target keys and emits orphan-key violations.

    ``presplit`` (per-chunk bucket-part refs from :func:`presplit_gparts`,
    same bucket count) contributes partials whose map side already ran —
    the resumable pipeline splits each partition as it commits."""
    import ray

    from crn_meta_validate_ray.stages.common import (resolve_num_buckets,
                                                     split_exchange)

    nb = resolve_num_buckets(num_buckets)
    per_chunk = list(presplit or [])
    if findings is not None:
        refs = findings.to_arrow_refs()
        if refs:
            split_task = ray.remote(num_returns=nb)(_gpart_split)
            per_chunk += split_exchange(split_task, refs, ["grp"], nb)
    if not per_chunk:
        return None
    reduce_task = ray.remote(_gpart_reduce)
    ref_chunks = ref_splits or []
    out_refs = [reduce_task.remote(spec, len(per_chunk),
                                   *[p[bkt] for p in per_chunk],
                                   *[rc[bkt] for rc in ref_chunks])
                for bkt in range(nb)]
    return rd.from_arrow_refs(out_refs)
