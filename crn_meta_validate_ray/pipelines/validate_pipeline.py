"""End-to-end table validation: read → map_batches(validate) → merge → report.

The distributed equivalent of the reference's headless chain
``normalize_null_like_dataframe → validate_table_eval →
compose_validation_report`` (utils/validate_core.py:488-531), restructured
for streaming execution:

1. one stateless ``map_batches`` pass emits per-batch findings
   (violation rows + per-column partial aggregates);
2. partials are combined per block, then merged on the driver into global
   per-column verdicts (all-null / partial-null / distinct failing values) —
   two-phase because "all-null" is a *global* property a single partition
   cannot decide (utils/validate_core.py:232-236);
3. schema-level verdicts (missing / extra columns) come from
   ``ds.schema()`` driver-side (reference: utils/validate_core.py:221-223,
   :31-47);
4. the report is composed with reference-parity counting and text.

Violations stay distributed: both modes materialize the FINDINGS stream
(violation rows + per-batch partials — a small fraction of the input,
which itself is never materialized) in the object store so the verdict
fold and, in ``write`` mode, the Parquet persistence consume the same
plasma blocks with zero disk read-back.  Tradeoff: a pathological corpus
(≈ every cell invalid) makes the findings stream input-sized; Ray's
object store spills it to disk rather than failing, at the cost of the
read-back this layout avoids in the normal regime.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

import pyarrow as pa

from crn_meta_validate_ray.stages.common import pd_to_arrow

import ray.data as rd

# read_parquet's path resolution imports fsspec.implementations.http on
# EVERY call (Ray only caches success).  Where aiohttp is absent the import
# always fails, so two concurrent read_parquet constructions (the
# extra-findings thunk threads) can observe a partially-initialized module —
# an ImportError('cannot import name HTTPFileSystem') that escapes Ray's
# ModuleNotFoundError guard.  Resolve it deterministically ONCE: register a
# stub module whose HTTPFileSystem matches nothing (isinstance is then
# False, the correct answer for local/S3 paths).
try:  # pragma: no cover - environment-dependent
    import fsspec.implementations.http  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    import types as _types

    class _NoHTTPFileSystem:  # placeholder type; never instantiated
        pass

    _stub = _types.ModuleType("fsspec.implementations.http")
    _stub.HTTPFileSystem = _NoHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _stub
    try:
        import fsspec.implementations as _fi
        _fi.http = _stub
    except Exception:
        pass

from crn_meta_validate_ray.registry import TableRules, NULL_SENTINEL
from crn_meta_validate_ray.report import (
    ReportCollector,
    TableEvalResult,
    compose_validation_report,
    quote,
)
from crn_meta_validate_ray.stages.validate import BatchValidator, FINDINGS_SCHEMA


@dataclass
class ColStat:
    """Merged per-column aggregate (global)."""

    column: str
    constraint_id: str
    severity: str
    n_rows: int = 0
    n_null: int = 0
    n_invalid: int = 0
    distinct_invalid: dict = dc_field(default_factory=dict)  # value -> min sort_key
    exact: bool = True

    def merge_row(self, row: dict, sample_k: int):
        self.n_rows += int(row["n_rows"] or 0)
        self.n_null += int(row["n_null"] or 0)
        self.n_invalid += int(row["n_invalid"] or 0)
        self.exact = self.exact and bool(row["exact"])
        vals = row["invalid_values"] or []
        keys = row["invalid_value_keys"] or []
        for v, k in zip(vals, keys):
            prev = self.distinct_invalid.get(v)
            if prev is None or k < prev:
                self.distinct_invalid[v] = k
        if len(self.distinct_invalid) > sample_k:
            keep = sorted(self.distinct_invalid.items(), key=lambda kv: kv[1])[:sample_k]
            self.distinct_invalid = dict(keep)
            self.exact = False

    def failing_values_ordered(self) -> list[str]:
        """Distinct failing values in deterministic first-occurrence order
        (ordered by min locator sort key — the stable-order substitute for
        the reference's in-memory first-occurrence order,
        utils/validate_core.py:244)."""
        return [v for v, _ in sorted(self.distinct_invalid.items(),
                                     key=lambda kv: kv[1])]


@dataclass
class ValidationRun:
    """Result object for one table validation."""

    table: str
    eval_result: TableEvalResult
    errors: int
    warnings: int
    report: ReportCollector
    colstats: dict            # column -> ColStat
    n_rows: int
    violations: "rd.Dataset | None" = None
    findings_path: str | None = None
    extras: dict = dc_field(default_factory=dict)  # distributed-check summaries

    @property
    def passed(self) -> bool:
        return self.errors == 0

    def verdict_row(self) -> dict:
        return {
            "table": self.table,
            "passed": self.passed,
            "errors": self.errors,
            "warnings": self.warnings,
            "n_rows": self.n_rows,
        }


def expected_description(rule) -> str:
    """Reference-parity expected-value descriptions
    (utils/validate_core.py:246-249, :262-265, :304-312, :332-335).

    Note: for single-value enums the reference renders ``list(set(...))``
    whose order is hash-randomized; we render sorted order for determinism.
    """
    fn = ", ".join(map(quote, rule.fillnull))
    dt = rule.datatype
    if dt == "Integer":
        return f"int or NULL ('{NULL_SENTINEL}') or FillNull values ({fn})"
    if dt == "Float":
        return f"float or NULL ('{NULL_SENTINEL}') or FillNull values ({fn})"
    if dt == "Enum":
        vocab = [str(v) for v in rule.enum_vocab()]
        if rule.allow_multi:
            return (
                "one or more values from the Validation list separated by ';' "
                "(e.g. 'val1;val2'), or a single FillNull value "
                f"({fn}). Valid tokens: {', '.join(map(quote, sorted(set(vocab))))}"
            )
        accept = sorted(set(vocab) | set(str(f) for f in rule.fillnull))
        return ", ".join(map(quote, accept))
    if dt == "Regex":
        return f"Regex /{rule.regex_pattern()}/ or FillNull values ({fn})"
    if dt == "Timestamp":
        return f"timestamp or NULL ('{NULL_SENTINEL}') or FillNull values ({fn})"
    if dt == "Custom":
        return (f"values accepted by custom check '{rule.validation}' or "
                f"NULL ('{NULL_SENTINEL}') or FillNull values ({fn})")
    return "any value"


def _combine_colstat_block(batch: pa.Table) -> pa.Table:
    """Block-local combine of colstat partials (one output row per column per
    block) — shrinks the partial stream before the driver merge."""
    import pandas as pd

    df = batch.to_pandas()
    if df.empty:
        return FINDINGS_SCHEMA.empty_table()
    out_rows = []
    for (col, cid, sev), g in df.groupby(["column", "constraint_id", "severity"],
                                         sort=False):
        merged: dict = {}
        exact = True
        for vals, keys, ex in zip(g["invalid_values"], g["invalid_value_keys"],
                                  g["exact"]):
            exact = exact and bool(ex)
            if vals is None or keys is None:
                continue
            for v, k in zip(vals, keys):
                prev = merged.get(v)
                if prev is None or k < prev:
                    merged[v] = k
        out_rows.append({
            "kind": "colstat", "table": g["table"].iloc[0], "column": col,
            "constraint_id": cid, "severity": sev, "value": None,
            "row_key": None, "sort_key": None,
            "n_rows": int(g["n_rows"].sum()), "n_null": int(g["n_null"].sum()),
            "n_invalid": int(g["n_invalid"].sum()),
            "invalid_values": list(merged.keys()),
            "invalid_value_keys": list(merged.values()),
            "exact": exact,
        })
    return pa.Table.from_pylist(out_rows, schema=FINDINGS_SCHEMA)


def merge_colstats_driver(colstat_ds: "rd.Dataset", rules: TableRules,
                          sample_k: int = 1000) -> dict:
    """Stream combined colstat partials to the driver and fold them into one
    global ColStat per column."""
    combined = colstat_ds.map_batches(_combine_colstat_block,
                                      batch_format="pyarrow")
    stats: dict[str, ColStat] = {}
    rule_by_field = {r.field: r for r in rules.active_fields()}
    for batch in combined.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.to_pylist():
            col = row["column"]
            cs = stats.get(col)
            if cs is None:
                rule = rule_by_field[col]
                cs = ColStat(column=col, constraint_id=row["constraint_id"],
                             severity=row["severity"])
                stats[col] = cs
            cs.merge_row(row, sample_k)
    return stats


def build_eval_result(rules: TableRules, schema_names: list[str],
                      colstats: dict, n_rows: int) -> TableEvalResult:
    """Fold schema-level checks + merged column stats into the reference's
    eval-result shape (utils/validate_core.py:343-355), preserving the
    reference's list ordering (registry rule order)."""
    res = TableEvalResult(total_required=rules.total_required,
                          total_optional=rules.total_optional,
                          n_rows=n_rows)
    schema_set = set(schema_names)
    all_registry_fields = {str(r.field) for r in rules.fields}
    res.extra_columns = sorted(schema_set - all_registry_fields)

    for rule in rules.active_fields():
        col = rule.field
        if col not in schema_set:
            (res.missing_required if rule.is_required
             else res.missing_optional).append(col)
            continue
        cs = colstats.get(col)
        if cs is None:
            # column present but dataset had zero rows — no null verdicts
            continue
        if cs.n_null == cs.n_rows and cs.n_rows > 0:
            (res.all_null_required if rule.is_required
             else res.all_null_optional).append(col)
        elif cs.n_null > 0:
            res.null_columns.append((rule.opt_req, col, cs.n_null))
        failing = cs.failing_values_ordered()
        if failing:
            found = ", ".join(map(quote, failing))
            # when the distinct-value sample was truncated (cs.exact False)
            # the count is a lower bound — say so instead of silently
            # diverging from the reference's exact distinct count
            n_distinct = len(failing) if cs.exact else f">= {len(failing)}"
            if not cs.exact:
                found += ", … (sample)"
            res.invalid_entries.append(
                (rule.opt_req, col, n_distinct, expected_description(rule), found))
            (res.invalid_required if rule.is_required
             else res.invalid_optional).append(col)

    # engine extension: global null-rate thresholds
    for nr in rules.null_rates:
        cs = colstats.get(nr.column)
        if cs is None or cs.n_rows == 0:
            continue
        rate = cs.n_null / cs.n_rows
        if rate > nr.max_rate:
            msg = (f"column '{nr.column}' null rate {rate:.4f} exceeds "
                   f"max {nr.max_rate:.4f} ({cs.n_null}/{cs.n_rows})")
            if nr.severity == "error":
                res.extension_errors.append((nr.constraint_id, msg))
            else:
                res.extension_warnings.append((nr.constraint_id, msg))
    return res


def merge_sketches_driver(sketch_ds: "rd.Dataset") -> dict:
    """Fold base64 sketch partial rows into merged sketch objects, keyed by
    metric id ('hll:...', 'cm:...', 'drift:...')."""
    import base64

    from crn_meta_validate_ray.state.sketches import CountMin, HyperLogLog, TDigest

    merged: dict = {}
    for batch in sketch_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.select(["column", "value"]).to_pylist():
            metric, payload = row["column"], base64.b64decode(row["value"])
            if metric.startswith("hll:"):
                obj = HyperLogLog.from_bytes(payload)
            elif metric.startswith("cm:"):
                obj = CountMin.from_bytes(payload)
            else:  # drift:* → t-digest
                obj = TDigest.from_bytes(payload)
            if metric in merged:
                merged[metric].merge(obj)
            else:
                merged[metric] = obj
    return merged


def _prefold_block(t: pa.Table) -> pa.Table:
    """DISTRIBUTED pre-fold of one findings block (runs inside
    ``map_batches``): colstat partials combine per column, violation rows
    reduce to per-constraint count rows (``kind='vcount'``), sketch
    partials merge per metric.  The driver fold then touches a few summary
    rows per block instead of every finding row — at 12M turns this moves
    ~2 s of serial driver time onto the cluster (a direct scaling-
    efficiency term: serial seconds cost 4× more at the 4N level)."""
    import base64

    import pyarrow.compute as _pc

    from crn_meta_validate_ray.state.sketches import (CountMin, HyperLogLog,
                                                      TDigest)

    kinds = t["kind"]
    parts = []
    cs = t.filter(_pc.equal(kinds, "colstat"))
    if cs.num_rows:
        parts.append(_combine_colstat_block(cs))
    v = t.filter(_pc.equal(kinds, "violation"))
    if v.num_rows:
        vc = _pc.value_counts(v["constraint_id"].combine_chunks())
        rows = [{"kind": "vcount", "constraint_id": r["values"],
                 "n_invalid": int(r["counts"]), "n_rows": 0, "n_null": 0,
                 "exact": True}
                for r in vc.to_pylist()]
        parts.append(pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA))
    sk = t.filter(_pc.equal(kinds, "sketch"))
    if sk.num_rows:
        merged: dict = {}
        for row in sk.select(["column", "value"]).to_pylist():
            metric, payload = row["column"], base64.b64decode(row["value"])
            if metric.startswith("hll:"):
                obj = HyperLogLog.from_bytes(payload)
            elif metric.startswith("cm:"):
                obj = CountMin.from_bytes(payload)
            else:
                obj = TDigest.from_bytes(payload)
            if metric in merged:
                merged[metric].merge(obj)
            else:
                merged[metric] = obj
        rows = [{"kind": "sketch", "column": metric,
                 "value": base64.b64encode(obj.to_bytes()).decode("ascii"),
                 "n_rows": 0, "n_null": 0, "n_invalid": 0, "exact": True}
                for metric, obj in merged.items()]
        parts.append(pa.Table.from_pylist(rows, schema=FINDINGS_SCHEMA))
    if not parts:
        return FINDINGS_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def _prefold_blocks_task(*tbls: pa.Table) -> pa.Table:
    """Ray task: pre-fold a CHUNK of findings blocks at once — block refs
    are coalesced so the exchange is O(2×CPUs) tasks, not one per block
    (per-task overhead would eat the win at ~1000 small blocks)."""
    good = [t for t in tbls if t.num_rows]
    if not good:
        return FINDINGS_SCHEMA.empty_table()
    return _prefold_block(pa.concat_tables(good))


def prefold_distributed(*datasets: "rd.Dataset") -> list:
    """Pre-fold one or more materialized findings datasets on the cluster:
    returns a short list of summary tables (a few rows per chunk) for the
    serial driver fold.  Taking the datasets separately (main pass +
    extras) avoids a union+materialize barrier that would re-register
    every block just to iterate them once.  See ``_prefold_block`` for
    why: serial driver seconds are the scaling-efficiency tax."""
    import ray

    refs = [r for ds in datasets for r in ds.to_arrow_refs()]
    if not refs:
        return []
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_tasks = max(1, min(len(refs), 2 * cpus))
    chunk = -(-len(refs) // n_tasks)
    task = ray.remote(_prefold_blocks_task)
    out = [task.remote(*refs[i:i + chunk])
           for i in range(0, len(refs), chunk)]
    return ray.get(out)


def fold_findings(batches, rules: TableRules, sample_k: int = 1000):
    """One driver pass over findings batches → (colstats, violation counts,
    merged sketches).  Accepts raw findings batches OR the reduced stream
    from :func:`_prefold_block` (``vcount`` rows carry pre-counted
    violations).  Replaces three separate filter+merge mini-pipelines."""
    import base64

    import pyarrow.compute as _pc

    from crn_meta_validate_ray.state.sketches import (CountMin, HyperLogLog,
                                                      TDigest)

    rule_by_field = {r.field: r for r in rules.active_fields()}
    colstats: dict[str, ColStat] = {}
    counts: dict[str, int] = {}
    sketches: dict = {}
    for t in batches:
        kinds = t["kind"]
        cs_rows = t.filter(_pc.equal(kinds, "colstat"))
        if cs_rows.num_rows:
            for row in _combine_colstat_block(cs_rows).to_pylist():
                col = row["column"]
                cs = colstats.get(col)
                if cs is None:
                    rule = rule_by_field.get(col)
                    cs = ColStat(column=col,
                                 constraint_id=row["constraint_id"],
                                 severity=row["severity"])
                    colstats[col] = cs
                cs.merge_row(row, sample_k)
        v_rows = t.filter(_pc.equal(kinds, "violation"))
        if v_rows.num_rows:
            vc = _pc.value_counts(v_rows["constraint_id"].combine_chunks())
            for row in vc.to_pylist():
                counts[row["values"]] = counts.get(row["values"], 0) \
                    + int(row["counts"])
        vc_rows = t.filter(_pc.equal(kinds, "vcount"))
        if vc_rows.num_rows:
            for cid, n in zip(vc_rows["constraint_id"].to_pylist(),
                              vc_rows["n_invalid"].to_pylist()):
                counts[cid] = counts.get(cid, 0) + int(n)
        sk_rows = t.filter(_pc.equal(kinds, "sketch"))
        for row in sk_rows.select(["column", "value"]).to_pylist():
            metric, payload = row["column"], base64.b64decode(row["value"])
            if metric.startswith("hll:"):
                obj = HyperLogLog.from_bytes(payload)
            elif metric.startswith("cm:"):
                obj = CountMin.from_bytes(payload)
            else:
                obj = TDigest.from_bytes(payload)
            if metric in sketches:
                sketches[metric].merge(obj)
            else:
                sketches[metric] = obj
    return colstats, counts, sketches


def _persist_findings_chunk(out_tmp: str, chunk_id: int, drop_gpart: bool,
                            *blocks) -> dict:
    """Ray task: concat one chunk of findings blocks, split by kind, write
    one parquet file per kind under the hive layout (``kind`` lives in the
    directory name and is dropped from the file — byte-compatible with the
    layout ``write_parquet(partition_cols=['kind'])`` produced)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    good = [b for b in blocks if b is not None and b.num_rows]
    if not good:
        return {}
    t = pa.concat_tables(good, promote_options="permissive")
    if drop_gpart:
        t = t.filter(pc.not_equal(t["kind"], "gpart"))
    counts: dict = {}
    for k in pc.unique(t["kind"]).to_pylist():
        if k is None:
            continue
        sub = t.filter(pc.equal(t["kind"], k)).drop_columns(["kind"])
        if not sub.num_rows:
            continue
        d = os.path.join(out_tmp, f"kind={k}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, f"part-{chunk_id:05d}.parquet"))
        counts[k] = sub.num_rows
    return counts


def persist_findings(datasets, out_dir: str, *, drop_gpart: bool = False,
                     max_tasks: int = 32, wait: bool = True):
    """Persist materialized findings datasets under ``out_dir`` in the hive
    ``kind=<k>/part-*.parquet`` layout via direct chunked Ray tasks over
    the plasma blocks.

    Why not ``write_parquet``: the findings stream is a small fraction of
    the input by design, and a Dataset write job costs seconds of operator
    fixed cost regardless of payload (measured ~4-5 s to persist 15k rows
    from ~300 small blocks — as long as the whole fused pass).  Chunked
    tasks write the identical layout in block-fetch time, and the task
    count bounds the files per kind (the per-file open cost that dominated
    the partition sink at high partition counts).  Callers own the
    tmp-dir + atomic-swap protocol.

    With ``wait=False`` the write tasks are only launched and their object
    refs returned — the caller overlaps other work (e.g. the verdict
    prefold over the same blocks) and ``ray.get``s the refs before the
    tmp-dir swap."""
    import ray

    refs = [r for ds in datasets if ds is not None
            for r in ds.to_arrow_refs()]
    os.makedirs(out_dir, exist_ok=True)
    if not refs:
        return []
    n_chunks = max(1, min(max_tasks, len(refs)))
    per = -(-len(refs) // n_chunks)
    task = ray.remote(_persist_findings_chunk)
    out = [task.remote(out_dir, i, drop_gpart,
                       *refs[i * per:(i + 1) * per])
           for i in range(n_chunks) if refs[i * per:(i + 1) * per]]
    if wait:
        ray.get(out)
        return []
    return out


def _read_kind(findings_path: str, kind: str) -> "rd.Dataset":
    """Read one hive partition of the findings layout; re-attach the
    constant `kind` column that lives in the directory name."""
    sub = os.path.join(findings_path, f"kind={kind}")
    if not os.path.isdir(sub):
        from crn_meta_validate_ray.stages.validate import FINDINGS_SCHEMA
        return rd.from_arrow(FINDINGS_SCHEMA.empty_table())
    ds = rd.read_parquet(sub)

    def attach(t: pa.Table) -> pa.Table:
        if "kind" in t.column_names:
            return t
        return t.append_column(
            "kind", pa.array([kind] * t.num_rows, type=pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def violation_counts(violations: "rd.Dataset") -> dict[str, int]:
    """Count violation rows per constraint_id — a streaming driver-side fold
    over per-batch value_counts (violations are the small output stream; a
    distributed groupby here would pay a whole sort barrier for nothing)."""
    import pyarrow.compute as _pc

    out: dict[str, int] = {}
    only = violations.select_columns(["constraint_id"])
    for batch in only.iter_batches(batch_size=1 << 18,
                                   batch_format="pyarrow"):
        vc = _pc.value_counts(batch["constraint_id"].combine_chunks())
        for row in vc.to_pylist():
            out[row["values"]] = out.get(row["values"], 0) + int(row["counts"])
    return out


def extension_summaries(rules: TableRules, counts: dict[str, int],
                        sketches: dict, n_rows: int
                        ) -> tuple[list, list, dict]:
    """Distributed-check verdict messages: one error/warning per violated
    rule (uniqueness / sequence / referential / drift), plus an extras dict
    with sketch-derived metrics."""
    errors: list = []
    warnings_: list = []
    extras: dict = {}

    def push(severity, cid, msg):
        (errors if severity == "error" else warnings_).append((cid, msg))

    for u in rules.unique:
        c = counts.get(u.constraint_id, 0)
        if c:
            push(u.severity, u.constraint_id,
                 f"{c} duplicated key(s) on ({', '.join(u.columns)})")
        hll_key = f"hll:{'|'.join(u.columns)}"
        if hll_key in sketches and n_rows:
            est = sketches[hll_key].estimate()
            extras[hll_key] = est
    for s in rules.sequences:
        c = counts.get(s.constraint_id, 0)
        if c:
            push(s.severity, s.constraint_id,
                 f"{c} group(s) where {s.index_col} is not contiguous "
                 f"from {s.start} within {s.group_col}")
    for r in rules.references:
        c = counts.get(r.constraint_id, 0)
        if c:
            push(r.severity, r.constraint_id,
                 f"{c} orphan value(s) of {r.column} not found in "
                 f"{r.target_table}.{r.target_column}")
    for d in rules.drift:
        digest = sketches.get(d.constraint_id)
        if digest is None or not d.expected_quantiles:
            continue
        bad = []
        for q, expected in d.expected_quantiles:
            obs = digest.quantile(q)
            denom = abs(expected) if expected else 1.0
            if abs(obs - expected) / denom > d.tolerance:
                bad.append(f"q{q:g}: observed {obs:.3f} vs expected {expected:g}")
            extras[f"{d.constraint_id}:q{q:g}"] = obs
        if bad:
            push(d.severity, d.constraint_id,
                 f"distribution drift on {d.metric}: {'; '.join(bad)}")
    for d in rules.drift:
        c = counts.get(f"{d.constraint_id}:group", 0)
        if c:
            push(d.severity, f"{d.constraint_id}:group",
                 f"{c} group(s) with outlier {d.metric} vs the declared "
                 f"expectation")
    for cr in getattr(rules, "conditionals", []) or []:
        c = counts.get(cr.constraint_id, 0)
        if c:
            requirement = (f"in ({', '.join(map(quote, cr.then_values))})"
                           if cr.then_values else "non-missing")
            push(cr.severity, cr.constraint_id,
                 f"{c} row(s) where {cr.if_col} in "
                 f"({', '.join(map(quote, cr.if_values))}) but "
                 f"{cr.then_col} is not {requirement}")
    return errors, warnings_, extras


def validate_dataset(
    ds: "rd.Dataset",
    rules: TableRules,
    *,
    mode: str = "collect",
    out_dir: str | None = None,
    batch_size: int | None = 8192,
    sample_k: int = 1000,
    extra_findings: "list[rd.Dataset] | None" = None,
    extra_messages: "list[tuple[str, str, str]] | None" = None,
    report: ReportCollector | None = None,
    include_details: bool = True,
    sketch_spec=None,
    ref_rules_keys=None,
    group_fuse=None,
    group_fuse_reduce: bool = True,
    group_fuse_ref_splits=None,
    group_fuse_num_buckets: int | None = None,
    schema_names: "list[str] | None" = None,
    return_findings_mat: bool = False,
    commit_protocol=None,
    defer_commit: bool = False,
    on_materialized=None,
) -> ValidationRun:
    """Validate one Dataset against a TableRules registry.

    ``extra_findings``: findings datasets from distributed checks
    (uniqueness / referential / sequence / sketch stages), unioned into the
    single findings stream; their violation rows and sketch partials are
    folded into the verdict.  ``extra_messages``: additional
    ``(severity, constraint_id, msg)`` verdicts.  ``sketch_spec`` /
    ``ref_rules_keys`` fuse the sketch stage and broadcast referential check
    into the per-cell pass (one read of the wide input).

    ``group_fuse`` (a ``stages.groupfuse.GroupFuseSpec``) fuses the
    sequence/uniqueness/drift group checks into the same pass: run-length
    partials are emitted per batch and, with ``group_fuse_reduce=True``,
    merged by a tiny keyed exchange over the materialized findings — no
    second read of the input.  With ``group_fuse_reduce=False`` the
    partials are only emitted (and persisted in ``write`` mode) so a later
    cross-partition phase can merge them — the resumable pipeline's shape.

    ``schema_names`` overrides the schema used for the missing/extra-column
    verdict (reference: utils/validate_core.py:221-223, :31-47).  Pass the
    table's FULL column list when ``ds`` is a pruned read of only the
    rule-referenced columns — unruled columns contribute only their name to
    the verdict, so their bytes never need to be read.

    ``defer_commit`` (write mode): do NOT wait for the findings
    persistence or publish the findings dir; instead return a zero-arg
    closure in ``extras['commit_findings']`` that does both.  The caller
    overlaps the still-running persistence tasks with other work and owns
    the commit point (it must call the closure BEFORE committing any
    manifest that names the findings dir).
    """
    if schema_names is None:
        schema = ds.schema()
        schema_names = list(schema.names) if schema is not None else []
    validator = BatchValidator(rules, sample_k=sample_k,
                               sketch_spec=sketch_spec,
                               ref_rules_keys=ref_rules_keys,
                               group_fuse=group_fuse)
    findings = ds.map_batches(validator, batch_format="pyarrow",
                              batch_size=batch_size, zero_copy_batch=True)

    # extra_findings entries may be Datasets or zero-arg THUNKS that build
    # one.  Thunks are resolved in worker threads concurrently with the main
    # pass so an eager exchange (grouped_map executes at build time) overlaps
    # the fused per-cell materialization instead of serializing before it.
    extras_in = [e for e in (extra_findings or []) if e is not None]
    thunks = [e for e in extras_in if callable(e)]
    ready = [e for e in extras_in if not callable(e)]

    findings_path = None
    if mode == "write" and not out_dir:
        raise ValueError("mode='write' requires out_dir")
    if thunks:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
            futures = [ex.submit(t) for t in thunks]
            mat = findings.materialize()
            for f in futures:
                out = f.result()
                if out is not None:
                    ready.append(out)
    else:
        mat = findings.materialize()
    if on_materialized is not None:
        # earliest hook on the materialized findings blocks — fires BEFORE
        # the verdict prefold and the persistence wait, so a caller can
        # launch work that needs only the blocks (the resumable pipeline
        # presplits the gpart partials here and starts the cross-partition
        # group phase once every partition has signalled)
        on_materialized(mat)
    if group_fuse is not None and group_fuse_reduce:
        # fused group checks: merge the per-batch run partials riding the
        # findings stream (kind='gpart') — launches right off the
        # materialized blocks, no extra read of the input
        from crn_meta_validate_ray.stages.groupfuse import fused_group_reduce
        gf = fused_group_reduce(mat, group_fuse,
                                num_buckets=group_fuse_num_buckets,
                                ref_splits=group_fuse_ref_splits)
        if gf is not None:
            ready.append(gf)
    drop_gpart = group_fuse is not None and group_fuse_reduce
    persist_refs = None
    tmp_path = None
    if mode == "write":
        # persistence of the findings stream FROM THE MATERIALIZED BLOCKS
        # (plasma → disk; no recompute) is LAUNCHED before the verdict
        # prefold so the write tasks and the prefold tasks — independent
        # consumers of the same blocks — run concurrently.  Direct chunked
        # Ray tasks, not a Dataset write job: a write_parquet pipeline
        # here costs seconds of operator fixed cost regardless of payload
        # (the findings stream is a small fraction of the input by design
        # — measured 15k rows taking 5 s through the operator path).
        # Write to a fresh staging attempt then publish through the
        # output store's CommitProtocol (state/commit.py) — a retried/
        # rewritten partition must not append to (and double-count) a
        # previous attempt's files, and a killed run must leave either a
        # committed findings dir or one invisible to readers.
        from crn_meta_validate_ray.state.commit import resolve_protocol
        proto = resolve_protocol(commit_protocol)
        findings_path = os.path.join(out_dir, "findings")
        tmp_path = proto.stage_dir(findings_path)
        persist_refs = persist_findings([mat, *ready], tmp_path,
                                        drop_gpart=drop_gpart, wait=False)
    # distributed pre-fold: chunk-level combine on the cluster so the
    # serial driver fold sees a few summary rows per chunk, not every
    # violation/partial row; the extras' blocks are folded directly —
    # no union+materialize barrier re-registering every block
    colstats, counts, sketches = fold_findings(
        iter(prefold_distributed(mat, *ready)), rules, sample_k)
    commit_findings = None
    if mode == "write":
        import ray

        def _commit_findings():
            ray.get(persist_refs)
            proto.publish_dir(tmp_path, findings_path)

        if defer_commit:
            # caller owns the commit point (extras['commit_findings']):
            # the persistence tasks keep running while the caller overlaps
            # other work (the resumable pipeline launches the cross-
            # partition group phase here).  The findings dir is NOT
            # published until the closure runs, so a crash before it
            # leaves the partition invisible to readers, exactly like a
            # crash mid-persist.  Violations come from the in-memory
            # stream (the persisted dir does not exist yet).
            commit_findings = _commit_findings
            all_f = mat
            if drop_gpart:
                all_f = all_f.filter(expr="kind != 'gpart'")
            for extra in ready:
                all_f = all_f.union(extra)
            violations = all_f.filter(expr="kind == 'violation'")
        else:
            _commit_findings()
            # downstream readers consume the PERSISTED violations (disk
            # state, valid after this process exits), not the in-memory
            # stream — resolved through the protocol (under MarkerCommit
            # the data lives in the committed attempt, not at
            # findings_path itself)
            violations = _read_kind(proto.data_dir(findings_path)
                                    or findings_path, "violation")
    else:
        all_f = mat
        if drop_gpart:
            # consumed partials don't belong in the violations stream
            # (with reduce=False they DO persist — the resumable group
            # phase reads them back)
            all_f = all_f.filter(expr="kind != 'gpart'")
        for extra in ready:
            all_f = all_f.union(extra)
        violations = all_f.filter(expr="kind == 'violation'")

    n_rows = max((cs.n_rows for cs in colstats.values()), default=0)
    result = build_eval_result(rules, schema_names, colstats, n_rows)
    ext_err, ext_warn, extras = extension_summaries(rules, counts, sketches,
                                                    n_rows)
    result.extension_errors.extend(ext_err)
    result.extension_warnings.extend(ext_warn)
    for sev, cid, msg in extra_messages or []:
        if sev == "error":
            result.extension_errors.append((cid, msg))
        else:
            result.extension_warnings.append((cid, msg))

    if report is None:
        report = ReportCollector()
    errors, warnings = compose_validation_report(result, rules.table, report,
                                                 include_details)
    extras = {"sketches": sketches, "violation_counts": counts, **extras}
    if mode == "write" and return_findings_mat:
        # the materialized findings blocks (still alive in plasma) — an
        # in-process caller (resumable's group phase) consumes them
        # directly instead of reading the just-persisted parquet back.
        # Opt-in: attaching them unconditionally would pin every findings
        # block in the object store for the lifetime of the run object.
        extras["findings_mat"] = mat
    if commit_findings is not None:
        extras["commit_findings"] = commit_findings
    return ValidationRun(table=rules.table, eval_result=result, errors=errors,
                         warnings=warnings, report=report, colstats=colstats,
                         n_rows=n_rows, violations=violations,
                         findings_path=findings_path,
                         extras=extras)


def compare_verdicts(ds: "rd.Dataset", rules_old: TableRules,
                     rules_new: TableRules,
                     names: tuple[str, str] = ("old", "new"),
                     batch_size: int | None = 8192) -> pa.Table:
    """Per-constraint verdict deltas between two registry versions over ONE
    shared scan of the input (the reference's old-CDE toggle re-validates
    the whole table per version, app.py:865-932; here both compiled kernel
    sets run on the same zero-copy batch, so the wide input is read once).

    Returns one row per column that either version has a rule for:
    ``(column, constraint_old, constraint_new, n_invalid_old,
    n_invalid_new, n_null_old, n_null_new, verdict_old, verdict_new,
    change)`` with ``change`` ∈ {unchanged_pass, unchanged_fail, fixed,
    broken, added, removed}.

    Caller contract: the delta is per COLUMN — each version contributes at
    most ONE rule per field.  ``TableRules`` enforces this at construction
    (two FieldRules on one field raise ``RegistryError``), so a field can
    never carry two verdicts per version; a hand-built rules object that
    bypassed the registry would be keyed by its LAST rule for the field
    (deterministic, but the earlier rule's verdict would not appear).

    Scale: only colstat partials leave the scan
    (≤ 2×|rules| rows per batch, no violation rows); a batch-local combine
    collapses them 64k-at-a-time before a tiny driver fold."""
    validators = [
        BatchValidator(rules_old, emit_violations=False),
        BatchValidator(rules_new, emit_violations=False),
    ]

    def dual(batch: pa.Table) -> pa.Table:
        parts = []
        for name, v in zip(names, validators):
            t = v(batch)
            parts.append(t.append_column(
                "version", pa.array([name] * t.num_rows, type=pa.string())))
        return pa.concat_tables(parts)

    keep = ["version", "column", "constraint_id", "n_rows", "n_null",
            "n_invalid"]

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.groupby(["version", "column", "constraint_id"],
                          sort=False, as_index=False)
               [["n_rows", "n_null", "n_invalid"]].sum())
        return pd_to_arrow(out)

    partials = (ds.map_batches(dual, batch_format="pyarrow",
                               batch_size=batch_size, zero_copy_batch=True)
                .filter(expr="kind == 'colstat'")
                .select_columns(keep)
                .map_batches(combine, batch_format="pyarrow",
                             batch_size=65536))
    import pandas as pd
    folded = partials.to_pandas()
    if folded.empty:
        # zero colstat rows (empty input, or no ruled column present):
        # every rule still appears below as a schema-level 'missing' row
        folded = pd.DataFrame(columns=["version", "column", "constraint_id",
                                       "n_rows", "n_null", "n_invalid"])
    folded = (folded
              .groupby(["version", "column", "constraint_id"],
                       as_index=False)[["n_rows", "n_null", "n_invalid"]]
              .sum())

    # indexed by (column, constraint_id): a registry carrying TWO rules on
    # one field emits two colstat rows per column, and a bare column index
    # would make .loc return a frame (and int(...) raise).  The delta below
    # is per COLUMN, keyed by each version's last rule for that field —
    # deterministic for multi-rule fields, exact for the 1-rule norm.
    per_version = {
        name: folded[folded["version"] == name]
        .set_index(["column", "constraint_id"]) for name in names}
    # the column universe comes from the RULE SETS, not the folded stream:
    # a rule whose column is missing from the data emits no colstat (it is
    # a schema-level verdict) but must still appear in the delta
    ruled = {names[0]: {r.field: r for r in rules_old.active_fields()},
             names[1]: {r.field: r for r in rules_new.active_fields()}}
    columns = sorted(set(ruled[names[0]]) | set(ruled[names[1]]))
    rows = []
    for col in columns:
        sides = []
        for name in names:
            rule = ruled[name].get(col)
            if rule is None:
                sides.append(None)  # no rule in this version
                continue
            pv = per_version[name]
            key = (col, rule.constraint_id)
            if key in pv.index:
                r = pv.loc[key]
                sides.append((rule.constraint_id,
                              int(r["n_invalid"]), int(r["n_null"]),
                              "fail" if int(r["n_invalid"]) else "pass"))
            else:  # ruled but absent from the data: schema-level failure
                sides.append((rule.constraint_id, None, None, "missing"))
        old, new = sides
        if old is None:
            change = "added"
        elif new is None:
            change = "removed"
        else:
            o_fail, n_fail = old[3] != "pass", new[3] != "pass"
            change = ("unchanged_fail" if o_fail and n_fail else
                      "unchanged_pass" if not o_fail and not n_fail else
                      "fixed" if o_fail else "broken")
        rows.append({
            "column": col,
            "constraint_old": old[0] if old else None,
            "constraint_new": new[0] if new else None,
            "n_invalid_old": old[1] if old else None,
            "n_invalid_new": new[1] if new else None,
            "n_null_old": old[2] if old else None,
            "n_null_new": new[2] if new else None,
            "verdict_old": old[3] if old else "absent",
            "verdict_new": new[3] if new else "absent",
            "change": change,
        })
    schema = pa.schema([
        ("column", pa.string()), ("constraint_old", pa.string()),
        ("constraint_new", pa.string()), ("n_invalid_old", pa.int64()),
        ("n_invalid_new", pa.int64()), ("n_null_old", pa.int64()),
        ("n_null_new", pa.int64()), ("verdict_old", pa.string()),
        ("verdict_new", pa.string()), ("change", pa.string()),
    ])
    return pa.Table.from_pylist(rows, schema=schema)


def validate_against_versions(ds: "rd.Dataset",
                              versions: "dict[str, TableRules]",
                              **kwargs) -> dict:
    """Validate the same dataset against several registry versions (the
    reference's old-CDE toggle, app.py:865-932, :951-963: re-run validation
    with a different rule registry and compare verdicts).  Returns
    {version_name: ValidationRun} plus a "__comparison__" entry summarising
    verdict deltas."""
    runs = {name: validate_dataset(ds, rules, **kwargs)
            for name, rules in versions.items()}
    names = list(runs)
    comparison = {
        "versions": names,
        "errors": {n: runs[n].errors for n in names},
        "warnings": {n: runs[n].warnings for n in names},
        "verdicts": {n: runs[n].passed for n in names},
        "agree": len({runs[n].passed for n in names}) == 1,
    }
    out: dict = dict(runs)
    out["__comparison__"] = comparison
    return out
