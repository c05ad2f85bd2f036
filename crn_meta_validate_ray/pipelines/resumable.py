"""Resumable partitioned validation run.

Layout of one run directory:

```
out_dir/
  manifests/<partition>.json      # committed lineage + metrics + sketches
  manifests/_groupcheck.json      # cross-partition phase manifest
  partitions/<partition>/findings/  # violation + colstat parquet (hive by kind)
  groupcheck/findings/            # group/ref-phase violation parquet
  report.txt                      # final merged report (reference text format)
  summary.json                    # verdict row + metrics
```

Phases:

1. **per-partition** (embarrassingly parallel unit of resume): each input
   Parquet file is a partition; the per-cell constraint pass + sketch stage
   run on just that file and commit a manifest.  On restart, partitions with
   a committed manifest whose (input files, constraint hash) lineage matches
   are skipped without reading their data.
2. **cross-partition group phase**: sequence / uniqueness / drift checks
   need per-conversation state that may span partition files.  Each
   partition PERSISTS run-length group partials (``kind=gpart``, see
   stages/groupfuse.py) alongside its findings; this phase reads only
   those partials — never the raw input again — merges them with a tiny
   keyed exchange, and commits its own manifest.  Only the shuffle
   referential anti-join (target table too big to broadcast) still reads
   the raw foreign-key column here.
3. **merge**: per-partition colstats / counts / sketches are folded (the
   two-phase all-null semantics, utils/validate_core.py:232-236) and the
   global report is composed — reading only manifests, never data.
"""

from __future__ import annotations

import os

import ray.data as rd

from crn_meta_validate_ray.registry import ConstraintSet, TableRules
from crn_meta_validate_ray.report import ReportCollector, compose_validation_report
from crn_meta_validate_ray.stages.refcheck import referential_findings
from crn_meta_validate_ray.pipelines.validate_pipeline import (
    ValidationRun,
    build_eval_result,
    extension_summaries,
    validate_dataset,
)
from crn_meta_validate_ray.state.checkpoint import (
    ManifestStore,
    colstats_from_json,
    colstats_to_json,
    sketches_from_json,
    sketches_to_json,
)


RUN_MANIFEST_ID = "_run"  # run-level lineage: current partition grouping

# sentinel for _run_group_phase's spec parameter: distinguishes "caller did
# not supply a spec — rebuild it" from a schema-guarded None ("group/index
# column is absent, there ARE no gpart partials, do not fuse anything into
# the gpart exchange").  A plain None default silently rebuilt an unguarded
# spec and routed the big-target referential anti-join onto an exchange
# that had no partials, losing the referential violations.
_UNSET = object()


def _list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))


def _schema_intersection(files: list[str]) -> set:
    """Column names present in EVERY input file (footer probes only).

    The fused group checks require the group/index column in every
    partition file — a column present in some files but not others must
    disable the fused path for the whole run (partials from a subset of
    partitions would under-count), so the ``for_schema`` guard is fed the
    intersection, not a single file's schema.  Cost: one parquet footer
    read per file, metadata-only, driver-side; at real scale this comes
    from the table catalog instead."""
    import pyarrow.parquet as pq
    names: set | None = None
    for f in files:
        cols = set(pq.read_schema(f).names)
        names = cols if names is None else (names & cols)
        if not names:
            break
    return names or set()


def run_resumable(
    turns_path: str,
    conversations_path: str | None,
    out_dir: str,
    rules: TableRules,
    *,
    batch_size: int = 8192,
    max_partitions: int | None = None,
    files_per_partition: int = 1,
    partition_concurrency: int = 2,
    commit_protocol=None,
) -> ValidationRun | None:
    """Execute (or resume) a partitioned validation run.  Returns the merged
    ValidationRun, or None when ``max_partitions`` stopped the run early
    (simulating a kill).

    ``files_per_partition`` sets the resume granularity: each partition
    (file group) is one Dataset run with its own committed manifest.  Size
    it so one partition is a few minutes of work — per-partition fixed
    overhead (~seconds) must stay small relative to its compute, while a
    retry after a kill only repeats one partition.

    ``partition_concurrency`` partitions run as concurrent Dataset jobs
    (worker threads): one partition's parquet sink + manifest fold then
    overlaps the next partition's compute instead of serializing the
    per-partition fixed cost.  Partitions are independent resume units, so
    interleaved commits are safe; under ``max_partitions`` (kill
    simulation) the loop stays serial so the killed state matches a
    process that died mid-loop."""
    from crn_meta_validate_ray.state.commit import resolve_protocol
    proto = resolve_protocol(commit_protocol)
    files = _list_parquet_files(turns_path)
    cs_hash = ConstraintSet().add(rules).content_hash()
    store = ManifestStore(os.path.join(out_dir, "manifests"),
                          protocol=proto)

    # only the per-cell field rules run in phase 1 (plus the fused
    # group-partial emit — see group_fuse below)
    cell_rules = TableRules(table=rules.table, fields=rules.fields,
                            locator=rules.locator,
                            null_rates=rules.null_rates)

    g = max(1, files_per_partition)
    groups = [files[i:i + g] for i in range(0, len(files), g)]
    # run-level lineage manifest: records the CURRENT grouping so merge_run
    # folds exactly these partitions — stale manifests from an earlier run
    # with a different files_per_partition (or a removed input file) are
    # ignored instead of double-counted
    pids = {}
    for group in groups:
        pid = os.path.splitext(os.path.basename(group[0]))[0]
        if len(group) > 1:
            pid += f"__x{len(group)}"
        pids[pid] = sorted(group)
    store.commit(RUN_MANIFEST_ID, {
        "constraint_hash": cs_hash,
        "files": sorted(files),
        "files_per_partition": g,
        "partition_files": pids,
    })
    gpid = "_groupcheck"
    pending = [(pid, group) for pid, group in pids.items()
               if not store.is_valid(pid, group, cs_hash)]
    gc_needed = not store.is_valid(gpid, files, cs_hash)

    # broadcast referential check FUSED into the per-cell pass (the
    # one-shot pipeline's shape): membership is per-row, so it partitions
    # cleanly — per-partition ref violations land in that partition's
    # findings/manifest and merge_run sums them.  The key build runs once,
    # shared by every partition, and only when there is work to do: a
    # fully-resumed (no-op) run must stay metadata-only.  The placement
    # decision (fused-broadcast vs group-phase shuffle anti-join) depends
    # only on the target table size, so it is stable across restarts and
    # resumed runs never double-count.
    ref_rules_keys = None
    ref_in_group_phase = False
    if conversations_path and rules.references and (pending or gc_needed):
        from crn_meta_validate_ray.pipelines.transcripts import (
            REF_BROADCAST_MAX_TARGET, build_broadcast_ref_keys)
        ref = rules.references[0]
        n_target = rd.read_parquet(
            conversations_path, columns=[ref.target_column]).count()
        if n_target <= REF_BROADCAST_MAX_TARGET:
            if pending:  # keys are consumed only by partition runs
                ref_rules_keys = [(ref, build_broadcast_ref_keys(
                    conversations_path, ref.target_column))]
        else:
            ref_in_group_phase = True

    gc_conversations = conversations_path if ref_in_group_phase else None

    # sketch stage FUSED into the per-cell pass (same hll/cm coverage the
    # stand-alone SketchStage had): one full-width read per partition
    # instead of a second narrow read + actor-pool spin-up
    from crn_meta_validate_ray.pipelines.transcripts import build_sketch_spec
    sketch_spec = build_sketch_spec(rules)
    # group checks FUSED too: each partition emits run-length gpart
    # partials (+ within-batch ts-gap digests) from the same pass and
    # persists them with its findings; the group phase merges partials
    # only — the raw input is read exactly once per partition, ever.
    # for_schema (one footer probe): group/index column absent → no fused
    # group checks AND the ref anti-join must not ride the (empty) gpart
    # exchange; ts column absent → gap check stripped
    from crn_meta_validate_ray.stages.common import resolve_num_buckets
    from crn_meta_validate_ray.stages.groupfuse import (GroupFuseSpec,
                                                        presplit_gparts)
    group_fuse = GroupFuseSpec.from_rules(rules)
    if group_fuse is not None and files:
        # intersection across ALL partition files (not files[0]): a
        # group/index/ts column missing from ANY file disables the fused
        # path for the whole run — see _schema_intersection
        group_fuse = group_fuse.for_schema(_schema_intersection(files))
    num_buckets = resolve_num_buckets(None)

    # partitions run in THIS process hand their gpart partials to the
    # group phase PRE-SPLIT: the split tasks launch as each partition
    # commits (overlapping the remaining partitions) and only the
    # compressed bucket parts stay alive in plasma — never the
    # partition's full findings blocks.  Resumed/skipped partitions are
    # read from their committed kind=gpart files as before.
    live_splits: dict = {}

    def _run_partition(pid: str, group: list[str],
                       presplit_ready=None) -> None:
        part_dir = os.path.join(out_dir, "partitions", pid)
        ds = rd.read_parquet(group)

        def _on_materialized(mat) -> None:
            # fires right after the fused pass materializes, BEFORE the
            # partition's own prefold / persistence tail: once every
            # partition has registered its gpart presplit the cross-
            # partition group phase launches and overlaps those tails
            if group_fuse is not None:
                live_splits[pid] = presplit_gparts(mat, num_buckets)
            if presplit_ready is not None:
                presplit_ready.set()

        run = validate_dataset(ds, cell_rules, mode="write",
                               out_dir=part_dir, batch_size=batch_size,
                               include_details=False,
                               sketch_spec=sketch_spec,
                               ref_rules_keys=ref_rules_keys,
                               group_fuse=group_fuse,
                               group_fuse_reduce=False,
                               defer_commit=True,
                               on_materialized=_on_materialized,
                               commit_protocol=proto)
        # commit point: findings publish strictly before the manifest
        # that names them (a crash in between leaves an uncommitted
        # findings dir + no manifest → the partition recomputes)
        run.extras.pop("commit_findings")()
        store.commit(pid, {
            "input_files": sorted(group),
            "input_bytes": sum(os.path.getsize(f) for f in group),
            "constraint_hash": cs_hash,
            "n_rows": run.n_rows,
            "schema_names": list(ds.schema().names),
            "colstats": colstats_to_json(run.colstats),
            "violation_counts": run.extras["violation_counts"],
            "sketches": sketches_to_json(run.extras["sketches"]),
            "findings_path": run.findings_path,
        })

    done = 0
    if max_partitions is not None:
        # serial kill-simulation path: commit order == loop order
        for pid, group in pending:
            if done >= max_partitions:
                return None
            _run_partition(pid, group)
            done += 1
    elif pending:
        import threading
        from concurrent.futures import (FIRST_EXCEPTION,
                                        ThreadPoolExecutor, wait)
        events = {pid: threading.Event() for pid, _ in pending}
        workers = max(1, min(partition_concurrency, len(pending)))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(_run_partition, pid, group, events[pid])
                    for pid, group in pending]
            if gc_needed:
                # launch the cross-partition group phase as soon as every
                # partition's gpart presplit is registered — the phase's
                # exchange + persistence then overlaps the partitions'
                # own persistence/commit tails instead of serializing
                # after them.  A partition failure before its signal
                # aborts the wait; the group phase is then skipped and
                # the failure surfaces below.
                while not all(e.is_set() for e in events.values()):
                    fdone, _ = wait(futs, timeout=0.05,
                                    return_when=FIRST_EXCEPTION)
                    if any(f.exception() is not None for f in fdone):
                        break
                else:
                    _run_group_phase(store, gpid, files, cs_hash, out_dir,
                                     rules, pids, gc_conversations,
                                     group_fuse, num_buckets, live_splits)
            wait(futs, return_when=FIRST_EXCEPTION)
            for f in futs:
                f.cancel()  # never-started tasks die on first failure
        # with-exit joined every running future; surface the first
        # failure (cancelled = never ran, nothing to surface)
        for f in futs:
            if not f.cancelled():
                f.result()
        done = len(pending)

    # ---- phase 2: merge the persisted group partials (+ shuffle ref) ----
    # normally already run overlapped above (its manifest makes this a
    # no-op); still needed for the serial kill-simulation path, a fully
    # resumed partition phase, or a prior run killed between the two
    # phases — those consume committed gpart output from disk
    if not store.is_valid(gpid, files, cs_hash):
        if max_partitions is not None and done >= max_partitions:
            return None
        _run_group_phase(store, gpid, files, cs_hash, out_dir, rules, pids,
                         gc_conversations, group_fuse, num_buckets,
                         live_splits)

    return merge_run(out_dir, rules, commit_protocol=proto)


def _run_group_phase(store: ManifestStore, gpid: str, files: list[str],
                     cs_hash: str, out_dir: str, rules: TableRules,
                     pids: dict[str, list[str]],
                     conversations_path: str | None,
                     spec=_UNSET, num_buckets: int | None = None,
                     live_splits: dict | None = None) -> None:
    """Cross-partition group phase: merges the run-length ``kind=gpart``
    partials every partition persisted (stages/groupfuse.py) with a tiny
    keyed exchange — the raw input is never re-read here.  Only the
    shuffle referential anti-join (target table too big to broadcast, or
    no live group spec to carry it) still scans the raw foreign-key
    column.  ``spec`` is the schema-guarded GroupFuseSpec the partition
    phase ran with — an explicit None means "schema guard disabled the
    fused path; there are no gpart partials", so the referential check
    MUST take the stand-alone shuffle anti-join below, never a fused
    placement.  Only a caller that passes no spec at all (``_UNSET``)
    gets one rebuilt from the rules, re-applying the same schema guard."""
    gc_dir = os.path.join(out_dir, "groupcheck")
    findings = []
    from crn_meta_validate_ray.stages.groupfuse import (GroupFuseSpec,
                                                        fused_group_reduce,
                                                        plan_fused_ref)
    if spec is _UNSET:
        spec = GroupFuseSpec.from_rules(rules)
        if spec is not None and files:
            spec = spec.for_schema(_schema_intersection(files))
    ref = rules.references[0] if (conversations_path
                                  and rules.references) else None
    ref_splits = None
    # num_buckets must match the bucket count any live presplit used —
    # pass it through so plan_fused_ref builds target splits to match
    plan = plan_fused_ref(spec, ref, conversations_path, num_buckets)
    if plan is not None:
        # big-target anti-join fused into the partial exchange: only the
        # target's distinct keys travel (launched now so the build overlaps
        # the gpart read below); the raw turns input is never touched.
        # plan_fused_ref is the ONE placement decision shared with the
        # one-shot pipeline — a resumed run re-derives the same placement.
        spec, num_buckets, ref_splits = plan
        ref = None
    if spec is not None:
        live = live_splits or {}
        gpart_dirs = []
        presplit = []
        for pid in sorted(pids):
            if pid in live:
                # partition ran in this process: its gpart partials were
                # split as it committed — only bucket parts, no read-back
                presplit.extend(live[pid])
                continue
            m = store.load(pid) or {}
            fp = m.get("findings_path") or os.path.join(
                out_dir, "partitions", pid, "findings")
            # committed-files discovery through the protocol: under
            # MarkerCommit the final path may hold uncommitted attempts
            gpart_dirs.extend(
                store.protocol.committed_files(fp, "kind=gpart"))
        disk_parts = None
        if gpart_dirs:
            # the hive kind column lives in the path; _gpart_split treats
            # kind-less value rows as partials, so only `value` is read
            disk_parts = rd.read_parquet(gpart_dirs, columns=["value"])
        if disk_parts is not None or presplit:
            gc = fused_group_reduce(disk_parts, spec,
                                    num_buckets=num_buckets,
                                    ref_splits=ref_splits,
                                    presplit=presplit)
            if gc is not None:
                findings.append(gc)
    if ref is not None:
        # FK column is not the group column (or no group rules at all):
        # stand-alone shuffle anti-join over the pruned raw FK read.
        # Locator columns absent from some partition files are dropped
        # from the projection (same `& available` the one-shot pipeline
        # applies); a missing FK column itself skips the check — the
        # schema-level verdict already flags the absent column.
        available = _schema_intersection(files)
        if ref.column in available:
            fk_cols = sorted({ref.column} | set(rules.locator) & available)
            fk = rd.read_parquet(files, columns=fk_cols)
            convs = rd.read_parquet(conversations_path,
                                    columns=[ref.target_column])
            rf = referential_findings(fk, rules,
                                      {ref.target_table: convs})
            if rf is not None:
                findings.append(rf)
    counts: dict = {}
    sketches_json: dict = {}
    if findings:
        merged = findings[0]
        for f2 in findings[1:]:
            merged = merged.union(f2)
        # materialize once (the group findings stream is small: violation
        # rows + drift-sketch partials), then persist AND fold from the
        # same plasma blocks — no disk read-back jobs on the critical path,
        # and the persistence is direct chunked tasks (persist_findings),
        # not a Dataset write job with its seconds of operator fixed cost
        mat = merged.materialize()
        fp = os.path.join(gc_dir, "findings")
        import ray

        from crn_meta_validate_ray.pipelines.validate_pipeline import (
            fold_findings, persist_findings, prefold_distributed)
        staged = store.protocol.stage_dir(fp)
        # persistence tasks launched first, then the prefold wave — two
        # independent consumers of the same plasma blocks run concurrently;
        # one prefold yields both the violation counts and the merged
        # sketches (the previous two filter+fold Dataset jobs each paid
        # operator fixed cost on a stream of a few thousand rows)
        persist_refs = persist_findings([mat], staged, wait=False)
        _, counts, sk = fold_findings(iter(prefold_distributed(mat)), rules)
        sketches_json = sketches_to_json(sk)
        ray.get(persist_refs)
        store.protocol.publish_dir(staged, fp)
    store.commit(gpid, {
        "input_files": sorted(files),
        "constraint_hash": cs_hash,
        "violation_counts": counts,
        "sketches": sketches_json,
    })


def gc_run(out_dir: str, commit_protocol=None) -> list[str]:
    """Reclaim abandoned staging state across a run directory: uncommitted
    ``_attempt-*`` prefixes / ``.tmp`` staging dirs under every findings
    artifact, plus torn single-object PUT temps (``*.put-*`` /
    file-level ``*.tmp``) next to manifests and reports.  Committed data
    is never touched — readers resolve through markers/manifests, so this
    is safe whenever no writer is active on the run (e.g. after
    ``merge_run``, or before resuming a killed run).  Returns the paths
    removed; idempotent."""
    from crn_meta_validate_ray.state.commit import resolve_protocol
    proto = resolve_protocol(commit_protocol)
    removed: list[str] = []
    part_root = os.path.join(out_dir, "partitions")
    art_dirs = [os.path.join(out_dir, "groupcheck", "findings")]
    if os.path.isdir(part_root):
        art_dirs += [os.path.join(part_root, pid, "findings")
                     for pid in sorted(os.listdir(part_root))]
    for d in art_dirs:
        removed.extend(proto.gc(d))
    for root in (out_dir, os.path.join(out_dir, "manifests")):
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            p = os.path.join(root, name)
            if os.path.isfile(p) and (".put-" in name
                                      or name.endswith(".tmp")):
                os.remove(p)
                removed.append(p)
    return removed


def merge_run(out_dir: str, rules: TableRules,
              commit_protocol=None) -> ValidationRun:
    """Compose the global verdict purely from committed manifests.

    Folds ONLY the partitions recorded in the run-level lineage manifest
    (plus the group-check phase) and verifies each one's lineage against
    the current grouping — a manifests/ directory polluted by an earlier
    run with different partitioning cannot double-count; a missing or
    stale expected partition raises instead of silently under-counting."""
    store = ManifestStore(os.path.join(out_dir, "manifests"),
                          protocol=commit_protocol)
    run_m = store.load(RUN_MANIFEST_ID)
    if run_m is not None:
        expected = run_m.get("partition_files", {})
        cs_hash = run_m.get("constraint_hash")
        stale = [pid for pid, group in expected.items()
                 if not store.is_valid(pid, group, cs_hash)]
        if stale:
            raise ValueError(
                "merge_run: missing or lineage-stale partition manifests "
                f"{sorted(stale)} — re-run run_resumable to completion "
                "before merging")
        manifests = [store.load(pid) for pid in sorted(expected)]
        gc = store.load("_groupcheck")
        if gc is not None and gc.get("constraint_hash") == cs_hash \
                and gc.get("input_files") == run_m.get("files"):
            manifests.append(gc)
    else:  # legacy run directory without a run-level manifest
        manifests = store.all_manifests()
    colstats: dict = {}
    counts: dict = {}
    sketches: dict = {}
    schema_names: set = set()
    n_rows = 0
    for m in manifests:
        for col, cs in colstats_from_json(m.get("colstats", {})).items():
            if col in colstats:
                tgt = colstats[col]
                tgt.n_rows += cs.n_rows
                tgt.n_null += cs.n_null
                tgt.n_invalid += cs.n_invalid
                tgt.exact = tgt.exact and cs.exact
                for v, k in cs.distinct_invalid.items():
                    prev = tgt.distinct_invalid.get(v)
                    if prev is None or k < prev:
                        tgt.distinct_invalid[v] = k
            else:
                colstats[col] = cs
        for cid, c in (m.get("violation_counts") or {}).items():
            counts[cid] = counts.get(cid, 0) + int(c)
        for k, sk in sketches_from_json(m.get("sketches", {})).items():
            if k in sketches:
                sketches[k].merge(sk)
            else:
                sketches[k] = sk
        schema_names.update(m.get("schema_names", []))
        n_rows += int(m.get("n_rows", 0))

    result = build_eval_result(rules, sorted(schema_names), colstats, n_rows)
    ext_err, ext_warn, extras = extension_summaries(rules, counts, sketches,
                                                    n_rows)
    result.extension_errors.extend(ext_err)
    result.extension_warnings.extend(ext_warn)
    report = ReportCollector()
    errors, warnings = compose_validation_report(result, rules.table, report)
    run = ValidationRun(table=rules.table, eval_result=result, errors=errors,
                        warnings=warnings, report=report, colstats=colstats,
                        n_rows=n_rows,
                        extras={"sketches": sketches,
                                "violation_counts": counts, **extras})
    store.protocol.put_text(report.get_log(),
                            os.path.join(out_dir, "report.txt"))
    store.protocol.put_json(
        {**run.verdict_row(), "violation_counts": counts},
        os.path.join(out_dir, "summary.json"))
    return run
