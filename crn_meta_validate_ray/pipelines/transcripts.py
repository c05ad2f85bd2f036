"""Flagship pipeline: full transcript-corpus validation.

Composes every engine stage over a Parquet transcript corpus
(``turns(conv_id, turn_idx, role, text, tool, ts)`` + ``conversations``):

1. per-cell constraint pass (stateless ``map_batches`` over the full width);
2. stateful sketch stage (actor pool; HLL uniqueness, count-min vocab freq);
3. salted group checks (sequence contiguity, exact duplicates, ts-gap /
   group-size drift digests) over a **pruned narrow read** of
   (conv_id, turn_idx, ts) — the wide ``text`` column never enters the
   shuffle;
4. referential anti-join of turns.conv_id against conversations
   (broadcast when the header table is small, distinct-key shuffle
   otherwise);
5. single findings stream → verdicts + ReportCollector-parity report.

The reference's analogue is the five-step Streamlit flow (app.py:121-1086)
collapsed to its headless core (utils/validate_core.py:488-531) — see
SURVEY §3.
"""

from __future__ import annotations

import ray.data as rd

from crn_meta_validate_ray.registry import (
    ConstraintSet,
    TableRules,
    conversation_rules,
    transcript_rules,
)
from crn_meta_validate_ray.stages.groupcheck import group_check_findings
from crn_meta_validate_ray.stages.refcheck import referential_findings
from crn_meta_validate_ray.pipelines.validate_pipeline import (
    ValidationRun,
    validate_dataset,
)


# broadcast-vs-shuffle referential routing: the sorted distinct-key array
# of the target side is broadcast (object store) only while the target has
# at most this many rows; beyond it the shuffle anti-join path runs.  ONE
# constant shared by the one-shot and resumable pipelines so both make the
# same (restart-stable) placement decision.
REF_BROADCAST_MAX_TARGET = 2_000_000


def build_sketch_spec(rules: TableRules) -> tuple | None:
    """(hll_keys, cm_columns) for the fused sketch stage — the single
    source of sketch coverage shared by the one-shot and resumable
    pipelines (HLL over unique-rule keys or the locator; Count-Min over
    single-value enum columns)."""
    hll_keys = [u.columns for u in rules.unique] or (
        [rules.locator] if rules.locator else [])
    cm_cols = [r.field for r in rules.active_fields()
               if r.datatype == "Enum" and not r.allow_multi]
    return (hll_keys, cm_cols) if (hll_keys or cm_cols) else None


def build_broadcast_ref_keys(conversations_path: str, target_column: str):
    """Launch the sharded distinct-key build of the referential target as
    Ray tasks (one per file / row-group range + a small sorted-merge fold)
    and return the merge ObjectRef — callers pass it into the fused
    per-cell pass, overlapping the build with the main read."""
    import ray

    shard = ray.remote(num_cpus=1)(_shard_distinct_keys)
    merge = ray.remote(num_cpus=1)(_merge_sorted_keys)
    parts = [shard.remote(f, rgs, target_column)
             for f, rgs in _ref_key_shards(conversations_path)]
    return merge.remote(*parts)


def _ref_key_shards(path, max_shards: int = 32):
    """Split the target table into (file, row_group_indices) shards so the
    distinct-key build parallelizes: one shard per file when the table is
    multi-file, contiguous row-group ranges when it is a single file.  At
    100 TB the target is thousands of files — a single-task read of the
    whole table (the previous shape) is a serial wall."""
    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    files = sorted(pads.dataset(path, format="parquet").files)
    if len(files) != 1:
        return [(f, None) for f in files]
    f = files[0]
    n = pq.ParquetFile(f).metadata.num_row_groups
    k = max(1, min(n, max_shards))
    bounds = np.linspace(0, n, k + 1).astype(int)
    return [(f, list(range(a, b)))
            for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


def _shard_distinct_keys(path, row_groups, column: str):
    """Ray task: distinct keys of ONE shard as a sorted numpy unicode
    array (stages/refcheck.sorted_key_array) — runs in parallel across
    shards, off the driver's critical path."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.stages.refcheck import sorted_key_array

    if row_groups is None:
        t = pq.read_table(path, columns=[column])
    else:
        t = pq.ParquetFile(path).read_row_groups(row_groups,
                                                 columns=[column])
    col = pc.cast(t[column], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return sorted_key_array(pc.unique(col))


def _merge_sorted_keys(*parts):
    """Ray task: fold sorted distinct shard partials into one sorted
    distinct array.  Input size is distinct-per-shard, not rows, so the
    merge stays small even when the target table is huge."""
    import numpy as np

    parts = [p for p in parts if p.size]
    if not parts:
        return np.array([], dtype=str)
    if len(parts) == 1:
        return parts[0]
    return np.unique(np.concatenate(parts))


def validate_transcripts(
    turns_path: str | list[str],
    conversations_path: str | None = None,
    *,
    rules: TableRules | None = None,
    conv_rules: TableRules | None = None,
    mode: str = "collect",
    out_dir: str | None = None,
    batch_size: int = 8192,
    salt_every: int = 65536,
    sketches: bool = True,
    ref_mode: str = "auto",
    group_engine: str = "fused",
    validate_conversations: bool = False,
    columns: "list[str] | str | None" = None,
) -> ValidationRun:
    """Validate a transcript corpus end-to-end; returns the turns-table
    ValidationRun (conversations serve as the referential target).

    ``group_engine='fused'`` (default) computes the sequence / uniqueness /
    drift group checks from run-length partials emitted inside the fused
    per-cell pass (stages/groupfuse.py) — the wide input is read exactly
    once for everything.  ``'exchange'`` keeps the stand-alone salted
    row-level exchange (stages/groupcheck.py) off a second pruned read —
    retained for A/B verification and as the salt-explicit reference path.

    With ``validate_conversations=True`` (implied when ``conv_rules`` is
    passed explicitly) the conversations table itself is also validated
    and its verdict attached under ``extras['conversations']`` — off by
    default so the flagship turns pass pays no extra fixed overhead.

    ``columns`` prunes the main read: a list of columns, or ``'rules'`` to
    read only ``rules.referenced_columns()``.  The missing/extra-column
    verdict still sees the table's FULL schema (one metadata-only footer
    probe) — unruled columns contribute only their name, so on a wide
    table their bytes never leave storage.  Default (None) reads the full
    width, which is already minimal when every column carries a rule (the
    transcript corpus)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    rules = rules or transcript_rules()

    # ONE read for per-cell checks with the sketch stage, the broadcast
    # referential check and (group_engine='fused') the group-check partials
    # FUSED into the same map — the input is read exactly once; with
    # columns= that read is pruned to the rule-referenced projection
    full_schema_names = None
    if columns is not None:
        import pyarrow.dataset as pads
        full_schema_names = list(
            pads.dataset(turns_path, format="parquet").schema.names)
        if columns == "rules":
            read_cols = sorted(rules.referenced_columns())
        else:
            read_cols = sorted(set(columns) | rules.referenced_columns())
        read_cols = [c for c in read_cols if c in set(full_schema_names)]
        turns_full = rd.read_parquet(turns_path, columns=read_cols)
    else:
        turns_full = rd.read_parquet(turns_path)
    available = set(turns_full.schema().names)
    narrow_cols = sorted({c for s in rules.sequences
                          for c in (s.group_col, s.index_col)}
                         | {c for u in rules.unique for c in u.columns}
                         | {d.column for d in rules.drift if d.column}
                         | {d.group_col for d in rules.drift if d.group_col})
    narrow_cols = [c for c in narrow_cols if c in available]

    sketch_spec = build_sketch_spec(rules) if sketches else None

    group_fuse = None
    group_fuse_ref_splits = None
    group_fuse_num_buckets = None
    if group_engine == "fused":
        from crn_meta_validate_ray.stages.groupfuse import GroupFuseSpec
        group_fuse = GroupFuseSpec.from_rules(rules)
        if group_fuse is not None:
            # schema guard: group/index column absent → no fused group
            # checks (and no fused ref — plan_fused_ref sees None);
            # ts column absent → gap check stripped, not zero-gap noise
            group_fuse = group_fuse.for_schema(available)

    ref_rules_keys = []
    extra = []
    if conversations_path and rules.references:
        from crn_meta_validate_ray.stages.groupfuse import plan_fused_ref
        ref_col = rules.references[0]
        convs = rd.read_parquet(conversations_path,
                                columns=[ref_col.target_column])
        use_broadcast = ref_mode == "broadcast" or (
            ref_mode == "auto"
            and convs.count() <= REF_BROADCAST_MAX_TARGET)
        if use_broadcast:
            # the sorted key build runs as Ray tasks OVERLAPPING the fused
            # pass; workers block on the merge ObjectRef only until it
            # resolves, then do searchsorted membership instead of
            # rebuilding an is_in value-set index per batch
            ref_rules_keys.append((ref_col, build_broadcast_ref_keys(
                conversations_path, ref_col.target_column)))
        elif (plan := plan_fused_ref(group_fuse, ref_col,
                                     conversations_path)) is not None:
            # big-target anti-join FUSED into the gpart exchange: the FK
            # column IS the group column, so the turns side needs no read
            # at all — only the target's distinct keys travel (launched
            # now, overlapping the fused pass).  plan_fused_ref is the
            # ONE placement decision shared with the resumable pipeline.
            group_fuse, group_fuse_num_buckets, group_fuse_ref_splits = plan
        else:
            fk_cols = sorted({ref_col.column} | set(rules.locator) & available)

            def _shuffle_ref(fk_cols=fk_cols, ref_col=ref_col, convs=convs):
                fk = rd.read_parquet(turns_path, columns=fk_cols)
                return referential_findings(fk, rules,
                                            {ref_col.target_table: convs},
                                            mode="shuffle")

            extra.append(_shuffle_ref)

    if group_fuse is None and narrow_cols and group_engine != "fused":
        # passed as a thunk: the group-check exchange executes eagerly, so
        # validate_dataset runs it in a thread overlapping the fused pass.
        # (group_engine='fused' with group_fuse None means the schema
        # guard dropped the group checks — the group/index column is
        # absent and the schema-level verdict flags it; don't fall back
        # to an exchange that would fail on the same missing column)
        def _group_check(narrow_cols=narrow_cols):
            return group_check_findings(
                rd.read_parquet(turns_path, columns=narrow_cols), rules,
                salt_every=salt_every)

        extra.append(_group_check)

    run = validate_dataset(turns_full, rules, mode=mode, out_dir=out_dir,
                           batch_size=batch_size, extra_findings=extra,
                           sketch_spec=sketch_spec,
                           ref_rules_keys=ref_rules_keys,
                           group_fuse=group_fuse,
                           group_fuse_ref_splits=group_fuse_ref_splits,
                           group_fuse_num_buckets=group_fuse_num_buckets,
                           schema_names=full_schema_names)
    if conversations_path and (conv_rules is not None
                               or validate_conversations):
        cr = conv_rules or conversation_rules()
        conv_run = validate_dataset(rd.read_parquet(conversations_path), cr,
                                    batch_size=batch_size)
        run.extras["conversations"] = {
            "verdict": conv_run.verdict_row(),
            "violation_counts":
                conv_run.extras.get("violation_counts", {}),
        }
    return run


def default_constraint_set() -> ConstraintSet:
    return ConstraintSet().add(transcript_rules()).add(conversation_rules())
