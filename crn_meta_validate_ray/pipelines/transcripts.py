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
from crn_meta_validate_ray.stages.sketch import SketchStage
from crn_meta_validate_ray.pipelines.validate_pipeline import (
    ValidationRun,
    validate_dataset,
)


def sketch_findings(ds: "rd.Dataset", rules: TableRules, *,
                    concurrency=None, batch_size: int = 32768):
    """Actor-pool sketch stage over the locator + enum columns only.

    The pool is sized to a fraction of the cluster so it can never reserve
    every CPU and starve the read/validate stages (on a 2-CPU cluster a
    fixed (2, 16) pool deadlocks the pipeline into a crawl)."""
    if concurrency is None:
        import ray
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        concurrency = (1, max(1, cpus // 2))
    hll_keys = [u.columns for u in rules.unique] or (
        [rules.locator] if rules.locator else [])
    cm_cols = [r.field for r in rules.active_fields()
               if r.datatype == "Enum" and not r.allow_multi]
    needed = sorted({c for k in hll_keys for c in k} | set(cm_cols))
    if not needed:
        return None
    narrow = ds.select_columns([c for c in needed
                                if c in (ds.schema().names or [])])
    return narrow.map_batches(
        SketchStage,
        fn_constructor_args=(rules.table,),
        fn_constructor_kwargs={"hll_keys": hll_keys, "cm_columns": cm_cols},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)


def _build_sorted_ref_keys(path, column: str):
    """Ray task: distinct target keys as a sorted numpy unicode array
    (stages/refcheck.sorted_key_array) — off the driver's critical path."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.stages.refcheck import sorted_key_array

    t = pq.read_table(path, columns=[column])
    col = pc.cast(t[column], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return sorted_key_array(pc.unique(col))


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
    validate_conversations: bool = False,
) -> ValidationRun:
    """Validate a transcript corpus end-to-end; returns the turns-table
    ValidationRun (conversations serve as the referential target).

    With ``validate_conversations=True`` (implied when ``conv_rules`` is
    passed explicitly) the conversations table itself is also validated
    and its verdict attached under ``extras['conversations']`` — off by
    default so the flagship turns pass pays no extra fixed overhead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    rules = rules or transcript_rules()

    # ONE full-width read for per-cell checks with the sketch stage and the
    # broadcast referential check FUSED into the same map (the wide `text`
    # column is read exactly once); a separate *pruned* read feeds the
    # salted group-check exchange so the shuffle never carries `text`
    turns_full = rd.read_parquet(turns_path)
    available = set(turns_full.schema().names)
    narrow_cols = sorted({c for s in rules.sequences
                          for c in (s.group_col, s.index_col)}
                         | {c for u in rules.unique for c in u.columns}
                         | {d.column for d in rules.drift if d.column}
                         | {d.group_col for d in rules.drift if d.group_col})
    narrow_cols = [c for c in narrow_cols if c in available]

    sketch_spec = None
    if sketches:
        hll_keys = [u.columns for u in rules.unique] or (
            [rules.locator] if rules.locator else [])
        cm_cols = [r.field for r in rules.active_fields()
                   if r.datatype == "Enum" and not r.allow_multi]
        if hll_keys or cm_cols:
            sketch_spec = (hll_keys, cm_cols)

    ref_rules_keys = []
    extra = []
    if conversations_path and rules.references:
        ref_col = rules.references[0]
        convs = rd.read_parquet(conversations_path,
                                columns=[ref_col.target_column])
        use_broadcast = ref_mode == "broadcast" or (
            ref_mode == "auto"
            and convs.count() <= 2_000_000)
        if use_broadcast:
            # the sorted key build (read + unique + sort, ~2.5 s serial at
            # 1.7M keys) runs as a Ray task OVERLAPPING the fused pass —
            # workers block on the ObjectRef only until it resolves;
            # workers then do searchsorted membership instead of
            # rebuilding an is_in value-set index per batch
            build = ray.remote(num_cpus=1)(_build_sorted_ref_keys)
            ref_rules_keys.append(
                (ref_col, build.remote(conversations_path,
                                       ref_col.target_column)))
        else:
            fk_cols = sorted({ref_col.column} | set(rules.locator) & available)

            def _shuffle_ref(fk_cols=fk_cols, ref_col=ref_col, convs=convs):
                fk = rd.read_parquet(turns_path, columns=fk_cols)
                return referential_findings(fk, rules,
                                            {ref_col.target_table: convs},
                                            mode="shuffle")

            extra.append(_shuffle_ref)

    if narrow_cols:
        # passed as a thunk: the group-check exchange executes eagerly, so
        # validate_dataset runs it in a thread overlapping the fused pass
        def _group_check(narrow_cols=narrow_cols):
            return group_check_findings(
                rd.read_parquet(turns_path, columns=narrow_cols), rules,
                salt_every=salt_every)

        extra.append(_group_check)

    run = validate_dataset(turns_full, rules, mode=mode, out_dir=out_dir,
                           batch_size=batch_size, extra_findings=extra,
                           sketch_spec=sketch_spec,
                           ref_rules_keys=ref_rules_keys)
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
