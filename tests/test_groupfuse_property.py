"""Hypothesis fuzz of the fused group-check kernels (VERDICT r4 item 6):
random corpora — null group keys, empty batches, shuffled/reversed row
order across batches, gaps, dup-heavy groups, wrong starts — asserting the
map (emit_group_partials per batch) + reduce (_gpart_reduce) composition
equals a per-group pandas oracle on every violation row, and is invariant
to how rows are split into batches.  Pure kernel calls, no Ray: the
Ray-exchange parity of the same pipeline is covered by the seeded
fused-vs-exchange tests in test_groupfuse.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from crn_meta_validate_ray.stages.groupfuse import (GroupFuseSpec,
                                                    _decode_inner,
                                                    _gpart_reduce,
                                                    emit_group_partials)

SPEC = GroupFuseSpec(
    table="t", group_col="conv_id", index_col="turn_idx", ts_col="ts",
    start=0, require_contiguity=True,
    seq_cid="seq", seq_severity="error",
    uniq_cid="uniq", uniq_severity="error",
    uniq_columns=("conv_id", "turn_idx"),
    gap_metric="gap", gap_expectation=(10.0, 0.5))


@st.composite
def corpus(draw):
    """(rows, cut_fracs): rows = [(conv_id|None, turn_idx)], shuffled; the
    cuts later split them into batches (empty batches allowed)."""
    rows = []
    for _ in range(draw(st.integers(1, 5))):
        grp = f"c{draw(st.integers(0, 3))}"  # collisions merge groups
        start = draw(st.integers(0, 1))
        n = draw(st.integers(1, 10))
        idxs = list(range(start, start + n))
        if n > 2 and draw(st.booleans()):
            idxs.remove(idxs[draw(st.integers(1, n - 2))])  # gap
        for _ in range(draw(st.integers(0, 3))):  # duplicates
            idxs.append(idxs[draw(st.integers(0, len(idxs) - 1))])
        gap_s = draw(st.sampled_from([10, 30]))  # pass / outlier gaps
        rows += [(grp, i, gap_s) for i in idxs]
    for _ in range(draw(st.integers(0, 2))):  # null group keys: excluded
        rows.append((None, draw(st.integers(0, 5)), 10))
    order = draw(st.permutations(range(len(rows))))
    rows = [rows[o] for o in order]
    n_cuts = draw(st.integers(0, 4))
    cuts = sorted(draw(st.integers(0, len(rows))) for _ in range(n_cuts))
    return rows, cuts


def _table(rows):
    # ts monotone in turn_idx within a group (the transcript contract);
    # duplicate occurrences share the original turn's timestamp
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], type=pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array(
            [np.datetime64(1_700_000_000_000_000
                           + (hash(r[0]) % 97) * 10**10
                           + r[1] * r[2] * 1_000_000, "us")
             for r in rows], type=pa.timestamp("us")),
    })


def _run_fused_kernels(rows, cuts):
    bounds = [0, *cuts, len(rows)]
    inners = []
    for lo, hi in zip(bounds, bounds[1:]):
        out = emit_group_partials(SPEC, _table(rows[lo:hi]))
        for r in out.to_pylist():
            if r["kind"] == "gpart":
                inners.append(_decode_inner(r["value"]))
    if not inners:
        return set()
    reduced = _gpart_reduce(SPEC, 1, pa.concat_tables(inners))
    return {(r["constraint_id"], r["row_key"], r["value"])
            for r in reduced.to_pylist() if r["kind"] == "violation"}


def _oracle(rows):
    df = pd.DataFrame([r[:2] for r in rows if r[0] is not None],
                      columns=["conv_id", "turn_idx"])
    tbl = _table([r for r in rows if r[0] is not None])
    df["ts"] = np.asarray(tbl["ts"]).astype("datetime64[us]").astype(
        np.int64)
    want = set()
    for grp, g in df.groupby("conv_id"):
        n, uni = len(g), g["turn_idx"].nunique()
        mn, mx = int(g["turn_idx"].min()), int(g["turn_idx"].max())
        if not (mn == SPEC.start and uni == mx - SPEC.start + 1):
            want.add(("seq", grp,
                      f"n={n} distinct={uni} min={mn} max={mx}"))
        counts = g["turn_idx"].value_counts()
        for idx, c in counts[counts >= 2].items():
            want.add(("uniq", f"{grp}|{idx}", f"count={c}"))
        if n > 1:
            mean = (g["ts"].max() - g["ts"].min()) / 1e6 / (n - 1)
            expected, tol = SPEC.gap_expectation
            if abs(mean - expected) / expected > tol:
                want.add(("gap:group", grp,
                          "mean_gap_s="
                          + pd.Series([mean]).round(3).astype(str)[0]
                          + f" expected~{expected:g}"))
    return want


@settings(max_examples=120, deadline=None)
@given(data=corpus())
def test_fused_kernels_match_oracle_any_batching(data):
    rows, cuts = data
    got = _run_fused_kernels(rows, cuts)
    assert got == _oracle(rows)
    # batch-split invariance: one batch == the drawn split
    assert _run_fused_kernels(rows, []) == got
