"""Deterministic synthetic transcript corpus (turns + conversations).

Shape per BASELINE.json:input_hint —
``turns(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` plus a ``conversations(conv_id, n_turns,
started_ts)`` header table.  Generation is fully vectorized numpy and seeded,
so the same parameters always produce byte-identical tables (needed for the
per-turn text-equality parity checks and for resumable benchmarks).

Violation archetypes V1–V14 (FIXTURES.md) are injected at deterministic
positions; ``CorpusSpec.expected`` records exactly what was injected so tests
can assert verdicts and violation rows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, microseconds

_WORDS = np.array(
    "the quick data turn agent tool reply question answer context stream "
    "batch check value token plan result state action query".split()
)


@dataclass
class CorpusSpec:
    n_convs: int = 100
    seed: int = 42
    mean_turns: float = 12.0
    mega_conv_turns: int = 0          # V13: one conversation with this many turns
    inject: tuple = ()                # subset of {"V1",...,"V14"}
    string_typed: bool = False        # all-string staging variant (reference CSV world)
    expected: dict = field(default_factory=dict)

    def key(self) -> str:
        return (f"c{self.n_convs}_s{self.seed}_m{self.mean_turns}"
                f"_g{self.mega_conv_turns}_i{'-'.join(sorted(self.inject))}"
                f"_t{int(self.string_typed)}")


def _conv_ids(indices: np.ndarray) -> np.ndarray:
    return np.char.mod("conv_%08d", indices)


def make_corpus(spec: CorpusSpec) -> tuple[pa.Table, pa.Table, dict]:
    """Build (turns, conversations, expected) deterministically."""
    rng = np.random.default_rng(spec.seed)
    inject = set(spec.inject)
    expected: dict = {}

    sizes = np.clip(
        rng.lognormal(mean=np.log(spec.mean_turns), sigma=0.6,
                      size=spec.n_convs).astype(np.int64),
        2, None)
    if spec.mega_conv_turns and spec.n_convs > 0:
        sizes[0] = spec.mega_conv_turns
        expected["V13_mega_conv"] = "conv_00000000"

    n = int(sizes.sum())
    conv_index = np.repeat(np.arange(spec.n_convs), sizes)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int64)
    conv_id = _conv_ids(conv_index)

    # roles: turn 0 = system, then user/assistant alternating, ~15% tool
    role = np.where(turn_idx % 2 == 1, "user", "assistant").astype(object)
    role[turn_idx == 0] = "system"
    tool_rows = (rng.random(n) < 0.15) & (turn_idx > 0) & (turn_idx % 2 == 0)
    role[tool_rows] = "tool"

    tool_vocab = np.array(["search", "code", "browser", "calculator"])
    tool = np.full(n, "NA", dtype=object)
    tool[tool_rows] = tool_vocab[(conv_index[tool_rows] + turn_idx[tool_rows]) % 4]
    non_tool_named = (~tool_rows) & (rng.random(n) < 0.3)
    tool[non_tool_named] = "none"

    # deterministic pseudo-text keyed by (conv_id, turn_idx)
    h = (conv_index * 2654435761 + turn_idx * 97) % len(_WORDS)
    h2 = (conv_index * 40503 + turn_idx * 31) % len(_WORDS)
    text = np.char.add(
        np.char.add(np.char.mod("msg %s", conv_id),
                    np.char.mod(" t%04d ", turn_idx)),
        np.char.add(np.char.add(_WORDS[h], " "), _WORDS[h2])).astype(object)

    # timestamps: per-conversation base + monotone jittered gaps (2-30 s)
    gaps = (2_000_000 + (rng.random(n) * 28_000_000)).astype(np.int64)
    gaps[turn_idx == 0] = 0
    conv_base = BASE_TS_US + conv_index * 86_400_000_000
    within = np.cumsum(gaps)
    ts = conv_base + (within - within[np.repeat(starts, sizes)])

    def pick(mask: np.ndarray, k: int) -> np.ndarray:
        idxs = np.nonzero(mask)[0]
        return idxs[:: max(1, len(idxs) // k)][:k] if len(idxs) else idxs

    # ---- violation injection (deterministic positions) ----
    if "V1" in inject:  # invalid enum in role
        rows = pick((turn_idx == 2) & (conv_index % 7 == 3), 10)
        role[rows] = "operator"
        expected["V1_role_rows"] = [(conv_id[i], int(turn_idx[i])) for i in rows]
    if "V2" in inject:  # invalid multi-enum token in tool
        rows = pick((turn_idx == 4) & (conv_index % 11 == 5), 8)
        tool[rows] = "search;telepathy"
        expected["V2_tool_rows"] = [(conv_id[i], int(turn_idx[i])) for i in rows]
    if "V4" in inject:  # regex-violating conv_id (kept in headers to isolate)
        bad_convs = np.unique(conv_index[conv_index % 13 == 7])[:3]
        mask = np.isin(conv_index, bad_convs)
        conv_id = conv_id.astype(object)
        conv_id[mask] = np.char.mod("CONV-%d", conv_index[mask].astype(np.int64))
        expected["V4_bad_convs"] = sorted(set(conv_id[mask]))
    if "V5" in inject:  # whitespace-only / textual-null text cells
        rows = pick((turn_idx == 1) & (conv_index % 5 == 2), 12)
        for j, i in enumerate(rows):
            text[i] = ["", "   ", "nan", "none"][j % 4]
        expected["V5_null_text_rows"] = [(conv_id[i], int(turn_idx[i])) for i in rows]
    if "V11" in inject:  # sequence gaps: bump turn_idx by +1 from position 2
        bad_convs = np.unique(conv_index[conv_index % 17 == 9])[:4]
        mask = np.isin(conv_index, bad_convs) & (turn_idx >= 2)
        turn_idx = turn_idx.copy()
        turn_idx[mask] += 1
        expected["V11_gap_convs"] = sorted(set(_conv_ids(bad_convs)))
    if "V14" in inject:  # shifted ts-gap distribution in one conv slice
        mask = conv_index == (spec.n_convs - 1)
        ts = ts.copy()
        ts[mask] += turn_idx[mask] * 600_000_000  # +10 min per turn
        expected["V14_drift_conv"] = _conv_ids(np.array([spec.n_convs - 1]))[0]

    if "V10" in inject:  # duplicate (conv_id, turn_idx) — after idx edits so
        # the recorded expected rows match the final table
        dup_src = pick((turn_idx == 3) & (conv_index % 9 == 4), 5)
        expected["V10_dup_rows"] = [(conv_id[i], int(turn_idx[i])) for i in dup_src]
    else:
        dup_src = np.array([], dtype=np.int64)

    if len(dup_src):
        conv_id = np.concatenate([conv_id, conv_id[dup_src]])
        turn_idx = np.concatenate([turn_idx, turn_idx[dup_src]])
        role = np.concatenate([role, role[dup_src]])
        text = np.concatenate([text, text[dup_src]])
        tool = np.concatenate([tool, tool[dup_src]])
        ts = np.concatenate([ts, ts[dup_src]])

    idx_type = pa.int32() if not spec.string_typed else pa.string()
    if spec.string_typed:
        turns = pa.table({
            "conv_id": pa.array(conv_id.astype(str)),
            "turn_idx": pa.array(turn_idx.astype(str)),
            "role": pa.array(role.astype(str)),
            "text": pa.array(text.astype(str)),
            "tool": pa.array(tool.astype(str)),
            "ts": pa.array((ts // 1_000_000).astype("datetime64[s]").astype(str)),
        })
        if "V3" in inject:  # non-integer turn_idx only possible string-typed
            ti = turns["turn_idx"].to_numpy(zero_copy_only=False).astype(object)
            rows = np.nonzero((np.arange(len(ti)) % 37) == 8)[0][:6]
            for j, i in enumerate(rows):
                ti[i] = ["3.5", "three", "2.0", "1e1", " 4 ", "x9"][j % 6]
            turns = turns.set_column(1, "turn_idx", pa.array(ti, type=pa.string()))
            expected["V3_turn_idx_values"] = [str(ti[i]) for i in rows]
    else:
        turns = pa.table({
            "conv_id": pa.array(conv_id.astype(str)),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role.astype(str)),
            "text": pa.array(text.astype(str)),
            "tool": pa.array(tool.astype(str)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        })

    # conversations header — min ts / declared counts per conversation
    all_convs = np.unique(conv_id.astype(str))
    started = np.full(len(all_convs), BASE_TS_US, dtype=np.int64)
    import pandas as pd
    agg = pd.DataFrame({"c": conv_id.astype(str), "t": ts, "one": 1}) \
        .groupby("c", sort=True).agg(n=("one", "sum"), mn=("t", "min"))
    conv_tbl = pa.table({
        "conv_id": pa.array(agg.index.to_numpy().astype(str)),
        "n_turns": pa.array(agg["n"].to_numpy(), type=pa.int32()),
        "started_ts": pa.array(agg["mn"].to_numpy(), type=pa.timestamp("us")),
    })
    if "V12" in inject:  # orphan turns: drop some convs from the header
        keep_mask = ~(np.arange(conv_tbl.num_rows) % 23 == 11)
        dropped = [c for c, k in zip(agg.index, keep_mask) if not k][:5]
        drop_set = set(dropped)
        keep = pa.array([c not in drop_set for c in agg.index])
        conv_tbl = conv_tbl.filter(keep)
        expected["V12_orphan_convs"] = sorted(drop_set)

    spec.expected = expected
    return turns, conv_tbl, expected


def write_corpus(spec: CorpusSpec, out_dir: str, files: int = 4) -> dict:
    """Write the corpus as multi-file Parquet (turns sharded by conversation
    ranges → a file is a resumable partition). Returns paths + expectations."""
    turns, convs, expected = make_corpus(spec)
    turns_dir = os.path.join(out_dir, "turns")
    os.makedirs(turns_dir, exist_ok=True)
    # a re-write with fewer shards must not leave a previous corpus's extra
    # part files behind (readers glob the directory → blended corpora)
    for f in os.listdir(turns_dir):
        if f.startswith("part-") and f.endswith(".parquet"):
            os.remove(os.path.join(turns_dir, f))
    n = turns.num_rows
    # shard on row ranges aligned to conversation boundaries where possible
    bounds = np.linspace(0, n, files + 1).astype(int)
    for i in range(files):
        part = turns.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(part, os.path.join(out_dir, "turns", f"part-{i:05d}.parquet"))
    pq.write_table(convs, os.path.join(out_dir, "conversations.parquet"))
    return {"turns_dir": os.path.join(out_dir, "turns"),
            "conversations": os.path.join(out_dir, "conversations.parquet"),
            "n_turns": n, "n_convs": convs.num_rows, "expected": expected}


def cached_corpus(spec: CorpusSpec, root: str = "/tmp/crn_corpus",
                  files: int = 4) -> dict:
    """Generate-once cache keyed by the spec (used by bench + queries)."""
    out_dir = os.path.join(root, spec.key())
    marker = os.path.join(out_dir, "_DONE.json")
    import json
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    info = write_corpus(spec, out_dir, files=files)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, marker)
    return info
