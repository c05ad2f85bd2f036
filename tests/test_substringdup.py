"""Cross-document substring-duplication stage (stages/substringdup.py):
broadcast and keyed paths vs a per-doc pandas oracle over window STRINGS
(the hash-vs-string identity convention shared with the exact-Jaccard
stage), including overlap merging, internal repeats, short/empty docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.substringdup import (
    duplicated_window_stats)

K = 4


def _oracle(docs: dict[int, str]) -> pd.DataFrame:
    wins: dict[str, set] = {}
    per_doc = {}
    for did, text in docs.items():
        toks = (text or "").split()
        ws = [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        per_doc[did] = (toks, ws)
        for w in set(ws):
            wins.setdefault(w, set()).add(did)
    dup = {w for w, ds in wins.items() if len(ds) >= 2}
    rows = []
    for did, (toks, ws) in per_doc.items():
        marked = [i for i, w in enumerate(ws) if w in dup]
        covered = set()
        for i in marked:
            covered.update(range(i, i + K))
        rows.append({
            "doc_id": did, "n_tokens": len(toks),
            "n_windows": max(len(toks) - K + 1, 0),
            "n_dup_windows": len(marked), "dup_tokens": len(covered),
            "dup_ratio": (round(len(covered) / len(toks), 6)
                          if toks else None)})
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab, size=10))  # 10-token dup span
    docs = {}
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
        if i % 3 == 0:  # every third doc embeds the shared span
            body = body + " " + shared + " " + body
        docs[i] = body
    docs[30] = ""                      # empty doc
    docs[31] = "a b"                   # shorter than k
    docs[32] = docs[3]                 # wholesale duplicate
    docs[33] = " ".join(["x"] * 20)    # internal repeats, single doc
    docs[34] = " ".join(["x"] * 20)    # ...now cross-doc duplicated
    return docs


def _run(docs, **kw) -> pd.DataFrame:
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), type=pa.int64()),
        "text": pa.array([docs[d] for d in docs], type=pa.string()),
    })).repartition(4)
    out = duplicated_window_stats(ds, k=K, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_broadcast_matches_oracle(corpus):
    got = _run(corpus, mode="broadcast")
    want = _oracle(corpus)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity on the engineered shapes
    g = got.set_index("doc_id")
    assert g.loc[32, "dup_ratio"] == 1.0          # wholesale duplicate
    assert g.loc[33, "dup_ratio"] == 1.0          # cross-doc repeated run
    assert g.loc[30, "n_windows"] == 0
    assert pd.isna(g.loc[30, "dup_ratio"])        # empty doc: null ratio
    assert g.loc[31, "n_dup_windows"] == 0


def test_keyed_path_identical(corpus):
    pd.testing.assert_frame_equal(
        _run(corpus, mode="keyed"), _run(corpus, mode="broadcast"),
        check_dtype=False)


def test_auto_routes_to_keyed_beyond_guard(corpus):
    got = _run(corpus, mode="auto", max_broadcast_grams=1)
    pd.testing.assert_frame_equal(got, _oracle(corpus), check_dtype=False)


def test_no_duplicates_all_zero(ray_session):
    docs = {i: " ".join(f"u{i}t{j}" for j in range(10)) for i in range(6)}
    got = _run(docs, mode="broadcast")
    assert (got["n_dup_windows"] == 0).all()
    assert (got["dup_tokens"] == 0).all()


def test_string_ids_both_paths(ray_session):
    """Non-integer doc ids (e.g. conv_id strings) work on both physical
    paths and keep their type + name in the output."""
    docs = {f"c{i:03d}": ("p q r s t u v w " * 2 if i % 2 == 0
                          else f"only{i} " * 10) for i in range(8)}
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(list(docs), type=pa.string()),
        "body": pa.array(list(docs.values()), type=pa.string()),
    })).repartition(3)
    a = duplicated_window_stats(ds, text_col="body", id_col="conv_id",
                                k=K, mode="broadcast").to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    b = duplicated_window_stats(ds, text_col="body", id_col="conv_id",
                                k=K, mode="keyed").to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert list(a.columns)[0] == "conv_id"
    assert a["conv_id"].dtype == object
    ev = a[a.conv_id.isin([f"c{i:03d}" for i in range(0, 8, 2)])]
    assert (ev["dup_ratio"] == 1.0).all()  # shared text, fully covered
    assert (a.set_index("conv_id").loc["c001", "n_dup_windows"] == 0)
