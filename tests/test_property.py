"""Property-based parity: the vectorized Arrow kernels must agree with the
single-process pandas oracle on arbitrary cell content, for every datatype
(the reference's semantics are the contract; hypothesis hunts the edges —
whitespace variants, unicode, numeric look-alikes, token soup)."""

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from crn_meta_validate_ray.functions.checks import CompiledFieldRule
from crn_meta_validate_ray.functions.nulls import normalize_null_like
from crn_meta_validate_ray.oracle import _cell_valid, oracle_normalize
from crn_meta_validate_ray.registry import FieldRule

# cells that stress the null model, numeric parsing and token splitting
cell = st.one_of(
    st.sampled_from(["", " ", "  \t ", "NA", "nan", "NaN", "none", "None",
                     "N/A", "n/a", "null", "Na", "0", "1", "-1", "3.0",
                     "3.5", "1e3", " 7 ", "+5", "-0.0", "inf", "-inf",
                     "0x1A", "1_000", "a;b", "a; b", ";", ";;", "a;;b",
                     "A", "b", "c", "other", "2024-01-01",
                     "2024-01-01T10:00:00", "not a date"]),
    st.text(max_size=12),
)

RULES = [
    FieldRule("x", "Required", "Integer", fillnull=["unk"]),
    FieldRule("x", "Required", "Float"),
    FieldRule("x", "Required", "Enum", ["a", "b", "c"], fillnull=["NA"]),
    FieldRule("x", "Optional", "Enum", ["a", "b"], fillnull=["other"],
              allow_multi=True),
    FieldRule("x", "Required", "Regex", r"[a-z]{1,3}[0-9]*"),
    FieldRule("x", "Required", "String"),
]


@settings(max_examples=300, deadline=None)
@given(values=st.lists(cell, min_size=1, max_size=20))
def test_kernels_match_oracle_per_datatype(values):
    arr = pa.array(values, type=pa.string())
    for rule in RULES:
        kernel = CompiledFieldRule(rule)
        valid, strvals, n_null = kernel.check(arr)
        # oracle path: normalize then per-cell check
        norm = oracle_normalize(pd.DataFrame({"x": values}))["x"]
        want = _cell_valid(rule, norm.astype("string"))
        assert list(valid) == want.tolist(), (
            f"{rule.datatype} diverged on {values!r}")
        # null census identical
        assert n_null == int((norm == "NA").sum())


@settings(max_examples=200, deadline=None)
@given(values=st.lists(st.one_of(st.none(), cell), min_size=1, max_size=20))
def test_normalization_matches_oracle(values):
    got = normalize_null_like(pa.array(values, type=pa.string())).to_pylist()
    want = oracle_normalize(pd.DataFrame({"x": values}))["x"].tolist()
    assert got == want


# --- fixed-stride chunking vs SQL substr semantics (codepoints) ---

doc_text = st.one_of(
    st.text(max_size=40),
    st.text(alphabet="äöüß日本語🙂x \n", max_size=40),
    st.none(),
)


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(doc_text, min_size=1, max_size=8),
       size=st.integers(1, 9), stride=st.integers(1, 9))
def test_chunk_table_matches_substr(texts, size, stride):
    import duckdb

    from crn_meta_validate_ray.stages.chunking import chunk_table

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = chunk_table(t, text_col="text", id_col="doc_id",
                      size=size, stride=stride).to_pydict()
    want = duckdb.sql(f"""
        WITH ks AS (SELECT unnest(range(0, 64)) AS k),
        docs AS (SELECT CAST(doc_id AS BIGINT) doc_id,
                        coalesce(text,'') AS text FROM t)
        SELECT d.doc_id, ks.k AS chunk_idx,
               substr(d.text, CAST(ks.k*{stride}+1 AS BIGINT), {size}) AS c
        FROM docs d JOIN ks ON ks.k*{stride} < length(d.text)
        ORDER BY d.doc_id, chunk_idx
    """).fetchall()
    pairs = sorted(zip(got["doc_id"], got["chunk_idx"], got["chunk"]))
    assert pairs == [(r[0], r[1], r[2]) for r in want]


# --- codepoint entropy vs a per-doc Counter reference ---

@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.one_of(st.text(max_size=30),
                                st.text(alphabet="aä𝄞\n ", max_size=30),
                                st.none()),
                      min_size=1, max_size=6))
def test_char_entropy_matches_counter(texts):
    import math
    from collections import Counter

    import numpy as np

    from crn_meta_validate_ray.functions.text import char_entropy

    got = char_entropy(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        t = t or ""
        if not t:
            assert got[i] == 0.0
            continue
        c = Counter(t)
        want = -sum((n / len(t)) * math.log2(n / len(t))
                    for n in c.values())
        np.testing.assert_allclose(got[i], want, atol=1e-12)
