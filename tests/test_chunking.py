"""Fixed-stride text chunking: window math, unicode, nulls, Dataset path."""

import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.chunking import chunk_table, chunk_text


def _chunks(texts, size, stride, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_table(t, text_col="text", id_col="doc_id",
                      size=size, stride=stride)
    return out.to_pydict()


def test_overlapping_windows():
    out = _chunks(["abcdefghij"], size=4, stride=3)
    assert out["chunk"] == ["abcd", "defg", "ghij", "j"]
    assert out["chunk_idx"] == [0, 1, 2, 3]
    assert out["chunk_len"] == [4, 4, 4, 1]


def test_exact_boundary_no_empty_tail():
    # len == k*stride exactly: no empty trailing chunk is emitted
    out = _chunks(["abcdef"], size=3, stride=3)
    assert out["chunk"] == ["abc", "def"]


def test_empty_and_null_yield_no_rows():
    out = _chunks(["", None, "ab"], size=4, stride=4)
    assert out["doc_id"] == [2]
    assert out["chunk"] == ["ab"]


def test_unicode_codepoint_windows():
    # slicing is per codepoint, not per byte (ö is 2 bytes in utf-8)
    out = _chunks(["äöüß" * 3], size=5, stride=5)
    assert out["chunk"] == ["äöüßä", "öüßäö", "üß"]
    assert out["chunk_len"] == [5, 5, 2]


def test_reconstruction_non_overlapping():
    text = "the quick brown fox jumps over the lazy dog" * 7
    out = _chunks([text], size=16, stride=16)
    assert "".join(out["chunk"]) == text


def test_dataset_multiblock(ray_session):
    texts = [f"doc-{i}-" + "x" * (i * 7 % 50) for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(5)
    out = chunk_text(ds, size=20, stride=15).to_pandas()
    # every doc is non-empty -> at least one chunk each
    assert set(out["doc_id"]) == set(range(40))
    got = out.sort_values(["doc_id", "chunk_idx"])
    for i, text in enumerate(texts):
        parts = got[got["doc_id"] == i]["chunk"].tolist()
        want = [text[k * 15:k * 15 + 20]
                for k in range((len(text) + 14) // 15)
                if k * 15 < len(text)]
        assert parts == want
