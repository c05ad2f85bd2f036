"""Benchmark decontamination: word n-gram overlap against an eval set."""

import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.decontam import decontaminate


@pytest.fixture(scope="module")
def corpora(ray_session):
    # eval set: two benchmark documents
    eval_t = pa.table({
        "doc_id": [1000, 1001],
        "text": ["what is the capital of france paris of course",
                 "two plus two"],  # 3 tokens -> one whole-doc gram
    })
    # train set: doc 0 leaks an eval 3-gram, doc 1 leaks the short-doc
    # whole gram, doc 2 shares tokens but no 3-gram, doc 3 is clean,
    # doc 4 is empty (no grams, never flagged)
    train_t = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "student asked what is the capital of spain yesterday",
            "answer two plus two equals four",
            "capital france paris",
            "entirely unrelated content about ray data pipelines",
            "",
        ],
    })
    return rd.from_arrow(train_t), rd.from_arrow(eval_t)


def test_decontaminate_flags_overlap(corpora):
    train, ev = corpora
    rows = {r["doc_id"]: r["n_shared_grams"]
            for r in decontaminate(train, ev).take_all()}
    # doc 0 shares "what is the", "is the capital", "the capital of"
    assert rows[0] == 3
    # doc 1 contains tokens "two plus two" contiguously -> shares the
    # whole-doc gram of eval doc 1001
    assert rows[1] == 1
    # docs 2/3 share no 3-gram; doc 4 has no grams at all
    assert set(rows) == {0, 1}


def test_decontaminate_empty_eval(corpora, ray_session):
    train, _ = corpora
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    assert decontaminate(train, empty).take_all() == []
