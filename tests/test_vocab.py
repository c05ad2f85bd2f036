"""Corpus-frequency token filtering: DF counts, stop list, reassembly."""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from crn_meta_validate_ray.stages.vocab import (remove_frequent_tokens,
                                                token_document_frequency)


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts})).repartition(3)


def test_token_df_per_doc_distinct(ray_session):
    ds = _docs(["a a b", "a c", "b b b", None])
    out = token_document_frequency(ds).to_pandas()
    df = dict(zip(out["token"], out["df"]))
    # repeats within one doc count once; null text contributes one '' token
    assert df["a"] == 2 and df["b"] == 2 and df["c"] == 1 and df[""] == 1


def test_remove_frequent_preserves_order(ray_session):
    # 'x' in 3/4 docs (75%), others rarer; threshold 0.7 -> only 'x' stops
    ds = _docs(["x p x q", "q x", "x", "p r"])
    out = remove_frequent_tokens(ds, min_df_frac=0.7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["clean_text"].tolist() == ["p q", "q", "", "p r"]
    assert out["n_kept"].tolist() == [2, 1, 0, 2]
    assert out["n_dropped"].tolist() == [2, 1, 1, 0]


def test_remove_nothing_when_threshold_unmet(ray_session):
    ds = _docs(["a b", "c d"])
    out = remove_frequent_tokens(ds, min_df_frac=0.99).to_pandas() \
        .sort_values("doc_id")
    assert out["clean_text"].tolist() == ["a b", "c d"]
    assert out["n_dropped"].sum() == 0
