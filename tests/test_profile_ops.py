"""Column profiling, PSI drift, and embedding quantization operators."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def test_colstats_two_phase_matches_direct(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    flags = rng.choice(["A", "N", "R"], size=4000)
    qty = rng.uniform(1, 50, size=4000)
    price = rng.uniform(900, 90000, size=4000)
    t = pa.table({"l_returnflag": flags, "l_quantity": qty,
                  "l_extendedprice": price})
    import pyarrow.parquet as pq
    pq.write_table(t, tmp_path / "lineitem.parquet")

    from crn_meta_validate_ray.pipelines.queries import colstats_lineitem
    rows = {(r["l_returnflag"], r["column"]): r
            for r in colstats_lineitem(str(tmp_path)).take_all()}
    for f in "ANR":
        m = flags == f
        for col, v in (("l_quantity", qty), ("l_extendedprice", price)):
            r = rows[(f, col)]
            assert r["n"] == int(m.sum())
            assert r["mean"] == pytest.approx(v[m].mean(), abs=1e-3)
            assert r["std"] == pytest.approx(v[m].std(), abs=1e-3)
            assert r["min_v"] == pytest.approx(v[m].min(), abs=1e-2)
            assert r["max_v"] == pytest.approx(v[m].max(), abs=1e-2)


def test_drift_psi_zero_for_identical_and_positive_for_shifted(
        ray_session, tmp_path):
    import pyarrow.parquet as pq
    rng = np.random.default_rng(5)
    n = 20000
    # 'same': both parities drawn from one distribution -> psi ~ 0
    # 'shifted': odd ids shifted by +100 -> psi large
    v_same = rng.uniform(0, 400, size=n)
    v_shift = rng.uniform(0, 300, size=n)
    ids = np.arange(n, dtype=np.int64)
    v_shift = v_shift + (ids % 2) * 100.0
    t = pa.table({
        "event_id": np.concatenate([ids, ids + n]),
        "event_type": ["same"] * n + ["shifted"] * n,
        "value": np.concatenate([v_same, v_shift]),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    from crn_meta_validate_ray.pipelines.queries import drift_psi_events
    rows = {r["event_type"]: r
            for r in drift_psi_events(str(tmp_path)).take_all()}
    assert rows["same"]["psi"] < 0.01
    assert rows["shifted"]["psi"] > 0.5
    assert rows["same"]["n_a"] + rows["same"]["n_b"] == n


def test_quantize_embeddings_exact_values(ray_session, tmp_path):
    import pyarrow.parquet as pq
    emb = pa.array([
        [1.0, -0.5, 0.25, 0.0],     # maxabs 1.0 -> q = 127, -63, 32, 0
        [0.0, 0.0, 0.0, 0.0],       # zero vector -> scale 0, all-zero q
        [-2.0, 2.0, 1.0, -1.0],     # maxabs 2.0 -> -127, 127, 64, -63
    ], type=pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": emb})
    pq.write_table(t, tmp_path / "embeddings.parquet")

    from crn_meta_validate_ray.pipelines.queries import quantize_embeddings
    rows = {r["vec_id"]: r
            for r in quantize_embeddings(str(tmp_path)).take_all()}
    # floor(x*127/ma + 0.5): -0.5*127 = -63.5 -> floor(-63.0) = -63
    assert (rows[0]["sum_q"], rows[0]["min_q"], rows[0]["max_q"]) \
        == (127 - 63 + 32 + 0, -63, 127)
    assert rows[0]["scale"] == pytest.approx(1.0 / 127, abs=1e-6)
    assert (rows[1]["sum_q"], rows[1]["scale"]) == (0, 0.0)
    assert (rows[2]["min_q"], rows[2]["max_q"]) == (-127, 127)
    assert rows[2]["sum_q"] == -127 + 127 + 64 - 63


def test_outlier_filter_flags_only_tail(ray_session, tmp_path):
    import pyarrow.parquet as pq
    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 5.0, size=5000)
    vals[:3] = [200.0, 250.0, 300.0]  # planted outliers far above 3 sigma
    t = pa.table({"event_id": np.arange(5000, dtype=np.int64),
                  "event_type": ["x"] * 5000,
                  "value": vals})
    pq.write_table(t, tmp_path / "events.parquet")

    from crn_meta_validate_ray.pipelines.queries import outlier_filter_events
    rows = outlier_filter_events(str(tmp_path)).take_all()
    got = {r["event_id"] for r in rows}
    assert {0, 1, 2} <= got
    # everything flagged must genuinely exceed the cutoff implied by the
    # planted-outlier-inflated moments; normal draws at sigma=5 stay close
    assert all(vals[i] > 115 for i in got)


def test_redact_counts_and_scrubs(ray_session, tmp_path):
    import hashlib
    import pyarrow.parquet as pq
    t = pa.table({"event_id": pa.array([0, 1, 2], pa.int64()),
                  "props": ['{"k": 5, "v": 3.25}', "no digits", None]})
    pq.write_table(t, tmp_path / "events.parquet")

    from crn_meta_validate_ray.pipelines.queries import redact_events
    rows = {r["event_id"]: r for r in redact_events(str(tmp_path)).take_all()}
    assert rows[0]["n_redacted"] == 2
    assert rows[0]["fp"] == hashlib.md5(
        b'{"k": #, "v": #}').hexdigest()
    assert rows[1]["n_redacted"] == 0
    assert rows[2]["n_redacted"] == 0
    assert rows[2]["fp"] == hashlib.md5(b"").hexdigest()


def test_tfidf_top_terms_ranking(ray_session, tmp_path):
    import pyarrow.parquet as pq
    docs = {
        0: "apple apple apple banana common common",
        1: "banana banana common common common",
        2: "cherry common",
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": list(docs.values())})
    pq.write_table(t, tmp_path / "documents.parquet")

    from crn_meta_validate_ray.pipelines.queries import (
        tfidf_top_terms_documents)
    rows = tfidf_top_terms_documents(str(tmp_path)).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # doc 0: apple tf=3 (df=1) ranks above banana/common
    assert top0[0]["term"] == "apple" and top0[0]["tf"] == 3
    assert top0[0]["df"] == 1
    # tf tie (banana tf=1, common tf=2): common has higher tf -> rank 1
    assert top0[1]["term"] == "common"
    # doc 2: cherry (df=1) beats common (df=3) on the df tiebreak at tf=1
    top2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["term"] for r in top2] == ["cherry", "common"]
    import math
    assert top2[0]["score"] == round(1 * math.log(3 / 1), 6)


def test_unigram_logprob_exact(ray_session, tmp_path):
    import math
    import pyarrow.parquet as pq
    # corpus: 6 tokens total; 'a' c=3, 'b' c=2, 'c' c=1
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["a a b", "a b c", ""]})
    pq.write_table(t, tmp_path / "documents.parquet")

    from crn_meta_validate_ray.pipelines.queries import (
        unigram_logprob_documents)
    rows = {r["doc_id"]: r
            for r in unigram_logprob_documents(str(tmp_path)).take_all()}
    la, lb, lc = (math.log(3 / 6), math.log(2 / 6), math.log(1 / 6))
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["avg_logprob"] == pytest.approx((2 * la + lb) / 3,
                                                   abs=1e-6)
    assert rows[1]["avg_logprob"] == pytest.approx((la + lb + lc) / 3,
                                                   abs=1e-6)
    assert 2 not in rows  # token-less doc has no defined mean


def test_jsonl_roundtrip_census(ray_session, tmp_path):
    import pyarrow.parquet as pq
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "lang": ["en", None, "en"],
                  "text": ["abc", "de", None]})
    pq.write_table(t, tmp_path / "documents.parquet")

    from crn_meta_validate_ray.pipelines.queries import (
        jsonl_roundtrip_documents)
    rows = {r["lang_p"]: r
            for r in jsonl_roundtrip_documents(str(tmp_path)).take_all()}
    assert rows["en"]["n_docs"] == 2 and rows["en"]["n_chars"] == 3
    assert rows["und"]["n_docs"] == 1 and rows["und"]["n_chars"] == 2


def test_compact_conserves_rows(ray_session, tmp_path):
    import pyarrow.parquet as pq
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": [f"doc {i}" for i in range(100)]})
    pq.write_table(t, tmp_path / "documents.parquet")

    from crn_meta_validate_ray.pipelines.queries import compact_documents
    row = compact_documents(str(tmp_path)).to_pylist()[0]
    assert row["rows_conserved"] and row["n_rows"] == 100
    assert row["n_files_after"] < row["n_files_before"]
