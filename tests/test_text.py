"""Text-analysis kernels."""

import pyarrow as pa

from crn_meta_validate_ray.functions.text import (
    char_shingles,
    fingerprint64,
    fingerprint_md5,
    langid_features,
    quality_features,
    token_count,
    word_ngrams,
)


def test_token_count_whitespace():
    t = pa.array(["a b  c", "", None, " x "])
    assert token_count(t).to_pylist() == [3, 0, 0, 1]


def test_quality_features_shapes_and_ranges():
    t = pa.table({"text": [
        "The quick brown fox jumps over the lazy dog and runs to the hill",
        "!!! ??? ### $$$",
        "",
    ]})
    out = quality_features(t)
    assert set(out.column_names) >= {"n_chars", "n_tokens", "punct_ratio",
                                     "stopword_ratio", "quality_score"}
    rows = out.to_pylist()
    assert rows[0]["n_tokens"] == 14
    assert rows[0]["quality_score"] > rows[1]["quality_score"]
    assert 0 <= rows[2]["quality_score"] <= 1
    assert rows[1]["punct_ratio"] > 0.5


def test_langid_heuristic():
    t = pa.table({"text": [
        "the cat is on the mat and that is fine with me",
        "der Hund und die Katze sind nicht ein Problem das ist",
        "le chat est sur la table et les livres",
        "el perro y los gatos es una casa que para",
        "这是一个中文句子",
        "zzz qqq www",
    ]})
    got = langid_features(t)["lang_pred"].to_pylist()
    assert got == ["en", "de", "fr", "es", "zh", "und"]


def test_fingerprints_deterministic():
    t = pa.table({"text": ["hello", "hello", "world", None]})
    fp = fingerprint_md5(t)["fp"].to_pylist()
    assert fp[0] == fp[1] != fp[2]
    assert fp[0] == "5d41402abc4b2a76b9719d911017c592"  # md5('hello')
    f64 = fingerprint64(t)["fp64"].to_pylist()
    assert f64[0] == f64[1] != f64[2]


def test_shingles_and_ngrams():
    s1 = char_shingles("abcdefg", 5)
    s2 = char_shingles("abcdefg", 5)
    assert (s1 == s2).all() and len(s1) == 3
    assert len(char_shingles("ab", 5)) == 1
    assert len(char_shingles("", 5)) == 0
    g = word_ngrams("a b c d", 3)
    assert len(g) == 2


def test_batch_word_gram_hashes_cardinality_parity():
    import numpy as np

    """Vectorized word-n-gram sets: per-doc set sizes and all pairwise
    intersection/union sizes match the per-doc reference construction
    (values differ by design — token-hash combine vs gram-string hash)."""
    from crn_meta_validate_ray.functions.text import (batch_word_gram_hashes,
                                                      word_ngrams)
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown cat jumps over the lazy dog",
             "one two", "single", "", None, "a  b\t c d e f g"]
    g, cnt = batch_word_gram_hashes(texts, 3)
    offs = np.concatenate(([0], np.cumsum(cnt)))
    sets_new = [g[offs[i]:offs[i + 1]] for i in range(len(texts))]
    sets_old = [word_ngrams((t or ""), 3) for t in texts]
    for sn, so in zip(sets_new, sets_old):
        assert len(sn) == len(so)
        assert np.all(np.sort(sn) == sn)  # sorted unique within doc
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter_new = np.intersect1d(sets_new[i], sets_new[j],
                                       assume_unique=True).size
            inter_old = np.intersect1d(sets_old[i], sets_old[j],
                                       assume_unique=True).size
            assert inter_new == inter_old, (i, j)


def test_json_scalar_int_extraction():
    import pyarrow as pa

    from crn_meta_validate_ray.functions.text import json_scalar_int

    col = pa.array(['{"k": 69}', '{"a": 1, "k": -3}', '{"a": 2}', None,
                    '{"k": 0}'])
    got = json_scalar_int(col, "k").to_pylist()
    assert got == [69, -3, None, None, 0]


def test_deterministic_sample_mask_stable_and_sql_compatible():
    import hashlib

    import pyarrow as pa

    from crn_meta_validate_ray.functions.text import deterministic_sample_mask

    vals = [f"doc {i} text" for i in range(200)] + [None]
    col = pa.array(vals)
    m1 = deterministic_sample_mask(col, rate_pct=20)
    m2 = deterministic_sample_mask(col, rate_pct=20)
    assert (m1 == m2).all()
    # matches the documented SQL arithmetic exactly
    for v, keep in zip(vals, m1):
        h = hashlib.md5(("" if v is None else v).encode()).hexdigest()
        assert keep == (int(h[:8], 16) % 100 < 20)
    # rate in the right ballpark and monotone in rate_pct
    assert 0.05 < m1.mean() < 0.45
    m_all = deterministic_sample_mask(col, rate_pct=100)
    assert m_all.all()


def test_line_repetition_stats_matches_duckdb():
    """Gopher-style duplicate-line fraction: engine (vectorized hash +
    lexsort distinct count) vs DuckDB list_distinct over string_split."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from crn_meta_validate_ray.functions.text import line_repetition_stats

    texts = ["a\nb\na\na", "", None, "x", "same\nsame\nsame", "a\n",
             "\n\n", "one two\nthree\none two"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    s = line_repetition_stats(t)
    got = list(zip(np.asarray(s["n_lines"]).tolist(),
                   np.asarray(s["n_distinct_lines"]).tolist()))
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute("""
        SELECT len(string_split(coalesce(text,''), chr(10))),
               len(list_distinct(string_split(coalesce(text,''), chr(10))))
        FROM docs ORDER BY doc_id""").fetchall()
    assert got == [tuple(w) for w in want]


def test_label_centroids_matches_duckdb(ray_session):
    """Per-label centroid partials merge to the same element-wise means
    DuckDB computes with avg over zipped unnest."""
    import duckdb

    from crn_meta_validate_ray.pipelines.queries import (
        label_centroids_embeddings)

    sf = "/root/testdata/sf0.001"
    got = label_centroids_embeddings(sf).to_pandas() \
        .sort_values(["label", "pos"]).reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
               CAST(count(*) AS BIGINT) AS n_vecs,
               round(avg(CAST(v AS DOUBLE)), 5) AS mean_v
        FROM (SELECT label, unnest(embedding) AS v,
                     unnest(range(1, len(embedding) + 1)) AS pos
              FROM '{sf}/embeddings.parquet')
        GROUP BY label, pos ORDER BY label, pos""").df()
    assert got["label"].tolist() == want["label"].tolist()
    assert got["n_vecs"].tolist() == want["n_vecs"].tolist()
    assert (got["mean_v"] - want["mean_v"]).abs().max() < 1e-9


def test_mixture_sample_matches_direct_recompute(ray_session):
    """Weighted source-mixture sampling keeps exactly the rows whose
    md5-percent falls under the per-source rate, independent of
    partitioning."""
    import hashlib

    from crn_meta_validate_ray.pipelines.queries import (
        mixture_sample_documents)

    sf = "/root/testdata/sf0.001"
    got = set(mixture_sample_documents(sf).to_pandas()["doc_id"])
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "source"]).to_pandas()
    want = set()
    for did, src in zip(df["doc_id"], df["source"]):
        pct = int(hashlib.md5(f"mix:{did}".encode()).hexdigest()[:8],
                  16) % 100
        rate = min(10 + 5 * int(str(src)[3:]), 100)
        if pct < rate:
            want.add(did)
    assert got == want and len(want) > 0


def test_char_entropy_values():
    import numpy as np
    import pyarrow as pa

    from crn_meta_validate_ray.functions.text import char_entropy

    out = char_entropy(pa.array(["aabb", "aaaa", "", None, "abcd", "ää𝄞x"]))
    np.testing.assert_allclose(out[0], 1.0)          # two symbols 50/50
    assert out[1] == 0.0 and out[2] == 0.0 and out[3] == 0.0
    np.testing.assert_allclose(out[4], 2.0)          # four distinct of 4
    # multibyte + astral plane: 3 distinct codepoints of 4 -> 1.5 bits
    np.testing.assert_allclose(out[5], 1.5)
