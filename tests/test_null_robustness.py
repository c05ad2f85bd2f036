"""Engine-vs-oracle parity on data shapes the sf fixtures never produce:
null values, null timestamps, and users outside the funnel.  Uses the
exact oracle SQL the driver runs, over a crafted events table."""

import importlib.util
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "_entry_for_tests", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.path.insert(0, "/root/repo")
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def crafted_events(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullish_sf")
    n = 400
    rng = np.random.default_rng(13)
    types = rng.choice(["click", "error", "purchase", "signup", "view"], n)
    # user 0: click-only (never enters the funnel); user 1: null ts rows;
    # scattered null values
    users = rng.integers(0, 12, n)
    types[users == 0] = "click"
    value = rng.normal(size=n)
    # real SQL NULLs, not float NaN (NaN is a value to Arrow and DuckDB)
    null_mask = rng.random(n) < 0.1
    value_arr = pa.array(
        [None if m else float(v) for m, v in zip(null_mask, value)],
        type=pa.float64())
    ts = pd.to_datetime(
        rng.integers(1_700_000_000, 1_700_900_000, n), unit="s") \
        .astype("datetime64[us]")
    ts = pd.Series(ts)
    ts[(users == 1) & (rng.random(n) < 0.5)] = pd.NaT
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": value_arr,
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _compare(entry_mod, qname, sf_dir, table="events"):
    out = entry_mod.queries()[qname](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS "
                f"FROM read_parquet('{sf_dir}/{table}.parquet')")
    want = con.sql(entry_mod.oracle_sql()[qname]).df()
    cols = sorted(out.columns)
    assert sorted(want.columns) == cols, (qname, out.columns, want.columns)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    exp = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), (qname, len(got), len(exp))
    for c in cols:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            np.testing.assert_allclose(g.astype(float), e.astype(float),
                                       atol=1e-9, err_msg=f"{qname}.{c}")
        else:
            ge, ee = g.astype("object"), e.astype("object")
            mask = ge.isna() & ee.isna()
            assert (mask | (ge == ee)).all(), (qname, c)


def test_funnel_includes_non_funnel_users(entry_mod, crafted_events,
                                          ray_session):
    _compare(entry_mod, "funnel_events", crafted_events)


def test_user_features_null_value_and_ts(entry_mod, crafted_events,
                                         ray_session):
    _compare(entry_mod, "user_features_events", crafted_events)


def test_moving_avg_null_values(entry_mod, crafted_events, ray_session):
    _compare(entry_mod, "moving_avg_events", crafted_events)


def test_rank_normalize_still_green(entry_mod, crafted_events,
                                    ray_session):
    _compare(entry_mod, "rank_normalize_events", crafted_events)


@pytest.fixture(scope="module")
def crafted_documents(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullish_docs")
    rng = np.random.default_rng(29)
    texts = []
    for i in range(120):
        r = rng.random()
        if r < 0.08:
            texts.append(None)
        elif r < 0.14:
            texts.append("")
        elif r < 0.2:
            texts.append("   ")
        elif r < 0.3:
            texts.append("äöü 日本語 🙂 " * int(rng.integers(1, 9)))
        else:
            words = rng.choice(["table", "scan", "dup", "the", "a",
                                "merge", "row"], rng.integers(1, 40))
            texts.append(" ".join(words))
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(["en", "de", None], n).tolist(),
                         pa.string()),
        "source": pa.array(rng.choice(["web", "chat"], n).tolist(),
                           pa.string()),
        "n_chars": pa.array([len(x) if x else 0 for x in texts],
                            pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", [
    "chunk_documents", "stopword_filter_documents", "entropy_documents",
    "weighted_sample_documents", "incremental_dedup_documents",
])
def test_documents_queries_null_and_unicode(entry_mod, crafted_documents,
                                            ray_session, qname):
    _compare(entry_mod, qname, crafted_documents, table="documents")
