"""Driver-contract query implementations over the sandbox test tables
(`/root/testdata/sf*/`), one per operator family from SURVEY §2.

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table whose column names and types exactly match the paired oracle
SQL in ``__ray_entry__.oracle_sql`` (the driver hash-compares values after
sorting columns by name).  Float aggregate columns are rounded on both
sides to dodge summation-order ULP differences.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from crn_meta_validate_ray.stages.common import pd_to_arrow

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from crn_meta_validate_ray.registry import (
    FieldRule,
    RefRule,
    SeqRule,
    TableRules,
)
from crn_meta_validate_ray.functions.nulls import missing_mask
from crn_meta_validate_ray.functions.text import (
    STOPWORDS,
    fingerprint_md5,
    langid_features,
    quality_features,
    token_count,
)
from crn_meta_validate_ray.stages.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash_pairs,
)
from crn_meta_validate_ray.stages.groupcheck import group_check_findings
from crn_meta_validate_ray.stages.refcheck import referential_findings
from crn_meta_validate_ray.stages.similarity import (
    embedding_near_dup_pairs,
    knn_brute_force,
)
from crn_meta_validate_ray.stages.validate import BatchValidator
from crn_meta_validate_ray.stages.window import sessionize, tumbling_aggregate

EVENT_VOCAB = ["click", "view", "purchase"]  # signup/error are violations


def collect_with_schema(ds: "rd.Dataset", schema: pa.Schema) -> pa.Table:
    """Materialize a (small) possibly-empty result into an Arrow table with
    an explicit schema — an empty Ray dataset otherwise loses its schema on
    conversion, which breaks the driver's schema comparison."""
    parts = [schema.empty_table()]
    for b in ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        parts.append(b.select(schema.names).cast(schema))
    return pa.concat_tables(parts)


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------- validation

def null_census_documents(sf_dir: str):
    """Per-column missing-value census (engine null model M1) over the
    string columns of documents."""
    cols = ["text", "lang", "source"]
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        names, miss, rows = [], [], []
        for c in cols:
            m = missing_mask(t[c])
            names.append(c)
            miss.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
            rows.append(t.num_rows)
        return pa.table({"column": pa.array(names),
                         "n_missing": pa.array(miss, type=pa.int64()),
                         "n_rows": pa.array(rows, type=pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("column").aggregate(Sum("n_missing", alias_name="n_missing"),
                                     Sum("n_rows", alias_name="n_rows"))
    return out


def enum_violations_events(sf_dir: str):
    """Controlled-vocabulary violations (M5) on events.event_type."""
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "event_type"])
    vocab = pa.array(EVENT_VOCAB)

    def bad(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(t["event_type"], value_set=vocab))
        return t.filter(pc.fill_null(keep, True))

    out = ds.map_batches(bad, batch_format="pyarrow", zero_copy_batch=True)
    return collect_with_schema(out, pa.schema([
        ("event_id", pa.int64()), ("event_type", pa.string())]))


def regex_violations_customer(sf_dir: str):
    """Regex-constraint violations (M7) on customer.c_name against a
    deliberately narrow pattern so violations exist."""
    rules = TableRules(
        table="customer", locator=("c_custkey",),
        fields=[FieldRule("c_name", "Required", "Regex",
                          r"Customer#0000000[0-9]{2}")])
    ds = rd.read_parquet(_p(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"])
    findings = ds.map_batches(BatchValidator(rules), batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "violation"))
        return pa.table({
            "c_custkey": pc.cast(t["row_key"], pa.int64()),
            "c_name": t["value"],
        })

    out = findings.map_batches(project, batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string())]))


def integer_violations_lineitem(sf_dir: str):
    """Integer-coercion check (M3) applied to the float l_quantity: rows
    with a fractional quantity."""
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def bad(t: pa.Table) -> pa.Table:
        frac = pc.not_equal(pc.round(t["l_quantity"]), t["l_quantity"])
        return t.filter(pc.fill_null(frac, True))

    out = ds.map_batches(bad, batch_format="pyarrow", zero_copy_batch=True)
    return collect_with_schema(out, pa.schema([
        ("l_orderkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64())]))


def sequence_stats_lineitem(sf_dir: str):
    """Per-group sequence profile (O5/A-family): count / distinct span of
    l_linenumber per order with the contiguity verdict (start=1)."""
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber"])
    agg = ds.groupby("l_orderkey").aggregate(
        Count(alias_name="n_items"),
        Min("l_linenumber", alias_name="min_ln"),
        Max("l_linenumber", alias_name="max_ln"))

    def verdict(t: pa.Table) -> pa.Table:
        contiguous = pc.and_(
            pc.equal(t["min_ln"], 1),
            pc.equal(pc.cast(t["n_items"], pa.int64()),
                     pc.cast(t["max_ln"], pa.int64())))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "n_items": pc.cast(t["n_items"], pa.int64()),
            "min_ln": pc.cast(t["min_ln"], pa.int64()),
            "max_ln": pc.cast(t["max_ln"], pa.int64()),
            "is_contiguous": contiguous,
        })

    return agg.map_batches(verdict, batch_format="pyarrow")


def sequence_violations_lineitem(sf_dir: str):
    """Engine group-check stage (salted shuffle) on lineitem: orders whose
    l_linenumber set is not contiguous from 1."""
    rules = TableRules(
        table="lineitem", locator=("l_orderkey", "l_linenumber"),
        sequences=[SeqRule("l_orderkey", "l_linenumber", start=1)])
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber"])
    findings = group_check_findings(ds, rules, salt_every=4096)

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "violation"))
        return pa.table({"l_orderkey": pc.cast(t["row_key"], pa.int64())})

    return findings.map_batches(project, batch_format="pyarrow")


def unique_violations_lineitem(sf_dir: str):
    """Duplicate-key census (D5): (l_orderkey, l_linenumber) with count>1."""
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber"])
    agg = ds.groupby(["l_orderkey", "l_linenumber"]).aggregate(
        Count(alias_name="n"))

    def dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], 1))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(dups, batch_format="pyarrow")


def ref_orphans_orders(sf_dir: str):
    """Referential anti-join (J5), shuffle mode: orders.o_custkey values
    with no matching customer."""
    rules = TableRules(
        table="orders", locator=("o_orderkey",),
        references=[RefRule("o_custkey", "customer", "c_custkey")])
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey"])
    customer = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"])
    findings = referential_findings(orders, rules, {"customer": customer},
                                    mode="shuffle")

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "violation"))
        return pa.table({"o_custkey": pc.cast(t["value"], pa.int64())})

    out = findings.map_batches(project, batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([("o_custkey", pa.int64())]))


# ------------------------------------------------------------- relational

def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate (A1-A3 analogue) with partial aggregation
    semantics supplied by Ray's hash groupby."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    out = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"))

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.round(t["sum_qty"], 2),
            "sum_disc_price": pc.round(t["sum_disc_price"], 2),
            "avg_qty": pc.round(t["avg_qty"], 4),
            "count_order": pc.cast(t["count_order"], pa.int64()),
        })

    return out.map_batches(roundcols, batch_format="pyarrow")


def top_orders(sf_dir: str):
    """Top-10 by totalprice with deterministic tie-break (O-family)."""
    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10)

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_totalprice": pc.round(t["o_totalprice"], 2)})

    return out.map_batches(roundcols, batch_format="pyarrow")


def pivot_events(sf_dir: str):
    """Pivot (wide aggregation reshape): events per (day × event_type)
    matrix.  The distributed part is a plain two-key combiner groupby; the
    reshape happens on the already-tiny aggregated stream — never pivot
    raw rows.  Stable column set (the enum vocabulary + other) so the
    schema is deterministic."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        # ISO-string day: unambiguous across Arrow/pandas/DuckDB type maps
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"),
                          format="%Y-%m-%d")
        et = pc.fill_null(t["event_type"], "other")
        known = pc.is_in(et, value_set=pa.array(
            EVENT_VOCAB + ["signup", "error"]))
        et = pc.if_else(known, et, pa.scalar("other", pa.string()))
        return pa.table({"day": day, "event_type": et})

    import pandas as pd

    agg = ds.map_batches(derive, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["day", "event_type"]).aggregate(Count(alias_name="n"))
    df = agg.to_pandas()  # tiny: days × event types
    wide = df.pivot_table(index="day", columns="event_type", values="n",
                          aggfunc="sum", fill_value=0).reset_index()
    for c in EVENT_VOCAB + ["signup", "error"]:
        if c not in wide.columns:
            wide[c] = 0
    cols = ["day"] + sorted(EVENT_VOCAB + ["signup", "error"])
    out = wide[cols].copy()
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    out["day"] = out["day"].astype(str)
    return pd_to_arrow(out)


def distinct_counts_events(sf_dir: str):
    """Exact distinct counts done scale-shaped: per-batch unique values
    (the combiner) then a distributed drop-duplicates per column — only
    distinct values ever shuffle, never the rows."""
    from crn_meta_validate_ray.stages.common import drop_duplicate_rows
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type"])
    out_rows = []
    for col in ("user_id", "event_type"):
        uniq = ds.select_columns([col]).map_batches(
            lambda t, c=col: pa.table({c: pc.drop_null(pc.unique(
                t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray)
                else t[c]))}),  # SQL count(DISTINCT) excludes nulls
            batch_format="pyarrow", zero_copy_batch=True)
        n = drop_duplicate_rows(uniq, [col]).count()
        out_rows.append({"column": col, "n_distinct": n})
    return pa.Table.from_pylist(out_rows, schema=pa.schema(
        [("column", pa.string()), ("n_distinct", pa.int64())]))


def csv_roundtrip_events(sf_dir: str):
    """S-family driver coverage: serialize an events slice to a
    semicolon-delimited CSV, run the full ingest ladder (delimiter
    detection → structure validation → typed read), and census the result
    — oracle-compared against the source rows."""
    import tempfile

    from crn_meta_validate_ray.sources.csv_ingest import (
        detect_delimiter,
        get_row_count,
        read_csv_with_fallbacks,
        validate_structure,
    )
    # limit lives IN the plan: sort+limit executes distributed and only
    # 2000 rows reach the driver (a to_pandas-then-head here would collect
    # the whole projection)
    src = rd.read_parquet(_p(sf_dir, "events"),
                          columns=["event_id", "event_type", "value"]) \
        .sort("event_id").limit(2000).to_pandas()
    content = src.to_csv(sep=";", index=False).encode("utf-8")
    delim, confidence, _ = detect_delimiter(content)
    assert delim == ";" and confidence > 0
    assert validate_structure(content, delim).ok
    assert get_row_count(content, delim) == len(src)
    df, _enc, _engine, _errors = read_csv_with_fallbacks(content,
                                                         separator=delim)
    df["event_id"] = df["event_id"].astype("int64")
    df["value"] = df["value"].astype("float64")
    agg = df.groupby("event_type", sort=True).agg(
        n=("event_id", "size"), sum_value=("value", "sum")).reset_index()
    agg["n"] = agg["n"].astype("int64")
    agg["sum_value"] = agg["sum_value"].round(4)
    return pd_to_arrow(agg)


def top_orders_per_customer(sf_dir: str):
    """Grouped top-k WITHOUT a global sort (per-batch k-prune combiner +
    one narrow exchange): top-2 orders by totalprice per customer."""
    from crn_meta_validate_ray.stages.topk import grouped_topk
    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, keys=["o_custkey"], order_col="o_totalprice",
                       k=2, descending=True, tiebreak_col="o_orderkey")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_totalprice": pc.round(t["o_totalprice"], 2),
            "rk": pc.cast(t["rk"], pa.int64())})

    return out.map_batches(project, batch_format="pyarrow")


def _orders_by_nation(sf_dir: str, order_cols: list[str]):
    """Shared snowflake enrichment: orders → customer (size-gated join) →
    nation (broadcast), carrying ``order_cols`` off the fact table.  Zero
    shuffles on the fact side while customer fits the broadcast budget."""
    from crn_meta_validate_ray.stages.broadcast import (broadcast_lookup_join,
                                                        lookup_join_auto)
    orders = rd.read_parquet(_p(sf_dir, "orders"),
                             columns=["o_custkey"] + order_cols)
    customer = rd.read_parquet(_p(sf_dir, "customer"),
                               columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(_p(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    # customer is only conditionally small: size-gated strategy (broadcast
    # here, shuffle hash join past the object-store budget)
    enriched = lookup_join_auto(orders, customer, left_key="o_custkey",
                                right_key="c_custkey",
                                carry_cols=["c_nationkey"])
    return broadcast_lookup_join(enriched, nation, left_key="c_nationkey",
                                 right_key="n_nationkey",
                                 carry_cols=["n_name"])


def revenue_by_nation(sf_dir: str):
    """Snowflake enrichment with ZERO shuffles on the fact side: orders →
    customer (broadcast) → nation (broadcast), then a partial-aggregated
    groupby on the tiny (nation) key space."""
    enriched = _orders_by_nation(sf_dir, ["o_totalprice"])
    agg = enriched.groupby("n_name").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"))

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({"n_name": t["n_name"],
                         "revenue": pc.round(t["revenue"], 2),
                         "n_orders": pc.cast(t["n_orders"], pa.int64())})

    return agg.map_batches(roundcols, batch_format="pyarrow")


def rowcounts(sf_dir: str):
    """Row-count probe per table (S4/A6)."""
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    rows = [{"table_name": t,
             "n_rows": rd.read_parquet(_p(sf_dir, t)).count()}
            for t in tables]
    return pa.Table.from_pylist(rows)


# ------------------------------------------------------------ text / dedup

def exact_dedup_documents(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    out = exact_dedup_groups(ds)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"fp": t["fp"],
                         "keep_id": pc.cast(t["keep_id"], pa.int64()),
                         "n_docs": pc.cast(t["n_docs()"]
                                           if "n_docs()" in t.column_names
                                           else t["n_docs"], pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def substring_dup_documents(sf_dir: str):
    """Cross-document substring duplication (the suffix-array dedup
    signal of Lee et al. 2022, stride-1 k-token window construction —
    stages/substringdup.py): per-doc duplicated-span coverage stats.
    k=8 so the synthetic corpus's duplicated documents and repeated
    boilerplate both mark spans at sf scale."""
    from crn_meta_validate_ray.stages.substringdup import (
        duplicated_window_stats)
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return duplicated_window_stats(ds, k=8)


def token_stats_documents(sf_dir: str):
    """Token counting + quality-adjacent counts (whitespace tokens,
    chars, stopword hits) — all SQL-replicable."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop_pat = r"\b(?:" + "|".join(STOPWORDS) + r")\b"

    def stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(token_count(text), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_stopwords": pc.cast(
                pc.count_substring_regex(text, stop_pat), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_documents(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda t: fingerprint_md5(t).drop_columns(["text"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def quality_documents(sf_dir: str):
    """Quality-scoring stage (functions/text.py:40); float outputs rounded
    to 6 so the DuckDB oracle (same arithmetic over regexp counts) can
    hash-match despite last-ULP libm differences."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        q = quality_features(t)
        return pa.table({
            "doc_id": q["doc_id"],
            "n_chars": q["n_chars"],
            "n_tokens": q["n_tokens"],
            "punct_ratio": pc.round(q["punct_ratio"], 6),
            "stopword_ratio": pc.round(q["stopword_ratio"], 6),
            "quality_score": pc.round(q["quality_score"], 6),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def repetition_documents(sf_dir: str):
    """Gopher-style repetition quality filter: per-document duplicate-line
    fraction (functions/text.line_repetition_stats, fully vectorized), with
    the repetition verdict computed in EXACT integer arithmetic so the
    boolean hash-matches the DuckDB oracle bit-for-bit."""
    from crn_meta_validate_ray.functions.text import line_repetition_stats
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        s = line_repetition_stats(t)
        nl = np.asarray(s["n_lines"], dtype=np.int64)
        nd = np.asarray(s["n_distinct_lines"], dtype=np.int64)
        frac = (nl - nd) / np.maximum(nl, 1)
        return pa.table({
            "doc_id": s["doc_id"],
            "n_lines": s["n_lines"],
            "n_distinct_lines": s["n_distinct_lines"],
            "dup_line_frac": pc.round(pa.array(frac, type=pa.float64()), 6),
            # dup_frac > 0.3 without float compare: (nl-nd)*10 > 3*nl
            "is_repetitive": pa.array((nl - nd) * 10 > 3 * nl),
        })

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def langid_documents(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda t: langid_features(t).drop_columns(["text"]),
                          batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample_documents(sf_dir: str):
    """Weighted source-mixture sampling — the training-data mixing step:
    each source gets its own keep rate (here min(10 + 5·source_idx, 100)%)
    applied through the stable md5 Bernoulli hash on doc_id, so the same
    document lands in the same mixture regardless of partitioning, run or
    cluster size.  Map-only: the filter streams, nothing shuffles."""
    from crn_meta_validate_ray.functions.text import deterministic_hash_pct
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "source"])

    def pick(t: pa.Table) -> pa.Table:
        pct = deterministic_hash_pct(t["doc_id"], salt="mix:")
        src_num = np.asarray(pc.cast(pc.utf8_slice_codeunits(
            pc.fill_null(t["source"], "src0"), 3, 32), pa.int64())
            .to_pandas(), dtype=np.int64)
        rate = np.minimum(10 + 5 * src_num, 100)
        # null source ⇒ NULL rate in SQL ⇒ row dropped — mirror that
        keep = (pct < rate) & np.asarray(pc.is_valid(t["source"]))
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def label_centroids_embeddings(sf_dir: str):
    """Per-label centroid (element-wise mean vector, long format) — the
    k-means E-step / class-prototype building block.  Batch-local
    combiner: each batch folds its vectors into |labels|×d partial sums
    (unique + scatter-add), so only tiny (label, pos, s, n) partials cross
    the exchange; the groupby merges partials and the mean is taken on the
    merged sums.  float64 accumulation on both sides; round(5) absorbs
    summation-order ULP differences vs the DuckDB avg oracle."""
    from crn_meta_validate_ray.stages.similarity import _matrix
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, "embedding").astype(np.float64)
        if m.size == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "n": pa.array([], type=pa.int64())})
        labels = np.asarray(t["label"].to_pandas(), dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, d))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["label", "pos"]).aggregate(Sum("s", alias_name="s"),
                                             Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"], dtype=np.float64)
        n = np.asarray(t["n"], dtype=np.float64)
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "pos": pc.cast(t["pos"], pa.int64()),
            "n_vecs": pa.array(n.astype(np.int64)),
            "mean_v": pc.round(pa.array(s / n, type=pa.float64()), 5)})

    return agg.map_batches(finish, batch_format="pyarrow")


def decontam_documents(sf_dir: str):
    """Benchmark decontamination (stages/decontam.py): documents sharing a
    word 3-gram with the deterministic eval subset (doc_id % 97 == 0).
    Broadcast gram-set membership — map-only, nothing shuffles; the gram
    construction (distinct 3-grams, whole-doc gram under 3 tokens) mirrors
    the jaccard oracle CTE so the SQL intersection counts match."""
    from crn_meta_validate_ray.stages.decontam import decontaminate

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def split(pred_keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(pc.cast(t["doc_id"], pa.int64()))
            m = (ids % 97 == 0) if pred_keep_eval else (ids % 97 != 0)
            return t.filter(pa.array(m))
        return fn

    eval_ds = ds.map_batches(split(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    train_ds = ds.map_batches(split(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    return decontaminate(train_ds, eval_ds)


def corpus_prep_documents(sf_dir: str):
    """Composed training-data pipeline — the headline document flow:
    quality filter (rounded score ≥ 0.65, same arithmetic as
    quality_documents so the threshold compare is oracle-exact) →
    repetition filter (duplicate-line fraction ≤ 0.3, exact integer form)
    → exact dedup keep-first (min doc_id per md5) → token count →
    sequence packing into 1024-token bins by running offset (distributed
    prefix-sum scan).  One fused read computes all per-doc features; only
    narrow (fp, doc_id, n_tokens) rows cross the dedup exchange; the scan
    ships per-block totals only."""
    from crn_meta_validate_ray.functions.text import line_repetition_stats
    from crn_meta_validate_ray.stages.common import grouped_map
    from crn_meta_validate_ray.stages.scan import ordered_prefix_sum

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def features(t: pa.Table) -> pa.Table:
        q = quality_features(t)
        score = np.asarray(pc.round(q["quality_score"], 6))
        rep = line_repetition_stats(t)
        nl = np.asarray(rep["n_lines"], dtype=np.int64)
        nd = np.asarray(rep["n_distinct_lines"], dtype=np.int64)
        keep = (score >= 0.65) & ((nl - nd) * 10 <= 3 * nl)
        kept = fingerprint_md5(t.filter(pa.array(keep)))
        return pa.table({
            "fp": kept["fp"],
            "doc_id": pc.cast(kept["doc_id"], pa.int64()),
            "n_tokens": pc.cast(token_count(kept["text"]), pa.int64()),
        })

    narrow = ds.map_batches(features, batch_format="pyarrow",
                            zero_copy_batch=True)

    def keep_first(df):
        return (df.sort_values("doc_id", kind="stable")
                .drop_duplicates(subset=["fp"], keep="first")
                .drop(columns=["fp"]))

    kept = grouped_map(narrow, ["fp"], keep_first)
    scanned = ordered_prefix_sum(kept, "doc_id", "n_tokens",
                                 out_col="run_sum", integer=True)

    def binify(t: pa.Table) -> pa.Table:
        run = np.asarray(t["run_sum"], dtype=np.int64)
        ntok = np.asarray(t["n_tokens"], dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "bin_id": pa.array((run - ntok) // 1024)})

    return scanned.map_batches(binify, batch_format="pyarrow")


def minhash_pairs_documents(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5)


def simhash_pairs_documents(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return simhash_pairs(ds, max_distance=3)


def props_stats_events(sf_dir: str):
    """Vectorized JSON-field extraction (functions/text.json_scalar_int)
    over the events.props telemetry column, aggregated per event type."""
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        from crn_meta_validate_ray.functions.text import json_scalar_int
        k = json_scalar_int(t["props"], "k")
        return pa.table({"event_type": t["event_type"], "k": k})

    out = ds.map_batches(extract, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("k", alias_name="sum_k"), Count(alias_name="n_events"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "sum_k": pc.cast(t["sum_k"], pa.int64()),
                         "n_events": pc.cast(t["n_events"], pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def sample_documents(sf_dir: str):
    """Deterministic content-hash Bernoulli sample (20%) — stable across
    runs and cluster sizes, SQL-replicable via md5 hex arithmetic."""
    from crn_meta_validate_ray.functions.text import deterministic_sample_mask
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])

    def sample(t: pa.Table) -> pa.Table:
        keep = deterministic_sample_mask(t["text"], rate_pct=20)
        out = t.filter(pa.array(keep))
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"]})

    out = ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string())]))


def stratified_sample_documents(sf_dir: str):
    """Deterministic stratified sample: the 20 docs with the smallest
    content hash per language (a fixed-size per-stratum 'reservoir' that is
    stable across runs and cluster sizes) — grouped_topk composed over the
    md5 fingerprint, null strata kept as their own group."""
    from crn_meta_validate_ray.stages.topk import grouped_topk
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])
    withfp = ds.map_batches(
        lambda t: fingerprint_md5(t).drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(withfp, keys=["lang"], order_col="fp", k=20,
                       descending=False, tiebreak_col="doc_id")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"],
                         "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "rk": pc.cast(t["rk"], pa.int64())})

    out = out.map_batches(project, batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([
        ("lang", pa.string()), ("doc_id", pa.int64()), ("rk", pa.int64())]))


def sink_roundtrip_documents(sf_dir: str):
    """Partitioned Parquet sink (W-family): write documents hive-
    partitioned by a normalized language key, read the layout back, and
    census rows per partition — verifying the resumable-output layout
    round-trips losslessly (oracle compares against the source table)."""
    import shutil
    import tempfile

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def partcol(t: pa.Table) -> pa.Table:
        lang = pc.cast(t["lang"], pa.string())
        blank = pc.equal(pc.utf8_trim_whitespace(pc.fill_null(lang, "")), "")
        return pa.table({
            "doc_id": t["doc_id"], "n_chars": t["n_chars"],
            "lang_p": pc.if_else(blank, pa.scalar("und", pa.string()), lang)})

    out_dir = tempfile.mkdtemp(prefix="sink_roundtrip_")
    try:
        ds.map_batches(partcol, batch_format="pyarrow",
                       zero_copy_batch=True) \
            .write_parquet(out_dir, partition_cols=["lang_p"])
        back = rd.read_parquet(out_dir)
        agg = back.groupby("lang_p").aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))

        def cast(t: pa.Table) -> pa.Table:
            return pa.table({
                "lang_p": pc.cast(t["lang_p"], pa.string()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64())})

        return collect_with_schema(
            agg.map_batches(cast, batch_format="pyarrow"),
            pa.schema([("lang_p", pa.string()), ("n_docs", pa.int64()),
                       ("n_chars", pa.int64())]))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


MULTIENUM_VOCAB = ["en", "de", "fr", "es", "zh"] + [f"src{i}" for i in range(10)]


def multienum_violations_documents(sf_dir: str):
    """Multi-enum constraint (M6, reference utils/validate_core.py:277-296)
    over a derived ``lang;source`` tags column: valid iff special
    (FillNull ∪ {NA} post-normalization) or ≥1 non-empty ';'-token with
    every token in the vocabulary (src10+ sources violate)."""
    from crn_meta_validate_ray.functions.checks import CompiledFieldRule
    rule = FieldRule("tags", "Required", "Enum", MULTIENUM_VOCAB,
                     allow_multi=True)
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "lang", "source"])

    def bad(t: pa.Table) -> pa.Table:
        compiled = CompiledFieldRule(rule)
        tags = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()),
            pc.cast(t["source"], pa.string()), ";")
        valid, _, _ = compiled.check(tags)
        mask = pa.array(~valid)
        return pa.table({"doc_id": t["doc_id"].filter(mask),
                         "tags": (tags.combine_chunks()
                                  if isinstance(tags, pa.ChunkedArray)
                                  else tags).filter(mask)})

    out = ds.map_batches(bad, batch_format="pyarrow", zero_copy_batch=True)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("tags", pa.string())]))


def timestamp_violations_events(sf_dir: str):
    """Timestamp constraint (functions/checks.py Timestamp kernel) over a
    derived string column cycling valid strftime forms (with/without a
    fractional-seconds suffix), malformed values, and the sentinel —
    including the '2024-01.5-01' shape that must NOT pass fraction-strip."""
    from crn_meta_validate_ray.functions.checks import CompiledFieldRule
    rule = FieldRule("ts_str", "Required", "Timestamp")
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts"])

    def bad(t: pa.Table) -> pa.Table:
        compiled = CompiledFieldRule(rule)
        eid = pc.cast(t["event_id"], pa.int64())
        sec = pc.cast(pc.floor_temporal(t["ts"], unit="second"),
                      pa.timestamp("s"))
        m = pc.cast(pc.subtract(eid, pc.multiply(
            pc.divide(eid, pa.scalar(6, pa.int64())),
            pa.scalar(6, pa.int64()))), pa.int64())
        frac = pc.cast(pc.subtract(eid, pc.multiply(
            pc.divide(eid, pa.scalar(1000, pa.int64())),
            pa.scalar(1000, pa.int64()))), pa.string())
        forms = [
            pc.strftime(sec, format="%Y-%m-%d %H:%M:%S"),
            pc.binary_join_element_wise(
                pc.strftime(sec, format="%Y-%m-%dT%H:%M:%S"), frac, "."),
            pc.strftime(sec, format="%Y-%m-%d"),
            pc.binary_join_element_wise(
                pa.array(["ts-"] * t.num_rows), pc.cast(eid, pa.string()), ""),
        ]
        ts_str = pa.array(["NA"] * t.num_rows, type=pa.string())
        for code, form in enumerate(forms):
            ts_str = pc.if_else(pc.equal(m, code), form, ts_str)
        ts_str = pc.if_else(pc.equal(m, 4),
                            pa.scalar("2024-01.5-01", pa.string()), ts_str)
        valid, _, _ = compiled.check(ts_str)
        mask = pa.array(~valid)
        return pa.table({"event_id": eid.combine_chunks().filter(mask)
                         if isinstance(eid, pa.ChunkedArray)
                         else eid.filter(mask),
                         "ts_str": (ts_str.combine_chunks()
                                    if isinstance(ts_str, pa.ChunkedArray)
                                    else ts_str).filter(mask)})

    out = ds.map_batches(bad, batch_format="pyarrow", zero_copy_batch=True)
    return collect_with_schema(out, pa.schema([
        ("event_id", pa.int64()), ("ts_str", pa.string())]))


# ------------------------------------------------------------- similarity

def knn_embeddings(sf_dir: str):
    """Brute-force cosine top-5 for the first 3 embeddings as queries."""
    import pyarrow.parquet as pq
    head = pq.read_table(_p(sf_dir, "embeddings")).slice(0, 3)
    queries = np.asarray(head["embedding"].combine_chunks().flatten(),
                         dtype=np.float32).reshape(3, -1)
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = knn_brute_force(ds, queries, k=5)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_idx": pc.cast(t["query_idx"], pa.int64()),
            "rank": pc.cast(t["rank"], pa.int64()),
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


def near_dup_embeddings(sf_dir: str):
    """Embedding cosine near-dup pairs.  Threshold 0.465 sits mid-gap in
    the synthetic corpus's pairwise-cosine distribution at sf0.01 (pair
    cosines ...0.460, 0.467... — margin ≫ f32-vs-f64 rounding), so the
    oracle comparison checks real rows instead of an empty set."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, threshold=0.465)
    out = out.map_batches(
        lambda t: pa.table({"id_a": t["id_a"], "id_b": t["id_b"]}),
        batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64())]))


def jaccard_pairs_documents(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup pairs (inverted-index candidates
    + exact set verify) — unlike the LSH variants this is oracle-checkable:
    DuckDB replicates it with list_intersect/list_distinct arithmetic."""
    from crn_meta_validate_ray.stages.dedup import ngram_jaccard_exact_pairs
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ngram_jaccard_exact_pairs(ds, threshold=0.5, ngram=3)

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": pc.cast(t["id_a"], pa.int64()),
            "id_b": pc.cast(t["id_b"], pa.int64()),
            "jaccard": pc.round(t["jaccard"], 6)})

    out = out.map_batches(roundcols, batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("jaccard", pa.float64())]))


def dedup_clusters_documents(sf_dir: str):
    """Near-dup CLUSTER assignment — the canonical final dedup step:
    exact n-gram Jaccard pairs → distributed min-label propagation
    (stages/graph.connected_components) → (doc_id, cluster_id = min id in
    component); doc_id == cluster_id marks the keeper."""
    from crn_meta_validate_ray.stages.dedup import ngram_jaccard_exact_pairs
    from crn_meta_validate_ray.stages.graph import connected_components
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs = ngram_jaccard_exact_pairs(ds, threshold=0.5, ngram=3)
    out = connected_components(pairs)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("cluster_id", pa.int64())]))


def range_join_events(sf_dir: str):
    """Range (interval) join custom operator: for each purchase event, the
    number of click events by the same user in the preceding 24 hours."""
    from crn_meta_validate_ray.stages.rangejoin import range_join_count
    purchases = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'purchase'")
    clicks = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'click'")
    out = range_join_count(purchases, clicks, left_key="user_id",
                           right_key="user_id", left_ts="ts", right_ts="ts",
                           lo_s=-86400, hi_s=0, left_id="event_id")
    out = out.filter(expr="n_matches > 0")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["left_id"],
                         "n_clicks": t["n_matches"]})

    out = out.map_batches(project, batch_format="pyarrow")
    return collect_with_schema(out, pa.schema([
        ("event_id", pa.int64()), ("n_clicks", pa.int64())]))


def media_frame_plan(sf_dir: str):
    """Video frame-sampling fan-out plan (one row per frame to extract) —
    the flat-map plumbing for frame-level multimodal stages (rows-only)."""
    from crn_meta_validate_ray.stages.multimodal import (frame_sample_plan,
                                                         synth_media_table)
    ds = rd.from_arrow(synth_media_table(256))
    out = frame_sample_plan(ds, every_ms=500)
    return collect_with_schema(out, pa.schema([
        ("media_id", pa.int64()), ("frame_idx", pa.int32()),
        ("ts_ms", pa.int32())]))


# --------------------------------------------------------------- windows

def hopping_events(sf_dir: str):
    """Hopping (sliding) windows: 2-hour windows every 30 minutes."""
    from crn_meta_validate_ray.stages.window import hopping_aggregate
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])
    out = hopping_aggregate(ds, window_s=7200, hop_s=1800)

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": pc.cast(t["window_start"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], 4),
        })

    return out.map_batches(roundcols, batch_format="pyarrow")


def running_totals_events(sf_dir: str):
    """Per-user running count/sum in event-time order (the window-function
    analogue, no global sort; bit-identical accumulation order to SQL)."""
    from crn_meta_validate_ray.stages.window import running_aggregate
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    out = running_aggregate(ds, key_col="user_id", ts_col="ts",
                            value_col="value", id_col="event_id")

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "run_n": pc.cast(t["run_n"], pa.int64()),
            "run_sum": pc.round(t["run_sum"], 4)})

    return out.map_batches(cast, batch_format="pyarrow")


def quantiles_lineitem(sf_dir: str):
    """Exact discrete quantiles of l_quantity (bounded distinct values →
    value-counts reduction + driver fold; quantile_disc semantics)."""
    from crn_meta_validate_ray.stages.quantile import exact_quantiles
    ds = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_quantity"])
    return exact_quantiles(ds, "l_quantity", [0.25, 0.5, 0.75, 0.875])


def approx_quantile_check_lineitem(sf_dir: str):
    """t-digest approximate quantiles of the CONTINUOUS l_extendedprice
    column (the scale path exact_quantiles defers to), verified by an
    exact distributed rank count: within_tol is a data-derived statement
    (true rank of the digest's answer within q ± 3/max_centroids), so the
    constant-TRUE oracle genuinely gates the digest's error bound."""
    from crn_meta_validate_ray.stages.quantile import quantile_rank_check
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_extendedprice"])
    return quantile_rank_check(ds, "l_extendedprice",
                               [0.25, 0.5, 0.75, 0.9])


def group_approx_quantile_check_lineitem(sf_dir: str):
    """Per-group t-digest quantiles (continuous l_extendedprice per
    l_returnflag) with the exact distributed rank-error verification —
    only (group, digest) rows cross the exchange; within_tol is
    data-derived (see approx_quantile_check_lineitem)."""
    from crn_meta_validate_ray.stages.quantile import \
        group_quantile_rank_check
    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_extendedprice"])
    return group_quantile_rank_check(ds, "l_returnflag", "l_extendedprice",
                                     [0.25, 0.5, 0.9])


def registry_diff_documents(sf_dir: str):
    """Dual-registry verdict comparison (reference old-CDE toggle,
    app.py:865-932) in ONE scan: old registry (narrow lang vocab, source
    regex, integer n_chars) vs new (widened vocab, source rule dropped,
    n_chars relaxed to Float, doc_id rule added); emits per-constraint
    deltas."""
    from crn_meta_validate_ray.pipelines.validate_pipeline import \
        compare_verdicts
    from crn_meta_validate_ray.registry import FieldRule, TableRules
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "lang", "source", "n_chars"])
    old = TableRules(table="documents", locator=("doc_id",), fields=[
        FieldRule("lang", "Required", "Enum", ["en", "de", "fr"]),
        FieldRule("source", "Required", "Regex", "src[0-9]"),
        FieldRule("n_chars", "Required", "Integer"),
    ])
    new = TableRules(table="documents", locator=("doc_id",), fields=[
        FieldRule("lang", "Required", "Enum",
                  ["en", "de", "fr", "es", "zh"]),
        FieldRule("n_chars", "Required", "Float"),
        FieldRule("doc_id", "Required", "Integer"),
    ])
    return compare_verdicts(ds, old, new)


def tumbling_events(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])
    out = tumbling_aggregate(ds, window_s=3600)

    def roundcols(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], 4),
        })

    return out.map_batches(roundcols, batch_format="pyarrow")


def sessions_events(sf_dir: str):
    """Session windows per user (30-min gap): session census per user."""
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])
    sess = sessionize(ds, gap_s=1800)
    agg = sess.groupby("user_id").aggregate(
        Count(alias_name="n_sessions"),
        Sum("n_events", alias_name="n_events"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


# ------------------------------------------------ transcripts (engine-native)

def _transcript_corpus(sf_dir: str) -> dict:
    from crn_meta_validate_ray.sources.synth import CorpusSpec, cached_corpus
    sf = 0.01
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass
    n_convs = max(100, int(400_000 * sf))
    spec = CorpusSpec(
        n_convs=n_convs, seed=42,
        inject=("V1", "V2", "V4", "V5", "V10", "V11", "V12", "V14"),
        mega_conv_turns=max(2000, int(n_convs * 0.5)))
    return cached_corpus(spec, files=8)


def transcript_violations(sf_dir: str):
    """Flagship engine run on the deterministic synthetic transcript corpus
    scaled to the sf of ``sf_dir``; returns the structured violation rows."""
    from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts
    info = _transcript_corpus(sf_dir)
    run = validate_transcripts(info["turns_dir"], info["conversations"])
    out = run.violations

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"constraint_id": t["constraint_id"],
                         "column": t["column"],
                         "row_key": t["row_key"],
                         "value": t["value"]})

    return out.map_batches(project, batch_format="pyarrow")


def transcript_verdict(sf_dir: str):
    """Flagship verdict row + per-constraint violation counts."""
    from crn_meta_validate_ray.pipelines.transcripts import validate_transcripts
    info = _transcript_corpus(sf_dir)
    run = validate_transcripts(info["turns_dir"], info["conversations"])
    rows = [{"metric": "errors", "value": float(run.errors)},
            {"metric": "warnings", "value": float(run.warnings)},
            {"metric": "n_rows", "value": float(run.n_rows)}]
    for cid, n in sorted(run.extras["violation_counts"].items()):
        rows.append({"metric": f"violations:{cid}", "value": float(n)})
    return pa.Table.from_pylist(rows)


def dedup_keep_first_documents(sf_dir: str):
    """Full-row exact dedup, keeper = min doc_id per content (D5 scale
    path) — SQL-expressible via a min-id semi-join."""
    from crn_meta_validate_ray.stages.dedup import exact_dedup_keep_first
    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])
    out = exact_dedup_keep_first(ds)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string())]))


def lsh_ann_embeddings(sf_dir: str):
    """Hyperplane-LSH bucketed approximate top-k (scale path of
    knn_embeddings; recall < 1 by construction → rows-only check)."""
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.stages.similarity import lsh_ann
    head = pq.read_table(_p(sf_dir, "embeddings")).slice(0, 3)
    queries = np.asarray(head["embedding"].combine_chunks().flatten(),
                         dtype=np.float32).reshape(3, -1)
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = lsh_ann(ds, queries, k=5, n_planes=6)
    return collect_with_schema(out, pa.schema([
        ("query_idx", pa.int64()), ("rank", pa.int64()),
        ("vec_id", pa.int64()), ("score", pa.float64())]))


def media_decode_features(sf_dir: str):
    """Multimodal decode: synthetic binary media table (image rows carry
    REAL binary-PPM payloads) → actor-pool decode stage (PIL or the
    built-in pure-numpy netpbm decoder — no stub on the image path) →
    fixed-size grayscale-thumbnail features (rows-only)."""
    from crn_meta_validate_ray.stages.multimodal import (decode_media,
                                                         synth_media_table)
    ds = rd.from_arrow(synth_media_table(256))
    out = decode_media(ds, dim=8, batch_size=32)

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        feats = t["feature"]
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        flat = np.asarray(feats.flatten(), dtype=np.float64)
        s = flat.reshape(t.num_rows, -1).sum(axis=1)
        return pa.table({"media_id": t["media_id"], "kind": t["kind"],
                         "feature_sum": pa.array(np.round(s, 4))})

    return out.map_batches(project, batch_format="pyarrow")


def transcript_resumable(sf_dir: str):
    """Kill-and-resume driver check: run the partitioned pipeline limited to
    2 partitions (simulated kill), resume to completion, and emit the merged
    verdict — identical to a fresh full run by construction (rows-only)."""
    import shutil
    import tempfile

    from crn_meta_validate_ray.registry import transcript_rules
    from crn_meta_validate_ray.pipelines.resumable import run_resumable

    info = _transcript_corpus(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="resumable_q_")
    try:
        rules = transcript_rules()
        first = run_resumable(info["turns_dir"], info["conversations"],
                              out_dir, rules, max_partitions=2)
        assert first is None  # killed before completion
        run = run_resumable(info["turns_dir"], info["conversations"],
                            out_dir, rules)
        rows = [{"metric": "resumed_errors", "value": float(run.errors)},
                {"metric": "resumed_warnings", "value": float(run.warnings)},
                {"metric": "n_rows", "value": float(run.n_rows)}]
        for cid, n in sorted(run.extras["violation_counts"].items()):
            rows.append({"metric": f"violations:{cid}", "value": float(n)})
        return pa.Table.from_pylist(rows)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def asof_latest_order(sf_dir: str):
    """As-of join (custom operator): for each event, the customer's most
    recent order at or before the event time.  The right side is
    pre-aggregated to one row per (customer, date) so tie-breaking is
    deterministic on both engines."""
    from ray.data.aggregate import Max

    from crn_meta_validate_ray.stages.asof import asof_join

    events = rd.read_parquet(_p(sf_dir, "events"),
                             columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(_p(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    right = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Max("o_totalprice", alias_name="o_totalprice"))
    out = asof_join(events, right, left_key="user_id",
                    right_key="o_custkey", left_ts="ts",
                    right_ts="o_orderdate",
                    right_value_cols=["o_totalprice"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "o_orderdate": t["o_orderdate"],
            "o_totalprice": pc.round(t["o_totalprice"], 2),
        })

    return out.map_batches(project, batch_format="pyarrow")


def ivf_ann_embeddings(sf_dir: str):
    """IVF-bucketed approximate top-k (second ANN scale path; rows-only —
    recall < 1 by construction with n_probe < n_lists)."""
    import pyarrow.parquet as pq

    from crn_meta_validate_ray.stages.similarity import ivf_ann
    head = pq.read_table(_p(sf_dir, "embeddings")).slice(0, 3)
    queries = np.asarray(head["embedding"].combine_chunks().flatten(),
                         dtype=np.float32).reshape(3, -1)
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out = ivf_ann(ds, queries, k=5, n_lists=16, n_probe=4)
    return collect_with_schema(out, pa.schema([
        ("query_idx", pa.int64()), ("rank", pa.int64()),
        ("vec_id", pa.int64()), ("score", pa.float64())]))


# ------------------------------------------------------------ shuffle joins

def order_priority_revenue(sf_dir: str):
    """Large-large shuffle hash join (lineitem ⋈ orders on orderkey) with
    the per-priority aggregation FUSED into the join buckets via ``post``
    — wide joined rows never leave the reduce task; only tiny
    (priority, partial) rows reach the final groupby."""
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    lineitem = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(_p(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])

    def partial(df):
        rev = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return (df.assign(__rev=rev)
                .groupby("o_orderpriority", sort=False)
                .agg(revenue=("__rev", "sum"), n_items=("__rev", "size"))
                .reset_index())

    joined = hash_join(lineitem, orders, left_on="l_orderkey",
                       right_on="o_orderkey", post=partial)
    agg = joined.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "revenue": pc.round(t["revenue"], 2),
                         "n_items": pc.cast(t["n_items"], pa.int64())})

    return agg.map_batches(final, batch_format="pyarrow").sort(
        "o_orderpriority")


def customers_without_orders(sf_dir: str):
    """Row-level distributed anti-join: customers with no high-value
    order, both sides shuffled by the hashed key (no broadcast
    assumption); the filter is pushed before the exchange."""
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    customer = rd.read_parquet(_p(sf_dir, "customer"),
                               columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"],
    ).filter(expr="o_totalprice > 300000").select_columns(["o_custkey"])
    out = hash_join(customer, orders, left_on="c_custkey",
                    right_on="o_custkey", how="anti")
    return collect_with_schema(out.sort("c_custkey"), pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string())]))


# ------------------------------------------------- scan / shuffle (training)

def pack_documents(sf_dir: str):
    """Sequence packing for training shards: documents in doc_id order are
    assigned to fixed 1024-token-budget bins by their running token offset
    — a distributed two-phase prefix-sum scan (stages/scan.py); the driver
    folds only per-block totals."""
    from crn_meta_validate_ray.stages.scan import ordered_prefix_sum

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pc.cast(token_count(t["text"]), pa.int64()),
        })

    narrow = ds.map_batches(tok, batch_format="pyarrow",
                            zero_copy_batch=True)
    scanned = ordered_prefix_sum(narrow, "doc_id", "n_tokens",
                                 out_col="run_sum", integer=True)

    def binify(t: pa.Table) -> pa.Table:
        run = np.asarray(t["run_sum"].combine_chunks()
                         if isinstance(t["run_sum"], pa.ChunkedArray)
                         else t["run_sum"])
        ntok = np.asarray(t["n_tokens"].combine_chunks()
                          if isinstance(t["n_tokens"], pa.ChunkedArray)
                          else t["n_tokens"])
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "bin_id": pa.array((run - ntok) // 1024)})

    return scanned.map_batches(binify, batch_format="pyarrow")


def shuffle_documents(sf_dir: str):
    """Deterministic distributed shuffle (the standard sort-by-hash-key
    shuffle used for training-data randomization): md5(doc_id) ordering,
    first 200 rows.  md5 is the SQL-parity key; fingerprint64 is the
    vectorized scale-path key (cf. fingerprint_documents)."""
    import hashlib

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        ks = [hashlib.md5(str(i).encode()).hexdigest()
              for i in ids.to_pylist()]
        return pa.table({"doc_id": ids,
                         "shuffle_key": pa.array(ks, type=pa.string())})

    out = ds.map_batches(key, batch_format="pyarrow",
                         zero_copy_batch=True).sort("shuffle_key").limit(200)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("shuffle_key", pa.string())]))


def term_df_documents(sf_dir: str):
    """Corpus document-frequency (inverted-index term stats): top-20 terms
    by number of documents containing them.  Per-batch partial: lowercase →
    regex tokenize → per-doc distinct → term counts; only (term, partial)
    rows shuffle into the final groupby — the classic combiner shape."""
    import pandas as pd

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()),
                                         ""))
        lst = pc.split_pattern_regex(txt, "[^a-z0-9]+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        parent = pc.list_parent_indices(lst)
        df = pd.DataFrame({"p": np.asarray(parent),
                           "t": np.asarray(flat).astype(object)})
        df = df[df["t"] != ""].drop_duplicates()
        vc = df["t"].value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy().astype(str)),
            "df": pa.array(vc.to_numpy().astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.groupby("term").aggregate(Sum("df", alias_name="df"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"term": pc.cast(t["term"], pa.string()),
                         "df": pc.cast(t["df"], pa.int64())})

    out = agg.map_batches(cast, batch_format="pyarrow") \
        .sort(key=["df", "term"], descending=[True, False]).limit(20)
    return collect_with_schema(out, pa.schema([
        ("term", pa.string()), ("df", pa.int64())]))


def group_quantiles_lineitem(sf_dir: str):
    """Per-group exact discrete quantiles (quantile_disc semantics: value
    at 1-based rank max(ceil(q*n),1) of the sorted group) via the
    hash-bucket exchange — only (group, value) pairs shuffle."""
    import math

    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    ds = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity"])

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, sub in g.groupby("l_returnflag", sort=False):
            v = np.sort(sub["l_quantity"].to_numpy())
            n = len(v)
            rows.append({
                "l_returnflag": str(flag),
                "p50": float(v[max(math.ceil(0.5 * n), 1) - 1]),
                "p75": float(v[max(math.ceil(0.75 * n), 1) - 1]),
                "n": np.int64(n),
            })
        return pd.DataFrame(rows,
                            columns=["l_returnflag", "p50", "p75", "n"])

    out = grouped_map(ds, ["l_returnflag"], bucket)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": pc.cast(t["l_returnflag"],
                                                 pa.string()),
                         "p50": pc.cast(t["p50"], pa.float64()),
                         "p75": pc.cast(t["p75"], pa.float64()),
                         "n": pc.cast(t["n"], pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow") \
        .sort("l_returnflag")


def rollup_revenue(sf_dir: str):
    """Multi-level (ROLLUP) aggregation: revenue by (nation, priority) with
    nation subtotals and a grand total.  The base aggregate runs
    distributed (broadcast dims + partial-combined groupby); the rollup
    levels derive from that BOUNDED dimensional aggregate driver-side —
    at any data scale the rollup input is |nations|×|priorities| rows."""
    import pandas as pd

    enriched = _orders_by_nation(sf_dir, ["o_totalprice", "o_orderpriority"])
    base = enriched.groupby(["n_name", "o_orderpriority"]).aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders")).to_pandas()

    lvl1 = base.groupby("n_name", as_index=False) \
        .agg(revenue=("revenue", "sum"), n_orders=("n_orders", "sum"))
    lvl1["o_orderpriority"] = "(all)"
    total = pd.DataFrame([{
        "n_name": "(all)", "o_orderpriority": "(all)",
        "revenue": base["revenue"].sum(),
        "n_orders": base["n_orders"].sum()}])
    out = pd.concat([base, lvl1, total], ignore_index=True)
    # half-away-from-zero to match DuckDB's round() (pandas .round is
    # half-even) — same pc.round convention as every sibling query
    out["revenue"] = pc.round(pa.array(out["revenue"], type=pa.float64()),
                              2).to_numpy(zero_copy_only=False)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    cols = ["n_name", "o_orderpriority", "revenue", "n_orders"]
    return out[cols].sort_values(["n_name", "o_orderpriority"],
                                 kind="stable").reset_index(drop=True)


def colstats_lineitem(sf_dir: str):
    """Per-group column profiling (count / mean / population-std / min /
    max) over two numeric columns — the drift-baseline stats a validation
    engine records per partition.  Two-phase: each batch folds into tiny
    (group, column, n, s, ss, mn, mx) moment partials, the groupby merges
    partials (sum/min/max are associative), and the driver-free finish
    derives mean and std from merged moments.  Only |groups|×|columns|
    rows ever cross the exchange."""
    import pandas as pd

    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    cols = ["l_quantity", "l_extendedprice"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        frames = []
        for c in cols:
            g = df.groupby("l_returnflag", sort=False)[c]
            v2 = df[c] * df[c]
            ss = v2.groupby(df["l_returnflag"], sort=False).sum()
            agg = g.agg(n="size", s="sum", mn="min", mx="max")
            agg["ss"] = ss
            agg["column"] = c
            frames.append(agg.reset_index())
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "column": pa.array(out["column"], pa.string()),
            "n": pa.array(out["n"].astype(np.int64)),
            "s": pa.array(out["s"].astype(np.float64)),
            "ss": pa.array(out["ss"].astype(np.float64)),
            "mn": pa.array(out["mn"].astype(np.float64)),
            "mx": pa.array(out["mx"].astype(np.float64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["l_returnflag", "column"]).aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"), Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"))

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], dtype=np.float64)
        s = np.asarray(t["s"], dtype=np.float64)
        ss = np.asarray(t["ss"], dtype=np.float64)
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "column": t["column"],
            "n": pc.cast(t["n"], pa.int64()),
            "mean": pc.round(pa.array(mean), 4),
            "std": pc.round(pa.array(np.sqrt(var)), 4),
            "min_v": pc.round(pc.cast(t["mn"], pa.float64()), 2),
            "max_v": pc.round(pc.cast(t["mx"], pa.float64()), 2),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def drift_psi_events(sf_dir: str):
    """Two-sample distribution drift (Population Stability Index) on the
    events value column, split deterministically by event_id parity —
    the north-star's distribution-drift check as an oracle-comparable
    query.  Per-batch bincount partials over FIXED bucket edges (20 ×
    width-25 buckets, top bucket open) mean only (event_type, side,
    bucket, n) rows shuffle; PSI folds per event_type over the tiny
    merged histogram with Laplace (+1) smoothing so empty buckets are
    well-defined."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])
    n_buckets = 20

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna() & df["event_type"].notna()]
        if not len(df):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "side": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        side = (df["event_id"].to_numpy() % 2).astype(np.int64)
        bucket = np.minimum(
            np.floor(df["value"].to_numpy() / 25.0), n_buckets - 1) \
            .astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "side": side, "bucket": bucket})
        g = out.groupby(["event_type", "side", "bucket"], sort=False) \
            .size().reset_index(name="n")
        return pd_to_arrow(g)

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["event_type", "side", "bucket"]) \
        .aggregate(Sum("n", alias_name="n"))

    def psi(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            counts = np.zeros((2, n_buckets), dtype=np.float64)
            for _, r in g.iterrows():
                counts[int(r["side"]), int(r["bucket"])] = r["n"]
            tot = counts.sum(axis=1)
            p = (counts[0] + 1.0) / (tot[0] + n_buckets)
            q = (counts[1] + 1.0) / (tot[1] + n_buckets)
            rows.append({"event_type": et,
                         "n_a": np.int64(tot[0]), "n_b": np.int64(tot[1]),
                         "psi": float(np.sum((p - q) * np.log(p / q)))})
        # explicit dtypes so empty buckets union cleanly with full ones
        out = pd.DataFrame({
            "event_type": pd.Series([r["event_type"] for r in rows],
                                    dtype=object),
            "n_a": pd.Series([r["n_a"] for r in rows], dtype=np.int64),
            "n_b": pd.Series([r["n_b"] for r in rows], dtype=np.int64),
            "psi": pd.Series([r["psi"] for r in rows], dtype=np.float64)})
        out["psi"] = pc.round(pa.array(out["psi"], type=pa.float64()),
                              6).to_numpy(zero_copy_only=False)
        return out

    return grouped_map(agg, ["event_type"], psi)


def quantize_embeddings(sf_dir: str):
    """Symmetric per-vector int8 quantization (maxabs / 127 scale) — the
    embedding-compression step of a vector-index build.  Map-only and
    fully vectorized: one float64 matrix op per batch; emits the scale
    plus integer checksums (sum/min/max of the quantized vector) so the
    oracle compares exact integers rather than 64 floats per row."""
    from crn_meta_validate_ray.stages.similarity import _matrix

    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def qz(t: pa.Table) -> pa.Table:
        m = _matrix(t, "embedding").astype(np.float64)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "scale": pa.array([], pa.float64()),
                             "sum_q": pa.array([], pa.int64()),
                             "min_q": pa.array([], pa.int64()),
                             "max_q": pa.array([], pa.int64())})
        ma = np.abs(m).max(axis=1)
        safe = np.where(ma > 0, ma, 1.0)
        # elementwise (v * 127.0) / maxabs, floor(+0.5): identical IEEE op
        # order to the SQL oracle expression
        q = np.floor(m * 127.0 / safe[:, None] + 0.5)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "scale": pc.round(pa.array(ma / 127.0), 6),
            "sum_q": pa.array(q.sum(axis=1).astype(np.int64)),
            "min_q": pa.array(q.min(axis=1).astype(np.int64)),
            "max_q": pa.array(q.max(axis=1).astype(np.int64)),
        })

    return ds.map_batches(qz, batch_format="pyarrow", zero_copy_batch=True)


def transcript_conv_stats(sf_dir: str):
    """Conversation-level rollup of the transcript corpus: per conv_id the
    turn count, distinct-role count and total text chars.  The fused read
    reduces each turn to a narrow (conv_id, role, n_chars) row (text never
    leaves the scan); one hash-bucket exchange co-locates conversations
    and computes all three stats vectorized per bucket."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "role", "text"])

    def narrow(t: pa.Table) -> pa.Table:
        # drop null conv_ids: pandas groupby and SQL GROUP BY disagree on
        # the NULL group, and a null key has no conversation identity
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "role": t["role"],
            "n_chars": pc.cast(
                pc.utf8_length(pc.fill_null(t["text"], "")), pa.int64()),
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=False)
        out = g.agg(n_turns=("role", "size"),
                    n_roles=("role", "nunique"),
                    sum_chars=("n_chars", "sum")).reset_index()
        # explicit dtypes so empty buckets union cleanly with full ones
        return pd.DataFrame({
            "conv_id": out["conv_id"].astype(str),
            "n_turns": out["n_turns"].astype(np.int64),
            "n_roles": out["n_roles"].astype(np.int64),
            "sum_chars": out["sum_chars"].astype(np.int64)})

    return grouped_map(rows, ["conv_id"], stats)


def outlier_filter_events(sf_dir: str):
    """Two-pass statistical outlier filter (data-cleaning staple): pass 1
    folds per-type moment partials (n, Σx, Σx²) into a |types|-row
    aggregate; the mean + 3σ cutoffs broadcast via ``ray.put``; pass 2
    streams the table again and keeps rows above their type's cutoff.
    Nothing wide ever shuffles — the only exchange is the tiny moment
    merge.  The 3σ cutoff sits ≥0.1 value-units from every data point at
    the tested scales, so engine-vs-SQL float noise (~1e-10) cannot flip
    membership."""
    import pandas as pd

    import ray

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna() & df["event_type"].notna()]
        g = df.groupby("event_type", sort=False)["value"]
        agg = g.agg(n="size", s="sum")
        agg["ss"] = (df["value"] * df["value"]).groupby(
            df["event_type"], sort=False).sum()
        out = agg.reset_index()
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"].astype(np.int64)),
            "s": pa.array(out["s"].astype(np.float64)),
            "ss": pa.array(out["ss"].astype(np.float64))})

    stats = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss")) \
        .take_all()  # bounded: one row per event type

    cuts = {}
    for r in stats:
        mean = r["s"] / r["n"]
        std = float(np.sqrt(max(r["ss"] / r["n"] - mean * mean, 0.0)))
        cuts[r["event_type"]] = mean + 3.0 * std
    ref = ray.put(cuts)

    def flt(t: pa.Table, *, ref=ref) -> pa.Table:
        cut = ray.get(ref)
        df = t.to_pandas()
        df = df[df["value"].notna() & df["event_type"].notna()]
        c = df["event_type"].map(cut)
        keep = df[df["value"] > c]
        return pa.table({
            "event_id": pa.array(keep["event_id"].astype(np.int64)),
            "event_type": pa.array(keep["event_type"], pa.string()),
            "value": pa.array(keep["value"].astype(np.float64))})

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def redact_events(sf_dir: str):
    """Pattern-redaction stage (the PII-scrub operator shape): count and
    replace numeric literals in the props payload, fingerprinting the
    redacted string for oracle parity.  Map-only; RE2 on both sides
    (pyarrow and DuckDB) so regex semantics match exactly."""
    from crn_meta_validate_ray.functions.text import fingerprint_md5

    num_re = r"[0-9]+(?:\.[0-9]+)?"
    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "props"])

    def red(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t["props"], pa.string()), "")
        n = pc.count_substring_regex(s, num_re)
        scrubbed = pc.replace_substring_regex(s, num_re, "#")
        tab = pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                        "n_redacted": pc.cast(n, pa.int64()),
                        "scrubbed": scrubbed})
        tab = fingerprint_md5(tab, text_col="scrubbed")
        return tab.drop_columns(["scrubbed"])

    return ds.map_batches(red, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms_documents(sf_dir: str):
    """Per-document top-3 distinctive terms with tf-idf scores.  The
    document-frequency map builds via the term_df combiner (only (term,
    partial-df) rows shuffle) and broadcasts once through ``ray.put`` as
    sorted parallel arrays; the scoring pass re-tokenizes each batch
    locally and ranks by the all-integer (tf DESC, df ASC, term ASC)
    order, so ranking is engine-exact and only the reported score is
    float.  Broadcast size is bounded by vocabulary; an open-vocabulary
    corpus at scale would hash terms into a fixed-width df sketch
    instead (same pipeline shape)."""
    import pandas as pd

    import ray

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    n_docs = ds.count()

    def tokenize(t: pa.Table):
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()),
                                         ""))
        lst = pc.split_pattern_regex(txt, "[^a-z0-9]+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        return (np.asarray(pc.list_parent_indices(lst)),
                np.asarray(pc.list_flatten(lst)).astype(object))

    def df_partial(t: pa.Table) -> pa.Table:
        p, w = tokenize(t)
        df = pd.DataFrame({"p": p, "t": w})
        df = df[df["t"] != ""].drop_duplicates()
        vc = df["t"].value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy().astype(str)),
            "df": pa.array(vc.to_numpy().astype(np.int64))})

    df_tab = ds.map_batches(df_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("term").aggregate(Sum("df", alias_name="df")).to_pandas()
    order = np.argsort(df_tab["term"].to_numpy())
    terms_sorted = df_tab["term"].to_numpy().astype(object)[order]
    dfs_sorted = df_tab["df"].to_numpy().astype(np.int64)[order]
    ref = ray.put((terms_sorted, dfs_sorted))

    def score(t: pa.Table, *, ref=ref, n_docs=n_docs) -> pa.Table:
        vocab, dfv = ray.get(ref)
        p, w = tokenize(t)
        ids = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        df = pd.DataFrame({"p": p, "t": w})
        df = df[df["t"] != ""]
        tf = df.groupby(["p", "t"], sort=False).size().reset_index(name="tf")
        pos = np.searchsorted(vocab, tf["t"].to_numpy().astype(object))
        tf["df"] = dfv[pos]
        tf = tf.sort_values(["p", "tf", "df", "t"],
                            ascending=[True, False, True, True],
                            kind="stable")
        tf["rank"] = tf.groupby("p", sort=False).cumcount()
        top = tf[tf["rank"] < 3]
        sc = top["tf"].to_numpy() * np.log(
            float(n_docs) / top["df"].to_numpy())
        return pa.table({
            "doc_id": pa.array(ids[top["p"].to_numpy()]),
            "rank": pa.array(top["rank"].to_numpy().astype(np.int64)),
            "term": pa.array(top["t"].to_numpy().astype(str)),
            "tf": pa.array(top["tf"].to_numpy().astype(np.int64)),
            "df": pa.array(top["df"].to_numpy().astype(np.int64)),
            "score": pc.round(pa.array(sc, type=pa.float64()), 6)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def unigram_logprob_documents(sf_dir: str):
    """Corpus-language-model quality scoring (the CCNet/Gopher "perplexity
    filter" shape with a unigram model): pass 1 builds corpus unigram
    counts via the combiner groupby (only (term, partial-count) rows
    shuffle) and broadcasts them once as sorted arrays; pass 2 re-reads
    the corpus and scores each document by its mean token log-probability
    — one searchsorted + one bincount fold per batch, no per-doc Python.
    Broadcast size is vocabulary-bounded (hash into a fixed-width count
    sketch for open vocabularies at scale — same pipeline shape)."""
    import ray

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def tokenize(t: pa.Table):
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()),
                                         ""))
        lst = pc.split_pattern_regex(txt, "[^a-z0-9]+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        parent = np.asarray(pc.list_parent_indices(lst))
        keep = np.asarray(pc.not_equal(flat, ""))
        return parent[keep], np.asarray(flat.to_pandas(),
                                        dtype=object)[keep]

    def count_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        _, w = tokenize(t)
        vc = pd.Series(w).value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy().astype(str)),
            "c": pa.array(vc.to_numpy().astype(np.int64))})

    freq = ds.map_batches(count_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("term").aggregate(Sum("c", alias_name="c")).to_pandas()
    order = np.argsort(freq["term"].to_numpy())
    vocab = freq["term"].to_numpy().astype(object)[order]
    counts = freq["c"].to_numpy().astype(np.float64)[order]
    total = float(counts.sum())
    ref = ray.put((vocab, counts, total))

    def score(t: pa.Table, *, ref=ref) -> pa.Table:
        vocab, counts, total = ray.get(ref)
        p, w = tokenize(t)
        n = t.num_rows
        ntok = np.bincount(p, minlength=n).astype(np.int64)
        if len(w):
            pos = np.searchsorted(vocab, w)
            logp = np.log(counts[pos] / total)
            sums = np.bincount(p, weights=logp, minlength=n)
        else:
            sums = np.zeros(n, dtype=np.float64)
        keep = ntok > 0  # token-less docs have no defined mean
        ids = np.asarray(pc.cast(t["doc_id"], pa.int64()))
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_tokens": pa.array(ntok[keep]),
            "avg_logprob": pc.round(
                pa.array(sums[keep] / ntok[keep], type=pa.float64()), 6)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def transcript_role_transitions(sf_dir: str):
    """Role-transition matrix over the flagship corpus: counts of each
    (previous role → role) adjacency under the stable (conv_id, turn_idx)
    turn order — the sequence-aware rollup that validates conversational
    structure (e.g. user→assistant alternation) at corpus scale.  Narrow
    (conv_id, turn_idx, role) rows co-locate per conversation through the
    hash-bucket exchange; each bucket sorts its conversations once and
    emits per-bucket partial pair counts, so the final merge sees only
    |roles|² rows per bucket.  Duplicate-(conv, turn) rows injected by the
    corpus are full-row copies, so tie order cannot change the pair
    multiset."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA")})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        prev = df.groupby("conv_id", sort=False)["role"].shift(1)
        keep = prev.notna()
        out = pd.DataFrame({"role_a": prev[keep].to_numpy(),
                            "role_b": df["role"][keep].to_numpy()})
        g = out.groupby(["role_a", "role_b"], sort=False) \
            .size().reset_index(name="n")
        # explicit dtypes so empty buckets union cleanly with full ones
        return pd.DataFrame({"role_a": g["role_a"].astype(str),
                             "role_b": g["role_b"].astype(str),
                             "n": g["n"].astype(np.int64)})

    part = grouped_map(rows, ["conv_id"], pairs)
    agg = part.groupby(["role_a", "role_b"]) \
        .aggregate(Sum("n", alias_name="n"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"role_a": pc.cast(t["role_a"], pa.string()),
                         "role_b": pc.cast(t["role_b"], pa.string()),
                         "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(cast, batch_format="pyarrow")


def transcript_conditional(sf_dir: str):
    """Cross-column conditional constraints (CondRule) over the flagship
    corpus, evaluated inside the fused per-cell pass: conversational turns
    by user/assistant must carry text, and tool-role turns must carry a
    concrete tool value.  Emits the structured violation rows."""
    from crn_meta_validate_ray.registry import CondRule, TableRules
    from crn_meta_validate_ray.pipelines.validate_pipeline import (
        validate_dataset)

    info = _transcript_corpus(sf_dir)
    rules = TableRules(
        table="turns",
        locator=("conv_id", "turn_idx"),
        conditionals=[
            CondRule("role", ("user", "assistant"), "text"),
            CondRule("role", ("tool",), "tool"),
        ])
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role", "text",
                                  "tool"])
    run = validate_dataset(ds, rules)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"constraint_id": t["constraint_id"],
                         "column": t["column"],
                         "row_key": t["row_key"],
                         "value": t["value"]})

    return run.violations.map_batches(project, batch_format="pyarrow")


def jsonl_roundtrip_documents(sf_dir: str):
    """S-family source breadth: serialize the documents table to JSONL
    (one line-delimited JSON object per row — the dominant raw-text
    interchange format for training corpora), read it back DISTRIBUTED
    with ``ray.data.read_json``, and census per-lang counts + chars —
    oracle-compared against the parquet source.  The JSONL copy is
    sharded (8 files) so the read parallelizes like a real corpus."""
    import hashlib
    import json as _json
    import tempfile

    src = _p(sf_dir, "documents")
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"jsonl_docs_{tag}")
    if not os.path.isdir(out_dir) or not os.listdir(out_dir):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq
        t = pq.read_table(src, columns=["doc_id", "lang", "text"])
        rows = t.to_pylist()
        shards = 8
        for s in range(shards):
            with open(os.path.join(out_dir, f"part-{s}.jsonl"), "w",
                      encoding="utf-8") as fh:
                for r in rows[s::shards]:
                    fh.write(_json.dumps(r) + "\n")

    ds = rd.read_json(out_dir)

    def census(t: pa.Table) -> pa.Table:
        import pandas as pd
        lang = pc.fill_null(pc.cast(t["lang"], pa.string()), "und")
        nch = pc.utf8_length(pc.fill_null(pc.cast(t["text"], pa.string()),
                                          ""))
        df = pd.DataFrame({"lang_p": np.asarray(lang).astype(object),
                           "n_chars": np.asarray(nch, dtype=np.int64)})
        g = df.groupby("lang_p", sort=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum")) \
            .reset_index()
        return pd_to_arrow(g)

    agg = ds.map_batches(census, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("lang_p").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("n_chars", alias_name="n_chars"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"lang_p": pc.cast(t["lang_p"], pa.string()),
                         "n_docs": pc.cast(t["n_docs"], pa.int64()),
                         "n_chars": pc.cast(t["n_chars"], pa.int64())})

    return agg.map_batches(cast, batch_format="pyarrow")


def compact_documents(sf_dir: str):
    """Operational small-file compaction: a corpus fragmented into many
    tiny parquet files (the classic post-ingest state at 100 TB) is
    rewritten into target-size output files via a streaming repartition —
    no shuffle, no driver materialization.  Returns the before/after file
    census + row conservation so the driver verifies losslessness."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    src = _p(sf_dir, "documents")
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    frag_dir = os.path.join(tempfile.gettempdir(), f"frag_docs_{tag}")
    if not os.path.isdir(frag_dir) or not os.listdir(frag_dir):
        os.makedirs(frag_dir, exist_ok=True)
        t = pq.read_table(src)
        shards = 64  # deliberately over-fragmented
        for s in range(shards):
            pq.write_table(t.slice(s * t.num_rows // shards,
                                   (s + 1) * t.num_rows // shards
                                   - s * t.num_rows // shards),
                           os.path.join(frag_dir, f"tiny-{s:04d}.parquet"))

    out_dir = os.path.join(tempfile.gettempdir(), f"compact_docs_{tag}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = rd.read_parquet(frag_dir)
    n_before_files = len(os.listdir(frag_dir))
    # coalesce WITHOUT a shuffle: blocks merge locally to the target count
    ds.repartition(4, shuffle=False).write_parquet(out_dir)

    n_after_files = len([f for f in os.listdir(out_dir)
                         if f.endswith(".parquet")])
    n_rows_out = rd.read_parquet(out_dir).count()
    n_rows_in = pq.read_metadata(src).num_rows
    return pa.table({
        "n_files_before": pa.array([n_before_files], pa.int64()),
        "n_files_after": pa.array([n_after_files], pa.int64()),
        "rows_conserved": pa.array([n_rows_out == n_rows_in]),
        "n_rows": pa.array([n_rows_out], pa.int64()),
    })


def chunk_documents(sf_dir: str):
    """Fixed-stride character chunking (size=256, stride=192 — overlapping
    context windows) over documents.text: the standard pre-embedding /
    retrieval-indexing chunk step.  One-to-many vectorized map_batches,
    no shuffle (stages/chunking.py)."""
    from crn_meta_validate_ray.stages.chunking import chunk_text

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return chunk_text(ds, size=256, stride=192)


def flatten_turns(ds: "rd.Dataset") -> "rd.Dataset":
    """Turns -> training documents: flatten each conversation to one text
    blob ("role: text" lines joined under stable (turn_idx, line) order —
    the per-turn text-equality invariant of the north rule, exercised as
    an output op).  One hash-bucket exchange co-locates conversations;
    the wide text column crosses the wire exactly once (inherent: the
    output IS the text), then each bucket sorts + joins vectorized.
    Duplicate turn_idx rows (injected V-violations) are tie-broken by the
    rendered line so engine and SQL agree deterministically; null
    turn_idx sorts last in both (pandas na_position / SQL NULLS LAST)."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        line = pc.binary_join_element_wise(
            pc.fill_null(pc.cast(t["role"], pa.string()), "NA"),
            pc.fill_null(pc.cast(t["text"], pa.string()), ""), ": ")
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "line": line,
        })

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def flatten(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series(dtype=str),
                "n_turns": pd.Series(dtype=np.int64),
                "conv_text": pd.Series(dtype=str),
                "n_chars": pd.Series(dtype=np.int64)})
        df = df.sort_values(["conv_id", "turn_idx", "line"],
                            kind="stable", na_position="last")
        g = df.groupby("conv_id", sort=False)
        out = g.agg(n_turns=("line", "size"),
                    conv_text=("line", "\n".join)).reset_index()
        return pd.DataFrame({
            "conv_id": out["conv_id"].astype(str),
            "n_turns": out["n_turns"].astype(np.int64),
            "conv_text": out["conv_text"].astype(str),
            "n_chars": out["conv_text"].str.len().astype(np.int64)})

    return grouped_map(rows, ["conv_id"], flatten)


def transcript_flatten(sf_dir: str):
    """Flatten the transcript corpus to one training document per
    conversation (see ``flatten_turns``)."""
    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role", "text"])
    return flatten_turns(ds)


def stopword_filter_documents(sf_dir: str):
    """Corpus-DF-driven stop-token removal (C4-boilerplate shape at token
    granularity — see stages/vocab.py): tokens present in >=78% of
    documents are stripped map-only after a combiner DF pass + one small
    broadcast."""
    from crn_meta_validate_ray.stages.vocab import remove_frequent_tokens

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return remove_frequent_tokens(ds, min_df_frac=0.78)


def incremental_dedup_documents(sf_dir: str):
    """Incremental dedup of a new batch against a corpus snapshot via the
    distributed Bloom filter (stages/bloom.py): snapshot -> bitmap ->
    broadcast -> map-only probe; only Bloom candidates pay the exact
    anti-join.  The new batch is derived in-query: 40% verbatim copies of
    snapshot docs (must drop) + 30% edit-perturbed docs (must survive)."""
    from crn_meta_validate_ray.stages.bloom import incremental_dedup

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "text": pc.fill_null(pc.cast(t["text"], pa.string()), "")})

    snap = ds.map_batches(norm, batch_format="pyarrow",
                          zero_copy_batch=True)

    def copies(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        m = np.asarray(ids) % 10 < 4
        sub = t.filter(pa.array(m))
        return pa.table({
            "doc_id": pc.add(pc.cast(sub["doc_id"], pa.int64()),
                             pa.scalar(10000, pa.int64())),
            "text": sub["text"]})

    def edits(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        m = np.asarray(ids) % 10 >= 7
        sub = t.filter(pa.array(m))
        return pa.table({
            "doc_id": pc.add(pc.cast(sub["doc_id"], pa.int64()),
                             pa.scalar(20000, pa.int64())),
            "text": pc.binary_join_element_wise(
                sub["text"], pa.scalar(" <edit>", pa.string()), "")})

    new_batch = snap.map_batches(copies, batch_format="pyarrow") \
        .union(snap.map_batches(edits, batch_format="pyarrow"))
    return incremental_dedup(new_batch, snap, key_col="text")


def covariance_embeddings(sf_dir: str):
    """Embedding covariance matrix (whitening / PCA precursor) via the
    augmented-moment scatter-add (stages/linalg.py): one Gram matmul per
    batch, only (d+1)^2 scalars per batch cross the exchange."""
    from crn_meta_validate_ray.stages.linalg import covariance

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding"])
    return covariance(ds)


def rank_normalize_events(sf_dir: str):
    """Percent-rank feature normalization (rank transform): every value
    mapped to its global quantile position — the distribution-free
    normalization used for heavy-tailed features.  Fully distributed
    composition of existing primitives: per-batch value-count partials ->
    small (value, count) groupby -> ordered_prefix_sum over distinct
    values (rank_lt = run_sum - count) -> hash_join back to rows.  Only
    distinct values cross the scan + join exchanges; pr = rank_lt/(n-1)
    is integer division on both sides, so parity is exact (no rounding)."""
    import pandas as pd

    from crn_meta_validate_ray.stages.scan import ordered_prefix_sum
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "value"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": pc.cast(t["value"], pa.float64())})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def vc_partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"].to_pandas(), dtype=np.float64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    counts = rows.map_batches(vc_partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("cnt", alias_name="cnt"))

    def cast_counts(t: pa.Table) -> pa.Table:
        return pa.table({"value": pc.cast(t["value"], pa.float64()),
                         "cnt": pc.cast(t["cnt"], pa.int64())})

    # materialize the (distinct value, count) scan output — bounded by
    # value cardinality, not row count — so deriving n from it does not
    # re-execute the pipeline, and the big table is scanned only twice
    # (value-count pass + join probe), never for a bare count()
    scanned = ordered_prefix_sum(
        counts.map_batches(cast_counts, batch_format="pyarrow"),
        "value", "cnt", out_col="run", integer=True).materialize()
    n = int(scanned.max("run") or 0)

    def to_rank(t: pa.Table) -> pa.Table:
        run = np.asarray(t["run"].to_pandas(), dtype=np.int64)
        cnt = np.asarray(t["cnt"].to_pandas(), dtype=np.int64)
        return pa.table({"value": t["value"],
                         "rank_lt": pa.array(run - cnt)})

    ranks = scanned.map_batches(to_rank, batch_format="pyarrow")
    joined = hash_join(rows, ranks, left_on="value",
                       validate_unique_right=True)

    def finish(t: pa.Table) -> pa.Table:
        rl = np.asarray(t["rank_lt"].to_pandas(), dtype=np.float64)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": pc.cast(t["value"], pa.float64()),
            "rank_lt": pc.cast(t["rank_lt"], pa.int64()),
            "pr": pa.array(rl / max(n - 1, 1)),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def _lag_turns(df, carry=()):
    """Shared ordered-lag primitive for per-conversation sequence ops:
    stable-sort by (conv_id, turn_idx, role) — the exact ordering every
    transcript oracle window uses — and return (sorted df, prev_role,
    {col: prev_col for carry}).  Keeping the tie-ordering in ONE place
    keeps engine/SQL lag() parity maintainable."""
    df = df.sort_values(["conv_id", "turn_idx", "role"], kind="stable",
                        na_position="last")
    g = df.groupby("conv_id", sort=False)
    prev_role = g["role"].shift(1)
    shifted = {c: g[c].shift(1) for c in carry}
    return df, prev_role, shifted


def extract_pairs(ds: "rd.Dataset") -> "rd.Dataset":
    """(user prompt -> assistant response) pair extraction — the
    canonical SFT-training-pair op over transcripts.  Same co-located
    ordered-sequence machinery as transcript_role_transitions: narrow
    (conv_id, turn_idx, role, text) rows through one hash-bucket
    exchange; per bucket a stable (turn_idx, role, text) sort + group
    shift, emitting a pair wherever a user turn immediately precedes an
    assistant turn.  Corpus-injected duplicate turns are full-row
    copies, and the tiebreak keys include the payload, so engine and SQL
    lag() agree deterministically."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA"),
            "text": pc.fill_null(pc.cast(t["text"], pa.string()), "")})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series(dtype=str),
                "turn_idx": pd.Series(dtype="Int64"),
                "prompt": pd.Series(dtype=str),
                "response": pd.Series(dtype=str)})
        df = df.sort_values(["conv_id", "turn_idx", "role", "text"],
                            kind="stable", na_position="last")
        g = df.groupby("conv_id", sort=False)
        prev_role = g["role"].shift(1)
        prev_text = g["text"].shift(1)
        keep = (prev_role == "user") & (df["role"] == "assistant")
        return pd.DataFrame({
            "conv_id": df["conv_id"][keep].astype(str),
            "turn_idx": df["turn_idx"][keep].astype("Int64"),
            "prompt": prev_text[keep].astype(str),
            "response": df["text"][keep].astype(str)})

    return grouped_map(rows, ["conv_id"], extract)


def transcript_pairs(sf_dir: str):
    """SFT pair extraction over the transcript corpus (see
    ``extract_pairs``)."""
    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role", "text"])
    return extract_pairs(ds)


def pca_embeddings(sf_dir: str):
    """PCA projection to 8 components (stages/linalg.pca_project):
    distributed moment reduction -> driver eigh of the tiny d x d
    covariance -> broadcast map-only projection.  No SQL oracle
    (eigendecomposition is not SQL-expressible); exactness vs numpy PCA
    is pytest-verified (test_linalg.py), rows-only check here."""
    from crn_meta_validate_ray.stages.linalg import pca_project

    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out, _info = pca_project(ds, n_components=8)
    return out


def pack_conversations(sf_dir: str):
    """Conversation-level sequence packing: flatten each conversation to
    its training document, count its tokens, and assign conversations in
    conv_id order to fixed 4096-token training shards by running token
    offset — flatten_turns composed with the distributed two-phase scan
    (stages/scan.py).  The driver folds only per-block totals."""
    from crn_meta_validate_ray.functions.text import token_count
    from crn_meta_validate_ray.stages.scan import ordered_prefix_sum

    info = _transcript_corpus(sf_dir)
    turns = rd.read_parquet(info["turns_dir"],
                            columns=["conv_id", "turn_idx", "role",
                                     "text"])
    flat = flatten_turns(turns)

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "n_tokens": pc.cast(token_count(t["conv_text"]), pa.int64())})

    narrow = flat.map_batches(tok, batch_format="pyarrow",
                              zero_copy_batch=True)
    scanned = ordered_prefix_sum(narrow, "conv_id", "n_tokens",
                                 out_col="run_sum", integer=True)

    def binify(t: pa.Table) -> pa.Table:
        run = np.asarray(t["run_sum"].to_pandas(), dtype=np.int64)
        n = np.asarray(t["n_tokens"].to_pandas(), dtype=np.int64)
        return pa.table({"conv_id": t["conv_id"], "n_tokens": t["n_tokens"],
                         "bin_id": pa.array((run - n) // 4096)})

    return scanned.map_batches(binify, batch_format="pyarrow")


def moving_avg_events(sf_dir: str):
    """Per-user moving average over the last 4 events in event-time order
    (stages/window.moving_aggregate): the rolling smoothing feature,
    computed with one hash-bucket exchange + grouped cumsum differences."""
    from crn_meta_validate_ray.stages.window import moving_aggregate

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    out = moving_aggregate(ds, window=4)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "win_n": pc.cast(t["win_n"], pa.int64()),
            # half_towards_infinity = SQL round() tie direction; window
            # sums of decimal-ish inputs DO land on .xxxx5 ties
            "win_sum": pc.round(t["win_sum"], 4,
                                round_mode="half_towards_infinity"),
            "win_avg": pc.round(t["win_avg"], 4,
                                round_mode="half_towards_infinity")})

    return out.map_batches(cast, batch_format="pyarrow")


def user_features_events(sf_dir: str):
    """Per-entity feature-vector aggregation (the classic featurization
    pivot): one row per user with per-event-type counts, total value and
    activity span.  Batch-local combiner — each batch folds its rows into
    (user, n_click, ..., sum_value, min_ts, max_ts) partials via
    factorize + bincount, so only |users|-bounded partial rows cross the
    groupby exchange, never events."""
    import pandas as pd

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # SQL GROUP BY semantics: drop the NULL-user group (oracle has
        # WHERE user_id IS NOT NULL); sum()/min()/max() ignore NULLs
        t = t.filter(pc.is_valid(t["user_id"]))
        df = t.to_pandas()
        users, uinv = np.unique(df["user_id"].to_numpy(np.int64),
                                return_inverse=True)
        n_u = len(users)
        cols = {"user_id": users}
        tcodes = pd.Categorical(df["event_type"],
                                categories=TYPES).codes
        for ti, name in enumerate(TYPES):
            cols[f"n_{name}"] = np.bincount(
                uinv[tcodes == ti], minlength=n_u).astype(np.int64)
        cols["sum_value"] = np.bincount(
            uinv, weights=df["value"].fillna(0.0)
            .to_numpy(np.float64), minlength=n_u)
        ts_raw = df["ts"].astype("datetime64[us]")
        valid = ts_raw.notna().to_numpy()
        ts = ts_raw.astype(np.int64).to_numpy()
        gmin = np.full(n_u, np.iinfo(np.int64).max)
        gmax = np.full(n_u, np.iinfo(np.int64).min)
        np.minimum.at(gmin, uinv[valid], ts[valid])
        np.maximum.at(gmax, uinv[valid], ts[valid])
        has_ts = np.zeros(n_u, dtype=bool)
        has_ts[uinv[valid]] = True
        cols["min_ts"] = gmin
        cols["max_ts"] = gmax
        cols["has_ts"] = has_ts.astype(np.int64)
        return pa.Table.from_pydict(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            *[Sum(f"n_{n}", alias_name=f"n_{n}") for n in TYPES],
            Sum("sum_value", alias_name="sum_value"),
            Min("min_ts", alias_name="min_ts"),
            Max("max_ts", alias_name="max_ts"),
            Max("has_ts", alias_name="has_ts"))

    def finish(t: pa.Table) -> pa.Table:
        out = {"user_id": pc.cast(t["user_id"], pa.int64())}
        for n in TYPES:
            out[f"n_{n}"] = pc.cast(t[f"n_{n}"], pa.int64())
        out["sum_value"] = pc.round(t["sum_value"], 4)
        # SQL date_diff('second') counts boundary crossings:
        # floor(b/1e6) - floor(a/1e6), not floor((b-a)/1e6);
        # users with no valid ts get NULL span like SQL min()/max()
        usec = pa.scalar(1_000_000, pa.int64())
        span = pc.subtract(pc.divide(t["max_ts"], usec),
                           pc.divide(t["min_ts"], usec))
        out["span_s"] = pc.if_else(
            pc.equal(pc.cast(t["has_ts"], pa.int64()), 1),
            pc.cast(span, pa.int64()), pa.scalar(None, pa.int64()))
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def cluster_representatives_documents(sf_dir: str):
    """Near-dup cluster representative selection — the final emit step of
    a dedup pipeline: within each connected component keep the LONGEST
    document (tie -> lowest doc_id).  Composition: exact n-gram Jaccard
    pairs -> distributed connected components -> hash_join to per-doc
    char lengths -> per-cluster vectorized argmax through the
    hash-bucket exchange."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map
    from crn_meta_validate_ray.stages.dedup import ngram_jaccard_exact_pairs
    from crn_meta_validate_ray.stages.graph import connected_components
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    comp = connected_components(
        ngram_jaccard_exact_pairs(ds, threshold=0.5, ngram=3))

    def lens(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(pc.cast(t["text"], pa.string()), "")),
                pa.int64())})

    joined = hash_join(comp, ds.map_batches(lens, batch_format="pyarrow",
                                            zero_copy_batch=True),
                       left_on="doc_id", validate_unique_right=True)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "cluster_id": pd.Series(dtype=np.int64),
                "rep_doc_id": pd.Series(dtype=np.int64),
                "n_docs": pd.Series(dtype=np.int64),
                "rep_chars": pd.Series(dtype=np.int64)})
        df = df.sort_values(["cluster_id", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        g = df.groupby("cluster_id", sort=False)
        head = g.head(1)
        sizes = g.size()
        return pd.DataFrame({
            "cluster_id": head["cluster_id"].to_numpy(np.int64),
            "rep_doc_id": head["doc_id"].to_numpy(np.int64),
            "n_docs": sizes.loc[head["cluster_id"]].to_numpy(np.int64),
            "rep_chars": head["n_chars"].to_numpy(np.int64)})

    return grouped_map(joined, ["cluster_id"], pick)


def funnel_events(sf_dir: str):
    """Ordered conversion funnel per user: first signup, first view AT OR
    AFTER that signup, first purchase at or after that view — stage
    timestamps chain on event order, so this is a sequence computation,
    not a plain aggregate.  One hash-bucket exchange co-locates users;
    within a bucket each stage is a vectorized groupby-min + merge
    + filter (no per-user Python loop)."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])

    def narrow(t: pa.Table) -> pa.Table:
        # only the funnel stages cross the exchange — click/error rows
        # (the bulk of the table) are dropped at the scan
        et = pc.cast(t["event_type"], pa.string())
        keep = pc.is_in(et, value_set=pa.array(
            ["signup", "view", "purchase"]))
        t = t.filter(keep)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "ts": pc.cast(t["ts"], pa.int64())})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    # the oracle emits one row per user with ANY event (all-NULL stages
    # for users who never entered the funnel) — fold the full user
    # universe via a tiny distinct combiner and left-join the funnel
    def uid_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["user_id"]))
        ids = pc.unique(pc.cast(t["user_id"], pa.int64()))
        return pa.table({"user_id": ids})

    universe = ds.map_batches(uid_partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("user_id").aggregate(Count(alias_name="_c")) \
        .select_columns(["user_id"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "ts_signup": pd.Series(dtype="Int64"),
                "ts_view": pd.Series(dtype="Int64"),
                "ts_purchase": pd.Series(dtype="Int64")})
        users = pd.DataFrame({
            "user_id": df["user_id"].unique()}).set_index("user_id")
        s = df[df["event_type"] == "signup"].groupby("user_id")["ts"].min()
        users["ts_signup"] = s
        v = df[df["event_type"] == "view"] \
            .merge(s.rename("ts_s"), left_on="user_id", right_index=True)
        v = v[v["ts"] >= v["ts_s"]].groupby("user_id")["ts"].min()
        users["ts_view"] = v
        p = df[df["event_type"] == "purchase"] \
            .merge(v.rename("ts_v"), left_on="user_id", right_index=True)
        p = p[p["ts"] >= p["ts_v"]].groupby("user_id")["ts"].min()
        users["ts_purchase"] = p
        out = users.reset_index()
        return pd.DataFrame({
            "user_id": out["user_id"].astype(np.int64),
            "ts_signup": out["ts_signup"].astype("Int64"),
            "ts_view": out["ts_view"].astype("Int64"),
            "ts_purchase": out["ts_purchase"].astype("Int64")})

    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    def cast_u(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64())})

    funnel = grouped_map(rows, ["user_id"], fold)
    return hash_join(universe.map_batches(cast_u, batch_format="pyarrow"),
                     funnel, left_on="user_id", how="left",
                     validate_unique_right=True)


def dup_turns_transcript(sf_dir: str):
    """Boilerplate-response detection over the transcript corpus: turn
    texts repeated across the corpus (the transcript analogue of
    frequent-line boilerplate).  Batch-local value-count combiner — only
    (text, partial_n) rows cross the groupby — then filter n > 1 and
    take the top 50 by (count desc, text)."""
    import pandas as pd

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"], columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        vc = pc.value_counts(s)  # zero-copy Arrow; no object round-trip
        return pa.table({
            "text": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("text").aggregate(Sum("n", alias_name="n"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"text": pc.cast(t["text"], pa.string()),
                         "n": pc.cast(t["n"], pa.int64())})

    out = agg.map_batches(cast, batch_format="pyarrow") \
        .filter(expr="n > 1") \
        .sort(key=["n", "text"], descending=[True, False]).limit(50)
    return collect_with_schema(out, pa.schema([
        ("text", pa.string()), ("n", pa.int64())]))


def weighted_sample_documents(sf_dir: str):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis exponential-sort): key = u^(1/w) with
    u = md5-derived uniform and w = char length + 1; global top-100 by
    key.  Longer documents are proportionally likelier, yet the draw is
    reproducible across runs and cluster sizes (and SQL-replicable) —
    the standard way to weight-sample a corpus with no RNG state.  The
    md5 path is the SQL-parity variant; swap fingerprint64 for the
    numpy-vectorized scale path."""
    import hashlib

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        n_chars = pc.cast(pc.utf8_length(
            pc.fill_null(pc.cast(t["text"], pa.string()), "")), pa.int64())
        u = np.array([(int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                           16) + 1) / 4294967296.0
                      for i in ids.to_pylist()])
        w = np.asarray(n_chars, dtype=np.float64) + 1.0
        key = u ** (1.0 / w)
        return pa.table({
            "doc_id": ids,
            "n_chars": n_chars,
            "skey": pc.round(pa.array(key, type=pa.float64()), 6)})

    out = ds.map_batches(keyed, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .sort(key=["skey", "doc_id"], descending=[True, True]).limit(100)
    return collect_with_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("n_chars", pa.int64()),
        ("skey", pa.float64())]))


def entropy_documents(sf_dir: str):
    """Per-document codepoint entropy (functions/text.char_entropy):
    map-only quality signal for gibberish / binary-noise detection."""
    from crn_meta_validate_ray.functions.text import char_entropy

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "ent": pc.round(pa.array(char_entropy(t["text"]),
                                     type=pa.float64()), 5)})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def upsert_orders(sf_dir: str):
    """Last-write-wins upsert merge (the CDC / lakehouse MERGE shape):
    a change batch (30% of orders with re-priced totals, version 1)
    merges into the snapshot (version 0); per key the highest version
    wins.  Union -> one hash-bucket exchange on the key -> vectorized
    per-bucket argmax by (version desc) — the same partitioning as exact
    dedup keep-first, with versions instead of first-occurrence."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])

    def snap(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
            "version": pa.array(np.zeros(t.num_rows, dtype=np.int64))})

    def changes(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["o_orderkey"], pa.int64())
        m = np.asarray(keys) % 10 < 3
        sub = t.filter(pa.array(m))
        sk = pc.cast(sub["o_orderkey"], pa.int64())
        return pa.table({
            "o_orderkey": sk,
            # SQL round() is half-away-from-zero; Arrow defaults to
            # half-to-even and re-priced values DO land on .xx5 ties
            "o_totalprice": pc.round(pc.multiply(
                pc.cast(sub["o_totalprice"], pa.float64()),
                pa.scalar(1.1, pa.float64())), 2,
                round_mode="half_towards_infinity"),
            "version": pa.array(np.ones(sub.num_rows, dtype=np.int64))})

    def snap_and_changes(t: pa.Table) -> pa.Table:
        # both derivations from ONE scan of the batch — no second read
        return pa.concat_tables([snap(t), changes(t)])

    both = ds.map_batches(snap_and_changes, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "o_orderkey": pd.Series(dtype=np.int64),
                "o_totalprice": pd.Series(dtype=np.float64),
                "version": pd.Series(dtype=np.int64)})
        df = df.sort_values(["o_orderkey", "version"],
                            ascending=[True, False], kind="stable")
        head = df.groupby("o_orderkey", sort=False).head(1)
        return pd.DataFrame({
            "o_orderkey": head["o_orderkey"].to_numpy(np.int64),
            "o_totalprice": head["o_totalprice"].to_numpy(np.float64),
            "version": head["version"].to_numpy(np.int64)})

    return grouped_map(both, ["o_orderkey"], pick)


def table_diff_orders(sf_dir: str):
    """Snapshot diff (data-reconciliation / anti-entropy): FULL OUTER
    join of a table against its CDC-modified successor, classifying
    every key as same / updated / added / removed.  The successor is
    derived in-query: 30% re-priced, keys ending in 9 deleted, and a
    shifted-key block inserted.  Exercises the shuffle hash join's
    full-outer mode end-to-end under the oracle gate."""
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    ds = rd.read_parquet(_p(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])

    def snap(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "price_a": pc.cast(t["o_totalprice"], pa.float64())})

    def succ(t: pa.Table) -> pa.Table:
        keys = np.asarray(pc.cast(t["o_orderkey"], pa.int64()))
        price = pc.cast(t["o_totalprice"], pa.float64())
        keep = keys % 10 != 9          # deletions
        k = keys[keep]
        p = pc.filter(price, pa.array(keep))
        # identical rounding expression to upsert_orders (SQL parity)
        rp = pc.round(pc.multiply(p, pa.scalar(1.1, pa.float64())), 2,
                      round_mode="half_towards_infinity")
        p = pc.if_else(pa.array(k % 10 < 3), rp, p)
        ins = keys[keys % 10 == 4] + 1_000_000   # insertions
        return pa.table({
            "o_orderkey": pa.array(np.concatenate([k, ins])),
            "price_b": pa.concat_arrays([
                p.combine_chunks() if isinstance(p, pa.ChunkedArray)
                else p,
                pa.array(np.full(len(ins), 1.0))])})

    # the join consumes two derivations of the same table: materialize
    # the (narrow) scan once so both sides read cached blocks
    ds = ds.materialize()
    a = ds.map_batches(snap, batch_format="pyarrow", zero_copy_batch=True)
    b = ds.map_batches(succ, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(a, b, left_on="o_orderkey", how="outer")

    def classify(t: pa.Table) -> pa.Table:
        pa_ = t["price_a"]
        pb = t["price_b"]
        a_null = pc.is_null(pa_)
        b_null = pc.is_null(pb)
        status = pc.if_else(
            a_null, pa.scalar("added", pa.string()),
            pc.if_else(b_null, pa.scalar("removed", pa.string()),
                       pc.if_else(pc.equal(pa_, pb),
                                  pa.scalar("same", pa.string()),
                                  pa.scalar("updated", pa.string()))))
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"],
                                               pa.int64()),
                         "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


def role_perplexity_transcript(sf_dir: str):
    """Sequence-anomaly scoring: per-conversation average negative
    log2-likelihood of its role transitions under the corpus-wide
    first-order (Markov) transition model — flags conversations whose
    role flow is atypical.  Two-phase: the global |roles|^2 transition
    matrix folds from per-bucket partials (tiny), broadcasts in the task
    closure, then one co-located pass scores every conversation
    vectorized (codes + np lookup, no per-row loop)."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA")})

    # two grouped_map passes read this lineage — materialize once so the
    # parquet scan + narrow map run a single time (cf. rank_normalize)
    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"role_a": pd.Series(dtype=str),
                                 "role_b": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64)})
        df, prev, _ = _lag_turns(df)
        keep = prev.notna()
        g = pd.DataFrame({"role_a": prev[keep], "role_b": df["role"][keep]}) \
            .groupby(["role_a", "role_b"], sort=False) \
            .size().reset_index(name="n")
        return pd.DataFrame({"role_a": g["role_a"].astype(str),
                             "role_b": g["role_b"].astype(str),
                             "n": g["n"].astype(np.int64)})

    mat = grouped_map(rows, ["conv_id"], pair_counts) \
        .groupby(["role_a", "role_b"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()
    # |roles|^2 rows — broadcast via closure
    pair_n = {(r["role_a"], r["role_b"]): r["n"] for r in mat}
    tot_n: dict = {}
    for (a, _b), n in pair_n.items():
        tot_n[a] = tot_n.get(a, 0) + n
    nll = {k: -np.log2(n / tot_n[k[0]]) for k, n in pair_n.items()}

    nll_df = pd.DataFrame(
        [(a, b, v) for (a, b), v in sorted(nll.items())],
        columns=["role_a", "role_b", "v"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"conv_id": pd.Series(dtype=str),
                                 "n_trans": pd.Series(dtype=np.int64),
                                 "avg_nll": pd.Series(dtype=np.float64)})
        df, prev, _ = _lag_turns(df)
        keep = prev.notna()
        sub = pd.DataFrame({"conv_id": df["conv_id"][keep],
                            "role_a": prev[keep],
                            "role_b": df["role"][keep]}) \
            .merge(nll_df, on=["role_a", "role_b"], how="left")
        g = sub.groupby("conv_id", sort=False)["v"] \
            .agg(["size", "mean"]).reset_index()
        return pd.DataFrame({
            "conv_id": g["conv_id"].astype(str),
            "n_trans": g["size"].astype(np.int64),
            "avg_nll": g["mean"].round(5).astype(np.float64)})

    return grouped_map(rows, ["conv_id"], score)


def range_partition_orders(sf_dir: str):
    """Balanced range-partitioner design — the primitive behind
    distributed sort / range-partitioned writes: exact k-quantiles of
    the sort key become partition boundaries (value-counts reduction,
    stages/quantile.py), broadcast to a map-only searchsorted
    assignment; output is the per-partition census proving balance."""
    from crn_meta_validate_ray.stages.quantile import exact_quantiles

    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey"])
    qs = [i / 8 for i in range(1, 8)]
    # mode="exact": the partitioner contract is REAL key boundaries
    # (quantile_disc oracle); the auto-route would interpolate above the
    # distinct-count budget, which this query must not do at any scale
    bt = exact_quantiles(ds, "o_orderkey", qs, mode="exact")  # (q, value)
    bounds = np.sort(np.asarray(bt["value"], dtype=np.int64))

    def assign(t: pa.Table) -> pa.Table:
        k = np.asarray(pc.cast(t["o_orderkey"], pa.int64()))
        return pa.table({
            "part": pa.array(np.searchsorted(bounds, k, side="right")
                             .astype(np.int64)),
            "o_orderkey": pa.array(k)})

    out = ds.map_batches(assign, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("part").aggregate(
            Count(alias_name="n"),
            Min("o_orderkey", alias_name="min_key"),
            Max("o_orderkey", alias_name="max_key"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"part": pc.cast(t["part"], pa.int64()),
                         "n": pc.cast(t["n"], pa.int64()),
                         "min_key": pc.cast(t["min_key"], pa.int64()),
                         "max_key": pc.cast(t["max_key"], pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def response_latency_transcript(sf_dir: str):
    """Assistant response-latency analysis: per conversation, the count
    and mean of (assistant turn ts - immediately-preceding user turn ts)
    — the conversational QoS rollup.  Same one-exchange co-located lag
    machinery as pair extraction, carrying the ts column instead of
    text; the latency unit is whole seconds (epoch-second difference),
    matching SQL date_diff semantics exactly."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role", "ts"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA"),
            "ts": pc.cast(t["ts"], pa.int64())})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series(dtype=str),
                "n_responses": pd.Series(dtype=np.int64),
                "avg_latency_s": pd.Series(dtype=np.float64)})
        df, prev_role, shifted = _lag_turns(df, carry=("ts",))
        prev_ts = shifted["ts"]
        keep = ((prev_role == "user") & (df["role"] == "assistant")
                & df["ts"].notna() & prev_ts.notna())
        # whole-second boundary difference (SQL date_diff('second'))
        lat = (df["ts"][keep] // 1_000_000
               - prev_ts[keep].astype(np.int64) // 1_000_000)
        sub = pd.DataFrame({"conv_id": df["conv_id"][keep],
                            "lat": lat.astype(np.float64)})
        g2 = sub.groupby("conv_id", sort=False)["lat"] \
            .agg(["size", "mean"]).reset_index()
        return pd.DataFrame({
            "conv_id": g2["conv_id"].astype(str),
            "n_responses": g2["size"].astype(np.int64),
            "avg_latency_s": g2["mean"].round(5).astype(np.float64)})

    return grouped_map(rows, ["conv_id"], fold)


def tool_usage_transcript(sf_dir: str):
    """Tool-usage rollup over the transcript corpus: per tool, the call
    count, conversations reached and mean payload length — the
    agent-telemetry aggregate over the input schema's `tool` column.
    Batch-local partials (per-batch groupby on (tool, conv) distinct for
    reach), tiny (tool, partial) exchange."""
    import pandas as pd

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "tool", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["tool"]))
        df = pd.DataFrame({
            "tool": np.asarray(t["tool"].to_pandas(), dtype=object),
            "conv_id": np.asarray(t["conv_id"].to_pandas(), dtype=object),
            "n_chars": np.asarray(pc.utf8_length(pc.fill_null(
                pc.cast(t["text"], pa.string()), "")), dtype=np.int64)})
        g = df.groupby("tool", sort=False)
        out = g.agg(n_calls=("conv_id", "size"),
                    sum_chars=("n_chars", "sum")).reset_index()
        # conv reach must dedupe batch-locally too: ship distinct pairs'
        # counts, finished by the conv-distinct pass below
        return pa.Table.from_pydict({
            "tool": out["tool"].astype(str).to_numpy(),
            "n_calls": out["n_calls"].to_numpy(np.int64),
            "sum_chars": out["sum_chars"].to_numpy(np.int64)})

    stats = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("tool").aggregate(Sum("n_calls", alias_name="n_calls"),
                                   Sum("sum_chars", alias_name="sum_chars"))

    def reach_partial(t: pa.Table) -> pa.Table:
        # count(DISTINCT conv_id) ignores NULL conv_ids
        t = t.filter(pc.and_(pc.is_valid(t["tool"]),
                             pc.is_valid(t["conv_id"])))
        df = pd.DataFrame({
            "tool": np.asarray(t["tool"].to_pandas(), dtype=object),
            "conv_id": np.asarray(t["conv_id"].to_pandas(),
                                  dtype=object)}).drop_duplicates()
        return pa.Table.from_pydict({
            "tool": df["tool"].astype(str).to_numpy(),
            "conv_id": df["conv_id"].astype(str).to_numpy()})

    reach = ds.map_batches(reach_partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["tool", "conv_id"]).aggregate(Count(alias_name="_c")) \
        .groupby("tool").aggregate(Count(alias_name="n_convs"))

    from crn_meta_validate_ray.stages.shufflejoin import hash_join
    joined = hash_join(stats, reach.map_batches(
        lambda t: pa.table({"tool": pc.cast(t["tool"], pa.string()),
                            "n_convs": pc.cast(t["n_convs"], pa.int64())}),
        batch_format="pyarrow"), left_on="tool",
        validate_unique_right=True)

    def finish(t: pa.Table) -> pa.Table:
        calls = np.asarray(t["n_calls"], dtype=np.float64)
        chars = np.asarray(t["sum_chars"], dtype=np.float64)
        return pa.table({
            "tool": pc.cast(t["tool"], pa.string()),
            "n_calls": pc.cast(t["n_calls"], pa.int64()),
            "n_convs": pc.cast(t["n_convs"], pa.int64()),
            "avg_chars": pc.round(pa.array(chars / calls,
                                           type=pa.float64()), 5)})

    return joined.map_batches(finish, batch_format="pyarrow")


def role_length_quantiles_transcript(sf_dir: str):
    """Per-role text-length distribution over the transcript corpus:
    exact discrete p50/p90 + count of turn lengths for each role — the
    length-profile diagnostic behind truncation / packing decisions.
    Only narrow (role, n_chars) pairs cross the hash-bucket exchange;
    quantiles are exact (quantile_disc rank semantics)."""
    import math

    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"], columns=["role", "text"])

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA"),
            "n_chars": pc.cast(pc.utf8_length(pc.fill_null(
                pc.cast(t["text"], pa.string()), "")), pa.int64())})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows_ = []
        for role, sub in g.groupby("role", sort=False):
            v = np.sort(sub["n_chars"].to_numpy())
            n = len(v)
            rows_.append({
                "role": str(role),
                "p50": np.int64(v[max(math.ceil(0.5 * n), 1) - 1]),
                "p90": np.int64(v[max(math.ceil(0.9 * n), 1) - 1]),
                "n": np.int64(n)})
        return pd.DataFrame(rows_, columns=["role", "p50", "p90", "n"])

    out = grouped_map(rows, ["role"], bucket)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"role": pc.cast(t["role"], pa.string()),
                         "p50": pc.cast(t["p50"], pa.int64()),
                         "p90": pc.cast(t["p90"], pa.int64()),
                         "n": pc.cast(t["n"], pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def corpus_prep_transcript(sf_dir: str):
    """End-to-end training-corpus preparation for the transcript payload
    — the composed pipeline a user of this engine actually ships:
    (1) GATE: drop whole conversations containing an enum-invalid role
    or blank text (the SQL-replicable core of the validation suite);
    (2) FLATTEN: surviving conversations to one training document each;
    (3) DEDUP: exact keep-first on the flattened text (min conv_id per
    content wins); (4) PACK: 4096-token shards by running token offset.
    Every stage is a proven primitive (combiner flag fold -> anti join
    -> flatten_turns -> keep-first -> ordered_prefix_sum); text crosses
    the wire only where it IS the payload."""
    import pandas as pd

    from crn_meta_validate_ray.functions.text import token_count
    from crn_meta_validate_ray.stages.common import grouped_map
    from crn_meta_validate_ray.stages.scan import ordered_prefix_sum
    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    ROLES = ["system", "user", "assistant", "tool"]
    info = _transcript_corpus(sf_dir)
    turns = rd.read_parquet(info["turns_dir"],
                            columns=["conv_id", "turn_idx", "role",
                                     "text"]).materialize()

    def flag_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        role = pc.fill_null(pc.cast(t["role"], pa.string()), "NA")
        text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        bad_role = pc.invert(pc.is_in(role, value_set=pa.array(ROLES)))
        blank = pc.equal(pc.utf8_trim_whitespace(text), "")
        bad = pc.or_(bad_role, blank)
        df = pd.DataFrame({
            "conv_id": np.asarray(t["conv_id"].to_pandas(), dtype=object),
            "bad": np.asarray(bad, dtype=np.int64)})
        g = df.groupby("conv_id", sort=False)["bad"].max().reset_index()
        return pa.Table.from_pydict({
            "conv_id": g["conv_id"].astype(str).to_numpy(),
            "bad": g["bad"].to_numpy(np.int64)})

    bad_ids = turns.map_batches(flag_partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("conv_id").aggregate(Max("bad", alias_name="bad")) \
        .filter(expr="bad == 1").select_columns(["conv_id"])

    flat = flatten_turns(turns)
    good = hash_join(flat.select_columns(["conv_id", "conv_text"]),
                     bad_ids, left_on="conv_id", how="anti")

    def keeper_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"conv_id": pd.Series(dtype=str)})
        # conv_id is fixed-width (conv_%08d): lexicographic min == min
        k = df.groupby("conv_text", sort=False)["conv_id"].min()
        return pd.DataFrame({"conv_id": k.astype(str).to_numpy()})

    keepers = grouped_map(good, ["conv_text"], keeper_partial)
    kept = hash_join(good, keepers, left_on="conv_id", how="semi")

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "n_tokens": pc.cast(token_count(t["conv_text"]), pa.int64())})

    narrow = kept.map_batches(tok, batch_format="pyarrow",
                              zero_copy_batch=True)
    scanned = ordered_prefix_sum(narrow, "conv_id", "n_tokens",
                                 out_col="run_sum", integer=True)

    def binify(t: pa.Table) -> pa.Table:
        run = np.asarray(t["run_sum"].to_pandas(), dtype=np.int64)
        n = np.asarray(t["n_tokens"].to_pandas(), dtype=np.int64)
        return pa.table({"conv_id": t["conv_id"],
                         "n_tokens": t["n_tokens"],
                         "bin_id": pa.array((run - n) // 4096)})

    return scanned.map_batches(binify, batch_format="pyarrow")


def turncount_reconcile_transcript(sf_dir: str):
    """Header consistency check (referential family, J-extension): the
    conversations header declares n_turns; reconcile it against the
    actual per-conversation turn count and emit every mismatch.
    Actual counts fold from batch-local combiners ((conv_id, partial)
    rows only); the header side joins through the shuffle hash join —
    conversations missing all turns and headers with wrong counts both
    surface (FULL OUTER + delta filter)."""
    import pandas as pd

    from crn_meta_validate_ray.stages.shufflejoin import hash_join

    info = _transcript_corpus(sf_dir)
    turns = rd.read_parquet(info["turns_dir"], columns=["conv_id"])
    headers = rd.read_parquet(info["conversations"],
                              columns=["conv_id", "n_turns"])

    def actual_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        df = pd.DataFrame({"conv_id": np.asarray(
            t["conv_id"].to_pandas(), dtype=object)})
        g = df.groupby("conv_id", sort=False).size().reset_index(name="n")
        return pa.Table.from_pydict({
            "conv_id": g["conv_id"].astype(str).to_numpy(),
            "n": g["n"].to_numpy(np.int64)})

    actual = turns.map_batches(actual_partial, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("conv_id").aggregate(Sum("n", alias_name="actual"))

    def cast_a(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.cast(t["conv_id"], pa.string()),
                         "actual": pc.cast(t["actual"], pa.int64())})

    def cast_h(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.cast(t["conv_id"], pa.string()),
                         "declared": pc.cast(t["n_turns"], pa.int64())})

    joined = hash_join(
        headers.map_batches(cast_h, batch_format="pyarrow"),
        actual.map_batches(cast_a, batch_format="pyarrow"),
        left_on="conv_id", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        decl = pc.fill_null(pc.cast(t["declared"], pa.int64()), 0)
        act = pc.fill_null(pc.cast(t["actual"], pa.int64()), 0)
        out = pa.table({
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "declared": decl,
            "actual": act,
            "delta": pc.subtract(act, decl)})
        return out.filter(pc.not_equal(out["delta"], 0))

    return joined.map_batches(finish, batch_format="pyarrow")


def truncate_conversations_transcript(sf_dir: str):
    """Context-window truncation: keep each conversation's LAST 8 turns
    in (turn_idx, role, text) order — the standard context-trim applied
    before packing long histories into a fixed training window.  One
    co-located pass per conversation; per bucket a single stable sort +
    groupby-cumcount-from-the-end selects the tail vectorized."""
    import pandas as pd

    from crn_meta_validate_ray.stages.common import grouped_map

    K = 8
    info = _transcript_corpus(sf_dir)
    ds = rd.read_parquet(info["turns_dir"],
                         columns=["conv_id", "turn_idx", "role", "text"])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": pc.fill_null(pc.cast(t["role"], pa.string()), "NA"),
            "text": pc.fill_null(pc.cast(t["text"], pa.string()), "")})

    rows = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)

    def tail(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series(dtype=str),
                "turn_idx": pd.Series(dtype="Int64"),
                "role": pd.Series(dtype=str),
                "text": pd.Series(dtype=str),
                "pos_from_end": pd.Series(dtype=np.int64)})
        # descending order, tie-broken by the rendered payload so the
        # "last K" set is deterministic under duplicate turn_idx
        df = df.sort_values(["conv_id", "turn_idx", "role", "text"],
                            ascending=[True, False, False, False],
                            kind="stable", na_position="first")
        pos = df.groupby("conv_id", sort=False).cumcount() + 1
        keep = pos <= K
        out = df[keep]
        return pd.DataFrame({
            "conv_id": out["conv_id"].astype(str),
            "turn_idx": out["turn_idx"].astype("Int64"),
            "role": out["role"].astype(str),
            "text": out["text"].astype(str),
            "pos_from_end": pos[keep].astype(np.int64)})

    return grouped_map(rows, ["conv_id"], tail)


def _label_moment_partials(ds: "rd.Dataset"):
    """Shared second-moment combiner for labeled embeddings: per batch,
    fold vectors into (label, pos, s, s2, n) partials via unique +
    scatter-add, merged by a tiny groupby.  Used by label variance and
    the Fisher-score finish (centroids predate it and ship first moments
    only)."""
    from crn_meta_validate_ray.stages.similarity import _matrix

    def partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, "embedding").astype(np.float64)
        if m.size == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "s2": pa.array([], type=pa.float64()),
                             "n": pa.array([], type=pa.int64())})
        labels = np.asarray(t["label"].to_pandas(), dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d))
        sqs = np.zeros((len(uniq), d))
        np.add.at(sums, inv, m)
        np.add.at(sqs, inv, m * m)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.ravel()),
            "s2": pa.array(sqs.ravel()),
            "n": pa.array(np.repeat(counts, d))})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["label", "pos"]).aggregate(
            Sum("s", alias_name="s"), Sum("s2", alias_name="s2"),
            Sum("n", alias_name="n"))


def label_variance_embeddings(sf_dir: str):
    """Per-label per-dimension population variance (intra-class scatter —
    the Fisher-discriminant / cluster-quality building block) over the
    shared second-moment combiner (``_label_moment_partials``);
    var = s2/n - (s/n)^2 on the merged sums.  round(5) absorbs
    summation-order ULP vs the DuckDB oracle."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["label", "embedding"])
    agg = _label_moment_partials(ds)

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"], dtype=np.float64)
        s2 = np.asarray(t["s2"], dtype=np.float64)
        n = np.asarray(t["n"], dtype=np.float64)
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "pos": pc.cast(t["pos"], pa.int64()),
            "var_v": pc.round(pa.array(s2 / n - (s / n) ** 2),
                              5)})

    return agg.map_batches(finish, batch_format="pyarrow")


def fisher_scores_embeddings(sf_dir: str):
    """Per-dimension Fisher discriminant score (between-class variance /
    within-class variance) — the classical feature-separability ranking
    for labeled embeddings.  The distributed part is the shared
    (label, pos, s, s2, n) combiner (``_label_moment_partials``); the
    finish folds the tiny |labels|x d moment table on the driver
    (bounded, like the groupcheck merge) into d scores."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["label", "embedding"])
    rows = _label_moment_partials(ds).take_all()
    if not rows:
        return pa.table({"pos": pa.array([], pa.int64()),
                         "fisher": pa.array([], pa.float64())})

    import pandas as pd
    lab = pd.DataFrame(rows)
    lab["mu"] = lab["s"] / lab["n"]
    lab["w"] = lab["s2"] / lab["n"] - lab["mu"] ** 2
    out_pos, out_f = [], []
    for pos, g in lab.groupby("pos", sort=True):
        N = g["n"].sum()
        gmu = (g["n"] * g["mu"]).sum() / N
        between = (g["n"] * (g["mu"] - gmu) ** 2).sum() / N
        within = (g["n"] * g["w"]).sum() / N
        out_pos.append(int(pos))
        out_f.append(round(between / within, 5))
    return pa.table({"pos": pa.array(out_pos, pa.int64()),
                     "fisher": pa.array(out_f, pa.float64())})


def schema_check_transcript(sf_dir: str):
    """Input-schema conformance gate (S-family): verify the turns
    parquet exposes exactly the north-rule input schema
    (conv_id:string, turn_idx:int32, role/text/tool:string,
    ts:timestamp) at the PHYSICAL parquet level — the pre-flight a
    production run does before touching row data.  Metadata-only: reads
    one footer, no row bytes; per-file fan-out at scale is a map over
    file paths (the resumable pipeline's partition listing)."""
    import glob

    import pyarrow.parquet as pq

    EXPECT = [("conv_id", "BYTE_ARRAY"), ("turn_idx", "INT32"),
              ("role", "BYTE_ARRAY"), ("text", "BYTE_ARRAY"),
              ("tool", "BYTE_ARRAY"), ("ts", "INT64")]
    info = _transcript_corpus(sf_dir)
    f = sorted(glob.glob(os.path.join(info["turns_dir"], "*.parquet")))[0]
    sch = pq.read_metadata(f).schema
    actual = {sch.column(i).name: sch.column(i).physical_type
              for i in range(len(sch))}
    return pa.table({
        "column_name": pa.array([n for n, _ in EXPECT], pa.string()),
        "physical_type": pa.array(
            [actual.get(n, "MISSING") for n, _ in EXPECT], pa.string()),
        "ok": pa.array([actual.get(n) == t for n, t in EXPECT]),
    })


def _rowgrouped_orders(sf_dir: str) -> str:
    """Deterministic derived file for the row-group pruning demo: orders
    sorted by o_orderkey, written in 1000-row row groups (idempotent,
    keyed by source path).  Shared by the engine query AND the oracle
    builder so both sides introspect the same footer."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    src = _p(sf_dir, "orders")
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"rg_orders_{tag}.parquet")
    if not os.path.isfile(out):
        t = pq.read_table(src, columns=["o_orderkey", "o_totalprice"])
        t = t.sort_by("o_orderkey")
        # atomic publish: a kill mid-write (or a racing process) must not
        # leave a truncated file behind the isfile guard forever
        tmp = f"{out}.tmp.{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=1000)
        os.replace(tmp, out)
    return out


def rowgroup_prune_orders(sf_dir: str):
    """Prune-at-the-read demonstrated as an operator: footer min/max
    statistics eliminate row groups for a key-range predicate BEFORE any
    row bytes are read; only surviving groups are scanned and the exact
    filter applied.  Output proves (a) most groups were pruned from
    metadata alone and (b) the pruned scan finds every matching row
    (n_rows_matching equals the full-scan oracle count)."""
    import pyarrow.parquet as pq

    LO, HI = 12000, 13999
    path = _rowgrouped_orders(sf_dir)
    md = pq.read_metadata(path)
    keep_groups = []
    n_scanned = 0
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(0).statistics  # o_orderkey
        if st.max < LO or st.min > HI:
            continue
        keep_groups.append(g)
        n_scanned += md.row_group(g).num_rows
    pf = pq.ParquetFile(path)
    n_match = 0
    for g in keep_groups:
        t = pf.read_row_group(g, columns=["o_orderkey"])
        k = t["o_orderkey"]
        n_match += pc.sum(pc.and_(
            pc.greater_equal(k, pa.scalar(LO)),
            pc.less_equal(k, pa.scalar(HI)))).as_py() or 0
    return pa.table({
        "n_row_groups": pa.array([md.num_row_groups], pa.int64()),
        "n_pruned_groups": pa.array(
            [md.num_row_groups - len(keep_groups)], pa.int64()),
        "n_rows_scanned": pa.array([n_scanned], pa.int64()),
        "n_rows_matching": pa.array([n_match], pa.int64()),
    })


def file_census_transcript(sf_dir: str):
    """Distributed manifest builder: per input file, row count and
    row-group count harvested from footers only — the census a
    resumable run takes BEFORE reading row data (partition sizing, skew
    detection, progress accounting).  Each file's footer is read by a
    Ray task (``from_items`` over paths -> map_batches), so a million-file
    corpus fans out instead of serializing on the driver."""
    import glob

    info = _transcript_corpus(sf_dir)
    files = sorted(glob.glob(os.path.join(info["turns_dir"],
                                          "*.parquet")))

    def probe(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        names, rows_, groups = [], [], []
        for p in t["item"].to_pylist():
            md = pq.read_metadata(p)
            names.append(os.path.basename(p))
            rows_.append(md.num_rows)
            groups.append(md.num_row_groups)
        return pa.table({
            "file_name": pa.array(names, pa.string()),
            "n_rows": pa.array(rows_, pa.int64()),
            "n_row_groups": pa.array(groups, pa.int64())})

    return rd.from_items(files).map_batches(probe, batch_format="pyarrow")


def composition_documents(sf_dir: str):
    """Corpus composition report (mixture governance): per source, the
    document count, token count and token SHARE of the whole corpus —
    the accounting table every training-data release publishes.
    Batch-local token-count partials fold per source; shares derive from
    the tiny merged aggregate (|sources| rows)."""
    from crn_meta_validate_ray.functions.text import token_count

    ds = rd.read_parquet(_p(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        src = pc.fill_null(pc.cast(t["source"], pa.string()), "unknown")
        toks = pc.cast(token_count(t["text"]), pa.int64())
        df = pd.DataFrame({"source": np.asarray(src.to_pandas(),
                                                dtype=object),
                           "n_tokens": np.asarray(toks)})
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_tokens", "size"),
            n_tokens=("n_tokens", "sum")).reset_index()
        return pa.Table.from_pydict({
            "source": g["source"].astype(str).to_numpy(),
            "n_docs": g["n_docs"].to_numpy(np.int64),
            "n_tokens": g["n_tokens"].to_numpy(np.int64)})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("source").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("n_tokens",
                                         alias_name="n_tokens")) \
        .take_all()  # |sources| rows — tiny by construction
    total = sum(r["n_tokens"] for r in agg) or 1
    agg = sorted(agg, key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in agg], pa.string()),
        "n_docs": pa.array([int(r["n_docs"]) for r in agg], pa.int64()),
        "n_tokens": pa.array([int(r["n_tokens"]) for r in agg],
                             pa.int64()),
        "token_share": pa.array(
            [round(r["n_tokens"] / total, 5) for r in agg], pa.float64()),
    })
