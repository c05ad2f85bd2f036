"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation pipeline against sf0.001;
``queries()`` exposes one callable per implemented operator family from
SURVEY §2; ``oracle_sql()`` pairs each SQL-expressible query with DuckDB
SQL over the same parquet views.  Ray is initialised by the driver before
this module is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from crn_meta_validate_ray.pipelines import queries as q

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: full constraint-suite validation of sf0.001 lineitem
    (cell rules + uniqueness + sequence contiguity + referential check
    against orders), returning the structured violation rows.

    Uses the fused pipeline shape (stages/groupfuse.py): group checks are
    computed from run-length partials emitted inside the per-cell pass and
    the referential check is fused in too — the input is read exactly once
    (the pre-round-4 shape paid a second narrow read for the group
    exchange plus a referential pass; fused-vs-exchange violation-row
    parity is pinned by tests/test_groupfuse.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from crn_meta_validate_ray.registry import (FieldRule, RefRule, SeqRule,
                                                TableRules, UniqueRule)
    from crn_meta_validate_ray.pipelines.transcripts import (
        validate_transcripts)

    rules = TableRules(
        table="lineitem",
        locator=("l_orderkey", "l_linenumber"),
        fields=[
            FieldRule("l_orderkey", "Required", "Integer"),
            FieldRule("l_linenumber", "Required", "Integer"),
            FieldRule("l_quantity", "Required", "Float"),
            FieldRule("l_returnflag", "Required", "Enum", ["A", "N", "R"]),
            FieldRule("l_linestatus", "Required", "Enum", ["O", "F"]),
            FieldRule("l_shipdate", "Required", "Timestamp"),
        ],
        unique=[UniqueRule(("l_orderkey", "l_linenumber"))],
        sequences=[SeqRule("l_orderkey", "l_linenumber", start=1)],
        references=[RefRule("l_orderkey", "orders", "o_orderkey")],
    )
    # columns='rules' prunes the read to the 6 rule-referenced columns
    # (of lineitem's 16); the schema verdict still sees the full footer
    run = validate_transcripts(f"{SF0001}/lineitem.parquet",
                               f"{SF0001}/orders.parquet",
                               rules=rules, sketches=False,
                               columns="rules")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"constraint_id": t["constraint_id"],
                         "column": t["column"],
                         "row_key": t["row_key"],
                         "value": pc.cast(t["value"], pa.string())})

    return run.violations.map_batches(project, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # validation-engine operators (SURVEY §2.2/2.4/2.5/2.7)
        "null_census_documents": q.null_census_documents,
        "enum_violations_events": q.enum_violations_events,
        "regex_violations_customer": q.regex_violations_customer,
        "integer_violations_lineitem": q.integer_violations_lineitem,
        "sequence_stats_lineitem": q.sequence_stats_lineitem,
        "sequence_violations_lineitem": q.sequence_violations_lineitem,
        "unique_violations_lineitem": q.unique_violations_lineitem,
        "ref_orphans_orders": q.ref_orphans_orders,
        "asof_latest_order": q.asof_latest_order,
        # relational / aggregation (SURVEY §2.5/2.6)
        "pricing_summary": q.pricing_summary,
        "top_orders": q.top_orders,
        "top_orders_per_customer": q.top_orders_per_customer,
        "pivot_events": q.pivot_events,
        "distinct_counts_events": q.distinct_counts_events,
        "csv_roundtrip_events": q.csv_roundtrip_events,
        "revenue_by_nation": q.revenue_by_nation,
        "rollup_revenue": q.rollup_revenue,
        "rowcounts": q.rowcounts,
        # text analysis / dedup (training-data ops)
        "exact_dedup_documents": q.exact_dedup_documents,
        "substring_dup_documents": q.substring_dup_documents,
        "token_stats_documents": q.token_stats_documents,
        "fingerprint_documents": q.fingerprint_documents,
        "quality_documents": q.quality_documents,
        "langid_documents": q.langid_documents,
        "repetition_documents": q.repetition_documents,
        "label_centroids_embeddings": q.label_centroids_embeddings,
        "label_variance_embeddings": q.label_variance_embeddings,
        "fisher_scores_embeddings": q.fisher_scores_embeddings,
        "mixture_sample_documents": q.mixture_sample_documents,
        "props_stats_events": q.props_stats_events,
        "colstats_lineitem": q.colstats_lineitem,
        "drift_psi_events": q.drift_psi_events,
        "quantize_embeddings": q.quantize_embeddings,
        "outlier_filter_events": q.outlier_filter_events,
        "redact_events": q.redact_events,
        "tfidf_top_terms_documents": q.tfidf_top_terms_documents,
        "unigram_logprob_documents": q.unigram_logprob_documents,
        "sample_documents": q.sample_documents,
        "stratified_sample_documents": q.stratified_sample_documents,
        "sink_roundtrip_documents": q.sink_roundtrip_documents,
        "jsonl_roundtrip_documents": q.jsonl_roundtrip_documents,
        "compact_documents": q.compact_documents,
        "chunk_documents": q.chunk_documents,
        "stopword_filter_documents": q.stopword_filter_documents,
        "incremental_dedup_documents": q.incremental_dedup_documents,
        "covariance_embeddings": q.covariance_embeddings,
        "rank_normalize_events": q.rank_normalize_events,
        "pca_embeddings": q.pca_embeddings,
        "multienum_violations_documents": q.multienum_violations_documents,
        "timestamp_violations_events": q.timestamp_violations_events,
        "decontam_documents": q.decontam_documents,
        "corpus_prep_documents": q.corpus_prep_documents,
        "dedup_keep_first_documents": q.dedup_keep_first_documents,
        "minhash_pairs_documents": q.minhash_pairs_documents,
        "simhash_pairs_documents": q.simhash_pairs_documents,
        "jaccard_pairs_documents": q.jaccard_pairs_documents,
        "dedup_clusters_documents": q.dedup_clusters_documents,
        "cluster_representatives_documents":
            q.cluster_representatives_documents,
        # similarity search
        "knn_embeddings": q.knn_embeddings,
        "lsh_ann_embeddings": q.lsh_ann_embeddings,
        "ivf_ann_embeddings": q.ivf_ann_embeddings,
        "near_dup_embeddings": q.near_dup_embeddings,
        # multimodal (real netpbm/PIL decode; binary payloads; rows-only)
        "media_decode_features": q.media_decode_features,
        "media_frame_plan": q.media_frame_plan,
        # custom joins beyond as-of
        "range_join_events": q.range_join_events,
        "order_priority_revenue": q.order_priority_revenue,
        "customers_without_orders": q.customers_without_orders,
        # windowed / stream-shaped
        "tumbling_events": q.tumbling_events,
        "hopping_events": q.hopping_events,
        "sessions_events": q.sessions_events,
        "running_totals_events": q.running_totals_events,
        "moving_avg_events": q.moving_avg_events,
        "user_features_events": q.user_features_events,
        "funnel_events": q.funnel_events,
        "weighted_sample_documents": q.weighted_sample_documents,
        "entropy_documents": q.entropy_documents,
        "upsert_orders": q.upsert_orders,
        "table_diff_orders": q.table_diff_orders,
        "range_partition_orders": q.range_partition_orders,
        # exact distributed quantiles (value-counts reduction)
        "quantiles_lineitem": q.quantiles_lineitem,
        "group_quantiles_lineitem": q.group_quantiles_lineitem,
        "approx_quantile_check_lineitem": q.approx_quantile_check_lineitem,
        "group_approx_quantile_check_lineitem":
            q.group_approx_quantile_check_lineitem,
        "registry_diff_documents": q.registry_diff_documents,
        # distributed scan (prefix sum) + deterministic shuffle
        "pack_documents": q.pack_documents,
        "shuffle_documents": q.shuffle_documents,
        # inverted-index term stats (document frequency)
        "term_df_documents": q.term_df_documents,
        # flagship transcript engine (non-SQL: full constraint suite)
        "transcript_violations": q.transcript_violations,
        "transcript_verdict": q.transcript_verdict,
        "transcript_resumable": q.transcript_resumable,
        "transcript_conv_stats": q.transcript_conv_stats,
        "transcript_flatten": q.transcript_flatten,
        "transcript_pairs": q.transcript_pairs,
        "pack_conversations": q.pack_conversations,
        "dup_turns_transcript": q.dup_turns_transcript,
        "role_perplexity_transcript": q.role_perplexity_transcript,
        "response_latency_transcript": q.response_latency_transcript,
        "tool_usage_transcript": q.tool_usage_transcript,
        "role_length_quantiles_transcript":
            q.role_length_quantiles_transcript,
        "corpus_prep_transcript": q.corpus_prep_transcript,
        "turncount_reconcile_transcript": q.turncount_reconcile_transcript,
        "truncate_conversations_transcript":
            q.truncate_conversations_transcript,
        "schema_check_transcript": q.schema_check_transcript,
        "rowgroup_prune_orders": q.rowgroup_prune_orders,
        "file_census_transcript": q.file_census_transcript,
        "composition_documents": q.composition_documents,
        "transcript_role_transitions": q.transcript_role_transitions,
        "transcript_conditional": q.transcript_conditional,
    }


# Shared DuckDB CTE: word-3-gram Jaccard>=0.5 pairs -> symmetric edge set
# -> recursive min-label closure.  Used by BOTH dedup-cluster oracles so a
# threshold/tokenizer change cannot make them silently disagree (the engine
# analogue is stages/dedup.ngram_jaccard_exact_pairs + stages/graph).
# g/ex/p/e are MATERIALIZED and the pair join is a posting-list equi-join
# (explode grams, join on gram, count = |intersection| since grams are
# per-doc distinct; |union| = |A|+|B|-inter): the naive quadratic
# `g a JOIN g b ON a.doc_id < b.doc_id` with list_intersect ran >40 min
# single-threaded inside the recursive CTE at sf0.1's 5k docs, while this
# form only touches doc pairs that share a gram and parallelizes.
_JACCARD_CLUSTER_CTE = r"""
            WITH RECURSIVE g AS MATERIALIZED (
                SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, greatest(len(toks) - 2,
                        CASE WHEN len(toks) > 0 AND len(toks) < 3
                             THEN 1 ELSE 0 END)),
                    i -> CASE WHEN len(toks) >= 3
                              THEN toks[i] || ' ' || toks[i+1] || ' '
                                   || toks[i+2]
                              ELSE array_to_string(toks, ' ') END)) AS grams
                FROM (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                                 AS toks
                      FROM documents)
            ), ex AS MATERIALIZED (
                SELECT doc_id, unnest(grams) AS gram FROM g
            ), p AS MATERIALIZED (
                SELECT j.id_a, j.id_b
                FROM (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                             count(*) AS inter
                      FROM ex x JOIN ex y
                        ON x.gram = y.gram AND x.doc_id < y.doc_id
                      GROUP BY 1, 2) j
                JOIN g ga ON ga.doc_id = j.id_a
                JOIN g gb ON gb.doc_id = j.id_b
                WHERE j.inter::DOUBLE
                      / (len(ga.grams) + len(gb.grams) - j.inter) >= 0.5
            ), e AS MATERIALIZED (
                SELECT id_a AS u, id_b AS v FROM p
                UNION ALL SELECT id_b, id_a FROM p
            ), r(u, v) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM e)
                UNION
                SELECT e.u, r.v FROM e JOIN r ON e.v = r.u
            )
"""


def oracle_sql() -> dict[str, str]:
    stop_alt = "|".join(
        ["the", "and", "of", "a", "to", "in", "is", "that", "it", "for"])
    return {
        "null_census_documents": r"""
            WITH cols(column_name) AS (VALUES ('text'), ('lang'), ('source'))
            SELECT 'text' AS "column",
                   count(*) FILTER (WHERE text IS NULL
                                    OR regexp_matches(text, '^\s*$')) AS n_missing,
                   count(*) AS n_rows FROM documents
            UNION ALL
            SELECT 'lang', count(*) FILTER (WHERE lang IS NULL
                                    OR regexp_matches(lang, '^\s*$')),
                   count(*) FROM documents
            UNION ALL
            SELECT 'source', count(*) FILTER (WHERE source IS NULL
                                    OR regexp_matches(source, '^\s*$')),
                   count(*) FROM documents
        """,
        "enum_violations_events": """
            SELECT event_id, event_type FROM events
            WHERE event_type IS NULL
               OR event_type NOT IN ('click', 'view', 'purchase')
        """,
        "regex_violations_customer": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT regexp_full_match(c_name, 'Customer#0000000[0-9]{2}')
        """,
        "integer_violations_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE round(l_quantity) <> l_quantity
        """,
        "sequence_stats_lineitem": """
            SELECT l_orderkey,
                   count(*) AS n_items,
                   min(l_linenumber)::BIGINT AS min_ln,
                   max(l_linenumber)::BIGINT AS max_ln,
                   (min(l_linenumber) = 1
                    AND count(*) = max(l_linenumber)) AS is_contiguous
            FROM lineitem GROUP BY l_orderkey
        """,
        "sequence_violations_lineitem": """
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING NOT (min(l_linenumber) = 1
                        AND count(DISTINCT l_linenumber) = max(l_linenumber))
        """,
        "unique_violations_lineitem": """
            SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
        """,
        "ref_orphans_orders": """
            SELECT DISTINCT o.o_custkey FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        """,
        "asof_latest_order": """
            WITH r AS (
                SELECT o_custkey, o_orderdate,
                       max(o_totalprice) AS o_totalprice
                FROM orders GROUP BY o_custkey, o_orderdate
            )
            SELECT e.event_id, e.user_id, r.o_orderdate,
                   round(r.o_totalprice, 2) AS o_totalprice
            FROM events e
            ASOF LEFT JOIN r
              ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "pivot_events": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) FILTER (WHERE event_type = 'click') AS click,
                   count(*) FILTER (WHERE event_type = 'error') AS error,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS signup,
                   count(*) FILTER (WHERE event_type = 'view') AS "view"
            FROM events GROUP BY day
        """,
        "distinct_counts_events": """
            SELECT 'user_id' AS "column",
                   count(DISTINCT user_id) AS n_distinct FROM events
            UNION ALL
            SELECT 'event_type', count(DISTINCT event_type) FROM events
        """,
        "csv_roundtrip_events": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM (SELECT * FROM events ORDER BY event_id LIMIT 2000)
            GROUP BY event_type
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice, rk
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey) - 1 AS rk
                FROM orders)
            WHERE rk < 2
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   round(sum(o.o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "rollup_revenue": """
            SELECT coalesce(n.n_name, '(all)') AS n_name,
                   coalesce(o.o_orderpriority, '(all)')
                       AS o_orderpriority,
                   round(sum(o.o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
            ORDER BY n_name, o_orderpriority
        """,
        "rowcounts": """
            SELECT 'region' AS table_name, count(*) AS n_rows FROM region
            UNION ALL SELECT 'nation', count(*) FROM nation
            UNION ALL SELECT 'customer', count(*) FROM customer
            UNION ALL SELECT 'supplier', count(*) FROM supplier
            UNION ALL SELECT 'part', count(*) FROM part
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'lineitem', count(*) FROM lineitem
            UNION ALL SELECT 'events', count(*) FROM events
            UNION ALL SELECT 'documents', count(*) FROM documents
            UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        """,
        "exact_dedup_documents": """
            SELECT md5(text) AS fp, min(doc_id) AS keep_id,
                   count(*) AS n_docs
            FROM documents GROUP BY md5(text)
        """,
        # cross-doc substring duplication: a k=8 token window duplicated
        # iff it occurs in >=2 DISTINCT docs; dup_tokens = union length of
        # marked [pos, pos+8) spans (lead() merges overlaps).  The oracle
        # compares window STRINGS where the engine compares window hashes
        # — identical up to negligible 64-bit collisions, the same
        # convention as jaccard_pairs_documents.
        "substring_dup_documents": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(coalesce(text, ''),
                                                  '\S+') AS t
                FROM documents
            ), w AS (
                SELECT doc_id,
                       unnest(generate_series(1, len(t) - 7)) AS pos,
                       unnest(list_transform(
                           generate_series(1, len(t) - 7),
                           i -> array_to_string(t[i:i+7], ' '))) AS win
                FROM toks WHERE len(t) >= 8
            ), dup AS (
                SELECT win FROM w
                GROUP BY win HAVING count(DISTINCT doc_id) >= 2
            ), marked AS (
                SELECT w.doc_id, w.pos,
                       lead(w.pos) OVER (PARTITION BY w.doc_id
                                         ORDER BY w.pos) AS nxt
                FROM w JOIN dup USING (win)
            ), cov AS (
                SELECT doc_id, count(*) AS n_dup_windows,
                       sum(least(coalesce(nxt - pos, 8), 8)) AS dup_tokens
                FROM marked GROUP BY doc_id
            )
            SELECT b.doc_id,
                   len(b.t)::BIGINT AS n_tokens,
                   greatest(len(b.t) - 7, 0)::BIGINT AS n_windows,
                   coalesce(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
                   coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
                   round(coalesce(c.dup_tokens, 0)::DOUBLE
                         / nullif(len(b.t), 0), 6) AS dup_ratio
            FROM toks b LEFT JOIN cov c USING (doc_id)
        """,
        "token_stats_documents": rf"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '\S+')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '\b(?:{stop_alt})\b'))
                       AS n_stopwords
            FROM documents
        """,
        "fingerprint_documents": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "quality_documents": rf"""
            WITH c AS (
                SELECT doc_id,
                       length(coalesce(text, '')) AS nc,
                       length(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS nt,
                       length(regexp_extract_all(coalesce(text, ''),
                              '[!-/:-@\[-`{{-~]')) AS np,
                       length(regexp_extract_all(coalesce(text, ''),
                              '(?i)\b(?:{stop_alt})\b')) AS ns
                FROM documents
            ), r AS (
                SELECT doc_id, nc, nt,
                       np / greatest(nc, 1)::DOUBLE AS punct_ratio,
                       ns / greatest(nt, 1)::DOUBLE AS stopword_ratio,
                       nc / greatest(nt, 1)::DOUBLE AS mean_tok
                FROM c
            )
            SELECT doc_id, nc AS n_chars, nt AS n_tokens,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(stopword_ratio, 6) AS stopword_ratio,
                   round(
                       least(greatest(nt / 50.0, 0), 1) * 0.3
                       + least(greatest(stopword_ratio / 0.4, 0), 1) * 0.3
                       + (1 - least(greatest(punct_ratio / 0.2, 0), 1)) * 0.2
                       + exp(-0.5 * pow((mean_tok - 5.0) / 3.0, 2)) * 0.2,
                       6) AS quality_score
            FROM r
        """,
        "mixture_sample_documents": """
            SELECT doc_id, source FROM documents
            WHERE CAST(concat('0x', substr(md5(concat('mix:',
                           CAST(doc_id AS VARCHAR))), 1, 8))
                       AS BIGINT) % 100
                  < least(10 + 5 * CAST(substr(source, 4) AS BIGINT), 100)
        """,
        "fisher_scores_embeddings": """
            WITH flat AS (
                SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
                       unnest(range(1, len(embedding) + 1)) AS pos
                FROM embeddings
            ), lab AS (
                SELECT label, pos, count(*) AS n, avg(v) AS mu,
                       sum(v * v) / count(*) - pow(avg(v), 2) AS w
                FROM flat GROUP BY label, pos
            ), tot AS (
                SELECT pos, sum(n) AS nn,
                       sum(n * mu) / sum(n) AS gmu
                FROM lab GROUP BY pos
            )
            SELECT CAST(l.pos AS BIGINT) AS pos,
                   round((sum(l.n * pow(l.mu - t.gmu, 2)) / t.nn)
                         / (sum(l.n * l.w) / t.nn), 5) AS fisher
            FROM lab l JOIN tot t ON t.pos = l.pos
            GROUP BY l.pos, t.nn
        """,
        "label_variance_embeddings": """
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(pos AS BIGINT) AS pos,
                   round(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))
                             / count(*)
                         - pow(sum(CAST(v AS DOUBLE)) / count(*), 2), 5)
                       AS var_v
            FROM (SELECT label, unnest(embedding) AS v,
                         unnest(range(1, len(embedding) + 1)) AS pos
                  FROM embeddings)
            GROUP BY label, pos
        """,
        "label_centroids_embeddings": """
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   round(avg(CAST(v AS DOUBLE)), 5) AS mean_v
            FROM (SELECT label, unnest(embedding) AS v,
                         unnest(range(1, len(embedding) + 1)) AS pos
                  FROM embeddings)
            GROUP BY label, pos
        """,
        "repetition_documents": """
            WITH c AS (
                SELECT doc_id,
                       len(string_split(coalesce(text, ''), chr(10))) AS nl,
                       len(list_distinct(
                           string_split(coalesce(text, ''), chr(10)))) AS nd
                FROM documents
            )
            SELECT doc_id,
                   CAST(nl AS BIGINT) AS n_lines,
                   CAST(nd AS BIGINT) AS n_distinct_lines,
                   round((nl - nd) / greatest(nl, 1)::DOUBLE, 6)
                       AS dup_line_frac,
                   (nl - nd) * 10 > 3 * nl AS is_repetitive
            FROM c
        """,
        "langid_documents": r"""
            WITH c AS (
                SELECT doc_id,
                       length(regexp_extract_all(coalesce(text, ''),
                           '(?i)\b(?:the|and|of|is|to|that|with)\b')) AS s_en,
                       length(regexp_extract_all(coalesce(text, ''),
                           '(?i)\b(?:der|die|und|das|nicht|ist|ein)\b')) AS s_de,
                       length(regexp_extract_all(coalesce(text, ''),
                           '(?i)\b(?:le|la|les|et|est|une|que)\b')) AS s_fr,
                       length(regexp_extract_all(coalesce(text, ''),
                           '(?i)\b(?:el|los|las|es|una|que|para)\b')) AS s_es,
                       length(regexp_extract_all(coalesce(text, ''),
                           '[一-鿿]')) AS s_cjk
                FROM documents
            )
            SELECT doc_id,
                   CASE
                       WHEN s_cjk > 0 THEN 'zh'
                       WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                       -- argmax with first-wins tie-break in (en,de,fr,es)
                       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                           THEN 'en'
                       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                       WHEN s_fr >= s_es THEN 'fr'
                       ELSE 'es'
                   END AS lang_pred
            FROM c
        """,
        "colstats_lineitem": """
            SELECT l_returnflag, 'l_quantity' AS "column",
                   count(*) AS n,
                   round(avg(l_quantity), 4) AS mean,
                   round(stddev_pop(l_quantity), 4) AS std,
                   round(min(l_quantity), 2) AS min_v,
                   round(max(l_quantity), 2) AS max_v
            FROM lineitem GROUP BY l_returnflag
            UNION ALL
            SELECT l_returnflag, 'l_extendedprice', count(*),
                   round(avg(l_extendedprice), 4),
                   round(stddev_pop(l_extendedprice), 4),
                   round(min(l_extendedprice), 2),
                   round(max(l_extendedprice), 2)
            FROM lineitem GROUP BY l_returnflag
        """,
        "drift_psi_events": """
            WITH e AS (
                SELECT event_type, event_id % 2 AS side,
                       CAST(least(floor(value / 25.0), 19) AS BIGINT)
                           AS bucket
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ), c AS (
                SELECT event_type, side, bucket, count(*) AS n
                FROM e GROUP BY 1, 2, 3
            ), tot AS (
                SELECT event_type, side, sum(n) AS tot FROM c GROUP BY 1, 2
            ), grid AS (
                SELECT t.event_type, t.side, g.bucket, t.tot
                FROM tot t, (SELECT unnest(range(0, 20)) AS bucket) g
            ), f AS (
                SELECT grid.event_type, grid.side, grid.bucket,
                       coalesce(c.n, 0) AS n, grid.tot
                FROM grid LEFT JOIN c
                  ON c.event_type = grid.event_type
                 AND c.side = grid.side AND c.bucket = grid.bucket
            ), pq AS (
                SELECT event_type, bucket,
                       max(CASE WHEN side = 0
                                THEN (n + 1.0) / (tot + 20.0) END) AS p,
                       max(CASE WHEN side = 1
                                THEN (n + 1.0) / (tot + 20.0) END) AS q
                FROM f GROUP BY 1, 2
            )
            SELECT pq.event_type,
                   CAST(ta.tot AS BIGINT) AS n_a,
                   CAST(tb.tot AS BIGINT) AS n_b,
                   round(sum((pq.p - pq.q) * ln(pq.p / pq.q)), 6) AS psi
            FROM pq
            JOIN tot ta ON ta.event_type = pq.event_type AND ta.side = 0
            JOIN tot tb ON tb.event_type = pq.event_type AND tb.side = 1
            GROUP BY pq.event_type, ta.tot, tb.tot
        """,
        "quantize_embeddings": """
            WITH m AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ), s AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS ma
                FROM m
            ), q AS (
                SELECT vec_id, ma,
                       list_transform(v, x -> floor(x * 127.0 /
                           (CASE WHEN ma > 0 THEN ma ELSE 1.0 END) + 0.5))
                           AS ql
                FROM s
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   round(ma / 127.0, 6) AS scale,
                   CAST(list_sum(ql) AS BIGINT) AS sum_q,
                   CAST(list_min(ql) AS BIGINT) AS min_q,
                   CAST(list_max(ql) AS BIGINT) AS max_q
            FROM q
        """,
        "outlier_filter_events": """
            WITH s AS (
                SELECT event_type,
                       avg(value) + 3 * stddev_pop(value) AS cut
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
                GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value
            FROM events e JOIN s USING (event_type)
            WHERE e.value IS NOT NULL AND e.value > s.cut
        """,
        "redact_events": r"""
            SELECT event_id,
                   length(regexp_extract_all(coalesce(props, ''),
                          '[0-9]+(?:\.[0-9]+)?')) AS n_redacted,
                   md5(regexp_replace(coalesce(props, ''),
                       '[0-9]+(?:\.[0-9]+)?', '#', 'g')) AS fp
            FROM events
        """,
        "tfidf_top_terms_documents": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           lower(coalesce(text, '')), '[a-z0-9]+')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
            ), df AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term
            ), scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       row_number() OVER (PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) - 1
                           AS rank
                FROM tf JOIN df USING (term)
            )
            SELECT doc_id, rank, term, tf, df,
                   round(tf * ln((SELECT count(*) FROM documents)::DOUBLE
                                 / df), 6) AS score
            FROM scored WHERE rank < 3
        """,
        "unigram_logprob_documents": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           lower(coalesce(text, '')), '[a-z0-9]+')) AS term
                FROM documents
            ), freq AS (
                SELECT term, count(*) AS c FROM tok GROUP BY term
            ), tot AS (
                SELECT sum(c)::DOUBLE AS t FROM freq
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(ln(f.c / (SELECT t FROM tot))), 6)
                       AS avg_logprob
            FROM tok JOIN freq f USING (term)
            GROUP BY doc_id
        """,
        "props_stats_events": """
            SELECT event_type,
                   -- sum(BIGINT) yields HUGEINT (float64 in pandas); cast
                   -- back to BIGINT to match the engine's int64
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "sample_documents": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(concat('0x', substr(md5(coalesce(text, '')), 1, 8))
                       AS BIGINT) % 100 < 20
        """,
        "stratified_sample_documents": """
            SELECT lang, doc_id, rk FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5(coalesce(text, '')), doc_id) - 1
                           AS rk
                FROM documents)
            WHERE rk < 20
        """,
        "sink_roundtrip_documents": """
            SELECT CASE WHEN lang IS NULL OR trim(lang) = '' THEN 'und'
                        ELSE lang END AS lang_p,
                   count(*) AS n_docs,
                   -- sum() yields HUGEINT; cast to match the engine's int64
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY lang_p
        """,
        "jsonl_roundtrip_documents": """
            SELECT coalesce(lang, 'und') AS lang_p,
                   count(*) AS n_docs,
                   CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                       AS n_chars
            FROM documents GROUP BY lang_p
        """,
        # compact_documents: file-count census (filesystem state, not SQL-
        # expressible) — rows-only check; row conservation asserted in-row
        "rank_normalize_events": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(value AS DOUBLE) AS value,
                   CAST(rank() OVER (ORDER BY value) - 1 AS BIGINT)
                       AS rank_lt,
                   percent_rank() OVER (ORDER BY value) AS pr
            FROM events WHERE value IS NOT NULL
        """,
        "covariance_embeddings": r"""
            WITH idx AS (SELECT unnest(range(1, 65)) AS k),
            stats AS (
                SELECT a.k AS i, b.k AS j,
                       sum(CAST(e.embedding[a.k] AS DOUBLE)
                           * CAST(e.embedding[b.k] AS DOUBLE)) AS sxy,
                       avg(CAST(e.embedding[a.k] AS DOUBLE)) AS mi,
                       avg(CAST(e.embedding[b.k] AS DOUBLE)) AS mj,
                       count(*) AS n
                FROM embeddings e, idx a, idx b
                GROUP BY a.k, b.k
            )
            SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                   round(sxy / n - mi * mj, 5) AS cov
            FROM stats
        """,
        "incremental_dedup_documents": r"""
            WITH snapshot AS (
                SELECT coalesce(text, '') AS text FROM documents
            ), newbatch AS (
                SELECT CAST(doc_id + 10000 AS BIGINT) AS doc_id,
                       coalesce(text, '') AS text
                FROM documents WHERE doc_id % 10 < 4
                UNION ALL
                SELECT CAST(doc_id + 20000 AS BIGINT),
                       coalesce(text, '') || ' <edit>'
                FROM documents WHERE doc_id % 10 >= 7
            )
            SELECT n.doc_id, n.text FROM newbatch n
            WHERE NOT EXISTS (SELECT 1 FROM snapshot s
                              WHERE s.text = n.text)
        """,
        "composition_documents": r"""
            WITH s AS (
                SELECT coalesce(source, 'unknown') AS source,
                       count(*) AS n_docs,
                       CAST(sum(length(regexp_extract_all(
                           coalesce(text, ''), '\S+'))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY coalesce(source, 'unknown')
            )
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
                   round(CAST(n_tokens AS DOUBLE)
                         / (SELECT sum(n_tokens) FROM s), 5)
                       AS token_share
            FROM s
        """,
        "stopword_filter_documents": r"""
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(string_split(coalesce(text, ''), ' ')) AS tok
                FROM documents
            ), stop AS (
                SELECT coalesce(list(tok), []) AS sl FROM (
                    SELECT tok FROM toks GROUP BY tok
                    HAVING count(*) >= CAST(ceil(
                        0.78 * (SELECT count(*) FROM documents)) AS BIGINT))
            ), cleaned AS (
                SELECT doc_id,
                       string_split(coalesce(text, ''), ' ') AS toks0,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> NOT list_contains(stop.sl, x))
                           AS kept
                FROM documents, stop
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   coalesce(array_to_string(kept, ' '), '') AS clean_text,
                   CAST(length(kept) AS BIGINT) AS n_kept,
                   CAST(length(toks0) - length(kept) AS BIGINT) AS n_dropped
            FROM cleaned
        """,
        "chunk_documents": r"""
            WITH ks AS (SELECT unnest(range(0, (
                    SELECT CAST(ceil(max(length(coalesce(text, '')))
                                     / 192.0) AS BIGINT) + 1
                    FROM documents))) AS k),
            docs AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       coalesce(text, '') AS text
                FROM documents
            )
            SELECT d.doc_id,
                   CAST(ks.k AS BIGINT) AS chunk_idx,
                   substr(d.text, CAST(ks.k * 192 + 1 AS BIGINT), 256)
                       AS chunk,
                   CAST(length(substr(d.text,
                        CAST(ks.k * 192 + 1 AS BIGINT), 256)) AS BIGINT)
                       AS chunk_len
            FROM docs d JOIN ks ON ks.k * 192 < length(d.text)
        """,
        "multienum_violations_documents": r"""
            WITH d AS (
                SELECT doc_id, lang || ';' || source AS tags FROM documents
            ), t AS (
                SELECT doc_id, tags,
                       list_filter(list_transform(
                           string_split(coalesce(tags, ''), ';'),
                           x -> trim(x)), x -> x <> '') AS toks
                FROM d
            )
            SELECT doc_id, tags FROM t
            WHERE NOT (
                tags IS NULL
                OR regexp_matches(tags, '^[\s\x0b\x1c-\x1f\x85\p{Z}]*$')
                OR tags IN ('NA', 'none', 'None', 'nan', 'NaN', 'NAN',
                            'N/A', 'n/a')
                OR (len(toks) > 0
                    AND len(list_filter(toks,
                        x -> x NOT IN ('en','de','fr','es','zh','src0','src1',
                                       'src2','src3','src4','src5','src6',
                                       'src7','src8','src9'))) = 0)
            )
        """,
        "timestamp_violations_events": r"""
            WITH d AS (
                SELECT event_id,
                       CASE event_id % 6
                           WHEN 0 THEN strftime(date_trunc('second', ts),
                                                '%Y-%m-%d %H:%M:%S')
                           WHEN 1 THEN strftime(date_trunc('second', ts),
                                                '%Y-%m-%dT%H:%M:%S')
                                       || '.'
                                       || CAST(event_id % 1000 AS VARCHAR)
                           WHEN 2 THEN strftime(ts, '%Y-%m-%d')
                           WHEN 3 THEN 'ts-' || CAST(event_id AS VARCHAR)
                           WHEN 4 THEN '2024-01.5-01'
                           ELSE 'NA'
                       END AS ts_str
                FROM events
            )
            SELECT event_id, ts_str FROM d
            WHERE ts_str <> 'NA'
              AND try_strptime(
                      regexp_replace(ts_str, '(:[0-9]{2})\.[0-9]+$', '\1'),
                      ['%Y-%m-%dT%H:%M:%S', '%Y-%m-%d %H:%M:%S',
                       '%Y-%m-%d']) IS NULL
        """,
        "decontam_documents": r"""
            WITH g AS (
                SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, greatest(len(toks) - 2,
                        CASE WHEN len(toks) > 0 AND len(toks) < 3
                             THEN 1 ELSE 0 END)),
                    i -> CASE WHEN len(toks) >= 3
                              THEN toks[i] || ' ' || toks[i+1] || ' '
                                   || toks[i+2]
                              ELSE array_to_string(toks, ' ') END)) AS grams
                FROM (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                                 AS toks
                      FROM documents)
            ), ev AS (
                SELECT DISTINCT unnest(grams) AS gm FROM g
                WHERE doc_id % 97 = 0
            )
            SELECT t.doc_id, count(*) AS n_shared_grams
            FROM (SELECT doc_id, unnest(grams) AS gm FROM g
                  WHERE doc_id % 97 <> 0) t
            JOIN ev ON t.gm = ev.gm
            GROUP BY t.doc_id
        """,
        "corpus_prep_documents": rf"""
            WITH c AS (
                SELECT doc_id, text,
                       length(coalesce(text, '')) AS nc,
                       length(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS nt,
                       length(regexp_extract_all(coalesce(text, ''),
                              '[!-/:-@\[-`{{-~]')) AS np,
                       length(regexp_extract_all(coalesce(text, ''),
                              '(?i)\b(?:{stop_alt})\b')) AS ns,
                       len(string_split(coalesce(text, ''), chr(10))) AS nl,
                       len(list_distinct(
                           string_split(coalesce(text, ''), chr(10)))) AS nd
                FROM documents
            ), scored AS (
                SELECT doc_id, text, nt, nl, nd,
                       round(
                           least(greatest(nt / 50.0, 0), 1) * 0.3
                           + least(greatest(
                               (ns / greatest(nt, 1)::DOUBLE) / 0.4, 0), 1)
                               * 0.3
                           + (1 - least(greatest(
                               (np / greatest(nc, 1)::DOUBLE) / 0.2, 0), 1))
                               * 0.2
                           + exp(-0.5 * pow(
                               (nc / greatest(nt, 1)::DOUBLE - 5.0) / 3.0,
                               2)) * 0.2,
                           6) AS score
                FROM c
            ), keep AS (
                SELECT doc_id, md5(text) AS fp,
                       CAST(nt AS BIGINT) AS n_tokens
                FROM scored
                WHERE score >= 0.65 AND (nl - nd) * 10 <= 3 * nl
            ), kept AS (
                SELECT k.doc_id, k.n_tokens FROM keep k
                JOIN (SELECT fp, min(doc_id) AS keep_id FROM keep
                      GROUP BY fp) f
                  ON k.doc_id = f.keep_id
            ), scan AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS run_sum
                FROM kept
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
                   CAST(floor((run_sum - n_tokens) / 1024.0) AS BIGINT)
                       AS bin_id
            FROM scan
        """,
        "dedup_keep_first_documents": """
            SELECT d.doc_id, d.text, d.lang FROM documents d
            JOIN (SELECT text, min(doc_id) AS keep FROM documents
                  GROUP BY text) k
              ON d.doc_id = k.keep
        """,
        "jaccard_pairs_documents": r"""
            WITH g AS MATERIALIZED (
                SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, greatest(len(toks) - 2,
                        CASE WHEN len(toks) > 0 AND len(toks) < 3
                             THEN 1 ELSE 0 END)),
                    i -> CASE WHEN len(toks) >= 3
                              THEN toks[i] || ' ' || toks[i+1] || ' '
                                   || toks[i+2]
                              ELSE array_to_string(toks, ' ') END)) AS grams
                FROM (SELECT doc_id,
                             regexp_extract_all(coalesce(text, ''), '\S+')
                                 AS toks
                      FROM documents)
            ), ex AS MATERIALIZED (
                SELECT doc_id, unnest(grams) AS gram FROM g
            )
            SELECT j.id_a, j.id_b,
                   round(j.inter::DOUBLE
                         / (len(ga.grams) + len(gb.grams) - j.inter), 6)
                       AS jaccard
            FROM (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                         count(*) AS inter
                  FROM ex x JOIN ex y
                    ON x.gram = y.gram AND x.doc_id < y.doc_id
                  GROUP BY 1, 2) j
            JOIN g ga ON ga.doc_id = j.id_a
            JOIN g gb ON gb.doc_id = j.id_b
            WHERE j.inter::DOUBLE
                  / (len(ga.grams) + len(gb.grams) - j.inter) >= 0.5
        """,
        "dedup_clusters_documents": _JACCARD_CLUSTER_CTE + """
            SELECT u AS doc_id, min(v) AS cluster_id FROM r GROUP BY u
        """,
        "cluster_representatives_documents": _JACCARD_CLUSTER_CTE + """
            , comp AS (
                SELECT u AS doc_id, min(v) AS cluster_id FROM r GROUP BY u
            ), wl AS (
                SELECT c.cluster_id, c.doc_id,
                       length(coalesce(d.text, '')) AS n_chars
                FROM comp c JOIN documents d ON d.doc_id = c.doc_id
            ), ranked AS (
                SELECT cluster_id, doc_id, n_chars,
                       row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) AS rn,
                       count(*) OVER (PARTITION BY cluster_id) AS n_docs
                FROM wl
            )
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
                   CAST(doc_id AS BIGINT) AS rep_doc_id,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_chars AS BIGINT) AS rep_chars
            FROM ranked WHERE rn = 1
        """,
        "range_join_events": """
            SELECT p.event_id, count(*) AS n_clicks
            FROM events p JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id
        """,
        "pack_documents": r"""
            WITH toks AS (
                SELECT doc_id,
                       length(regexp_extract_all(coalesce(text, ''),
                                                 '\S+')) AS n_tokens
                FROM documents
            ), scan AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS run_sum
                FROM toks
            )
            SELECT doc_id, n_tokens,
                   CAST(floor((run_sum - n_tokens) / 1024.0) AS BIGINT)
                       AS bin_id
            FROM scan
        """,
        "shuffle_documents": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents ORDER BY shuffle_key LIMIT 200
        """,
        "term_df_documents": r"""
            WITH toks AS (
                SELECT doc_id, unnest(list_distinct(
                    regexp_extract_all(lower(coalesce(text, '')),
                                       '[a-z0-9]+'))) AS term
                FROM documents
            )
            SELECT term, count(*) AS df FROM toks GROUP BY term
            ORDER BY df DESC, term LIMIT 20
        """,
        "order_priority_revenue": """
            SELECT o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
            ORDER BY o.o_orderpriority
        """,
        "customers_without_orders": """
            SELECT c.c_custkey, c.c_name
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
            ORDER BY c.c_custkey
        """,
        "hopping_events": """
            WITH w AS (
                SELECT event_type, value,
                       unnest(generate_series(
                           CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                               - 5400,
                           CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800,
                           CAST(1800 AS BIGINT))) AS window_start
                FROM events
            )
            SELECT event_type, window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM w GROUP BY event_type, window_start
        """,
        "tumbling_events": """
            SELECT event_type,
                   -- floor, not ::BIGINT (DuckDB casts round-to-nearest)
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                       AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type, window_start
        """,
        "sessions_events": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   -- DuckDB sum() yields HUGEINT; cast so the typed value
                   -- hash matches the engine's int64 (cf. tumbling_events)
                   CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "running_totals_events": """
            SELECT event_id, user_id,
                   count(*) OVER w AS run_n,
                   round(sum(value) OVER w, 4) AS run_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "range_partition_orders": """
            WITH bl AS (
                SELECT quantile_disc(o_orderkey,
                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS b
                FROM orders
            )
            SELECT CAST(len(list_filter(bl.b, x -> x <= o_orderkey))
                        AS BIGINT) AS part,
                   count(*) AS n,
                   CAST(min(o_orderkey) AS BIGINT) AS min_key,
                   CAST(max(o_orderkey) AS BIGINT) AS max_key
            FROM orders, bl GROUP BY 1
        """,
        "table_diff_orders": """
            WITH a AS (
                SELECT CAST(o_orderkey AS BIGINT) AS k,
                       CAST(o_totalprice AS DOUBLE) AS price_a
                FROM orders
            ), b AS (
                SELECT CAST(o_orderkey AS BIGINT) AS k,
                       CASE WHEN o_orderkey % 10 < 3
                            THEN round(CAST(o_totalprice AS DOUBLE)
                                       * 1.1, 2)
                            ELSE CAST(o_totalprice AS DOUBLE) END
                           AS price_b
                FROM orders WHERE o_orderkey % 10 <> 9
                UNION ALL
                SELECT CAST(o_orderkey + 1000000 AS BIGINT), 1.0
                FROM orders WHERE o_orderkey % 10 = 4
            )
            SELECT coalesce(a.k, b.k) AS o_orderkey,
                   CASE WHEN a.k IS NULL THEN 'added'
                        WHEN b.k IS NULL THEN 'removed'
                        WHEN a.price_a = b.price_b THEN 'same'
                        ELSE 'updated' END AS status
            FROM a FULL OUTER JOIN b ON a.k = b.k
        """,
        "upsert_orders": """
            WITH merged AS (
                SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                       0 AS version
                FROM orders
                UNION ALL
                SELECT CAST(o_orderkey AS BIGINT),
                       round(CAST(o_totalprice AS DOUBLE) * 1.1, 2), 1
                FROM orders WHERE o_orderkey % 10 < 3
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY o_orderkey
                              ORDER BY version DESC) AS rn
                FROM merged
            )
            SELECT o_orderkey, o_totalprice,
                   CAST(version AS BIGINT) AS version
            FROM ranked WHERE rn = 1
        """,
        "entropy_documents": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   round(entropy(c), 5) AS ent
            FROM (SELECT doc_id,
                         unnest(string_split_regex(coalesce(text, ''),
                                                   '')) AS c
                  FROM documents)
            GROUP BY doc_id
        """,
        "weighted_sample_documents": """
            SELECT doc_id, n_chars, skey FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CAST(length(coalesce(text, '')) AS BIGINT)
                           AS n_chars,
                       round(pow(
                           (CAST(concat('0x', substr(
                                md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                AS BIGINT) + 1) / 4294967296.0,
                           1.0 / (length(coalesce(text, '')) + 1)), 6)
                           AS skey
                FROM documents)
            ORDER BY skey DESC, doc_id DESC LIMIT 100
        """,
        "funnel_events": """
            WITH s AS (
                SELECT user_id,
                       min(ts) FILTER (WHERE event_type = 'signup')
                           AS ts_s
                FROM events WHERE user_id IS NOT NULL GROUP BY user_id
            ), v AS (
                SELECT e.user_id, min(e.ts) AS ts_v
                FROM events e JOIN s ON s.user_id = e.user_id
                WHERE e.event_type = 'view' AND e.ts >= s.ts_s
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS ts_p
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= v.ts_v
                GROUP BY e.user_id
            )
            SELECT CAST(s.user_id AS BIGINT) AS user_id,
                   CAST(epoch_us(s.ts_s) AS BIGINT) AS ts_signup,
                   CAST(epoch_us(v.ts_v) AS BIGINT) AS ts_view,
                   CAST(epoch_us(p.ts_p) AS BIGINT) AS ts_purchase
            FROM s LEFT JOIN v ON v.user_id = s.user_id
                   LEFT JOIN p ON p.user_id = s.user_id
        """,
        "user_features_events": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   count(*) FILTER (WHERE event_type = 'click')
                       AS n_click,
                   count(*) FILTER (WHERE event_type = 'error')
                       AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')
                       AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   round(coalesce(sum(value), 0), 4) AS sum_value,
                   CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
                       AS span_s
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        """,
        "moving_avg_events": """
            SELECT event_id, user_id,
                   count(*) OVER w AS win_n,
                   round(coalesce(sum(value) OVER w, 0), 4) AS win_sum,
                   round(coalesce(sum(value) OVER w, 0)
                         / count(*) OVER w, 4) AS win_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "quantiles_lineitem": """
            -- q values are binary-exact (k/2^m) so q*n is integer-exact
            SELECT 0.25 AS q, quantile_disc(l_quantity, 0.25) AS value
            FROM lineitem
            UNION ALL SELECT 0.5, quantile_disc(l_quantity, 0.5)
            FROM lineitem
            UNION ALL SELECT 0.75, quantile_disc(l_quantity, 0.75)
            FROM lineitem
            UNION ALL SELECT 0.875, quantile_disc(l_quantity, 0.875)
            FROM lineitem
        """,
        "group_quantiles_lineitem": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.5) AS p50,
                   quantile_disc(l_quantity, 0.75) AS p75,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "approx_quantile_check_lineitem": """
            -- tolerance-checked approx-quantile oracle: the engine's
            -- within_tol is DATA-DERIVED (exact distributed rank count of
            -- the t-digest answer, no digest self-report), so the
            -- expected-constant rows genuinely gate the error bound
            SELECT CAST(q AS DOUBLE) AS q, within_tol
            FROM (VALUES (0.25, TRUE), (0.5, TRUE), (0.75, TRUE),
                         (0.9, TRUE)) t(q, within_tol)
        """,
        "group_approx_quantile_check_lineitem": """
            -- per-group tolerance gate: groups come from the data, the
            -- expected verdict is TRUE for every (group, q) — the engine
            -- side re-derives each group's true rank by exact count.
            -- Group universe = groups with >=1 FINITE measure value (a
            -- group of only null/NaN/inf values has no quantiles and the
            -- engine emits no rows for it).
            SELECT l_returnflag, CAST(q AS DOUBLE) AS q,
                   TRUE AS within_tol
            FROM (SELECT DISTINCT l_returnflag FROM lineitem
                  WHERE l_extendedprice IS NOT NULL
                    AND NOT isnan(l_extendedprice)
                    AND NOT isinf(l_extendedprice))
            CROSS JOIN (VALUES (0.25), (0.5), (0.9)) t(q)
        """,
        "registry_diff_documents": """
            -- null-like class NL(v) mirrors the engine's null model:
            -- true-null, blank, textual null tokens, or the sentinel.
            -- Enum with vocab lacking 'NA': NL rows are INVALID; Regex:
            -- NL rows are SPECIAL (pass).  n_null counts NL for string
            -- columns.  (\\s* is RE2-ASCII — the engine's wider Unicode
            -- blank class diverges only on exotic whitespace absent from
            -- these corpora.)
            WITH f AS (
                SELECT
                    (lang IS NULL OR regexp_full_match(lang, '\\s*')
                     OR lang IN ('none','None','nan','NaN','NAN',
                                 'N/A','n/a','NA')) AS lang_nl,
                    (source IS NULL OR regexp_full_match(source, '\\s*')
                     OR source IN ('none','None','nan','NaN','NAN',
                                   'N/A','n/a','NA')) AS src_nl,
                    lang, source, n_chars, doc_id
                FROM documents
            ), m AS (
                SELECT
                    count(*) FILTER (WHERE lang_nl OR lang NOT IN
                        ('en', 'de', 'fr')) AS lang_old,
                    count(*) FILTER (WHERE lang_nl OR lang NOT IN
                        ('en', 'de', 'fr', 'es', 'zh')) AS lang_new,
                    count(*) FILTER (WHERE NOT src_nl AND NOT
                        regexp_full_match(source, 'src[0-9]')) AS src_old,
                    count(*) FILTER (WHERE lang_nl) AS lang_null,
                    count(*) FILTER (WHERE src_nl) AS src_null,
                    count(*) FILTER (WHERE n_chars IS NULL) AS nch_null,
                    count(*) FILTER (WHERE doc_id IS NULL) AS id_null
                FROM f
            )
            SELECT * FROM (
                -- integer/float rules on native numeric columns cannot
                -- fail (every value parses); enum/regex counts are
                -- data-derived above
                SELECT 'doc_id' AS "column",
                       CAST(NULL AS VARCHAR) AS constraint_old,
                       'integer:doc_id' AS constraint_new,
                       CAST(NULL AS BIGINT) AS n_invalid_old,
                       0::BIGINT AS n_invalid_new,
                       CAST(NULL AS BIGINT) AS n_null_old,
                       id_null::BIGINT AS n_null_new,
                       'absent' AS verdict_old, 'pass' AS verdict_new,
                       'added' AS change
                FROM m
                UNION ALL
                SELECT 'lang', 'enum:lang', 'enum:lang',
                       lang_old::BIGINT, lang_new::BIGINT,
                       lang_null::BIGINT, lang_null::BIGINT,
                       CASE WHEN lang_old > 0 THEN 'fail' ELSE 'pass' END,
                       CASE WHEN lang_new > 0 THEN 'fail' ELSE 'pass' END,
                       CASE WHEN lang_old > 0 AND lang_new > 0
                                THEN 'unchanged_fail'
                            WHEN lang_old = 0 AND lang_new = 0
                                THEN 'unchanged_pass'
                            WHEN lang_old > 0 THEN 'fixed'
                            ELSE 'broken' END
                FROM m
                UNION ALL
                SELECT 'n_chars', 'integer:n_chars', 'float:n_chars',
                       0::BIGINT, 0::BIGINT,
                       nch_null::BIGINT, nch_null::BIGINT,
                       'pass', 'pass', 'unchanged_pass'
                FROM m
                UNION ALL
                SELECT 'source', 'regex:source', CAST(NULL AS VARCHAR),
                       src_old::BIGINT, CAST(NULL AS BIGINT),
                       src_null::BIGINT, CAST(NULL AS BIGINT),
                       CASE WHEN src_old > 0 THEN 'fail' ELSE 'pass' END,
                       'absent', 'removed'
                FROM m
            )
        """,
        "knn_embeddings": """
            WITH q AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_idx,
                       embedding
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id LIMIT 3)
            ), scored AS (
                SELECT q.query_idx, e.vec_id,
                       list_cosine_similarity(q.embedding, e.embedding) AS s
                FROM q CROSS JOIN embeddings e
            ), ranked AS (
                SELECT query_idx, vec_id,
                       row_number() OVER (PARTITION BY query_idx
                                          ORDER BY s DESC, vec_id) - 1 AS rank
                FROM scored
            )
            SELECT query_idx, rank, vec_id FROM ranked WHERE rank < 5
        """,
        "near_dup_embeddings": """
            -- 0.465 sits mid-gap in the pairwise-cosine distribution at
            -- sf0.01 so the engine's f32 matmul and DuckDB's f64 cosine
            -- agree on membership with wide margin — and rows > 0
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.465
        """,
        # minhash / simhash / lsh-ann / ivf-ann / media: hash- or
        # sketch-based (recall < 1 by construction) — intentionally no SQL
        # oracle (driver records the rows-only check)
        **_transcript_oracles(),
    }


# --------------------------------------------------------------- transcript
# oracle SQL for the flagship engine queries.  The corpus is deterministic
# seeded parquet under /tmp (sources/synth.py, no Ray involved), so DuckDB
# can recompute the full violation stream / verdict from first principles:
# the SQL re-implements the engine's documented semantics (null
# normalization, enum/multi-enum/regex accept sets, group contiguity,
# duplicate keys, referential orphans, per-group ts-gap drift and the
# report's error/warning counting rules) over the same files.

_TV_NORM_CTE = """
WITH turns AS (SELECT * FROM read_parquet('@TURNS@')),
norm AS (
  SELECT conv_id, turn_idx, ts,
    conv_id || '|' || CAST(turn_idx AS VARCHAR) AS row_key,
    CASE WHEN conv_id IS NULL OR regexp_matches(conv_id, '^\\s*$') THEN 'NA'
         WHEN conv_id IN ('none','None','nan','NaN','NAN','N/A','n/a')
              THEN 'NA' ELSE conv_id END AS n_conv,
    CASE WHEN role IS NULL OR regexp_matches(role, '^\\s*$') THEN 'NA'
         WHEN role IN ('none','None','nan','NaN','NAN','N/A','n/a')
              THEN 'NA' ELSE role END AS n_role,
    CASE WHEN text IS NULL OR regexp_matches(text, '^\\s*$') THEN 'NA'
         WHEN text IN ('none','None','nan','NaN','NAN','N/A','n/a')
              THEN 'NA' ELSE text END AS n_text,
    CASE WHEN tool IS NULL OR regexp_matches(tool, '^\\s*$') THEN 'NA'
         WHEN tool IN ('none','None','nan','NaN','NAN','N/A','n/a')
              THEN 'NA' ELSE tool END AS n_tool
  FROM turns)
"""

# engine accept-set predicates (functions/checks.py):
#   multi-enum: >=1 non-empty trimmed ';'-token, all tokens in Validation
_TV_TOOL_BAD = """n_tool NOT IN ('NA','Other')
    AND NOT (
      len(list_filter(list_transform(string_split(n_tool, ';'),
                                     t -> trim(t)), t -> t <> '')) > 0
      AND len(list_filter(list_transform(string_split(n_tool, ';'),
                                         t -> trim(t)),
                          t -> t <> '' AND t NOT IN
                          ('browser','calculator','code','none','search')))
          = 0)"""

_TV_VIOLATIONS_SQL = _TV_NORM_CTE + """
SELECT 'regex:conv_id' AS constraint_id, 'conv_id' AS "column",
       row_key, n_conv AS value
  FROM norm WHERE n_conv <> 'NA'
   AND NOT regexp_full_match(n_conv, 'conv_[0-9]{8}')
UNION ALL
SELECT 'enum:role', 'role', row_key, n_role FROM norm
  WHERE n_role NOT IN ('NA','assistant','system','tool','user')
UNION ALL
SELECT 'enum:tool', 'tool', row_key, n_tool FROM norm WHERE """ \
    + _TV_TOOL_BAD + """
UNION ALL
SELECT 'ref:conv_id->conversations.conv_id', 'conv_id', row_key, conv_id
  FROM norm n WHERE NOT EXISTS (
      SELECT 1 FROM read_parquet('@CONVS@') c WHERE c.conv_id = n.conv_id)
UNION ALL
SELECT 'unique:conv_id,turn_idx', 'conv_id,turn_idx',
       conv_id || '|' || CAST(turn_idx AS VARCHAR),
       'count=' || CAST(cnt AS VARCHAR)
  FROM (SELECT conv_id, turn_idx, count(*) AS cnt FROM turns
        GROUP BY 1, 2 HAVING count(*) > 1)
UNION ALL
SELECT 'seq:turn_idx@conv_id', 'turn_idx', conv_id,
       'n=' || CAST(n AS VARCHAR) || ' distinct=' || CAST(nd AS VARCHAR)
            || ' min=' || CAST(mn AS VARCHAR)
            || ' max=' || CAST(mx AS VARCHAR)
  FROM (SELECT conv_id, count(*) AS n, count(DISTINCT turn_idx) AS nd,
               min(turn_idx) AS mn, max(turn_idx) AS mx
        FROM turns GROUP BY 1)
  WHERE NOT (mn = 0 AND nd = mx + 1)
UNION ALL
SELECT 'drift:ts_gap:ts:group', 'ts', conv_id,
       'mean_gap_s=' || CAST(round(gap, 3) AS VARCHAR) || ' expected~16'
  FROM (SELECT conv_id, count(*) AS n,
               (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
                   / (count(*) - 1) AS gap
        FROM turns GROUP BY 1)
  WHERE n > 1 AND abs(gap - 16.0) / 16.0 > 10.0
"""

_TV_VERDICT_SQL = _TV_NORM_CTE + """,
fam AS (SELECT
  (SELECT count(*) FROM norm WHERE n_conv <> 'NA'
     AND NOT regexp_full_match(n_conv, 'conv_[0-9]{8}')) AS c_regex,
  (SELECT count(*) FROM norm
     WHERE n_role NOT IN ('NA','assistant','system','tool','user'))
      AS c_role,
  (SELECT count(*) FROM norm WHERE """ + _TV_TOOL_BAD + """) AS c_tool,
  (SELECT count(*) FROM norm n WHERE NOT EXISTS (
     SELECT 1 FROM read_parquet('@CONVS@') c
     WHERE c.conv_id = n.conv_id)) AS c_ref,
  (SELECT count(*) FROM (SELECT conv_id, turn_idx FROM turns
     GROUP BY 1, 2 HAVING count(*) > 1)) AS c_uni,
  (SELECT count(*) FROM (SELECT conv_id, count(DISTINCT turn_idx) nd,
     min(turn_idx) mn, max(turn_idx) mx FROM turns GROUP BY 1)
     WHERE NOT (mn = 0 AND nd = mx + 1)) AS c_seq,
  (SELECT count(*) FROM (SELECT conv_id, count(*) n,
     (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
         / (count(*) - 1) gap
     FROM turns GROUP BY 1)
     WHERE n > 1 AND abs(gap - 16.0) / 16.0 > 10.0) AS c_drift,
  (SELECT count(*) FROM norm WHERE n_conv = 'NA') AS z_conv,
  (SELECT count(*) FROM norm WHERE n_role = 'NA') AS z_role,
  (SELECT count(*) FROM norm WHERE n_text = 'NA') AS z_text,
  (SELECT count(*) FROM norm WHERE n_tool = 'NA') AS z_tool,
  (SELECT count(*) FROM turns) AS n_rows)
SELECT '@E@' AS metric, CAST(
    (CASE WHEN c_regex > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_role  > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_uni   > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_seq   > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_ref   > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM fam
UNION ALL SELECT '@W@', CAST(
    (CASE WHEN z_conv > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN z_role > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN z_text > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN z_tool > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_tool > 0 THEN 1 ELSE 0 END)
  + (CASE WHEN c_drift > 0 THEN 1 ELSE 0 END) AS DOUBLE) FROM fam
UNION ALL SELECT 'n_rows', CAST(n_rows AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:drift:ts_gap:ts:group',
                 CAST(c_drift AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:enum:role', CAST(c_role AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:enum:tool', CAST(c_tool AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:ref:conv_id->conversations.conv_id',
                 CAST(c_ref AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:regex:conv_id',
                 CAST(c_regex AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:seq:turn_idx@conv_id',
                 CAST(c_seq AS DOUBLE) FROM fam
UNION ALL SELECT 'violations:unique:conv_id,turn_idx',
                 CAST(c_uni AS DOUBLE) FROM fam
"""


def _transcript_oracles() -> dict[str, str]:
    """Materialize the deterministic sf0.01 corpus (the driver contract
    compares Ray-vs-oracle at sf=0.01 ONLY — these SQL strings are pinned
    to that corpus; a checker running another sf must use the engine
    queries' own sf-scaled corpus instead).  Generation is pure
    numpy/pyarrow (no Ray), cached under /tmp after the first call."""
    from crn_meta_validate_ray.pipelines.queries import _transcript_corpus

    info = _transcript_corpus("/root/testdata/sf0.01")
    turns = info["turns_dir"] + "/*.parquet"
    import glob as _glob
    turns_first = sorted(_glob.glob(
        info["turns_dir"] + "/*.parquet"))[0]
    convs = info["conversations"]

    def bind(sql: str) -> str:
        return sql.replace("@TURNS@", turns).replace("@CONVS@", convs)

    conv_stats_sql = f"""
        SELECT conv_id, count(*) AS n_turns,
               count(DISTINCT role) AS n_roles,
               CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS sum_chars
        FROM read_parquet('{turns}')
        WHERE conv_id IS NOT NULL
        GROUP BY conv_id
    """

    flatten_sql = f"""
        SELECT conv_id, count(*) AS n_turns,
               string_agg(coalesce(role, 'NA') || ': ' || coalesce(text, ''),
                          chr(10)
                          ORDER BY turn_idx,
                                   coalesce(role, 'NA') || ': '
                                       || coalesce(text, '')) AS conv_text,
               CAST(sum(length(coalesce(role, 'NA') || ': '
                               || coalesce(text, ''))) + count(*) - 1
                    AS BIGINT) AS n_chars
        FROM read_parquet('{turns}')
        WHERE conv_id IS NOT NULL
        GROUP BY conv_id
    """

    pairs_sql = f"""
        WITH t AS (
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   coalesce(role, 'NA') AS role,
                   coalesce(text, '') AS text
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
        ), lagd AS (
            SELECT conv_id, turn_idx, role, text,
                   lag(role) OVER w AS prev_role,
                   lag(text) OVER w AS prompt
            FROM t
            WINDOW w AS (PARTITION BY conv_id
                         ORDER BY turn_idx, role, text)
        )
        SELECT conv_id, turn_idx, prompt, text AS response
        FROM lagd WHERE prev_role = 'user' AND role = 'assistant'
    """

    pack_conv_sql = f"""
        WITH conv AS (
            SELECT conv_id,
                   string_agg(coalesce(role, 'NA') || ': '
                                  || coalesce(text, ''), chr(10)
                              ORDER BY turn_idx,
                                       coalesce(role, 'NA') || ': '
                                           || coalesce(text, ''))
                       AS conv_text
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
            GROUP BY conv_id
        ), toks AS (
            SELECT conv_id,
                   length(regexp_extract_all(coalesce(conv_text, ''),
                                             '\\S+')) AS n_tokens
            FROM conv
        ), scan AS (
            SELECT conv_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY conv_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS run_sum
            FROM toks
        )
        SELECT conv_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(floor((run_sum - n_tokens) / 4096.0) AS BIGINT)
                   AS bin_id
        FROM scan
    """

    role_ppl_sql = f"""
        WITH t AS (
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   coalesce(role, 'NA') AS role
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
        ), lagd AS (
            SELECT conv_id, role,
                   lag(role) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx, role) AS prev
            FROM t
        ), pairs AS (
            SELECT conv_id, prev AS role_a, role AS role_b
            FROM lagd WHERE prev IS NOT NULL
        ), m AS (
            SELECT role_a, role_b, count(*) AS n
            FROM pairs GROUP BY role_a, role_b
        ), tot AS (
            SELECT role_a, sum(n) AS tn FROM m GROUP BY role_a
        )
        SELECT p.conv_id, count(*) AS n_trans,
               round(avg(-log2(m.n / tot.tn)), 5) AS avg_nll
        FROM pairs p
        JOIN m ON m.role_a = p.role_a AND m.role_b = p.role_b
        JOIN tot ON tot.role_a = p.role_a
        GROUP BY p.conv_id
    """

    from crn_meta_validate_ray.pipelines.queries import _rowgrouped_orders
    rg_path = _rowgrouped_orders("/root/testdata/sf0.01")
    rowgroup_sql = f"""
        WITH g AS (
            SELECT row_group_id,
                   CAST(min(CASE WHEN path_in_schema = 'o_orderkey'
                                 THEN stats_min_value END) AS BIGINT)
                       AS mn,
                   CAST(max(CASE WHEN path_in_schema = 'o_orderkey'
                                 THEN stats_max_value END) AS BIGINT)
                       AS mx,
                   max(row_group_num_rows) AS nr
            FROM parquet_metadata('{rg_path}')
            GROUP BY row_group_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_row_groups,
               CAST(count(*) FILTER (WHERE mx < 12000 OR mn > 13999)
                    AS BIGINT) AS n_pruned_groups,
               CAST(coalesce(sum(nr) FILTER
                        (WHERE NOT (mx < 12000 OR mn > 13999)), 0)
                    AS BIGINT) AS n_rows_scanned,
               (SELECT count(*) FROM read_parquet('{rg_path}')
                WHERE o_orderkey BETWEEN 12000 AND 13999)
                   AS n_rows_matching
        FROM g
    """

    census_sql = f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
               CAST(num_rows AS BIGINT) AS n_rows,
               CAST(num_row_groups AS BIGINT) AS n_row_groups
        FROM parquet_file_metadata('{turns}')
    """

    schema_check_sql = f"""
        WITH actual AS (
            SELECT name, type FROM parquet_schema('{turns_first}')
            WHERE num_children IS NULL
        ), expected(name, etype) AS (VALUES
            ('conv_id', 'BYTE_ARRAY'), ('turn_idx', 'INT32'),
            ('role', 'BYTE_ARRAY'), ('text', 'BYTE_ARRAY'),
            ('tool', 'BYTE_ARRAY'), ('ts', 'INT64'))
        SELECT e.name AS column_name,
               coalesce(CAST(a.type AS VARCHAR), 'MISSING')
                   AS physical_type,
               coalesce(CAST(a.type AS VARCHAR) = e.etype, FALSE) AS ok
        FROM expected e LEFT JOIN actual a ON a.name = e.name
    """

    truncate_sql = f"""
        WITH t AS (
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   coalesce(role, 'NA') AS role,
                   coalesce(text, '') AS text
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
        ), r AS (
            SELECT *, row_number() OVER (PARTITION BY conv_id
                ORDER BY turn_idx DESC NULLS FIRST, role DESC, text DESC)
                AS pos_from_end
            FROM t
        )
        SELECT conv_id, turn_idx, role, text,
               CAST(pos_from_end AS BIGINT) AS pos_from_end
        FROM r WHERE pos_from_end <= 8
    """

    reconcile_sql = f"""
        WITH actual AS (
            SELECT conv_id, count(*) AS actual
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL GROUP BY conv_id
        ), hdr AS (
            SELECT conv_id, CAST(n_turns AS BIGINT) AS declared
            FROM read_parquet('{convs}')
        )
        SELECT coalesce(h.conv_id, a.conv_id) AS conv_id,
               coalesce(h.declared, 0) AS declared,
               coalesce(a.actual, 0) AS actual,
               coalesce(a.actual, 0) - coalesce(h.declared, 0) AS delta
        FROM hdr h FULL OUTER JOIN actual a ON a.conv_id = h.conv_id
        WHERE coalesce(a.actual, 0) <> coalesce(h.declared, 0)
    """

    prep_sql = f"""
        WITH bad AS (
            SELECT DISTINCT conv_id FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL AND (
                coalesce(role, 'NA') NOT IN
                    ('system', 'user', 'assistant', 'tool')
                OR regexp_matches(coalesce(text, ''), '^\\s*$'))
        ), conv AS (
            SELECT conv_id,
                   string_agg(coalesce(role, 'NA') || ': '
                                  || coalesce(text, ''), chr(10)
                              ORDER BY turn_idx,
                                       coalesce(role, 'NA') || ': '
                                           || coalesce(text, ''))
                       AS conv_text
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
              AND conv_id NOT IN (SELECT conv_id FROM bad)
            GROUP BY conv_id
        ), kept AS (
            SELECT conv_id, conv_text FROM (
                SELECT conv_id, conv_text,
                       min(conv_id) OVER (PARTITION BY conv_text)
                           AS keeper
                FROM conv)
            WHERE conv_id = keeper
        ), toks AS (
            SELECT conv_id,
                   length(regexp_extract_all(coalesce(conv_text, ''),
                                             '\\S+')) AS n_tokens
            FROM kept
        ), scan AS (
            SELECT conv_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY conv_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS run_sum
            FROM toks
        )
        SELECT conv_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(floor((run_sum - n_tokens) / 4096.0) AS BIGINT)
                   AS bin_id
        FROM scan
    """

    role_len_sql = f"""
        SELECT coalesce(role, 'NA') AS role,
               CAST(quantile_disc(length(coalesce(text, '')), 0.5)
                    AS BIGINT) AS p50,
               CAST(quantile_disc(length(coalesce(text, '')), 0.9)
                    AS BIGINT) AS p90,
               count(*) AS n
        FROM read_parquet('{turns}')
        GROUP BY coalesce(role, 'NA')
    """

    tool_usage_sql = f"""
        SELECT tool, count(*) AS n_calls,
               count(DISTINCT conv_id) AS n_convs,
               round(CAST(sum(length(coalesce(text, ''))) AS DOUBLE)
                     / count(*), 5) AS avg_chars
        FROM read_parquet('{turns}')
        WHERE tool IS NOT NULL
        GROUP BY tool
    """

    latency_sql = f"""
        WITH t AS (
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   coalesce(role, 'NA') AS role, ts
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
        ), lagd AS (
            SELECT conv_id, role, ts,
                   lag(role) OVER w AS prev_role,
                   lag(ts) OVER w AS prev_ts
            FROM t WINDOW w AS (PARTITION BY conv_id
                                ORDER BY turn_idx, role)
        )
        SELECT conv_id, count(*) AS n_responses,
               round(avg(CAST(date_diff('second', prev_ts, ts)
                              AS DOUBLE)), 5) AS avg_latency_s
        FROM lagd
        WHERE prev_role = 'user' AND role = 'assistant'
          AND ts IS NOT NULL AND prev_ts IS NOT NULL
        GROUP BY conv_id
    """

    dup_turns_sql = f"""
        SELECT coalesce(text, '') AS text, count(*) AS n
        FROM read_parquet('{turns}')
        GROUP BY coalesce(text, '')
        HAVING count(*) > 1
        ORDER BY n DESC, text LIMIT 50
    """

    role_transitions_sql = f"""
        WITH t AS (
            SELECT conv_id, turn_idx, coalesce(role, 'NA') AS role
            FROM read_parquet('{turns}')
            WHERE conv_id IS NOT NULL
        ), lagd AS (
            SELECT role,
                   lag(role) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS prev
            FROM t
        )
        SELECT prev AS role_a, role AS role_b, count(*) AS n
        FROM lagd WHERE prev IS NOT NULL GROUP BY 1, 2
    """

    conditional_sql = bind(_TV_NORM_CTE + """
        SELECT 'cond:role->text' AS constraint_id, 'text' AS "column",
               row_key, n_text AS value
        FROM norm WHERE n_role IN ('user', 'assistant') AND n_text = 'NA'
        UNION ALL
        SELECT 'cond:role->tool', 'tool', row_key, n_tool
        FROM norm WHERE n_role = 'tool' AND n_tool = 'NA'
    """)

    return {
        "transcript_conv_stats": conv_stats_sql,
        "transcript_flatten": flatten_sql,
        "transcript_pairs": pairs_sql,
        "pack_conversations": pack_conv_sql,
        "dup_turns_transcript": dup_turns_sql,
        "role_perplexity_transcript": role_ppl_sql,
        "response_latency_transcript": latency_sql,
        "tool_usage_transcript": tool_usage_sql,
        "role_length_quantiles_transcript": role_len_sql,
        "corpus_prep_transcript": prep_sql,
        "turncount_reconcile_transcript": reconcile_sql,
        "truncate_conversations_transcript": truncate_sql,
        "schema_check_transcript": schema_check_sql,
        "rowgroup_prune_orders": rowgroup_sql,
        "file_census_transcript": census_sql,
        "transcript_role_transitions": role_transitions_sql,
        "transcript_conditional": conditional_sql,
        "transcript_violations": bind(_TV_VIOLATIONS_SQL),
        "transcript_verdict": bind(_TV_VERDICT_SQL)
            .replace("@E@", "errors").replace("@W@", "warnings"),
        "transcript_resumable": bind(_TV_VERDICT_SQL)
            .replace("@E@", "resumed_errors")
            .replace("@W@", "resumed_warnings"),
    }
