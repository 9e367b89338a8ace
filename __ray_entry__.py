"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship pipeline — synthesize tiny transcripts, build the
  sharded inverted index, serve a BM25 query batch from an actor pool.
- ``queries()``: one entry per implemented operator from SURVEY.md §2 and
  the training-data-pipeline additions; each callable takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL per SQL-expressible query
  (column names match exactly). Full-text / sketch operators are
  rows-only checked here and rank/score-verified against the
  single-process oracle in pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOPWORDS_SQL = (
    "('a','an','and','are','as','at','be','but','by','for','if','in','into',"
    "'is','it','no','not','of','on','or','such','that','the','their','then',"
    "'there','these','they','this','to','was','will','with')"
)

_TOKS = ("SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+'))"
         " AS term FROM documents")


def _bpe_pattern_sql() -> str:
    """The engine's BPE pretokenizer pattern, SQL-quoted — importing it
    guarantees the oracle runs the IDENTICAL RE2 pattern."""
    from lucene_solr_ray.pipelines.textstats import BPE_PATTERN

    return BPE_PATTERN.replace("'", "''")


def entry() -> Any:
    from lucene_solr_ray.pipelines.fulltext import transcripts_flagship

    return transcripts_flagship("tiny")


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.pipelines import (
        analytics,
        dedup,
        export,
        fulltext,
        knn,
        multimodal,
        relational,
        sketches,
        textstats,
        windows,
    )

    return {
        # facets / aggregates (SURVEY.md §2.6)
        "facet_lang": relational.facet_lang,
        "facet_source_lang": relational.facet_source_lang,
        "nested_facet_source_lang": relational.nested_facet_source_lang,
        "facet_options_docs": relational.facet_options_docs,
        "drill_sideways_docs": relational.drill_sideways_docs,
        "range_facet_events": relational.range_facet_events,
        "date_range_facet_events": relational.date_range_facet_events,
        "pivot_facet_orders": relational.pivot_facet_orders,
        "interval_facet_events": relational.interval_facet_events,
        "stat_sorted_facet_orders": relational.stat_sorted_facet_orders,
        "taxonomy_facet_events": relational.taxonomy_facet_events,
        "sampled_facet_events": relational.sampled_facet_events,
        "stats_events": relational.stats_events,
        "rollup_lineitem": relational.rollup_lineitem,
        "analytics_lineitem": analytics.analytics_lineitem,
        "distinct_users_events": relational.distinct_users_events,
        # sorts / top-k / grouping (§2.7)
        "topk_orders": relational.topk_orders,
        "sample_events": relational.sample_events,
        "collapse_orders": relational.collapse_orders,
        "group_topk_orders": relational.group_topk_orders,
        # scalar expressions / range queries (§2.9)
        "select_expr_lineitem": relational.select_expr_lineitem,
        "function_query_lineitem": relational.function_query_lineitem,
        "scale_boost_lineitem": relational.scale_boost_lineitem,
        "expression_lineitem": relational.expression_lineitem,
        "range_filter_events": relational.range_filter_events,
        "datemath_range_events": relational.datemath_range_events,
        "frange_lineitem": relational.frange_lineitem,
        # set ops / dedup (§2.8)
        "merge_union_events": relational.merge_union_events,
        "exact_dedup": dedup.exact_dedup,
        "ngram_overlap_pairs": dedup.ngram_overlap_pairs,
        # joins (§2.5)
        "hashjoin_orders_customer": relational.hashjoin_orders_customer,
        "innerjoin_lineitem_orders": relational.innerjoin_lineitem_orders,
        "leftouter_customer_orders": relational.leftouter_customer_orders,
        "semijoin_customers": relational.semijoin_customers,
        "antijoin_customers": relational.antijoin_customers,
        # index-build statistics in SQL-checkable form (§2.6 last row)
        "term_df_simple": textstats.term_df_simple,
        "doc_token_counts": textstats.doc_token_counts,
        "bpe_token_counts": textstats.bpe_token_counts,
        "quality_scores": textstats.quality_scores,
        # similarity search
        "knn_cosine": knn.knn_cosine,
        "knn_ivf": knn.knn_ivf,
        # full probe == exact: the oracle-green row for the IVF path
        "knn_ivf_fullprobe": knn.knn_ivf_fullprobe,
        "knn_ivfpq": knn.knn_ivfpq,
        "knn_cosine_batch": knn.knn_cosine_batch,
        # sketches / percentiles (§2.6 PercentileAgg, HLLAgg)
        "exact_median_events": sketches.exact_median_events,
        "date_histogram_events": sketches.date_histogram_events,
        "hll_distinct_users": sketches.hll_distinct,
        "tdigest_percentiles_events": sketches.tdigest_percentiles,
        "heavy_hitters_terms": sketches.heavy_hitters_terms,
        # windowed aggregates (§2.10)
        "tumbling_window_events": windows.tumbling_window_events,
        "hopping_window_events": windows.hopping_window_events,
        "session_windows_events": windows.session_windows_events,
        # export / sinks (§2.2)
        "export_sorted_orders": export.export_sorted_orders,
        # streaming-expression language (§2.11 extension surface)
        "sql_handler_orders": __import__(
            "lucene_solr_ray.pipelines.sqlhandler",
            fromlist=["sql_handler_orders"]).sql_handler_orders,
        "stream_expr_join_rollup": __import__(
            "lucene_solr_ray.pipelines.streaming_expr",
            fromlist=["stream_expr_join_rollup"]).stream_expr_join_rollup,
        # geospatial (LatLonPoint box/radius filters, geodist sort)
        "geo_bbox_events": __import__(
            "lucene_solr_ray.pipelines.geo",
            fromlist=["geo_bbox_events"]).geo_bbox_events,
        "geo_nearest_events": __import__(
            "lucene_solr_ray.pipelines.geo",
            fromlist=["geo_nearest_events"]).geo_nearest_events,
        "heatmap_facet_events": __import__(
            "lucene_solr_ray.pipelines.geo",
            fromlist=["heatmap_facet_events"]).heatmap_facet_events,
        # point-in-polygon (RecursivePrefixTreeStrategy: grid-prefilter
        # + exact even-odd ray cast)
        "polygon_filter_events": __import__(
            "lucene_solr_ray.pipelines.geo",
            fromlist=["polygon_filter_events"]).polygon_filter_events,
        # graph traversal streams (GatherNodesStream / ShortestPathStream)
        "gather_parts_of_customer": __import__(
            "lucene_solr_ray.pipelines.graph",
            fromlist=["gather_parts_of_customer"]).gather_parts_of_customer,
        "shortest_path_lineitem": __import__(
            "lucene_solr_ray.pipelines.graph",
            fromlist=["shortest_path_lineitem"]).shortest_path_lineitem,
        # multimodal plumbing (fake-format path) + REAL netpbm/WAV decode
        "media_features": multimodal.media_features,
        "media_real_features": multimodal.media_real_features,
        # full-text + sketches (non-SQL-expressible: rows-only here,
        # oracle-diffed in pytest)
        "bm25_topk_docs": fulltext.bm25_topk_docs,
        "bm25_filtered_docs": fulltext.bm25_filtered_docs,
        "query_language_topk_docs": fulltext.query_language_topk_docs,
        # QueryElevationComponent (editorial pinning; semantics
        # pytest-verified, rows-only here)
        "elevated_topk_docs": fulltext.elevated_topk_docs,
        "edismax_topk_docs": fulltext.edismax_topk_docs,
        "docfreq_boost_docs": fulltext.docfreq_boost_docs,
        "minhash_neardup": dedup.minhash_neardup,
        "minhash_dedup_keep": dedup.minhash_dedup_keep,
        "embedding_neardup": knn.embedding_neardup_pairs,
        "semdedup_embeddings": knn.semdedup,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_neardup": dedup.simhash_neardup,
        "lang_id": textstats.lang_id,
        "doc_fingerprints": textstats.fingerprints,
        # PII scrubbing (training-data redaction stage; RE2 kernels)
        "pii_redact_docs": textstats.pii_redact_docs,
        # phonetic analysis as a pipeline statistic (PhoneticFilter /
        # commons-codec Soundex; encoder runs over distinct terms only)
        "phonetic_keys_docs": textstats.phonetic_keys_docs,
        # search-result clustering (ClusteringComponent / Carrot2 Lingo)
        "cluster_topk_docs": fulltext.cluster_topk_docs,
        # payload scoring (PayloadScoreQuery over synthetic annotations)
        "payload_avg_docs": __import__(
            "lucene_solr_ray.search.payloads",
            fromlist=["payload_avg_docs"]).payload_avg_docs,
        # AnalyzingSuggester (lucene/suggest FST lookup analog)
        "suggest_docs_source": __import__(
            "lucene_solr_ray.search.suggest",
            fromlist=["suggest_docs_source"]).suggest_docs_source,
        # benchmark decontamination (8-gram eval-set overlap flags)
        "decontaminate_docs": dedup.decontaminate_docs,
        # exact-substring dedup (ExactSubstr, Lee et al. 2022)
        "exactsubstr_dedup": dedup.exactsubstr_dedup,
        # Gopher-style within-doc repetition quality signals
        "repetition_stats_docs": textstats.repetition_stats,
        # training-data curation: deterministic domain-mix re-weighting
        # and context-window sequence packing
        "canonical_docs": __import__(
            "lucene_solr_ray.pipelines.curation",
            fromlist=["canonical_docs"]).canonical_docs,
        "domain_mix_docs": __import__(
            "lucene_solr_ray.pipelines.curation",
            fromlist=["domain_mix_docs"]).domain_mix_docs,
        "pack_sequences_docs": __import__(
            "lucene_solr_ray.pipelines.curation",
            fromlist=["pack_sequences_docs"]).pack_sequences_docs,
        "c4_clean_docs": __import__(
            "lucene_solr_ray.pipelines.curation",
            fromlist=["c4_clean_docs"]).c4_clean_docs,
        "lm_score_docs": __import__(
            "lucene_solr_ray.pipelines.curation",
            fromlist=["lm_score_docs"]).lm_score_docs,
        # index-driven NaiveBayes classification (lucene/classification)
        "nb_classify_docs": __import__(
            "lucene_solr_ray.search.classify",
            fromlist=["nb_classify_docs"]).nb_classify_docs,
        # percolation / saved-query routing (MemoryIndex use case)
        "percolate_docs": __import__(
            "lucene_solr_ray.pipelines.percolate",
            fromlist=["percolate_docs"]).percolate_docs,
        # scored percolation: per-match BM25 vs the one-doc index
        # (MemoryIndex.java:91; scores pytest-pinned bit-exact to the
        # real searcher on a one-doc index)
        "percolate_scored_docs": __import__(
            "lucene_solr_ray.pipelines.percolate",
            fromlist=["percolate_scored_docs"]).percolate_scored_docs,
        # Boolean perceptron weak labeling (lucene/classification)
        "perceptron_classify_docs": __import__(
            "lucene_solr_ray.search.perceptron",
            fromlist=["perceptron_classify_docs"]).perceptron_classify_docs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "facet_lang":
            "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
        "payload_avg_docs":
            "WITH chunks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS c FROM documents), "
            "toks AS (SELECT doc_id, length(c) AS pay, "
            "unnest(string_split_regex(lower(c), '[^a-z0-9]+')) AS t "
            "FROM chunks) "
            "SELECT doc_id, ROUND(avg(pay), 4) AS avg_payload FROM toks "
            "WHERE t = 'data' GROUP BY doc_id",
        "bpe_token_counts":
            "SELECT doc_id, CAST(length(regexp_extract_all(text, '"
            + _bpe_pattern_sql()
            + "')) AS BIGINT) AS n_bpe_tokens FROM documents",
        "expression_lineitem":
            "SELECT l_orderkey, l_linenumber, ROUND("
            "l_extendedprice * (1 - l_discount) + "
            "CASE WHEN l_quantity > 25 THEN sqrt(l_extendedprice) "
            "ELSE l_quantity - trunc(l_quantity / 7) * 7 END"
            ", 4) AS escore FROM lineitem",
        "sampled_facet_events":
            # deterministic 1/8 Knuth-hash sample; corrected = cnt*8,
            # total clamped to the event count
            "WITH samp AS (SELECT event_type FROM events WHERE "
            "((event_id % 4294967296)::HUGEINT * 2654435761) % 4294967296 < 536870912), "
            "f AS (SELECT event_type AS label, "
            "CAST(count(*) AS BIGINT) AS sample_cnt FROM samp "
            "GROUP BY label) "
            "SELECT label, sample_cnt, "
            "CAST(sample_cnt * 8 AS BIGINT) AS est_cnt FROM f "
            "UNION ALL SELECT '__total__', "
            "(SELECT count(*) FROM samp), "
            "LEAST((SELECT count(*) FROM events), "
            "(SELECT count(*) FROM samp) * 8)",
        "heavy_hitters_terms":
            "WITH toks AS (SELECT unnest(string_split_regex(lower(text), "
            "'[^a-z0-9]+')) AS term FROM documents) "
            "SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks "
            "WHERE term <> '' GROUP BY term "
            "ORDER BY cnt DESC, term LIMIT 10",
        "taxonomy_facet_events":
            "WITH days AS (SELECT strftime(ts, '%d') AS label, "
            "count(*) AS cnt FROM events "
            "WHERE strftime(ts, '%Y') = '2024' AND strftime(ts, '%m') = '01' "
            "GROUP BY label), "
            "top AS (SELECT label, cnt FROM days "
            "ORDER BY cnt DESC, label LIMIT 10) "
            "SELECT label, CAST(cnt AS BIGINT) AS cnt, "
            "(SELECT count(*) FROM days) AS child_count FROM top "
            "UNION ALL SELECT '__total__', "
            "CAST((SELECT sum(cnt) FROM days) AS BIGINT), "
            "(SELECT count(*) FROM days)",
        "range_facet_events":
            "WITH b AS (SELECT 50 + 50*i AS lo FROM generate_series(0,5) t(i)), "
            "c AS (SELECT 50 + 50*CAST(floor((value-50)/50) AS BIGINT) AS lo, "
            "count(*) AS n FROM events WHERE value >= 50 AND value < 350 "
            "GROUP BY 1) "
            "SELECT CAST(b.lo AS VARCHAR) AS bucket, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS cnt FROM b LEFT JOIN c USING (lo) "
            "UNION ALL SELECT 'before', count(*) FROM events WHERE value < 50 "
            "UNION ALL SELECT 'after', count(*) FROM events WHERE value >= 350 "
            "UNION ALL SELECT 'between', count(*) FROM events "
            "WHERE value >= 50 AND value < 350",
        "date_range_facet_events":
            # +7DAYS stepping overshoots end: edges 01,08,15,22,29 Jan,
            # 05 Feb; no hardend, so 'after' counts ts >= Feb 5
            "WITH b AS (SELECT unnest(generate_series("
            "TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-29', "
            "INTERVAL 7 DAY)) AS lo), "
            "c AS (SELECT TIMESTAMP '2024-01-01' + INTERVAL 7 DAY * "
            "CAST(floor(date_diff('second', TIMESTAMP '2024-01-01', ts) "
            "/ 604800.0) AS BIGINT) AS lo, count(*) AS n FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-01' "
            "AND ts < TIMESTAMP '2024-02-05' GROUP BY 1) "
            "SELECT strftime(b.lo, '%Y-%m-%dT%H:%M:%SZ') AS bucket, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS cnt "
            "FROM b LEFT JOIN c USING (lo) "
            "UNION ALL SELECT 'before', count(*) FROM events "
            "WHERE ts < TIMESTAMP '2024-01-01' "
            "UNION ALL SELECT 'after', count(*) FROM events "
            "WHERE ts >= TIMESTAMP '2024-02-05' "
            "UNION ALL SELECT 'between', count(*) FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-01' "
            "AND ts < TIMESTAMP '2024-02-05'",
        "stat_sorted_facet_orders":
            "SELECT o_orderpriority, count(*) AS cnt, "
            "round(sum(o_totalprice), 2) AS sum_price FROM orders "
            "GROUP BY o_orderpriority "
            "ORDER BY sum(o_totalprice) DESC, o_orderpriority LIMIT 3",
        "interval_facet_events":
            "SELECT '[*,100)' AS bucket, count(*) AS cnt FROM events "
            "WHERE value < 100 "
            "UNION ALL SELECT '[50,150)', count(*) FROM events "
            "WHERE value >= 50 AND value < 150 "
            "UNION ALL SELECT '[100,200]', count(*) FROM events "
            "WHERE value >= 100 AND value <= 200 "
            "UNION ALL SELECT '(200,*]', count(*) FROM events "
            "WHERE value > 200",
        "geo_bbox_events":
            "WITH c AS (SELECT event_id, user_id, "
            "(((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 180 - 90 AS lat, "
            "((((user_id % 4294967296) + 12345)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 360 - 180 AS lon FROM events) "
            "SELECT event_id, user_id, ROUND(lat, 6) AS lat, "
            "ROUND(lon, 6) AS lon FROM c WHERE lat >= 10.0 AND lat <= 55.0 "
            "AND lon >= -30.0 AND lon <= 42.5",
        "geo_nearest_events":
            "WITH c AS (SELECT event_id, "
            "(((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 180 - 90 AS lat, "
            "((((user_id % 4294967296) + 12345)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 360 - 180 AS lon FROM events), "
            "d AS (SELECT event_id, (lat-48.0)*(lat-48.0) + "
            "(lon-2.0)*(lon-2.0) AS d2 FROM c) "
            "SELECT event_id, ROUND(d2, 6) AS d2 FROM d "
            "ORDER BY d2, event_id LIMIT 20",
        "heatmap_facet_events":
            "WITH pts AS (SELECT "
            "(((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 180 - 90 AS lat, "
            "((((user_id % 4294967296) + 12345)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 "
            "* 360 - 180 AS lon FROM events) "
            "SELECT LEAST(CAST(floor((lat - 10.0) / 5.0) AS BIGINT), 8) "
            "AS grow, "
            "LEAST(CAST(floor((lon - (-30.0)) / 5.0) AS BIGINT), 14) "
            "AS gcol, count(*) AS cnt FROM pts "
            "WHERE lat >= 10.0 AND lat <= 55.0 "
            "AND lon >= -30.0 AND lon <= 45.0 GROUP BY 1, 2",
        "polygon_filter_events":
            # even-odd ray cast with the IDENTICAL crossing expression
            # the engine evaluates: (x2-x1)*(lat-y1)/(y2-y1)+x1 in
            # float64, edges (v_i -> v_{i-1}) of the concave hexagon
            "WITH c AS (SELECT event_id, user_id, "
            "(((user_id % 4294967296)::HUGEINT * 2654435761) "
            "% 4294967296) / 4294967296.0 * 180 - 90 AS lat, "
            "((((user_id % 4294967296) + 12345)::HUGEINT * 2654435761) "
            "% 4294967296) / 4294967296.0 * 360 - 180 AS lon "
            "FROM events), "
            "edges(y1, x1, y2, x2) AS (VALUES "
            "(-60.0, -100.0, 60.0, -110.0), "
            "(-50.0, 110.0, -60.0, -100.0), "
            "(20.0, 120.0, -50.0, 110.0), "
            "(0.0, 10.0, 20.0, 120.0), "
            "(55.0, 90.0, 0.0, 10.0), "
            "(60.0, -110.0, 55.0, 90.0)), "
            "x AS (SELECT p.event_id, p.user_id, p.lat, p.lon, "
            "count(*) FILTER (WHERE ((e.y1 > p.lat) <> (e.y2 > p.lat)) "
            "AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) "
            "+ e.x1) AS nc "
            "FROM c p CROSS JOIN edges e GROUP BY 1, 2, 3, 4) "
            "SELECT event_id, user_id, ROUND(lat, 6) AS lat, "
            "ROUND(lon, 6) AS lon FROM x WHERE nc % 2 = 1",
        "gather_parts_of_customer":
            "SELECT DISTINCT l_partkey AS node FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey WHERE o_custkey = 7 "
            "ORDER BY node",
        "shortest_path_lineitem":
            "WITH RECURSIVE e AS ("
            "SELECT l_orderkey AS f, l_partkey + 10000000 AS t FROM lineitem "
            "UNION ALL SELECT l_partkey + 10000000, l_orderkey FROM lineitem), "
            "b AS (SELECT min(l_orderkey) AS src, max(l_orderkey) AS dst "
            "FROM lineitem), "
            "walk(node, d) AS ("
            "SELECT src, 0 FROM b "
            "UNION "
            "SELECT e.t, walk.d + 1 FROM walk JOIN e ON e.f = walk.node "
            "WHERE walk.d < 4) "
            "SELECT CAST(b.src AS BIGINT) AS src, CAST(b.dst AS BIGINT) AS dst, "
            "CAST(min(walk.d) AS BIGINT) AS hops FROM walk, b "
            "WHERE walk.node = b.dst GROUP BY 1, 2",
        "pivot_facet_orders":
            "WITH oy AS (SELECT o_orderstatus, o_orderpriority, "
            "CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders), "
            "l1 AS (SELECT o_orderstatus, count(*) AS c1 FROM oy "
            "GROUP BY 1 ORDER BY c1 DESC, o_orderstatus LIMIT 3), "
            "g2 AS (SELECT oy.o_orderstatus, oy.o_orderpriority, count(*) AS c2 "
            "FROM oy JOIN l1 USING (o_orderstatus) GROUP BY 1, 2), "
            "l2 AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus "
            "ORDER BY c2 DESC, o_orderpriority) AS rn FROM g2), "
            "g3 AS (SELECT oy.o_orderstatus, oy.o_orderpriority, oy.o_year, "
            "count(*) AS cnt FROM oy JOIN (SELECT o_orderstatus, "
            "o_orderpriority FROM l2 WHERE rn <= 3) k "
            "USING (o_orderstatus, o_orderpriority) GROUP BY 1, 2, 3), "
            "l3 AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus, "
            "o_orderpriority ORDER BY cnt DESC, o_year) AS rn3 FROM g3) "
            "SELECT o_orderstatus, o_orderpriority, o_year, cnt "
            "FROM l3 WHERE rn3 <= 2",
        "facet_source_lang":
            "SELECT source, lang, count(*) AS cnt FROM documents "
            "GROUP BY source, lang",
        "nested_facet_source_lang":
            "WITH s AS (SELECT source, count(*) AS s_cnt FROM documents "
            "GROUP BY source ORDER BY s_cnt DESC, source LIMIT 2), "
            "sl AS (SELECT source, lang, count(*) AS cnt FROM documents "
            "GROUP BY source, lang), "
            "r AS (SELECT sl.source, sl.lang, sl.cnt, row_number() OVER ("
            "PARTITION BY sl.source ORDER BY sl.cnt DESC, sl.lang) AS rn "
            "FROM sl JOIN s USING (source)) "
            "SELECT source, lang, cnt FROM r WHERE rn <= 2",
        "facet_options_docs":
            "WITH c AS (SELECT source, count(*) AS cnt FROM documents "
            "GROUP BY source), "
            "s AS (SELECT count(*)::BIGINT AS num_buckets, "
            "sum(cnt)::BIGINT AS all_count FROM c) "
            "SELECT c.source, c.cnt, s.num_buckets, s.all_count, "
            "0::BIGINT AS missing_count FROM c, s "
            "ORDER BY c.cnt DESC, c.source LIMIT 2",
        "drill_sideways_docs":
            # sideways: each dim drops its own filter, keeps the others'
            "SELECT 'lang' AS dim, lang AS val, count(*) AS cnt "
            "FROM documents WHERE source = 'src1' GROUP BY lang "
            "UNION ALL "
            "SELECT 'source', source, count(*) FROM documents "
            "WHERE lang = 'en' GROUP BY source "
            "UNION ALL "
            "SELECT 'len_parity', CASE WHEN n_chars % 2 = 0 THEN 'even' "
            "ELSE 'odd' END, count(*) FROM documents "
            "WHERE lang = 'en' AND source = 'src1' GROUP BY 2 "
            "UNION ALL "
            "SELECT '__hits__', '', count(*) FROM documents "
            "WHERE lang = 'en' AND source = 'src1'",
        "stats_events":
            "SELECT event_type, count(*) AS cnt, min(value) AS min_value, "
            "max(value) AS max_value, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY event_type",
        "rollup_lineitem":
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "analytics_lineitem":
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
            "round(avg(l_quantity), 6) AS avg_qty, "
            "max(l_extendedprice) AS max_price, count(*) AS cnt "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "distinct_users_events":
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type",
        "topk_orders":
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
        "sample_events":
            "SELECT event_id, event_type, round(value, 4) AS value "
            "FROM events WHERE ((event_id % 4294967296)::HUGEINT * 2654435761) % 4294967296 "
            "< 429496729",
        "collapse_orders":
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
            ") AS rn FROM orders) WHERE rn = 1",
        "group_topk_orders":
            "SELECT o_custkey, o_orderkey FROM ("
            "SELECT o_custkey, o_orderkey, row_number() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
            ") AS rn FROM orders) WHERE rn <= 2",
        "select_expr_lineitem":
            "SELECT l_orderkey, l_linenumber, "
            "round(l_extendedprice * (1 - l_discount), 4) AS revenue, "
            "l_quantity * 2 AS qty2 FROM lineitem "
            "WHERE l_shipdate < TIMESTAMP '1997-01-01'",
        "function_query_lineitem":
            "SELECT l_orderkey, l_linenumber, "
            "round(l_extendedprice * (1 - l_discount) "
            "+ 10 / (l_quantity + 10) + log10(l_extendedprice), 4) "
            "AS fscore FROM lineitem",
        "scale_boost_lineitem":
            "WITH b AS (SELECT min(l_extendedprice * (1 - l_discount)) "
            "AS mn1, max(l_extendedprice * (1 - l_discount)) AS mx1, "
            "min(l_quantity) AS mn2, max(l_quantity) AS mx2 "
            "FROM lineitem) "
            "SELECT l_orderkey, l_linenumber, "
            "round((l_extendedprice * (1 - l_discount) - b.mn1) "
            "/ (b.mx1 - b.mn1) "
            "+ (l_quantity - b.mn2) / (b.mx2 - b.mn2) * 100, 6) "
            "AS sscore FROM lineitem, b",
        "range_filter_events":
            "SELECT event_type, count(*) AS cnt, "
            "round(sum(value), 2) AS sum_value FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22' "
            "AND value >= 10.0 GROUP BY event_type",
        "datemath_range_events":
            # NOW pinned at 2024-01-22T12:34:56Z; endpoints are
            # NOW-14DAYS/DAY and NOW/HOUR-30MINUTES (DateMathParser)
            "SELECT event_type, count(*) AS cnt, "
            "round(sum(value), 2) AS sum_value FROM events "
            "WHERE ts >= date_trunc('day', "
            "TIMESTAMP '2024-01-22 12:34:56' - INTERVAL 14 DAY) "
            "AND ts < date_trunc('hour', TIMESTAMP '2024-01-22 12:34:56') "
            "- INTERVAL 30 MINUTE "
            "GROUP BY event_type",
        "sql_handler_orders":
            # the oracle runs the IDENTICAL SQL the engine executes
            __import__("lucene_solr_ray.pipelines.sqlhandler",
                       fromlist=["SQL_HANDLER_QUERY"]).SQL_HANDLER_QUERY,
        "c4_clean_docs":
            "WITH q AS (SELECT doc_id, count(*) AS n_tokens, "
            "sum(CASE WHEN term IN " + _STOPWORDS_SQL + " THEN 1 ELSE 0 "
            "END)::BIGINT AS n_stop FROM (" + _TOKS + ") "
            "WHERE term <> '' GROUP BY doc_id), "
            "k AS (SELECT d.doc_id, d.text, d.source FROM documents d "
            "JOIN q USING (doc_id) WHERE d.lang = 'en' "
            "AND q.n_tokens BETWEEN 20 AND 10000 "
            "AND q.n_stop * 1.0 / q.n_tokens >= 0.05), "
            "dd AS (SELECT min(doc_id) AS doc_id FROM k "
            "GROUP BY md5(text)) "
            "SELECT k.source, count(*) AS cnt FROM k "
            "JOIN dd USING (doc_id) GROUP BY k.source",
        "domain_mix_docs":
            "SELECT lang, count(*) AS cnt FROM documents "
            "WHERE (((doc_id % 4294967296)::HUGEINT * 2654435761) % 4294967296) / 4294967296.0 < "
            "CASE lang WHEN 'en' THEN 1.0 WHEN 'fr' THEN 0.5 "
            "WHEN 'es' THEN 0.5 WHEN 'zh' THEN 0.25 WHEN 'de' THEN 0.25 "
            "ELSE 1.0 END GROUP BY lang",
        "frange_lineitem":
            "SELECT l_returnflag, count(*) AS cnt, "
            "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem "
            "WHERE l_extendedprice / l_quantity >= 900.0 "
            "AND l_extendedprice / l_quantity < 1000.0 "
            "GROUP BY l_returnflag",
        "merge_union_events":
            "SELECT event_id, event_type, round(value, 4) AS value "
            "FROM events WHERE event_type = 'click' "
            "UNION ALL "
            "SELECT event_id, event_type, round(value, 4) AS value "
            "FROM events WHERE event_type = 'error'",
        "exact_dedup":
            "SELECT md5(text) AS sig, min(doc_id) AS doc_id "
            "FROM documents GROUP BY md5(text)",
        "ngram_overlap_pairs":
            "WITH t AS (SELECT DISTINCT doc_id, term FROM (" + _TOKS + ") "
            "WHERE term <> '' AND doc_id < 20), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS n_inter FROM t a JOIN t b ON a.term = b.term "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, "
            "coalesce(i.n_inter, 0) AS n_inter, "
            "s1.n + s2.n - coalesce(i.n_inter, 0) AS n_union "
            "FROM sizes s1 JOIN sizes s2 ON s1.doc_id < s2.doc_id "
            "LEFT JOIN inter i ON i.doc_a = s1.doc_id AND i.doc_b = s2.doc_id",
        "hashjoin_orders_customer":
            "SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice "
            "FROM orders JOIN customer ON o_custkey = c_custkey",
        "innerjoin_lineitem_orders":
            "SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus, "
            "round(l_extendedprice * (1 - l_discount), 4) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
        "leftouter_customer_orders":
            "SELECT c_custkey, c_name, count(o_orderkey) AS n_orders "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey, c_name",
        "semijoin_customers":
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 420000)",
        "antijoin_customers":
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 420000)",
        "docfreq_boost_docs":
            # boost = ln(1 + numdocs()/docfreq('data')); docs matching
            # 'data' (non-stopword, pure-alpha => analyzer-agnostic df)
            "WITH toks AS (SELECT DISTINCT doc_id FROM (" + _TOKS + ") "
            "WHERE term = 'data'), "
            "s AS (SELECT (SELECT count(*) FROM documents) AS nd, "
            "(SELECT count(*) FROM toks) AS df) "
            "SELECT t.doc_id AS doc_id, "
            "round(ln(1 + s.nd * 1.0 / s.df), 6) AS boost "
            "FROM toks t, s",
        "term_df_simple":
            "SELECT term, count(*) AS df, sum(tf)::BIGINT AS ttf FROM ("
            "SELECT doc_id, term, count(*) AS tf FROM (" + _TOKS + ") "
            "WHERE term <> '' GROUP BY doc_id, term) GROUP BY term",
        "doc_token_counts":
            "SELECT doc_id, count(*) AS n_tokens FROM (" + _TOKS + ") "
            "WHERE term <> '' GROUP BY doc_id",
        "quality_scores":
            "WITH t2 AS (SELECT doc_id, count(*) AS n_tokens, "
            "sum(CASE WHEN term IN " + _STOPWORDS_SQL + " THEN 1 ELSE 0 END)"
            "::BIGINT AS n_stopwords, "
            "round(sum(length(term)) * 1.0 / count(*), 4) AS mean_token_len "
            "FROM (" + _TOKS + ") WHERE term <> '' GROUP BY doc_id) "
            "SELECT d.doc_id, length(d.text) AS n_chars, "
            "coalesce(t2.n_tokens, 0) AS n_tokens, "
            "coalesce(t2.n_stopwords, 0) AS n_stopwords, "
            "coalesce(t2.mean_token_len, 0.0) AS mean_token_len "
            "FROM documents d LEFT JOIN t2 ON d.doc_id = t2.doc_id",
        "exact_median_events":
            "SELECT event_type, round(quantile_cont(value, 0.5), 6) "
            "AS median_value FROM events GROUP BY event_type",
        "tumbling_window_events":
            "SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT "
            "AS window_start, count(*) AS cnt, round(sum(value), 2) "
            "AS sum_value FROM events GROUP BY event_type, "
            "date_trunc('hour', ts)",
        "hopping_window_events":
            "SELECT event_type, ws AS window_start, count(*) AS cnt, "
            "round(sum(value), 2) AS sum_value FROM ("
            "SELECT event_type, value, unnest(["
            "epoch(date_trunc('hour', ts))::BIGINT, "
            "epoch(date_trunc('hour', ts))::BIGINT - 3600]) AS ws "
            "FROM events) GROUP BY event_type, ws",
        "session_windows_events":
            "WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts)::BIGINT AS session_id FROM g) "
            "SELECT user_id, session_id, count(*) AS n_events "
            "FROM s GROUP BY user_id, session_id",
        "stream_expr_join_rollup":
            'SELECT o_orderstatus, round(sum(l_quantity), 2) '
            'AS "sum(l_quantity)", count(*) AS "count(*)" '
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderstatus",
        "export_sorted_orders":
            "SELECT o_orderkey, o_orderdate, o_totalprice, row_number() "
            "OVER (ORDER BY o_orderdate, o_orderkey) AS rnk FROM orders",
        "date_histogram_events":
            "SELECT date_trunc('day', ts) AS day, count(*) AS cnt "
            "FROM events GROUP BY date_trunc('day', ts)",
        "lang_id":
            "WITH c AS (SELECT doc_id, "
            "count(DISTINCT CASE WHEN term IN ('the','and','of','to','is',"
            "'in','that','it','for','a') THEN term END) AS en, "
            "count(DISTINCT CASE WHEN term IN ('der','die','das','und',"
            "'ist','nicht','ein','zu','mit') THEN term END) AS de, "
            "count(DISTINCT CASE WHEN term IN ('le','la','les','et','est',"
            "'pas','un','une','dans') THEN term END) AS fr, "
            "count(DISTINCT CASE WHEN term IN ('el','la','los','las','es',"
            "'no','un','una','por') THEN term END) AS es "
            "FROM (" + _TOKS + ") WHERE term <> '' GROUP BY doc_id) "
            "SELECT d.doc_id, CASE "
            "WHEN coalesce(c.en,0)=0 AND coalesce(c.de,0)=0 "
            "AND coalesce(c.fr,0)=0 AND coalesce(c.es,0)=0 THEN 'unknown' "
            "WHEN c.en >= c.de AND c.en >= c.fr AND c.en >= c.es THEN 'en' "
            "WHEN c.de >= c.fr AND c.de >= c.es THEN 'de' "
            "WHEN c.fr >= c.es THEN 'fr' ELSE 'es' END AS lang_pred "
            "FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id",
        "pii_redact_docs":
            "WITH aug AS (SELECT doc_id, text || ' contact doc' || doc_id "
            "|| '@example.com or +1-555-' || "
            "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t "
            "FROM documents) SELECT doc_id, "
            "regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), '\\+1-555-[0-9]{4}', '<PHONE>', 'g') "
            "AS redacted, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "AS n_emails, "
            "len(regexp_extract_all(t, '\\+1-555-[0-9]{4}')) AS n_phones "
            "FROM aug",
        "percolate_docs":
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents) "
            "SELECT doc_id, 'batch_and_filter' AS query_name FROM tl "
            "WHERE list_contains(toks, 'batch') "
            "AND list_contains(toks, 'filter') "
            "UNION ALL "
            "SELECT doc_id, 'scan_or_stream' FROM tl "
            "WHERE list_contains(toks, 'scan') "
            "OR list_contains(toks, 'stream') "
            "UNION ALL "
            "SELECT doc_id, 'customer_not_slow' FROM tl "
            "WHERE list_contains(toks, 'customer') "
            "AND NOT list_contains(toks, 'slow') "
            "UNION ALL "
            "SELECT doc_id, 'phrase_batch_filter' FROM tl "
            "WHERE len(list_filter(generate_series(1, len(toks) - 1), "
            "i -> list_extract(toks, i) = 'batch' "
            "AND list_extract(toks, i + 1) = 'filter')) > 0",
        "nb_classify_docs":
            "WITH tl AS (SELECT doc_id, lang, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') "
            "AS toks FROM documents), "
            "occ AS (SELECT doc_id, unnest(toks) AS term FROM tl), "
            "pairs AS (SELECT DISTINCT o.doc_id, t.lang, o.term "
            "FROM occ o JOIN tl t USING (doc_id)), "
            "cls AS (SELECT lang AS c, count(*)::DOUBLE AS df_c "
            "FROM documents GROUP BY lang), "
            "tot AS (SELECT (SELECT count(*) FROM documents)::DOUBLE "
            "AS n_docs, (SELECT count(*) FROM pairs)::DOUBLE AS n_pairs), "
            "tcdf AS (SELECT term, lang AS c, count(*)::DOUBLE AS df "
            "FROM pairs GROUP BY term, lang), "
            "ntok AS (SELECT doc_id, count(*)::DOUBLE AS n FROM occ "
            "GROUP BY doc_id), "
            "tokscore AS (SELECT o.doc_id, c.c, "
            "sum(ln(coalesce(d.df, 0) + 1)) AS s "
            "FROM occ o CROSS JOIN cls c "
            "LEFT JOIN tcdf d ON d.term = o.term AND d.c = c.c "
            "GROUP BY o.doc_id, c.c), "
            "scores AS (SELECT dd.doc_id, c.c, "
            "round(ln(c.df_c) - ln(t.n_docs) + coalesce(ts.s, 0) "
            "- coalesce(n.n, 0) * ln(t.n_pairs / t.n_docs * c.df_c "
            "+ t.n_docs), 6) AS score "
            "FROM documents dd CROSS JOIN cls c CROSS JOIN tot t "
            "LEFT JOIN tokscore ts ON ts.doc_id = dd.doc_id "
            "AND ts.c = c.c "
            "LEFT JOIN ntok n ON n.doc_id = dd.doc_id) "
            "SELECT doc_id, c AS pred_lang FROM ("
            "SELECT doc_id, c, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, c) AS rn FROM scores) WHERE rn = 1",
        "repetition_stats_docs":
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents), "
            "base AS (SELECT doc_id, len(toks) AS n_tokens, "
            "len(list_distinct(toks)) AS n_distinct, "
            "list_transform(generate_series(1, len(toks) - 1), "
            "i -> array_to_string(list_slice(toks, i, i + 1), ' ')) "
            "AS bigrams FROM tl), "
            "occ AS (SELECT doc_id, unnest(bigrams) AS g FROM base), "
            "top AS (SELECT doc_id, max(c) AS top_bigram_count FROM ("
            "SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g"
            ") GROUP BY doc_id) "
            "SELECT b.doc_id, b.n_tokens, b.n_distinct, "
            "CASE WHEN b.n_tokens > 0 THEN round(1.0 - b.n_distinct / "
            "b.n_tokens, 6) ELSE 0.0 END AS dup_token_frac, "
            "coalesce(t.top_bigram_count, 0) AS top_bigram_count "
            "FROM base b LEFT JOIN top t USING (doc_id)",
        "canonical_docs":
            "SELECT source, doc_id, n_chars FROM ("
            "SELECT source, doc_id, n_chars, row_number() OVER ("
            "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn = 1",
        "decontaminate_docs":
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, list_transform(generate_series(1, "
            "len(toks) - 7), i -> array_to_string(list_slice(toks, i, "
            "i + 7), ' ')) AS grams FROM tl), "
            "bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g "
            "WHERE doc_id < 10), "
            "occ AS (SELECT doc_id, unnest(grams) AS gram FROM g), "
            "hits AS (SELECT o.doc_id, count(*) AS n_hits FROM occ o "
            "JOIN bench b USING (gram) GROUP BY o.doc_id) "
            "SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits, "
            "coalesce(h.n_hits, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id)",
        "exactsubstr_dedup":
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents), "
            "win AS (SELECT doc_id, i - 1 AS pos, array_to_string("
            "list_slice(toks, i, i + 11), ' ') AS w "
            "FROM tl, unnest(generate_series(1, len(toks) - 11)) AS t(i)), "
            "flagged AS (SELECT doc_id, pos, row_number() OVER ("
            "PARTITION BY w ORDER BY doc_id, pos) AS rn, "
            "count(*) OVER (PARTITION BY w) AS c FROM win), "
            "loser_tok AS (SELECT DISTINCT doc_id, pos + j AS tok "
            "FROM flagged, unnest(generate_series(0, 11)) AS s(j) "
            "WHERE c >= 2 AND rn > 1), "
            "winner_tok AS (SELECT DISTINCT doc_id, pos + j AS tok "
            "FROM flagged, unnest(generate_series(0, 11)) AS s(j) "
            "WHERE c >= 2 AND rn = 1), "
            "removed AS (SELECT l.doc_id, l.tok FROM loser_tok l "
            "LEFT JOIN winner_tok w ON l.doc_id = w.doc_id "
            "AND l.tok = w.tok WHERE w.tok IS NULL), "
            "ndw AS (SELECT doc_id, count(*) AS n_dup_windows "
            "FROM flagged WHERE c >= 2 AND rn > 1 GROUP BY doc_id), "
            "nrm AS (SELECT doc_id, count(*) AS n_removed_tokens "
            "FROM removed GROUP BY doc_id), "
            "tok_tbl AS (SELECT doc_id, i - 1 AS idx, toks[i] AS tok "
            "FROM tl, unnest(generate_series(1, len(toks))) AS t(i)), "
            "clean AS (SELECT t.doc_id, coalesce(string_agg(t.tok, ' ' "
            "ORDER BY t.idx) FILTER (WHERE r.tok IS NULL), '') "
            "AS text_clean FROM tok_tbl t LEFT JOIN removed r "
            "ON t.doc_id = r.doc_id AND t.idx = r.tok GROUP BY t.doc_id) "
            "SELECT tl.doc_id, len(tl.toks) AS n_tokens, "
            "coalesce(ndw.n_dup_windows, 0) AS n_dup_windows, "
            "coalesce(nrm.n_removed_tokens, 0) AS n_removed_tokens, "
            "coalesce(clean.text_clean, '') AS text_clean "
            "FROM tl LEFT JOIN ndw USING (doc_id) "
            "LEFT JOIN nrm USING (doc_id) LEFT JOIN clean USING (doc_id)",
        "suggest_docs_source":
            "WITH s AS (SELECT source AS surface, MAX(n_chars) AS weight "
            "FROM documents WHERE source LIKE 'src1%' GROUP BY source) "
            "SELECT surface, weight FROM s ORDER BY "
            "(CASE WHEN surface = 'src1' THEN 0 ELSE 1 END), "
            "weight DESC, surface LIMIT 5",
        "doc_fingerprints":
            "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, "
            "list_transform(generate_series(1, least(length(lower(text)), "
            "512)), i -> ord(substring(lower(text), i, 1))::BIGINT)), "
            "(h, c) -> (h * 257 + c) % 2147483647) AS fingerprint "
            "FROM documents",
        "knn_cosine_batch":
            "WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe "
            "FROM embeddings WHERE vec_id IN (0, 7, 42)) "
            "SELECT query_vec_id, vec_id, round(sim, 6) AS sim FROM ("
            "SELECT q.query_vec_id, e.vec_id, "
            "list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) "
            "AS sim, row_number() OVER (PARTITION BY q.query_vec_id "
            "ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], "
            "q.qe::DOUBLE[]) DESC, e.vec_id) AS rn "
            "FROM embeddings e CROSS JOIN q) WHERE rn <= 5",
        "knn_cosine":
            "SELECT vec_id, round(sim, 6) AS sim FROM ("
            "SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]"
            ") AS sim FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10)",
        "knn_ivf_fullprobe":
            # nprobe = n_centroids makes IVF exact, so plain cosine
            # top-k IS the oracle for the whole bucketed ANN path
            "SELECT vec_id, round(sim, 6) AS sim FROM ("
            "SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding FROM embeddings WHERE vec_id = 7)::DOUBLE[]"
            ") AS sim FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10)",
    }
