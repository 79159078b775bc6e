"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship conversion pipeline over sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2 + the large-scale ops suite in docling_serve_ray/ops/).
``oracle_sql()`` — DuckDB twins; every SQL string implements the same
deterministic rule as the Ray pipeline, so row-count + schema +
order-insensitive value-hash all match.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: documents table → interleaved HTML wrap → Readability
    extraction pipeline (actor pool) → exploded ordered span rows."""
    from docling_serve_ray.ops.wrap import convert_documents_table

    return convert_documents_table(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from docling_serve_ray.ops import (
        analytics,
        cluster,
        curation,
        dedup,
        media_ops,
        relational,
        similarity,
        text,
        wrap,
    )

    return {
        # --- conversion / extraction (flagship family) ---
        "convert_spans": wrap.convert_documents_table,
        "convert_markdown": wrap.convert_documents_markdown,
        "convert_html": wrap.convert_documents_html,
        "convert_text": wrap.convert_documents_text,
        "convert_doctags": wrap.convert_documents_doctags,
        "convert_json": wrap.convert_documents_json,
        # --- text analysis ---
        "token_count": text.token_count,
        "text_quality": text.text_quality,
        "lang_id": text.lang_id,
        "fingerprint": text.fingerprint,
        "dataset_split": text.dataset_split,
        "top_tokens": text.top_tokens,
        "top_tokens_per_lang": text.top_tokens_per_lang,
        "pmi_bigrams": text.pmi_bigrams,
        "skipgram_pairs": text.skipgram_pairs,
        "hll_tokens": text.hll_tokens,
        "hll_by_source": text.hll_by_source,
        "cms_tokens": text.cms_tokens,
        "cms_topk_estimate": text.cms_topk_estimate,
        "bloom_tokens": text.bloom_tokens,
        # distributed sketch unions: per-half sketches merged by the
        # sketch monoid; oracle = whole-corpus sketch (exact mergeability)
        "hll_union": text.hll_union,
        "cms_union": text.cms_union,
        "bloom_union": text.bloom_union,
        "regex_token_count": text.regex_token_count,
        "rolling_fingerprint": text.rolling_fingerprint,
        "winnow_fingerprints": text.winnow_fingerprints,
        "chunk_documents": text.chunk_documents,
        "stratified_sample": text.stratified_sample,
        "group_sample": text.group_sample,
        "pii_scrub": text.pii_scrub,
        "repetition_score": text.repetition_score,
        "lexical_stats": text.lexical_stats,
        "unigram_prob_score": text.unigram_prob_score,
        "dsir_select": text.dsir_select,
        "bpe_first_merges": text.bpe_first_merges,
        "source_token_divergence": text.source_token_divergence,
        "source_simpson_diversity": text.source_simpson_diversity,
        "decontaminate": text.decontaminate,
        # --- dedup suite ---
        "exact_dedup": dedup.exact_dedup,
        "dup_rate_by_source": dedup.dup_rate_by_source,
        "boilerplate_paragraphs": dedup.boilerplate_paragraphs,
        "paragraph_dedup": dedup.paragraph_dedup,
        "paragraph_dedup_apply": dedup.paragraph_dedup_apply,
        "c4_line_filter": dedup.c4_line_filter,
        "dup_span_removal": dedup.dup_span_removal,
        "prefix_dup": dedup.prefix_dup,
        "minhash_dedup": dedup.minhash_dedup,
        "ngram_jaccard_dedup": dedup.ngram_jaccard_dedup,
        "ngram_containment": dedup.ngram_containment,
        "fuzzy_prefix_pairs": dedup.fuzzy_prefix_pairs,
        "edit_distance_pairs": dedup.edit_distance_pairs,
        "minhash_calibration": dedup.minhash_calibration,
        "simhash_calibration": dedup.simhash_calibration,
        "simhash_dedup": dedup.simhash_dedup,
        "neardup_clusters": cluster.neardup_clusters,
        "embedding_clusters": cluster.embedding_clusters,
        "dup_cluster_sizes": cluster.dup_cluster_sizes,
        "pagerank": cluster.pagerank,
        "triangle_count": cluster.triangle_count,
        "degree_histogram": cluster.degree_histogram,
        "node_clustering": cluster.node_clustering,
        "jaccard_item_similarity": cluster.jaccard_item_similarity,
        "dedup_apply": curation.dedup_apply,
        "curation_report": curation.curation_report,
        "cross_source_dups": curation.cross_source_dups,
        "source_vocab_overlap": curation.source_vocab_overlap,
        "doc_keywords": curation.doc_keywords,
        "normalized_dedup": curation.normalized_dedup,
        # --- corpus curation ---
        "quality_filter": curation.quality_filter,
        "weighted_mix": curation.weighted_mix,
        "temperature_mix": curation.temperature_mix,
        "oov_rate": curation.oov_rate,
        "vocab_coverage_curve": curation.vocab_coverage_curve,
        "normalize_text": curation.normalize_text,
        "corpus_stats": curation.corpus_stats,
        "dup_ngram_coverage": curation.dup_ngram_coverage,
        "keyword_search": curation.keyword_search,
        # --- similarity search ---
        "ann_topk": similarity.ann_topk,
        "embedding_dim_minmax": similarity.embedding_dim_minmax,
        "embedding_norm_histogram": similarity.embedding_norm_histogram,
        "dim_variance": similarity.dim_variance,
        "ivf_topk": similarity.ivf_topk,
        "embedding_neardup": similarity.embedding_neardup,
        "label_centroids": similarity.label_centroids,
        "kmeans": similarity.kmeans,
        "semantic_dedup": similarity.semantic_dedup,
        "ann_topk_filtered": similarity.ann_topk_filtered,
        "ivf_topk_filtered": similarity.ivf_topk_filtered,
        "ivf_recall": similarity.ivf_recall,
        "embedding_power_iteration": similarity.embedding_power_iteration,
        "quantize_embeddings": similarity.quantize_embeddings,
        "cluster_label_histogram": similarity.cluster_label_histogram,
        "knn_graph": similarity.knn_graph,
        # --- relational / aggregation family ---
        "agg_pricing": relational.agg_pricing,
        "join_priority_revenue": relational.join_priority_revenue,
        "join_revenue": relational.join_revenue,
        "top_orders": relational.top_orders,
        "grouped_topk": relational.grouped_topk,
        "grouped_quantiles": relational.grouped_quantiles,
        "events_window": relational.events_window,
        "sessionize": relational.sessionize,
        "asof_join": relational.asof_join,
        "range_join": relational.range_join,
        "inactive_customers": relational.inactive_customers,
        "funnel_stages": relational.funnel_stages,
        "retention_cohorts": relational.retention_cohorts,
        "distinct_brand_types": relational.distinct_brand_types,
        "running_totals": relational.running_totals,
        "event_deltas": relational.event_deltas,
        "revenue_by_nation": relational.revenue_by_nation,
        "daily_active_users": relational.daily_active_users,
        "order_count_distribution": relational.order_count_distribution,
        "priority_with_returns": relational.priority_with_returns,
        "session_length_histogram": relational.session_length_histogram,
        "monthly_revenue_ma": relational.monthly_revenue_ma,
        "json_props_stats": relational.json_props_stats,
        "value_outliers": relational.value_outliers,
        "mad_outliers": relational.mad_outliers,
        "linear_attribution": relational.linear_attribution,
        "scd2_intervals": relational.scd2_intervals,
        "weekday_hour_profile": relational.weekday_hour_profile,
        "weekly_active_users": relational.weekly_active_users,
        "sliding_window_counts": relational.sliding_window_counts,
        "bloom_semi_join": relational.bloom_semi_join,
        "first_touch_attribution": relational.first_touch_attribution,
        "event_transitions": relational.event_transitions,
        "funnel_conversion": relational.funnel_conversion,
        "event_trigrams": relational.event_trigrams,
        "orphan_audit": relational.orphan_audit,
        "time_to_purchase": relational.time_to_purchase,
        "user_event_pivot": relational.user_event_pivot,
        "sliding_unique_users": relational.sliding_unique_users,
        "activity_streaks": relational.activity_streaks,
        "interval_coverage": relational.interval_coverage,
        "upsert_compaction": relational.upsert_compaction,
        "gap_fill_locf": relational.gap_fill_locf,
        "time_weighted_value": relational.time_weighted_value,
        # --- decision-support analytics (TPC-H-shaped star joins) ---
        "promo_revenue": analytics.promo_revenue,
        "top_supplier": analytics.top_supplier,
        "large_volume_customers": analytics.large_volume_customers,
        "returned_item_report": analytics.returned_item_report,
        "market_share": analytics.market_share,
        "small_qty_revenue": analytics.small_qty_revenue,
        "rfm_features": analytics.rfm_features,
        "revenue_rollup": analytics.revenue_rollup,
        "ship_delay_histogram": analytics.ship_delay_histogram,
        "customer_value_deciles": analytics.customer_value_deciles,
        "order_value_percentiles": analytics.order_value_percentiles,
        "discount_revenue": analytics.discount_revenue,
        "brand_qty_revenue": analytics.brand_qty_revenue,
        "benford_digits": analytics.benford_digits,
        "brand_itemsets3": analytics.brand_itemsets3,
        "histogram2d": analytics.histogram2d,
        "segment_repeat_customers": analytics.segment_repeat_customers,
        "global_sales_opportunity": analytics.global_sales_opportunity,
        "sole_return_supplier": analytics.sole_return_supplier,
        "brand_supplier_counts": analytics.brand_supplier_counts,
        "volume_shipping": analytics.volume_shipping,
        "linestatus_priority": analytics.linestatus_priority,
        "disjunctive_revenue": analytics.disjunctive_revenue,
        "copurchase_pairs": analytics.copurchase_pairs,
        "region_share": analytics.region_share,
        "yoy_growth": analytics.yoy_growth,
        "segment_value_quintiles": analytics.segment_value_quintiles,
        "value_migration": analytics.value_migration,
        "whales_vs_frequents": analytics.whales_vs_frequents,
        "revenue_trend": analytics.revenue_trend,
        "order_type_signature": analytics.order_type_signature,
        "brand_price_rank": analytics.brand_price_rank,
        "order_priority_check": analytics.order_priority_check,
        "product_type_profit": analytics.product_type_profit,
        "shipping_priority": analytics.shipping_priority,
        "local_supplier_volume": analytics.local_supplier_volume,
        "modal_priority": analytics.modal_priority,
        "pareto_front": analytics.pareto_front,
        "revenue_pareto": analytics.revenue_pareto,
        "cumulative_revenue": analytics.cumulative_revenue,
        "tfidf_top_terms": curation.tfidf_top_terms,
        "length_percentile_filter": curation.length_percentile_filter,
        "token_budget_select": curation.token_budget_select,
        "bm25_search": curation.bm25_search,
        "rrf_search": curation.rrf_search,
        "table_profile": curation.table_profile,
        "global_rank": curation.global_rank,
        "vocab_build": curation.vocab_build,
        "tokenize_ids": curation.tokenize_ids,
        "pack_sequences": curation.pack_sequences,
        "epoch_shuffle": curation.epoch_shuffle,
        "unimax_mix": curation.unimax_mix,
        "ngram_novelty": curation.ngram_novelty,
        "rank_blend": curation.rank_blend,
        "dict_encode_ordered": curation.dict_encode_ordered,
        "source_ks_distance": curation.source_ks_distance,
        "systematic_weight_sample": curation.systematic_weight_sample,
        "lang_source_independence": curation.lang_source_independence,
        "ccnet_bucket": curation.ccnet_bucket,
        "shard_balance": curation.shard_balance,
        "webdataset_manifest": curation.webdataset_manifest,
        "script_mix": curation.script_mix,
        "signal_correlation": curation.signal_correlation,
        "inverted_index": curation.inverted_index,
        # --- multimodal (stub decoder, real plumbing) ---
        "media_meta": media_ops.media_meta,
        "audio_chunk_plan": media_ops.audio_chunk_plan,
        "aspect_bucket_plan": media_ops.aspect_bucket_plan,
        "media_dedup": media_ops.media_dedup,
        "video_frame_sample": media_ops.video_frame_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles — each mirrors its Ray twin's deterministic rule exactly.
# ---------------------------------------------------------------------------

_CONVERT_SPANS_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         string_split(text, ' ') AS words
  FROM documents
),
titles AS (
  SELECT doc_id, 'title' AS kind,
         'Document ' || doc_id || ' from ' || source AS text,
         '' AS media_ref, 0 AS "offset"
  FROM w
),
paras AS (
  SELECT doc_id, 'paragraph' AS kind,
         array_to_string(words[i*20+1 : (i+1)*20], ' ') AS text,
         '' AS media_ref, CAST(i + 1 AS INTEGER) AS "offset"
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
)
SELECT doc_id, kind, text, media_ref, CAST("offset" AS INTEGER) AS "offset"
FROM (SELECT * FROM titles UNION ALL SELECT * FROM paras)
"""

_CONVERT_MD_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         string_split(text, ' ') AS words
  FROM documents
),
paras AS (
  SELECT doc_id,
         string_agg(array_to_string(words[i*20+1 : (i+1)*20], ' '), chr(10) || chr(10) ORDER BY i) AS body
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
  GROUP BY doc_id
)
SELECT w.doc_id,
       '# Document ' || w.doc_id || ' from ' || w.source || chr(10) || chr(10) || p.body
         AS md_content
FROM w JOIN paras p USING (doc_id)
"""


_CONVERT_TEXT_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         string_split(text, ' ') AS words
  FROM documents
),
paras AS (
  SELECT doc_id,
         string_agg(array_to_string(words[i*20+1 : (i+1)*20], ' '), chr(10) || chr(10) ORDER BY i) AS body
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
  GROUP BY doc_id
)
SELECT w.doc_id,
       'Document ' || w.doc_id || ' from ' || w.source || chr(10) || chr(10) || p.body
         AS text_content
FROM w JOIN paras p USING (doc_id)
"""


_CONVERT_DOCTAGS_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         string_split(text, ' ') AS words
  FROM documents
),
paras AS (
  SELECT doc_id,
         string_agg('<paragraph><loc_' || CAST(i + 1 AS VARCHAR) || '>'
                    || array_to_string(words[i*20+1 : (i+1)*20], ' ')
                    || '</paragraph>', '' ORDER BY i) AS body
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
  GROUP BY doc_id
)
SELECT w.doc_id,
       '<doctag><title><loc_0>Document ' || w.doc_id || ' from ' || w.source
         || '</title>' || p.body || '</doctag>' AS doctags_content
FROM w JOIN paras p USING (doc_id)
"""


_CONVERT_JSON_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         string_split(text, ' ') AS words
  FROM documents
),
spans AS (
  SELECT doc_id, 'title' AS kind,
         'Document ' || doc_id || ' from ' || source AS text,
         '' AS media_ref, 0 AS off
  FROM w
  UNION ALL
  SELECT doc_id, 'paragraph',
         array_to_string(words[i*20+1 : (i+1)*20], ' '), '',
         CAST(i + 1 AS INTEGER)
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
),
b AS (
  SELECT doc_id,
         list(struct_pack(kind := kind, text := text, media_ref := media_ref,
                          "offset" := off) ORDER BY off) AS body
  FROM spans GROUP BY doc_id
)
SELECT doc_id,
       to_json(struct_pack(schema_name := 'DoclingDocument',
                           version := '1.0.0', name := doc_id,
                           body := body))::VARCHAR AS json_content
FROM b
"""

_LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
),
c AS (
  SELECT doc_id, text,
    len(list_filter(words, w -> w IN ('the','a','of','and','to','is'))) AS c_en,
    len(list_filter(words, w -> w IN ('der','die','das','und','nicht','ist'))) AS c_de,
    len(list_filter(words, w -> w IN ('le','la','les','et','est','dans'))) AS c_fr,
    len(list_filter(words, w -> w IN ('el','los','las','es','en','y'))) AS c_es
  FROM t
)
SELECT doc_id,
  CASE
    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
    WHEN regexp_matches(text, '[؀-ۿ]') THEN 'ar'
    WHEN regexp_matches(text, '[Ͱ-Ͽ]') THEN 'el'
    WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'unknown'
    WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
    WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
    WHEN c_fr >= c_es THEN 'fr'
    ELSE 'es'
  END AS pred_lang
FROM c
"""


# esc() mirrors the engine's html.escape(text, quote=False): & first, then
# < and > — without it, any corpus text containing HTML metacharacters
# would diverge from spans_to_html's output.
_CONVERT_HTML_SQL = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         replace(replace(replace(source, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
           AS source,
         string_split(
           replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
           ' ') AS words
  FROM documents
),
paras AS (
  SELECT doc_id,
         string_agg('<p>' || array_to_string(words[i*20+1 : (i+1)*20], ' ') || '</p>',
                    chr(10) ORDER BY i) AS body
  FROM w, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(floor((len(words)-1)/20.0) AS BIGINT))) AS i
  )
  GROUP BY doc_id
)
SELECT w.doc_id,
       '<!DOCTYPE html>' || chr(10)
       || '<html><head><meta charset="utf-8"/><title>Document ' || w.doc_id
       || ' from ' || w.source || '</title></head><body>' || chr(10)
       || '<h1>Document ' || w.doc_id || ' from ' || w.source || '</h1>' || chr(10)
       || p.body || chr(10) || '</body></html>'
         AS html_content
FROM w JOIN paras p USING (doc_id)
"""


def oracle_sql() -> dict[str, str]:
    from docling_serve_ray.ops.dedup import (
        EXACT_DEDUP_SQL,
        DUP_RATE_BY_SOURCE_SQL,
        BOILERPLATE_PARAGRAPHS_SQL,
        JACCARD_PAIRS_SQL,
        MINHASH_PAIRS_SQL,
        NGRAM_CONTAINMENT_SQL,
        FUZZY_PREFIX_PAIRS_SQL,
        PARAGRAPH_DEDUP_SQL,
        PARAGRAPH_DEDUP_APPLY_SQL,
        C4_LINE_FILTER_SQL,
        DUP_SPAN_REMOVAL_SQL,
        PREFIX_DUP_SQL,
        SIMHASH_PAIRS_SQL,
        EDIT_DISTANCE_PAIRS_SQL,
        MINHASH_CALIBRATION_SQL,
        SIMHASH_CALIBRATION_SQL,
    )
    from docling_serve_ray.ops.cluster import (
        DUP_CLUSTER_SIZES_SQL,
        EMBEDDING_CLUSTERS_SQL,
        NEARDUP_CLUSTERS_SQL,
        PAGERANK_SQL,
        TRIANGLE_COUNT_SQL,
        DEGREE_HISTOGRAM_SQL,
        NODE_CLUSTERING_SQL,
        JACCARD_ITEM_SIMILARITY_SQL,
    )
    from docling_serve_ray.ops.curation import (
        CORPUS_STATS_SQL,
        DEDUP_APPLY_SQL,
        CURATION_REPORT_SQL,
        CROSS_SOURCE_DUPS_SQL,
        SOURCE_VOCAB_OVERLAP_SQL,
        DOC_KEYWORDS_SQL,
        NORMALIZED_DEDUP_SQL,
        DUP_NGRAM_COVERAGE_SQL,
        KEYWORD_SEARCH_SQL,
        NORMALIZE_TEXT_SQL,
        BM25_SEARCH_SQL,
        RRF_SEARCH_SQL,
        TABLE_PROFILE_SQL,
        GLOBAL_RANK_SQL,
        VOCAB_BUILD_SQL,
        TOKENIZE_IDS_SQL,
        PACK_SEQUENCES_SQL,
        EPOCH_SHUFFLE_SQL,
        UNIMAX_MIX_SQL,
        NGRAM_NOVELTY_SQL,
        RANK_BLEND_SQL,
        DICT_ENCODE_ORDERED_SQL,
        SOURCE_KS_DISTANCE_SQL,
        SYSTEMATIC_WEIGHT_SAMPLE_SQL,
        LANG_SOURCE_INDEPENDENCE_SQL,
        CCNET_BUCKET_SQL,
        SHARD_BALANCE_SQL,
        WEBDATASET_MANIFEST_SQL,
        SCRIPT_MIX_SQL,
        SIGNAL_CORRELATION_SQL,
        INVERTED_INDEX_SQL,
        LENGTH_PERCENTILE_FILTER_SQL,
        TOKEN_BUDGET_SELECT_SQL,
        TFIDF_TOP_TERMS_SQL,
        QUALITY_FILTER_SQL,
        WEIGHTED_MIX_SQL,
        TEMPERATURE_MIX_SQL,
        OOV_RATE_SQL,
        VOCAB_COVERAGE_SQL,
    )
    from docling_serve_ray.ops.analytics import (
        LARGE_VOLUME_CUSTOMERS_SQL,
        MARKET_SHARE_SQL,
        PROMO_REVENUE_SQL,
        RETURNED_ITEM_REPORT_SQL,
        REVENUE_ROLLUP_SQL,
        RFM_FEATURES_SQL,
        SMALL_QTY_REVENUE_SQL,
        TOP_SUPPLIER_SQL,
        SHIP_DELAY_HISTOGRAM_SQL,
        VALUE_DECILES_SQL,
        ORDER_VALUE_PERCENTILES_SQL,
        DISCOUNT_REVENUE_SQL,
        BRAND_QTY_REVENUE_SQL,
        BENFORD_DIGITS_SQL,
        BRAND_ITEMSETS3_SQL,
        HISTOGRAM2D_SQL,
        SEGMENT_REPEAT_CUSTOMERS_SQL,
        GLOBAL_SALES_OPPORTUNITY_SQL,
        SOLE_RETURN_SUPPLIER_SQL,
        BRAND_SUPPLIER_COUNTS_SQL,
        VOLUME_SHIPPING_SQL,
        LINESTATUS_PRIORITY_SQL,
        DISJUNCTIVE_REVENUE_SQL,
        COPURCHASE_PAIRS_SQL,
        REGION_SHARE_SQL,
        YOY_GROWTH_SQL,
        SEGMENT_VALUE_QUINTILES_SQL,
        VALUE_MIGRATION_SQL,
        WHALES_VS_FREQUENTS_SQL,
        REVENUE_TREND_SQL,
        ORDER_TYPE_SIGNATURE_SQL,
        BRAND_PRICE_RANK_SQL,
        ORDER_PRIORITY_CHECK_SQL,
        PRODUCT_TYPE_PROFIT_SQL,
        SHIPPING_PRIORITY_SQL,
        LOCAL_SUPPLIER_VOLUME_SQL,
        MODAL_PRIORITY_SQL,
        PARETO_FRONT_SQL,
        REVENUE_PARETO_SQL,
        CUMULATIVE_REVENUE_SQL,
    )
    from docling_serve_ray.ops.media_ops import (
        FRAME_SAMPLE_SQL,
        MEDIA_DEDUP_SQL,
        MEDIA_META_SQL,
        AUDIO_CHUNK_PLAN_SQL,
        ASPECT_BUCKET_PLAN_SQL,
    )
    from docling_serve_ray.ops.relational import (
        AGG_PRICING_SQL,
        ASOF_JOIN_SQL,
        RANGE_JOIN_SQL,
        JOIN_PRIORITY_REVENUE_SQL,
        SESSIONIZE_SQL,
        DISTINCT_BRAND_TYPES_SQL,
        EVENTS_WINDOW_SQL,
        FUNNEL_STAGES_SQL,
        GROUPED_QUANTILES_SQL,
        INACTIVE_CUSTOMERS_SQL,
        GROUPED_TOPK_SQL,
        JOIN_REVENUE_SQL,
        RETENTION_COHORTS_SQL,
        TOP_ORDERS_SQL,
        RUNNING_TOTALS_SQL,
        EVENT_DELTAS_SQL,
        REVENUE_BY_NATION_SQL,
        DAILY_ACTIVE_USERS_SQL,
        ORDER_COUNT_DISTRIBUTION_SQL,
        PRIORITY_WITH_RETURNS_SQL,
        SESSION_LENGTH_HISTOGRAM_SQL,
        MONTHLY_REVENUE_MA_SQL,
        JSON_PROPS_STATS_SQL,
        VALUE_OUTLIERS_SQL,
        MAD_OUTLIERS_SQL,
        LINEAR_ATTRIBUTION_SQL,
        SCD2_INTERVALS_SQL,
        WEEKDAY_HOUR_PROFILE_SQL,
        WEEKLY_ACTIVE_USERS_SQL,
        SLIDING_WINDOW_COUNTS_SQL,
        BLOOM_SEMI_JOIN_SQL,
        FIRST_TOUCH_ATTRIBUTION_SQL,
        EVENT_TRANSITIONS_SQL,
        FUNNEL_CONVERSION_SQL,
        EVENT_TRIGRAMS_SQL,
        ORPHAN_AUDIT_SQL,
        TIME_TO_PURCHASE_SQL,
        USER_EVENT_PIVOT_SQL,
        SLIDING_UNIQUE_USERS_SQL,
        ACTIVITY_STREAKS_SQL,
        INTERVAL_COVERAGE_SQL,
        UPSERT_COMPACTION_SQL,
        GAP_FILL_LOCF_SQL,
        TIME_WEIGHTED_VALUE_SQL,
    )
    from docling_serve_ray.ops.similarity import (
        ANN_TOPK_FILTERED_SQL,
        ANN_TOPK_SQL,
        EMBEDDING_DIM_MINMAX_SQL,
        EMBEDDING_NORM_HISTOGRAM_SQL,
        DIM_VARIANCE_SQL,
        EMBEDDING_NEARDUP_SQL,
        KMEANS_SQL,
        LABEL_CENTROIDS_SQL,
        SEMANTIC_DEDUP_SQL,
        CLUSTER_LABEL_HISTOGRAM_SQL,
        KNN_GRAPH_SQL,
        QUANTIZE_EMBEDDINGS_SQL,
        IVF_RECALL_SQL,
        EMBEDDING_POWER_ITERATION_SQL,
    )
    from docling_serve_ray.ops.text import (
        CHUNK_DOCUMENTS_SQL,
        DATASET_SPLIT_SQL,
        BLOOM_TOKENS_SQL,
        CMS_TOKENS_SQL,
        CMS_TOPK_ESTIMATE_SQL,
        DECON_SQL,
        HLL_TOKENS_SQL,
        HLL_BY_SOURCE_SQL,
        PII_SCRUB_SQL,
        REGEX_TOKEN_COUNT_SQL,
        REPETITION_SCORE_SQL,
        ROLLING_FINGERPRINT_SQL,
        WINNOW_FINGERPRINTS_SQL,
        STRATIFIED_SAMPLE_SQL,
        GROUP_SAMPLE_SQL,
        PMI_BIGRAMS_SQL,
        SKIPGRAM_PAIRS_SQL,
        TOP_TOKENS_SQL,
        TOP_TOKENS_PER_LANG_SQL,
        LEXICAL_STATS_SQL,
        UNIGRAM_PROB_SCORE_SQL,
        DSIR_SELECT_SQL,
        BPE_FIRST_MERGES_SQL,
        SOURCE_TOKEN_DIVERGENCE_SQL,
        SOURCE_SIMPSON_DIVERSITY_SQL,
    )

    return {
        "convert_spans": _CONVERT_SPANS_SQL,
        "convert_markdown": _CONVERT_MD_SQL,
        "convert_html": _CONVERT_HTML_SQL,
        "convert_text": _CONVERT_TEXT_SQL,
        "convert_doctags": _CONVERT_DOCTAGS_SQL,
        "convert_json": _CONVERT_JSON_SQL,
        "token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens"
            " FROM documents"
        ),
        "text_quality": """
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars_calc,
                     string_split(text, ' ') AS words
              FROM documents
            )
            SELECT doc_id,
                   CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
                   CAST(len(words) AS BIGINT) AS n_tokens,
                   CAST((n_chars_calc - (len(words) - 1)) * 1000000 // len(words) AS BIGINT)
                     AS avg_token_len_micro,
                   CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to'))) * 1000000 // len(words) AS BIGINT)
                     AS stop_ratio_micro
            FROM t
        """,
        "lang_id": _LANG_ID_SQL,
        "fingerprint": "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
        "dataset_split": DATASET_SPLIT_SQL,
        "top_tokens": TOP_TOKENS_SQL,
        "top_tokens_per_lang": TOP_TOKENS_PER_LANG_SQL,
        "hll_tokens": HLL_TOKENS_SQL,
        "hll_by_source": HLL_BY_SOURCE_SQL,
        "cms_tokens": CMS_TOKENS_SQL,
        "cms_topk_estimate": CMS_TOPK_ESTIMATE_SQL,
        "bloom_tokens": BLOOM_TOKENS_SQL,
        # the union ops' oracle IS the whole-corpus sketch: a green row
        # proves union(sketch(A), sketch(B)) == sketch(A ∪ B) bit-exactly
        "hll_union": HLL_TOKENS_SQL,
        "cms_union": CMS_TOKENS_SQL,
        "bloom_union": BLOOM_TOKENS_SQL,
        "regex_token_count": REGEX_TOKEN_COUNT_SQL,
        "rolling_fingerprint": ROLLING_FINGERPRINT_SQL,
        "winnow_fingerprints": WINNOW_FINGERPRINTS_SQL,
        "chunk_documents": CHUNK_DOCUMENTS_SQL,
        "stratified_sample": STRATIFIED_SAMPLE_SQL,
        "group_sample": GROUP_SAMPLE_SQL,
        "pmi_bigrams": PMI_BIGRAMS_SQL,
        "skipgram_pairs": SKIPGRAM_PAIRS_SQL,
        "pii_scrub": PII_SCRUB_SQL,
        "repetition_score": REPETITION_SCORE_SQL,
        "lexical_stats": LEXICAL_STATS_SQL,
        "unigram_prob_score": UNIGRAM_PROB_SCORE_SQL,
        "dsir_select": DSIR_SELECT_SQL,
        "bpe_first_merges": BPE_FIRST_MERGES_SQL,
        "source_token_divergence": SOURCE_TOKEN_DIVERGENCE_SQL,
        "source_simpson_diversity": SOURCE_SIMPSON_DIVERSITY_SQL,
        "decontaminate": DECON_SQL,
        "exact_dedup": EXACT_DEDUP_SQL,
        "dup_rate_by_source": DUP_RATE_BY_SOURCE_SQL,
        "boilerplate_paragraphs": BOILERPLATE_PARAGRAPHS_SQL,
        "paragraph_dedup": PARAGRAPH_DEDUP_SQL,
        "paragraph_dedup_apply": PARAGRAPH_DEDUP_APPLY_SQL,
        "c4_line_filter": C4_LINE_FILTER_SQL,
        "dup_span_removal": DUP_SPAN_REMOVAL_SQL,
        "prefix_dup": PREFIX_DUP_SQL,
        "minhash_dedup": MINHASH_PAIRS_SQL,  # LSH+verify == exact pairs at τ=0.7
        "ngram_jaccard_dedup": JACCARD_PAIRS_SQL,
        "ngram_containment": NGRAM_CONTAINMENT_SQL,
        "fuzzy_prefix_pairs": FUZZY_PREFIX_PAIRS_SQL,
        "edit_distance_pairs": EDIT_DISTANCE_PAIRS_SQL,
        "minhash_calibration": MINHASH_CALIBRATION_SQL,
        "simhash_calibration": SIMHASH_CALIBRATION_SQL,
        "simhash_dedup": SIMHASH_PAIRS_SQL,  # md5_number_upper == _md5_64's fold
        "neardup_clusters": NEARDUP_CLUSTERS_SQL,  # recursive-CTE closure twin
        "embedding_clusters": EMBEDDING_CLUSTERS_SQL,
        "dup_cluster_sizes": DUP_CLUSTER_SIZES_SQL,
        "pagerank": PAGERANK_SQL,
        "triangle_count": TRIANGLE_COUNT_SQL,
        "degree_histogram": DEGREE_HISTOGRAM_SQL,
        "node_clustering": NODE_CLUSTERING_SQL,
        "jaccard_item_similarity": JACCARD_ITEM_SIMILARITY_SQL,
        "dedup_apply": DEDUP_APPLY_SQL,  # exact + near dedup end to end
        "curation_report": CURATION_REPORT_SQL,
        "cross_source_dups": CROSS_SOURCE_DUPS_SQL,
        "source_vocab_overlap": SOURCE_VOCAB_OVERLAP_SQL,
        "doc_keywords": DOC_KEYWORDS_SQL,
        "normalized_dedup": NORMALIZED_DEDUP_SQL,
        "quality_filter": QUALITY_FILTER_SQL,
        "weighted_mix": WEIGHTED_MIX_SQL,
        "temperature_mix": TEMPERATURE_MIX_SQL,
        "oov_rate": OOV_RATE_SQL,
        "vocab_coverage_curve": VOCAB_COVERAGE_SQL,
        "normalize_text": NORMALIZE_TEXT_SQL,
        "corpus_stats": CORPUS_STATS_SQL,
        "dup_ngram_coverage": DUP_NGRAM_COVERAGE_SQL,
        "keyword_search": KEYWORD_SEARCH_SQL,
        "ann_topk": ANN_TOPK_SQL,
        "embedding_dim_minmax": EMBEDDING_DIM_MINMAX_SQL,
        "embedding_norm_histogram": EMBEDDING_NORM_HISTOGRAM_SQL,
        "dim_variance": DIM_VARIANCE_SQL,
        "ivf_topk": ANN_TOPK_SQL,  # nprobe == nlist → exact, same oracle
        "embedding_neardup": EMBEDDING_NEARDUP_SQL,
        "label_centroids": LABEL_CENTROIDS_SQL,
        "kmeans": KMEANS_SQL,  # chained-CTE Lloyd iterations, integer output
        "semantic_dedup": SEMANTIC_DEDUP_SQL,
        "ann_topk_filtered": ANN_TOPK_FILTERED_SQL,
        # nprobe == nlist ⇒ the filtered IVF result equals exact filtered search
        "ivf_topk_filtered": ANN_TOPK_FILTERED_SQL,
        "ivf_recall": IVF_RECALL_SQL,
        "embedding_power_iteration": EMBEDDING_POWER_ITERATION_SQL,
        "agg_pricing": AGG_PRICING_SQL,
        "join_priority_revenue": JOIN_PRIORITY_REVENUE_SQL,
        "join_revenue": JOIN_REVENUE_SQL,
        "top_orders": TOP_ORDERS_SQL,
        "grouped_topk": GROUPED_TOPK_SQL,
        "grouped_quantiles": GROUPED_QUANTILES_SQL,
        "events_window": EVENTS_WINDOW_SQL,
        "sessionize": SESSIONIZE_SQL,
        "asof_join": ASOF_JOIN_SQL,
        "range_join": RANGE_JOIN_SQL,
        "inactive_customers": INACTIVE_CUSTOMERS_SQL,
        "funnel_stages": FUNNEL_STAGES_SQL,
        "retention_cohorts": RETENTION_COHORTS_SQL,
        "running_totals": RUNNING_TOTALS_SQL,
        "event_deltas": EVENT_DELTAS_SQL,
        "revenue_by_nation": REVENUE_BY_NATION_SQL,
        "daily_active_users": DAILY_ACTIVE_USERS_SQL,
        "order_count_distribution": ORDER_COUNT_DISTRIBUTION_SQL,
        "priority_with_returns": PRIORITY_WITH_RETURNS_SQL,
        "session_length_histogram": SESSION_LENGTH_HISTOGRAM_SQL,
        "monthly_revenue_ma": MONTHLY_REVENUE_MA_SQL,
        "json_props_stats": JSON_PROPS_STATS_SQL,
        "value_outliers": VALUE_OUTLIERS_SQL,
        "mad_outliers": MAD_OUTLIERS_SQL,
        "linear_attribution": LINEAR_ATTRIBUTION_SQL,
        "scd2_intervals": SCD2_INTERVALS_SQL,
        "weekday_hour_profile": WEEKDAY_HOUR_PROFILE_SQL,
        "weekly_active_users": WEEKLY_ACTIVE_USERS_SQL,
        "sliding_window_counts": SLIDING_WINDOW_COUNTS_SQL,
        "bloom_semi_join": BLOOM_SEMI_JOIN_SQL,
        "first_touch_attribution": FIRST_TOUCH_ATTRIBUTION_SQL,
        "event_transitions": EVENT_TRANSITIONS_SQL,
        "funnel_conversion": FUNNEL_CONVERSION_SQL,
        "event_trigrams": EVENT_TRIGRAMS_SQL,
        "orphan_audit": ORPHAN_AUDIT_SQL,
        "time_to_purchase": TIME_TO_PURCHASE_SQL,
        "user_event_pivot": USER_EVENT_PIVOT_SQL,
        "sliding_unique_users": SLIDING_UNIQUE_USERS_SQL,
        "activity_streaks": ACTIVITY_STREAKS_SQL,
        "interval_coverage": INTERVAL_COVERAGE_SQL,
        "upsert_compaction": UPSERT_COMPACTION_SQL,
        "gap_fill_locf": GAP_FILL_LOCF_SQL,
        "time_weighted_value": TIME_WEIGHTED_VALUE_SQL,
        "promo_revenue": PROMO_REVENUE_SQL,
        "top_supplier": TOP_SUPPLIER_SQL,
        "large_volume_customers": LARGE_VOLUME_CUSTOMERS_SQL,
        "returned_item_report": RETURNED_ITEM_REPORT_SQL,
        "market_share": MARKET_SHARE_SQL,
        "small_qty_revenue": SMALL_QTY_REVENUE_SQL,
        "rfm_features": RFM_FEATURES_SQL,
        "revenue_rollup": REVENUE_ROLLUP_SQL,
        "ship_delay_histogram": SHIP_DELAY_HISTOGRAM_SQL,
        "customer_value_deciles": VALUE_DECILES_SQL,
        "order_value_percentiles": ORDER_VALUE_PERCENTILES_SQL,
        "discount_revenue": DISCOUNT_REVENUE_SQL,
        "brand_qty_revenue": BRAND_QTY_REVENUE_SQL,
        "benford_digits": BENFORD_DIGITS_SQL,
        "brand_itemsets3": BRAND_ITEMSETS3_SQL,
        "histogram2d": HISTOGRAM2D_SQL,
        "segment_repeat_customers": SEGMENT_REPEAT_CUSTOMERS_SQL,
        "global_sales_opportunity": GLOBAL_SALES_OPPORTUNITY_SQL,
        "sole_return_supplier": SOLE_RETURN_SUPPLIER_SQL,
        "brand_supplier_counts": BRAND_SUPPLIER_COUNTS_SQL,
        "volume_shipping": VOLUME_SHIPPING_SQL,
        "linestatus_priority": LINESTATUS_PRIORITY_SQL,
        "disjunctive_revenue": DISJUNCTIVE_REVENUE_SQL,
        "copurchase_pairs": COPURCHASE_PAIRS_SQL,
        "region_share": REGION_SHARE_SQL,
        "yoy_growth": YOY_GROWTH_SQL,
        "segment_value_quintiles": SEGMENT_VALUE_QUINTILES_SQL,
        "value_migration": VALUE_MIGRATION_SQL,
        "whales_vs_frequents": WHALES_VS_FREQUENTS_SQL,
        "revenue_trend": REVENUE_TREND_SQL,
        "order_type_signature": ORDER_TYPE_SIGNATURE_SQL,
        "brand_price_rank": BRAND_PRICE_RANK_SQL,
        "order_priority_check": ORDER_PRIORITY_CHECK_SQL,
        "product_type_profit": PRODUCT_TYPE_PROFIT_SQL,
        "shipping_priority": SHIPPING_PRIORITY_SQL,
        "local_supplier_volume": LOCAL_SUPPLIER_VOLUME_SQL,
        "modal_priority": MODAL_PRIORITY_SQL,
        "pareto_front": PARETO_FRONT_SQL,
        "revenue_pareto": REVENUE_PARETO_SQL,
        "cumulative_revenue": CUMULATIVE_REVENUE_SQL,
        "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
        "length_percentile_filter": LENGTH_PERCENTILE_FILTER_SQL,
        "token_budget_select": TOKEN_BUDGET_SELECT_SQL,
        "bm25_search": BM25_SEARCH_SQL,
        "rrf_search": RRF_SEARCH_SQL,
        "table_profile": TABLE_PROFILE_SQL,
        "global_rank": GLOBAL_RANK_SQL,
        "vocab_build": VOCAB_BUILD_SQL,
        "tokenize_ids": TOKENIZE_IDS_SQL,
        "pack_sequences": PACK_SEQUENCES_SQL,
        "epoch_shuffle": EPOCH_SHUFFLE_SQL,
        "unimax_mix": UNIMAX_MIX_SQL,
        "ngram_novelty": NGRAM_NOVELTY_SQL,
        "rank_blend": RANK_BLEND_SQL,
        "dict_encode_ordered": DICT_ENCODE_ORDERED_SQL,
        "source_ks_distance": SOURCE_KS_DISTANCE_SQL,
        "systematic_weight_sample": SYSTEMATIC_WEIGHT_SAMPLE_SQL,
        "lang_source_independence": LANG_SOURCE_INDEPENDENCE_SQL,
        "ccnet_bucket": CCNET_BUCKET_SQL,
        "shard_balance": SHARD_BALANCE_SQL,
        "webdataset_manifest": WEBDATASET_MANIFEST_SQL,
        "script_mix": SCRIPT_MIX_SQL,
        "signal_correlation": SIGNAL_CORRELATION_SQL,
        "inverted_index": INVERTED_INDEX_SQL,
        "quantize_embeddings": QUANTIZE_EMBEDDINGS_SQL,
        "cluster_label_histogram": CLUSTER_LABEL_HISTOGRAM_SQL,
        "knn_graph": KNN_GRAPH_SQL,
        "distinct_brand_types": DISTINCT_BRAND_TYPES_SQL,
        "media_meta": MEDIA_META_SQL,
        "audio_chunk_plan": AUDIO_CHUNK_PLAN_SQL,
        "aspect_bucket_plan": ASPECT_BUCKET_PLAN_SQL,
        "media_dedup": MEDIA_DEDUP_SQL,
        "video_frame_sample": FRAME_SAMPLE_SQL,
    }
