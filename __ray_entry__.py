"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 search)
on sf0.001; ``queries()``/``oracle_sql()`` expose every operator family from
SURVEY.md §2 plus the training-data extensions, checked against DuckDB at
sf0.01.  Ray is initialised by the driver before import — nothing here (or
in the library) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index over the documents corpus, then run the pinned BM25 query set."""
    from solr_indexer_ray.contract import q_bm25_topk

    table = q_bm25_topk("/root/testdata/sf0.001")
    return table.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    # Dict order matters: the driver's correctness sweep checks the FIRST
    # ~50 entries.  Round-5 rotation: keys whose underlying code changed
    # since their last driver check lead (VERDICT r4 item 1), r4-green
    # keys trail, so cumulative driver coverage stays at every entry.
    from solr_indexer_ray import contract as c

    return {
        # --- r5 window: re-verify code rewritten since the last driver
        # check.  gopher_filter/stream_rollup failed hash_match in r2,
        # were fixed, but sat outside the 50-key window ever since; the
        # BM25 family's varint/expansion/serving paths were rewritten in
        # r3-r4 (last driver-green r2). ---
        "gopher_filter": c.q_gopher_filter,
        "stream_rollup": c.q_stream_rollup,
        "bm25_topk": c.q_bm25_topk,
        "phrase_topk": c.q_phrase_topk,
        # r5: same phrase set answered by the next-word (bigram) index
        # with NO positions stored — must match the same SQL oracle
        "phrase_bigram_topk": c.q_phrase_bigram_topk,
        # r5: 3+-term phrases via the bigram-chain matcher on a combined
        # index — oracle stays the generic positional phrase SQL
        "phrase_chain_topk": c.q_phrase_chain_topk,
        "near_topk": c.q_near_topk,
        "wildcard_topk": c.q_wildcard_topk,
        "wildcard_infix_topk": c.q_wildcard_infix_topk,
        "regex_topk": c.q_regex_topk,
        "fuzzy_topk": c.q_fuzzy_topk,
        "stop_topk": c.q_stop_topk,
        "stem_topk": c.q_stem_topk,
        "term_df": c.q_term_df,
        "doc_stats": c.q_doc_stats,
        "top_terms": c.q_top_terms,
        "sorted_browse": c.q_sorted_browse,
        "grouped": c.q_grouped,
        "collapse_topk": c.q_collapse_topk,
        "gml_extent_wkt": c.q_gml_extent_wkt,
        "simhash_dups": c.q_simhash_dups,
        "minhash_dups": c.q_minhash_dups,
        # r5: survivor selection through the FORCED distributed
        # connected-components path (min-label propagation) — same
        # oracle as jaccard_dedup_survivors, new code under it
        "dedup_survivors_distcc": c.q_dedup_survivors_distcc,
        # --- search-core-dependent surface, last driver-green r1/r2;
        # fills the window so the serving-path caches get re-checked ---
        "mm_topk": c.q_mm_topk,
        "pf_topk": c.q_pf_topk,
        "field_topk": c.q_field_topk,
        "qf_topk": c.q_qf_topk,
        "bool_topk": c.q_bool_topk,
        "func_topk": c.q_func_topk,
        "bq_topk": c.q_bq_topk,
        "boosted_topk": c.q_boosted_topk,
        "synonym_topk": c.q_synonym_topk,
        "facet_stats": c.q_facet_stats,
        "facets": c.q_facets,
        "facet_query_counts": c.q_facet_query,
        "range_topk": c.q_range_topk,
        "date_range_topk": c.q_date_range_topk,
        "range_facets": c.q_range_facets,
        "pivot_facets": c.q_pivot_facets,
        "sharded_topk": c.q_sharded_topk,
        "more_like_this": c.q_more_like_this,
        "terms_component": c.q_terms_component,
        "field_stats": c.q_field_stats,
        "stats_percentiles": c.q_stats_percentiles,
        "analysis_tokens": c.q_analysis_tokens,
        "significant_terms": c.q_significant_terms,
        "luke_fields": c.q_luke_fields,
        "result_clusters": c.q_result_clusters,
        "ltr_topk": c.q_ltr_topk,
        "stream_join": c.q_stream_join,
        "stream_unique": c.q_stream_unique,
        "stream_nodes": c.q_stream_nodes,
        "term_vectors": c.q_term_vectors,
        # --- cumulative driver-green in r4 (outside the r5 window) ---
        "fl_transformers": c.q_fl_transformers,
        "lm_quality": c.q_lm_quality,
        "date_range_facets": c.q_date_range_facets,
        "blockjoin_matches": c.q_blockjoin_matches,
        "rerank_topk": c.q_rerank_topk,
        "join_matches": c.q_join_matches,
        "geofilt_matches": c.q_geofilt_matches,
        "atomic_updates": c.q_atomic_updates,
        "pii_scrub": c.q_pii_scrub,
        "repetition_stats": c.q_repetition_stats,
        "decontaminated": c.q_decontaminated,
        "mixture_sample": c.q_mixture_sample,
        "jaccard_dedup_survivors": c.q_jaccard_dedup_survivors,
        "hybrid_topk": c.q_hybrid_topk,
        "ann_ivf_topk": c.q_ann_ivf_topk,
        "embedding_dups_ivf": c.q_embedding_dups_ivf,
        "multimodal_decode_meta": c.q_multimodal_decode_meta,
        "kmv_sample": c.q_kmv_sample,
        "heavy_hitters": c.q_heavy_hitters,
        "quantile_sketch": c.q_quantile_sketch,
        "hll_registers": c.q_hll_registers,
        "hll_distinct": c.q_hll_distinct,
        "sql_group_agg": c.q_sql_group_agg,
        "sql_select_where": c.q_sql_select_where,
        "ltr_trees_topk": c.q_ltr_trees_topk,
        "multimodal_frames": c.q_multimodal_frames,
        "suggest": c.q_suggest,
        "delete_by_query_remaining": c.q_delete_by_query_remaining,
        "doc_get": c.q_doc_get,
        "doc_sha256": c.q_doc_sha256,
        "text_quality": c.q_text_quality,
        "lang_counts": c.q_lang_counts,
        "exact_dedup": c.q_exact_dedup,
        "upsert_latest": c.q_upsert_latest,
        "ngram_jaccard_dups": c.q_ngram_jaccard_dups,
        "fingerprints": c.q_fingerprints,
        "ann_topk": c.q_ann_topk,
        "embedding_dups": c.q_embedding_dups,
        "multimodal_decode": c.q_multimodal_decode,
        "parent_flags": c.q_parent_flags,
        "unresolved_refs": c.q_unresolved_refs,
        "pricing_summary": c.q_pricing_summary,
        "top_customers": c.q_top_customers,
        "events_window": c.q_events_window,
        "events_props": c.q_events_props,
        "user_sessions": c.q_user_sessions,
        "session_windows": c.q_session_windows,
        "paragraph_dedup": c.q_paragraph_dedup,
        "packed_sequences": c.q_packed_sequences,
        "train_valid_split": c.q_train_valid_split,
        "shuffled_order": c.q_shuffled_order,
        "spatial_topk": c.q_spatial_topk,
        "collations": c.q_collations,
        "autocomplete": c.q_autocomplete,
    }


def oracle_sql() -> dict[str, str]:
    from solr_indexer_ray.contract_sql import oracle_sql_dict

    return oracle_sql_dict()
