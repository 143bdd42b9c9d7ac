"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2), merged from
the per-module registries in ``etl_mapwarper_spark.operators``.
``oracle_sql()`` — DuckDB-equivalent SQL for each query where the
semantics are SQL-expressible; ops without an entry get the driver's
rows-only check (custom stateful streaming, fixture-backed mapwarper
transforms).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    # Ordering matters: the driver's correctness harness checks the FIRST
    # 50 entries of the merged dict. Round 1 verified q01-q51 (relational*)
    # green; round 2 front-loads the families that have no driver rows yet
    # (mapwarper, enrichment, dedup, similarity, textops, ingestion,
    # sampling, pandas, multimodal). Rotate again next round for st_/q52+.
    modules = []
    for name in (
        "mapwarper_queries",
        "enrichment",
        "dedup",
        "similarity",
        "textops",
        "sampling",
        "ingestion",
        "pipeline_queries",
        "pandas_ops",
        "multimodal",
        "changedata",
        "analytics",
        "quality",
        "relational_subq",
        "relational",
        "relational_ext",
        "relational_stats",
    ):
        try:
            mod = __import__(
                f"etl_mapwarper_spark.operators.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    try:
        from etl_mapwarper_spark.streaming import queries as streaming_queries

        modules.append(streaming_queries)
    except ImportError:
        pass
    return modules


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the end-to-end LLM
    preprocessing pipeline (quality → dedup → decontaminate → split →
    pack → account) as one declarative plan."""
    from etl_mapwarper_spark.operators.sampling import ds_llm_pipeline

    return ds_llm_pipeline(spark, "/root/testdata/sf0.001")


# Entries pulled to the FRONT of the merged registry. Round-3 window:
# the 51 entries that have never had a driver row in rounds 1-2 — all
# streaming (st_*), all multimodal (mm_*), file-source roundtrips,
# composed pipe_* stages, pandas-UDF surfaces, and q52-q76. The window
# is 50 wide, so the 51st (q64, a trivial filter-agg re-verified by the
# local sf0.01 replica) rotates into round 4 alongside canary re-checks
# of earlier greens.
#
# ROUND-4 ROTATION TODO: 76 registry entries still have no driver row
# in CORRECTNESS_r01/r02 and are not in the round-3 window (recompute
# at rotation time: keys absent from all CORRECTNESS_r*.json and from
# the prior window). Ready-made round-4 window, weakest-evidence
# classes first — replace _PRIORITY with the first 50 of:
#   st_cms_topk, st_rest_incremental,
#   mm_phash_neardups, mm_audio_vad, mm_shot_detect, mm_image_entropy,
#   src_pyds_write_roundtrip, src_ndjson_malformed, src_union_by_name,
#   src_bucketed_join, src_partitioned_pruning, src_dpp_join,
#   ds_llm_pipeline, ds_rag_index_stats, ds_dataset_card,
#   ds_quality_ablation, ds_decontaminate, ds_epoch_shuffle,
#   ds_pack_sequences, ds_priority_sample, ds_dedup_aware_split,
#   ds_length_histogram, ds_pack_efficiency, ds_anneal_schedule,
#   ds_temperature_mixture,
#   dq_expectations, dq_key_integrity,
#   dd_dedup_apply, dd_containment, dd_chunk_dedup, dd_cdc_chunks,
#   dd_pagerank_centrality, dd_triangle_count, dd_lsh_tuning_report,
#   dd_incremental_dedup, dd_semantic_clusters, dd_shingle_df_profile,
#   dd_source_overlap_matrix,
#   sim_pq_topk, sim_pq_recall, sim_l2_bruteforce_topk, sim_mips_topk,
#   sim_knn_graph, sim_lsh_recall, sim_norm_report, sim_bucket_balance,
#   sim_embedding_covariance,
#   tx_bpe_train_merges, tx_hashed_linear_score, tx_pii_redact
# — and rotate the spillover (tx_unigram/bigram/ndcg/zipf/js/entropy/
# pmi/heavy_hitters/udtf_analyze, q64, q77-q92, mw_tile_coords) plus
# canary re-checks of earlier greens into round 5.
# They exceed the 50-slot window together with canaries, so
# prioritize: (1) streaming/multimodal/source entries (weakest local
# evidence class), (2) the composed flagships (ds_llm_pipeline,
# ds_rag_index_stats, ds_dataset_card), (3) the remaining q77-q84 and
# report ops; rotate whatever spills plus canary re-checks of
# rounds-1/2 greens into round 5.
_PRIORITY = [
    # streaming (8)
    "st_tumbling_counts",
    "st_sliding_counts",
    "st_session_windows",
    "st_dedup_watermark",
    "st_user_totals",
    "st_stream_static_join",
    "st_stream_stream_join",
    "st_foreach_batch_merge",
    # multimodal (6)
    "mm_image_stats",
    "mm_resize_avgpool",
    "mm_frame_sample",
    "mm_png_roundtrip",
    "mm_audio_rms",
    "mm_arrow_hist",
    # file / REST sources (7)
    "src_rest_short_page",
    "src_rest_errors",
    "src_ndjson_roundtrip",
    "src_csv_roundtrip",
    "src_orc_roundtrip",
    "src_csv_malformed",
    "src_parquet_evolution",
    # composed pipeline stages (4)
    "pipe_map_objects",
    "pipe_layer_objects",
    "pipe_relations",
    "pipe_logs",
    # pandas-UDF surfaces (2)
    "pd_weighted_avg",
    "pd_zscore",
    # relational extras q52-q76 (23 here; q64 deferred to round 4)
    "q52_decimal_exact",
    "q53_click_purchase_funnel",
    "q54_cohort_retention",
    "q55_nullsafe_join",
    "q56_union_distinct",
    "q57_rollup_grouping_id",
    "q58_regexp_extract_words",
    "q59_quarter_hour_buckets",
    "q60_revenue_share",
    "q61_rolling_wau",
    "q62_waiting_suppliers",
    "q63_min_cost_supplier",
    "q65_big_orders",
    "q66_top_supplier",
    "q67_scd2_intervals",
    "q68_cdc_diff",
    "q69_mode_median",
    "q70_bool_bit_aggs",
    "q72_zorder_layout",
    "q73_lateral_topk",
    "q74_variant_props",
    "q75_recursive_chains",
    "q76_percentiles_twophase",
    "q64_small_qty_revenue",
]


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _registries():
        merged.update(getattr(mod, attr))
    head = {k: merged[k] for k in _PRIORITY if k in merged}
    head.update(merged)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merge("QUERIES")


def oracle_sql() -> dict[str, str]:
    return _merge("ORACLE")
