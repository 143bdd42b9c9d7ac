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


# Entries pulled to the FRONT of the merged registry. The external
# driver checks the FIRST 50 merged entries against their oracles.
#
# WINDOW COMPOSITION RULE (standing, per r4 verdict item 8): every
# window carries (a) entries whose code changed this round — a code
# change voids prior evidence; (b) never-driver-checked entries,
# weakest external evidence first; (c) canaries re-checking earlier
# driver greens so that, counting (a)+(b)+(c), EVERY family (q/mw/dd/
# sim/tx/ds/mm/st/src/dq/pipe) has >= 2 rows in the window.
#
# Round-5 window: 8 canaries (q01/q05 relational, mw_map_objects,
# dd_minhash_lsh, st_dq_gate, pipe_map_objects, pipe_relations — the
# pipe rows the rule requires — plus q22, code changed this round:
# packing guard) + 2 re-checks whose CODE changed this round
# (q35_price_percentiles — sorted-array percentiles; dd_ngram_jaccard
# — PPJoin prefix filter) + 40 never-checked entries: all 27 round-4
# additions (replica-certified at 2-3 scales but never
# driver-windowed; includes st_incremental_dedup + mm_audio_autocorr
# + q93 whose oracles/plans changed this round per ADVICE) + 13 of
# the remaining 36 (q90 — code changed —, the graph ops
# dd_pagerank/dd_triangle — skew-salted this round —, and
# family-completing picks: st_*, mm_*, src_*, sim_*, tx_*, ds_*,
# mw_tile_coords, q91).
#
# ROUND-6 ROTATION TODO — the 23 still-never-checked entries (keys
# absent from all CORRECTNESS_r0[1-5].json): dd_cdc_chunks,
# dd_incremental_dedup, dd_semantic_clusters, sim_pq_recall,
# sim_norm_report, sim_radius_search, tx_ndcg_eval, tx_js_divergence,
# ds_pack_sequences, ds_token_budget_planner, ds_epoch_shuffle,
# mm_av_sync_check, q64_small_qty_revenue, q77_notin_null_semantics,
# q78_map_type_aggs, q79_try_functions, q80_calendar_arith,
# q83_explode_outer_semantics, q85_chi2_independence, q86_skyline,
# q87_mad_robust_stats, q88_argmax_aggregate, q92_modern_sql, plus
# the late-r5 additions mm_jpeg_roundtrip, src_binaryfile_media,
# src_webdataset_roundtrip, src_compact_roundtrip,
# and q05_region_revenue (canary slot ceded this round). Fill the
# other slots with canaries per the composition rule (and anything
# r6 touches).
_PRIORITY = [
    # canaries: earlier driver greens re-checked across families
    "q01_pricing_summary",
    "q22_asof_last_order",  # code changed r5: packing guard
    "mw_map_objects",
    "dd_minhash_lsh",
    "st_dq_gate",
    "pipe_map_objects",
    "pipe_relations",
    # code changed r5 — prior driver evidence voided (q05's canary
    # slot ceded to tx_bigram_logprob; the q family keeps 8+ window
    # rows via q01/q22/q35/q89/q90/q91/q93)
    "q35_price_percentiles",  # sorted-array percentile rewrite
    "dd_ngram_jaccard",  # PPJoin prefix-filtered exact path
    "tx_bigram_logprob",  # two-pass tagged-explode LM rewrite
    # --- never-driver-checked: round-4 additions (27) ---
    # data-quality reports
    "dq_observed_metrics",
    "dq_freshness_report",
    "dq_skew_report",
    "dq_column_profile",
    # sources
    "src_xml_roundtrip",
    # multimodal audio
    "mm_audio_autocorr",  # oracle changed r5: full-window bound
    "mm_audio_zcr",
    # dedup additions
    "dd_ngram_jaccard_capped",
    "dd_bbit_minhash_lsh",
    "dd_soft_dedup_weights",
    "dd_bloom_incremental",
    "dd_substring_span_pairs",
    # similarity additions
    "sim_ivfpq_topk",
    "sim_ivfpq_recall",
    "sim_int8_quantize_report",
    # text/LM additions
    "tx_kneser_ney_logprob",
    "tx_bpe_fertility",
    "tx_logreg_train_steps",
    # dataset-pipeline additions
    "ds_split_manifest",
    "ds_global_row_ids",
    "ds_shard_manifest",
    "ds_source_cap",
    "ds_dsir_importance",
    "ds_contamination_report",
    # relational additions
    "q89_approx_quantiles",
    "q93_asof_nearest",  # code changed r5: packing guard
    # streaming addition
    "st_incremental_dedup",  # oracle changed r5: streamed-driven agg
    # --- never-driver-checked: earlier-round entries (17) ---
    "q90_asof_forward",  # code changed r5: packing guard
    "dd_pagerank_centrality",  # code changed r5: skew salting
    "dd_triangle_count",  # code changed r5: skew salting
    "mw_tile_coords",
    "st_cms_topk",
    "st_rest_incremental",
    "mm_phash_neardups",
    "src_pyds_write_roundtrip",
    "src_dpp_join",
    "sim_knn_graph",
    "tx_pii_redact",
    "ds_decontaminate",
    "q91_sql_interface",
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
