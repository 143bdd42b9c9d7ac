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
# Round-6 window: the FINAL rotation — after this, every one of the
# 260 registry entries has a driver-green row in some round and the
# evidence ledger closes. Composition: all 28 never-driver-checked
# entries (23 pre-r5 + the 5 late-r5 additions; the late-r5 media
# entries also had code/oracle changes THIS round: the JPEG codec
# grew general sampling factors + SOS/SOF cid matching, and the
# binmedia fixture gained a 4:2:0 family + content-hashed dir) + 1
# entry whose code changed this round (tx_tfidf_top_terms — the
# n_docs count branch moved off the parallelized scan; r5 driver
# evidence voided) + q89_approx_quantiles (code UNchanged — kept in
# the window as the re-measured sketch-constant survivor) + the r6
# skew-rehearsal fallout (dd_simhash_pairs_banded + dd_cc_banded NEW;
# dd_pagerank_centrality + dd_triangle_count now consume the banded
# generator — code+oracle changed, prior evidence voided) + 15
# canaries re-checking earlier driver greens so every family
# (q/mw/dd/sim/tx/ds/mm/st/src/dq/pipe) has >= 2 rows in the window
# (q35/q91/tx_kneser_ney canaries dropped to make room — q keeps 13
# window rows via the never-checked q6x-q9x block, tx keeps 3).
# Late-r6 bench rebuilds (code changed, prior evidence voided, must
# re-window): sim_embedding_covariance (einsum partials via
# mapInPandas replace the per-row 4096-element explode) displacing
# the sim_knn_graph canary (sim keeps 5 rows), and ds_global_row_ids
# (monotonic-id local ranks replace the rank window's second
# corpus shuffle) displacing the q22 canary (q keeps 13 rows via the
# never-checked q6x-q9x block + q89 + q01).
# Final r6 bench fix: sim_bruteforce_topk drops its forced small-input
# repartition (light per-row work; the shuffle bought nothing and the
# plan regressed to seconds under session pressure) — plan changed,
# so it and its transitive consumer sim_lsh_recall re-window,
# displacing the sim_ivfpq_topk and dd_minhash_lsh canaries (sim
# keeps 6 rows, dd keeps 7).
_PRIORITY = [
    # --- never-driver-checked (28): the ledger-closing set ---
    "dd_cdc_chunks",
    "dd_incremental_dedup",
    "dd_semantic_clusters",
    "ds_epoch_shuffle",
    "ds_pack_sequences",
    "ds_token_budget_planner",
    "mm_av_sync_check",
    "mm_jpeg_roundtrip",  # codec code changed r6 (sampling factors)
    "mw_gcp_transform_tps",
    "q64_small_qty_revenue",
    "q77_notin_null_semantics",
    "q78_map_type_aggs",
    "q79_try_functions",
    "q80_calendar_arith",
    "q83_explode_outer_semantics",
    "q85_chi2_independence",
    "q86_skyline",
    "q87_mad_robust_stats",
    "q88_argmax_aggregate",
    "q92_modern_sql",
    "sim_norm_report",
    "sim_pq_recall",
    "sim_radius_search",
    "src_binaryfile_media",  # fixture+oracle changed r6 (4:2:0 family)
    "src_compact_roundtrip",
    "src_webdataset_roundtrip",
    "tx_js_divergence",
    "tx_ndcg_eval",
    # --- bench-item rows (tfidf code changed r6; q89 re-measured) ---
    "tx_tfidf_top_terms",  # n_docs branch off the parallelized scan
    "q89_approx_quantiles",  # unchanged; sketch constant documented
    # --- r6 skew-rehearsal fallout: new + code/oracle-changed ---
    "dd_simhash_pairs_banded",  # NEW: rank-banded candidate generator
    "dd_cc_banded",  # NEW: production CC twin over banded pairs
    "dd_triangle_count",  # consumes banded pairs; oracle changed
    # --- late-r6 bench rebuilds (code changed; evidence re-windowed) ---
    "sim_embedding_covariance",
    "ds_global_row_ids",
    "sim_bruteforce_topk",  # repartition dropped; plan changed
    "sim_lsh_recall",  # consumes sim_bruteforce_topk's plan
    # --- canaries (13): every family to >= 2 window rows ---
    "q01_pricing_summary",
    "mw_map_objects",
    "dd_pagerank_centrality",  # consumes banded pairs; oracle changed
    "ds_llm_pipeline",
    "mm_audio_autocorr",
    "mm_phash_neardups",
    "st_dq_gate",
    "st_incremental_dedup",
    "src_dpp_join",
    "dq_observed_metrics",
    "dq_skew_report",
    "pipe_map_objects",
    "pipe_relations",
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
