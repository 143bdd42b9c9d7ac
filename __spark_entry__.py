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
#
# Round-7 window (the ledger is closed, so the standing rule reduces
# to: code-changed + new + canaries, every family >= 2): (a) 2 entries
# whose code changed this round — dd_bloom_incremental (shared
# _bloom_route extraction) and dd_semantic_clusters (_semantic_cc
# extraction + the explode-direction edge builder, which also touched
# both banded twins already in the window); (b) 6 NEW never-checked
# entries — dd_bloom_
# incremental_fp (production Bloom route over a materialized
# fingerprint table), sim_knn_graph_banded + dd_semantic_clusters_
# banded (the r7 rehearsal fallout: rank-banded SRP candidate
# generation after the exact bucket self-join measured corpus-
# quadratic, 179x/35x for 10x rows), plus the late-r7 pair
# sim_srp_multiprobe_topk (Hamming-1 multi-probe, the recall gap the
# srp docstring promised to close) + sim_knn_banded_recall (the
# banding trade, measured) + sim_multiprobe_recall (recall@k of
# multi-probe vs brute force, beside sim_lsh_recall's single-probe
# number) — displacing the q03/q15/q16 canaries, q keeps 9 rows;
# (c) canaries picked
# STALEST-EVIDENCE-FIRST from the CORRECTNESS_r01-r06 ledger — the
# r1 q-block q06-q14 (the oldest evidence anywhere; q03/q15/q16
# displaced by the late trio above), the r2
# dd/ds/mw/tx/sim/src/pipe blocks, r3 st/mm, r4 dq. Family rows:
# q=9, dd=9, sim=7, ds=5, tx=5, mw=4, src=3, mm=2, st=2, dq=2,
# pipe=2 — every family >= 2. (q89's A/B edit this round was
# comment-only — function body and oracle byte-identical — so its r6
# evidence stands and it yields its slot to a stale canary.)
_PRIORITY = [
    # --- (a) code changed r7 ---
    "dd_bloom_incremental",
    "dd_semantic_clusters",
    # --- (b) new r7, never driver-checked ---
    "dd_bloom_incremental_fp",
    "sim_knn_graph_banded",
    "dd_semantic_clusters_banded",
    "sim_srp_multiprobe_topk",
    "sim_knn_banded_recall",
    "sim_multiprobe_recall",
    # --- (c) canaries, stalest evidence first ---
    # q: the r1 block (checked r1, never since)
    "q06_customer_order_stats",
    "q07_customers_without_orders",
    "q08_customers_with_urgent_orders",
    "q09_top3_orders_per_customer",
    "q10_running_customer_spend",
    "q11_order_gaps",
    "q12_rollup_lineitem",
    "q13_cube_orders",
    "q14_distinct_parts_per_flag",
    # dd: r2 block
    "dd_cc_bigstar",
    "dd_connected_components",
    "dd_embedding_neardup",
    "dd_exact_hash",
    "dd_fingerprint",
    # ds: r2 block
    "ds_corpus_curation",
    "ds_hash_sample",
    "ds_mixture_weights",
    "ds_stratified_sample",
    "ds_train_test_split",
    # mw: r2 block
    "mw_bbox_contains_join",
    "mw_gcp_errors",
    "mw_gcp_transform",
    "mw_geodesic_area",
    # tx: r2 block
    "tx_bm25_topk",
    "tx_bpe_tokens",
    "tx_c4_filter",
    "tx_chunk_windows",
    "tx_langid_confusion",
    # sim: r2 block
    "sim_ivf_topk",
    "sim_kmeans_2iter",
    "sim_label_centroids",
    # src: r2/r3
    "src_rest_datasource",
    "src_rest_scan",
    "src_csv_malformed",
    # st: r3
    "st_dedup_watermark",
    "st_foreach_batch_merge",
    # mm: r3
    "mm_arrow_hist",
    "mm_audio_rms",
    # pipe: r2/r3
    "pipe_rest_end_to_end",
    "pipe_layer_objects",
    # dq: r4
    "dq_expectations",
    "dq_key_integrity",
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
