"""Empty-input robustness: a 100 TB pipeline's first production run
is usually against an empty or partially-landed dataset — operators
must degrade to empty (or empty-group) results, never throw.

A temp sf-dir is materialized with every catalog table present but
zero rows, and a representative operator from each family runs
against it. Operators whose offline training step genuinely cannot
produce an artifact from zero rows (IVF/PQ/k-means) are exempt here;
they raise on collect of an empty training set, which is the honest
contract for "train an index on nothing".
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_mapwarper_spark.sources.tables import SCHEMAS, TABLE_NAMES  # noqa: E402

# One representative per family; all should yield a (possibly empty)
# result without raising.
EMPTY_SAFE = [
    "q01_pricing_summary",
    "q05_region_revenue",
    "q22_asof_last_order",
    "q77_notin_null_semantics",
    "dd_exact_hash",
    "dd_ngram_jaccard",
    "dd_chunk_dedup",
    "dd_cdc_chunks",
    "ds_hash_sample",
    "ds_pack_sequences",
    "ds_epoch_shuffle",
    "tx_token_stats",
    "tx_heavy_hitters_cms",
    "tx_bm25_topk",
    "sim_bruteforce_topk",
    "sim_knn_graph",
    "mm_image_stats",
    "ds_llm_pipeline",
    "q78_map_type_aggs",
    "tx_zipf_fit",
    # late round-3: file layouts must survive a zero-row landing
    "src_partitioned_pruning",
    "src_dpp_join",
    "src_bucketed_join",
    "dd_source_overlap_matrix",
    "sim_embedding_covariance",
    "tx_hashed_linear_score",
    "tx_pii_redact",
    "tx_bpe_train_merges",
    "ds_temperature_mixture",
    "q91_sql_interface",
    "q92_modern_sql",
    # round-4: selection/dedup/quantization additions; the streaming
    # dedup must land nothing and report nothing on an empty corpus.
    # (tx_logreg_train_steps is exempt like IVF/PQ/k-means — training
    # on zero rows has no gradient and raises, the honest contract.)
    "ds_dsir_importance",
    "dd_substring_span_pairs",
    "ds_contamination_report",
    "tx_bpe_fertility",
    "sim_int8_quantize_report",
    "st_incremental_dedup",
    # round-4 late: the Bloom route must degrade to an empty filter
    # (every probe misses, nothing confirmed) and the sketch-quantile
    # contract must emit zero groups, both without raising.
    "dd_bloom_incremental",
    "q89_approx_quantiles",
    # the bucketed row-id assigner must survive an empty cut list and
    # the shard planner an empty corpus
    "ds_global_row_ids",
    "ds_shard_manifest",
    "dq_skew_report",
    "ds_source_cap",
    "dq_observed_metrics",
    "tx_kneser_ney_logprob",
    "ds_split_manifest",
    "dd_soft_dedup_weights",
    "dd_bbit_minhash_lsh",
    "dd_ngram_jaccard_capped",
    "mm_audio_autocorr",
    "src_xml_roundtrip",
    "dq_freshness_report",
    # IVF-PQ trains on collected artifacts: like IVF/PQ/k-means it
    # raises on an empty training set (the honest contract) — NOT
    # listed here; see the exemption note above.
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for name in TABLE_NAMES:
        spark.createDataFrame([], SCHEMAS[name]).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
    return d


# Global (non-grouped) aggregates legitimately emit their zero-count
# rows on empty input — one row per UNION branch for q77, one
# null-statistics row for the global Zipf fit.
_EXPECTED_ROWS = {
    "q77_notin_null_semantics": 2,
    "tx_zipf_fit": 1,
    # global observe metrics legitimately emit their one zero-count row
    "dq_observed_metrics": 1,
}


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_operator_survives_empty_input(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    assert len(rows) == _EXPECTED_ROWS.get(name, 0)
    assert len(df.schema.fields) > 0
