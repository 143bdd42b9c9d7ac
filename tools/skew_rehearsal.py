"""Skew-stress scaling rehearsal (r5 verdict item 4): no sf1 testdata
exists, so generate a synthetic corpus with the SAME generator at two
scales (base ~ sf0.1's 5k docs, and 10x) and measure how the
shuffle-heavy families' wall-time scales. The corpus is deliberately
hostile in the two ways a real scraped corpus is:

- a HUB cluster of N/50 byte-identical documents ("the same page
  uploaded a thousand times") — at 10x that is a degree-999 node in
  the simhash similarity graph, i.e. a 1000-clique: the worst case
  for candidate-join fan-out, salted rank joins, and wedge
  generation;
- a boilerplate-heavy source (4% of docs share a fixed 40-token
  paragraph with a tiny unique suffix) — hot shingles that stress
  the df-cap path in dd_ngram_jaccard_capped and LSH bucket skew.

Vocabulary, language mix, source fan-out, and text lengths mirror
/root/testdata/sf0.1/documents.parquet so per-row costs are
comparable; lengths are drawn from the same 44-577 char band.

Usage:
  python tools/skew_rehearsal.py            # generate both scales + run
  python tools/skew_rehearsal.py gen        # generate only
Writes parquet under /tmp/spark_graft_rehearsal/{base,10x}/ and
prints one JSON line per (entry, scale) plus a scaling summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_N = 5_000
SCALES = {"base": BASE_N, "10x": 10 * BASE_N, "30x": 30 * BASE_N}
ROOT = "/tmp/spark_graft_rehearsal"
# Only the graph family runs the 30x point (r6 verdict item 3: two
# points can't distinguish log-linear from quadratic-with-small-
# constant; the hub clique at 30x is 3000 identical docs). The
# pair-listing and text families stay two-point: their 10x behavior
# is already classified (output-bound vs sublinear) and 30x would
# spend most of its wall-time materializing the Ω(output) pair lists.
THREE_POINT = {
    "dd_pagerank_centrality",
    "dd_triangle_count",
    "dd_cc_banded",
    "dd_semantic_clusters_banded",
    "sim_knn_graph_banded",
    # late-r8 extension: the families first measured in r8 at 1x/10x
    # get their third point too (same rationale as r6 item 3 — two
    # points can't separate log-linear from quadratic-small-constant).
    # st_incremental_dedup stays two-point: 0.90x at 10x is
    # trigger-overhead-bound, a third point measures the trigger.
    "mm_phash_full_corpus",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "dd_containment_capped",
    # r9: the hub stream-stream join is trigger-overhead-bound at
    # 1x/10x (wall ~10.7 s flat, 10 micro-batches); the 30x point is
    # where the hub key's quadratic output (~9x the 10x point) could
    # outgrow the trigger floor if the per-key join were mis-planned.
    "st_ss_join_hub",
    # r9: the two entries whose corpus-fp windows were rewritten to
    # structural bounds — the 30x hub (3000-copy fingerprint group)
    # is exactly the input whose window form would have ceilinged on
    # one task, so the fixed plans carry the third point.
    "ds_quality_ablation",
    "dd_soft_dedup_weights",
    # r9 closing: third points for the rest of the item-5 batch set
    # (two points can't separate log-linear from quadratic-small-
    # constant; same rationale as every promotion above).
    "tx_js_divergence",
    "ds_dsir_importance",
    "tx_ndcg_eval",
    # r10 (verdict item 3): the df-window idiom's measured points.
    # NOTE the verdict named "dd_shingle_df_profile's df window", but
    # that entry has NO window — it is groupBy(h) + groupBy(df) (the
    # corpus-sized distinct was removed as a no-op in r10), all
    # map-side combinable. The corpus-scan df WINDOW
    # (count() OVER (PARTITION BY h), classified data-contract in
    # BASELINE.md) lives in dd_ngram_jaccard_capped and
    # dd_containment_capped; all three get the third point so the
    # classification rests on hostile-hub measurements, not the
    # local A/B alone.
    "dd_shingle_df_profile",
    "dd_ngram_jaccard_capped",
}
ENTRIES = [
    "dd_ngram_jaccard_capped",
    "dd_pagerank_centrality",
    "dd_triangle_count",
    "dd_cc_banded",
    "ds_llm_pipeline",
    # --- r6 extension: the remaining documents-only shuffle families.
    # dd_minhash_lsh / dd_simhash are PAIR-LISTING ops: on the hub
    # corpus the true answer itself is quadratic in hub size (a
    # 1000-doc identical cluster HAS ~500k near-dup pairs × bands), so
    # their wall-time is Ω(output) by contract — the number to read is
    # whether they stay output-bound (pairs/sec roughly flat across
    # scales), not whether wall-time stays sublinear. The production
    # dedup path for a hubbed corpus is banded pairs → CC → survivors
    # (dd_cc_banded above), which IS sublinear.
    "dd_minhash_lsh",
    "dd_simhash",
    "tx_tfidf_top_terms",
    "tx_bigram_logprob",
    "tx_heavy_hitters_cms",
    "tx_bpe_train_merges",
    "ds_global_row_ids",
    # --- r6 extension: embeddings-side hub (one image/page embedded
    # identically n/50 times → one SRP bucket, the exposure noted in
    # dd_semantic_clusters' docstring). sim_srp_lsh_topk is
    # probe-bounded; sim_knn_graph and dd_semantic_clusters join
    # within buckets, so the hub measures their hot-bucket behavior.
    # r7 measured sim_knn_graph QUADRATIC (0.54 → 97.5 s for 10×
    # rows: Σ bucket² = n²/2^bits at fixed bucket count) — the exact
    # twins stay 2-point for the record; the banded twins below are
    # the production path and carry the 3-point certification.
    "sim_srp_lsh_topk",
    "sim_knn_graph",
    "dd_semantic_clusters",
    # --- r7 fallout: rank-banded SRP candidate generation ---
    "sim_knn_graph_banded",
    "dd_semantic_clusters_banded",
    # --- r7 addition: the block self-join is pair-listing on the hub
    # (all C(hub,2) pairs ARE the answer at lev=0 — output-bound like
    # dd_minhash_lsh; production ER exact-dedups before fuzzy match).
    "dd_levenshtein_blocked",
    # --- r8 extension: the never-measured families (r7 verdict item
    # 2). mm_phash_full_corpus is an EXTRA callable (the registered
    # entry caps at 200 images): perceptual-hash the WHOLE corpus —
    # the synthetic gradient pattern collapses ~96% of images into
    # ONE ahash, an identical-image hub far more hostile than the
    # n/50 doc hub (the LAION same-image-uploaded-n-times case). The
    # r8 grouped plan runs its fuzzy join on DISTINCT hashes, so the
    # measurement is whether per-media work stays linear while the
    # would-be pair volume (Σ 4·C(cluster,2), logged per scale)
    # explodes quadratically.
    "mm_phash_full_corpus",
    # the hub fingerprint group arrives inside ONE micro-batch (fp-
    # hashed staging co-delivers copies); within-batch survivor agg +
    # anti-join against the landed store must stay linear
    "st_incremental_dedup",
    # probe under a hub coarse cell: all n/50 identical vectors argmax
    # into the SAME cell (probes 0-2 ARE hub members), so the probed-
    # cell ADC/cosine scan concentrates exactly like a hot bucket
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    # --- r8 late addition: the last uncapped shingle self-join in the
    # registry and its new df-capped production twin. The exact entry
    # is pair-listing on the hub AND carries the Σ df² candidate
    # quadratic on the boilerplate shingles; the capped twin drops
    # both structurally (hub shingles all exceed the cap — exact
    # dedup owns identical content in the production pipeline).
    "dd_containment",
    "dd_containment_capped",
    # --- r10 (verdict item 3): the df-profile report and the df-window
    # flagbearer — see the THREE_POINT note on where the window
    # actually lives.
    "dd_shingle_df_profile",
    # --- r9 extension (r8 verdict item 5): the never-measured
    # high-exchange entries. Three rounds, three real quadratics —
    # the unmeasured high-exchange plans are where a fourth would
    # live. All four are documents-only, so the hostile corpus
    # stresses them directly: the hub fp group funnels one
    # Window.partitionBy("fp") task (ds_quality_ablation), the
    # boilerplate source concentrates term mass (tx_js_divergence's
    # source×vocab domain, ds_dsir_importance's raw-count table),
    # and the %50 bench slice includes hub docs so the contamination
    # join runs hot.
    "ds_quality_ablation",
    # r9 window-audit fallout: the corpus fp count rides a groupBy +
    # AQE-skew-splittable join instead of a count-over-window (the
    # hub fingerprint group would otherwise fill one WindowExec task)
    "dd_soft_dedup_weights",
    "tx_js_divergence",
    "ds_dsir_importance",
    "tx_ndcg_eval",
    # r11: the hash-direct-shingle decontamination pair. The hostile
    # corpus stresses their broadcast 5-gram join from the HOT side
    # (hub + boilerplate shingles repeat corpus-wide, so the bench-key
    # join fan-out concentrates on few hashes) — the number to read
    # is wall-time staying near-linear in rows.
    "ds_decontaminate",
    "ds_contamination_report",
    # r12: the try_cast source-id pair. The hub + boilerplate sources
    # are digit-less (src_hub/src_boiler — the r11 adversarial-sweep
    # killers) while the rest are numbered, so the rehearsal exercises
    # the malformed path inline with the normal one: digit-less
    # weights go NULL→0 inside the scan stage and those docs drop out
    # of the mixture; wall-time should stay scan-bound and linear.
    "ds_mixture_weights",
    "ds_corpus_curation",
    # the stream-stream interval join under a hub key arriving ACROSS
    # micro-batches (rehearsal-only callable, see main()): one user
    # owns n/50 events, clicks and purchases interleaved over the
    # whole timeline, replayed file-by-file (maxFilesPerTrigger=1) so
    # the hub key's join state accumulates and evicts across batches.
    # The TRUE output is rate²·interval for the hub key (every click
    # × every purchase within the hour), so the number to read is
    # pairs/sec staying roughly flat (output-bound), plus wall-time
    # never exceeding output growth.
    "st_ss_join_hub",
]
SEED = 20260815

LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _vocab() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS t"
        " FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY t"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def generate(n: int, out_dir: str) -> str:
    """Deterministic skewed corpus: hub clique (n/50 identical docs),
    boilerplate source (4%), rest random text from the sf0.1 vocab."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(SEED)
    vocab = np.array(_vocab())
    hub_n = n // 50
    boiler_n = n // 25
    hub_text = " ".join(rng.choice(vocab, size=60))
    boiler = " ".join(rng.choice(vocab, size=40))

    texts: list[str] = []
    sources: list[str] = []
    for i in range(n):
        if i < hub_n:
            texts.append(hub_text)
            sources.append("src_hub")
        elif i < hub_n + boiler_n:
            suffix = " ".join(rng.choice(vocab, size=3))
            texts.append(boiler + " " + suffix)
            sources.append("src_boiler")
        else:
            ln = rng.randint(8, 90)
            texts.append(" ".join(rng.choice(vocab, size=ln)))
            sources.append(f"src{rng.randint(0, 20)}")
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    tab = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tab, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def generate_embeddings(n_docs: int, out_dir: str) -> str:
    """Skewed embeddings mirroring sf0.1's docs:embeddings ratio
    (5000:2000) and shape (dim-64 float32, int32 label). Hub: n/50
    byte-identical unit vectors — one SRP bucket holding the whole
    hub, the worst case for bucket self-joins; rest are random unit
    vectors (near-orthogonal at dim 64, so buckets stay balanced)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = (2 * n_docs) // 5
    rng = np.random.RandomState(SEED + 1)
    dim = 64
    hub_n = n // 50
    hub = rng.randn(dim)
    hub /= np.linalg.norm(hub)
    rest = rng.randn(n - hub_n, dim)
    rest /= np.linalg.norm(rest, axis=1, keepdims=True)
    vecs = np.vstack([np.tile(hub, (hub_n, 1)), rest]).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.randint(0, 10, size=n).tolist(), pa.int32()
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tab, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def generate_events(n_docs: int, out_dir: str) -> str:
    """Skewed events mirroring sf0.1's docs:events ratio (5000:100k,
    i.e. 20×) and schema, with a HUB USER owning n/50 of all events —
    a bot account clicking and purchasing continuously. Written as a
    DIRECTORY of 10 time-sliced part files (file i = timeline slice
    i) so a maxFilesPerTrigger=1 replay delivers the hub key across
    10 micro-batches in event-time order, the realistic worst case
    for stream-stream join state: the hub's clicks must be HELD until
    the purchase-side watermark passes them, across batch boundaries,
    while matches for the hot key fan out quadratically (rate² ·
    interval — the true answer, not a plan defect)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_ev = 20 * n_docs
    rng = np.random.RandomState(SEED + 2)
    hub_n = n_ev // 50
    user = np.concatenate(
        [
            np.zeros(hub_n, dtype=np.int64),  # hub user_id 0
            rng.randint(1, n_docs // 3 + 2, size=n_ev - hub_n),
        ]
    )
    etypes = np.array(["click", "purchase", "view", "signup", "error"])
    etype = etypes[rng.randint(0, 5, size=n_ev)]
    # 30 days of microsecond timestamps, SORTED — file i is slice i
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.randint(0, span_us, size=n_ev).astype("int64"))
    # hub events interleave across the whole timeline: assign the hub
    # rows to evenly-strided positions of the sorted timeline
    order = np.empty(n_ev, dtype=np.int64)
    hub_pos = np.linspace(0, n_ev - 1, hub_n).astype(np.int64)
    rest_pos = np.setdiff1d(np.arange(n_ev), hub_pos)
    order[hub_pos] = np.arange(hub_n)
    order[rest_pos] = np.arange(hub_n, n_ev)
    user = user[order]
    value = np.round(rng.uniform(0.5, 500.0, size=n_ev), 4)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    d = os.path.join(out_dir, "events.parquet")
    os.makedirs(d, exist_ok=True)
    slices = np.array_split(np.arange(n_ev), 10)
    for i, idx in enumerate(slices):
        tab = pa.table(
            {
                "event_id": pa.array(idx, pa.int64()),
                "ts": pa.array(
                    (base + ts[idx]).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(user[idx], pa.int64()),
                "event_type": pa.array(etype[idx].tolist(), pa.string()),
                "value": pa.array(value[idx], pa.float64()),
                "props": pa.array(["{}"] * len(idx), pa.string()),
            }
        )
        pq.write_table(tab, os.path.join(d, f"part-{i:04d}.parquet"))
    return d


def _st_ss_join_hub(spark, sf_dir: str):
    """Rehearsal-only: stream_stream_interval_join replayed ONE FILE
    PER MICRO-BATCH over the hub events directory (the registered
    st_stream_stream_join entry replays availableNow in as few
    batches as the source allows; this forces the 10-batch shape the
    r8 verdict asked to measure)."""
    from pyspark.sql import functions as F

    from etl_mapwarper_spark.sources.tables import SCHEMAS
    from etl_mapwarper_spark.streaming import ops
    from etl_mapwarper_spark.streaming.runner import run_to_memory

    def read(etype):
        return (
            spark.readStream.schema(SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(sf_dir, "events.parquet"))
            .filter(F.col("event_type") == etype)
        )

    return run_to_memory(
        ops.stream_stream_interval_join(read("click"), read("purchase")),
        output_mode="append",
    ).select("l_event", "r_event", "r_value")


def main() -> None:
    for name, n in SCALES.items():
        d = os.path.join(ROOT, name)
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            generate(n, d)
            print(json.dumps({"generated": d, "n_docs": n}))
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            generate_embeddings(n, d)
            print(json.dumps({"generated_embeddings": d}))
        if not os.path.exists(os.path.join(d, "events.parquet")):
            generate_events(n, d)
            print(json.dumps({"generated_events": d}))
    if sys.argv[1:] == ["gen"]:
        return
    entries = ENTRIES
    if sys.argv[1:]:
        # rerun a subset: python tools/skew_rehearsal.py entry1 entry2
        unknown = set(sys.argv[1:]) - set(ENTRIES)
        if unknown:
            sys.exit(f"unknown entries: {sorted(unknown)}")
        entries = [e for e in ENTRIES if e in sys.argv[1:]]

    from etl_mapwarper_spark.functions.dist_rank import (
        release_ranked_cache,
    )
    from etl_mapwarper_spark.operators.multimodal import mm_phash_neardups
    from etl_mapwarper_spark.session import get_spark

    import __spark_entry__ as E

    qs = dict(E.queries())
    # non-registry rehearsal callables (see the ENTRIES comments)
    qs["mm_phash_full_corpus"] = lambda s, d: mm_phash_neardups(
        s, d, limit=1 << 60
    )
    qs["st_ss_join_hub"] = _st_ss_join_hub
    spark = get_spark("rehearsal", sf_dir=os.path.join(ROOT, "10x"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id) AS s").write.mode(
        "overwrite"
    ).format("noop").save()

    results: dict[str, dict[str, float]] = {}
    for entry in entries:
        results[entry] = {}
        scales = [
            s
            for s in SCALES
            if s != "30x" or entry in THREE_POINT
        ]
        for scale in scales:
            sf_dir = os.path.join(ROOT, scale)
            runs = []
            for _ in range(2):
                # time construction + action TOGETHER: the iterative
                # entries (CC fixpoints, pagerank) run jobs eagerly at
                # construction (localCheckpoint / bounded count), so
                # an action-only clock would miss their real work
                t0 = time.perf_counter()
                df = qs[entry](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            results[entry][scale] = round(min(runs), 3)
            # output cardinality (counted OUTSIDE the timed runs):
            # lets the summary distinguish output-bound growth
            # (pair-listing ops on the hub) from plan defects.
            n_out = df.count()
            results[entry][f"{scale}_rows"] = n_out
            # Entries that persist() internally (ds_global_row_ids)
            # would otherwise accumulate cached data across the
            # repeated constructions — drop it before the next run.
            # release_ranked_cache additionally empties the tracked
            # handle list in dist_rank (clearCache unpersists the
            # data but the references would keep accumulating).
            release_ranked_cache()
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "entry": entry,
                        "scale": scale,
                        "sec": min(runs),
                        "rows": n_out,
                    }
                )
            )
    summary = {}
    for e, r in results.items():
        row = {
            **r,
            "scaling_x": round(r["10x"] / max(r["base"], 1e-9), 2),
            "rows_x": round(
                r["10x_rows"] / max(r["base_rows"], 1), 2
            ),
        }
        if "30x" in r:
            # third scale point (r6 verdict item 3): 30x/10x for 3x
            # more rows — sub-quadratic growth shows as < ~9x here.
            row["scaling_30x_over_10x"] = round(
                r["30x"] / max(r["10x"], 1e-9), 2
            )
            row["rows_30x_over_10x"] = round(
                r["30x_rows"] / max(r["10x_rows"], 1), 2
            )
        summary[e] = row
    print(json.dumps({"rows_scale": 10, "summary": summary}))


if __name__ == "__main__":
    main()
