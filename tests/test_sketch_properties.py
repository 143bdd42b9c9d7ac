"""Structural properties of the sketch/quantizer operators.

These pin the guarantees the algorithms are USED for — properties
that must hold for every input, beyond the oracle's value equality:
count-min never undercounts (its one-sided error bound), and PQ codes
are a deterministic function of the vector (partitioning-invariant,
bounded by the codebook size).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_cms_never_undercounts_any_term(spark):
    """Min-over-rows of additive counters can only overcount — for
    EVERY term, not just the reported top-k."""
    from etl_mapwarper_spark.functions.text import tokens
    from etl_mapwarper_spark.operators.textops import _CMS_D, _cms_bucket
    from etl_mapwarper_spark.sources.tables import load_table

    toks = load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens(F.col("text"))).alias("term")
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    sketch = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _cms_bucket(F.col("term"), i).alias("b"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("ib")
        )
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = exact.select(
        "term",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_bucket(F.col("term"), i).alias("b"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("ib"),
    ).select("term", "n", F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
    est = (
        probes.join(sketch, ["i", "b"])
        .groupBy("term", "n")
        .agg(F.min("c").alias("est"))
    )
    n_under = est.filter(F.col("est") < F.col("n")).count()
    assert n_under == 0, "count-min must never undercount"


def test_pq_codes_partition_invariant_and_bounded(spark):
    """Encoding is a pure function of the vector and the trained
    codebook literals — repartitioning must not change a single code,
    and every code is a position into a ≤K-entry codebook."""
    from etl_mapwarper_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        sim_pq_topk,
    )

    a = {
        (r.probe_id, r.vec_id): (r.adist, r.rank)
        for r in sim_pq_topk(spark, SF_DIR).collect()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = {
            (r.probe_id, r.vec_id): (r.adist, r.rank)
            for r in sim_pq_topk(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.unset("spark.sql.shuffle.partitions")
    assert a == b, "PQ search results must be partitioning-invariant"
    assert _PQ_M == 8 and _PQ_K == 16  # 8 one-byte codes by design


def test_bloom_filter_has_no_false_negatives(spark):
    """Every landed fingerprint, probed against the filter built from
    the landed set itself, must test maybe_dup=True — the one-sided
    guarantee dd_bloom_incremental's routing correctness rests on.
    (A false positive only costs a confirm-join probe; a false
    negative would admit a duplicate unconfirmed.)"""
    from etl_mapwarper_spark.functions.text import doc_fingerprint
    from etl_mapwarper_spark.operators.dedup import (
        _INCR_SPLIT,
        _bloom_positions,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    landed = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < _INCR_SPLIT)
        .select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    words = (
        landed.select(F.explode(_bloom_positions(F.col("fp"))).alias("pos"))
        .groupBy((F.col("pos") / 64).cast("long").alias("word_idx"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(pos % 64 AS int)))").alias(
                "word"
            )
        )
    )
    misses = (
        landed.select(
            "fp", F.explode(_bloom_positions(F.col("fp"))).alias("pos")
        )
        .withColumn("word_idx", (F.col("pos") / 64).cast("long"))
        .join(F.broadcast(words), "word_idx", "left")
        .select(
            F.coalesce(
                F.expr("(word & shiftleft(1L, cast(pos % 64 AS int))) != 0"),
                F.lit(False),
            ).alias("hit")
        )
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0


def test_ppjoin_prefix_filter_loses_no_pair(spark, tmp_path):
    """The PPJoin-style exact Jaccard path (prefix + length +
    positional pruning, dd_ngram_jaccard) must return EXACTLY the
    brute-force all-pairs result — the pruning bounds are only valid
    if no qualifying pair can slip past the prefix window. Randomized
    corpora drawn from a tiny vocabulary force heavy shingle overlap,
    duplicate documents, near-duplicates at the 0.8 threshold
    boundary, and short docs (< 3 tokens → empty shingle sets)."""
    import itertools
    import random

    from etl_mapwarper_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dd_ngram_jaccard,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for seed in (7, 23, 91):
        rng = random.Random(seed)
        texts = []
        for i in range(30):
            n = rng.choice([1, 2, 8, 12, 16])
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        # guaranteed exact and near duplicates
        texts += [texts[0], texts[1] + " beta", texts[2], texts[2]]
        rows = [
            (i, t, "en", "s", len(t)) for i, t in enumerate(texts)
        ]
        sf_dir = str(tmp_path / f"ppjoin_{seed}")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

        got = {
            (r.d1, r.d2): r.jacc
            for r in dd_ngram_jaccard(spark, sf_dir).collect()
        }

        def sh(t):
            toks = t.split(" ")
            return {
                " ".join(toks[i : i + 3])
                for i in range(max(len(toks) - 2, 0))
            }
        sets = {i: sh(t) for i, t in enumerate(texts)}
        want = {}
        for a, b in itertools.combinations(range(len(texts)), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            c = len(sa & sb)
            j = round(c / (len(sa) + len(sb) - c), 4)
            if j >= JACCARD_THRESHOLD:
                want[(a, b)] = j
        assert got == want, (
            f"seed {seed}: prefix filter diverged from brute force "
            f"(missing {set(want) - set(got)}, "
            f"extra {set(got) - set(want)})"
        )


def test_ppjoin_bounds_survive_megabyte_documents(spark, tmp_path):
    """Overflow guard: with ~130k shingles per document the positional
    bound's product (1+min(n1−p1, n2−p2))·(DEN+NUM) exceeds 2^31, so
    the prune arithmetic must run in 64-bit — an int32 plan silently
    wraps the bound negative and drops the pair from the 'exact'
    path. Two near-identical megabyte documents (J ≈ 0.97) must be
    found."""
    from etl_mapwarper_spark.operators.dedup import dd_ngram_jaccard

    n_tok = 130_000
    a = " ".join(str(i) for i in range(n_tok))
    b = " ".join(str(i) for i in range(n_tok - 4_000))
    rows = [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b))]
    sf_dir = str(tmp_path / "ppjoin_big")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = dd_ngram_jaccard(spark, sf_dir).collect()
    assert len(got) == 1 and (got[0].d1, got[0].d2) == (0, 1)
    sa, sb = n_tok - 2, n_tok - 4_000 - 2
    want = round(sb / sa, 4)  # B's shingles are a prefix-subset of A's
    assert got[0].jacc == want


def _write_embeddings(spark, tmp_path, name, vecs):
    import numpy as np

    rows = [
        (i, [float(x) for x in v], int(i % 3)) for i, v in enumerate(vecs)
    ]
    sf_dir = str(tmp_path / name)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    return sf_dir


def test_srp_banded_cand_subset_hub_and_fanout(spark, tmp_path):
    """The rank-banded SRP candidate generator (r7 rehearsal fallout:
    the exact bucket self-join is quadratic in corpus size at fixed
    bucket count; r8: union of SRP_PROJS projection orderings).
    Pinned semantics, mirroring the simhash banding:

    - band >= max bucket size => banded candidates are EXACTLY the
      exact within-bucket pair set (same cos values), for any
      projection set;
    - a narrow band yields a subset with unchanged cos values, a
      per-vector participation bounded by 2*band*P (the O(n*band*P)
      volume bound), and the multi-projection union is a SUPERSET of
      every single-projection band (the recall mechanism);
    - an identical-vector hub stays one cluster under
      dd_semantic_clusters_banded (ties on every ordering =>
      contiguous ranks, cos=1 chain).
    """
    import numpy as np

    from etl_mapwarper_spark.operators.dedup import (
        dd_semantic_clusters_banded,
    )
    from etl_mapwarper_spark.operators.similarity import (
        _bucket_expr,
        _srp_banded_cand,
        cosine_similarity,
        to_double_array,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    rng = np.random.RandomState(7)
    hub_n, rest_n, dim = 10, 30, 64
    hub = rng.randn(dim)
    hub /= np.linalg.norm(hub)
    rest = rng.randn(rest_n, dim)
    rest /= np.linalg.norm(rest, axis=1, keepdims=True)
    vecs = [hub] * hub_n + list(rest)
    sf_dir = _write_embeddings(spark, tmp_path, "srp_banded", vecs)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        to_double_array(F.col("embedding")).alias("v"),
        _bucket_expr("embedding").alias("bucket"),
    )
    a, b = emb.alias("a"), emb.alias("b")
    exact = {
        (r.v1, r.v2): r.cos
        for r in a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            F.round(
                cosine_similarity(F.col("a.v"), F.col("b.v")), 6
            ).alias("cos"),
        )
        .collect()
    }
    wide = {
        (min(r.v1, r.v2), max(r.v1, r.v2)): r.cos
        for r in _srp_banded_cand(spark, sf_dir, 1000, 6).collect()
    }
    assert wide == exact  # band >= bucket size -> identical

    band = 3
    rows = _srp_banded_cand(spark, sf_dir, band, 6).collect()
    narrow = {(min(r.v1, r.v2), max(r.v1, r.v2)): r.cos for r in rows}
    assert set(narrow) <= set(exact)
    assert all(exact[p] == c for p, c in narrow.items())
    # structural volume bound: each vector participates in <=
    # 2*band*P candidate pairs (band forward + band backward partners
    # per projection ordering, deduped across projections)
    from collections import Counter

    from etl_mapwarper_spark.operators.similarity import SRP_PROJS

    per_vec = Counter()
    for r in rows:
        per_vec[r.v1] += 1
        per_vec[r.v2] += 1
    assert max(per_vec.values()) <= 2 * band * len(SRP_PROJS)

    # the union is a superset of every single-projection band at the
    # same width — adding orderings can only ADD recall
    for p in SRP_PROJS:
        single = {
            (r.v1, r.v2): r.cos
            for r in _srp_banded_cand(
                spark, sf_dir, band, 6, projs=[p]
            ).collect()
        }
        assert set(single) <= set(narrow)
        assert all(narrow[k] == c for k, c in single.items())

    # hub connectivity: every hub member lands in cluster 0 (min id)
    labels = {
        r.vec_id: r.cluster
        for r in dd_semantic_clusters_banded(spark, sf_dir).collect()
    }
    assert all(labels[i] == 0 for i in range(hub_n))


def test_multiprobe_dominates_single_probe(spark):
    """Multi-probe SRP searches a SUPERSET of the single-probe
    candidate set (home bucket + each 1-bit flip), so per probe and
    rank its top-k cosine must dominate pointwise; and _flip_bit is an
    involution that changes exactly one position."""
    from etl_mapwarper_spark.operators.similarity import (
        _flip_bit,
        sim_srp_lsh_topk,
        sim_srp_multiprobe_topk,
    )

    b = F.lit("0110")
    for i in range(1, 5):
        once = spark.range(1).select(_flip_bit(b, i, 4).alias("f")).first().f
        twice = (
            spark.range(1)
            .select(_flip_bit(_flip_bit(b, i, 4), i, 4).alias("f"))
            .first()
            .f
        )
        assert twice == "0110"
        assert sum(a != c for a, c in zip(once, "0110")) == 1

    single = {
        (r.probe_id, r.rank): r.cos
        for r in sim_srp_lsh_topk(spark, SF_DIR).collect()
    }
    multi = {
        (r.probe_id, r.rank): r.cos
        for r in sim_srp_multiprobe_topk(spark, SF_DIR).collect()
    }
    assert set(single) <= set(multi)  # multi never returns fewer rows
    for key, cos in single.items():
        assert multi[key] >= cos, key


import pytest


@pytest.mark.parametrize("seed,band", [(11, 2), (23, 5)])
def test_srp_banded_matches_python_model(spark, tmp_path, seed, band):
    """Exact band semantics, recomputed independently: within each SRP
    bucket sort by (embedding[p], vec_id) for EACH projection p in
    SRP_PROJS; the banded candidate set must be EXACTLY the union over
    projections of normalized pairs at rank distance <= band, with cos
    values matching the full within-bucket pair set (the simhash
    banding test's python-model pin, applied to the embedding side)."""
    import numpy as np

    from etl_mapwarper_spark.operators.similarity import (
        SRP_DIMS,
        SRP_PROJS,
        _srp_banded_cand,
    )

    rng = np.random.RandomState(seed)
    n, dim = 36, 64
    vecs = rng.randn(n, dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # duplicate a block so ties exercise the vec_id tie-break
    vecs[5:9] = vecs[4]
    sf_dir = _write_embeddings(
        spark, tmp_path, f"srp_model_{seed}_{band}", list(vecs)
    )

    got = {
        (r.v1, r.v2): r.cos
        for r in _srp_banded_cand(spark, sf_dir, band, 6).collect()
    }

    # python model: float32 round-trip like the parquet column
    v32 = vecs.astype(np.float32).astype(np.float64)
    bucket = [
        "".join("1" if v32[i][d - 1] >= 0 else "0" for d in SRP_DIMS)
        for i in range(n)
    ]
    buckets: dict[str, list[int]] = {}
    for i in range(n):
        buckets.setdefault(bucket[i], []).append(i)
    expect = {}
    for members in buckets.values():
        for p in SRP_PROJS:
            ordered = sorted(members, key=lambda i: (v32[i][p - 1], i))
            for a_pos, i in enumerate(ordered):
                for j in ordered[a_pos + 1 : a_pos + 1 + band]:
                    cos = float(np.dot(v32[i], v32[j]) / (
                        np.linalg.norm(v32[i]) * np.linalg.norm(v32[j])
                    ))
                    expect[(min(i, j), max(i, j))] = round(cos, 6)
    assert set(got) == set(expect)
    for p, c in got.items():
        assert abs(c - expect[p]) <= 1e-6, (p, c, expect[p])


def test_banded_recall_knob_high_recall_point():
    """The recall knob's ≥0.97 operating point (r8 verdict item 4):
    sim_knn_banded_recall at (band=64, P=2) must reproduce the tuning
    report's 0.9743 recall@3 at sf0.1 — so a 100 TB consumer selects
    a recall point via parameters, never by editing SRP_BAND/SRP_PROJS
    (the measured curve lives in sim_band_tuning_report /
    BASELINE.md r8)."""
    from etl_mapwarper_spark.operators.similarity import (
        SRP_PROJS,
        sim_knn_banded_recall,
    )
    from etl_mapwarper_spark.session import get_spark

    spark = get_spark("tests")
    row = sim_knn_banded_recall(
        spark, "/root/testdata/sf0.1", band=64, projs=SRP_PROJS[:2]
    ).collect()[0]
    assert row.recall_at_k >= 0.97, row


def test_banded_recall_knob_very_high_recall_point():
    """The recall knob's ≥0.99 operating point (r9 verdict item 5,
    pinned r10): sim_knn_banded_recall at (band=64, P=4) must
    reproduce the tuning report's 0.9997 recall@3 at sf0.1 — the
    config the sim_knn_graph_banded docstring tells a 100 TB consumer
    to pass when ≥0.99 is required, at a measured candidate-volume
    price of 124.3k pairs vs 117.3k at the ≥0.97 point (P=2)."""
    from etl_mapwarper_spark.operators.similarity import (
        SRP_PROJS,
        sim_knn_banded_recall,
    )
    from etl_mapwarper_spark.session import get_spark

    spark = get_spark("tests")
    row = sim_knn_banded_recall(
        spark, "/root/testdata/sf0.1", band=64, projs=SRP_PROJS[:4]
    ).collect()[0]
    assert row.recall_at_k >= 0.99, row
