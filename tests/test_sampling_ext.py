"""Tests for the epoch-shuffle ordering and sequence-packing operators.

``ds_epoch_shuffle``'s contract is that the scale path — range-
partition on the shuffle position, then sort each partition LOCALLY —
reproduces the exact global order a single-reducer ``orderBy`` would
give, because range partitioning makes partition boundaries align
with the global order. That equivalence is the whole reason the
operator never needs a global sort at 100 TB, so it is pinned here.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.operators.sampling import (  # noqa: E402
    _EPOCH_SALT,
    _M32,
    _MIX31,
    _PACK_BUDGET,
    ds_pack_sequences,
    shuffle_pos,
)
from tests.conftest import SF_DIR  # noqa: E402


def py_pos(key: int, epoch: int) -> int:
    return (((key + (epoch + 1) * _EPOCH_SALT) % _M32) * _MIX31) % _M32


def test_shuffle_pos_matches_python_model(spark):
    df = spark.range(0, 500).select(F.col("id").alias("key"))
    got = {
        (r.key, r.epoch): r.pos
        for r in df.select(
            "key",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
        )
        .select(
            "key", "epoch", shuffle_pos(F.col("key"), F.col("epoch")).alias("pos")
        )
        .collect()
    }
    for (k, e), p in got.items():
        assert p == py_pos(k, e)
    # different epochs permute differently (the point of the salt)
    assert any(got[(k, 0)] != got[(k, 1)] for k in range(500))


def test_range_partition_local_sort_equals_global_order(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        shuffle_pos(F.col("id"), F.lit(0)).alias("pos"),
    )
    expected = [r.doc_id for r in docs.orderBy("pos", "doc_id").collect()]
    sharded = docs.repartitionByRange(8, "pos").sortWithinPartitions(
        "pos", "doc_id"
    )
    # toLocalIterator yields partitions in order, rows in partition order
    got = [r.doc_id for r in sharded.toLocalIterator()]
    assert got == expected


def test_pack_sequences_accounting(spark):
    packed = ds_pack_sequences(spark, SF_DIR).collect()
    from etl_mapwarper_spark.functions.text import token_count
    from etl_mapwarper_spark.operators.sampling import hash_bucket
    from etl_mapwarper_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select(
            hash_bucket(F.col("doc_id"), 8).alias("shard"),
            token_count(F.col("text")).alias("dl"),
        )
        .filter(F.col("dl") > 0)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total"))
        .collect()
    )
    per_shard = {r.shard: (r.n, r.total) for r in docs}
    for shard in per_shard:
        rows = [r for r in packed if r.shard == shard]
        n, total = per_shard[shard]
        # every doc starts in exactly one sequence; tokens conserved
        assert sum(r.n_docs for r in rows) == n
        assert sum(r.n_tokens_started for r in rows) == total
        # a sequence can't start more tokens than budget + one
        # straddling doc's tail; the max seq id is bounded by the
        # shard's total token count
        assert max(r.seq for r in rows) <= total // _PACK_BUDGET
        assert min(r.seq for r in rows) == 0


def test_pagerank_salted_matches_reference_on_hub_graph(spark):
    """The salted (src, _salt) join must be a pure physical rewrite:
    on a hub-skewed graph (one node of degree 200, exactly the
    template-dup-cluster shape salting exists for) the ranks must
    equal a plain-Python power iteration with the engine's own
    rounding schedule."""
    from etl_mapwarper_spark.operators.dedup import (
        _PR_DAMP,
        _PR_ROUNDS,
        pagerank_on_edges,
    )

    n_leaf = 200
    # star: hub 0 — leaves 1..200, plus a leaf ring so leaves have
    # degree 3 (graph stays symmetric, no dangling nodes)
    und = [(0, i) for i in range(1, n_leaf + 1)] + [
        (i, i % n_leaf + 1) for i in range(1, n_leaf + 1)
    ]
    sym = sorted(set(und) | {(b, a) for a, b in und})
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {
        r.doc_id: r.pr
        for r in pagerank_on_edges(spark, edges).collect()
    }

    n_nodes = n_leaf + 1
    deg = {0: n_leaf}
    for i in range(1, n_leaf + 1):
        deg[i] = 3
    ranks = {v: 1.0 / n_nodes for v in range(n_nodes)}
    adj_in = {v: [] for v in range(n_nodes)}
    for s, d in sym:
        adj_in[d].append(s)
    for _ in range(_PR_ROUNDS):
        ranks = {
            v: round(
                (1.0 - _PR_DAMP) / n_nodes
                + _PR_DAMP * sum(ranks[s] / deg[s] for s in adj_in[v]),
                10,
            )
            for v in range(n_nodes)
        }
    assert set(got) == set(range(n_nodes))
    for v in range(n_nodes):
        assert got[v] == pytest.approx(round(ranks[v], 6), abs=2e-6), v
    # the hub must out-rank every leaf (sanity that skew path executed)
    assert got[0] > max(got[v] for v in range(1, n_nodes))


def _write_docs(spark, tmp_path, name, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    sf_dir = str(tmp_path / name)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_banded_pairs_subset_and_band_semantics(spark, tmp_path):
    """simhash_banded_pairs is the production candidate generator for
    the graph consumers (r6 skew rehearsal: the uncapped bucket
    self-join went quadratic on a hub bucket). Pinned semantics:

    - banded output is EXACTLY the full pair set restricted to
      per-bucket rank distance <= band (so with band >= max bucket
      size the two generators are identical);
    - an identical-doc hub stays CONNECTED under a small band (each
      member pairs with its rank neighbors, Hamming 0);
    - degree is bounded by 8 * band (4 chunks x band forward/back).
    """
    from etl_mapwarper_spark.operators.dedup import (
        dd_simhash_pairs,
        simhash_banded_pairs,
    )

    hub_n = 12
    texts = ["same exact duplicated page body tokens"] * hub_n + [
        f"unique document number {i} with its own words alpha{i} beta{i}"
        for i in range(8)
    ]
    sf_dir = _write_docs(spark, tmp_path, "banded", texts)

    full = {
        (r.d1, r.d2): r.hamming
        for r in dd_simhash_pairs(spark, sf_dir).collect()
    }
    wide = {
        (r.d1, r.d2): r.hamming
        for r in simhash_banded_pairs(spark, sf_dir, band=1000).collect()
    }
    assert wide == full  # band >= bucket size → identical

    band = 2
    narrow = {
        (r.d1, r.d2): r.hamming
        for r in simhash_banded_pairs(spark, sf_dir, band=band).collect()
    }
    assert set(narrow) <= set(full)
    assert all(full[p] == h for p, h in narrow.items())

    # hub connectivity survives banding: union-find over narrow pairs
    parent = {i: i for i in range(hub_n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d1, d2 in narrow:
        if d1 < hub_n and d2 < hub_n:
            parent[find(d1)] = find(d2)
    assert len({find(i) for i in range(hub_n)}) == 1

    # degree bound: no node exceeds 8 * band neighbors
    deg = {}
    for d1, d2 in narrow:
        deg[d1] = deg.get(d1, 0) + 1
        deg[d2] = deg.get(d2, 0) + 1
    assert max(deg.values()) <= 8 * band

    # exact band semantics: narrow == full restricted to rank-band.
    # Recompute bucket ranks from the signatures Python-side.
    from etl_mapwarper_spark.operators.dedup import dd_simhash

    sigs = {
        r.doc_id: r.simhash for r in dd_simhash(spark, sf_dir).collect()
    }
    expect = set()
    for chunk in range(4):
        buckets = {}
        for did, s in sigs.items():
            buckets.setdefault(s[chunk * 16 : chunk * 16 + 16], []).append(did)
        for members in buckets.values():
            members.sort()
            for i, a in enumerate(members):
                for b in members[i + 1 : i + 1 + band]:
                    h = sum(
                        1
                        for x, y in zip(sigs[a], sigs[b])
                        if x != y
                    )
                    if h <= 3:
                        expect.add((a, b))
    assert set(narrow) == expect


def test_null_text_fp_join_matches_window_oracle(spark, tmp_path):
    """NULL-text rows must survive the fp-keyed groupBy+join rewrites
    (r9 advice item): a window PARTITION BY fp groups NULL fps into one
    partition, but an inner equi-join on fp drops them. Both rewritten
    entries coalesce fp to a "<null>" sentinel at creation; this pins
    value parity against the window-form DuckDB oracle on a corpus
    that actually contains NULL text."""
    import duckdb

    import __spark_entry__ as entrymod
    from etl_mapwarper_spark.operators.dedup import dd_soft_dedup_weights
    from etl_mapwarper_spark.operators.sampling import ds_quality_ablation
    from tests.oracle_utils import assert_frames_match

    rows = []
    # two sources; dup groups, uniques, and THREE null-text rows split
    # across sources (they must form ONE weight group, not vanish)
    for i in range(6):
        rows.append((i, "common boilerplate text alpha beta", "web"))
    for i in range(6, 10):
        rows.append((i, f"unique document number {i} gamma delta", "web"))
    for i in range(10, 13):
        rows.append((i, None, "books" if i % 2 else "web"))
    for i in range(13, 16):
        rows.append((i, "books dup page epsilon zeta eta theta", "books"))
    sf_dir = str(tmp_path / "nulldocs")
    spark.createDataFrame(
        [(d, t, "en", s, len(t) if t else None) for d, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle = entrymod.oracle_sql()

    sdf = dd_soft_dedup_weights(spark, sf_dir).toPandas()
    odf = con.execute(oracle["dd_soft_dedup_weights"]).df()
    assert_frames_match(sdf, odf, "dd_soft_dedup_weights/null-text")

    # ablation: at minimum every NULL-text row must survive into the
    # 'raw' ablation count (the join-drop failure mode)
    adf = ds_quality_ablation(spark, sf_dir).toPandas()
    raw = adf[adf["ablation"] == "raw"]["n_docs"].iloc[0]
    assert int(raw) == len(rows)
    aodf = con.execute(oracle["ds_quality_ablation"]).df()
    assert_frames_match(adf, aodf, "ds_quality_ablation/null-text")
    con.close()


def test_digitless_source_try_cast(spark, tmp_path):
    """A digit-less source name must NULL its mixture weight (row
    dropped), not abort the job (r11 adversarial sweep: the ANSI cast
    of regexp_extract('') killed both engines identically — semantic
    parity held, but one malformed source value aborting a 100 TB run
    is the wrong production trade; r12 fix = try_cast both sides).
    Pins value parity vs the DuckDB oracle on a corpus that mixes
    numbered and digit-less sources."""
    import duckdb

    import __spark_entry__ as entrymod
    from etl_mapwarper_spark.operators.sampling import (
        ds_corpus_curation,
        ds_mixture_weights,
    )
    from tests.oracle_utils import assert_frames_match

    # texts pass the C4 predicate (>=20 tokens, 2 stopwords, low
    # punct) so curation's quality stage keeps them; sources cycle
    # through numbered names AND digit-less ones (the killing input)
    def text(i):
        words = " ".join(f"token{i}word{j}" for j in range(20))
        return f"the quick corpus and document {words}"

    sources = ["web1", "books22", "cc", "web", "crawl3", ""]
    rows = [
        (i, text(i), "en", sources[i % len(sources)], 120 + i)
        for i in range(36)
    ]
    sf_dir = str(tmp_path / "digitless")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle = entrymod.oracle_sql()

    mdf = ds_mixture_weights(spark, sf_dir).toPandas()
    modf = con.execute(oracle["ds_mixture_weights"]).df()
    assert_frames_match(mdf, modf, "ds_mixture_weights/digitless")
    # digit-less sources get weight 0 → absent from the mixture
    assert not set(mdf["source"]) & {"cc", "web", ""}
    assert {"web1", "books22", "crawl3"} <= set(mdf["source"])

    cdf = ds_corpus_curation(spark, sf_dir).toPandas()
    codf = con.execute(oracle["ds_corpus_curation"]).df()
    assert_frames_match(cdf, codf, "ds_corpus_curation/digitless")
    assert not set(cdf["source"]) & {"cc", "web", ""}
    con.close()
