"""Property-based tests: text expressions vs pure-Python models.

Hypothesis generates adversarial documents (empty strings, runs of
spaces, unicode, single tokens) and we assert the Spark column
expressions agree with an obviously-correct Python implementation.
One Spark job per property (all examples in one DataFrame) keeps the
suite fast.
"""

from __future__ import annotations

import hashlib
import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.functions.text import (  # noqa: E402
    doc_fingerprint,
    tokens,
    word_shingles,
)

# Text alphabet exercises spaces (token boundaries), punctuation, and
# non-ascii; DuckDB parity uses single-space split semantics, so the
# Python model below must match exactly.
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd", "Po"),
            whitelist_characters=" é光",
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=30,
)


def py_tokens(text: str) -> list[str]:
    # single-space split, empty strings preserved (DuckDB string_split)
    return text.split(" ")


def py_shingles(text: str, n: int = 3) -> list[str]:
    t = py_tokens(text)
    seen: list[str] = []
    for i in range(len(t) - n + 1):
        s = " ".join(t[i : i + n])
        if s not in seen:
            seen.append(s)
    return seen


def py_fingerprint(text: str) -> str:
    norm = "".join(c for c in text.lower() if c.isascii() and c.isalnum())
    return hashlib.md5(norm.encode()).hexdigest()


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(col).collect()]


@settings(max_examples=20, deadline=None)
@given(TEXTS)
def test_shingles_match_python_model(spark, texts):
    got = _run(spark, texts, word_shingles(tokens(F.col("text")), 3))
    assert got == [py_shingles(t) for t in texts]


@settings(max_examples=20, deadline=None)
@given(TEXTS)
def test_token_split_matches_python_model(spark, texts):
    got = _run(spark, texts, tokens(F.col("text")))
    assert got == [py_tokens(t) for t in texts]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="aB3 ,.-_é", max_size=40), min_size=1, max_size=20
    )
)
def test_fingerprint_matches_python_model(spark, texts):
    # regex [^a-z0-9] strips non-ascii too — model mirrors that
    got = _run(spark, texts, doc_fingerprint(F.col("text")))
    assert got == [py_fingerprint(t) for t in texts]


@settings(max_examples=20, deadline=None)
@given(TEXTS)
def test_token_run_counts_match_python_model(spark, texts):
    from collections import Counter

    from etl_mapwarper_spark.functions.text import token_run_counts

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        sorted((r["tok"], r["n"]) for r in row[0])
        for row in df.select(
            F.array_sort(tokens(F.col("text"))).alias("s")
        )
        .select(token_run_counts(F.col("s")))
        .collect()
    ]
    assert got == [sorted(Counter(py_tokens(t)).items()) for t in texts]


def test_ngram_jaccard_df_cap_is_subset_of_exact(spark):
    """The stop-shingle cap only DROPS hot keys before pair generation;
    every surviving pair must also exist in the exact result with a
    Jaccard no higher than the exact one (dropping shared shingles can
    only lower the intersection count)."""
    import os

    from pyspark.sql import functions as F

    from etl_mapwarper_spark.operators.dedup import dd_ngram_jaccard

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    exact = {
        (r.d1, r.d2): r.jacc for r in dd_ngram_jaccard(spark, sf).collect()
    }
    capped = dd_ngram_jaccard(spark, sf, df_cap=50).collect()
    for r in capped:
        assert (r.d1, r.d2) in exact
        assert r.jacc <= exact[(r.d1, r.d2)] + 1e-9


def test_bpe_merge_fold_semantics(spark):
    """The BPE merge fold must be left-to-right greedy and
    non-overlapping: merging (a, a) over 'a a a a a' gives
    [aa, aa, a], never [aa, aa, aa-overlap] — and a merged symbol
    never re-matches its parts within the same round."""
    import pyspark.sql.functions as F

    from etl_mapwarper_spark.operators.textops import _bpe_apply_merge

    cur = spark.createDataFrame(
        [(1, ["a", "a", "a", "a", "a"]), (1, ["b", "a", "a", "b"])],
        "cnt int, syms array<string>",
    )
    out = {
        tuple(r["syms"])
        for r in _bpe_apply_merge(cur, "a", "a").collect()
    }
    assert out == {("aa", "aa", "a"), ("b", "aa", "b")}


def test_bpe_train_merges_empty_corpus(spark, tmp_path):
    """An empty corpus yields an empty merge table with the stable
    schema, not an IndexError from the per-round winner collect."""
    import pyspark.sql.types as T

    from etl_mapwarper_spark.operators.textops import tx_bpe_train_merges
    from etl_mapwarper_spark.sources.tables import SCHEMAS

    spark.createDataFrame([], SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = tx_bpe_train_merges(spark, str(tmp_path))
    assert out.columns == ["merge_round", "p1", "p2", "merged", "pair_count"]
    assert out.count() == 0


def test_word_shingles_all_positional_contract(spark):
    """word_shingles_all keeps every positional n-gram (len =
    tokens-n+1), word_shingles is exactly its distinct set — the
    CDC-vs-Jaccard semantic split."""
    import pyspark.sql.functions as F

    from etl_mapwarper_spark.functions.text import (
        word_shingles,
        word_shingles_all,
    )

    df = spark.createDataFrame(
        [(["a", "b", "a", "b", "a"],), (["x"],), ([],)],
        "toks array<string>",
    )
    out = df.select(
        word_shingles_all(F.col("toks"), 2).alias("all_sh"),
        word_shingles(F.col("toks"), 2).alias("dist_sh"),
    ).collect()
    assert out[0]["all_sh"] == ["a b", "b a", "a b", "b a"]
    assert out[0]["dist_sh"] == ["a b", "b a"]
    assert out[1]["all_sh"] == [] and out[2]["all_sh"] == []


def test_substring_span_winnowing_guarantee(spark):
    """Winnowing's theorem (Schleimer et al. 2003): a shared substring
    of >= k + t - 1 chars guarantees a shared fingerprint AT ANY
    ALIGNMENT. The original strided-grid version of this operator
    failed exactly this test for offsets not divisible by the stride —
    keep the misaligned cases as the regression guard. Each pair gets
    its own disjoint character alphabet so pairs don't cross-match."""
    import tempfile

    from etl_mapwarper_spark.operators.dedup import (
        _SSPAN_K,
        _SSPAN_MIN_SHARED,
        _SSPAN_T,
        dd_substring_span_pairs,
    )

    need = _SSPAN_K + _SSPAN_T - 1
    # Extra length so >= _SSPAN_MIN_SHARED distinct fingerprints arise.
    run_len = need + 3 * _SSPAN_T
    rows = []
    offsets = list(range(0, _SSPAN_T + 1, 3))  # incl. worst misalignments
    for j, off in enumerate(offsets):
        # per-pair alphabet slice -> no shared grams across pairs
        a0 = chr(ord("a") + (2 * j) % 24)
        a1 = chr(ord("a") + (2 * j + 1) % 24)
        shared = "".join(a0 if (i * 7) % 5 < 3 else a1 for i in range(run_len))
        rows.append((1000 + off, "x" * 5 + shared + "x" * 9))
        rows.append((2000 + off, "y" * (5 + off) + shared + "z" * 4))
    docs = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tempfile.mkdtemp(prefix="sspan_prop_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        (r["d1"], r["d2"]): r["n_shared_fps"]
        for r in dd_substring_span_pairs(spark, d).collect()
    }
    for off in offsets:
        pair = (1000 + off, 2000 + off)
        assert pair in got, f"offset {off}: shared run must be detected"
        assert got[pair] >= _SSPAN_MIN_SHARED


def test_kneser_ney_probabilities_are_valid(spark):
    """Every resolved KN probability must lie in (0, 1]: the discount
    can never drive mass negative (max(c-D,0) + positive continuation
    term) and no single bigram may exceed certainty. Checked on the
    log scale over every bigram type in the corpus."""
    import pyspark.sql.functions as F

    from etl_mapwarper_spark.operators.textops import (
        tx_kneser_ney_logprob,
    )
    from tests.conftest import SF_DIR

    scored = tx_kneser_ney_logprob(spark, SF_DIR)
    # per-doc averages of per-type log-probs: avg of values in
    # (-inf, 0] must stay <= 0; equality only if every bigram were
    # certain, impossible with >1 bigram type.
    bad = scored.filter(
        (F.col("avg_kn_logprob") > 0) | F.col("avg_kn_logprob").isNull()
    ).count()
    assert bad == 0


def test_bpe_python_trainer_matches_jvm_fold_reference(spark, tmp_path):
    """The applyInPandas trainer duplicates the merge semantics the
    JVM helpers define (_bpe_pair_counts / _bpe_winner /
    _bpe_apply_merge). Guard the duplication: on randomized corpora,
    the trainer's full merge table must equal a reference loop built
    ONLY from those JVM helpers (weighted pair counts, (count desc,
    pair asc) winner, greedy non-overlapping rewrite)."""
    import random

    import pyspark.sql.functions as F

    from etl_mapwarper_spark.operators.textops import (
        _BPE_ROUNDS,
        _bpe_apply_merge,
        _bpe_pair_counts,
        _bpe_winner,
        tx_bpe_train_merges,
    )
    from etl_mapwarper_spark.functions.text import tokens

    for seed in (3, 41):
        rng = random.Random(seed)
        vocab = ["ab", "aab", "ba", "bb", "a", "abab"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
            for _ in range(25)
        ]
        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        sf_dir = str(tmp_path / f"bpe_{seed}")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

        got = [
            (r.merge_round, r.p1, r.p2, r.merged, r.pair_count)
            for r in tx_bpe_train_merges(spark, sf_dir)
            .orderBy("merge_round")
            .collect()
        ]

        # reference: per-round JVM pair counts + winner + fold
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cur = (
            docs.select(F.explode(tokens(F.col("text"))).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "cnt", F.expr("regexp_extract_all(w, '.', 0)").alias("syms")
            )
        )
        want = []
        for r in range(_BPE_ROUNDS):
            w = _bpe_winner(_bpe_pair_counts(cur), r + 1).collect()
            if not w:
                break
            row = w[0]
            want.append(
                (
                    r + 1,
                    row.p1,
                    row.p2,
                    row.p1 + row.p2,
                    row.pair_count,
                )
            )
            cur = _bpe_apply_merge(cur, row.p1, row.p2)
        assert got == want, f"seed {seed}: trainer diverged from JVM fold"


def test_capped_containment_is_conservative(spark):
    """dd_containment_capped must be a strict filter of the exact
    entry: every surviving (src, dst) pair exists in the exact result
    with a containment no higher than the exact value (the cap drops
    shingles from the intersection count while n_src stays the full
    per-doc size, so C can only fall), and a synthetic boilerplate
    hub — identical docs whose every shingle exceeds the cap — must
    vanish entirely from the capped result while dominating the
    exact one."""
    import os

    from etl_mapwarper_spark.operators.dedup import (
        dd_containment,
        dd_containment_capped,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    exact = {
        (r.src, r.dst): r.containment
        for r in dd_containment(spark, sf).collect()
    }
    capped = dd_containment_capped(spark, sf).collect()
    for r in capped:
        assert (r.src, r.dst) in exact
        assert r.containment <= exact[(r.src, r.dst)] + 1e-9


def test_capped_containment_drops_hub(spark, tmp_path):
    from etl_mapwarper_spark.operators.dedup import (
        _CT_DF_CAP,
        dd_containment,
        dd_containment_capped,
    )

    hub_n = _CT_DF_CAP + 5
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, text, "en", "src_hub", len(text)) for i in range(hub_n)]
    rows += [
        (hub_n + i, f"unique{i} words{i} only{i} here{i} now{i}", "en",
         "src_u", 30)
        for i in range(5)
    ]
    sf_dir = str(tmp_path / "hubdocs")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    exact_pairs = dd_containment(spark, sf_dir).count()
    # every ordered hub pair is a containment-1.0 row in the exact set
    assert exact_pairs >= hub_n * (hub_n - 1)
    assert dd_containment_capped(spark, sf_dir).count() == 0


@settings(max_examples=20, deadline=None)
@given(TEXTS, st.sampled_from([3, 5]))
def test_hashed_shingles_equivalent_to_string_shingles(spark, texts, n):
    """hashed_word_shingles (r10) must be a faithful stand-in for
    xxhash64-of-word_shingles as a grouping/join key: same per-doc
    COUNT (it is the containment denominator) and the same
    equality-classes across documents (two docs share a hashed
    shingle iff they share the string shingle). Tokens are space-free
    so n-tuple ↔ string is bijective; this pins that the hash-direct
    construction preserves it on arbitrary generated corpora,
    including empty tokens from repeated spaces. n ranges over the
    widths in production use: 3 (dd_* Jaccard/containment families)
    and 5 (_DECON_N — the r11 decontamination sites)."""
    from etl_mapwarper_spark.functions.text import hashed_word_shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    s = df.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), n)).alias("sh"),
    ).collect()
    h = df.select(
        "doc_id",
        F.explode(hashed_word_shingles(tokens(F.col("text")), n)).alias(
            "h"
        ),
    ).collect()
    by_doc_s: dict = {}
    by_doc_h: dict = {}
    for r in s:
        by_doc_s.setdefault(r.doc_id, []).append(r.sh)
    for r in h:
        by_doc_h.setdefault(r.doc_id, []).append(r.h)
    assert set(by_doc_s) == set(by_doc_h)
    # equality classes: build the string->hash mapping across ALL
    # docs; it must be a bijection, and per-doc multisets must map
    # exactly (same counts, same co-occurrence structure)
    mapping: dict = {}
    inverse: dict = {}
    for d in by_doc_s:
        assert len(by_doc_s[d]) == len(by_doc_h[d]), d
        # shingle order is positional in both forms (array_distinct
        # keeps first-occurrence order), so zip aligns them
        for sh, hv in zip(by_doc_s[d], by_doc_h[d]):
            assert mapping.setdefault(sh, hv) == hv, (d, sh)
            assert inverse.setdefault(hv, sh) == sh, (d, hv)
