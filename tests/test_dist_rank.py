"""ranked_in_groups (functions/dist_rank.py) — the distributed
within-group rank assigner that replaced the group-sized window in the
banded SRP generator (r8). Pins:

- VALUE IDENTITY against the plain ``row_number()/count() OVER
  (PARTITION BY g ORDER BY k)`` definition, computed independently in
  python;
- BOUNDARY INVARIANCE: the split count changes only where the range
  boundaries fall, never the output (the property that makes callers
  oracle-checkable) — including n_splits larger than the row count
  (empty splits) and 1 (single split);
- the mid-layout/consistency hazards inherited from ds_global_row_ids
  are exercised by skewed group sizes (one group ≫ splits) so groups
  straddle many split boundaries.
"""

from __future__ import annotations

import pytest

from etl_mapwarper_spark.functions.dist_rank import ranked_in_groups


def _expected(rows):
    by_grp: dict = {}
    for g, k, payload in rows:
        by_grp.setdefault(g, []).append((k, payload))
    exp = {}
    for g, members in by_grp.items():
        members.sort()
        for i, (k, payload) in enumerate(members):
            exp[(g, k)] = (i + 1, len(members), payload)
    return exp


@pytest.mark.parametrize("n_splits", [1, 3, 32, 97])
def test_ranked_in_groups_matches_window_semantics(spark, n_splits):
    import random

    rng = random.Random(20260816 + n_splits)
    rows = []
    # skewed groups: one hub group with 400 rows (straddles every
    # split at n_splits<=97), several small groups, one singleton
    sizes = {"hub": 400, "a": 17, "b": 5, "c": 1, "d": 64}
    keys = rng.sample(range(10_000), sum(sizes.values()))
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((g, keys[i], keys[i] * 3 % 7))
            i += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["g", "k", "payload"])

    got = ranked_in_groups(
        df, ["g"], ["k"], n_splits=n_splits
    ).collect()
    exp = _expected(rows)
    assert len(got) == len(rows)
    for r in got:
        er, ebn, epayload = exp[(r.g, r.k)]
        assert (r.r, r.bn, r.payload) == (er, ebn, epayload), (
            r,
            er,
            ebn,
        )


def test_ranked_in_groups_composite_group_and_order(spark):
    """Two group columns + two order columns (the banded generator's
    exact shape: group (bucket, pj_idx), order (pv, vec_id)) with
    duplicate pv values so the vec_id tie-break decides ranks."""
    rows = []
    for b in ("00", "01"):
        for pj in (1, 2):
            for vid in range(30):
                rows.append((b, pj, float(vid % 5), vid))
    df = spark.createDataFrame(rows, ["bucket", "pj_idx", "pv", "vid"])
    got = ranked_in_groups(
        df, ["bucket", "pj_idx"], ["pv", "vid"], n_splits=7
    ).collect()
    exp = {}
    for b in ("00", "01"):
        for pj in (1, 2):
            members = sorted(
                [(r[2], r[3]) for r in rows if r[0] == b and r[1] == pj]
            )
            for i, (pv, vid) in enumerate(members):
                exp[(b, pj, vid)] = i + 1
    assert len(got) == len(rows)
    for r in got:
        assert r.r == exp[(r.bucket, r.pj_idx, r.vid)], r
        assert r.bn == 30


def test_ranked_in_groups_rejects_colliding_columns(spark):
    """Internal working columns (_pid/_loc/_off/_start) and the output
    rank/size columns must be absent from the input — a collision
    would otherwise join ambiguously or silently mis-rank."""
    df = spark.createDataFrame([("g", 1, 2)], ["g", "k", "_pid"])
    with pytest.raises(ValueError, match="_pid"):
        ranked_in_groups(df, ["g"], ["k"])
    df2 = spark.createDataFrame([("g", 1, 2)], ["g", "k", "bn"])
    with pytest.raises(ValueError, match="bn"):
        ranked_in_groups(df2, ["g"], ["k"])


def test_release_ranked_cache_unpersists_and_stays_correct(spark):
    """The per-call persist (required for boundary consistency) is
    tracked; release_ranked_cache() unpersists all of them, and a
    released consumer plan still recomputes correctly (both branches
    re-read the same re-persisted relation per call)."""
    from etl_mapwarper_spark.functions.dist_rank import (
        release_ranked_cache,
    )

    release_ranked_cache()  # drain any prior test's entries
    rows = [("g", k, 0) for k in range(50)]
    df = spark.createDataFrame(rows, ["g", "k", "payload"])
    out = ranked_in_groups(df, ["g"], ["k"], n_splits=5)
    first = {(r.g, r.k): r.r for r in out.collect()}
    assert release_ranked_cache() >= 1
    assert release_ranked_cache() == 0  # idempotent
    again = {(r.g, r.k): r.r for r in out.collect()}  # recompute path
    assert again == first
