"""Distributed within-group ranking without group-sized window
partitions.

``row_number() OVER (PARTITION BY g ORDER BY k)`` requires every row
of a group in ONE task (WindowExec sorts a whole hash partition in a
single thread). For groups whose size grows with the corpus — SRP
buckets at a fixed hash width hold n/2^bits rows, a duplicate hub is
n/50 rows — that is a straggler at 100 TB no config can fix: the
sort parallelism is 1 per group regardless of cluster size.

``ranked_in_groups`` computes the identical (rank, group-size) pair
with partition sizes bounded by the range split, not the group:

  1. ONE range exchange over (group_cols + order_cols) — order-aligned
     splits that may cut groups anywhere; the RangePartitioner's
     reservoir sample runs inside the job (no construction action);
  2. in-partition sort + ``monotonically_increasing_id``: the local
     row index within the sorted split is ``mid & (2^33-1)`` (Spark's
     documented pid·2^33 + index layout — same extraction as
     ``ds_global_row_ids``, sampling.py:1916, where the layout
     assumption is property-pinned);
  3. a per-(split, group) COUNT aggregate — scan-order-independent,
     output splits×groups-sized. The nondeterministic
     ``spark_partition_id`` grouping key disables map-side combine,
     so this branch pays one SKINNY exchange of bare
     (split-id, group) key tuples — linear, a few bytes per row,
     never the payload columns. Two tiny windows over it give (a) the group's
     global row count before this split (exclusive prefix over
     earlier splits of the same group) and (b) the group's start
     position inside its sorted split (exclusive prefix over earlier
     groups of the same split — splits sort by group first, so a
     group's rows are contiguous). Broadcast back:
     ``rank = prefix_across_splits + (local - start_in_split) + 1``;
     the group size ``bn`` rides the same broadcast.

The ranged relation is ``persist()``-ed (lazily — no construction
job) so the counts branch and the rank branch see the SAME range
boundaries: RangePartitioner seeds its reservoir with the physical
rdd.id, so two independently-instantiated exchanges may sample
different boundaries, and offsets from one bucketing added to local
indexes from another would silently corrupt ranks (the late-r6
ds_global_row_ids consistency bug — see sampling.py:1888 for the
full account; the CacheManager substitutes one shared
InMemoryRelation into both consumers by canonical-plan match).

Output is invariant to where the boundaries fall because
(group_cols + order_cols) is required to be a UNIQUE total order
within each group — which is also what makes callers oracle-checkable
against the plain window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LOCAL_BITS = 33  # monotonically_increasing_id: pid·2^33 + row index
_DEFAULT_SPLITS = 32
_INTERNAL_COLS = ("_pid", "_loc", "_off", "_start")

# Every ranged relation persisted by ranked_in_groups, so the cache
# can be released once the consuming action has run. The persist is
# REQUIRED for correctness (shared range boundaries between the rank
# and counts branches — see the module docstring); without an explicit
# release the entries live for the session and rely on storage-level
# LRU eviction (MEMORY_AND_DISK default ⇒ correct either way, just
# memory pressure). Long-lived sessions (the bench harness, a
# notebook) should call release_ranked_cache() between queries.
_PERSISTED: list = []


def release_ranked_cache() -> int:
    """Unpersist every ranged relation cached by prior
    ``ranked_in_groups`` calls; returns how many were released. Safe
    to call between actions — a later re-execution of a consumer plan
    simply recomputes (both branches re-read the SAME re-persisted
    relation, so boundary consistency is preserved per call)."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


def ranked_in_groups(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    rank_col: str = "r",
    size_col: str = "bn",
    n_splits: int = _DEFAULT_SPLITS,
) -> DataFrame:
    """``df`` + ``rank_col`` (1-based position of the row within its
    ``group_cols`` group under the ``order_cols`` ordering, which must
    be tie-free within a group) + ``size_col`` (group row count).
    Bit-identical to ``row_number()/count() OVER (PARTITION BY
    group_cols ORDER BY order_cols)`` with partition sizes bounded by
    the range split instead of the group.

    Contract (asserted where cheap, documented where not):

    - ``df`` must not already contain the internal working columns
      (``_pid``/``_loc``/``_off``/``_start``) and ``rank_col``/
      ``size_col`` must not collide with existing columns — asserted
      at entry (a collision would otherwise surface as an
      ambiguous-column error or a silently wrong join).
    - The broadcast offsets table is ``n_splits × |groups|`` rows of
      bare keys + 3 longs. Callers must keep that product
      broadcast-sized (≲ tens of millions of rows): current callers
      are bounded by construction (simhash: 4·2^16 buckets, SRP:
      2^4·P orderings — ≤ a few hundred thousand rows at 32 splits).
      A caller with corpus-cardinality groups should NOT use this
      helper — at that cardinality groups are small and the plain
      window is already parallel.
    - The ranged relation is persisted for boundary consistency and
      registered in ``_PERSISTED``; call ``release_ranked_cache()``
      after the consuming action in long-lived sessions.
    """
    for c in _INTERNAL_COLS + (rank_col, size_col):
        if c in df.columns:
            raise ValueError(
                f"ranked_in_groups: input column {c!r} collides with an "
                "internal/output column; rename it first"
            )
    sort_cols = [*group_cols, *order_cols]
    ranged = df.repartitionByRange(n_splits, *sort_cols).persist()
    _PERSISTED.append(ranged)

    local = (
        ranged.sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_loc",
            F.monotonically_increasing_id().bitwiseAND(
                F.lit((1 << _LOCAL_BITS) - 1)
            ),
        )
    )
    counts = ranged.groupBy(
        F.spark_partition_id().alias("_pid"), *group_cols
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    # Windows over the splits×groups-sized counts table, never the
    # corpus: _off = the group's rows in EARLIER splits, _start = rows
    # of EARLIER groups in this split (the group's start position in
    # the sorted split), bn = the group's total count.
    w_grp = Window.partitionBy(*group_cols)
    offsets = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(
            F.sum("_cnt").over(
                w_grp.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
        F.coalesce(
            F.sum("_cnt").over(
                Window.partitionBy("_pid")
                .orderBy(*group_cols)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_start"),
        F.sum("_cnt").over(w_grp).alias(size_col),
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(
            rank_col,
            F.col("_off") + (F.col("_loc") - F.col("_start")) + 1,
        )
        .drop("_pid", "_loc", "_off", "_start")
    )
