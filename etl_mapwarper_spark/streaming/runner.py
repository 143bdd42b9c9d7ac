"""Stream runners: file source → transformation → sink.

``run_to_memory`` drives a streaming transformation over the events
parquet with ``trigger(availableNow=True)`` and returns the resulting
batch DataFrame from the in-memory sink — how the driver-gate queries
(queries.py) execute a finite replay of the stream.

Output-mode contract for oracle parity: aggregations run in
``complete`` mode, where Structured Streaming's final result provably
equals the batch computation regardless of micro-batch boundaries
(watermarks never evict state in complete mode). Append/update modes
are exercised in tests, where watermark-drop behavior is the thing
under test rather than a correctness hazard.

Shuffle width: a streaming aggregation's STATE STORE count is fixed at
first run by ``spark.sql.shuffle.partitions`` — on a default session
that is 200 store instances for a finite replay of ~10⁵ rows, pure
task-launch overhead. The runners bound it for the duration of the
replay and restore the caller's setting afterwards (safe: the replay
executes eagerly inside the runner; the returned batch table no
longer depends on the conf). Real deployments size this to the
cluster, exactly like batch shuffles.

CONCURRENCY CONTRACT: the bound mutates the session-global conf for
the replay's duration (state-store width has no per-query override,
and the incoming DataFrame is already bound to the caller's session,
so a scoped ``newSession()`` can't replan it). Replays therefore
serialize on a module lock, and a BATCH query planned on the same
session from another thread during a replay would see the bounded
width — don't interleave batch planning with replays on one session
(the driver gate and tests run queries serially, which satisfies
this).
"""

from __future__ import annotations

import itertools
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import SCHEMAS

_counter = itertools.count()

_REPLAY_SHUFFLE_PARTITIONS = 16

_replay_lock = threading.Lock()


@contextmanager
def _bounded_shuffle(spark: SparkSession):
    key = "spark.sql.shuffle.partitions"
    with _replay_lock:
        old = spark.conf.get(key)
        if int(old) <= _REPLAY_SHUFFLE_PARTITIONS:
            yield
            return
        spark.conf.set(key, str(_REPLAY_SHUFFLE_PARTITIONS))
        try:
            yield
        finally:
            spark.conf.set(key, old)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (declared µs-timestamp schema)."""
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def run_to_memory(
    transformed: DataFrame,
    output_mode: str = "complete",
    name_prefix: str = "stq",
) -> DataFrame:
    """Run a finite availableNow pass into a memory sink; return table."""
    name = f"{name_prefix}_{next(_counter)}"
    with _bounded_shuffle(transformed.sparkSession):
        q = (
            transformed.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return transformed.sparkSession.table(name)


def run_foreach_batch(
    transformed: DataFrame,
    batch_fn,
    output_mode: str = "update",
) -> None:
    """foreachBatch sink: hand each micro-batch DataFrame to batch_fn."""
    with _bounded_shuffle(transformed.sparkSession):
        q = (
            transformed.writeStream.foreachBatch(batch_fn)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
