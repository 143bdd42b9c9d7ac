"""Streaming behavior tests that the oracle gate can't express:
watermark-drop of late data (append mode), state carried across
micro-batches in applyInPandasWithState, and the foreachBatch sink.

Three-file fixtures with controlled modification times force a
deterministic micro-batch order (file source processes oldest first
with maxFilesPerTrigger=1). Note Spark's eviction timing: a window is
emitted/evicted at the END of the batch in which the watermark passes
it, so a late row only gets dropped if it arrives in a LATER batch
than the one that evicted its window — hence the buffer batch (file b)
between the watermark-advancing batch and the late arrival."""

from __future__ import annotations

import os
import sys
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.streaming import ops  # noqa: E402
from etl_mapwarper_spark.streaming.runner import run_foreach_batch  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402

T0 = pd.Timestamp("2024-01-01 00:00:00")
SCHEMA_DDL = "ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def _write(path: str, rows: list[tuple[pd.Timestamp, int, float]], mtime: float):
    pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def three_batch_dir(tmp_path):
    """Batch a: on-time rows + a far-future row (watermark → T0+4h,
    T0-window evicted at end of NEXT batch's predecessor — see module
    docstring). Batch b: buffer. Batch c: one LATE row + one on-time."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    now = time.time()
    _write(
        f"{d}/a_batch1.parquet",
        [
            (T0 + pd.Timedelta(minutes=5), 1, 1.0),
            (T0 + pd.Timedelta(minutes=10), 1, 2.0),
            (T0 + pd.Timedelta(hours=5), 2, 3.0),  # watermark -> T0+4h
        ],
        mtime=now - 90,
    )
    _write(
        f"{d}/b_batch2.parquet",
        [(T0 + pd.Timedelta(hours=5, minutes=1), 2, 4.0)],
        mtime=now - 60,
    )
    _write(
        f"{d}/c_batch3.parquet",
        [
            (T0 + pd.Timedelta(minutes=20), 1, 100.0),  # LATE: << watermark
            (T0 + pd.Timedelta(hours=5, minutes=2), 2, 5.0),
        ],
        mtime=now - 30,
    )
    return d


def _stream(spark, d):
    return (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def test_watermark_drops_late_rows_in_append_mode(spark, three_batch_dir):
    ev = _stream(spark, three_batch_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "n", "sv")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    rows = {r.ws: r for r in spark.table("late_test").collect()}
    # T0 window was evicted once the watermark passed T0+30min; the
    # batch-3 late row (T0+20min, value 100) was DROPPED, not merged
    # and not re-emitted as a duplicate window.
    t0_key = T0.to_pydatetime()
    assert t0_key in rows
    assert rows[t0_key].n == 2
    assert rows[t0_key].sv == pytest.approx(3.0)  # 1.0 + 2.0, not 103.0


def test_stateful_totals_accumulate_across_batches(spark, three_batch_dir):
    ev = _stream(spark, three_batch_dir)
    updates: list[pd.DataFrame] = []
    run_foreach_batch(
        ops.stateful_user_totals(ev),
        lambda df, _id: updates.append(df.toPandas()),
        output_mode="update",
    )
    nonempty = [u for u in updates if len(u)]
    assert len(nonempty) >= 3  # one update frame per data-bearing batch
    final = (
        pd.concat(nonempty, ignore_index=True)
        .sort_values("n_events")
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
    )
    # user 2: one event per batch -> state carried across 3 batches.
    assert final.loc[2, "n_events"] == 3
    assert final.loc[2, "total_value"] == pytest.approx(12.0)
    # user 1's batch-3 row is LATE but still reaches the function:
    # unlike built-in windowed aggs, applyInPandasWithState leaves
    # late-data policy to the operator author (the watermark only
    # drives state timeouts). Documented in ops.stateful_user_totals.
    assert final.loc[1, "n_events"] == 3
    assert final.loc[1, "total_value"] == pytest.approx(103.0)


def test_dedup_within_watermark_single_batch(spark, tmp_path):
    d = str(tmp_path / "dd")
    os.makedirs(d)
    _write(
        f"{d}/x.parquet",
        [
            (T0, 1, 1.0),
            (T0, 1, 1.0),  # exact duplicate (same user, same ts)
            (T0 + pd.Timedelta(minutes=1), 1, 1.0),
        ],
        mtime=time.time(),
    )
    ev = _stream(spark, d)
    out = ops.dedup_within_watermark(ev, keys=["user_id", "ts"])
    q = (
        out.writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert spark.table("dd_test").count() == 2


def test_foreach_batch_merge_invariant_to_batch_slicing(spark, tmp_path):
    """The partial-agg append pattern must give identical totals no
    matter how the stream is sliced into micro-batches: here the
    events land as 5 files consumed 1 per trigger (5 batches), vs the
    single-batch result from the driver-gate query."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_mapwarper_spark.sources.tables import SCHEMAS

    src = str(tmp_path / "events_sliced")
    (
        spark.read.schema(SCHEMAS["events"])
        .parquet(f"{SF_DIR}/events.parquet")
        .repartition(5)
        .write.mode("overwrite")
        .parquet(src)
    )
    ev = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .filter(F.col("event_type") == "purchase")
    )
    land = tempfile.mkdtemp(prefix="fb_sliced_") + "/partials"
    batch_ids = []

    def write_partials(bdf, batch_id):
        batch_ids.append(batch_id)
        (
            bdf.groupBy("user_id")
            .agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(land)
        )

    q = (
        ev.writeStream.foreachBatch(write_partials)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert len(batch_ids) >= 2, "slicing must actually produce multiple batches"

    merged = (
        spark.read.parquet(land)
        .groupBy("user_id")
        .agg(
            F.round(F.sum("v"), 6).alias("total_value"),
            F.sum("n").alias("n_purchases"),
        )
    )
    from etl_mapwarper_spark.sources.tables import load_table

    expected = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 6).alias("total_value"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
    )
    assert merged.exceptAll(expected).count() == 0
    assert expected.exceptAll(merged).count() == 0


def test_transform_with_state_gate(spark):
    """transformWithState is implemented but environment-gated: without
    google.protobuf the TWS state server cannot start, so the operator
    must fail fast with the documented NotImplementedError instead of
    crashing mid-stream. On a protobuf-present host this becomes a
    DIFFERENTIAL parity test: the transformWithStateInPandas twin must
    settle to exactly the applyInPandasWithState rows (the executable
    equivalence artifact for the one env-gated surface)."""
    import pytest

    from etl_mapwarper_spark.streaming import ops
    from etl_mapwarper_spark.streaming.queries import (
        read_events_stream,
        st_user_totals,
        st_user_totals_tws,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False
    if not has_protobuf:
        ev = read_events_stream(spark, SF_DIR)
        with pytest.raises(NotImplementedError, match="protobuf"):
            ops.stateful_user_totals_tws(ev)
        with pytest.raises(NotImplementedError, match="protobuf"):
            st_user_totals_tws(spark, SF_DIR)
    else:
        a = st_user_totals(spark, SF_DIR)
        b = st_user_totals_tws(spark, SF_DIR)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_rest_incremental_lands_each_page_exactly_once(spark):
    """Three checkpointed availableNow runs against a growing API must
    land every page exactly once — the offset log, not luck, dedups
    re-runs."""
    from etl_mapwarper_spark.streaming.queries import st_rest_incremental

    items = st_rest_incremental(spark, "/root/testdata/sf0.001")
    n = items.count()
    n_distinct = items.select("id").distinct().count()
    assert n == 530 and n_distinct == 530
