"""SparkSession factory.

One place to configure the session so every entry point (tests, bench,
__spark_entry__, pipelines) gets identical, scale-appropriate settings:

- AQE sized to the deployment: ON for real data volumes (at 100 TB the
  static plan is always wrong somewhere; AQE fixes partition counts and
  skew at runtime from actual map-output statistics), OFF with narrow
  static plans when the whole input is sub-GiB and AQE's per-stage
  re-planning latency outweighs any benefit. See _adaptive_wanted.
- Arrow on (every pandas_udf / applyInPandas crosses the JVM<->Python
  boundary in columnar Arrow batches instead of pickled rows).
- UTC session timezone (parity with the DuckDB oracle, whose timestamps
  are UTC-naive).
- shuffle partitions sized to data volume and core count; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def default_sf_dir() -> str:
    """Target data directory, re-read per call (not pinned at import —
    a long-lived process may retarget via the environment)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Import-time snapshot kept for callers that only need a static default
# path (bench CLI args); session sizing must use default_sf_dir()/the
# explicit sf_dir parameter instead.
DEFAULT_SF_DIR = default_sf_dir()

# Below this total input size the session plans statically with few
# shuffle partitions. Rationale: AQE earns its keep by re-planning
# from *unknown* runtime statistics — partition coalescing, skew
# splitting, join demotion — all of which matter when stages move
# gigabytes per executor. On a sub-GiB local dataset every stage's
# stats are tiny and knowable, and AQE's per-stage materialize+
# re-optimize latency (~50-150 ms × stages × queries) is pure
# overhead. At the 100 TB target the same factory configures AQE on
# with partition counts sized to the data (see below) — this switch
# IS the "size your shuffles to the deployment" rule, applied both
# directions. Force with SPARK_GRAFT_AQE=on|off.
_SMALL_DATA_BYTES = 2 << 30


def _dir_bytes(path: str) -> int:
    total = 0
    try:
        for root, _, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    except OSError:
        pass
    return total


def _adaptive_wanted(sf_dir: str) -> bool:
    forced = os.environ.get("SPARK_GRAFT_AQE", "").lower()
    if forced in ("on", "true", "1"):
        return True
    if forced in ("off", "false", "0"):
        return False
    return _dir_bytes(sf_dir) >= _SMALL_DATA_BYTES


def get_spark(
    app_name: str = "etl_mapwarper_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
    sf_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (or all local cores). In
    cluster deployments the master/resource settings come from
    spark-submit and these local[..] settings are ignored.

    ``sf_dir`` is the data directory the session will QUERY — AQE and
    shuffle width are sized to it. Defaults to $SPARK_GRAFT_SF_DIR
    re-read now (not at import), so a caller pointing the session at a
    multi-GiB directory gets AQE even if the env changed since import;
    SPARK_GRAFT_AQE=on|off still overrides either way.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    adaptive = _adaptive_wanted(sf_dir or default_sf_dir())
    # Shuffle width follows data volume: wide (≥ cores, AQE-coalesced)
    # when stages move real data; narrow static plans when the whole
    # input fits a handful of 100-MB-class partitions and per-task
    # launch overhead would dominate.
    n_shuffle = max(cpus, 4) if adaptive else max(4, min(8, cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle compression trades CPU for IO; below the small-data
        # threshold the shuffle blocks are KBs on local page cache and
        # LZ4 CPU is ~18% of total wall-clock (r4 A/B: 3.34 s -> 2.75 s
        # over six headline queries), so compression follows the same
        # deployment switch as AQE: ON when stages move real data
        # (100 TB clusters are network/disk bound), OFF for sub-GiB
        # local runs. locality.wait=0 likewise: single-host scheduling
        # has no better locality to wait for.
        .config("spark.shuffle.compress", str(adaptive).lower())
        .config("spark.shuffle.spill.compress", str(adaptive).lower())
        .config("spark.locality.wait", "3s" if adaptive else "0s")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", str(adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: keep per-task input ~128MB so tasks fit executor
        # memory at any SF; matches the cluster default.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # ANSI off: oracle (DuckDB) and classic TPC-H semantics tolerate
        # overflow-to-null-free double arithmetic; keep Spark legacy mode.
        .config("spark.sql.ansi.enabled", "false")
        # Managed-table warehouse (bucketed tables) lives outside the
        # repo; the in-memory catalog needs no metastore service.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
