"""The session factory's deployment-size switch: AQE, shuffle width,
shuffle compression, and locality wait must all flip together on the
small-data threshold (see session.py docstring — the switch IS the
"size your shuffles to the deployment" rule). These tests pin the
DECISIONS, not a live session: builder configs are inspected via the
module's sizing functions plus a builder-capture shim, so no extra
JVM is started.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mapwarper_spark import session as S  # noqa: E402


def test_adaptive_switch_follows_data_size(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_AQE", raising=False)
    monkeypatch.setattr(S, "_dir_bytes", lambda p: 1 << 20)
    assert S._adaptive_wanted("/any") is False, "sub-GiB input: AQE off"
    monkeypatch.setattr(S, "_dir_bytes", lambda p: 4 << 30)
    assert S._adaptive_wanted("/any") is True, "multi-GiB input: AQE on"


def test_adaptive_env_override_beats_size(monkeypatch):
    monkeypatch.setattr(S, "_dir_bytes", lambda p: 1 << 20)
    monkeypatch.setenv("SPARK_GRAFT_AQE", "on")
    assert S._adaptive_wanted("/any") is True
    monkeypatch.setattr(S, "_dir_bytes", lambda p: 4 << 30)
    monkeypatch.setenv("SPARK_GRAFT_AQE", "off")
    assert S._adaptive_wanted("/any") is False


def _captured_configs(monkeypatch, n_bytes: int) -> dict:
    """Run get_spark far enough to collect builder .config calls,
    aborting before getOrCreate starts a JVM."""
    captured: dict = {}

    class _Abort(Exception):
        pass

    class FakeBuilder:
        def master(self, *_):
            return self

        def appName(self, *_):
            return self

        def config(self, k, v):
            captured[k] = v
            return self

        def getOrCreate(self):
            raise _Abort

    monkeypatch.delenv("SPARK_GRAFT_AQE", raising=False)
    monkeypatch.setattr(S, "_dir_bytes", lambda p: n_bytes)
    monkeypatch.setattr(
        S.SparkSession, "builder", FakeBuilder(), raising=False
    )
    try:
        S.get_spark("test", cpus=32, sf_dir="/any")
    except _Abort:
        pass
    return captured


def test_small_data_mode_disables_shuffle_compression(monkeypatch):
    c = _captured_configs(monkeypatch, 1 << 20)
    assert c["spark.sql.adaptive.enabled"] == "false"
    assert c["spark.shuffle.compress"] == "false"
    assert c["spark.shuffle.spill.compress"] == "false"
    assert c["spark.locality.wait"] == "0s"
    assert int(c["spark.sql.shuffle.partitions"]) <= 8, (
        "small data: narrow static shuffles"
    )


def test_large_data_mode_keeps_cluster_defaults(monkeypatch):
    c = _captured_configs(monkeypatch, 100 << 30)
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert c["spark.shuffle.compress"] == "true", (
        "at cluster scale shuffles are network/disk bound — compression on"
    )
    assert c["spark.shuffle.spill.compress"] == "true"
    assert c["spark.locality.wait"] == "3s"
    assert int(c["spark.sql.shuffle.partitions"]) >= 32, (
        "real volumes: wide shuffles, AQE coalesces"
    )
