"""Operator modules.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB SQL for the same result). The
driver-facing ``__spark_entry__`` merges these registries.
"""
