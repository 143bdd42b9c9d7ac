"""NDJSON sink as a Spark 4 Python DataSource WRITER (V2 write path).

``sources/ndjson.py`` writes NDJSON through Spark's JSON sink;
``pipeline.export_ndjson_file`` produces the single-file handoff
format. This module exposes the remaining surface: a REGISTERED
custom writer — ``df.write.format("ndjson_sink").save(path)`` — with
the real two-phase task-commit protocol that makes distributed writes
exactly-once at the file level:

- each write task streams its partition to a STAGING file
  (``.staging-<uuid>``) and returns the name in its commit message;
- ``commit()`` (driver, after ALL tasks succeed) renames staging
  files to final ``part-*.ndjson`` names and stamps ``_SUCCESS``;
- ``abort()`` removes staging files, so failed/speculative task
  attempts never publish partial output.

That staging/rename discipline is exactly what keeps a 1000-executor
write atomic under task retries and speculation; readers only ever
see committed files. Line format matches the reference handoff
(mapwarper.js:164-165): one compact JSON object per line, field order
= schema order.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    staged: str
    rows: int


class NdjsonSinkWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                d = {f: row[f] for f in self.fields}
                fh.write(json.dumps(d, separators=(",", ":")) + "\n")
                n += 1
        return _FileCommit(staged=staged, rows=n)

    def commit(self, messages):
        for i, msg in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.ndjson")
            os.replace(msg.staged, final)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        for msg in messages:
            if msg is not None and os.path.exists(msg.staged):
                os.remove(msg.staged)


class NdjsonSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_sink"

    def writer(self, schema, overwrite: bool):
        return NdjsonSinkWriter(self.options, schema, overwrite)


def register_ndjson_sink(spark) -> None:
    spark.dataSource.register(NdjsonSinkDataSource)
