"""Custom Python DataSource connectors (Spark 4 extension point).

The reference's ``Source`` is an arbitrary producer you can hand to the
runtime (Tubes/Source.hs:55 ``Source``/``sample``; Tubes.hs:182-189
``prompt`` is the unbounded form).  Spark's native analog is the
DataSource V2 Python API: a class registered once per session that the
scan planner treats exactly like a built-in format — partition
planning, parallel reads, and (for the stream form) offset tracking
all flow through the normal engine.

``ArithEventsDataSource`` here is deliberately DETERMINISTIC: every row
is pure integer arithmetic on (event_id), so a DuckDB ``range()``
reproduces the full output and the connector can sit under the driver's
value-hash oracle gate — the same verification discipline as every
other operator, applied to the ingest surface itself.

Scale shape: ``partitions()`` splits the id space into ``n_parts``
contiguous ranges; each executor materializes ONLY its range
(generator, no driver buffering).  The stream reader advances a single
monotone integer offset — the minimal, Kafka-shaped offset contract —
and replays any range deterministically, so failed triggers retry
exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# value formula shared by rows and oracles: cents in [0, 100.00)
_VAL_MOD = 10_000
_VAL_MUL = 7_919  # prime stride -> full-period permutation of cents
_USER_MOD = 97


def _row(i: int):
    return (i, i % _USER_MOD, (i * _VAL_MUL % _VAL_MOD) / 100.0)


def arith_events_oracle_sql(n_rows: int) -> str:
    """DuckDB reproduction of the connector's output (for oracles)."""
    return f"""
SELECT i AS event_id, i % {_USER_MOD} AS user_id,
       (i * {_VAL_MUL} % {_VAL_MOD}) / 100.0 AS value
FROM range({n_rows}) t(i)
"""


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _ArithReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _ArithStreamReader(DataSourceStreamReader):
    """Unbounded form: offset = next unread event_id, ``rows_per_batch``
    admitted per trigger up to ``max_rows`` (bounded for the oracle
    harness; a production source would keep advancing forever)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))
        self._cur = 0

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        self._cur = min(self._cur + self.rows_per_batch, self.max_rows)
        return {"next": self._cur}

    def partitions(self, start, end):
        lo, hi = start["next"], end["next"]
        n = max(1, self.n_parts)
        step = max(1, -(-(hi - lo) // n))
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ] or [_RangePartition(lo, hi)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        pass


class _ManifestCommit(WriterCommitMessage):
    """Per-task commit message: which temp file the task produced and
    its row count + content digest (what the driver-side commit needs to
    publish the manifest)."""

    def __init__(self, filename: str, n_rows: int, md5: str):
        self.filename = filename
        self.n_rows = n_rows
        self.md5 = md5


class _ManifestJsonlWriter(DataSourceWriter):
    """WRITE side of the connector surface, with a REAL two-phase
    commit — the protocol every exactly-once sink at 100 TB uses:

    * executor ``write``: each task streams its rows to a uniquely
      named JSONL file under ``<path>/_tmp/`` (never the final
      location) and returns (filename, rows, md5) as its commit
      message.  A re-attempted task writes a NEW uuid file; the loser's
      orphan stays in _tmp, invisible forever.
    * driver ``commit``: move the winners into ``<path>/data/`` and
      write ``manifest.json`` LAST — the manifest is the commit point;
      readers trust only files it lists, so a crash anywhere before the
      manifest write publishes nothing.
    * driver ``abort``: remove the temp files; the target is untouched.

    Rows are written in sorted-key JSON with ``separators`` pinned, so
    file digests are deterministic for deterministic input partitions."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl writer requires a path option")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        import hashlib
        import json as _json
        import os
        import uuid

        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        h = hashlib.md5()
        n = 0
        with open(os.path.join(tmp_dir, name), "wb") as fh:
            for row in iterator:
                line = _json.dumps(
                    {k: row[k] for k in self.fields},
                    sort_keys=True,
                    separators=(",", ":"),
                    default=str,
                ).encode() + b"\n"
                fh.write(line)
                h.update(line)
                n += 1
        return _ManifestCommit(name, n, h.hexdigest())

    def commit(self, messages):
        import json as _json
        import os

        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        entries = []
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, "_tmp", m.filename),
                os.path.join(data_dir, m.filename),
            )
            entries.append(
                {"file": m.filename, "n_rows": m.n_rows, "md5": m.md5}
            )
        manifest = {
            "files": sorted(entries, key=lambda e: e["file"]),
            "total_rows": sum(e["n_rows"] for e in entries),
        }
        tmp_manifest = os.path.join(self.path, "manifest.json.tmp")
        with open(tmp_manifest, "w") as fh:
            _json.dump(manifest, fh, indent=1)
        os.replace(tmp_manifest, os.path.join(self.path, "manifest.json"))

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class ArithEventsDataSource(DataSource):
    """``spark.read.format("arith_events")`` after
    ``spark.dataSource.register(ArithEventsDataSource)``."""

    @classmethod
    def name(cls):
        return "arith_events"

    def schema(self):
        return "event_id long, user_id long, value double"

    def reader(self, schema):
        return _ArithReader(self.options)

    def streamReader(self, schema):
        return _ArithStreamReader(self.options)


class ManifestJsonlDataSource(DataSource):
    """``df.write.format("manifest_jsonl").option("path", p).save()``
    after :func:`register` — the write-side connector (see
    _ManifestJsonlWriter for the commit protocol)."""

    @classmethod
    def name(cls):
        return "manifest_jsonl"

    def writer(self, schema, overwrite):
        return _ManifestJsonlWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent session registration.

    The DataSource class is shipped to the Python worker by PICKLE, and
    cloudpickle serializes importable-module classes by REFERENCE — so a
    driver whose workers don't have this repo on sys.path (the external
    driver imports __spark_entry__ via a path hack that does not
    propagate) would fail with ModuleNotFoundError.  Registering the
    module for by-VALUE pickling makes the connector self-contained:
    the class definition itself travels with the plan."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(ArithEventsDataSource)
    spark.dataSource.register(ManifestJsonlDataSource)
