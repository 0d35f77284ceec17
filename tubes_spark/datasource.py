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
    InputPartition,
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
