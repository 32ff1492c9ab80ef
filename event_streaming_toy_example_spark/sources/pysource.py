"""Custom batch source via the Python DataSource API (Spark 4).

The reference's only source is a Python generator loop
(``producer.py:104-110``) driven record-at-a-time.  Spark 4's
``pyspark.sql.datasource`` API is the idiomatic way to wrap such a
generator as a first-class table: the engine plans it like any scan
(it shows up as a DataSourceV2 relation, participates in column
pruning at the Arrow boundary, and parallelizes across its declared
``partitions()``), while the row production stays plain Python.

This module registers a deterministic synthetic "sensor readings"
source: every value is integer arithmetic on the global row id, so a
SQL oracle can recompute the whole table with ``generate_series`` —
the source's partition planning, per-partition generation, and the
reader contract are all value-hash-checkable.

Scale note: a Python data source is the SLOW path per row (rows cross
the Python->JVM Arrow boundary); it is the right tool for custom
protocols and test rigs, not for bulk columnar data that could be
parquet.  The partition count is the parallelism lever — each
partition becomes one task.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: readings per declared input partition
_ROWS_PER_PART = 1000

SENSOR_SCHEMA = "reading_id bigint, sensor_id bigint, reading_c bigint"


class _SensorPartition(InputPartition):
    def __init__(self, index: int, rows: int) -> None:
        self.index = index
        self.rows = rows


class SensorReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_parts = int(options.get("partitions", "8"))
        self.rows = int(options.get("rowsperpartition", str(_ROWS_PER_PART)))

    def partitions(self) -> Sequence[InputPartition]:
        return [_SensorPartition(i, self.rows) for i in range(self.n_parts)]

    def read(self, partition: _SensorPartition) -> Iterator[tuple]:
        base = partition.index * partition.rows
        for i in range(partition.rows):
            rid = base + i
            # deterministic integer functions of the global row id —
            # exactly reproducible by the oracle's generate_series
            yield (rid, rid % 97, (rid * 37) % 200 - 50)


class SensorDataSource(DataSource):
    """``spark.read.format("synthetic_sensors")`` — options:
    ``partitions`` (task count), ``rowsPerPartition``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sensors"

    def schema(self) -> str:
        return SENSOR_SCHEMA

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)


def register_sensor_source(spark: SparkSession) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SensorDataSource)


# ----------------------------------------------- streaming variant

try:  # SimpleDataSourceStreamReader: Spark 4 streaming half of the API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older runtime
    SimpleDataSourceStreamReader = None  # type: ignore[assignment]


if SimpleDataSourceStreamReader is not None:

    class SensorStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked micro-batch delivery of the same
        deterministic generator: offsets are plain row counts, each
        ``read`` advances by ``step`` until ``total`` rows have been
        emitted, and ``readBetweenOffsets`` replays any committed
        range exactly — the contract a custom protocol reader must
        honor for exactly-once recovery."""

        def __init__(self, options: dict) -> None:
            self.total = int(options.get("total", "8000"))
            self.step = int(options.get("step", "1500"))

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def read(self, start: dict):
            s = int(start["offset"])
            if s >= self.total:
                return iter([]), start
            e = min(s + self.step, self.total)
            return self._rows(s, e), {"offset": e}

        def readBetweenOffsets(self, start: dict, end: dict):
            return self._rows(int(start["offset"]), int(end["offset"]))

        @staticmethod
        def _rows(s: int, e: int):
            # a LIST, not a generator: the simple-reader API prefetches
            # rows driver-side and pickles them to executors
            return [
                (rid, rid % 97, (rid * 37) % 200 - 50)
                for rid in range(s, e)
            ]

    class SensorStreamDataSource(DataSource):
        """``spark.readStream.format("synthetic_sensor_stream")`` —
        options: ``total`` (rows before the stream idles), ``step``
        (rows per micro-batch)."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_sensor_stream"

        def schema(self) -> str:
            return SENSOR_SCHEMA

        def simpleStreamReader(self, schema) -> "SensorStreamReader":
            return SensorStreamReader(self.options)


def register_sensor_stream_source(spark: SparkSession) -> None:
    """Idempotent registration of the streaming format; raises a named
    error if the runtime lacks the streaming half of the API."""
    if SimpleDataSourceStreamReader is None:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.sql.datasource.SimpleDataSourceStreamReader "
            "unavailable in this runtime"
        )
    spark.dataSource.register(SensorStreamDataSource)


def read_sensors(
    spark: SparkSession, partitions: int = 8, rows_per_partition: int = _ROWS_PER_PART
) -> DataFrame:
    register_sensor_source(spark)
    return (
        spark.read.format("synthetic_sensors")
        .option("partitions", str(partitions))
        .option("rowsPerPartition", str(rows_per_partition))
        .load()
    )
