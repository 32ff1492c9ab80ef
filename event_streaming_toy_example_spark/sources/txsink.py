"""Streaming SINK into the transactional table —
``df.writeStream.format("txtable").option("path", p)``.

The batch write path (:func:`txtable.tx_append` and friends) already
commits executor-written parquet through the log; this module closes
the STREAMING write gap with Spark 4.1's Python DataSource
stream-writer API, completing the source/sink symmetry
(``sources/txsource.py`` reads the same tables as a stream):

- ``write`` runs ON EXECUTORS: each task streams its Arrow record
  batches straight into ONE immutable parquet object under the
  table's ``data/`` dir (write-once, final name — the object-store
  discipline every writer here follows; no temp dir, no rename) and
  ships back only the file name + row count;
- ``commit`` runs ON THE DRIVER once per micro-batch: harvest footer
  stats for the new files (the same ``_footer_stats`` every batch
  writer uses, so data skipping and Bloom policies apply to streamed
  files too), then publish ONE atomic log commit carrying the
  ``(app, batchId)`` stream-transaction token.  The token makes
  replay EXACTLY-ONCE: a micro-batch re-run after a crash between the
  sink commit and the checkpoint commit finds its batch id at or
  below the app's committed floor, deletes the duplicate files it
  just staged, and succeeds idempotently — the same txn-action
  mechanism Delta's streaming sink uses;
- ``abort`` deletes the staged files of a failed micro-batch (and a
  crash that skips abort leaves invisible orphans that
  :func:`txtable.vacuum` reaps — visibility comes from the commit
  file alone).

``outputMode("append")`` maps to append commits;
``outputMode("complete")`` maps to REPLACE commits (remove every
pre-batch live file, add the batch's files) — the natural sink mode
for a streaming aggregation whose full result is re-emitted per
batch.

Options (all lowercase): ``path`` (required, table root), ``txnapp``
(stream-transaction app id; defaults to ``"txsink"`` — set it when
MORE THAN ONE streaming query appends to the same table, else their
batch-id floors collide and later queries' early batches are wrongly
deduped).

Boundaries, stated plainly: the executor-side write is pyarrow
against the table path (the same portability surface as the
streaming reader — custom python data stores registered only on the
driver are not visible to workers); the ``commit`` hook runs in a
Python data-source worker with NO JVM session, so auto-maintenance
cannot compact in-process — :func:`attach_maintenance` drives the
policy from a driver-side ``StreamingQueryListener`` instead; tables
with CHECK constraints or
generated columns refuse the sink BY NAME at query start (those
validations run through DataFrame writers — use
``foreachBatch(tx_append)`` for constrained tables); the incoming
stream's schema must match the table's logical schema at query start
(no mid-stream evolution — a CONCURRENT additive evolution still
composes, because pre-evolution files null-fill at read).

At cluster scale each micro-batch writes N executor-parallel objects
and pays one conditional-PUT commit plus O(new files) footer reads on
the driver — commit cost is independent of table size, and appends
from the sink COMMUTE with other appends under the log's
file-disjoint validation.

No equivalent in the reference (its sink rewrites an NDJSON directory
wholesale, ``toy_glue.py:58-65``); the API shape follows the public
``pyspark.sql.datasource.DataSourceStreamArrowWriter`` contract.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

from pyspark.sql.types import StructType

try:  # Spark >= 4.1 (Arrow stream writer)
    from pyspark.sql.datasource import (
        DataSourceStreamArrowWriter,
        WriterCommitMessage,
    )
except ImportError:  # pragma: no cover - older runtimes
    DataSourceStreamArrowWriter = None
    WriterCommitMessage = object


class _StagedFiles(WriterCommitMessage):
    """Picklable per-task result: table-relative file names + rows."""

    def __init__(self, names: list[str], rows: int) -> None:
        self.names = names
        self.rows = rows


def _sink_writer_cls():
    if DataSourceStreamArrowWriter is None:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.sql.datasource.DataSourceStreamArrowWriter "
            "unavailable in this runtime — stream into the table with "
            "foreachBatch(tx_append) instead"
        )

    class TxTableStreamWriter(DataSourceStreamArrowWriter):
        """One instance per streaming query; pickled to executors, so
        it carries only strings (path, schema json, physical names) —
        never driver state."""

        def __init__(
            self, options: dict, schema: StructType, overwrite: bool
        ) -> None:
            from event_streaming_toy_example_spark.operators import (
                txtable as tx,
            )

            opts = {k.lower(): v for k, v in options.items()}
            path = opts.get("path")
            if not path:
                raise ValueError(
                    "txtable sink: option 'path' (the table root) is "
                    "required"
                )
            self._path = os.path.abspath(path)
            self._overwrite = bool(overwrite)
            self._app = opts.get("txnapp") or "txsink"
            state = tx._fold_state(self._path)
            if state is None:
                # first commit CREATES the table (column-mapping ids
                # assigned now, committed with batch 0)
                self._schema_json = tx._assign_ids(schema).json()
            else:
                props = state.properties or {}
                for blocker, why in (
                    ("__constraints", "CHECK constraints"),
                    ("__generated", "generated columns"),
                ):
                    if props.get(blocker):
                        raise ValueError(
                            f"txtable sink: table {self._path} declares "
                            f"{why}, which the streaming sink cannot "
                            "validate executor-side — stream through "
                            "foreachBatch(tx_append) instead"
                        )
                self._check_schema(state.schema, schema)
                self._schema_json = state.schema
            pm = tx._phys_map(self._schema_json)
            self._logical_names = [f.name for f in schema.fields]
            self._phys_names = [
                pm.get(f.name, f.name) for f in schema.fields
            ]

        @staticmethod
        def _check_schema(table_schema_json: str, incoming: StructType):
            import json as _json

            table = StructType.fromJson(_json.loads(table_schema_json))
            want = {f.name: f.dataType.simpleString() for f in table.fields}
            got = {f.name: f.dataType.simpleString() for f in incoming.fields}
            if want != got:
                missing = sorted(set(want) - set(got))
                extra = sorted(set(got) - set(want))
                drift = sorted(
                    n for n in set(want) & set(got) if want[n] != got[n]
                )
                raise ValueError(
                    "txtable sink: stream schema must match the table's "
                    f"logical schema at query start (missing: {missing}, "
                    f"extra: {extra}, type drift: {drift}) — evolve the "
                    "table first (tx_append enforces the additive "
                    "contract), then restart the stream"
                )

        # ----------------------------------------------- executor side

        def write(self, iterator: Iterator) -> _StagedFiles:
            import pyarrow as pa
            import pyarrow.parquet as pq

            writer = None
            name = f"data/st-{uuid.uuid4().hex}.parquet"
            target = os.path.join(self._path, name)
            rows = 0
            try:
                for batch in iterator:
                    if batch.num_rows == 0:
                        continue
                    # logical -> physical rename (column mapping): the
                    # files on disk always carry physical names; Spark
                    # delivers batch columns in stream-schema order
                    renamed = pa.RecordBatch.from_arrays(
                        list(batch.columns),
                        schema=pa.schema(
                            [
                                f.with_name(p)
                                for f, p in zip(
                                    batch.schema, self._phys_names
                                )
                            ]
                        ),
                    )
                    if writer is None:
                        os.makedirs(os.path.dirname(target), exist_ok=True)
                        writer = pq.ParquetWriter(target, renamed.schema)
                    writer.write_batch(renamed)
                    rows += renamed.num_rows
            finally:
                if writer is not None:
                    writer.close()
            if rows == 0:
                return _StagedFiles([], 0)
            return _StagedFiles([name], rows)

        # ------------------------------------------------- driver side

        def commit(self, messages, batchId: int) -> None:  # noqa: N803
            from pyspark.sql import SparkSession

            from event_streaming_toy_example_spark.operators import (
                txtable as tx,
            )

            names = [
                n for m in messages if m is not None for n in m.names
            ]
            state = tx._fold_state(self._path)
            if state is None:
                read_version, remove = 0, []
                schema_json = self._schema_json
            else:
                read_version = state.version
                # commit the CURRENT log schema, not the query-start
                # one: a concurrent additive evolution widened it, and
                # this batch's narrower files simply null-fill at read
                schema_json = state.schema
                remove = list(state.files) if self._overwrite else []
            action = "replace" if self._overwrite else "append"
            if not names and not self._overwrite:
                return  # empty append micro-batch: keep the log clean
            try:
                tx.commit(
                    self._path,
                    action,
                    names,
                    remove,
                    schema_json,
                    read_version,
                    stream_txn=(self._app, int(batchId)),
                    stats=tx._footer_stats(self._path, names),
                )
            except tx.ConcurrentWriteError as e:
                if "already committed" not in str(e):
                    raise
                # replayed micro-batch (crash landed between sink
                # commit and checkpoint commit): the files staged just
                # now are duplicates of an already-visible commit —
                # delete them and succeed idempotently
                store = tx.get_data_store(self._path)
                for n in names:
                    try:
                        store.delete(os.path.join(self._path, n))
                    except OSError:  # pragma: no cover - best effort
                        pass
                return
            spark = SparkSession.getActiveSession()
            if spark is not None:
                tx.maybe_auto_maintain(spark, self._path)

        def abort(self, messages, batchId: int) -> None:  # noqa: N803
            from event_streaming_toy_example_spark.operators import (
                txtable as tx,
            )

            store = tx.get_data_store(self._path)
            for m in messages:
                if m is None:
                    continue
                for n in m.names:
                    try:
                        store.delete(os.path.join(self._path, n))
                    except OSError:  # pragma: no cover - best effort
                        pass

    return TxTableStreamWriter


def stream_writer(options: dict, schema: StructType, overwrite: bool):
    """Factory used by ``TxTableDataSource.streamWriter``."""
    return _sink_writer_cls()(options, schema, overwrite)


def attach_maintenance(spark, path: str):
    """Drive the table's auto-maintenance policy for a STREAMING sink
    from the driver: the sink's ``commit`` runs inside a Python
    data-source worker that has no JVM session, so it cannot compact
    in-process the way batch writers'
    :func:`txtable._commit_and_maintain` does.  This listener gives
    the policy its post-commit look after every micro-batch progress
    event instead — free when no policy is declared or the small-file
    trigger has not fired (one memoized fold, the same one the next
    reader performs), a sized compaction + retention vacuum when it
    has.  Returns the listener; pass it to
    :func:`detach_maintenance` when the query stops."""
    from pyspark.sql.streaming import StreamingQueryListener

    from event_streaming_toy_example_spark.operators import txtable as tx

    abspath = os.path.abspath(path)

    class _SinkMaintenance(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:  # noqa: N802
            pass

        def onQueryProgress(self, event) -> None:  # noqa: N802
            try:
                tx.maybe_auto_maintain(spark, abspath)
            except Exception:  # pragma: no cover - listener must not
                pass  # take down the listener bus on a lost OCC race

        def onQueryTerminated(self, event) -> None:  # noqa: N802
            pass

        def onQueryIdle(self, event) -> None:  # noqa: N802
            pass

    listener = _SinkMaintenance()
    spark.streams.addListener(listener)
    return listener


def detach_maintenance(spark, listener) -> None:
    spark.streams.removeListener(listener)
