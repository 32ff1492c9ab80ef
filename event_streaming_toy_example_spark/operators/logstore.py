"""Pluggable LOG STORE for the transactional table's commit protocol
(VERDICT r6 item 1).

The entire atomicity story of ``operators/txtable.py`` reduces to ONE
storage primitive: **atomic put-if-absent of a complete small object**
(the commit file that claims a version slot).  Everything else the log
needs is plain list/read/delete of immutable objects.  This module
makes that contract explicit so the protocol survives the move from a
POSIX filesystem to an object store:

- :class:`PosixLogStore` (default) — stage to a tmp file with
  ``O_CREAT|O_EXCL`` + ``fsync``, then claim the slot with ``link(2)``
  (fails with EEXIST on a lost race; the file appears atomically with
  complete content).  Correct on local disks and on HDFS-like stores
  with atomic metadata ops.
- :class:`InMemoryLogStore` — a dict behind a lock, with a
  deterministic ``before_put`` interleaving hook.  Exists to PROVE the
  protocol depends only on put-if-absent semantics: the two-writer
  interleave tests in ``tests/test_logstore.py`` drive both commit
  orders through it with zero filesystem involvement.
- :class:`S3ConditionalPutLogStore` — the object-store strategy,
  simulated: S3 now supports conditional PUT (``If-None-Match: *``
  returns 412 Precondition Failed when the key exists — public AWS
  capability since 2024), which IS put-if-absent, so a real deployment
  maps :meth:`put_if_absent` to one conditional PUT and needs no
  coordination service.  The simulation keeps those semantics exactly
  and injects per-operation latency so tests exercise the
  slow-round-trip shape.  (Pre-conditional-PUT deployments put this one
  primitive behind a lock service — e.g. a DynamoDB conditional write —
  exactly as open-source lakehouse LogStores do.)

Only the LOG goes through this interface.  Data files are written and
read by Spark's own filesystem layer (``spark.read.parquet`` etc.),
which already speaks HDFS/S3A natively and needs no atomicity beyond
write-once — ``txtable._stage_files`` publishes data files invisibly
and the commit file is the only publication point.  This is the same
scoping as Delta's LogStore interface.

Stores are resolved per table path via a longest-prefix registry so a
test (or a deployment) can mount a store at a path prefix; unregistered
paths fall back to POSIX.
"""

from __future__ import annotations

import os
import threading
import uuid
from collections.abc import Callable


class LogStore:
    """Storage contract the commit protocol needs — nothing more."""

    def put_if_absent(self, path: str, body: bytes) -> bool:
        """Atomically create ``path`` with ``body`` iff it does not
        exist.  Returns True on success, False when ``path`` already
        exists (the caller lost a version race and must re-validate).
        Readers must never observe a partially-written object."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def list_dir(self, dirpath: str) -> list[str]:
        """Names (not paths) of objects directly under ``dirpath``;
        ``[]`` when the directory does not exist."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def mkdirs(self, dirpath: str) -> None:
        """Ensure the log directory exists (no-op for flat keyspaces)."""
        raise NotImplementedError


class PosixLogStore(LogStore):
    """Default store: the tmp + ``O_EXCL`` + ``fsync`` + ``link(2)``
    protocol ``txtable.commit`` has always used, verbatim — raced
    across real processes by ``tests/test_txtable_proc.py``."""

    def put_if_absent(self, path: str, body: bytes) -> bool:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".{uuid.uuid4().hex}.tmp")
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, body)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            return False
        os.unlink(tmp)
        return True

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_dir(self, dirpath: str) -> list[str]:
        if not os.path.isdir(dirpath):
            return []
        return os.listdir(dirpath)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def mkdirs(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)


class InMemoryLogStore(LogStore):
    """Dict-backed store with a deterministic interleave hook.

    ``before_put(path)`` fires OUTSIDE the lock just before a
    put-if-absent attempt — a test points it at "now run the OTHER
    writer's whole commit" to force a version race at the exact
    protocol step where it matters, with no sleeps or thread timing.
    The hook is self-disabling-safe: reentrant puts (the other writer
    committing from inside the hook) skip it via a thread-local."""

    def __init__(
        self, before_put: Callable[[str], None] | None = None
    ) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self._in_hook = threading.local()
        self.before_put = before_put

    def put_if_absent(self, path: str, body: bytes) -> bool:
        if self.before_put is not None and not getattr(
            self._in_hook, "active", False
        ):
            self._in_hook.active = True
            try:
                self.before_put(path)
            finally:
                self._in_hook.active = False
        with self._lock:
            if path in self._objects:
                return False
            self._objects[path] = bytes(body)
            return True

    def read_bytes(self, path: str) -> bytes:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            return self._objects[path]

    def list_dir(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        with self._lock:
            return [
                p[len(prefix):]
                for p in self._objects
                if p.startswith(prefix) and "/" not in p[len(prefix):]
            ]

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects

    def delete(self, path: str) -> None:
        with self._lock:
            if path not in self._objects:
                raise FileNotFoundError(path)
            del self._objects[path]

    def mkdirs(self, dirpath: str) -> None:
        pass  # flat keyspace


class S3ConditionalPutLogStore(InMemoryLogStore):
    """Object-store semantics, simulated: flat keyspace, list-by-prefix,
    and put-if-absent implemented as a CONDITIONAL PUT
    (``If-None-Match: *`` → 412 when the key exists), with injectable
    per-operation latency standing in for the S3 round trip.  A real
    adapter replaces the dict with ``s3:PutObject(IfNoneMatch="*")`` /
    ``GetObject`` / ``ListObjectsV2`` calls — same four methods, same
    semantics, no rename, no link, no coordination service."""

    def __init__(self, latency_s: float = 0.0) -> None:
        super().__init__()
        self.latency_s = latency_s
        self.ops: list[tuple[str, str]] = []  # (op, path) audit trail

    def _rt(self, op: str, path: str) -> None:
        self.ops.append((op, path))
        if self.latency_s:
            import time

            time.sleep(self.latency_s)

    def put_if_absent(self, path: str, body: bytes) -> bool:
        self._rt("conditional-put", path)
        return super().put_if_absent(path, body)

    def read_bytes(self, path: str) -> bytes:
        self._rt("get", path)
        return super().read_bytes(path)

    def list_dir(self, dirpath: str) -> list[str]:
        self._rt("list", dirpath)
        return super().list_dir(dirpath)

    def exists(self, path: str) -> bool:
        self._rt("head", path)
        return super().exists(path)

    def delete(self, path: str) -> None:
        self._rt("delete", path)
        super().delete(path)


# ------------------------------------------------------------ registry

_DEFAULT = PosixLogStore()
_REGISTRY: dict[str, LogStore] = {}


def register_log_store(prefix: str, store: LogStore) -> None:
    """Mount ``store`` for every table path under ``prefix``."""
    _REGISTRY[prefix.rstrip("/")] = store


def unregister_log_store(prefix: str) -> None:
    _REGISTRY.pop(prefix.rstrip("/"), None)


def get_log_store(path: str) -> LogStore:
    """Longest-prefix match over registered mounts; POSIX default."""
    if _REGISTRY:
        best = None
        for prefix in _REGISTRY:
            if path == prefix or path.startswith(prefix + "/"):
                if best is None or len(prefix) > len(best):
                    best = prefix
        if best is not None:
            return _REGISTRY[best]
    return _DEFAULT
