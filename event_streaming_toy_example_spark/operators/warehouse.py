"""Persistent WAREHOUSE CATALOG for the transactional table (VERDICT
r10 item 1).

Until round 10, table names lived in a session-keyed in-memory map
(``txsql._REGISTRY``): every new session had to re-bind every name
with ``tx_register`` before any SQL worked — a SQL-first user's second
session hit it immediately.  This module is the warehouse-level
name→path registry that survives the session:

- The catalog is ONE versioned JSON object family under the warehouse
  directory: ``<warehouse>/_txcatalog/<version>.json``, each version a
  COMPLETE snapshot of ``{name: {"path": ..., "ts": ...}}`` (the
  catalog is metadata-scale — one small entry per table — so full
  snapshots beat a log-and-fold here: a reader is one LIST + one GET).
- Writes commit through the same storage primitive as the table log
  itself — :meth:`~.logstore.LogStore.put_if_absent` of the next
  version file, resolved via :func:`~.logstore.get_log_store` — so two
  sessions racing a ``CREATE TABLE t`` behave exactly like two writers
  racing a table commit: one conditional PUT wins version N+1, the
  loser re-reads and re-validates (the name is now taken →
  :class:`TableExistsError`).  No lock service, object-store clean.
- Readers (``tx_sql`` name resolution, ``SHOW TABLES``) load lazily:
  nothing is read until a name misses the session map, and a bind is
  one LIST + one GET + one conditional PUT.

Crash safety of a CREATE is by ordering: the table's own data/log
commit lands FIRST, the catalog bind second.  A crash between the two
leaves a well-formed unbound table; re-running the CREATE adopts it
(``IF NOT EXISTS``) or binds it idempotently (same name → same path
re-binds are no-ops by design, so the retry converges instead of
erroring on its own half-finished work).

The reference has no catalog of any kind (432-line pipeline with
hard-coded paths); the semantics follow the public Hive-metastore /
Delta managed-table conventions.
"""

from __future__ import annotations

import json
import os
import time

from .logstore import get_log_store

_CAT_DIR = "_txcatalog"
_PAD = 20


class TableExistsError(ValueError):
    """CREATE TABLE (or a bind) found the name already taken — by a
    DIFFERENT path.  Same-path re-binds are idempotent, not errors."""


def _cat_dir(warehouse: str) -> str:
    return os.path.join(warehouse, _CAT_DIR)


def _ver_path(warehouse: str, version: int) -> str:
    return os.path.join(_cat_dir(warehouse), f"{version:0{_PAD}d}.json")


def catalog_state(warehouse: str) -> tuple[int, dict[str, dict]]:
    """(version, {name: entry}) of the newest catalog snapshot;
    ``(0, {})`` for a warehouse with no catalog yet."""
    d = _cat_dir(warehouse)
    store = get_log_store(d)
    versions = [
        int(n[: -len(".json")])
        for n in store.list_dir(d)
        if n.endswith(".json") and n[: -len(".json")].isdigit()
    ]
    if not versions:
        return 0, {}
    v = max(versions)
    return v, json.loads(store.read_bytes(_ver_path(warehouse, v)))


def catalog_tables(warehouse: str) -> dict[str, str]:
    """{name: table path} of every registered table (VIEW entries —
    which carry SQL text instead of a path — are not tables and are
    excluded; see :func:`catalog_views`)."""
    return {
        name: entry["path"]
        for name, entry in catalog_state(warehouse)[1].items()
        if "path" in entry
    }


def catalog_views(warehouse: str) -> dict[str, str]:
    """{name: stored SQL text} of every registered SQL view.  Views
    live in the SAME name space as tables (one catalog entry family,
    standard SQL semantics: a name is a table or a view, never both),
    distinguished by carrying ``view`` (the SELECT text) instead of
    ``path``."""
    return {
        name: entry["view"]
        for name, entry in catalog_state(warehouse)[1].items()
        if "view" in entry
    }


def _commit(
    warehouse: str, read_version: int, entries: dict[str, dict]
) -> bool:
    d = _cat_dir(warehouse)
    store = get_log_store(d)
    store.mkdirs(d)
    body = json.dumps(entries, indent=0, sort_keys=True).encode()
    return store.put_if_absent(_ver_path(warehouse, read_version + 1), body)


def catalog_bind(
    warehouse: str, name: str, path: str, *, replace: bool = False
) -> int:
    """Register ``name`` → ``path``.  Returns the catalog version the
    binding is visible at.  A same-path re-bind is idempotent (returns
    the current version); a different-path bind raises
    :class:`TableExistsError` unless ``replace``.  Losing the
    conditional-PUT race re-reads and re-validates — the two-writer
    protocol of the table log, verbatim."""
    path = os.path.abspath(path)
    while True:
        v, entries = catalog_state(warehouse)
        existing = entries.get(name)
        if existing is not None and "path" not in existing:
            raise TableExistsError(
                f"catalog: {name!r} is registered as a VIEW "
                f"(warehouse {warehouse}) — DROP VIEW it first"
            )
        if existing is not None and not replace:
            if os.path.abspath(existing["path"]) == path:
                return v  # idempotent: crash-retry of our own bind
            raise TableExistsError(
                f"catalog: table {name!r} already registered at "
                f"{existing['path']} (warehouse {warehouse})"
            )
        entries = dict(entries)
        entries[name] = {"path": path, "ts": time.time()}
        if _commit(warehouse, v, entries):
            return v + 1


def catalog_bind_view(
    warehouse: str, name: str, sql: str, *, replace: bool = False
) -> int:
    """Register ``name`` as a SQL VIEW whose definition is ``sql``.
    Same conditional-PUT protocol as :func:`catalog_bind`; a name
    already taken by a TABLE refuses (standard SQL: CREATE OR REPLACE
    VIEW cannot shadow a table), an existing view refuses unless
    ``replace``."""
    while True:
        v, entries = catalog_state(warehouse)
        existing = entries.get(name)
        if existing is not None and "path" in existing:
            raise TableExistsError(
                f"catalog: {name!r} is registered as a TABLE at "
                f"{existing['path']} (warehouse {warehouse}) — a view "
                "cannot shadow it"
            )
        if existing is not None and not replace:
            if existing.get("view") == sql:
                return v  # idempotent re-bind of the same definition
            raise TableExistsError(
                f"catalog: view {name!r} already exists (warehouse "
                f"{warehouse}); use CREATE OR REPLACE VIEW"
            )
        entries = dict(entries)
        entries[name] = {"view": sql, "ts": time.time()}
        if _commit(warehouse, v, entries):
            return v + 1


def catalog_unbind(
    warehouse: str, name: str, *, if_exists: bool = False
) -> int | None:
    """Remove ``name`` from the catalog (DROP TABLE's metadata step).
    Returns the new catalog version, or None when the name was absent
    and ``if_exists`` allowed that."""
    while True:
        v, entries = catalog_state(warehouse)
        if name not in entries:
            if if_exists:
                return None
            raise KeyError(
                f"catalog: no table {name!r} in warehouse {warehouse}"
            )
        entries = dict(entries)
        del entries[name]
        if _commit(warehouse, v, entries):
            return v + 1
