"""SQL DML surface for the transactional table.

``tx_view`` (round 9, VERDICT r8 item 4) made the table SQL-READABLE;
this module makes it SQL-WRITABLE: ``tx_sql(spark, "UPDATE t SET ...")``
routes standard DML text onto the table's transactional operators —

- ``DELETE FROM t [WHERE ...]``       → :func:`txtable.tx_delete`
- ``UPDATE t SET a = e[, ...] [WHERE ...]`` → :func:`txtable.tx_update`
- ``INSERT INTO t [(cols)] SELECT ...|VALUES ...`` → :func:`txtable.tx_append`
- ``MERGE INTO t [AS] a USING src [AS] b ON ... WHEN ...`` → :func:`txtable.tx_merge`
- ``SELECT ...`` / ``WITH ...``       → ``spark.sql`` over the registered views

Tables are addressed by NAME: :func:`tx_register` binds a name to a
table path and keeps a snapshot temp view under that name current
(re-resolved after every DML through this module), so reads and the
USING side of a MERGE can reference it in plain SQL.

The statement skeleton is parsed here (keyword positions, top-level
comma/AND splits that respect quotes and parentheses); every
EXPRESSION — predicates, assignment values, merge conditions — is
passed through verbatim for Spark's own SQL parser via ``F.expr``, so
the full Spark expression language works inside the clauses.  WHERE
conjunctions of ``col op literal`` compile to the engine's clause
tuples (stats pruning + narrow conflict domain); anything richer
falls back to the raw-predicate path (full candidate set, strict
validation) — generality costs pruning, never correctness.

The reference has no SQL at all (432-line pipeline); the surface
follows the public Delta Lake SQL DML semantics.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from . import txtable as tx

#: name -> table path
_REGISTRY: dict[str, str] = {}


def tx_register(spark: SparkSession, path: str, name: str) -> str:
    """Bind ``name`` to a table path for DML routing and register the
    current snapshot as a temp view under the same name (refreshed
    after every ``tx_sql`` write).  Returns ``name``."""
    if not re.fullmatch(r"\w+", name):
        raise ValueError(f"tx_register: table name must be \\w+, got {name!r}")
    _REGISTRY[name] = path
    if tx.table_version(path):
        tx.tx_view(spark, path, name)
    return name


def _resolve(name: str) -> str:
    p = _REGISTRY.get(name)
    if p is None:
        raise ValueError(
            f"tx_sql: unknown table {name!r} — register it first with "
            f"tx_register(spark, path, {name!r}); known: {sorted(_REGISTRY)}"
        )
    return p


def _refresh(spark: SparkSession, name: str) -> None:
    tx.tx_view(spark, _REGISTRY[name], name)


# ------------------------------------------------------------- lexing


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a regex at paren-depth 0, outside quotes."""
    out, buf, depth, i, q = [], [], 0, 0, None
    pat = re.compile(sep, re.IGNORECASE)
    while i < len(s):
        ch = s[i]
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in ("'", '"'):
            q = ch
            buf.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0:
            m = pat.match(s, i)
            if m:
                out.append("".join(buf))
                buf = []
                i = m.end()
                continue
        buf.append(ch)
        i += 1
    out.append("".join(buf))
    return out


def _find_top(s: str, word: str, start: int = 0) -> int:
    """Index of a top-level keyword (outside quotes/parens), or -1."""
    depth, i, q = 0, start, None
    pat = re.compile(r"\b" + word + r"\b", re.IGNORECASE)
    while i < len(s):
        ch = s[i]
        if q:
            if ch == q:
                q = None
            i += 1
            continue
        if ch in ("'", '"'):
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return i
        i += 1
    return -1


_LIT_RE = re.compile(
    r"^\s*(?:'(?P<str>(?:[^']|'')*)'|(?P<num>-?\d+(?P<frac>\.\d+)?))\s*$"
)


def _literal(s: str):
    """Parse a SQL literal into a Python value, or raise."""
    m = _LIT_RE.match(s)
    if not m:
        raise ValueError(s)
    if m.group("str") is not None:
        return m.group("str").replace("''", "'")
    return float(m.group("num")) if m.group("frac") else int(m.group("num"))


# a clause column is a PLAIN name only.  The engine's derived time
# transforms (``day(ts)`` clause tuples) are deliberately NOT accepted
# from SQL text: in SQL, ``day(ts)`` is the day-of-month function, and
# compiling it to the engine's ISO-prefix transform would silently
# change the statement's meaning — function calls fall back to the
# raw-SQL path where Spark's parser gives them SQL semantics.
_TERM_RE = re.compile(
    r"^\s*(?P<col>\w+)"
    r"\s*(?P<op><=|>=|==|=|<|>)\s*(?P<rhs>.+?)\s*$",
    re.DOTALL,
)
_IN_RE = re.compile(
    r"^\s*(?P<col>\w+)\s+IN\s*\((?P<list>[^()]*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _compile_clauses(where: str) -> list[tuple] | None:
    """Try to compile a WHERE string into the engine's ``(col, op,
    value)`` clause tuples — the stats fast path.  Returns None when
    the predicate is richer than a top-level AND of ``col op literal``
    / ``col IN (literals)``; the caller then uses the raw-SQL path."""
    if _find_top(where, "OR") != -1 or _find_top(where, "NOT") != -1:
        return None
    clauses: list[tuple] = []
    for term in _split_top(where, r"\s+AND\s+"):
        m = _IN_RE.match(term)
        if m:
            try:
                vals = tuple(
                    _literal(v) for v in _split_top(m.group("list"), r",")
                )
            except ValueError:
                return None
            clauses.append((m.group("col"), "in", vals))
            continue
        m = _TERM_RE.match(term)
        if not m:
            return None
        try:
            val = _literal(m.group("rhs"))
        except ValueError:
            return None
        op = "=" if m.group("op") == "==" else m.group("op")
        clauses.append((m.group("col"), op, val))
    return clauses or None


#: literal python type -> the schema types a compiled clause may
#: compare it against.  Everything else (a quoted string against a
#: timestamp/date column, a number against a string, any bool/complex
#: column) falls back to the raw-SQL path: the engine's stats are
#: stored in a normalized form whose ordering only matches the
#: literal's when the types line up — a mismatched compiled clause
#: could PRUNE a file that holds matching rows (silent row loss),
#: while the raw path merely costs the pruning.
_NUMERIC = {"byte", "short", "integer", "long", "float", "double"}


def _clauses_typed_ok(clauses: list[tuple], path: str) -> bool:
    import json as _json

    schema_json = tx._current_schema(path)
    if schema_json is None:
        return False
    fields = {
        f["name"]: f["type"]
        for f in _json.loads(schema_json).get("fields", [])
    }
    for col, op, val in clauses:
        t = fields.get(col)
        if not isinstance(t, str):
            return False
        if op in ("isnull", "notnull"):
            continue
        vals = val if op == "in" else (val,)
        for v in vals:
            if isinstance(v, bool):
                return False
            if isinstance(v, str):
                if t != "string":
                    return False
            elif isinstance(v, (int, float)):
                if t not in _NUMERIC and not t.startswith("decimal"):
                    return False
            else:
                return False
    return True


def _where_arg(where: str | None, path: str):
    if where is None:
        return None
    clauses = _compile_clauses(where)
    if clauses and _clauses_typed_ok(clauses, path):
        return clauses
    return where


def _assignments(s: str) -> dict:
    out: dict[str, str] = {}
    for part in _split_top(s, r","):
        m = re.match(r"^\s*(\w+)\s*=\s*(.+?)\s*$", part, re.DOTALL)
        if not m:
            raise ValueError(f"tx_sql: cannot parse assignment {part!r}")
        out[m.group(1)] = m.group(2)
    if not out:
        raise ValueError("tx_sql: empty SET list")
    return out


# ------------------------------------------------------------ routing


def tx_sql(spark: SparkSession, stmt: str):
    """Execute one SQL statement against registered transactional
    tables.  DML returns the committed version (int); SELECT/WITH
    returns the DataFrame from ``spark.sql`` over the registered
    snapshot views."""
    s = stmt.strip().rstrip(";").strip()
    kw = s.split(None, 1)[0].upper() if s else ""
    if kw in ("SELECT", "WITH"):
        return spark.sql(s)
    if kw == "DELETE":
        return _delete(spark, s)
    if kw == "UPDATE":
        return _update(spark, s)
    if kw == "INSERT":
        return _insert(spark, s)
    if kw == "MERGE":
        return _merge(spark, s)
    raise ValueError(
        f"tx_sql: unsupported statement kind {kw!r} — supported: "
        "SELECT/WITH, DELETE FROM, UPDATE, INSERT INTO, MERGE INTO"
    )


def _delete(spark: SparkSession, s: str) -> int:
    m = re.match(
        r"^DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"tx_sql: cannot parse DELETE: {s!r}")
    name, where = m.group(1), m.group(2)
    path = _resolve(name)
    v = tx.tx_delete(spark, path, _where_arg(where, path) or "true")
    _refresh(spark, name)
    return v


def _update(spark: SparkSession, s: str) -> int:
    i_set = _find_top(s, "SET")
    if i_set == -1:
        raise ValueError(f"tx_sql: UPDATE without SET: {s!r}")
    head = s[:i_set]
    m = re.match(r"^UPDATE\s+(\w+)\s*$", head, re.IGNORECASE)
    if not m:
        raise ValueError(f"tx_sql: cannot parse UPDATE target: {head!r}")
    name = m.group(1)
    rest = s[i_set + 3:]
    i_where = _find_top(rest, "WHERE")
    assigns = _assignments(rest if i_where == -1 else rest[:i_where])
    where = None if i_where == -1 else rest[i_where + 5:].strip()
    path = _resolve(name)
    v = tx.tx_update(spark, path, set=assigns, where=_where_arg(where, path))
    _refresh(spark, name)
    return v


def _insert(spark: SparkSession, s: str) -> int:
    m = re.match(
        r"^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\)\s*)?"
        r"(SELECT\s.*|VALUES\s.*|WITH\s.*|TABLE\s.*)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"tx_sql: cannot parse INSERT: {s!r}")
    name, collist, body = m.group(1), m.group(2), m.group(3)
    path = _resolve(name)
    if body.upper().startswith("VALUES"):
        df = spark.sql("SELECT * FROM " + body)
    else:
        df = spark.sql(body)
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    schema_json = tx._current_schema(path)
    if schema_json is None:
        raise ValueError(f"tx_sql: INSERT into a table with no commits: {path}")
    target = StructType.fromJson(_json.loads(schema_json))
    names = [f.name for f in target.fields]
    if collist:
        given = [c.strip() for c in collist.split(",")]
        unknown = [c for c in given if c not in names]
        if unknown:
            raise ValueError(
                f"tx_sql: INSERT column(s) {unknown} not in {names}"
            )
        if len(df.columns) != len(given):
            raise ValueError(
                f"tx_sql: INSERT provides {len(df.columns)} values for "
                f"{len(given)} named columns"
            )
        renamed = df.toDF(*given)
        cols = []
        for f in target.fields:
            if f.name in given:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        df = renamed.select(*cols)
    else:
        if len(df.columns) != len(names):
            raise ValueError(
                f"tx_sql: INSERT provides {len(df.columns)} columns, the "
                f"table has {len(names)} — name the columns to null-fill"
            )
        df = df.toDF(*names).select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in target.fields]
        )
    v = tx.tx_append(df, path)
    _refresh(spark, name)
    return v


def _scope(expr: str, t_alias: str, s_alias: str) -> str:
    """Rewrite ``alias.col`` references to the engine's canonical
    ``target.`` / ``source.`` scoping — in ONE pass, so an alias that
    happens to be the literal word ``target``/``source`` (or one
    rewrite's output matching the other's pattern) cannot be rewritten
    twice.  (Substitution is textual: it also fires inside string
    literals, like Delta's own error-prone spots — keep aliases out of
    quoted strings.)"""
    mapping = {t_alias: "target.", s_alias: "source."}
    pat = re.compile(
        rf"\b({re.escape(t_alias)}|{re.escape(s_alias)})\."
    )
    return pat.sub(lambda m: mapping[m.group(1)], expr)


_WHEN_M = re.compile(
    r"^MATCHED\s*(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+"
    r"(?P<act>UPDATE\s+SET\s+(?P<set>.*)|DELETE)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_NM = re.compile(
    r"^NOT\s+MATCHED\s*(?:BY\s+TARGET\s*)?(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+"
    r"INSERT\s*(?P<ins>\*)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_NMBS = re.compile(
    r"^NOT\s+MATCHED\s+BY\s+SOURCE\s*(?:AND\s+(?P<cond>.*?)\s+)?THEN\s+"
    r"(?P<act>UPDATE\s+SET\s+(?P<set>.*)|DELETE)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _merge(spark: SparkSession, s: str) -> int:
    i_using = _find_top(s, "USING")
    i_on = _find_top(s, "ON", i_using)
    i_when = _find_top(s, "WHEN", i_on)
    if min(i_using, i_on, i_when) == -1:
        raise ValueError(f"tx_sql: MERGE needs USING ... ON ... WHEN ...: {s!r}")
    m = re.match(
        r"^MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s*$",
        s[:i_using], re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"tx_sql: cannot parse MERGE target: {s[:i_using]!r}")
    name, t_alias = m.group(1), m.group(2) or m.group(1)
    src_part = s[i_using + 5:i_on].strip()
    ms = re.match(
        r"^(\(.*\)|\w+)(?:\s+AS)?(?:\s+(\w+))?\s*$",
        src_part, re.IGNORECASE | re.DOTALL,
    )
    if not ms:
        raise ValueError(f"tx_sql: cannot parse MERGE source: {src_part!r}")
    src_rel, s_alias = ms.group(1), ms.group(2)
    if src_rel.startswith("("):
        if not s_alias:
            raise ValueError("tx_sql: a MERGE subquery source needs an alias")
        source = spark.sql(src_rel[1:-1])
    else:
        s_alias = s_alias or src_rel
        if src_rel in _REGISTRY:
            _refresh(spark, src_rel)
        source = spark.table(src_rel)
    on = s[i_on + 2:i_when].strip()
    keys: list[str] = []
    for term in _split_top(on, r"\s+AND\s+"):
        mk = re.match(
            rf"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", term
        )
        if not mk or {mk.group(1), mk.group(3)} != {t_alias, s_alias} \
                or mk.group(2) != mk.group(4):
            raise ValueError(
                "tx_sql: MERGE ON must be a conjunction of "
                f"{t_alias}.k = {s_alias}.k equalities on same-named key "
                f"columns; cannot use {term!r}"
            )
        keys.append(mk.group(2))
    kw: dict = {}
    for clause in _split_top(s[i_when:], r"\s*\bWHEN\b\s*")[1:]:
        clause = clause.strip()
        mm = _WHEN_M.match(clause)
        if mm:
            cond = mm.group("cond")
            cond = _scope(cond, t_alias, s_alias) if cond else None
            if mm.group("set") is not None:
                st = mm.group("set").strip()
                if st == "*":
                    kw["when_matched_update"] = "all"
                else:
                    kw["when_matched_update"] = {
                        c: _scope(e, t_alias, s_alias)
                        for c, e in _assignments(st).items()
                    }
                if cond:
                    kw["when_matched_update_condition"] = cond
            else:
                kw["when_matched_delete"] = cond or True
            continue
        mn = _WHEN_NM.match(clause)
        if mn:
            cond = mn.group("cond")
            kw["when_not_matched_insert"] = (
                _scope(cond, t_alias, s_alias) if cond else True
            )
            continue
        mb = _WHEN_NMBS.match(clause)
        if mb:
            cond = mb.group("cond")
            cond = _scope(cond, t_alias, s_alias) if cond else None
            if mb.group("set") is not None:
                kw["when_not_matched_by_source_update"] = {
                    c: _scope(e, t_alias, s_alias)
                    for c, e in _assignments(mb.group("set")).items()
                }
                if cond:
                    kw["when_not_matched_by_source_condition"] = cond
            else:
                # the delete form carries its condition inline
                # (txtable's Delta-shaped signature)
                kw["when_not_matched_by_source_delete"] = cond or True
            continue
        raise ValueError(f"tx_sql: cannot parse MERGE clause: WHEN {clause!r}")
    path = _resolve(name)
    v = tx.tx_merge(spark, path, source, on=keys, **kw)
    _refresh(spark, name)
    return v
