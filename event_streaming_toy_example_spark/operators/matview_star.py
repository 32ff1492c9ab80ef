"""Incrementally-maintained MATERIALIZED VIEWS over an N-WAY STAR
equi-join (VERDICT r10 item 2 — the recursive/DBToaster extension of
``operators/matview_join.py``'s two-sided factorization).

``tx_create_matview_star`` materializes

    SELECT g_fact..., g_d1..., g_dn..., aggs...
    FROM fact JOIN d1 ON k1 JOIN d2 ON k2 ... [each side pre-filtered]
    GROUP BY g_fact..., g_d1..., g_dn...

as a transactional table and ``tx_refresh_matview_star`` advances it
from EVERY source's row-level change feed without re-reading any
source table.  The state is one sidecar summary table per side:

- fact state ``SF``: per (all dim join keys, fact group cols) — row
  count plus running sum / non-null count for every fact-side
  aggregate input;
- dim state ``Si``: per (its own join keys, its group cols) — the
  same summary over that dimension.

Every distributive aggregate factors through the star's keys::

    count(*)(g...)   = Σ_k  cnt_f(k, gf) · Π_i cnt_i(k_i, g_i)
    sum(f.x)(g...)   = Σ_k  sum_f_x · Π_i cnt_i
    sum(d_j.y)(g...) = Σ_k  cnt_f · sum_j_y · Π_{i≠j} cnt_i

so a refresh is the telescoping N-term delta (sides ordered fact,
d1, ..., dn; primed = post-delta)::

    Δview = ΔSF ⋈ S1 ⋈ ... ⋈ Sn
          + SF′ ⋈ ΔS1 ⋈ S2 ⋈ ... ⋈ Sn
          + SF′ ⋈ S1′ ⋈ ΔS2 ⋈ ... ⋈ Sn
          + ...

with each ΔSi built from commit change frames alone (removed rows
weigh −1, added +1).  Work per refresh: O(changed rows) for the
deltas, one keyed join of each (small, broadcast) delta against the
other sides' metadata-scale states, one O(affected groups) MERGE.
No source table is ever opened — the catalog entry spy-asserts it.

Pre-join FILTERS: each side may declare a SQL predicate in the view
spec; it applies to the side's rows at create AND to its change
frames at refresh (a per-row filter commutes with the multiset
delta).  A filter may reference only that side's key / group /
aggregate columns — validated loudly at create, because the refresh
reads exactly those columns from the feed.

Exactly-once across N+2 tables: the applied version VECTOR packs into
one monotone token with ``60 // n_sides`` bits per side (a refresh
advances at least one side, so the pack strictly increases; versions
beyond the per-side cap raise BY NAME — the documented trade for
riding the engine's integer stream-transaction floors).  The view
MERGE lands first, then each state, all under the same token; the
repair pass re-runs exactly the missing suffix after a crash.

``min``/``max`` (round 12, like the two-sided module) switch the
refresh to RECOMPUTE-AFFECTED-GROUPS mode: per-cell extrema in the
side states merge monotonically for append-only windows (O(delta),
source-free), removal-touched cells pay a bounded per-cell source
rescan, and the reachable view groups recompute from the post-delta
states with the create-time expression.  The reference has
nothing comparable; the algorithm is the standard higher-order
DBToaster delta re-expressed on this engine's commit log.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import txtable as tx
from .matview_join import (
    _has_minmax,
    _key_ok,
    _merge_states,
    _mm_cols,
    _mm_products,
    _state_aggs,
    _tagged,
    _weighted_delta_rows,
    _z,
)

_APP = "matview_star"


def _bits_for(n_sides: int) -> int:
    return 60 // n_sides


def _pack(versions: Sequence[int], bits: int) -> int:
    token = 0
    cap = 1 << bits
    for v in versions:
        if v >= cap:
            raise ValueError(
                f"matview_star: source version {v} exceeds the "
                f"{cap - 1} cap of the packed watermark "
                f"({bits} bits per side at this arity)"
            )
        token = (token << bits) | v
    return token


def _unpack(token: int, n: int, bits: int) -> list[int]:
    out = []
    for i in range(n):
        out.append((token >> ((n - 1 - i) * bits)) & ((1 << bits) - 1))
    return out


def _parse_star_aggs(aggs: dict, sides: Sequence[str]) -> dict:
    """{out: (fn, side, col)} with fn in count/sum/avg/min/max;
    count('*') carries side None; side must be a declared side name.
    min/max (round 12) switch the refresh to the same
    recompute-affected-groups mode the two-sided module uses."""
    out: dict = {}
    for name, (fn, ref) in aggs.items():
        if fn == "count" and ref == "*":
            out[name] = ("count", None, None)
            continue
        if fn not in ("sum", "avg", "count", "min", "max"):
            raise ValueError(
                f"matview_star: unsupported aggregate {fn!r} for {name!r}"
            )
        parts = ref.split(".", 1)
        if len(parts) != 2 or parts[0] not in sides:
            raise ValueError(
                f"matview_star: qualify the aggregate input by side — "
                f"one of {list(sides)} (got {ref!r})"
            )
        out[name] = (fn, parts[0], parts[1])
    return out


def _side_cols(parsed: dict, side: str) -> list[str]:
    return sorted({
        c for fn, s, c in parsed.values()
        if s == side and fn in ("count", "sum", "avg")
    })


def _on_pairs(on) -> list[tuple[str, str]]:
    """Normalize a dim's ``on`` spec: each entry is a same-named
    column (str) or a ``(fact_col, dim_col)`` pair.  The FACT name is
    the canonical key name everywhere (states, view plan)."""
    out = []
    for e in on:
        if isinstance(e, str):
            out.append((e, e))
        else:
            f, d = e
            out.append((str(f), str(d)))
    if not out:
        raise ValueError("matview_star: a dim needs at least one join key")
    return out


def _products_star(parsed: dict, sides: Sequence[str]):
    """Per-joined-row contribution columns: each aggregate multiplies
    its OWN side's summary by every OTHER side's count."""
    cnts = {s: _z(f"__cnt_{s}") for s in sides}
    all_prod = None
    for s in sides:
        all_prod = cnts[s] if all_prod is None else all_prod * cnts[s]
    out = [all_prod.alias("__d_rows")]
    for name, (_fn, side, col) in parsed.items():
        if side is None:
            continue  # count(*): carried by __d_rows
        if _fn in ("min", "max"):
            continue  # extrema travel via _mm_products, not products
        others = None
        for s in sides:
            if s == side:
                continue
            others = cnts[s] if others is None else others * cnts[s]
        if others is None:
            others = F.lit(1)
        s_ = _z(f"__sum_{col}_{side}")
        n_ = _z(f"__cntnn_{col}_{side}")
        out.append((s_ * others).alias(f"__d_sum_{name}"))
        out.append((n_ * others).cast("long").alias(f"__d_cnt_{name}"))
    return out


def _sum_deltas_star(df: DataFrame, groups: Sequence[str],
                     parsed: dict) -> DataFrame:
    return df.groupBy(*groups).agg(
        F.sum("__d_rows").cast("long").alias("__d_rows"),
        *[
            e
            for name, (fn, s, _c) in parsed.items()
            if s is not None and fn in ("count", "sum", "avg")
            for e in (
                F.sum(f"__d_sum_{name}").alias(f"__d_sum_{name}"),
                F.sum(f"__d_cnt_{name}").cast("long")
                .alias(f"__d_cnt_{name}"),
            )
        ],
        *[
            (F.min if fn == "min" else F.max)(f"__d_{fn}_{name}")
            .alias(name)
            for name, (fn, _s, _c) in parsed.items()
            if fn in ("min", "max")
        ],
    )


def _finalize_star(parsed: dict, rows_col, sum_of, cnt_of):
    cols = []
    for name, (fn, side, _col) in parsed.items():
        if side is None:
            cols.append(rows_col.cast("long").alias(name))
            continue
        if fn in ("min", "max"):
            continue  # no internal sum/cnt pair: recompute paths emit
        s, c = sum_of(name), cnt_of(name).cast("long")
        if fn == "count":
            cols.append(c.alias(name))
        elif fn == "sum":
            cols.append(F.when(c > 0, s).alias(name))
        else:  # avg
            cols.append(F.when(c > 0, s / c).alias(name))
        cols.append(s.alias(f"__sum_{name}"))
        cols.append(c.alias(f"__cnt_{name}"))
    return cols


def _group_rollup_star(
    joined: DataFrame, all_groups: Sequence[str], parsed: dict,
    side_names: Sequence[str],
) -> DataFrame:
    """FULL per-group view rows from a join of every side's state —
    shared by create and the minmax-mode refresh recompute (the star
    twin of matview_join._group_rollup)."""
    per_group = _sum_deltas_star(
        joined.select(
            *all_groups,
            *_products_star(parsed, side_names),
            *_mm_products(parsed),
        ),
        all_groups, parsed,
    )
    return per_group.select(
        *all_groups,
        *_finalize_star(
            parsed,
            F.col("__d_rows"),
            lambda n: _z(f"__d_sum_{n}"),
            lambda n: _z(f"__d_cnt_{n}"),
        ),
        *[
            F.col(name)
            for name, (fn, _s, _c) in parsed.items()
            if fn in ("min", "max")
        ],
        F.col("__d_rows").cast("long").alias("__rows"),
    )


def _apply_filter(df: DataFrame, expr: str | None) -> DataFrame:
    return df.where(F.expr(expr)) if expr else df


def _validate_filter(spark: SparkSession, filt: str | None, schema,
                     side: str) -> None:
    """A pre-join filter may reference ONLY the side's declared
    key/group/aggregate columns: the refresh evaluates it over change
    frames that carry exactly those.  Resolution is probed against a
    LINEAGE-FREE empty frame — probing the projected source would let
    Spark's hidden-column resolution silently reach pruned source
    columns the feed can never supply."""
    if not filt:
        return
    from pyspark.errors import AnalysisException

    try:
        spark.createDataFrame([], schema).where(F.expr(filt)).schema
    except AnalysisException as e:
        raise ValueError(
            f"matview_star: the filter for side {side!r} "
            f"({filt!r}) must reference only that side's declared "
            f"key/group/aggregate columns "
            f"{[f.name for f in schema.fields]}"
        ) from e


def _dim_projected(spark: SparkSession, d: dict, cols_agg: Sequence[str],
                   filt: str | None) -> DataFrame:
    """A dim source read projected to (canonical keys, groups, agg
    cols), filter applied, key-null rows excluded."""
    pairs = [tuple(p) for p in d["on"]]
    df = tx.read_table(spark, d["src"]).select(
        *[F.col(dc).alias(fc) for fc, dc in pairs],
        *d["group_by"],
        *[c for c in cols_agg if c not in d["group_by"]],
    )
    keys = [fc for fc, _dc in pairs]
    return _apply_filter(df, filt).where(_key_ok(keys))


def _check_group_nulls(df: DataFrame, groups: Sequence[str],
                       side: str) -> None:
    for g in groups:
        if df.where(F.col(g).isNull()).limit(1).count():
            raise ValueError(
                f"matview_star: NULL group-by key {g!r} on side "
                f"{side!r} — the refresh MERGE cannot address a NULL "
                "group"
            )


def tx_create_matview_star(
    spark: SparkSession,
    dst: str,
    fact: str,
    dims: Sequence[dict],
    aggs: dict,
    group_by_fact: Sequence[str] = (),
    filters: dict | None = None,
) -> int:
    """Materialize the grouped star join and its factorized per-side
    states; record the maintenance spec in the view's properties.

    ``dims``: sequence of ``{"name", "src", "on", "group_by"}`` — "on"
    entries are same-named columns or ``(fact_col, dim_col)`` pairs;
    ``aggs`` maps output column → ``(fn, ref)`` with ref ``"*"`` or
    ``"<side>.col"`` (side = ``"fact"`` or a dim name); ``filters``
    maps side → SQL predicate over that side's declared columns.
    Returns the view table's committed version."""
    dims = [dict(d) for d in dims]
    for d in dims:
        d["on"] = _on_pairs(d["on"])
        d["group_by"] = list(d.get("group_by") or ())
    names = [d["name"] for d in dims]
    if len(set(names)) != len(names) or "fact" in names:
        raise ValueError(
            f"matview_star: dim names must be unique and not 'fact' "
            f"(got {names})"
        )
    if not dims:
        raise ValueError("matview_star: at least one dimension")
    sides = ["fact"] + names
    parsed = _parse_star_aggs(aggs, sides)
    filters = dict(filters or {})
    unknown = set(filters) - set(sides)
    if unknown:
        raise ValueError(f"matview_star: filters for unknown sides {unknown}")
    group_by_fact = list(group_by_fact)
    all_groups = list(group_by_fact)
    for d in dims:
        all_groups.extend(d["group_by"])
    if not all_groups:
        raise ValueError("matview_star: at least one group-by column")
    if len(set(all_groups)) != len(all_groups):
        raise ValueError(
            "matview_star: group columns must be disjoint across sides "
            f"(got {all_groups})"
        )
    if tx.table_version(dst):
        raise ValueError(
            f"matview_star: destination already has commits: {dst}"
        )
    versions = {"fact": tx.table_version(fact)}
    for d in dims:
        versions[d["name"]] = tx.table_version(d["src"])
    if not all(versions.values()):
        raise ValueError("matview_star: every source needs commits")
    bits = _bits_for(len(sides))
    fact_keys: list[str] = []
    for d in dims:
        for fc, _dc in d["on"]:
            if fc not in fact_keys:
                fact_keys.append(fc)
    state_paths = {"fact": dst + "__sf"}
    for i, d in enumerate(dims):
        state_paths[d["name"]] = dst + f"__sd{i}"
    # a crashed earlier create may have left partial state tables
    # behind (dst has no commits, so they are orphans) — restart clean
    import shutil

    for st in state_paths.values():
        if tx.table_version(st):
            shutil.rmtree(st, ignore_errors=True)
            tx.invalidate_fold_memo(st)
    cols_f = _side_cols(parsed, "fact")
    mm_f = _mm_cols(parsed, "fact")
    # project EVERY side to its declared (key/group/aggregate) columns
    # BEFORE applying its filter: the refresh reads exactly those
    # columns from the feed, so a filter referencing anything else must
    # fail HERE, loudly, not at the first refresh
    f_df = tx.read_table(spark, fact).select(
        *dict.fromkeys(fact_keys + group_by_fact + cols_f + mm_f)
    )
    _validate_filter(spark, filters.get("fact"), f_df.schema, "fact")
    f_df = _apply_filter(f_df, filters.get("fact")).where(
        _key_ok(fact_keys)
    )
    _check_group_nulls(f_df, group_by_fact, "fact")
    tx.tx_append(
        f_df.groupBy(*fact_keys, *group_by_fact).agg(
            *_state_aggs(cols_f, mm_f)
        ),
        state_paths["fact"],
    )
    for d in dims:
        cols_d = _side_cols(parsed, d["name"])
        mm_d = _mm_cols(parsed, d["name"])
        dd = _dim_projected(
            spark, d, sorted(set(cols_d) | set(mm_d)), None
        )
        _validate_filter(
            spark, filters.get(d["name"]), dd.schema, d["name"]
        )
        dd = _apply_filter(dd, filters.get(d["name"]))
        _check_group_nulls(dd, d["group_by"], d["name"])
        keys = [fc for fc, _dc in d["on"]]
        tx.tx_append(
            dd.groupBy(*keys, *d["group_by"]).agg(
                *_state_aggs(cols_d, mm_d)
            ),
            state_paths[d["name"]],
        )
    joined = _tagged(
        tx.read_table(spark, state_paths["fact"]),
        fact_keys + group_by_fact,
        "fact",
    )
    for d in dims:
        keys = [fc for fc, _dc in d["on"]]
        joined = joined.join(
            _tagged(
                tx.read_table(spark, state_paths[d["name"]]),
                keys + d["group_by"],
                d["name"],
            ),
            keys,
        )
    view = _group_rollup_star(joined, all_groups, parsed, sides)
    spec = {
        "fact": os.path.abspath(fact),
        "state_fact": os.path.abspath(state_paths["fact"]),
        "dims": [
            {
                "name": d["name"],
                "src": os.path.abspath(d["src"]),
                "state": os.path.abspath(state_paths[d["name"]]),
                "on": [list(p) for p in d["on"]],
                "group_by": d["group_by"],
            }
            for d in dims
        ],
        "group_by_fact": group_by_fact,
        "aggs": {k: list(v) for k, v in aggs.items()},
        "filters": filters,
        "bases": versions,
        "bits": bits,
    }
    return tx.tx_append(view, dst, properties={"__matview_star": spec})


def _spec(dst: str) -> dict:
    spec = (tx.table_properties(dst) or {}).get("__matview_star")
    if not spec:
        raise ValueError(f"matview_star: {dst} is not a star matview")
    return spec


def _side_defs(spec: dict) -> list[dict]:
    """Uniform per-side descriptors, fact first (the telescoping
    order): name, src, state, canonical keys, source-name column map,
    group cols."""
    out = [
        {
            "name": "fact",
            "src": spec["fact"],
            "state": spec["state_fact"],
            "keys": [
                fc
                for d in spec["dims"]
                for fc, _dc in (tuple(p) for p in d["on"])
            ],
            "colmap": {},  # fact columns are already canonical
            "group": list(spec["group_by_fact"]),
        }
    ]
    # dedup fact keys, order-stable
    seen: list[str] = []
    for k in out[0]["keys"]:
        if k not in seen:
            seen.append(k)
    out[0]["keys"] = seen
    for d in spec["dims"]:
        pairs = [tuple(p) for p in d["on"]]
        out.append(
            {
                "name": d["name"],
                "src": d["src"],
                "state": d["state"],
                "keys": [fc for fc, _dc in pairs],
                "colmap": {fc: dc for fc, dc in pairs},
                "group": list(d["group_by"]),
            }
        )
    return out


def matview_star_lag(dst: str) -> tuple[dict, dict]:
    """({side: applied version}, {side: current version})."""
    spec = _spec(dst)
    sides = _side_defs(spec)
    n, bits = len(sides), int(spec["bits"])
    token = tx.last_committed_batch(dst, _APP)
    if token is None:
        applied = dict(spec["bases"])
    else:
        vec = _unpack(token, n, bits)
        applied = {s["name"]: vec[i] for i, s in enumerate(sides)}
    current = {s["name"]: tx.table_version(s["src"]) for s in sides}
    return applied, current


def _sdf_star(
    spark: SparkSession,
    side: dict,
    lo: int,
    hi: int,
    cols_needed: Sequence[str],
    filt: str | None,
) -> DataFrame | None:
    """One side's weighted change rows, canonicalized: feed columns
    renamed to fact names, the side's pre-join filter applied (to old
    and new rows alike — a per-row filter commutes with the multiset
    delta), NULL join keys dropped, NULL group keys refused."""
    src_cols = list(
        dict.fromkeys(
            side["colmap"].get(c, c)
            for c in side["keys"] + side["group"] + list(cols_needed)
        )
    )
    sdf = _weighted_delta_rows(spark, side["src"], lo, hi, src_cols)
    if sdf is None:
        return None
    for fc, dc in side["colmap"].items():
        if fc != dc:
            sdf = sdf.withColumnRenamed(dc, fc)
    sdf = _apply_filter(sdf, filt).where(_key_ok(side["keys"]))
    _check_group_nulls(sdf, side["group"], side["name"])
    return sdf


def _delta_state_star(
    spark: SparkSession,
    side: dict,
    lo: int,
    hi: int,
    cols_agg: Sequence[str],
    filt: str | None,
    state_schema,
    sdf: DataFrame | None = None,
) -> DataFrame | None:
    """Signed per-(key, group) summary of one side's change window —
    the star twin of matview_join's _delta_state, adding the dim
    column RENAME (feed columns carry source names) and the side's
    pre-join filter.  The weighted rows come from the shared two-path
    builder (driver pandas for steady deltas, executor-parallel past
    DIST_DELTA_ROWS), or from a prebuilt ``sdf``."""
    if sdf is None:
        sdf = _sdf_star(spark, side, lo, hi, cols_agg, filt)
    if sdf is None:
        return None
    w = F.col("__w")
    exprs = [F.sum(w).cast("long").alias("__cnt")]
    for c in cols_agg:
        exprs.append(F.sum(w * F.col(c)).alias(f"__sum_{c}"))
        exprs.append(
            F.sum(F.when(F.col(c).isNotNull(), w).otherwise(0))
            .cast("long")
            .alias(f"__cntnn_{c}")
        )
    d = sdf.groupBy(*side["keys"], *side["group"]).agg(*exprs)
    types = {f.name: f.dataType for f in state_schema.fields}
    return d.select(
        *[F.col(c).cast(types[c]).alias(c) for c in d.columns]
    )


def _new_state_star_mm(
    spark: SparkSession,
    side: dict,
    lo: int,
    hi: int,
    sum_cols: Sequence[str],
    mm_cols: Sequence[str],
    filt: str | None,
    old: DataFrame,
) -> tuple[DataFrame, DataFrame | None]:
    """(post-window state expression, canonicalized weighted rows or
    None) for one side of a minmax star view — the star twin of
    matview_join._new_state_mm: sums merge algebraically, extrema
    merge monotonically from added rows, removal-touched cells
    recompute from the side's source at the window end (projected,
    renamed, and filtered exactly like create)."""
    keys = list(side["keys"]) + list(side["group"])
    sdf = _sdf_star(
        spark, side, lo, hi, sorted(set(sum_cols) | set(mm_cols)), filt
    )
    if sdf is None:
        return old, None
    d = _delta_state_star(
        spark, side, lo, hi, sum_cols, filt, old.schema, sdf=sdf
    )
    pieces = [old, d]
    if mm_cols:
        pieces.append(
            sdf.where(F.col("__w") > 0)
            .groupBy(*keys)
            .agg(
                *[F.min(c).alias(f"__min_{c}") for c in mm_cols],
                *[F.max(c).alias(f"__max_{c}") for c in mm_cols],
            )
        )
    u = pieces[0]
    for pc in pieces[1:]:
        u = u.unionByName(pc, allowMissingColumns=True)
    plain = [
        c for c in old.columns
        if c not in keys
        and not c.startswith("__min_")
        and not c.startswith("__max_")
    ]
    merged = (
        u.groupBy(*keys)
        .agg(
            *[F.sum(c).alias(c) for c in plain],
            *[F.min(f"__min_{c}").alias(f"__min_{c}") for c in mm_cols],
            *[F.max(f"__max_{c}").alias(f"__max_{c}") for c in mm_cols],
        )
        .where(F.col("__cnt") > 0)
        .select(*old.columns)
    )
    rem_cells = sdf.where(F.col("__w") < 0).select(*keys).distinct()
    if rem_cells.limit(1).count():
        src_cols = list(
            dict.fromkeys(
                side["colmap"].get(c, c)
                for c in keys + sorted(set(sum_cols) | set(mm_cols))
            )
        )
        base = tx.read_table(spark, side["src"], version=hi).select(
            *src_cols
        )
        for fc, dc in side["colmap"].items():
            if fc != dc:
                base = base.withColumnRenamed(dc, fc)
        base = _apply_filter(base, filt).where(_key_ok(side["keys"]))
        recomputed = (
            base.join(rem_cells, keys, "left_semi")
            .groupBy(*keys)
            .agg(*_state_aggs(sum_cols, mm_cols))
        )
        types = {f.name: f.dataType for f in old.schema.fields}
        recomputed = recomputed.select(
            *[F.col(c).cast(types[c]).alias(c) for c in old.columns]
        )
        merged = (
            merged.join(rem_cells, keys, "left_anti")
            .unionByName(recomputed)
        )
    return merged, sdf


def _refresh_minmax_star(
    spark, dst, spec, sides, parsed, filters, applied, current, bits
) -> int:
    """Refresh path for star views with min/max aggregates: advance
    every side state as an expression (monotone extrema merges for
    append-only windows, bounded per-cell source rescans under
    removals), collect every view group the changed cells can reach
    through the star join (via BOTH pre- and post-delta other sides),
    and recompute exactly those groups from the post-delta states with
    the create-time expression.  Exactly-once under the same packed
    N-version token and merge order as the algebraic path."""
    token = _pack([current[s["name"]] for s in sides], bits)
    side_names = [s["name"] for s in sides]
    all_groups: list[str] = []
    for s in sides:
        all_groups.extend(s["group"])
    olds = {s["name"]: tx.read_table(spark, s["state"]) for s in sides}
    news, sdfs = {}, {}
    for s in sides:
        name = s["name"]
        news[name], sdfs[name] = _new_state_star_mm(
            spark, s, applied[name], current[name],
            _side_cols(parsed, name), _mm_cols(parsed, name),
            filters.get(name), olds[name],
        )
    if all(v is None for v in sdfs.values()):
        view_schema = tx.read_table(spark, dst).schema
        v = tx.tx_merge(
            spark, dst, spark.createDataFrame([], view_schema),
            on=all_groups,
            when_matched_update="all",
            when_not_matched_insert=True,
            stream_txn=(_APP, token),
        )
        _advance_states(spark, spec, sides, parsed, filters, token)
        return v

    def _star_join(rels: dict) -> DataFrame:
        joined = _tagged(
            rels["fact"], sides[0]["keys"] + sides[0]["group"], "fact"
        )
        for t in sides[1:]:
            joined = joined.join(
                _tagged(
                    rels[t["name"]], t["keys"] + t["group"], t["name"]
                ),
                t["keys"],
            )
        return joined

    pairs = []
    for s in sides:
        name = s["name"]
        if sdfs[name] is None:
            continue
        cells = sdfs[name].select(*s["keys"], *s["group"]).distinct()
        for states in (olds, news):
            rels = {t["name"]: states[t["name"]] for t in sides}
            rels[name] = cells
            pairs.append(_star_join(rels).select(*all_groups))
    affected = pairs[0]
    for p in pairs[1:]:
        affected = affected.unionByName(p)
    affected = affected.distinct()
    joined_new = _star_join(news).join(affected, all_groups, "left_semi")
    recomputed = _group_rollup_star(
        joined_new, all_groups, parsed, side_names
    )
    val_cols = [c for c in recomputed.columns if c not in all_groups]
    src_df = (
        affected.join(recomputed, all_groups, "left")
        .select(
            *all_groups,
            *[F.col(c) for c in val_cols],
            F.col("__rows").isNull().alias("__dead"),
        )
    )
    v = tx.tx_merge(
        spark, dst, src_df,
        on=all_groups,
        when_matched_delete="source.__dead",
        when_matched_update="all",
        when_not_matched_insert="NOT source.__dead",
        stream_txn=(_APP, token),
    )
    _advance_states(spark, spec, sides, parsed, filters, token)
    return v


def tx_refresh_matview_star(spark: SparkSession, dst: str) -> int | None:
    """Advance the view to every source's current version.  Returns
    the view's committed version, or None when already current.  No
    source table is read — only commit change feeds and the view's
    own side-state tables."""
    spec = _spec(dst)
    sides = _side_defs(spec)
    n, bits = len(sides), int(spec["bits"])
    parsed = _parse_star_aggs(
        {k: tuple(v) for k, v in spec["aggs"].items()},
        [s["name"] for s in sides],
    )
    filters = dict(spec.get("filters") or {})
    applied, current = matview_star_lag(dst)
    # repair first: catch every state up to the view's floor before
    # reading any state (no-op in the crash-free case)
    _advance_states(
        spark, spec, sides, parsed, filters,
        _pack([applied[s["name"]] for s in sides], bits),
    )
    if all(current[s["name"]] <= applied[s["name"]] for s in sides):
        return None
    if _has_minmax(parsed):
        return _refresh_minmax_star(
            spark, dst, spec, sides, parsed, filters, applied, current,
            bits,
        )
    token = _pack([current[s["name"]] for s in sides], bits)
    all_groups: list[str] = []
    for s in sides:
        all_groups.extend(s["group"])
    old_states = {
        s["name"]: tx.read_table(spark, s["state"]) for s in sides
    }
    deltas = {
        s["name"]: _delta_state_star(
            spark, s, applied[s["name"]], current[s["name"]],
            _side_cols(parsed, s["name"]), filters.get(s["name"]),
            old_states[s["name"]].schema,
        )
        for s in sides
    }
    if all(d is None for d in deltas.values()):
        # metadata-only commits: just advance the watermark
        view_schema = tx.read_table(spark, dst).schema
        v = tx.tx_merge(
            spark, dst, spark.createDataFrame([], view_schema),
            on=all_groups,
            when_matched_update="all",
            when_not_matched_insert=True,
            stream_txn=(_APP, token),
        )
        _advance_states(spark, spec, sides, parsed, filters, token)
        return v
    new_states = {
        s["name"]: _merge_states(
            old_states[s["name"]], deltas[s["name"]],
            s["keys"] + s["group"],
        )
        for s in sides
    }
    terms = []
    side_names = [s["name"] for s in sides]
    for i, s in enumerate(sides):
        if deltas[s["name"]] is None:
            continue
        # telescoping term i: NEW states before i, the delta at i,
        # OLD states after i — all joined through the fact relation
        rels = {}
        for j, t in enumerate(sides):
            if j < i:
                rels[t["name"]] = new_states[t["name"]]
            elif j == i:
                rels[t["name"]] = F.broadcast(deltas[t["name"]])
            else:
                rels[t["name"]] = old_states[t["name"]]
        joined = _tagged(
            rels["fact"], sides[0]["keys"] + sides[0]["group"], "fact"
        )
        for t in sides[1:]:
            joined = joined.join(
                _tagged(rels[t["name"]], t["keys"] + t["group"],
                        t["name"]),
                t["keys"],
            )
        terms.append(
            joined.select(*all_groups, *_products_star(parsed, side_names))
        )
    delta_view = terms[0]
    for t in terms[1:]:
        delta_view = delta_view.unionByName(t)
    d = _sum_deltas_star(delta_view, all_groups, parsed)
    cur = tx.read_table(spark, dst).join(
        F.broadcast(d.select(*all_groups).distinct()),
        all_groups, "left_semi",
    )
    merged = d.join(cur, all_groups, "left")
    new_rows = _z("__rows") + _z("__d_rows")
    out_cols = list(all_groups)
    out_cols.extend(
        _finalize_star(
            parsed,
            new_rows,
            lambda x: _z(f"__sum_{x}") + _z(f"__d_sum_{x}"),
            lambda x: _z(f"__cnt_{x}") + _z(f"__d_cnt_{x}"),
        )
    )
    out_cols.append(new_rows.cast("long").alias("__rows"))
    out_cols.append((new_rows <= 0).alias("__dead"))
    source = merged.select(*out_cols)
    v = tx.tx_merge(
        spark, dst, source,
        on=all_groups,
        when_matched_delete="source.__dead",
        when_matched_update="all",
        when_not_matched_insert="NOT source.__dead",
        stream_txn=(_APP, token),
    )
    _advance_states(spark, spec, sides, parsed, filters, token)
    return v


def _advance_states(spark, spec, sides, parsed, filters, token) -> None:
    """Bring each state table up to its component of ``token``,
    deriving its delta from ITS OWN floor (create-time states carry
    none → the spec base) under the same exactly-once token —
    self-healing for any crash point in the (view, state...) merge
    sequence, exactly like the two-sided module."""
    n, bits = len(sides), int(spec["bits"])
    targets = _unpack(token, n, bits)
    for i, s in enumerate(sides):
        floor = tx.last_committed_batch(s["state"], _APP)
        start = (
            _unpack(floor, n, bits)[i]
            if floor is not None
            else spec["bases"][s["name"]]
        )
        target = targets[i]
        if start >= target:
            continue
        keys = s["keys"] + s["group"]
        state = tx.read_table(spark, s["state"])
        mm = _mm_cols(parsed, s["name"])
        if mm:
            # extrema cannot advance algebraically: derive the merge
            # source from the post-window state expression
            new_state, sdf = _new_state_star_mm(
                spark, s, start, target, _side_cols(parsed, s["name"]),
                mm, filters.get(s["name"]), state,
            )
            if sdf is None:
                src_df = state.limit(0).select(
                    "*", F.lit(False).alias("__dead")
                )
            else:
                vals = [c for c in state.columns if c not in keys]
                src_df = (
                    sdf.select(*keys).distinct()
                    .join(new_state, keys, "left")
                    .select(
                        *keys,
                        *[F.col(c) for c in vals],
                        F.col("__cnt").isNull().alias("__dead"),
                    )
                )
            try:
                tx.tx_merge(
                    spark, s["state"], src_df,
                    on=keys,
                    when_matched_delete="source.__dead",
                    when_matched_update="all",
                    when_not_matched_insert="NOT source.__dead",
                    stream_txn=(_APP, token),
                )
            except tx.ConcurrentWriteError as e:
                if "already committed" not in str(e):
                    raise
            continue
        delta = _delta_state_star(
            spark, s, start, target, _side_cols(parsed, s["name"]),
            filters.get(s["name"]), state.schema,
        )
        if delta is None:
            src_df = state.limit(0).select(
                "*", F.lit(False).alias("__dead")
            )
        else:
            cur = state.join(
                F.broadcast(delta.select(*keys).distinct()),
                keys, "left_semi",
            )
            merged = _tagged(delta, keys, "d").join(
                _tagged(cur, keys, "s"), keys, "left"
            )
            vals = [c for c in state.columns if c not in keys]
            out_cols = list(keys)
            for c in vals:
                out_cols.append((_z(f"{c}_d") + _z(f"{c}_s")).alias(c))
            out_cols.append(
                ((_z("__cnt_d") + _z("__cnt_s")) <= 0).alias("__dead")
            )
            src_df = merged.select(*out_cols)
        try:
            tx.tx_merge(
                spark, s["state"], src_df,
                on=keys,
                when_matched_delete="source.__dead",
                when_matched_update="all",
                when_not_matched_insert="NOT source.__dead",
                stream_txn=(_APP, token),
            )
        except tx.ConcurrentWriteError as e:
            if "already committed" not in str(e):
                raise
