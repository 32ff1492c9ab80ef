"""Model-based random-walk test for the unified transactional table:
a seeded random sequence of append / upsert / compact / vacuum ops is
applied BOTH to `operators/txtable.py` and to a trivial in-memory
Python model; after every op the table must read back exactly the
model's rows, and every still-retained historical version must read
back its recorded model snapshot.

This is the transaction-log analog of the diff/upsert round-trip
property tests in tests/test_upsert.py: the model is too simple to be
wrong, so any divergence is a txtable bug (lost rows through a commit,
wrong file fold order, compaction changing content, vacuum deleting a
retained version's file, stale schema fold)."""

from __future__ import annotations

import random

import pytest

from event_streaming_toy_example_spark.operators import txtable as tx


def _read(spark, path, version=None):
    df = tx.read_table(spark, path, version)
    return sorted((r["k"], r["ts"], r["v"]) for r in df.collect())


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    p = str(tmp_path / f"t{seed}")
    clock = 0

    def fresh_rows(n):
        nonlocal clock
        out = []
        for _ in range(n):
            clock += 1
            out.append((rng.randrange(40), clock, f"s{seed}c{clock}"))
        return out

    # version -> model snapshot at that commit
    history: dict[int, list] = {}

    # create — append semantics are multiset, not keyed, so the model
    # is just the list of applied rows
    rows = fresh_rows(4)
    tx.tx_append(
        spark.createDataFrame(rows, "k int, ts int, v string"), p
    )
    applied = list(rows)
    history[tx.table_version(p)] = sorted(applied)

    def model_upsert(changes):
        """tx_upsert semantics over the multiset: rows whose key is
        NOT in the change set carry over verbatim (even duplicates
        appends introduced); changed keys collapse to newest-per-key
        across (table ∪ changes).  The clock makes every ts unique, so
        tie-break rules never engage and the model stays trivial."""
        ckeys = {k for k, _, _ in changes}
        kept = [r for r in applied if r[0] not in ckeys]
        by_key: dict[int, tuple[int, str]] = {}
        for k, ts, v in [r for r in applied if r[0] in ckeys] + list(changes):
            cur = by_key.get(k)
            if cur is None or ts > cur[0]:
                by_key[k] = (ts, v)
        return kept + [(k, ts, v) for k, (ts, v) in by_key.items()]

    for _ in range(16):
        op = rng.choice(
            [
                "append", "append", "upsert", "compact", "vacuum",
                "delete", "expire", "replace", "delete_keys", "restore",
                "rename", "merge",
            ]
        )
        if op == "restore" and history:
            # roll back to any version whose files are still retained
            # (history only holds checkable = retained versions); the
            # model state becomes that snapshot verbatim
            v = rng.choice(sorted(history))
            try:
                tx.tx_restore(p, v)
            except tx.VersionExpiredError:
                continue  # vacuumed past it: legal, loud, skip
            applied = list(history[v])
            history[tx.table_version(p)] = sorted(applied)
        elif op == "restore":
            continue  # nothing to roll back to yet
        elif op == "append":
            rows = fresh_rows(rng.randrange(1, 4))
            tx.tx_append(
                spark.createDataFrame(rows, "k int, ts int, v string").coalesce(1),
                p,
            )
            applied.extend(rows)
            history[tx.table_version(p)] = sorted(applied)
        elif op == "upsert":
            # merge-on-read is a physical strategy, not a semantic one:
            # the model is identical, so a coin flip per op composes
            # DV-bearing MERGEs with every other op in the walk
            changes = fresh_rows(rng.randrange(1, 4))
            tx.tx_upsert(
                spark,
                p,
                spark.createDataFrame(changes, "k int, ts int, v string"),
                keys=["k"],
                order_by=["ts"],
                merge_on_read=rng.random() < 0.5,
            )
            applied = model_upsert(changes)
            history[tx.table_version(p)] = sorted(applied)
        elif op == "delete":
            # predicate delete over a random key range; model = plain
            # filter (rows where the predicate holds vanish, all
            # others — including duplicates — survive verbatim).
            # merge_on_read flips per op (same model either way).
            lo = rng.randrange(40)
            tx.tx_delete(
                spark,
                p,
                [("k", ">=", lo), ("k", "<", lo + 8)],
                merge_on_read=rng.random() < 0.5,
            )
            applied = [r for r in applied if not (lo <= r[0] < lo + 8)]
            history[tx.table_version(p)] = sorted(applied)
        elif op == "replace":
            # replaceWhere over a random key range: model = drop the
            # range, add the batch (all batch keys inside the range)
            lo = rng.randrange(40)
            region = [("k", ">=", lo), ("k", "<", lo + 10)]
            batch = [
                (lo + rng.randrange(10), ts, v)
                for _, ts, v in fresh_rows(rng.randrange(1, 4))
            ]
            tx.tx_replace_where(
                spark,
                p,
                spark.createDataFrame(batch, "k int, ts int, v string"),
                region,
            )
            applied = [
                r for r in applied if not (lo <= r[0] < lo + 10)
            ] + batch
            history[tx.table_version(p)] = sorted(applied)
        elif op == "delete_keys":
            # key-set delete: model = filter those keys out verbatim
            doomed = sorted(
                {rng.randrange(40) for _ in range(rng.randrange(1, 5))}
            )
            tx.tx_delete_keys(
                spark,
                p,
                spark.createDataFrame([(k,) for k in doomed], "k int"),
                ["k"],
            )
            applied = [r for r in applied if r[0] not in set(doomed)]
            history[tx.table_version(p)] = sorted(applied)
        elif op == "merge":
            # conditional three-clause MERGE, clause selection keyed
            # off the (unique) change clock so the model replicates it
            # exactly: source.ts % 3 == 0 -> matched DELETE (every
            # duplicate row of that key goes), == 1 -> matched UPDATE
            # ALL (duplicates become identical rows — multiset
            # preserved), == 2 -> no clause (keep); unmatched source
            # keys INSERT.  A coin adds WHEN NOT MATCHED BY SOURCE
            # DELETE over a fixed key band; merge-on-read flips
            # independently (physical strategy, same model).
            raw = fresh_rows(rng.randrange(1, 4))
            src = {}
            for k, ts, v in raw:  # newest per key: tx_merge refuses dups
                src[k] = (ts, v)
            use_bys = rng.random() < 0.3
            tx.tx_merge(
                spark,
                p,
                spark.createDataFrame(
                    [(k, ts, v) for k, (ts, v) in src.items()],
                    "k int, ts int, v string",
                ),
                on=["k"],
                when_matched_delete="source.ts % 3 = 0",
                when_matched_update="all",
                when_matched_update_condition="source.ts % 3 = 1",
                when_not_matched_insert=True,
                when_not_matched_by_source_delete=(
                    "target.k >= 35" if use_bys else False
                ),
                merge_on_read=rng.random() < 0.5,
            )
            table_keys = {r[0] for r in applied}
            out = []
            for k, ts, v in applied:
                if k in src:
                    sts, sv = src[k]
                    if sts % 3 == 0:
                        continue
                    if sts % 3 == 1:
                        out.append((k, sts, sv))
                    else:
                        out.append((k, ts, v))
                elif use_bys and k >= 35:
                    continue
                else:
                    out.append((k, ts, v))
            for k, (ts, v) in src.items():
                if k not in table_keys:
                    out.append((k, ts, v))
            applied = out
            history[tx.table_version(p)] = sorted(applied)
        elif op == "rename":
            # metadata-only round trip: v -> vtmp -> v.  The model is
            # untouched (same rows, same final names) but the two
            # commits thread the column-mapping fold through every
            # later checkpoint/expire/restore/vacuum in the walk.  The
            # intermediate version is deliberately NOT recorded in
            # history (its reads answer under the temporary name).
            tx.tx_rename_column(p, "v", "vtmp")
            tx.tx_rename_column(p, "vtmp", "v")
            history[tx.table_version(p)] = sorted(applied)
        elif op == "compact":
            v = tx.tx_compact(spark, p, target_bytes=1 << 30)
            if v is not None:
                history[v] = sorted(applied)  # content-invariant
        elif op == "vacuum":
            tx.vacuum(p, retain_versions=3, min_age_seconds=0.0)
            current = tx.table_version(p)
            # versions older than the retention window may now be
            # physically unreadable — drop them from the checkable set
            history = {
                v: s for v, s in history.items() if v > current - 3
            }
            # a reader pinned INSIDE the window survives the vacuum
            for v, snap in history.items():
                assert _read(spark, p, version=v) == snap, (
                    f"seed={seed} vacuum broke pinned version {v}"
                )
        else:  # expire: drop the commit files a checkpoint subsumes
            current = tx.table_version(p)
            if max(1, current - 2) < tx.oldest_readable_version(p):
                continue  # an earlier expire already passed this horizon
            tx.expire_log(p, retain_versions=3)
            k = tx.oldest_readable_version(p)
            assert k == max(1, current - 2)
            # below the horizon: LOUD typed error, never wrong data
            if k > 1:
                with pytest.raises(tx.VersionExpiredError):
                    tx.snapshot(p, k - 1)
            history = {v: s for v, s in history.items() if v >= k}
            # at-or-above the horizon: still bit-exact (checkpoint fold)
            for v, snap in history.items():
                assert _read(spark, p, version=v) == snap, (
                    f"seed={seed} expire broke retained version {v}"
                )
        assert _read(spark, p) == sorted(applied), f"seed={seed} op={op}"

    # every retained historical version reads back its model snapshot
    for v, snap in history.items():
        assert _read(spark, p, version=v) == snap, f"seed={seed} v={v}"
