"""Per-file Bloom-filter data skipping for point lookups.

Min/max footer stats (``txtable._footer_stats``) prune range and
equality predicates only when the column is CLUSTERED — on a
high-cardinality unclustered key (UUIDs, content hashes) every file's
[min, max] spans nearly the whole key space and a point lookup scans
the entire table.  A small per-file Bloom filter closes exactly that
gap: membership is recorded at write time, a ``k = v`` / ``k IN (...)``
predicate consults the filter during planning, and a file whose filter
provably lacks every probed value is never opened.  False positives
only cost a scan (the real row filter still applies); false negatives
are impossible — the Delta/Iceberg bloom-index contract.

Scale shape: filters are computed by a Spark job with ONE TASK PER
FILE (each task reads only the indexed columns of its own file —
column-pruned, no shuffle, parallel across executors), serialized
base64 into the commit's per-file stats, and consulted driver-side at
planning like every other stat.  Size is capped per column per file
(default 32 KiB ≈ 26k distinct keys at 1% fpp; beyond the cap the fpp
degrades gracefully, never the correctness).  Compaction re-runs stats
on its outputs, so ``tx_compact`` doubles as the bloom BACKFILL for
files written before the property was set.

No equivalent exists in the reference (432-line single-node pipeline,
no stats at all); the design follows the public Delta bloom-filter
index and Parquet's split-block bloom (hash-k-ways into a fixed bit
array), simplified to a classic Bloom filter with double hashing."""

from __future__ import annotations

import base64
import hashlib
import math
import os
from typing import Iterable, Sequence

#: hard floor/ceiling on the bit-array size (bytes) per column per file
_MIN_BYTES = 8
DEFAULT_FPP = 0.01
DEFAULT_MAX_BYTES = 32768


def bloom_canon(v) -> bytes | None:
    """Canonical hash bytes for a value, identical on the build side
    (python objects from a pyarrow column read) and the probe side (a
    predicate literal).  ``None`` marks a type the filter does not
    index — the probe then never prunes.  Floats are deliberately
    excluded (point equality on floats is ill-posed and parquet
    min/max already handles the rare exact probe); bools are pointless
    (two values never prune)."""
    import datetime as _dt

    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, int):
        return b"i:" + str(v).encode()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return b"t:" + v.isoformat().encode()
    if isinstance(v, _dt.date):
        return b"d:" + v.isoformat().encode()
    return None


def _hashes(canon: bytes) -> tuple[int, int]:
    h = hashlib.blake2b(canon, digest_size=16).digest()
    return int.from_bytes(h[:8], "big"), int.from_bytes(h[8:], "big") | 1


def bloom_params(n: int, fpp: float, max_bytes: int) -> tuple[int, int]:
    """Classic sizing: ``m = -n ln p / (ln 2)^2`` bits, ``k = m/n ln 2``
    hashes, byte-aligned and capped to ``max_bytes`` (past the cap the
    fpp degrades; membership stays sound)."""
    n = max(1, n)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(_MIN_BYTES * 8, min(m, max_bytes * 8))
    m = ((m + 7) // 8) * 8
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def build_bloom(
    values: Iterable, fpp: float = DEFAULT_FPP,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> dict | None:
    """Build the serialized filter dict ``{"m", "k", "b"}`` from a
    column's values (nulls skipped — IS NULL probes use the null
    counts, not the filter).  An all-null / empty column yields an
    all-zero filter: "no value is present" is then PROVABLE, which is
    exactly right.  Returns ``None`` when any value's type is
    unindexable (mixed/unsupported column — conservative: no filter,
    file always scanned)."""
    canons = []
    vt = None
    for v in values:
        if v is None:
            continue
        c = bloom_canon(v)
        if c is None:
            return None
        canons.append(c)
        vt = c[:1].decode()  # single parquet type per column
    m, k = bloom_params(len(canons), fpp, max_bytes)
    bits = bytearray(m // 8)
    for c in canons:
        h1, h2 = _hashes(c)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    out = {
        "m": m,
        "k": k,
        "b": base64.b64encode(bytes(bits)).decode("ascii"),
    }
    if vt is not None:
        # the builder's value-type tag: a probe whose literal type
        # canonicalizes differently (a string probing a timestamp
        # column) can NEVER prove absence — it must scan, exactly as
        # the min/max stats would
        out["vt"] = vt
    return out


def bloom_may_contain(bloom: dict, v) -> bool:
    """Probe: False only when the filter PROVES absence.  Unknown
    types, nulls, and CROSS-TYPE probes (literal type differs from the
    column's — the canonical encodings would never collide, so a
    definitive False would be a false negative) return True."""
    c = bloom_canon(v)
    if c is None:
        return True
    vt = bloom.get("vt")
    if vt is not None and c[:1].decode() != vt:
        return True
    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["b"])
    h1, h2 = _hashes(c)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not bits[pos >> 3] & (1 << (pos & 7)):
            return False
    return True


def _file_blooms_local(
    abspath: str, cols: Sequence[str], fpp: float, max_bytes: int
) -> dict:
    """Filters for one file, driver- or executor-local: a column-pruned
    pyarrow read of only the indexed columns."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(abspath)
    present = [c for c in cols if c in pf.schema_arrow.names]
    if not present:
        return {}
    t = pq.read_table(abspath, columns=present)
    out = {}
    for c in present:
        bl = build_bloom(t.column(c).to_pylist(), fpp, max_bytes)
        if bl is not None:
            out[c] = bl
    return out


def compute_file_blooms(
    table_path: str,
    files: Sequence[str],
    cols: Sequence[str],
    fpp: float = DEFAULT_FPP,
    max_bytes: int = DEFAULT_MAX_BYTES,
    spark=None,
) -> dict[str, dict]:
    """``{table-relative file: {column: filter}}`` for freshly staged
    files.  With an active SparkSession the build is a one-task-per-
    file Spark job (each executor task reads its own file's indexed
    columns — the same executor-side-IO shape as the distributed
    vacuum listing); without one it falls back to a sequential local
    loop (tests, tools).  Columns are the files' PHYSICAL names; a
    file lacking an indexed column (written pre-evolution) simply gets
    no filter for it — conservative, it scans."""
    if not files or not cols:
        return {}
    cols = list(cols)
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None or len(files) == 1:
        return {
            f: _file_blooms_local(
                os.path.join(table_path, f), cols, fpp, max_bytes
            )
            for f in files
        }

    import json as _json

    import pandas as pd  # noqa: F401

    def _task(batches):
        import pandas as _pd

        for b in batches:
            rows = []
            for rel in b["file"]:
                per = _file_blooms_local(
                    os.path.join(table_path, rel), cols, fpp, max_bytes
                )
                rows.append((rel, _json.dumps(per)))
            yield _pd.DataFrame(rows, columns=["file", "blooms"])

    src = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(len(files))
    got = src.mapInPandas(_task, "file string, blooms string").collect()
    return {r["file"]: _json.loads(r["blooms"]) for r in got}
