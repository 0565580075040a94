"""Generate fixtures/simhash_golden.parquet — an INDEPENDENT value
oracle for operators/dedup.simhash_signatures / dedup_simhash.

DuckDB has no xxhash64, so the driver oracle can't recompute simhash
in SQL; instead this tool derives the signatures OUTSIDE Spark from a
pure-Python XXH64 implemented from the public spec (xxhash.com /
github.com/Cyan4973/xxHash, BSD), mirroring the operator's definition:

    tokens  = distinct(split(text, ' ') minus empties)
    h(t)    = XXH64(utf8(t), seed=42)       # == Spark F.xxhash64(t)
    bit j   = 1  iff  2 * |{t : bit j of h(t) = 1}| > |tokens|

Keyed by md5(text) (not doc_id) because the driver testdata re-rolls
texts per scale factor; the union over sf0.001/sf0.01/sf0.1 covers any
sf the driver checks at.  Run after testdata changes:

    python3 tools/make_simhash_golden.py
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "simhash_golden.parquet"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

MASK = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    """Reference XXH64 (spec steps 1-7); verified equal to Spark's
    ``F.xxhash64(col)`` (seed 42) on 200 random unicode strings."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7)
             + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def simhash(text: str, bits: int = 64) -> int:
    """Signed-int64 simhash, mirror of dedup.simhash_signatures."""
    toks = list(dict.fromkeys(t for t in text.split(" ") if t))
    n = len(toks)
    counts = [0] * bits
    for t in toks:
        h = xxh64(t.encode("utf-8"), 42)
        for j in range(bits):
            counts[j] += (h >> j) & 1
    sig = 0
    for j in range(bits):
        if counts[j] * 2 > n:
            sig |= 1 << j
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def main() -> None:
    con = duckdb.connect()
    texts: set[str] = set()
    for d in SF_DIRS:
        for (t,) in con.execute(
                f"SELECT DISTINCT text FROM "
                f"read_parquet('{d}/documents.parquet')").fetchall():
            texts.add(t)
    rows = sorted(texts)
    tbl = pa.table({
        "text_md5": [hashlib.md5(t.encode("utf-8")).hexdigest()
                     for t in rows],
        "simhash": pa.array([simhash(t) for t in rows], pa.int64()),
    })
    pq.write_table(tbl, OUT)
    print(f"wrote {tbl.num_rows} signatures → {OUT}")


if __name__ == "__main__":
    main()
