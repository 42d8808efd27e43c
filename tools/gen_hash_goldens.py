#!/usr/bin/env python3
"""Generate golden VALUES for the hash-seeded dedup family (d2/d3/t5).

Independent implementation of XXH64 from the public xxHash spec
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) plus a
mirror of the minhash/simhash/winnowing pipeline semantics, so the pinned
oracle VALUES verify Spark's hash math end-to-end without being derived
from Spark itself.

Spark specifics mirrored here (from the public Spark source,
org.apache.spark.sql.catalyst.expressions.XxHash64 / XXH64.java):
  - xxhash64(...) seeds with 42 and chains: the running hash is the seed
    for the next child.
  - A string child hashes its UTF-8 bytes; an int child hashes its 4 LE
    bytes; a long child hashes its 8 LE bytes (the special-cased
    hashInt/hashLong in XXH64.java equal standard XXH64 of those bytes).
  - Results are signed 64-bit Java longs.

Usage: python3 tools/gen_hash_goldens.py   # prints Scala/SQL snippets
"""
import sys

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc, lane):
    return (_rotl((acc + lane * P2) & M64, 31) * P1) & M64


def _merge_round(h, acc):
    h ^= _round(0, acc)
    return (h * P1 + P4) & M64


def xxh64(data: bytes, seed: int) -> int:
    seed &= M64
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + P1 + P2) & M64
        a2 = (seed + P2) & M64
        a3 = seed
        a4 = (seed - P1) & M64
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i:i + 8], "little")); i += 8
            a2 = _round(a2, int.from_bytes(data[i:i + 8], "little")); i += 8
            a3 = _round(a3, int.from_bytes(data[i:i + 8], "little")); i += 8
            a4 = _round(a4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & M64
        for acc in (a1, a2, a3, a4):
            h = _merge_round(h, acc)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def unsigned(v):
    return v & M64


# Spark xxhash64(child...) with chained seeds, seed 42.
def spark_xxh_str(s: str, seed: int = 42) -> int:
    return signed(xxh64(s.encode("utf-8"), unsigned(seed)))


def spark_xxh_long(v: int, seed: int) -> int:
    return signed(xxh64(unsigned(v).to_bytes(8, "little"), unsigned(seed)))


def spark_xxh_int(v: int, seed: int) -> int:
    return signed(xxh64((v & 0xFFFFFFFF).to_bytes(4, "little"), unsigned(seed)))


# ---------------------------------------------------------------- spec vectors
assert xxh64(b"", 0) == 0xEF46DB3751D8E999
assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
assert xxh64(b"as", 0) == 0x1C330FB2D66BE179
assert xxh64(b"asd", 0) == 0x631C37CE72A97393
assert xxh64(b"asdf", 0) == 0x415872F599CEA71E
# 32+ byte input exercises the stripe loop
assert xxh64(b"Call me Ishmael. Some years ago--never mind how long precisely-",
             0) == 0x02A2E85470D6FD96


# -------------------------------------------------------------- pipeline mirror
def tokens(text):
    return text.split(" ")


def shingles_from_tokens(toks, n):
    if len(toks) < n:
        return []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def dedupe_keep_order(xs):
    seen, out = set(), []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def minhash_sig(text, k, shingle_n):
    """Mirrors Dedup.minhashSignatures: distinct shingles, h1 = xxhash64(sh),
    per seed s: min over shingles of xxhash64(h1, s)."""
    sh = dedupe_keep_order(shingles_from_tokens(tokens(text), shingle_n))
    if not sh:
        return None
    h1s = [spark_xxh_str(s) for s in sh]
    return [min(spark_xxh_int(s, spark_xxh_long(h1, 42)) for h1 in h1s)
            for s in range(k)]


def minhash_bands(sig, k, bands):
    """Mirrors TextFunctions.minhashBands: per band i, xxhash64 of the
    comma-joined decimal band slice, chained with the int literal i."""
    r = k // bands
    out = []
    for i in range(bands):
        s = ",".join(str(v) for v in sig[i * r:(i + 1) * r])
        out.append(spark_xxh_int(i, spark_xxh_str(s)))
    return out


def simhash_bits(text):
    """Mirrors Dedup.simhashBitVectors: one xxhash64 per token (all tokens,
    not distinct), bit b votes 1 when strictly more than half the tokens
    have bit b set; 64 majority bits packed into one signed long."""
    hs = [unsigned(spark_xxh_str(w)) for w in tokens(text)]
    n = len(hs)
    packed = 0
    for b in range(64):
        if sum((h >> b) & 1 for h in hs) * 2 > n:
            packed |= 1 << b
    return signed(packed)


def winnow_fps(text, k, w):
    """Mirrors Dedup.winnowingFingerprints: k-gram shingles (order kept, not
    distinct), xxhash64 each, min of each w-window, distinct keeping first
    occurrence; [min] when 0 < len < w; [] when no shingles."""
    hs = [spark_xxh_str(s) for s in shingles_from_tokens(tokens(text), k)]
    if len(hs) >= w:
        return dedupe_keep_order(
            [min(hs[i:i + w]) for i in range(len(hs) - w + 1)])
    if hs:
        return [min(hs)]
    return []


# ------------------------------------------------------------------- fixtures
FIXTURE = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "pack my box with five dozen liquor jugs right now"),
    (4, "tiny doc"),
    (5, "alpha beta gamma delta epsilon zeta"),
]

K_MINHASH, N_BANDS, SHINGLE_N = 8, 4, 3
WIN_K, WIN_W = 5, 4


def jarr(vals):
    return "[" + ",".join(str(v) for v in vals) + "]"


def main():
    print("== fixture (Scala Seq) ==")
    for i, t in FIXTURE:
        print(f'  ({i}L, "{t}"),')

    print("\n== d2_minhash_golden VALUES (id, sig_json, bands_json) ==")
    for i, t in FIXTURE:
        sig = minhash_sig(t, K_MINHASH, SHINGLE_N)
        if sig is None:
            continue  # docs with no shingles drop out, like the Spark side
        print(f"  ({i}, '{jarr(sig)}', '{jarr(minhash_bands(sig, K_MINHASH, N_BANDS))}'),")

    print("\n== d3_simhash_golden VALUES (id, bits, plus pair hammings) ==")
    bits = {}
    for i, t in FIXTURE:
        bits[i] = simhash_bits(t)
        print(f"  ({i}, {bits[i]}),")
    for a in bits:
        for b in bits:
            if a < b:
                d = bin(unsigned(bits[a]) ^ unsigned(bits[b])).count("1")
                print(f"  -- hamming({a},{b}) = {d}")

    print("\n== t5_winnow_golden VALUES (id, fps_json) ==")
    for i, t in FIXTURE:
        print(f"  ({i}, '{jarr(winnow_fps(t, WIN_K, WIN_W))}'),")


if __name__ == "__main__":
    main()
