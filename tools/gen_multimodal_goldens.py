#!/usr/bin/env python3
"""Generate golden VALUES for the multimodal stub pipeline (m2 decode /
resize) over the same five-doc fixture as the dedup goldens.

Independent mirror of the stub semantics (public Java definitions):
  - media bytes      = UTF-8 encoding of the text column
  - Arrays.hashCode  = h=1; h = 31*h + signed(byte), wrapping int32
  - width            = 64 + floorMod(h, 512)
  - height           = 64 + floorMod(h / 512, 512)   (Java / truncates)
  - features[i]      = floorMod(h / (i+1), 1000) / 1000.0f  (float32 div)
  - resize           = aspect-fit scale, Math.round = floor(x + 0.5)

Usage: python3 tools/gen_multimodal_goldens.py
"""
import math
import struct

FIXTURE = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "pack my box with five dozen liquor jugs right now"),
    (4, "tiny doc"),
    (5, "alpha beta gamma delta epsilon zeta"),
]


def to_i32(v):
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def java_arrays_hashcode(bs: bytes) -> int:
    h = 1
    for b in bs:
        sb = b - 256 if b >= 128 else b
        h = to_i32(31 * h + sb)
    return h


def jdiv(a: int, b: int) -> int:
    """Java integer division: truncates toward zero."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def f32(x: float) -> float:
    """Round a Python double to the nearest float32, back as double —
    exactly the value a Java float holds."""
    return struct.unpack("f", struct.pack("f", x))[0]


def decode(text: str):
    bs = text.encode("utf-8")
    h = java_arrays_hashcode(bs)
    width = 64 + (h % 512)                 # floorMod == Python % here
    height = 64 + (jdiv(h, 512) % 512)
    feats = [f32((jdiv(h, i + 1) % 1000) / 1000.0) for i in range(8)]
    return len(bs), width, height, feats


def phash(feats):
    """aHash mirror of Multimodal.perceptualHash: left-associated double
    sum / dims for the mean, bit i set iff feats[i] > mean."""
    s = 0.0
    for f in feats:
        s = s + f
    mean = s / len(feats)
    return sum((1 << i) for i, f in enumerate(feats) if f > mean)


def resize(w: int, h: int, max_w: int, max_h: int):
    scale = min(1.0, min(max_w / w, max_h / h))
    rnd = lambda x: math.floor(x + 0.5)    # Java Math.round
    return max(1, rnd(w * scale)), max(1, rnd(h * scale))


def main():
    print("== m2_decode_golden VALUES (doc_id, byte_len, width, height, f0..f7) ==")
    for i, t in FIXTURE:
        n, w, h, feats = decode(t)
        print(f"  ({i}, {n}, {w}, {h}, " + ", ".join(repr(f) for f in feats) + "),")

    print("\n== m4_resize_golden VALUES (doc_id, width, height, out_width, out_height) @ 96x96 ==")
    for i, t in FIXTURE:
        _, w, h, _ = decode(t)
        ow, oh = resize(w, h, 96, 96)
        print(f"  ({i}, {w}, {h}, {ow}, {oh}),")

    print("\n== m5_phash_golden VALUES (doc_id, phash) ==")
    for i, t in FIXTURE:
        _, _, _, feats = decode(t)
        print(f"  ({i}, {phash(feats)}),")


if __name__ == "__main__":
    main()
