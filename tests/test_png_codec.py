"""Vendored pure-stdlib PNG codec (functions/png) — the container-
provable real-pixel seam for the multimodal kernels (VERDICT r4 #3:
same vendoring pattern as the NetCDF reader and the Karney geodesic)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qualityassurancetool_spark.functions.png import (
    PngError,
    box_resize,
    decode_png,
    encode_png,
    to_gray,
)


def _gradient(w, h, ch):
    px = bytearray(w * h * ch)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                px[(y * w + x) * ch + c] = (x * 7 + y * 13 + c * 29) % 256
    return px


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip(ch):
    w, h = 23, 17  # odd sizes: stride not a multiple of anything
    px = _gradient(w, h, ch)
    w2, h2, ch2, out = decode_png(encode_png(w, h, ch, bytes(px)))
    assert (w2, h2, ch2) == (w, h, ch)
    assert out == px


def _encode_with_filters(w, h, ch, px, filters):
    """Hand-roll a PNG whose rows use the GIVEN filter types — exercises
    the decoder's Sub/Up/Average/Paeth unfiltering against reference
    arithmetic computed independently here."""
    stride = w * ch
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        f = filters[y % len(filters)]
        row = px[y * stride : (y + 1) * stride]
        enc = bytearray()
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 0xFF
            elif f == 2:
                v = (row[x] - b) & 0xFF
            elif f == 3:
                v = (row[x] - (a + b) // 2) & 0xFF
            else:  # Paeth predictor
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (row[x] - pr) & 0xFF
            enc.append(v)
        raw.append(f)
        raw.extend(enc)
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color = {1: 0, 3: 2, 4: 6}[ch]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_scanline_filters(filters):
    w, h, ch = 11, 9, 3
    px = _gradient(w, h, ch)
    data = _encode_with_filters(w, h, ch, px, filters)
    assert decode_png(data)[3] == px


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_roundtrip_random(w, h, ch, seed):
    import random

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    assert decode_png(encode_png(w, h, ch, px))[3] == bytearray(px)


def test_rejects_garbage_and_exotics():
    with pytest.raises(PngError):
        decode_png(b"not a png")
    with pytest.raises(PngError):
        decode_png(b"")
    # 16-bit depth rejected loudly
    w, h = 2, 2
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="bit depth"):
        decode_png(data)
    # corrupted CRC rejected
    good = encode_png(2, 2, 1, bytes(4))
    bad = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
    with pytest.raises(PngError):
        decode_png(bad)


def test_gray_and_box_resize():
    # pure red image → luma 76 (299*255//1000 per-pixel then box avg)
    w, h = 4, 4
    px = bytearray([255, 0, 0] * (w * h))
    g = to_gray(w, h, 3, px)
    assert set(g) == {76}
    # 4x4 checkerboard of 0/255 box-resized to 2x2 → every cell mean 127
    gray = bytearray(
        (255 if (x + y) % 2 else 0) for y in range(4) for x in range(4)
    )
    small = box_resize(gray, 4, 4, 1, 2, 2)
    assert list(small) == [127, 127, 127, 127]
