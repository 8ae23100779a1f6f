"""Minimal pure-stdlib PNG codec — the container-provable decode seam
for the multimodal operators.

This container ships no image library (Pillow is an import-gated
optional), so the real-bytes branch of the decode kernels was only
exercisable outside it.  Like the NetCDF reader and the Karney
geodesic (the same vendoring pattern), this module implements just
enough of the public PNG spec (RFC 2083 / W3C PNG) from the standard
library to decode and encode real images hermetically:

- 8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA)
- all five scanline filters (None/Sub/Up/Average/Paeth)
- zlib-compressed IDAT (possibly split across chunks), CRC-checked
- no interlace (Adam7 rejected loudly)

It is NOT a general image library: paletted/16-bit/interlaced files
raise ``PngError`` and the calling kernels fall back to the
deterministic byte-derived feature, so one exotic file never kills a
batch (the same contract as the Pillow kernel).
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """→ ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major bytearray of ``width*height*channels`` 8-bit samples."""
    if not data or not data.startswith(_MAGIC):
        raise PngError("not a PNG (bad signature)")
    pos = len(_MAGIC)
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced (Adam7) not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise PngError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev_row_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = row
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                out[o + x] = (row[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = out[prev_row_start + x] if y else 0
                out[o + x] = (row[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                b = out[prev_row_start + x] if y else 0
                out[o + x] = (row[x] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                b = out[prev_row_start + x] if y else 0
                c = out[prev_row_start + x - ch] if (y and x >= ch) else 0
                out[o + x] = (row[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown filter type {f}")
        prev_row_start = o
    return width, height, ch, out


def encode_png(
    width: int, height: int, channels: int, pixels: bytes | bytearray
) -> bytes:
    """Inverse of :func:`decode_png` (filter 0 rows, one IDAT) — used by
    the resize kernel's re-encode and by tests to build real fixtures."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer size mismatch")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def to_gray(
    width: int, height: int, channels: int, pixels: bytearray
) -> bytearray:
    """ITU-R 601-2 luma (the same weights Pillow's convert("L") uses)."""
    if channels == 1:
        return pixels
    out = bytearray(width * height)
    for i in range(width * height):
        o = i * channels
        out[i] = (
            299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2]
        ) // 1000
    return out


def box_resize(
    src: bytearray,
    sw: int,
    sh: int,
    channels: int,
    nw: int,
    nh: int,
) -> bytearray:
    """Box-filter (area-average) resample — deterministic, no FP
    platform variance beyond integer truncation."""
    out = bytearray(nw * nh * channels)
    for y in range(nh):
        y0, y1 = y * sh // nh, max((y + 1) * sh // nh, y * sh // nh + 1)
        for x in range(nw):
            x0 = x * sw // nw
            x1 = max((x + 1) * sw // nw, x0 + 1)
            n = (y1 - y0) * (x1 - x0)
            for c in range(channels):
                acc = 0
                for yy in range(y0, y1):
                    base = (yy * sw) * channels + c
                    for xx in range(x0, x1):
                        acc += src[base + xx * channels]
                out[(y * nw + x) * channels + c] = acc // n
    return out
