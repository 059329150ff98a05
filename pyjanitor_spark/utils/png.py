"""Minimal pure-stdlib PNG codec (zlib + struct), used to de-gate the
multimodal ``decode_features`` path in environments without PIL.

Implements the public PNG specification (RFC 2083 / W3C PNG spec):
chunk layout, IHDR parsing, zlib-inflated IDAT, and the five scanline
filters (None/Sub/Up/Average/Paeth).  Scope is deliberately narrow —
bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
no interlacing — enough to decode deterministic test fixtures and the
overwhelmingly common 8-bit web PNG.  Anything outside that raises
``ValueError`` so callers can fall back (PIL when installed, else the
documented fake decode).

Performance note: unfiltering is a per-byte Python loop (Sub/Average/
Paeth depend serially on the left neighbor, so there is no clean
vectorization).  This is the CORRECTNESS de-gate; when PIL is present
``decode_features`` prefers it.  At 100 TB the decode runs inside
Arrow-batched ``mapInPandas`` tasks either way — the plumbing, not this
codec, is the scale story.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Allocation ceiling for the filtered scanline buffer (≈ 256 MiB, i.e.
# a 64-megapixel RGBA image).  Untrusted headers above this raise
# ValueError instead of attempting the allocation.
_MAX_RAW_BYTES = 1 << 28


def decode_png(data: bytes) -> dict:
    """Decode a PNG byte string.

    Returns ``{"width", "height", "channels", "bit_depth", "pixels"}``
    with ``pixels`` a ``bytes`` of length width*height*channels in
    row-major, channel-interleaved order.  Raises ``ValueError`` for
    non-PNG input or unsupported shapes (palette, 16-bit, interlaced).
    """
    if len(data) < 8 or data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + CRC
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    channels = _CHANNELS[color_type]
    stride = width * channels
    # Untrusted-bytes hardening (fuzz wave 15): a bit-flipped IHDR can
    # claim absurd dimensions; bound every allocation by the header-
    # derived expected size and cap that size itself, and never let
    # zlib inflate past it (decompression-bomb guard).
    expected = height * (stride + 1)
    if expected > _MAX_RAW_BYTES:
        raise ValueError(
            f"image too large ({width}x{height}x{channels}; "
            f"cap {_MAX_RAW_BYTES} filtered bytes)"
        )
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected)
        if dec.unconsumed_tail:
            raise ValueError("IDAT inflates past header-declared size")
        raw += dec.flush()
    except zlib.error as exc:  # truncated/garbage deflate stream
        raise ValueError(f"bad IDAT stream: {exc}") from None
    if len(raw) != expected:
        raise ValueError("decompressed size mismatch")
    out = bytearray(height * stride)
    prev_off = -1  # offset of previous row in out, -1 = none
    for y in range(height):
        rpos = y * (stride + 1)
        ftype = raw[rpos]
        row = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_off >= 0:
                for i in range(stride):
                    row[i] = (row[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                up = out[prev_off + i] if prev_off >= 0 else 0
                row[i] = (row[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = (
                    out[prev_off + i - channels]
                    if (prev_off >= 0 and i >= channels)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        off = y * stride
        out[off : off + stride] = row
        prev_off = off
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": bit_depth,
        "pixels": bytes(out),
    }


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw 8-bit pixels as a PNG (filter 0 rows, one IDAT).

    Test-fixture producer for the decoder above; deterministic output
    (fixed zlib level, no ancillary chunks)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ctype is None:
        raise ValueError(f"channels must be 1-4, got {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixels length != width*height*channels")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    idat = zlib.compress(raw, 6)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
