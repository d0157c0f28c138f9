"""Pure-stdlib image codec: real PNG decode/encode + JPEG/GIF header dims.

The build environment has no PIL/torchvision, but PNG is fully
decodable with stdlib ``zlib`` + ``struct``: parse IHDR for geometry,
inflate the IDAT stream, reverse the per-scanline filters (None/Sub/Up/
Average/Paeth, RFC 2083 §6). This powers a GENUINE decode path for the
multimodal operators (``operators/multimodal.py``) — dims and features
come from actual pixels, not a content-hash stub — while non-PNG
formats keep the deterministic stub fallback.

Scope (raises ``UnsupportedImageError`` outside it, so callers can fall
back): 8-bit samples, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlacing. Palette (type 3), 16-bit, and Adam7 are rare
in training corpora after normalization; a production cluster swaps
this module for PIL behind the same function signatures.

The encoder exists for tests and fixtures: it can emit any filter type
per scanline, so decoder unfiltering is exercised against an
independent forward implementation (encode-filter and decode-unfilter
must be exact inverses).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedImageError(ValueError):
    """Payload is not decodable by this codec (fall back to the stub)."""


def sniff(payload: bytes) -> str | None:
    """Best-effort container detection from magic bytes."""
    if payload.startswith(PNG_SIGNATURE):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG payload -> (width, height, channels, raw pixels).

    Pixels are row-major, ``channels`` interleaved samples per pixel,
    8 bits per sample. Raises UnsupportedImageError for formats outside
    the supported scope and ValueError for corrupt data."""
    if not payload.startswith(PNG_SIGNATURE):
        raise UnsupportedImageError("not a PNG payload")
    pos = len(PNG_SIGNATURE)
    width = height = -1
    bit_depth = color_type = interlace = -1
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
    if width < 0:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("PNG missing IEND")
    if bit_depth != 8:
        raise UnsupportedImageError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise UnsupportedImageError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise UnsupportedImageError("interlaced PNG not supported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        line = raw[fpos + 1 : fpos + 1 + stride]
        ostart = y * stride
        if ftype == 0:  # None
            out[ostart : ostart + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[ostart + i - channels] if i >= channels else 0
                out[ostart + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_start + i] if y > 0 else 0
                out[ostart + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[ostart + i - channels] if i >= channels else 0
                up = out[prev_start + i] if y > 0 else 0
                out[ostart + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[ostart + i - channels] if i >= channels else 0
                up = out[prev_start + i] if y > 0 else 0
                ul = out[prev_start + i - channels] if (y > 0 and i >= channels) else 0
                out[ostart + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        prev_start = ostart
    return width, height, channels, bytes(out)


_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels as a valid PNG.

    ``filter_type`` selects the per-scanline filter (0-4) so tests can
    exercise every decoder unfiltering branch; 0 is the fast default."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"invalid filter type {filter_type}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")
    scanlines = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
        scanlines.append(filter_type)
        if filter_type == 0:
            scanlines += row
        else:
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                up = prev[i]
                ul = prev[i - channels] if i >= channels else 0
                if filter_type == 1:
                    pred = left
                elif filter_type == 2:
                    pred = up
                elif filter_type == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth(left, up, ul)
                scanlines.append((row[i] - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + _chunk(b"IEND", b"")
    )


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from JPEG SOF markers — header-only, no decode."""
    if not payload.startswith(b"\xff\xd8"):
        raise UnsupportedImageError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        # SOF0-SOF15 minus DHT(C4)/DAC(CC): frame header carries dims
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(payload):
                break
            height, width = struct.unpack_from(">HH", payload, pos + 5)
            return width, height
        pos += 2 + seglen
    raise ValueError("JPEG frame header not found")


def gif_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the GIF logical screen descriptor."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise UnsupportedImageError("not a GIF payload")
    if len(payload) < 10:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack_from("<HH", payload, 6)
    return width, height


def luminance_histogram(
    channels: int, pixels: bytes, bins: int = 8
) -> list[float]:
    """Normalized luminance histogram — the codec-backed feature vector.

    Gray uses the sample directly; RGB(A) uses integer Rec.601 luma.
    Returns ``bins`` fractions summing to ~1, each rounded to 6 places
    (deterministic across platforms: pure integer math until the final
    division)."""
    counts = [0] * bins
    n = len(pixels) // channels
    if n == 0:
        raise ValueError("empty pixel buffer")
    for p in range(0, len(pixels), channels):
        if channels <= 2:
            luma = pixels[p]
        else:
            # integer Rec.601: (299 R + 587 G + 114 B) / 1000
            luma = (
                299 * pixels[p] + 587 * pixels[p + 1] + 114 * pixels[p + 2]
            ) // 1000
        counts[min(luma * bins // 256, bins - 1)] += 1
    return [round(c / n, 6) for c in counts]


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    new_w: int,
    new_h: int,
) -> bytes:
    """Nearest-neighbor resample of raw interleaved pixels."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        srow = sy * width * channels
        orow = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = srow + sx * channels
            o = orow + x * channels
            out[o : o + channels] = pixels[s : s + channels]
    return bytes(out)


def ahash(width: int, height: int, channels: int, pixels: bytes) -> int:
    """64-bit average hash (aHash) of decoded pixels — the classic
    perceptual near-dup key (public technique: shrink to 8x8 luminance,
    bit i = pixel i brighter than the mean). Robust to re-encoding and
    small noise, cheap enough for corpus-wide exact groupBy; hamming
    bands layer on top the same way SimHash bands do.

    Mean comparison uses exact integer arithmetic (sum vs 64*value), so
    the hash is bit-stable across platforms.

    The result is folded into SIGNED 64-bit range: bit 63 is set
    whenever the bottom-right thumbnail pixel is brighter than the
    mean, and an unfolded value >= 2^63 does not fit Spark's LongType
    (Arrow's uint64->int64 cast raises and kills the whole job)."""
    small = resize_nearest(width, height, channels, pixels, 8, 8)
    if channels == 1:
        lum = list(small)
    else:
        lum = []
        for i in range(64):
            base = i * channels
            if channels >= 3:
                # integer BT.601-ish weights, denominator 1000
                lum.append(
                    (
                        299 * small[base]
                        + 587 * small[base + 1]
                        + 114 * small[base + 2]
                    )
                    // 1000
                )
            else:  # gray + alpha
                lum.append(small[base])
    total = sum(lum)
    h = 0
    for i, v in enumerate(lum):
        if v * 64 > total:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h
