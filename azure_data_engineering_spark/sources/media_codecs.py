"""Pure-stdlib media codecs: PNG (zlib), BMP (struct), WAV (wave).

The container has no PIL/ffmpeg/cv2 and installs are off-limits, but
PNG's pixel model is just zlib-inflated filtered scanlines and WAV is
in the Python stdlib — so the multimodal decode step can be REAL for
these formats instead of a deterministic fake, the same pip-less route
sources/excel.py takes for OOXML. Scope: non-interlaced 8-bit PNG
(gray / gray+alpha / RGB / RGBA) with the full filter set 0-4 on
decode; uncompressed BITMAPINFOHEADER BMP; PCM WAV. Anything else
raises ValueError and the caller falls back to the documented fake
(sources/multimodal.py).

Every function is driver-free pure bytes->values, so it drops straight
into Arrow-batched mapInPandas kernels on executors.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_SAMPLES = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str | None:
    """Magic-byte format detection: 'png' | 'bmp' | 'wav' | None."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ PNG


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def png_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — O(1), no
    inflate; the cheap metadata path for scans that only need dims."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            return w, h, depth, color
        break
    raise ValueError("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, pixels) — pixels row-major interleaved
    bytes after unfiltering (the inverse of filters 0-4, PNG spec
    §9.2). 8-bit, non-interlaced only."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    w = h = depth = color = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data[:13])
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_SAMPLES:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = _PNG_SAMPLES[color]
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong size")
    out = bytearray(h * stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        prev_off = off - stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                out[off + x] = (line[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + x] if y > 0 else 0
                c = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                out[off + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return w, h, bpp, out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int, channels: int = 1, filter_type: int = 0) -> bytes:
    """Encode 8-bit row-major pixels (gray=1 / gray+alpha=2 / RGB=3 /
    RGBA=4 channels) as a valid PNG. filter_type applies the chosen
    PNG filter to every scanline — useful for exercising the decoder's
    full unfilter set, not for compression tuning."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    rows = bytearray()
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        if filter_type == 0:
            rows.append(0)
            rows.extend(line)
        elif filter_type == 1:  # Sub
            rows.append(1)
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                rows.append((line[x] - a) & 0xFF)
        elif filter_type == 2:  # Up
            rows.append(2)
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
            for x in range(stride):
                rows.append((line[x] - prev[x]) & 0xFF)
        elif filter_type == 3:  # Average
            rows.append(3)
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                rows.append((line[x] - (a + prev[x]) // 2) & 0xFF)
        elif filter_type == 4:  # Paeth
            rows.append(4)
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if (y > 0 and x >= channels) else 0
                rows.append((line[x] - _paeth(a, b, c)) & 0xFF)
        else:
            raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP


def bmp_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) from a BITMAPINFOHEADER BMP.
    Height is abs()'d (negative = top-down row order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 30:
        raise ValueError("truncated BMP header")
    w, h = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    return w, abs(h), bpp


# ------------------------------------------------------------------ WAV


def wav_encode(samples: bytes, sample_rate: int, channels: int = 1, sampwidth: int = 2) -> bytes:
    """PCM WAV bytes from raw little-endian frames (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """(channels, sample_rate, n_frames, sampwidth, frames) from a PCM
    WAV payload (stdlib wave; raises wave.Error on non-WAV)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.getsampwidth(),
            w.readframes(w.getnframes()),
        )
