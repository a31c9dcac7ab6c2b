"""Pure-stdlib media codecs: PNG (zlib), BMP (struct), WAV (wave),
JPEG metadata (marker walk — ITU-T T.81 §B + EXIF orientation).

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
    """Magic-byte format detection:
    'png' | 'jpeg' | 'bmp' | 'wav' | 'mp3' | 'flac' | 'mp4' | 'mkv'
    | None."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    if payload[:3] == b"ID3":
        return "mp3"
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return "mp3"
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


# ----------------------------------------------------------------- JPEG
#
# Real crawl corpora are overwhelmingly JPEG; a full stdlib baseline+
# progressive DCT decoder is out of scope, but every size/aspect filter,
# EXIF-orientation fix-up, and corrupt-file quarantine needs only the
# MARKER STREAM (ITU-T T.81 §B) plus the EXIF TIFF IFD (orientation tag
# 0x0112). jpeg_metadata walks markers without touching entropy-coded
# data, so it is O(header bytes) per image regardless of pixel count.

_JPEG_STANDALONE = frozenset(
    [0x01, 0xD0, 0xD1, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9]
)
# SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC); progressive = SOF2/6/10/14
_JPEG_SOF = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
_JPEG_PROGRESSIVE = frozenset([0xC2, 0xC6, 0xCA, 0xCE])


def _exif_orientation(app1: bytes) -> int:
    """Orientation (1-8) from an APP1 EXIF payload, 0 if absent or
    malformed. Parses the TIFF header + IFD0 per the public EXIF spec:
    byte order II/MM, magic 42, then 12-byte IFD entries of
    (tag, type, count, value); tag 0x0112 is a SHORT whose value sits
    in the first two bytes of the inline value field."""
    if not app1.startswith(b"Exif\x00\x00"):
        return 0
    t = app1[6:]
    if len(t) < 8:
        return 0
    if t[:2] == b"II":
        end = "<"
    elif t[:2] == b"MM":
        end = ">"
    else:
        return 0
    try:
        (magic,) = struct.unpack(end + "H", t[2:4])
        if magic != 42:
            return 0
        (ifd0,) = struct.unpack(end + "I", t[4:8])
        if ifd0 + 2 > len(t):
            return 0
        (n_entries,) = struct.unpack(end + "H", t[ifd0 : ifd0 + 2])
        for i in range(n_entries):
            off = ifd0 + 2 + 12 * i
            if off + 12 > len(t):
                return 0
            tag, typ = struct.unpack(end + "HH", t[off : off + 4])
            if tag == 0x0112 and typ == 3:  # SHORT
                (val,) = struct.unpack(end + "H", t[off + 8 : off + 10])
                return val if 1 <= val <= 8 else 0
    except struct.error:
        return 0
    return 0


def jpeg_metadata(payload: bytes) -> tuple[int, int, int, bool, int, bool]:
    """(width, height, components, progressive, orientation, truncated)
    from a JPEG payload via a marker walk — no entropy decoding.

    - width/height/components from the first SOF segment (0 each if
      the stream dies before one);
    - progressive iff that SOF is SOF2/6/10/14;
    - orientation from the EXIF APP1 IFD0 tag 0x0112 (0 = absent);
    - truncated=True when a segment length overruns the buffer, a
      marker byte is missing, or the entropy stream ends without EOI —
      the corrupt-file quarantine signal.

    Raises ValueError only when the payload is not JPEG at all (no SOI
    signature)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    width = height = components = 0
    progressive = False
    orientation = 0
    saw_sof = False
    pos = 2
    n = len(payload)
    while True:
        if pos >= n:
            return width, height, components, progressive, orientation, True
        if payload[pos] != 0xFF:
            # garbage between segments — quarantine, don't guess
            return width, height, components, progressive, orientation, True
        while pos < n and payload[pos] == 0xFF:  # fill bytes are legal
            pos += 1
        if pos >= n:
            return width, height, components, progressive, orientation, True
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI — complete stream
            return width, height, components, progressive, orientation, False
        if marker in _JPEG_STANDALONE:
            continue
        if pos + 2 > n:
            return width, height, components, progressive, orientation, True
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            return width, height, components, progressive, orientation, True
        seg = payload[pos + 2 : pos + seglen]
        if marker in _JPEG_SOF and not saw_sof:
            if len(seg) < 6:
                return width, height, components, progressive, orientation, True
            height, width = struct.unpack(">HH", seg[1:5])
            components = seg[5]
            progressive = marker in _JPEG_PROGRESSIVE
            saw_sof = True
        elif marker == 0xE1 and orientation == 0:
            orientation = _exif_orientation(seg)
        pos += seglen
        if marker == 0xDA:
            # entropy-coded data: scan to the next real marker (FF
            # followed by anything but 00-stuffing or RST0-7)
            while pos + 1 < n:
                if payload[pos] == 0xFF and payload[pos + 1] not in (
                    0x00,
                    0xD0,
                    0xD1,
                    0xD2,
                    0xD3,
                    0xD4,
                    0xD5,
                    0xD6,
                    0xD7,
                ):
                    break
                pos += 1
            else:
                return width, height, components, progressive, orientation, True


def jpeg_container(
    width: int,
    height: int,
    components: int = 3,
    progressive: bool = False,
    orientation: int = 0,
    entropy_bytes: int = 16,
    truncate: bool = False,
) -> bytes:
    """A structurally valid JPEG MARKER STREAM for fixtures and tests:
    SOI, JFIF APP0, optional EXIF APP1 (orientation), DQT, SOF0/SOF2,
    DHT, SOS, `entropy_bytes` of FF-free entropy filler, EOI. The
    entropy data is filler (this module parses metadata, it does not
    DCT-decode), but every header segment is spec-shaped, so any
    marker-walking consumer sees a real JPEG container. truncate=True
    chops the stream mid-entropy-data (no EOI) to model an interrupted
    download."""
    if not 1 <= components <= 255:
        raise ValueError("components must fit one byte")
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    if orientation:
        tiff = (
            b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
            + struct.pack("<I", 0)
        )
        exif = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)  # DQT
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = struct.pack(">BHHB", 8, height, width, components)
    sof += b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(components)
    )
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xc4" + struct.pack(">H", 31) + b"\x00" + bytes(28)  # DHT
    sos = struct.pack(">B", components)
    sos += b"".join(struct.pack(">BB", c + 1, 0) for c in range(components))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes((i * 37 + 11) % 255 for i in range(entropy_bytes))  # FF-free
    if truncate:
        return bytes(out[: len(out) - max(entropy_bytes // 2, 1)])
    out += b"\xff\xd9"
    return bytes(out)


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


# ------------------------------------------------------- MP3 / FLAC
# Crawl audio is MP3/FLAC, not WAV: the triage step (sources/
# multimodal.audio_metadata_full) needs real header parsers for both.
# Layouts are from the public MPEG-1/2 audio frame-header spec
# (ISO/IEC 11172-3 / 13818-3) and the public FLAC format spec
# (STREAMINFO metadata block). Same contract as jpeg_metadata: raise
# ValueError only when the payload is not that format at all; report
# mid-stream death via a truncated flag — the quarantine signal.

# bitrate_kbps[version_group][layer][index]; index 0 = "free" and 15 =
# "bad" are treated as invalid headers. Version group 0 = MPEG1,
# 1 = MPEG2/2.5 (they share tables).
_MP3_BITRATE = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample_rate[version_id][index]; version_id bits: 0=MPEG2.5, 2=MPEG2,
# 3=MPEG1 (1 is reserved); index 3 is reserved.
_MP3_RATE = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_frame_header(b: bytes, pos: int):
    """Parse one MPEG audio frame header at pos. Returns (version_id,
    layer, bitrate_kbps, sample_rate, channels, frame_len,
    samples_per_frame) or None if the 4 bytes are not a valid header."""
    if pos + 4 > len(b):
        return None
    h0, h1, h2, h3 = b[pos : pos + 4]
    if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
        return None
    version_id = (h1 >> 3) & 0x03
    layer_bits = (h1 >> 1) & 0x03
    if version_id == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 11->I, 10->II, 01->III
    br_idx = (h2 >> 4) & 0x0F
    sr_idx = (h2 >> 2) & 0x03
    padding = (h2 >> 1) & 0x01
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 0 if version_id == 3 else 1
    bitrate = _MP3_BITRATE[(vgroup, layer)][br_idx]
    rate = _MP3_RATE[version_id][sr_idx]
    channels = 1 if ((h3 >> 6) & 0x03) == 3 else 2
    if layer == 1:
        spf = 384
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame_len = 144 * bitrate * 1000 // rate + padding
    else:  # Layer III
        spf = 1152 if version_id == 3 else 576
        frame_len = (144 if version_id == 3 else 72) * bitrate * 1000 // rate + padding
    return version_id, layer, bitrate, rate, channels, frame_len, spf


def mp3_metadata(payload: bytes) -> tuple[str, int, int, int, int, int, int, bool]:
    """(mpeg_version, layer, bitrate_kbps, sample_rate, channels,
    n_frames, duration_ms, truncated) from an MPEG audio stream via a
    frame walk — headers only, no audio decoding.

    - Skips a leading ID3v2 tag (syncsafe 28-bit size; footer flag adds
      10 bytes per the ID3v2.4 spec).
    - First frame header after the tag defines version/layer/bitrate/
      rate/channels; n_frames counts COMPLETE frames present (CBR frame
      walk), duration_ms = n_frames · samples_per_frame · 1000 // rate.
    - truncated=True when the ID3 tag or a frame overruns the buffer,
      or a later frame position holds garbage — the quarantine signal.

    Raises ValueError only when the payload is not MPEG audio at all
    (no ID3v2 tag and no valid frame sync at offset 0)."""
    pos = 0
    n = len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("not MPEG audio (bare ID3 fragment)")
        flags = payload[5]
        size = (
            ((payload[6] & 0x7F) << 21)
            | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7)
            | (payload[9] & 0x7F)
        )
        pos = 10 + size + (10 if flags & 0x10 else 0)
        if pos >= n:
            return "", 0, 0, 0, 0, 0, 0, True  # tag overruns: truncated
        first = _mp3_frame_header(payload, pos)
        if first is None:
            return "", 0, 0, 0, 0, 0, 0, True  # tag ok, garbage after
    else:
        first = _mp3_frame_header(payload, 0)
        if first is None:
            raise ValueError("not MPEG audio (no ID3v2 tag or frame sync)")
    version_id, layer, bitrate, rate, channels, _fl, spf = first
    version = {3: "1", 2: "2", 0: "2.5"}[version_id]
    n_frames = 0
    truncated = False
    while pos < n:
        hdr = _mp3_frame_header(payload, pos)
        if hdr is None:
            truncated = True  # garbage mid-stream
            break
        frame_len = hdr[5]
        if frame_len <= 0 or pos + frame_len > n:
            truncated = True  # last frame cut off
            break
        n_frames += 1
        pos += frame_len
    duration_ms = n_frames * spf * 1000 // rate
    return version, layer, bitrate, rate, channels, n_frames, duration_ms, truncated


def mp3_container(
    bitrate_kbps: int,
    sample_rate: int,
    channels: int = 2,
    n_frames: int = 4,
    id3_size: int = 0,
    truncate: bool = False,
) -> bytes:
    """A structurally valid MPEG-1 Layer III CBR stream for fixtures:
    optional ID3v2.4 tag of `id3_size` payload bytes, then `n_frames`
    frames with spec-shaped headers and sync-free filler bodies.
    truncate=True chops the final frame in half (an interrupted
    download): parsers see n_frames-1 complete frames + truncated."""
    br_idx = _MP3_BITRATE[(0, 3)].index(bitrate_kbps)
    sr_idx = _MP3_RATE[3].index(sample_rate)
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += bytes((i * 13 + 7) % 128 for i in range(id3_size))  # sync-free
    h1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, Layer III, no CRC
    h2 = (br_idx << 4) | (sr_idx << 2)  # padding 0
    h3 = (3 << 6) if channels == 1 else 0  # mono vs stereo
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    body = bytes((i * 29 + 3) % 128 for i in range(frame_len - 4))  # sync-free
    frame = bytes([0xFF, h1, h2, h3]) + body
    out += frame * n_frames
    if truncate:
        return bytes(out[: len(out) - frame_len // 2])
    return bytes(out)


def flac_streaminfo(payload: bytes) -> tuple[int, int, int, int, int, int, bool]:
    """(sample_rate, channels, bits_per_sample, total_samples,
    min_blocksize, max_blocksize, truncated) from a FLAC stream's
    STREAMINFO metadata block (public FLAC format spec: 'fLaC' magic,
    then blocks of [last-flag|type, 24-bit length]; STREAMINFO is type
    0 and always first, 34 bytes with sample_rate(20) | channels-1(3) |
    bps-1(5) | total_samples(36) packed after the block/frame-size
    fields). truncated=True when STREAMINFO itself or a later declared
    metadata block overruns the buffer. Raises ValueError when the
    payload is not FLAC (no magic or first block not STREAMINFO)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not FLAC (missing fLaC magic)")
    n = len(payload)
    if n < 8 or (payload[4] & 0x7F) != 0:
        raise ValueError("not FLAC (first metadata block is not STREAMINFO)")
    (blen,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if blen != 34 or 8 + blen > n:
        return 0, 0, 0, 0, 0, 0, True
    si = payload[8 : 8 + 34]
    min_block, max_block = struct.unpack(">HH", si[0:4])
    packed = int.from_bytes(si[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x07) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & ((1 << 36) - 1)
    truncated = False
    pos = 8 + 34
    last = bool(payload[4] & 0x80)
    while not last:
        if pos + 4 > n:
            truncated = True
            break
        last = bool(payload[pos] & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        pos += 4 + blen
        if pos > n:
            truncated = True
            break
    return sample_rate, channels, bps, total_samples, min_block, max_block, truncated


def flac_container(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    truncate: bool = False,
) -> bytes:
    """A structurally valid FLAC header for fixtures: magic, STREAMINFO
    (block sizes 4096/4096, zero frame sizes, MD5 zeros), one PADDING
    block, and 8 filler bytes standing in for audio frames.
    truncate=True declares a 64-byte PADDING block but emits only 10
    of it — a mid-metadata interrupted download."""
    if not (1 <= channels <= 8 and 4 <= bits_per_sample <= 32):
        raise ValueError("channels 1-8, bps 4-32")
    if total_samples >= 1 << 36 or sample_rate >= 1 << 20:
        raise ValueError("field overflow")
    out = bytearray(b"fLaC")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    si = struct.pack(">HH", 4096, 4096) + bytes(6) + packed.to_bytes(8, "big") + bytes(16)
    assert len(si) == 34
    out += b"\x00" + (34).to_bytes(3, "big") + si  # STREAMINFO, not last
    if truncate:
        out += b"\x81" + (64).to_bytes(3, "big") + bytes(10)  # declared 64, cut
        return bytes(out)
    out += b"\x81" + (16).to_bytes(3, "big") + bytes(16)  # last PADDING
    out += bytes((i * 41 + 5) % 256 for i in range(8))  # frame filler
    return bytes(out)

# ------------------------------------------------------- MP4 (ISO-BMFF)

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end, truncated_here) for each
    ISO-BMFF box in payload[start:end] (ISO/IEC 14496-12 §4.2):
    [size:u32 BE][type:4], size==1 -> u64 largesize follows, size==0 ->
    box runs to the end of the enclosing scope. A declared size that
    overruns the scope, or a sub-8-byte header fragment, stops the walk
    with truncated_here=True on a sentinel row."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            yield b"", pos, end, True
            return
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        fourcc = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                yield b"", pos, end, True
                return
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            yield fourcc, body, end, True
            return
        yield fourcc, body, pos + size, False
        pos += size


def mp4_metadata(
    payload: bytes,
) -> tuple[str, int, int, int, int, int, int, int, str, bool]:
    """(brand, timescale, duration_ms, n_tracks, has_video, has_audio,
    width, height, video_codec, truncated) from an MP4/ISO-BMFF
    container via a box walk — headers only, no sample data touched
    (the same O(header-bytes) discipline as jpeg_metadata's marker walk
    and mp3_metadata's frame walk; reference parity: the ETL shim at
    /root/reference/adffunction/__init__.py:117 never inspects binary
    payloads at all — this is the crawl-triage capability it lacks).

    - ftyp major_brand identifies the flavor (isom/mp42/...).
    - moov/mvhd gives the presentation timescale + duration (version 0
      u32 fields or version 1 u64 — both handled);
      duration_ms = duration·1000 // timescale.
    - each trak contributes: tkhd 16.16 fixed-point width/height,
      mdia/hdlr handler ('vide'/'soun'), stbl/stsd first sample-entry
      fourcc (avc1/hvc1/mp4a/...). width/height/video_codec come from
      the FIRST video track; has_audio flags any 'soun' track.
    - truncated=True when any declared box size overruns its enclosing
      scope (interrupted download) — the quarantine signal, never an
      exception.

    Raises ValueError only when the payload is not ISO-BMFF at all (no
    ftyp box at offset 0)."""
    if payload[4:8] != b"ftyp" or len(payload) < 16:
        raise ValueError("not ISO-BMFF (no ftyp box at offset 0)")
    brand = payload[8:12].decode("latin-1")
    timescale = duration = 0
    n_tracks = 0
    has_video = has_audio = 0
    width = height = 0
    video_codec = ""
    truncated = False

    def walk_trak(b0: int, b1: int):
        nonlocal truncated
        t_handler = b""
        t_w = t_h = 0
        t_codec = ""
        stack = [(b0, b1)]
        while stack:
            s0, s1 = stack.pop()
            for cc, c0, c1, trunc in _mp4_boxes(payload, s0, s1):
                if trunc:
                    truncated = True
                    continue
                if cc in _MP4_CONTAINERS:
                    stack.append((c0, c1))
                elif cc == b"tkhd" and c1 - c0 >= 4:
                    ver = payload[c0]
                    # ver0: 4 + cre4 + mod4 + id4 + res4 + dur4 + res8 +
                    # layer2 + group2 + vol2 + res2 + matrix36 = 76 to w/h
                    off = c0 + (76 if ver == 0 else 88)
                    if off + 8 <= c1:
                        t_w = struct.unpack(">I", payload[off : off + 4])[0] >> 16
                        t_h = struct.unpack(">I", payload[off + 4 : off + 8])[0] >> 16
                    else:
                        truncated = True
                elif cc == b"hdlr" and c1 - c0 >= 12:
                    t_handler = payload[c0 + 8 : c0 + 12]
                elif cc == b"stsd" and c1 - c0 >= 16:
                    # fullbox(4) + entry_count(4) + first entry header
                    t_codec = payload[c0 + 12 : c0 + 16].decode("latin-1")
        return t_handler, t_w, t_h, t_codec

    for cc, b0, b1, trunc in _mp4_boxes(payload, 0, len(payload)):
        if trunc:
            truncated = True
            break
        if cc == b"moov":
            for mc, m0, m1, mtr in _mp4_boxes(payload, b0, b1):
                if mtr:
                    truncated = True
                    break
                if mc == b"mvhd" and m1 - m0 >= 4:
                    ver = payload[m0]
                    if ver == 1 and m0 + 32 <= m1:
                        timescale = struct.unpack(">I", payload[m0 + 20 : m0 + 24])[0]
                        duration = struct.unpack(">Q", payload[m0 + 24 : m0 + 32])[0]
                    elif ver == 0 and m0 + 20 <= m1:
                        timescale = struct.unpack(">I", payload[m0 + 12 : m0 + 16])[0]
                        duration = struct.unpack(">I", payload[m0 + 16 : m0 + 20])[0]
                    else:
                        truncated = True
                elif mc == b"trak":
                    n_tracks += 1
                    handler, t_w, t_h, t_codec = walk_trak(m0, m1)
                    if handler == b"vide":
                        if not has_video:
                            width, height, video_codec = t_w, t_h, t_codec
                        has_video = 1
                    elif handler == b"soun":
                        has_audio = 1
    duration_ms = duration * 1000 // timescale if timescale else 0
    return (
        brand, timescale, duration_ms, n_tracks, has_video, has_audio,
        width, height, video_codec, truncated,
    )


def _mp4_box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def mp4_container(
    brand: str = "isom",
    timescale: int = 1000,
    duration: int = 5000,
    video: tuple[int, int, str] | None = (640, 480, "avc1"),
    audio: bool = False,
    mdat_size: int = 32,
    truncate: bool = False,
) -> bytes:
    """A structurally valid ISO-BMFF container for fixtures: ftyp +
    moov{mvhd, trak{tkhd, mdia{hdlr, minf{stbl{stsd}}}}...} + mdat.
    `video` adds a 'vide' track with the given (width, height, fourcc);
    `audio` adds a 'soun'/mp4a track. truncate=True declares the mdat
    box 64 bytes larger than the emitted body — an interrupted
    download: the box walk sees the overrun and flags truncated."""
    mvhd = bytes(4) + bytes(8) + struct.pack(">II", timescale, duration) + bytes(80)
    moov_children = _mp4_box(b"mvhd", mvhd)

    def trak(handler: bytes, w: int, h: int, codec: bytes) -> bytes:
        tkhd = bytes(4) + bytes(72) + struct.pack(">II", w << 16, h << 16)
        hdlr = bytes(4) + bytes(4) + handler + bytes(12) + b"\x00"
        entry = _mp4_box(codec, bytes(6) + struct.pack(">H", 1))
        stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", _mp4_box(b"hdlr", hdlr) + minf)
        return _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)

    if video is not None:
        w, h, codec = video
        moov_children += trak(b"vide", w, h, codec.encode("latin-1"))
    if audio:
        moov_children += trak(b"soun", 0, 0, b"mp4a")
    out = bytearray()
    out += _mp4_box(b"ftyp", brand.encode("latin-1")[:4].ljust(4) + bytes(4))
    out += _mp4_box(b"moov", moov_children)
    body = bytes((i * 37 + 11) % 256 for i in range(mdat_size))
    if truncate:
        out += struct.pack(">I", mdat_size + 64 + 8) + b"mdat" + body
    else:
        out += _mp4_box(b"mdat", body)
    return bytes(out)

# ---------------------------------------------------------------- PDF

_PDF_TEXT_RE = None  # compiled lazily so import stays cheap


def pdf_metadata(
    payload: bytes,
) -> tuple[str, int, int, int, int, str, bool]:
    """(version, n_pages, has_text, has_images, encrypted, producer,
    truncated) from a PDF via a structural scan — no rendering, no
    decompression beyond looking at raw stream bytes. Crawl corpora
    are full of PDFs; the quality floor needs to know which have a
    usable text layer vs scanned-image-only, and which are encrypted
    or cut off, BEFORE a costly extract step.

    - version from the '%PDF-1.x' header comment.
    - n_pages counts '/Type /Page' page objects (the standard triage
      heuristic; object-stream-compressed pages are out of scope the
      same way interlaced PNG is for png_decode — documented, caller
      falls back).
    - has_text: a BT...ET text block containing a Tj/TJ show operator.
    - has_images: any '/Subtype /Image' XObject.
    - encrypted: an '/Encrypt' entry in a trailer dictionary.
    - producer: the literal-string '/Producer (...)' value, '' if
      absent (escaped parens honored).
    - truncated: no '%%EOF' marker in the final bytes, or 'startxref'
      pointing past the end of the buffer — an interrupted download.

    Raises ValueError only when the payload has no %PDF- header at
    offset 0 (after an optional UTF-8 BOM)."""
    import re

    global _PDF_TEXT_RE
    if _PDF_TEXT_RE is None:
        _PDF_TEXT_RE = re.compile(
            rb"BT(?:(?!ET).){0,2000}?(?:\)\s*Tj|\]\s*TJ)", re.S
        )
    b = payload[3:] if payload[:3] == b"\xef\xbb\xbf" else payload
    if b[:5] != b"%PDF-":
        raise ValueError("not PDF (missing %PDF- header)")
    version = b[5:8].decode("latin-1", "replace")
    n_pages = len(re.findall(rb"/Type\s*/Page(?![s\w])", b))
    has_text = 1 if _PDF_TEXT_RE.search(b) else 0
    has_images = 1 if re.search(rb"/Subtype\s*/Image(?!\w)", b) else 0
    encrypted = 1 if re.search(rb"/Encrypt(?!\w)", b) else 0
    producer = ""
    mprod = re.search(rb"/Producer\s*\(((?:[^()\\]|\\.)*)\)", b)
    if mprod:
        producer = re.sub(rb"\\(.)", rb"\1", mprod.group(1)).decode(
            "latin-1", "replace"
        )
    truncated = b.rstrip().endswith(b"%%EOF") is False
    msx = None
    for msx in re.finditer(rb"startxref\s+(\d+)", b):
        pass
    if msx is not None and int(msx.group(1)) >= len(b):
        truncated = True
    return version, n_pages, has_text, has_images, encrypted, producer, truncated


def pdf_container(
    n_pages: int = 1,
    with_text: bool = True,
    with_image: bool = False,
    encrypted: bool = False,
    producer: str = "engine",
    truncate: bool = False,
) -> bytes:
    """A structurally valid single-xref PDF for fixtures: catalog,
    page tree, `n_pages` page objects each with an uncompressed
    content stream (a BT/Tj text block when `with_text`, a Do image
    paint + 1x1 gray /Image XObject when `with_image`), an /Info
    dictionary carrying /Producer, an optional stub /Encrypt entry in
    the trailer, and a correct xref table. truncate=True drops the
    trailer tail from 'startxref' on — the interrupted-download shape
    pdf_metadata must flag, not crash on."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids = []
    content_ids = []
    img_id = None
    if with_image:
        img_id = add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>"
            b"\nstream\n\x80\nendstream"
        )
    for p in range(n_pages):
        parts = []
        if with_text:
            parts.append(b"BT /F1 12 Tf 72 720 Td (page %d) Tj ET" % p)
        if with_image:
            parts.append(b"q 100 0 0 100 72 500 cm /Im0 Do Q")
        stream = b" ".join(parts) if parts else b""
        content_ids.append(
            add(
                b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(stream), stream)
            )
        )
    pages_id = len(objs) + n_pages + 1  # page objs next, then tree
    for p in range(n_pages):
        res = b"/Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >>"
        if with_image:
            res += b" /XObject << /Im0 %d 0 R >>" % img_id
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792]"
                b" /Resources << %s >> /Contents %d 0 R >>"
                % (pages_id, res, content_ids[p])
            )
        )
    kids = b" ".join(b"%d 0 R" % i for i in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    ) == pages_id
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    esc = producer.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    info_id = add(b"<< /Producer (%s) >>" % esc.encode("latin-1"))
    enc_id = add(b"<< /Filter /Standard /V 1 /R 2 >>") if encrypted else None

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root %d 0 R /Info %d 0 R" % (
        len(objs) + 1, catalog_id, info_id,
    )
    if enc_id:
        trailer += b" /Encrypt %d 0 R" % enc_id
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    if truncate:
        return bytes(out[: out.rindex(b"startxref")])
    return bytes(out)

# ------------------------------------------------------ MKV (EBML)

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _ebml_vint(b: bytes, pos: int, keep_marker: bool):
    """Parse one EBML variable-length integer at pos. Returns
    (value, next_pos) or None on truncation/invalid. IDs keep the
    length-marker bit (keep_marker=True); sizes strip it. A size
    whose value bits are ALL ones means 'unknown size' -> returned
    as -1."""
    if pos >= len(b):
        return None
    first = b[pos]
    if first == 0:
        return None
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(b):
        return None
    if keep_marker:
        val = int.from_bytes(b[pos : pos + length], "big")
    else:
        val = first & (mask - 1)
        for i in range(1, length):
            val = (val << 8) | b[pos + i]
        if val == (1 << (7 * length)) - 1:  # all value bits set
            val = -1  # 'unknown size' per the EBML spec
    return val, pos + length



def mkv_metadata(
    payload: bytes,
) -> tuple[str, int, int, int, int, int, int, str, bool]:
    """(doctype, duration_ms, n_tracks, has_video, has_audio, width,
    height, video_codec, truncated) from a Matroska/WebM container
    via an EBML element walk — headers only, Clusters never entered
    (the same O(header-bytes) discipline as mp4_metadata's box walk).

    - EBML header DocType ('matroska'/'webm') identifies the flavor.
    - Segment/Info: TimestampScale (ns per unit, default 1e6) +
      Duration (float units); duration_ms = duration·scale // 1e6.
    - Segment/Tracks/TrackEntry: TrackType (1=video, 2=audio),
      CodecID, Video/PixelWidth+PixelHeight. width/height/codec from
      the FIRST video track.
    - truncated=True when a declared element size overruns the
      buffer (unknown-size elements at top level are tolerated —
      live-streamed Segments use them).

    Raises ValueError only when the payload has no EBML magic at
    offset 0."""
    if payload[:4] != _EBML_MAGIC:
        raise ValueError("not EBML (missing \\x1aE\\xdf\\xa3 magic)")
    n = len(payload)
    doctype = ""
    timescale = 1000000
    duration_units = 0.0
    n_tracks = 0
    has_video = has_audio = 0
    width = height = 0
    video_codec = ""
    truncated = False

    # TrackEntry bodies carry dims nested under Video settings (0xE0);
    # a dedicated local parser keeps the routing explicit
    def walk_track(b0: int, b1: int):
        nonlocal truncated
        t_type = 0
        t_codec = ""
        t_w = t_h = 0
        pos = b0
        while pos < b1:
            rid = _ebml_vint(payload, pos, keep_marker=True)
            if rid is None:
                truncated = True
                break
            eid, p2 = rid
            rsz = _ebml_vint(payload, p2, keep_marker=False)
            if rsz is None:
                truncated = True
                break
            size, body = rsz
            data_end = b1 if size == -1 else body + size
            if data_end > b1:
                truncated = True
                break
            if eid == 0x83:
                t_type = int.from_bytes(payload[body:data_end], "big")
            elif eid == 0x86:
                t_codec = payload[body:data_end].split(b"\x00")[0].decode(
                    "latin-1"
                )
            elif eid == 0xE0:
                q = body
                while q < data_end:
                    rid2 = _ebml_vint(payload, q, keep_marker=True)
                    if rid2 is None:
                        truncated = True
                        break
                    eid2, q2 = rid2
                    rsz2 = _ebml_vint(payload, q2, keep_marker=False)
                    if rsz2 is None:
                        truncated = True
                        break
                    sz2, bd2 = rsz2
                    de2 = data_end if sz2 == -1 else bd2 + sz2
                    if de2 > data_end:
                        truncated = True
                        break
                    if eid2 == 0xB0:
                        t_w = int.from_bytes(payload[bd2:de2], "big")
                    elif eid2 == 0xBA:
                        t_h = int.from_bytes(payload[bd2:de2], "big")
                    q = de2
            pos = data_end
        return t_type, t_codec, t_w, t_h

    # top-level walk with explicit TrackEntry handling
    def walk_top(start: int, end: int):
        nonlocal doctype, timescale, duration_units, n_tracks
        nonlocal has_video, has_audio, width, height, video_codec, truncated
        pos = start
        while pos < end:
            rid = _ebml_vint(payload, pos, keep_marker=True)
            if rid is None:
                truncated = True
                break
            eid, p2 = rid
            rsz = _ebml_vint(payload, p2, keep_marker=False)
            if rsz is None:
                truncated = True
                break
            size, body = rsz
            data_end = end if size == -1 else body + size
            if data_end > end:
                truncated = True
                break
            if eid == 0x1A45DFA3 or eid in (0x18538067, 0x1549A966, 0x1654AE6B):
                walk_top(body, data_end)
            elif eid == 0x4282:
                doctype = payload[body:data_end].split(b"\x00")[0].decode(
                    "latin-1"
                )
            elif eid == 0x2AD7B1:
                timescale = int.from_bytes(payload[body:data_end], "big")
            elif eid == 0x4489:
                raw = payload[body:data_end]
                if len(raw) == 4:
                    duration_units = struct.unpack(">f", raw)[0]
                elif len(raw) == 8:
                    duration_units = struct.unpack(">d", raw)[0]
            elif eid == 0xAE:
                n_tracks += 1
                t_type, t_codec, t_w, t_h = walk_track(body, data_end)
                if t_type == 1:
                    if not has_video:
                        width, height, video_codec = t_w, t_h, t_codec
                    has_video = 1
                elif t_type == 2:
                    has_audio = 1
            pos = data_end

    walk_top(0, n)
    duration_ms = int(duration_units * timescale) // 1000000
    return (
        doctype, duration_ms, n_tracks, has_video, has_audio,
        width, height, video_codec, truncated,
    )


def _ebml_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _ebml_size(n: int) -> bytes:
    """Encode n as a minimal EBML size varint."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            val = n | (1 << (7 * length))
            return val.to_bytes(length, "big")
    raise ValueError("size too large")


def _ebml_elem(eid: int, body: bytes) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(body)) + body


def mkv_container(
    doctype: str = "matroska",
    timescale: int = 1000000,
    duration_ms: int = 5000,
    video: tuple[int, int, str] | None = (640, 480, "V_VP9"),
    audio: bool = False,
    truncate: bool = False,
) -> bytes:
    """A structurally valid Matroska/WebM header for fixtures: EBML
    header (DocType), Segment{Info{TimestampScale, Duration},
    Tracks{TrackEntry...}}, and a Cluster stub. With the default
    1 ms-per-unit TimestampScale the float Duration carries integral
    ms, so parsers recover duration_ms exactly. truncate=True
    declares the Cluster 64 bytes longer than emitted."""
    header = _ebml_elem(
        0x1A45DFA3, _ebml_elem(0x4282, doctype.encode("latin-1"))
    )
    info = _ebml_elem(
        0x1549A966,
        _ebml_elem(0x2AD7B1, timescale.to_bytes(4, "big"))
        + _ebml_elem(
            0x4489,
            struct.pack(">d", float(duration_ms * 1000000 // timescale)),
        ),
    )
    tracks_body = b""
    if video is not None:
        w, h, codec = video
        tracks_body += _ebml_elem(
            0xAE,
            _ebml_elem(0x83, b"\x01")
            + _ebml_elem(0x86, codec.encode("latin-1"))
            + _ebml_elem(
                0xE0,
                _ebml_elem(0xB0, w.to_bytes(2, "big"))
                + _ebml_elem(0xBA, h.to_bytes(2, "big")),
            ),
        )
    if audio:
        tracks_body += _ebml_elem(
            0xAE,
            _ebml_elem(0x83, b"\x02") + _ebml_elem(0x86, b"A_OPUS"),
        )
    tracks = _ebml_elem(0x1654AE6B, tracks_body)
    cluster_body = bytes((i * 31 + 9) % 256 for i in range(24))
    if truncate:
        cluster = (
            _ebml_id(0x1F43B675)
            + _ebml_size(len(cluster_body) + 64)
            + cluster_body
        )
    else:
        cluster = _ebml_elem(0x1F43B675, cluster_body)
    segment = _ebml_elem(0x18538067, info + tracks + cluster)
    return header + segment


# --------------------------------------------------------------- GIF triage


def gif_metadata(payload: bytes) -> tuple[str, int, int, int, int, int, bool]:
    """(version, width, height, n_frames, animated, loop_count,
    truncated) from a GIF87a/GIF89a stream via a block walk — headers
    and block framing only, LZW pixel data skipped sub-block by
    sub-block (the jpeg_metadata marker-walk discipline; reference
    parity: /root/reference/adffunction/__init__.py:117 never inspects
    binary payloads — this is crawl-triage capability it lacks).

    - logical screen descriptor: width/height u16 LE, global color
      table skipped by its declared 2^(N+1)·3 size;
    - 0x21 extensions: NETSCAPE2.0 application extension supplies the
      animation loop count (0 = infinite); all sub-blocks walked by
      length byte;
    - 0x2C image descriptors counted as frames (local color tables
      skipped by declared size);
    - 0x3B trailer ends the stream; running out of bytes first →
      truncated=True (interrupted download), never an exception.
    animated = NETSCAPE extension present or more than one frame.

    Raises ValueError only when the payload is not GIF at all."""
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (
        b"87a", b"89a",
    ):
        raise ValueError("not a GIF stream")
    version = payload[3:6].decode("latin-1")
    width, height = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    loop_count = -1
    has_netscape = False
    truncated = False
    saw_trailer = False

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                return -1
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            if p + ln > len(payload):
                return -1
            p += ln

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            saw_trailer = True
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                truncated = True
                break
            label = payload[pos]
            pos += 1
            if label == 0xFF and pos < len(payload) and payload[pos] == 11:
                app = payload[pos + 1 : pos + 12]
                if app == b"NETSCAPE2.0" and pos + 15 < len(payload):
                    has_netscape = True
                    # loop count lives in the FIRST data sub-block only
                    # when that sub-block is the looping variant: length
                    # byte 3, sub-block id 1. A conforming GIF may carry
                    # a different first sub-block (e.g. the buffering
                    # variant, id 2) — report loop_count = -1 (unknown)
                    # rather than unpacking garbage at a fixed offset.
                    if payload[pos + 12] == 3 and payload[pos + 13] == 1:
                        loop_count = struct.unpack(
                            "<H", payload[pos + 14 : pos + 16]
                        )[0]
            pos = skip_subblocks(pos)
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                truncated = True
                break
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            n_frames += 1
            pos = skip_subblocks(pos)
        else:
            truncated = True
            break
        if pos < 0:
            truncated = True
            break
    if not saw_trailer and not truncated:
        truncated = True
    animated = int(has_netscape or n_frames > 1)
    return version, width, height, n_frames, animated, loop_count, truncated


def gif_container(
    version: str = "89a",
    width: int = 64,
    height: int = 64,
    n_frames: int = 1,
    netscape_loop: int | None = None,
    gct_bits: int = 1,
    truncate: bool = False,
) -> bytes:
    """Deterministic GIF fixture builder for gif_metadata's
    differential tests: header + LSD with a global color table,
    optional NETSCAPE2.0 loop extension, n_frames full-size image
    descriptors each carrying one 4-byte LZW sub-block."""
    out = bytearray()
    out += b"GIF" + version.encode("latin-1")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (gct_bits & 0x07), 0, 0])
    n_colors = 2 << (gct_bits & 0x07)
    out += bytes((3 * j) % 256 for j in range(3 * n_colors))
    if netscape_loop is not None:
        out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", netscape_loop) + bytes([0])
    for k in range(n_frames):
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0])  # no local color table
        out += bytes([2])  # LZW minimum code size
        out += bytes([4, (k + 1) % 256, (k + 7) % 256, 0x44, 0x01, 0])
    out += bytes([0x3B])
    if truncate:
        return bytes(out[: max(14, len(out) - 10)])
    return bytes(out)


# ----------------------------------------------------- ZIP / OOXML triage


def zip_metadata(
    payload: bytes,
) -> tuple[str, int, int, int, int, bool]:
    """(kind, n_entries, total_uncompressed, total_compressed,
    has_content_types, truncated) from a ZIP archive via the central
    directory — the container walk a DOCUMENT pipeline needs before
    extraction: modern office formats (docx/xlsx/pptx) are ZIP
    archives, and the central directory names classify them without
    decompressing a byte.

    - EOCD record (PK\\x05\\x06) located from the tail (its comment is
      bounded at 64 KiB by the format); a stream that starts with a
      local header (PK\\x03\\x04) but lost its EOCD is an interrupted
      download → truncated=True with zeroed stats, never an exception;
    - central headers (PK\\x01\\x02) supply per-entry compressed /
      uncompressed sizes and names; a header overrunning the buffer →
      truncated=True;
    - kind: 'docx' / 'xlsx' / 'pptx' when [Content_Types].xml is
      present with the corresponding part prefix (word/, xl/, ppt/),
      else 'zip'.

    Raises ValueError only when the payload is not ZIP at all."""
    eocd = payload.rfind(b"PK\x05\x06", max(0, len(payload) - 66000))
    if eocd < 0:
        if payload[:4] == b"PK\x03\x04":
            return "zip", 0, 0, 0, 0, True
        raise ValueError("not a ZIP archive")
    if eocd + 22 > len(payload):
        return "zip", 0, 0, 0, 0, True
    n_entries = struct.unpack("<H", payload[eocd + 10 : eocd + 12])[0]
    cd_off = struct.unpack("<I", payload[eocd + 16 : eocd + 20])[0]
    pos = cd_off
    total_unc = total_comp = 0
    names = []
    truncated = False
    for _ in range(n_entries):
        if pos + 46 > len(payload) or payload[pos : pos + 4] != b"PK\x01\x02":
            truncated = True
            break
        comp = struct.unpack("<I", payload[pos + 20 : pos + 24])[0]
        unc = struct.unpack("<I", payload[pos + 24 : pos + 28])[0]
        fnlen, extlen, cmtlen = struct.unpack("<HHH", payload[pos + 28 : pos + 34])
        if pos + 46 + fnlen > len(payload):
            truncated = True
            break
        names.append(payload[pos + 46 : pos + 46 + fnlen].decode("latin-1"))
        total_comp += comp
        total_unc += unc
        pos += 46 + fnlen + extlen + cmtlen
    has_ct = int("[Content_Types].xml" in names)
    kind = "zip"
    if has_ct:
        if any(n.startswith("word/") for n in names):
            kind = "docx"
        elif any(n.startswith("xl/") for n in names):
            kind = "xlsx"
        elif any(n.startswith("ppt/") for n in names):
            kind = "pptx"
    return kind, n_entries, total_unc, total_comp, has_ct, truncated


def zip_container(
    kind: str = "zip",
    n_extra: int = 2,
    seed: int = 0,
    truncate: bool = False,
) -> bytes:
    """Deterministic ZIP fixture builder (stdlib zipfile, STORED
    entries, pinned timestamps) for zip_metadata's differential tests.
    kind 'docx'/'xlsx'/'pptx' adds [Content_Types].xml plus the
    classifying part; n_extra numbered payload entries follow, each
    with formula-derived content f'content {seed} {j}'."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        def put(name: str, data: bytes) -> None:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data)

        if kind in ("docx", "xlsx", "pptx"):
            put("[Content_Types].xml", b"<Types/>")
            part = {"docx": "word/document.xml", "xlsx": "xl/workbook.xml",
                    "pptx": "ppt/presentation.xml"}[kind]
            put(part, f"<root seed='{seed}'/>".encode())
        for j in range(n_extra):
            put(f"data/part{j}.txt", f"content {seed} {j}".encode())
    raw = buf.getvalue()
    if truncate:
        return raw[: max(8, len(raw) - 30)]
    return raw
