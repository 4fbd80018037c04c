"""Multimodal columns: opaque binary media + typed metadata + REAL codecs.

Extensions beyond the reference (per the build brief). Image/audio/video
payloads are opaque `binary` columns with a typed metadata struct; the
Spark-side machinery — schema, partition sizing, mapInPandas batch shape,
UDF signatures — is real and tested.

Codec status (round 2 — no longer stubbed):
  WAV  REAL decode via the stdlib `wave` module + numpy PCM parsing
       (channels, sample rate, duration, RMS/peak features).
  PNG  REAL decode AND encode in pure stdlib+numpy: zlib-inflated IDAT,
       full scanline unfiltering (none/sub/up/average/paeth) for 8-bit
       gray/RGB/RGBA non-interlaced images; encode writes filter-0 rows.
       Enables a real nearest-neighbor `resize` round-trip.
  BMP  REAL decode (uncompressed 8-bit paletted / 24-bit / 32-bit,
       bottom-up and top-down, 4-byte row padding, BGR(A)->RGB(A)) and
       24-bit encode — round 3.
  GIF  REAL decode (GIF87a/89a first frame: global/local color tables,
       extension skipping, interlace, full variable-width LZW with the
       deferred-clear quirk) and single-frame encode (exact for <=256
       distinct colors) — round 3.
  JPEG REAL baseline-DCT decode (T.81 SOF0/SOF1: Huffman scans, DQT/DHT
       parsing, arbitrary chroma sampling with replication upsample,
       restart markers, byte unstuffing) plus a minimal spec-compliant
       4:4:4 flat-quant encoder as the in-sandbox round-trip partner —
       round 4. Progressive (SOF2) / arithmetic / 12-bit raise
       NotImplementedError.
  MP3  REAL header-metadata parsing (round 4): MPEG-1 Layer III frame
       walk (ID3v2 skip, per-frame bitrate -> true VBR mean, duration
       from frame count) — the facts a 100 TB pipeline filters on,
       without PCM decode. PCM itself stays NotImplementedError.
  MP4  REAL container metadata (round 4): ISO-BMFF box walk (64-bit
       largesize, mvhd v0/v1 -> duration/timescale, trak count). Pixel
       decode stays NotImplementedError.
  other formats need codec libraries this container does not ship:
       decode raises NotImplementedError unless `deterministic_fake=True`
       (seed-stable fake features so pipelines exercise end-to-end).
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# --------------------------------------------------------------------------
# PNG codec (pure stdlib + numpy)
# --------------------------------------------------------------------------


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit gray/RGB/RGBA non-interlaced PNG to (H, W, C) uint8.

    Real decoder: parses chunks, inflates IDAT, and reverses the five
    scanline filters per the PNG spec §9 (numpy row loop — rows depend on
    the previous reconstructed row, so the loop is inherent)."""
    if payload[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos < len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise NotImplementedError("only 8-bit non-interlaced PNG supported")
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise NotImplementedError("PNG missing IHDR")
    w, h, c = meta
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * c + 1
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * c), dtype=np.uint8)
    for y in range(h):
        filt, line = rows[y, 0], rows[y, 1:].astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y else np.zeros(w * c, dtype=np.int16)
        cur = np.zeros(w * c, dtype=np.int16)
        if filt == 0:  # none
            cur = line
        elif filt == 2:  # up
            cur = (line + prev) & 0xFF
        else:  # sub / average / paeth need the left pixel -> scalar loop
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                if filt == 1:
                    rec = line[i] + a
                elif filt == 3:
                    rec = line[i] + ((a + b) >> 1)
                else:  # paeth
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec = line[i] + pred
                cur[i] = rec & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C in 1/2/3/4) as a filter-0 PNG."""
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (index arithmetic, no interpolation libs)."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


# --------------------------------------------------------------------------
# BMP codec (pure stdlib + numpy; round 3)
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) 8/24/32-bit BMP to (H, W, C) uint8.

    Handles the standard BITMAPINFOHEADER layout: 4-byte-aligned
    bottom-up rows (or top-down when height < 0), BGR(A) channel order
    converted to RGB(A), and the 8-bit paletted form via its BGRA color
    table. Anything else (RLE, 16-bit, core headers) raises
    NotImplementedError."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if planes != 1 or compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"only uncompressed 8/24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * bpp // 8 + 3) & ~3  # rows pad to 4-byte boundaries
    pix = payload[data_off : data_off + stride * h]
    if len(pix) < stride * h:
        raise NotImplementedError("truncated BMP pixel data")
    rows = np.frombuffer(pix, dtype=np.uint8).reshape(h, stride)
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA table -> RGB
        out = pal[rows[:, :w]]
    else:
        c = bpp // 8
        img = rows[:, : w * c].reshape(h, w, c)
        out = img[:, :, [2, 1, 0]] if c == 3 else img[:, :, [2, 1, 0, 3]]
    return out if top_down else out[::-1]


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an uncompressed 24-bit bottom-up BMP."""
    h, w, c = pixels.shape
    if c != 3:
        raise NotImplementedError("encode_bmp writes 24-bit RGB only")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB->BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# --------------------------------------------------------------------------
# GIF codec (pure stdlib + numpy; round 3) — full LZW per GIF89a spec
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF-variant LZW: LSB-first variable-width codes, code width grows
    when the next free slot reaches 2^width, table caps at 4096 until a
    CLEAR code (deferred-clear quirk)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    size = mcs + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    # sliding bit-buffer (<= 19 bits live at any time): O(bytes) total,
    # unlike shifting one whole-stream bigint per code (O(bytes^2) — fine
    # for test GIFs, pathological on multi-megabyte frames)
    acc, nbits, byte_pos, n_bytes = 0, 0, 0, len(data)
    while True:
        while nbits < size and byte_pos < n_bytes:
            acc |= data[byte_pos] << nbits
            byte_pos += 1
            nbits += 8
        if nbits < size:
            break
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            size, prev = mcs + 1, None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK special case
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << size) and size < 12:
                size += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """Spec-correct GIF LZW encoder mirroring _lzw_decode's width growth."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code, size = end + 1, mcs + 1
    acc, nbits = 0, 0
    chunks = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size

    emit(clear)
    buf: tuple[int, ...] = ()
    for p in indices:
        cand = buf + (p,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder grows its width one code LATER than the assignment,
            # so the encoder switches as soon as next_code passes 2^size
            if next_code == (1 << size) + 1 and size < 12:
                size += 1
        else:  # table full: clear and restart
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code, size = end + 1, mcs + 1
        buf = (p,)
    if buf:
        emit(table[buf])
    emit(end)
    chunks[:] = acc.to_bytes((nbits + 7) // 8, "little")
    return bytes(chunks)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (H, W, 3) uint8 RGB.

    Real decoder: logical screen descriptor, global/local color tables,
    extension-block skipping, interlace reordering, full LZW."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise NotImplementedError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise NotImplementedError("GIF frame without a color table")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos]:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(_lzw_decode(bytes(lzw), mcs), dtype=np.int64)
            if len(idx) < w * h:
                raise NotImplementedError("truncated GIF LZW data")
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return ct[np.clip(idx, 0, len(ct) - 1)]
        elif block == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    raise NotImplementedError("GIF contains no image data")


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a single-frame GIF89a.

    Palette-quantizes to the image's distinct colors (<= 256 required —
    callers with richer images should quantize first; this keeps the
    encoder exact for round-trip testing)."""
    h, w, c = pixels.shape
    if c != 3:
        raise NotImplementedError("encode_gif writes RGB only")
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError("encode_gif requires <= 256 distinct colors")
    # color table size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((2 << (bits - 1), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, bits)  # spec: min LZW code size >= 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(mcs)
    lzw = _lzw_encode(inverse.astype(int).tolist(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# WAV codec (stdlib wave module)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to (samples float64 in [-1, 1], rate)."""
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        n, width, rate = wf.getnframes(), wf.getsampwidth(), wf.getframerate()
        raw = wf.readframes(n)
        nch = wf.getnchannels()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV not supported")
    return samples.reshape(-1, nch).mean(axis=1), rate


# --------------------------------------------------------------------------
# feature extraction
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# MP3 / MP4 container metadata (pure stdlib; round 4)
#
# Full audio/video DECODE needs codec libraries this sandbox does not
# ship — but the metadata a training-data pipeline actually filters on
# (duration, bitrate, sample rate, track count) lives in plain container
# headers. These parsers are REAL: they walk MPEG audio frame headers /
# ISO-BMFF boxes, so mp3/mp4 features are header-derived facts, not
# fakes. PCM/pixel decode for these formats still raises
# NotImplementedError (honest capability contract).
# --------------------------------------------------------------------------

_MP3_BITRATES_V1L3 = [  # kbps, MPEG-1 Layer III (index 0 = free, 15 = bad)
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_RATES_V1 = [44100, 48000, 32000]


def parse_mp3_meta(payload: bytes) -> dict:
    """Walk MPEG-1 Layer III frame headers: returns dict(bitrate_kbps
    [mean], sample_rate, n_frames, duration_ms). Frame length =
    144 * bitrate / sample_rate + padding (ISO 11172-3); VBR streams get
    the true per-frame mean because every header is visited. Raises
    ValueError when no valid frame sync is found."""
    pos, n = 0, len(payload)
    if payload[:3] == b"ID3" and n >= 10:  # skip ID3v2 tag (syncsafe size)
        size = (
            (payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F)
        )
        pos = 10 + size
    frames = 0
    bitrate_sum = 0
    sample_rate = None
    while pos + 4 <= n:
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if frames:  # trailing garbage / APE tag after last frame
                break
            pos += 1  # resync before the first frame
            continue
        version, layer = (b1 >> 3) & 3, (b1 >> 1) & 3
        if version != 3 or layer != 1:  # only MPEG-1 Layer III
            if frames:
                break
            pos += 1
            continue
        br_idx, sr_idx = (b2 >> 4) & 15, (b2 >> 2) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            if frames:
                break
            pos += 1
            continue
        bitrate = _MP3_BITRATES_V1L3[br_idx] * 1000
        sample_rate = _MP3_RATES_V1[sr_idx]
        padding = (b2 >> 1) & 1
        frame_len = 144 * bitrate // sample_rate + padding
        frames += 1
        bitrate_sum += bitrate
        pos += frame_len
    if frames == 0 or sample_rate is None:
        raise ValueError("no valid MPEG-1 Layer III frame found")
    return {
        "bitrate_kbps": bitrate_sum / frames / 1000.0,
        "sample_rate": sample_rate,
        "n_frames": frames,
        "duration_ms": frames * 1152.0 * 1000.0 / sample_rate,
    }


def parse_mp4_meta(payload: bytes) -> dict:
    """Walk top-level ISO-BMFF boxes to moov/mvhd: returns
    dict(duration_ms, timescale, n_tracks, major_brand). Handles 64-bit
    largesize boxes and mvhd versions 0/1. Raises ValueError when the
    stream has no ftyp/moov structure."""

    def boxes(data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", data[pos:pos + 4])[0]
            btype = data[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - pos
            if size < hdr:
                raise ValueError("corrupt ISO-BMFF box size")
            yield btype, pos + hdr, pos + size
            pos += size

    major_brand = None
    duration_ms = None
    timescale = None
    n_tracks = 0
    for btype, body_start, body_end in boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            major_brand = payload[body_start:body_start + 4].decode(
                "ascii", "replace"
            )
        elif btype == b"moov":
            for ctype, cstart, cend in boxes(payload, body_start, body_end):
                if ctype == b"mvhd":
                    version = payload[cstart]
                    if version == 1:
                        timescale = struct.unpack(
                            ">I", payload[cstart + 20:cstart + 24]
                        )[0]
                        duration = struct.unpack(
                            ">Q", payload[cstart + 24:cstart + 32]
                        )[0]
                    else:
                        timescale = struct.unpack(
                            ">I", payload[cstart + 12:cstart + 16]
                        )[0]
                        duration = struct.unpack(
                            ">I", payload[cstart + 16:cstart + 20]
                        )[0]
                    duration_ms = duration * 1000.0 / max(1, timescale)
                elif ctype == b"trak":
                    n_tracks += 1
    if major_brand is None or duration_ms is None:
        raise ValueError("not an ISO-BMFF stream with ftyp + moov/mvhd")
    return {
        "duration_ms": duration_ms,
        "timescale": timescale,
        "n_tracks": n_tracks,
        "major_brand": major_brand,
    }


# --------------------------------------------------------------------------
# JPEG codec (baseline JFIF, pure stdlib + numpy) — round 4
# --------------------------------------------------------------------------

# ITU-T T.81 Figure A.6 zigzag scan: scan index i -> raster position
_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: FDCT Y = C X C^T, IDCT X = C^T Y C
_DCT_C = np.array([
    [(np.sqrt(1.0 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _jpeg_huff_codes(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman map (length, code) -> symbol per T.81 Annex C."""
    codes: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return codes


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed). Raises on exhaustion — decode_features wraps it."""

    def __init__(self, data: bytes):
        self.data, self.pos, self.acc, self.n = data, 0, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self.data[self.pos]  # IndexError -> malformed
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map `size`-bit magnitude to signed."""
    return v - ((1 << size) - 1) if size and v < (1 << (size - 1)) else v


def _jpeg_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy bytes; split at RSTn markers. Returns
    (segments, position of the terminating marker's 0xFF)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n - 1:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-DCT JFIF decoder, pure stdlib+numpy (T.81 sections A/F):
    8-bit sequential Huffman scans (SOF0/SOF1), grayscale or YCbCr with
    arbitrary sampling factors (replication upsample), restart markers,
    byte unstuffing. Progressive (SOF2) / arithmetic / 12-bit raise
    NotImplementedError. Returns HxW (gray) or HxWx3 RGB uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # parameterless
            continue
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        body_end = pos + seglen
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:  # 16-bit table
                    qts[tid] = np.frombuffer(
                        seg[i:i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
                else:
                    qts[tid] = np.frombuffer(
                        seg[i:i + 64], dtype=np.uint8
                    ).astype(np.float64)
                    i += 64
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            precision, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential Huffman JPEG supported"
            )
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                vals = seg[i + 17:i + 17 + nvals]
                huff[(tc, th)] = _jpeg_huff_codes(bits, vals)
                i += 17 + nvals
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS: entropy-coded data follows the header
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)]
            segs, pos = _jpeg_entropy_segments(payload, body_end)
            break
        pos = body_end
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    tables = {cid: (huff[(0, td)], huff[(1, ta)]) for cid, td, ta in scan}
    dc_pred = {cid: 0 for cid, _, _, _ in comps}
    reader = _JpegBits(segs[0])
    seg_idx = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1  # restart: new segment, predictors reset
            reader = _JpegBits(segs[seg_idx])
            dc_pred = {cid: 0 for cid in dc_pred}
        my, mx = divmod(mcu, mcus_x)
        for cid, ch, cv, tq in comps:
            dc_t, ac_t = tables[cid]
            qt = qts[tq]
            for by in range(cv):
                for bx in range(ch):
                    zz = np.zeros(64, dtype=np.float64)
                    size = reader.huff(dc_t)
                    dc_pred[cid] += _jpeg_extend(reader.bits(size), size)
                    zz[0] = dc_pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_t)
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run == 15:  # ZRL: skip 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        zz[k] = _jpeg_extend(reader.bits(size), size)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[_JPEG_ZIGZAG] = zz * qt
                    spatial = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                    y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = spatial + 128.0
    out = []
    for cid, ch, cv, _ in comps:
        p = np.repeat(np.repeat(planes[cid], vmax // cv, 0), hmax // ch, 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# encoder-side fixed tables: simple canonical codes (valid, incomplete —
# like the Annex K standard tables, unused codewords are simply absent).
# DC: sizes 0..11 at 4 bits; AC: EOB, ZRL and (run 0-15, size 1-11) at
# 8 bits (178 <= 256). Tables are WRITTEN INTO the stream via DHT, so any
# spec-compliant decoder (including decode_jpeg above) reads them back.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 12)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS)] + [0] * 8


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self) -> None:
        """1-pad to a byte boundary (before a restart marker)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)

    def marker(self, m: int) -> None:
        """Emit a raw (unstuffed) marker at a byte boundary."""
        self.pad()
        self.out.extend((0xFF, m))

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _jpeg_mag(v: int) -> tuple[int, int]:
    """(size, size-bit code) for a signed coefficient (F.1.2.1.1)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1) & ((1 << size) - 1)


def encode_jpeg(
    pixels: np.ndarray, restart_interval: int = 0, subsample: bool = False
) -> bytes:
    """Minimal spec-compliant baseline encoder: grayscale, 4:4:4, or
    4:2:0 (subsample=True: luma 2x2 sampling factors, chroma 2x2
    block-mean downsampled — exercises the decoder's multi-block MCU
    interleave + replication upsample). Flat quantization (all ones —
    near-lossless at 4:4:4, only DCT rounding), the fixed canonical
    Huffman tables above. restart_interval > 0 writes a DRI segment and
    RSTn markers every N MCUs. Exists so the decoder has a real
    in-sandbox round-trip partner (no codec libs ship here); output
    opens in any JPEG viewer."""
    if pixels.ndim == 2:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    h, w = planes[0].shape
    nc = len(planes)
    if nc == 3 and subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1)] * nc
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    # pad the full-res image so every component tiles exactly into MCUs
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    comp_planes = []
    for p, (ch, cv) in zip(planes, factors):
        if (ch, cv) != (hmax, vmax):  # downsample by block mean
            fy, fx = vmax // cv, hmax // ch
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        comp_planes.append(p - 128.0)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, flat
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c, (ch, cv) in enumerate(factors):
        sof += bytes([c + 1, (ch << 4) | cv, 0])  # quant table 0
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS)
    seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    seg(0xDA, sos + bytes([0, 63, 0]))

    ac_code = {sym: i for i, sym in enumerate(_ENC_AC_VALS)}
    wtr = _JpegBitWriter()
    dc_pred = [0] * nc

    def emit_block(c: int, plane: np.ndarray, by8: int, bx8: int) -> None:
        block = plane[by8:by8 + 8, bx8:bx8 + 8]
        coefs = _DCT_C @ block @ _DCT_C.T
        zz = np.rint(coefs.reshape(64)[_JPEG_ZIGZAG]).astype(np.int64)
        diff = int(zz[0]) - dc_pred[c]
        dc_pred[c] = int(zz[0])
        size, code = _jpeg_mag(diff)
        wtr.write(size, 4)  # DC huffman: symbol s at code s, len 4
        if size:
            wtr.write(code, size)
        nz = np.nonzero(zz[1:])[0]
        k = 0  # position after the last coded coefficient (1-based-1)
        for idx in nz:
            run = int(idx) - k
            while run > 15:
                wtr.write(ac_code[0xF0], 8)  # ZRL
                run -= 16
            size, code = _jpeg_mag(int(zz[idx + 1]))
            wtr.write(ac_code[(run << 4) | size], 8)
            wtr.write(code, size)
            k = int(idx) + 1
        if k < 63:
            wtr.write(ac_code[0x00], 8)  # EOB

    mcus_y, mcus_x = ph // (8 * vmax), pw // (8 * hmax)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.marker(0xD0 + ((mcu // restart_interval - 1) % 8))
                dc_pred = [0] * nc
            mcu += 1
            for c, (plane, (ch, cv)) in enumerate(zip(comp_planes, factors)):
                for by in range(cv):
                    for bx in range(ch):
                        emit_block(
                            c, plane, (my * cv + by) * 8, (mx * ch + bx) * 8
                        )
    out.extend(wtr.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for formats without a sandbox codec:
    features derive solely from the payload hash (stable across runs)."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype=np.uint64)
    return (raw.astype(np.float64) / np.float64(2**64)).tolist()


def _image_features(pixels: np.ndarray, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features: dims + per-channel mean/std + a coarse
    luminance histogram, padded/truncated to FEATURE_DIM."""
    h, w, c = pixels.shape
    lum = pixels.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0, 255))
    feats = [
        float(h), float(w), float(c),
        float(pixels.mean()), float(pixels.std()),
    ] + (hist / max(1, lum.size)).tolist()
    return (feats + [0.0] * dim)[:dim]


def _audio_features(samples: np.ndarray, rate: int, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio features: duration, RMS, peak + a coarse amplitude
    histogram."""
    hist, _ = np.histogram(np.abs(samples), bins=8, range=(0.0, 1.0))
    feats = [
        float(len(samples)) / max(1, rate),
        float(np.sqrt((samples**2).mean())) if len(samples) else 0.0,
        float(np.abs(samples).max()) if len(samples) else 0.0,
    ] + (hist / max(1, len(samples))).tolist()
    return (feats + [0.0] * dim)[:dim]


def _mp3_features(meta: dict, dim: int = FEATURE_DIM) -> list[float]:
    """Header-metadata audio features (no PCM decode): duration, mean
    bitrate, sample rate, frame count."""
    feats = [
        meta["duration_ms"] / 1000.0,
        meta["bitrate_kbps"],
        float(meta["sample_rate"]),
        float(meta["n_frames"]),
    ]
    return (feats + [0.0] * dim)[:dim]


def _mp4_features(meta: dict, dim: int = FEATURE_DIM) -> list[float]:
    """Container-metadata video features: duration, track count,
    timescale."""
    feats = [
        meta["duration_ms"] / 1000.0,
        float(meta["n_tracks"]),
        float(meta["timescale"] or 0),
    ]
    return (feats + [0.0] * dim)[:dim]


def decode_features(payload: bytes, kind: str) -> list[float]:
    """Real decode for PNG/WAV; NotImplementedError otherwise.

    Codec parse failures (truncated chunks, bad zlib streams, RIFF files
    that aren't WAVE) are wrapped as NotImplementedError too: callers —
    and the mapInPandas tasks above — see ONE documented exception type
    for "can't decode this payload", never an engine-dependent leak like
    wave.Error that depends on which row's task dies first."""
    try:
        if kind == "image" and payload[:8] == _PNG_MAGIC:
            return _image_features(decode_png(payload))
        if kind == "image" and payload[:2] == b"BM":
            return _image_features(decode_bmp(payload))
        if kind == "image" and payload[:6] in (b"GIF87a", b"GIF89a"):
            return _image_features(decode_gif(payload))
        if kind == "image" and payload[:2] == b"\xff\xd8":
            return _image_features(decode_jpeg(payload))
        if (
            kind == "audio"
            and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE"
        ):
            return _audio_features(*decode_wav(payload))
        if kind == "audio" and (
            payload[:3] == b"ID3"
            or (len(payload) > 1 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0)
        ):
            # real header metadata (no PCM decode in the sandbox)
            return _mp3_features(parse_mp3_meta(payload))
        if kind == "video" and payload[4:8] == b"ftyp":
            return _mp4_features(parse_mp4_meta(payload))
    except NotImplementedError:
        raise
    except Exception as exc:  # wave.Error, zlib.error, struct.error, Index/ValueError
        raise NotImplementedError(
            f"malformed {kind} payload ({type(exc).__name__}: {exc}); "
            "use deterministic_fake=True for pipeline testing"
        ) from exc
    raise NotImplementedError(
        f"no {kind} codec for this payload format in the sandbox; "
        "use deterministic_fake=True for pipeline testing"
    )


def extract_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """(media_id, kind, features array<double>) via Arrow-batched
    mapInPandas; partitions stream batches, payloads never collect.

    deterministic_fake=False uses the REAL codecs (PNG/WAV); fake mode
    keeps unsupported-format pipelines testable end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if deterministic_fake:
                    feats.append(_fake_features(bytes(payload)))
                else:
                    feats.append(decode_features(bytes(payload), kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    from .partitioning import spread_small

    # per-payload codec work is CPU-heavy; never let a byte-small
    # (single-partition) input serialize the decode stage on one core
    return spread_small(media.select("media_id", "kind", "payload")).mapInPandas(
        run, "media_id string, kind string, features array<double>"
    )


def frame_sample(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Deterministic byte-range 'frame' sampling: n equal-spaced 64-byte
    slices of the payload (the video analog of exact.py's 3-point sample)
    — pure builtin binary slicing, no UDF."""
    length = F.octet_length("payload")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.col("payload").substr(
            (i * F.greatest(length - 64, F.lit(0)) / F.lit(max(n_frames - 1, 1))).cast("long") + 1,
            F.lit(64),
        ),
    )
    return media.withColumn("frames", frames).withColumn(
        "frame_hashes", F.transform("frames", lambda fr: F.sha2(fr, 256))
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize for PNG/JPEG payloads: decode -> nearest-neighbor
    resample -> re-encode, Arrow-batched; meta dims updated. Other
    payloads — including PNG/JPEG variants the codecs can't decode
    (progressive/arithmetic/12-bit JPEG, corrupt streams) — pass through
    unchanged (their meta is not rewritten either): one undecodable row
    in a web corpus must never fail the whole job. JPEG re-encodes with
    the flat-quant baseline encoder (lossy input, near-lossless
    re-encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for payload, mw, mh in zip(pdf["payload"], pdf["width"], pdf["height"]):
                b = bytes(payload)
                try:
                    if b[:8] == _PNG_MAGIC:
                        px = resize_nearest(decode_png(b), width, height)
                        out_payload.append(encode_png(px))
                        out_w.append(width)
                        out_h.append(height)
                        continue
                    if b[:2] == b"\xff\xd8":
                        px = resize_nearest(decode_jpeg(b), width, height)
                        out_payload.append(encode_jpeg(px))
                        out_w.append(width)
                        out_h.append(height)
                        continue
                except Exception:
                    # NotImplementedError (progressive JPEG etc.) or any
                    # malformed-stream error (ValueError/IndexError/
                    # struct.error...): fall through to pass-through —
                    # same contract as every other undecodable payload
                    pass
                out_payload.append(b)
                out_w.append(mw)
                out_h.append(mh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    flat = media.select(
        "media_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    from .partitioning import spread_small

    resized = spread_small(flat).mapInPandas(
        run, "media_id string, payload binary, width int, height int"
    )
    return (
        media.drop("payload")
        .join(resized, "media_id")
        .withColumn(
            "meta",
            F.struct(
                F.col("meta.mime").alias("mime"),
                F.col("width").alias("width"),
                F.col("height").alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
            ),
        )
        .drop("width", "height")
    )
