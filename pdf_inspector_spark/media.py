"""Multimodal media handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

Since r4 the payloads are REAL container files built with stdlib only
(zlib/struct): valid PNG (IHDR+IDAT+IEND with CRCs), BMP
(BITMAPINFOHEADER, 24bpp, bottom-up rows), binary PPM (P6), baseline
JPEG (since r5 with a REAL entropy-coded scan — standard Annex K
tables, pdf_inspector_spark.jpeg), canonical RIFF/WAVE PCM, and an
ISO-BMFF (MP4) ftyp+moov/mvhd+mdat layout. ``parse_media_header`` does
the real decode of width/height/bit-depth/duration from those headers —
no imaging library required (reference analog: pdf-inspector sizes image
XObjects from their dictionaries, src/detector.rs:328-399, and never
decodes pixels either).

The pixel-decode path (``decode_image``/``decode_and_resize``) is real
for ALL image formats in the table: PNG (zlib inflate + full
filter-type-0..4 reconstruction), BMP, PPM, and baseline JPEG (full
Huffman → dequantize → IDCT → YCbCr→RGB decode). Video frame sampling
(``sample_frames``) is real for MJPEG-in-AVI (movi chunk walk + per-
frame JPEG decode); only mp4 — whose mdat carries no self-describing
frames — still surfaces MediaCodecUnavailable, as an error row (the
ffmpeg drop-in point).

The synthetic media table is deterministic (seeded from ids) so tests
and oracles are stable:

    media(media_id long, kind string, fmt string, payload binary,
          width int, height int, duration_ms int, ts timestamp)
"""

from __future__ import annotations

import hashlib
import math
import re
import struct
import zlib
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.types as T
from pyspark.sql import DataFrame

import os

from .transcripts import DATA_DIR

BASE_TS = datetime(2024, 6, 1, tzinfo=timezone.utc)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("fmt", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
    ("ts", pa.timestamp("us", tz="UTC")),
])

_KINDS = (("image", "png"), ("image", "jpeg"), ("image", "bmp"),
          ("image", "ppm"), ("audio", "wav"), ("video", "mp4"),
          ("video", "avi"))

WAV_RATE = 8000  # Hz, 8-bit mono — keeps synthetic payloads small


class MediaCodecUnavailable(NotImplementedError):
    """Raised where a real codec (libjpeg / ffmpeg) would run."""


def _payload_for(media_id: int, size: int) -> bytes:
    """Deterministic pseudo-byte stream keyed by id (md5 counter mode)."""
    out = bytearray()
    counter = 0
    while len(out) < size:
        out += hashlib.md5(f"media:{media_id}:{counter}".encode()).digest()
        counter += 1
    return bytes(out[:size])


# -- real container-format builders (stdlib only) ---------------------------


def make_png(width: int, height: int, media_id: int) -> bytes:
    """Valid PNG: 8-bit RGB, filter-type-0 scanlines, correct CRCs."""
    raw = _payload_for(media_id, width * height * 3)
    scanlines = b"".join(
        b"\x00" + raw[y * width * 3:(y + 1) * width * 3]
        for y in range(height))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines, 6))
            + chunk(b"IEND", b""))


def make_bmp(width: int, height: int, media_id: int) -> bytes:
    """Valid 24bpp BMP (BITMAPINFOHEADER): bottom-up, 4-byte-padded rows."""
    row_size = (width * 3 + 3) & ~3
    raw = _payload_for(media_id, width * height * 3)
    rows = [raw[y * width * 3:(y + 1) * width * 3]
            + b"\x00" * (row_size - width * 3) for y in range(height)]
    pixels = b"".join(reversed(rows))  # bottom-up storage order
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    offset = 14 + 40
    file_header = b"BM" + struct.pack("<IHHI", offset + len(pixels),
                                      0, 0, offset)
    return file_header + info + pixels


def make_ppm(width: int, height: int, media_id: int) -> bytes:
    """Binary PPM (P6, maxval 255). Pixel bytes are mapped into the
    printable range 0x20-0x7E so the WHOLE file is valid UTF-8 — the
    DuckDB oracle can then regexp the header out of decode(payload)
    without a hex round trip (the Python parser handles arbitrary
    binary PPM regardless)."""
    raw = bytes(32 + b % 95
                for b in _payload_for(media_id, width * height * 3))
    return f"P6\n{width} {height}\n255\n".encode() + raw


def make_jpeg(width: int, height: int, media_id: int) -> bytes:
    """REAL baseline sequential-DCT JPEG (since r5): deterministic RGB
    pixels (id-seeded) entropy-coded with the standard Annex K
    quantization + Huffman tables (pdf_inspector_spark.jpeg). SOF0 sits
    directly after the 16-byte APP0, so the frame header stays at the
    fixed offsets the hex-offset SQL oracle reads (spec-legal: tables
    need only precede the scan, T.81 B.2.4)."""
    from .jpeg import encode_baseline_jpeg
    rgb = _payload_for(media_id, width * height * 3)
    return encode_baseline_jpeg(rgb, width, height, quant_scale=1.0)


def make_avi(width: int, height: int, n_frames: int, fps: int,
             media_id: int) -> bytes:
    """REAL MJPEG-in-AVI (since r5): RIFF('AVI ') with a spec-correct
    hdrl (avih + strl{strh 'vids'/'MJPG' + strf BITMAPINFOHEADER}), a
    movi LIST of ``00dc`` chunks each holding a REAL baseline JPEG frame
    (pdf_inspector_spark.jpeg, deterministic per (media_id, frame)), and
    an idx1 index. The fixed-size header layout puts avih fields at
    constant offsets (usec/frame @32, total frames @48, width @64,
    height @68, biBitCount @186) so the hex-offset SQL oracle can mirror
    the Python parser's real chunk walk."""
    from .jpeg import encode_baseline_jpeg
    usec = 1_000_000 // fps
    frames = []
    for f in range(n_frames):
        rgb = _payload_for(media_id * 1009 + f, width * height * 3)
        frames.append(encode_baseline_jpeg(rgb, width, height,
                                           quant_scale=1.0))
    max_frame = max(len(f) for f in frames)

    avih = struct.pack("<IIIIIIIIII", usec, 0, 0, 0x10, n_frames, 0, 1,
                       max_frame, width, height) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, n_frames,
                                            max_frame, 0, 0)
            + struct.pack("<HHHH", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) \
        + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl

    movi_chunks = b""
    idx_entries = b""
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = 4 + len(movi_chunks)
        chunk = b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            chunk += b"\x00"  # RIFF chunks are word-aligned
        movi_chunks += chunk
        idx_entries += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + b"movi" \
        + movi_chunks
    idx1 = b"idx1" + struct.pack("<I", len(idx_entries)) + idx_entries

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vids_stream_prefix(payload: bytes) -> bytes | None:
    """Two-digit chunk-id prefix (``b"00"``…) of the FIRST video stream:
    the ordinal of the strl whose strh fccType is 'vids' among all strl
    lists, per the AVI stream-numbering rule. None when no hdrl/vids
    stream is findable (torn or headerless container)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        if tag == b"LIST" and payload[pos + 8:pos + 12] == b"hdrl":
            inner = pos + 12
            list_end = min(len(payload), pos + 8 + size)
            stream_no = 0
            while inner + 8 <= list_end:
                itag = payload[inner:inner + 4]
                isize = struct.unpack("<I", payload[inner + 4:inner + 8])[0]
                if itag == b"LIST" and payload[inner + 8:inner + 12] == b"strl":
                    s = inner + 12
                    if (s + 8 <= list_end and payload[s:s + 4] == b"strh"
                            and payload[s + 8:s + 12] == b"vids"):
                        return b"%02d" % stream_no
                    stream_no += 1
                inner += 8 + isize + (isize % 2)
            return None
        pos += 8 + size + (size % 2)
    return None


def extract_avi_frames(payload: bytes) -> list[bytes]:
    """Real movi-LIST walk: collect the compressed ``NNdc`` chunk
    payloads of the VIDEO stream (NN = the 'vids' strl's ordinal from
    the hdrl walk) in stream order, so a second compressed stream —
    e.g. subtitles or a second video track — cannot interleave its
    chunks into the frame sequence. Falls back to accepting every
    ``??dc`` chunk when no hdrl/vids header is findable. Raises
    ValueError on a non-AVI/torn container (the error-as-row boundary
    catches it)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    prefix = _vids_stream_prefix(payload)
    frames: list[bytes] = []
    found_movi = False
    pos = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        if tag == b"LIST" and payload[pos + 8:pos + 12] == b"movi":
            found_movi = True
            inner = pos + 12
            list_end = min(end, pos + 8 + size)
            while inner + 8 <= list_end:
                ctag = payload[inner:inner + 4]
                csize = struct.unpack("<I", payload[inner + 4:inner + 8])[0]
                if inner + 8 + csize > list_end:
                    raise ValueError("torn movi chunk")
                if ctag[2:4] == b"dc" and (prefix is None
                                           or ctag[:2] == prefix):
                    frames.append(payload[inner + 8:inner + 8 + csize])
                inner += 8 + csize + (csize % 2)
        pos += 8 + size + (size % 2)
    if not found_movi:
        raise ValueError("no movi LIST (truncated AVI header?)")
    return frames


def make_wav(duration_ms: int, media_id: int, rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, PCM 8-bit mono."""
    n = rate * duration_ms // 1000
    data = _payload_for(media_id, n)
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
            + b"data" + struct.pack("<I", n) + data)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def make_mp4(duration_ms: int, media_id: int, n_frames: int = 0,
             frame_w: int = 0, frame_h: int = 0) -> bytes:
    """Minimal ISO-BMFF. With ``n_frames == 0`` (legacy layout):
    ftyp + moov{mvhd v0 (timescale 1000, real duration)} + mdat junk —
    the no-sample-table case that exercises the codec-boundary error
    row. With ``n_frames > 0`` (since r6): the moov additionally carries
    trak{tkhd, mdia{mdhd, hdlr 'vide', minf{vmhd, stbl{stsd 'jpeg',
    stts, stsc, stsz, stco}}}} and mdat holds ``n_frames`` REAL
    baseline JPEG frames (deterministic per (media_id, frame)), with
    stco/stsz pointing at them — so frame sampling walks a real sample
    table. mvhd stays at fixed offsets (timescale BE@44, duration
    BE@48) for the hex-offset SQL oracle. Box sizes/offsets are
    spec-correct."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    mvhd_body = (b"\x00\x00\x00\x00"               # version 0 + flags
                 + struct.pack(">IIII", 0, 0, 1000, duration_ms)
                 + struct.pack(">I", 0x00010000)   # rate 1.0
                 + struct.pack(">H", 0x0100)       # volume 1.0
                 + b"\x00" * 10                    # reserved
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)   # identity matrix
                 + b"\x00" * 24                    # pre_defined
                 + struct.pack(">I", 2))           # next_track_ID
    mvhd = _box(b"mvhd", mvhd_body)
    if n_frames <= 0:
        moov = _box(b"moov", mvhd)
        junk = _payload_for(media_id, 256 + (media_id * 37) % 1024)
        return ftyp + moov + _box(b"mdat", junk)

    from .jpeg import encode_baseline_jpeg
    frames = []
    for f in range(n_frames):
        rgb = _payload_for(media_id * 2003 + f, frame_w * frame_h * 3)
        frames.append(encode_baseline_jpeg(rgb, frame_w, frame_h,
                                           quant_scale=1.0))
    delta = max(duration_ms // n_frames, 1)  # mdhd timescale 1000 = ms

    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07"       # v0, enabled+in movie
                + struct.pack(">IIIII", 0, 0, 1, 0, duration_ms)
                + b"\x00" * 8                      # reserved
                + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/alt/volume/res
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", frame_w << 16, frame_h << 16))
    mdhd = _box(b"mdhd", b"\x00\x00\x00\x00"
                + struct.pack(">IIIIHH", 0, 0, 1000, duration_ms,
                              0x55C4, 0))          # lang 'und'
    hdlr = _box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide"
                + b"\x00" * 12 + b"\x00")
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + struct.pack(">HHHH",
                                                           0, 0, 0, 0))
    # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3 shape)
    entry = (struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
             + struct.pack(">H", 1)                # data_reference_index
             + b"\x00" * 16                        # pre_defined/reserved
             + struct.pack(">HH", frame_w, frame_h)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)  # frame_count 1
             + b"\x00" * 32                        # compressorname
             + struct.pack(">Hh", 24, -1))         # depth, pre_defined
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    stts = _box(b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1,
                                                           n_frames, delta))
    stsc = _box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">IIII", 1,
                                                           1, 1, 1))
    stsz = _box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0,
                                                           n_frames)
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    # stco carries absolute file offsets — fill after sizing the header.
    stco_body = (b"\x00\x00\x00\x00" + struct.pack(">I", n_frames)
                 + b"\x00" * (4 * n_frames))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + _box(b"stco",
                                                          stco_body))
    minf = _box(b"minf", vmhd + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    data_start = len(ftyp) + len(moov) + 8          # + mdat header
    offsets, pos = [], data_start
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    out = bytearray(ftyp + moov + _box(b"mdat", b"".join(frames)))
    stco_off = out.index(b"stco") + 4 + 8  # past fourcc, vf, entry_count
    for i, off in enumerate(offsets):
        out[stco_off + 4 * i:stco_off + 4 * (i + 1)] = struct.pack(">I", off)
    return bytes(out)


def _mp4_sample_table(p: bytes):
    """Walk moov→trak→mdia→minf→stbl and return (codec_fourcc,
    [(offset, size), ...]) from stsd/stsz/stco — the first video track's
    sample table. None when the mp4 has no parsable sample table (the
    legacy junk-mdat layout, or a torn file)."""
    def children(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size, tag = struct.unpack(">I4s", p[pos:pos + 8])
            if size < 8 or pos + size > end:
                return
            yield tag, pos + 8, pos + size
            pos += size

    def find(tag: bytes, start: int, end: int):
        for t, s, e in children(start, end):
            if t == tag:
                return s, e
        return None

    span = find(b"moov", 0, len(p))
    if not span:
        return None
    for t, s, e in children(*span):
        if t != b"trak":
            continue
        mdia = find(b"mdia", s, e)
        if not mdia:
            continue
        # bind to the VIDEO track only (hdlr handler_type 'vide') — an
        # audio-first mux must not hand its mp4a sample table to the
        # frame sampler, mirroring the AVI 'vids' stream binding
        hdlr = find(b"hdlr", *mdia)
        if not hdlr or p[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        path = mdia
        for tag in (b"minf", b"stbl"):
            path = find(tag, *path)
            if not path:
                break
        if not path:
            continue
        stbl_s, stbl_e = path
        stsd = find(b"stsd", stbl_s, stbl_e)
        stsz = find(b"stsz", stbl_s, stbl_e)
        stco = find(b"stco", stbl_s, stbl_e)
        if not (stsd and stsz and stco):
            continue
        codec = p[stsd[0] + 12:stsd[0] + 16]        # first entry fourcc
        sample_size, count = struct.unpack(">II", p[stsz[0] + 4:stsz[0] + 12])
        n_off = struct.unpack(">I", p[stco[0] + 4:stco[0] + 8])[0]
        if n_off != count:
            return None
        # bound both counts by their boxes' actual extents BEFORE any
        # list allocation: a corrupt 32-bit count would otherwise
        # materialize a multi-GB list (MemoryError = stage failure, not
        # an error row)
        if stco[1] - stco[0] < 8 + 4 * n_off:
            return None
        if sample_size == 0 and stsz[1] - stsz[0] < 12 + 4 * count:
            return None
        sizes = ([sample_size] * count if sample_size
                 else [struct.unpack(">I", p[stsz[0] + 12 + 4 * i:
                                             stsz[0] + 16 + 4 * i])[0]
                       for i in range(count)])
        offs = [struct.unpack(">I", p[stco[0] + 8 + 4 * i:
                                      stco[0] + 12 + 4 * i])[0]
                for i in range(n_off)]
        if any(o + sz > len(p) for o, sz in zip(offs, sizes)):
            return None
        return codec, list(zip(offs, sizes))
    return None


# -- real header parsing (no imaging libs) ----------------------------------


def parse_media_header(payload: bytes, fmt: str) -> dict:
    """Decode (decoded_width, decoded_height, bit_depth,
    decoded_duration_ms) from the container header. Real parsers: chunk
    walk for PNG, header struct for BMP, ASCII header for PPM, marker
    walk for JPEG, RIFF chunk walk for WAV, box walk for MP4. Unknown /
    corrupt headers yield all-None (error-as-row, never a raise)."""
    none = {"decoded_width": None, "decoded_height": None,
            "bit_depth": None, "decoded_duration_ms": None}
    try:
        if fmt == "png":
            return _parse_png_header(payload) or none
        if fmt == "bmp":
            return _parse_bmp_header(payload) or none
        if fmt == "ppm":
            return _parse_ppm_header(payload) or none
        if fmt == "jpeg":
            return _parse_jpeg_header(payload) or none
        if fmt == "wav":
            return _parse_wav_header(payload) or none
        if fmt == "mp4":
            return _parse_mp4_header(payload) or none
        if fmt == "avi":
            return _parse_avi_header(payload) or none
    except Exception:  # noqa: BLE001 — corrupt header → None row
        return none
    return none


def _dims(w, h, depth):
    return {"decoded_width": int(w), "decoded_height": int(h),
            "bit_depth": int(depth), "decoded_duration_ms": None}


def _parse_png_header(p: bytes):
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    while pos + 8 <= len(p):  # chunk walk (IHDR must come first per spec)
        length, tag = struct.unpack(">I4s", p[pos:pos + 8])
        if tag == b"IHDR":
            w, h, depth = struct.unpack(">IIB", p[pos + 8:pos + 17])
            return _dims(w, h, depth)
        pos += 12 + length
    return None


def _parse_bmp_header(p: bytes):
    if p[:2] != b"BM":
        return None
    hdr_size, w, h = struct.unpack("<Iii", p[14:26])
    if hdr_size < 40:
        return None
    bits = struct.unpack("<H", p[28:30])[0]
    return _dims(w, abs(h), bits)  # negative height = top-down rows


def _parse_ppm_header(p: bytes):
    m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", p)
    if not m:
        return None
    maxval = int(m.group(3))
    return _dims(int(m.group(1)), int(m.group(2)), maxval.bit_length())


_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _parse_jpeg_header(p: bytes):
    if p[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 2 <= len(p):  # marker-segment walk
        if p[pos] != 0xFF:
            return None
        # Spec-legal 0xFF fill/padding bytes may precede any marker.
        while pos + 1 < len(p) and p[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(p):
            return None
        marker = p[pos + 1]
        if marker in _JPEG_SOF:
            if pos + 9 > len(p):
                return None
            precision, h, w = struct.unpack(">BHH", p[pos + 4:pos + 9])
            return _dims(w, h, precision)
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone — no length word follows.
            pos += 2
            continue
        if pos + 4 > len(p):
            return None
        seg_len = struct.unpack(">H", p[pos + 2:pos + 4])[0]
        pos += 2 + seg_len
    return None


def _parse_wav_header(p: bytes):
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, data_size = 12, None, None, None, None
    while pos + 8 <= len(p):  # RIFF chunk walk
        tag, size = struct.unpack("<4sI", p[pos:pos + 8])
        if tag == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", p[pos + 8:pos + 24])
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if not rate or not channels or not bits or data_size is None:
        return None
    byte_rate = rate * channels * (bits // 8)
    return {"decoded_width": None, "decoded_height": None,
            "bit_depth": int(bits),
            "decoded_duration_ms": data_size * 1000 // byte_rate}


def _parse_mp4_header(p: bytes):
    pos = 0
    while pos + 8 <= len(p):  # top-level box walk
        size, tag = struct.unpack(">I4s", p[pos:pos + 8])
        if tag == b"moov":
            inner = pos + 8
            while inner + 8 <= pos + size:
                isize, itag = struct.unpack(">I4s", p[inner:inner + 8])
                if itag == b"mvhd":
                    version = p[inner + 8]
                    if version == 1:
                        ts, dur = struct.unpack(
                            ">IQ", p[inner + 28:inner + 40])
                    else:
                        ts, dur = struct.unpack(
                            ">II", p[inner + 20:inner + 28])
                    return {"decoded_width": None, "decoded_height": None,
                            "bit_depth": None,
                            "decoded_duration_ms": dur * 1000 // ts}
                inner += max(isize, 8)
        pos += max(size, 8)
    return None


def _parse_avi_header(p: bytes):
    """Real RIFF chunk walk: hdrl→avih for frame timing/count/dims,
    hdrl→strl→strf for the stored bit depth."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    usec = frames = w = h = depth = None
    pos = 12
    while pos + 8 <= len(p):
        tag = p[pos:pos + 4]
        size = struct.unpack("<I", p[pos + 4:pos + 8])[0]
        if tag == b"LIST" and p[pos + 8:pos + 12] == b"hdrl":
            inner = pos + 12
            list_end = min(len(p), pos + 8 + size)
            while inner + 8 <= list_end:
                itag = p[inner:inner + 4]
                isize = struct.unpack("<I", p[inner + 4:inner + 8])[0]
                if itag == b"avih" and isize >= 40:
                    (usec, _, _, _, frames, _, _, _, w, h) = struct.unpack(
                        "<IIIIIIIIII", p[inner + 8:inner + 48])
                elif (itag == b"LIST"
                      and p[inner + 8:inner + 12] == b"strl"):
                    # biBitCount must come from the VIDEO stream's strf:
                    # an strl whose strh is 'auds' carries WAVEFORMATEX,
                    # where offset 14 is bogus as a bit depth. Track the
                    # preceding strh's fccType and stop at the first
                    # video stream.
                    s = inner + 12
                    strl_end = min(list_end, inner + 8 + isize)
                    cur_vids = False
                    while s + 8 <= strl_end:
                        stag = p[s:s + 4]
                        ssize = struct.unpack("<I", p[s + 4:s + 8])[0]
                        if stag == b"strh" and ssize >= 4:
                            cur_vids = p[s + 8:s + 12] == b"vids"
                        elif (stag == b"strf" and ssize >= 16
                              and cur_vids and depth is None):
                            depth = struct.unpack("<H", p[s + 22:s + 24])[0]
                        s += 8 + ssize + (ssize % 2)
                inner += 8 + isize + (isize % 2)
            break
        pos += 8 + size + (size % 2)
    if usec is None or frames is None:
        return None
    return {"decoded_width": int(w), "decoded_height": int(h),
            "bit_depth": int(depth) if depth is not None else None,
            "decoded_duration_ms": usec * frames // 1000}


# -- synthetic media table ---------------------------------------------------


def _media_row(i: int) -> dict:
    h = int.from_bytes(hashlib.md5(f"m{i}".encode()).digest()[:8], "big")
    kind, fmt = _KINDS[h % len(_KINDS)]
    w = 4 + (h >> 8) % 16 if kind in ("image",) or fmt == "avi" else 0
    hgt = 4 + (h >> 18) % 16 if kind in ("image",) or fmt == "avi" else 0
    dur = 0
    if fmt == "wav":
        # quantized to whole samples at 8 kHz so metadata == decoded
        dur = (WAV_RATE * (50 + (h >> 28) % 400) // 1000) * 1000 // WAV_RATE
    elif fmt == "mp4":
        dur = 1000 + (h >> 26) % 600_000
    elif fmt == "avi":
        fps = 4 + (h >> 24) % 27          # 4..30 fps
        n_frames = 3 + (h >> 30) % 6      # 3..8 MJPEG frames
        dur = (1_000_000 // fps) * n_frames // 1000
    builder = {"png": make_png, "bmp": make_bmp, "ppm": make_ppm,
               "jpeg": make_jpeg}
    if kind == "image":
        payload = builder[fmt](w, hgt, i)
    elif fmt == "wav":
        payload = make_wav(dur, i)
    elif fmt == "avi":
        payload = make_avi(w, hgt, n_frames, fps, i)
    elif (h >> 16) % 4 == 0:
        # legacy junk-mdat mp4 (no sample table): keeps the genuine
        # external-codec boundary path exercised by the table itself
        payload = make_mp4(dur, i)
    else:
        payload = make_mp4(dur, i, n_frames=3 + (h >> 30) % 6,
                           frame_w=4 + (h >> 8) % 16,
                           frame_h=4 + (h >> 18) % 16)
    return {"media_id": i, "kind": kind, "fmt": fmt, "payload": payload,
            "width": w, "height": hgt, "duration_ms": dur,
            "ts": BASE_TS + timedelta(seconds=i * 37)}


def media_table_path(n_rows: int = 2000, data_dir: str = DATA_DIR) -> str:
    """Single owner of the media-table version/naming scheme — the
    DuckDB oracle derives its read path from here too, so a version
    bump can never split the two engines onto different fixtures.

    v5: mp4 rows carry a real stbl (stsd/stsz/stco) with JPEG samples
    (~25% stay legacy junk-mdat to exercise the codec boundary);
    v4 added MJPEG-in-AVI video rows with real sampleable frames."""
    return os.path.join(data_dir, f"media_{n_rows}_v5.parquet")


def write_media(n_rows: int = 2000, data_dir: str = DATA_DIR,
                force: bool = False) -> str:
    path = media_table_path(n_rows, data_dir)
    if os.path.exists(path) and not force:
        return path
    os.makedirs(data_dir, exist_ok=True)
    cols: dict[str, list] = {f.name: [] for f in MEDIA_SCHEMA}
    for i in range(n_rows):
        row = _media_row(i)
        for k in cols:
            cols[k].append(row[k])
    pq.write_table(pa.Table.from_pydict(cols, schema=MEDIA_SCHEMA), path,
                   row_group_size=512, compression="zstd")
    return path


# -- feature extraction (mapInPandas) --------------------------------------

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_mean_milli", T.LongType()),   # mean byte value ×1000
    T.StructField("byte_entropy_milli", T.LongType()),  # Shannon entropy ×1000
    T.StructField("aspect_milli", T.LongType()),      # width/height ×1000
    T.StructField("content_hash", T.LongType()),
    T.StructField("decoded_width", T.LongType()),     # from the real header
    T.StructField("decoded_height", T.LongType()),
    T.StructField("bit_depth", T.LongType()),
    T.StructField("decoded_duration_ms", T.LongType()),
])


def _features_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    import math
    rows = []
    for r in pdf.itertuples(index=False):
        payload: bytes = r.payload
        n = len(payload)
        counts = [0] * 256
        total = 0
        for b in payload:
            counts[b] += 1
            total += b
        entropy = 0.0
        for c in counts:
            if c:
                p = c / n
                entropy -= p * math.log2(p)
        # Hash the uppercase-hex encoding (not the raw bytes): DuckDB v1.0
        # md5() only accepts VARCHAR, so this keeps the content hash
        # SQL-expressible in the cross-engine oracle.
        digest = hashlib.md5(payload.hex().upper().encode()).hexdigest()
        hdr = parse_media_header(payload, r.fmt)
        rows.append({
            "media_id": r.media_id,
            "kind": r.kind,
            "fmt": r.fmt,
            "n_bytes": n,
            "byte_mean_milli": total * 1000 // n if n else 0,
            "byte_entropy_milli": int(entropy * 1000),
            "aspect_milli": (r.width * 1000 // r.height) if r.height else 0,
            "content_hash": int(digest[:15], 16),
            **hdr,
        })
    return pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])


def media_features(df: DataFrame) -> DataFrame:
    """Byte-level + header feature extraction over binary payloads: size,
    mean, entropy, aspect, content hash, and REAL header decode
    (width/height/bit-depth/duration parsed from the container bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_batch(pdf)
    return (df.select("media_id", "kind", "fmt", "payload", "width", "height")
            .mapInPandas(gen, FEATURES_SCHEMA))


# -- pixel decode / resize ----------------------------------------------------

DECODABLE_FORMATS = ("png", "bmp", "ppm", "jpeg")

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("pixels", T.BinaryType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def _png_unfilter(raw: bytes, width: int, height: int) -> bytes:
    """PNG filter reconstruction (types 0-4, 8-bit RGB)."""
    stride = width * 3
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:    # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                b = prev[i]
                pa_, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Real PNG decode for 8-bit RGB: chunk walk → concatenated IDAT →
    zlib inflate → filter reconstruction."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(payload):
        length, tag = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            if (depth, ctype) != (8, 2):
                raise MediaCodecUnavailable(
                    f"PNG depth={depth} color={ctype} unsupported "
                    "(8-bit RGB only)")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    return w, h, _png_unfilter(zlib.decompress(idat), w, h)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Real 24bpp BMP decode: strip row padding, flip bottom-up rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", payload[10:14])[0]
    _, w, h = struct.unpack("<Iii", payload[14:26])
    bits = struct.unpack("<H", payload[28:30])[0]
    if bits != 24:
        raise MediaCodecUnavailable(f"BMP bpp={bits} unsupported (24 only)")
    row_size = (w * 3 + 3) & ~3
    top_down = h < 0
    h = abs(h)
    rows = [payload[offset + y * row_size:offset + y * row_size + w * 3]
            for y in range(h)]
    if not top_down:
        rows.reverse()
    return w, h, b"".join(rows)


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM")
    w, h = int(m.group(1)), int(m.group(2))
    return w, h, payload[m.end():m.end() + w * h * 3]


def decode_image(payload: bytes, fmt: str) -> tuple[int, int, bytes]:
    """(width, height, rgb_bytes) — real decode for PNG/BMP/PPM; JPEG
    entropy decoding is the codec boundary (libjpeg drop-in point)."""
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        from .jpeg import decode_baseline_jpeg
        return decode_baseline_jpeg(payload)
    raise MediaCodecUnavailable(
        f"pixel decode for {fmt!r} requires an external codec")


def resize_nearest(rgb: bytes, w: int, h: int, out_w: int,
                   out_h: int) -> bytes:
    """Nearest-neighbor resize on the raw RGB buffer (numpy indexing)."""
    import numpy as np
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs].tobytes()


def decode_and_resize(df: DataFrame, out_w: int = 224,
                      out_h: int = 224) -> DataFrame:
    """Image decode + nearest-neighbor resize stage. PNG/BMP/PPM/JPEG
    all decode for real (stdlib zlib + numpy; baseline JPEG via
    pdf_inspector_spark.jpeg). Corrupt/truncated payloads and formats
    needing an external codec yield a NULL pixel row — error-as-row at
    the codec boundary, never a stage failure."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    w, h, rgb = decode_image(r.payload, r.fmt)
                    rows.append({
                        "media_id": r.media_id,
                        "pixels": resize_nearest(rgb, w, h, out_w, out_h),
                        "out_width": out_w,
                        "out_height": out_h,
                    })
                except (MediaCodecUnavailable, ValueError, TypeError,
                        IndexError, zlib.error, struct.error):
                    # Corrupt/truncated payloads (bad IHDR, short IDAT,
                    # undersized BMP) must be error-as-row too, not a
                    # stage failure — same contract as
                    # parse_media_header.
                    rows.append({"media_id": r.media_id, "pixels": None,
                                 "out_width": None, "out_height": None})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in DECODED_SCHEMA.fields])
    return (df.where(df.kind == "image")
            .select("media_id", "fmt", "payload")
            .mapInPandas(gen, DECODED_SCHEMA))


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — REAL for MJPEG/AVI (since r5): walk the
    movi LIST, pick every ⌈every_ms / frame_duration⌉-th frame, decode
    each sampled JPEG (full entropy decode) and emit the frame bytes +
    decoded dims. Error-as-row throughout: a torn container or an
    unsupported codec (mp4's mdat carries no self-describing frames —
    the genuine ffmpeg boundary) yields one NULL-frame row with
    ``error_kind`` set, never a stage failure."""
    frame_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_w", T.IntegerType()),
        T.StructField("frame_h", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("error_kind", T.StringType()),
    ])
    cols = [f.name for f in frame_schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_baseline_jpeg
        for pdf in batches:
            rows = []
            for mid, fmt, payload in zip(pdf["media_id"], pdf["fmt"],
                                         pdf["payload"]):
                mid = int(mid)
                if fmt not in ("avi", "mp4"):
                    rows.append((mid, None, None, None, None,
                                 "MediaCodecUnavailable"))
                    continue
                try:
                    payload = bytes(payload)
                    if fmt == "avi":
                        hdr = _parse_avi_header(payload)
                        frames = extract_avi_frames(payload)
                        if hdr is None or not frames:
                            raise ValueError("no parsable AVI header/frames")
                        dur_ms = hdr["decoded_duration_ms"]
                    else:
                        # mp4: real stbl walk (stsd/stsz/stco). A sample
                        # table whose codec isn't baseline JPEG — or no
                        # sample table at all (legacy junk-mdat files) —
                        # is the genuine external-codec boundary.
                        tbl = _mp4_sample_table(payload)
                        if tbl is None:
                            raise MediaCodecUnavailable(
                                "mp4 without a parsable sample table")
                        codec, samples = tbl
                        if codec != b"jpeg" or not samples:
                            raise MediaCodecUnavailable(
                                f"mp4 codec {codec!r} needs ffmpeg")
                        frames = [payload[o:o + sz] for o, sz in samples]
                        hdr = _parse_mp4_header(payload)
                        # valid stbl but torn/missing mvhd: frame timing
                        # is unknown — sample EVERY frame (conservative)
                        # rather than inventing a duration that would
                        # silently collapse sampling to frame 0
                        dur_ms = hdr["decoded_duration_ms"] if hdr else None
                    if dur_ms is None:
                        step = 1
                    else:
                        frame_ms = dur_ms / max(len(frames), 1)
                        # ceil: consecutive samples are >= every_ms
                        # apart (floor would sample MORE often than
                        # asked — e.g. every_ms=1000 over 300ms frames
                        # must step 4, not 3).
                        step = max(1, math.ceil(every_ms
                                                / max(frame_ms, 1e-9)))
                    for idx in range(0, len(frames), step):
                        fw, fh, _rgb = decode_baseline_jpeg(frames[idx])
                        rows.append((mid, idx, fw, fh, frames[idx], None))
                except (MediaCodecUnavailable, ValueError, zlib.error,
                        struct.error, TypeError, IndexError) as exc:
                    rows.append((mid, None, None, None, None,
                                 type(exc).__name__))
            yield pd.DataFrame(rows, columns=cols)

    return (df.where(df.kind == "video")
            .select("media_id", "fmt", "payload")
            .mapInPandas(gen, frame_schema))
