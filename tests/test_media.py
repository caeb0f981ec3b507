"""Multimodal tests: real container-format generators, real header
decode, real PNG/BMP/PPM/JPEG pixel decode (baseline JPEG codec since
r5 — pdf_inspector_spark/jpeg.py), real MJPEG/AVI frame sampling, and
(since r6) real mp4 frame sampling via the stsd/stsz/stco sample-table
walk, plus the mapInPandas plumbing. The remaining codec boundary —
mp4s with no sample table or a non-JPEG codec (ffmpeg territory) — is
surfaced as an error row."""

import hashlib
import math
import struct
import zlib

import pytest

from pdf_inspector_spark.media import (DECODABLE_FORMATS,
                                       MediaCodecUnavailable, _payload_for,
                                       _parse_avi_header, decode_and_resize,
                                       decode_image, extract_avi_frames,
                                       make_avi, make_bmp, make_jpeg,
                                       make_mp4, make_png, make_ppm,
                                       make_wav, media_features,
                                       parse_media_header, resize_nearest,
                                       sample_frames, write_media)


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.read.parquet(write_media(200, force=False)).cache()


def test_media_table_deterministic(tmp_path):
    p1 = write_media(50, data_dir=str(tmp_path / "a"))
    p2 = write_media(50, data_dir=str(tmp_path / "b"))
    import pyarrow.parquet as pq
    assert pq.read_table(p1).equals(pq.read_table(p2))


# -- golden per-format header decode -----------------------------------------

def test_png_header_golden():
    # hand-built 2x1 RGB PNG: signature + IHDR(2,1,depth 8,color 2)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    hdr = parse_media_header(b"\x89PNG\r\n\x1a\n" + chunk, "png")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (2, 1, 8)


def test_bmp_header_golden_top_down():
    # negative height = top-down row order; parser reports abs(height)
    p = bytearray(make_bmp(3, 2, 0))
    p[22:26] = struct.pack("<i", -2)
    hdr = parse_media_header(bytes(p), "bmp")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (3, 2, 24)


def test_ppm_header_golden_whitespace_variants():
    hdr = parse_media_header(b"P6\n10 20\n255\n" + b"\x00" * 600, "ppm")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (10, 20, 8)
    hdr = parse_media_header(b"P6 7 8 15 " + b"\x00" * 200, "ppm")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (7, 8, 4)  # maxval 15 → 4 bits


def test_jpeg_header_marker_walk_skips_segments():
    # insert an extra COM segment before SOF0: a fixed-offset reader would
    # misparse; the marker walk must skip it
    p = make_jpeg(11, 13, 4)
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    p2 = p[:2] + com + p[2:]
    hdr = parse_media_header(p2, "jpeg")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (11, 13, 8)


def test_wav_header_golden():
    hdr = parse_media_header(make_wav(250, 5), "wav")
    assert hdr["decoded_duration_ms"] == 250
    assert hdr["bit_depth"] == 8


def test_mp4_header_golden_v0_and_v1():
    hdr = parse_media_header(make_mp4(123456, 6), "mp4")
    assert hdr["decoded_duration_ms"] == 123456
    # v1 mvhd: 64-bit duration, different field offsets
    body = (b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7))
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    hdr = parse_media_header(moov, "mp4")
    assert hdr["decoded_duration_ms"] == 7000


def test_corrupt_headers_yield_none_not_raise():
    for fmt in ("png", "bmp", "ppm", "jpeg", "wav", "mp4"):
        hdr = parse_media_header(b"garbage-bytes", fmt)
        assert hdr == {"decoded_width": None, "decoded_height": None,
                       "bit_depth": None, "decoded_duration_ms": None}


# -- golden pixel decode ------------------------------------------------------

def test_png_decode_all_filter_types():
    """Scanlines written with filters 1/2/3/4 must reconstruct the same
    pixels as the filter-0 reference encoder."""
    w, h = 4, 4
    raw = _payload_for(99, w * h * 3)
    rows = [raw[y * w * 3:(y + 1) * w * 3] for y in range(h)]
    stride = w * 3

    def filt(ftype, line, prev):
        out = bytearray()
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                out.append((line[i] - a) & 0xFF)
            elif ftype == 2:
                out.append((line[i] - b) & 0xFF)
            elif ftype == 3:
                out.append((line[i] - (a + b) // 2) & 0xFF)
            else:  # Paeth
                pa_, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)
                out.append((line[i] - pred) & 0xFF)
        return bytes(out)

    prev = bytes(stride)
    scanlines = b""
    for y, ftype in enumerate((1, 2, 3, 4)):
        scanlines += bytes([ftype]) + filt(ftype, rows[y], prev)
        prev = rows[y]

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scanlines))
           + chunk(b"IEND", b""))
    dw, dh, rgb = decode_image(png, "png")
    assert (dw, dh) == (w, h)
    assert rgb == raw


def test_bmp_decode_flips_bottom_up_rows():
    w, h = 3, 2
    dw, dh, rgb = decode_image(make_bmp(w, h, 7), "bmp")
    assert (dw, dh) == (w, h)
    assert rgb == _payload_for(7, w * h * 3)  # generator order restored


def test_resize_nearest_identity_and_downscale():
    rgb = bytes(range(2 * 2 * 3))
    assert resize_nearest(rgb, 2, 2, 2, 2) == rgb
    small = resize_nearest(rgb, 2, 2, 1, 1)
    assert small == rgb[:3]  # top-left pixel


def test_jpeg_pixel_decode_real():
    """Since r5 JPEG decode is real (pdf_inspector_spark/jpeg.py): the
    generated payload's entropy-coded scan decodes to pixels of the
    right shape, and (lossy codec) within quantization distance of the
    source RGB on a smooth image."""
    w, h, rgb = decode_image(make_jpeg(6, 5, 1), "jpeg")
    assert (w, h) == (6, 5)
    assert len(rgb) == 6 * 5 * 3


def test_jpeg_roundtrip_near_lossless_and_standard():
    import numpy as np

    from pdf_inspector_spark.jpeg import (decode_baseline_jpeg,
                                          encode_baseline_jpeg)
    w, h = 19, 13
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack([x * 255 // (w - 1), y * 255 // (h - 1),
                    (x + y) * 255 // (w + h - 2)],
                   axis=-1).astype(np.uint8)
    # Tiny quant steps → error bounded by DCT float rounding only.
    enc = encode_baseline_jpeg(rgb.tobytes(), w, h, quant_scale=0.05)
    dw, dh, out = decode_baseline_jpeg(enc)
    assert (dw, dh) == (w, h)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(dec - rgb.astype(int)).max() <= 3
    # Standard Annex K tables (quant_scale=1): lossy, but every pixel of
    # a smooth gradient stays within the coarse-quantization envelope.
    enc2 = encode_baseline_jpeg(rgb.tobytes(), w, h, quant_scale=1.0)
    dw2, dh2, out2 = decode_baseline_jpeg(enc2)
    assert (dw2, dh2) == (w, h) and len(out2) == w * h * 3
    # The frame header must stay at the oracle's fixed offsets.
    assert enc2[20:22] == b"\xff\xc0" and enc2[24] == 8
    assert struct.unpack(">HH", enc2[25:29]) == (h, w)


def test_jpeg_decoder_rejects_unsupported_profiles():
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    base = make_jpeg(8, 8, 3)
    # progressive: flip SOF0 (0xC0 at offset 20-21) to SOF2
    prog = base[:21] + b"\xc2" + base[22:]
    with pytest.raises(ValueError):
        decode_baseline_jpeg(prog)
    with pytest.raises(ValueError):
        decode_baseline_jpeg(base[:40])        # truncated mid-header
    with pytest.raises(ValueError):
        decode_baseline_jpeg(base[:-20])       # truncated entropy stream


# -- table-level invariants ---------------------------------------------------

def test_decoded_dims_match_metadata(spark, media_df):
    """The generated table's width/height/duration metadata must agree
    with what the real header parsers decode from the payload bytes."""
    feats = media_features(media_df).collect()
    meta = {r["media_id"]: r for r in media_df.collect()}
    assert len(feats) == len(meta) > 0
    for f in feats:
        m = meta[f["media_id"]]
        if m["kind"] == "image":
            assert f["decoded_width"] == m["width"]
            assert f["decoded_height"] == m["height"]
            assert f["bit_depth"] in (8, 24)
        elif m["fmt"] in ("wav", "mp4"):
            assert f["decoded_duration_ms"] == m["duration_ms"]


def test_media_features_match_reference_computation(spark, media_df):
    feats = {r["media_id"]: r for r in media_features(media_df).collect()}
    rows = media_df.orderBy("media_id").limit(20).collect()
    assert len(feats) >= 200 or len(feats) == media_df.count()
    for r in rows:
        payload = bytes(r["payload"])
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(payload)
        assert f["byte_mean_milli"] == sum(payload) * 1000 // len(payload)
        counts = [0] * 256
        for b in payload:
            counts[b] += 1
        ent = -sum((c / len(payload)) * math.log2(c / len(payload))
                   for c in counts if c)
        assert f["byte_entropy_milli"] == int(ent * 1000)
        assert f["content_hash"] == int(
            hashlib.md5(payload.hex().upper().encode()).hexdigest()[:15], 16)


def test_decode_resize_shape_contract(spark, media_df):
    """Decodable formats must honor the w*h*3 pixel-buffer contract so
    downstream stages (e.g. embedding models) see correct batch shapes;
    JPEG rows surface as NULL pixel rows (codec boundary, error-as-row)."""
    out = decode_and_resize(media_df, out_w=32, out_h=16).collect()
    n_images = media_df.where(media_df.kind == "image").count()
    assert len(out) == n_images > 0
    fmt_by_id = {r["media_id"]: r["fmt"]
                 for r in media_df.select("media_id", "fmt").collect()}
    n_real = 0
    for r in out:
        if fmt_by_id[r["media_id"]] in DECODABLE_FORMATS:
            assert len(r["pixels"]) == 32 * 16 * 3
            assert (r["out_width"], r["out_height"]) == (32, 16)
            n_real += 1
        else:
            assert r["pixels"] is None
    assert n_real > 0


def test_avi_header_golden():
    p = make_avi(12, 9, 5, 20, 7)
    hdr = parse_media_header(p, "avi")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (12, 9, 24)
    assert hdr["decoded_duration_ms"] == (1_000_000 // 20) * 5 // 1000


def test_avi_frames_roundtrip():
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    p = make_avi(8, 6, 4, 10, 42)
    frames = extract_avi_frames(p)
    assert len(frames) == 4
    for f in frames:
        w, h, rgb = decode_baseline_jpeg(f)
        assert (w, h, len(rgb)) == (8, 6, 8 * 6 * 3)
    # frames differ (per-frame seeded pixels)
    assert len({f for f in frames}) == 4


def test_avi_oracle_offsets_match_walk():
    """The hex-offset SQL oracle reads fixed header offsets; certify
    they equal the Python parser's real chunk walk."""
    p = make_avi(15, 11, 6, 8, 3)
    hdr = _parse_avi_header(p)
    usec = struct.unpack("<I", p[32:36])[0]
    frames = struct.unpack("<I", p[48:52])[0]
    assert struct.unpack("<I", p[64:68])[0] == hdr["decoded_width"] == 15
    assert struct.unpack("<I", p[68:72])[0] == hdr["decoded_height"] == 11
    assert struct.unpack("<H", p[186:188])[0] == hdr["bit_depth"] == 24
    assert usec * frames // 1000 == hdr["decoded_duration_ms"]


def test_avi_extract_frames_torn_container_raises():
    p = bytearray(make_avi(8, 6, 3, 10, 1))
    with pytest.raises(ValueError):
        extract_avi_frames(b"junk")  # not RIFF at all
    with pytest.raises(ValueError):
        extract_avi_frames(bytes(p[:20]))  # truncated header
    # torn movi chunk: truncate inside the frame list
    with pytest.raises(ValueError):
        extract_avi_frames(bytes(p[:250]))


def _splice_strl(avi: bytes, strl: bytes, before_video: bool) -> bytes:
    """Insert an extra strl LIST into make_avi output's hdrl, before or
    after the existing video strl, fixing up the RIFF/hdrl sizes."""
    hdrl_pos = avi.index(b"hdrl") - 8
    hdrl_size = struct.unpack("<I", avi[hdrl_pos + 4:hdrl_pos + 8])[0]
    vids_strl = avi.index(b"strl", hdrl_pos)
    insert_at = vids_strl - 8 if before_video else hdrl_pos + 8 + hdrl_size
    out = bytearray(avi[:insert_at] + strl + avi[insert_at:])
    out[hdrl_pos + 4:hdrl_pos + 8] = struct.pack("<I", hdrl_size + len(strl))
    out[4:8] = struct.pack("<I", struct.unpack("<I", bytes(out[4:8]))[0]
                           + len(strl))
    return bytes(out)


def _auds_strl() -> bytes:
    """An audio strl: strh 'auds' + a WAVEFORMATEX-shaped strf whose
    bytes at offset 14 (where BITMAPINFOHEADER keeps biBitCount) are a
    deliberately bogus value, so a parser that reads bit depth from a
    non-video strf is caught."""
    strh = (b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 8000, 0, 8000,
                          1, 0, 0) + struct.pack("<HHHH", 0, 0, 0, 0))
    strf = struct.pack("<HHIIHHHH", 1, 1, 8000, 8000, 1, 0xBEEF, 0, 0)
    return (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)


def test_avi_header_bit_depth_ignores_audio_strf():
    """bit_depth comes from the 'vids' strf only: an audio stream after
    (or before) the video stream must not clobber it with WAVEFORMATEX
    bytes (ADVICE r5)."""
    base = make_avi(8, 6, 3, 10, 2)
    for before in (False, True):
        p = _splice_strl(base, _auds_strl(), before_video=before)
        hdr = _parse_avi_header(p)
        assert hdr["bit_depth"] == 24, f"before_video={before}"
        assert hdr["decoded_width"] == 8 and hdr["decoded_height"] == 6


def test_avi_extract_frames_filters_video_stream_chunks():
    """A second compressed stream's NNdc chunks must not interleave into
    the video frame sequence (ADVICE r5). Audio-first layout renumbers
    the video stream to 01, so its chunks are 01dc and stray 00dc
    chunks belong to the other stream."""
    base = make_avi(8, 6, 3, 10, 2)
    n_base = len(extract_avi_frames(base))
    p = _splice_strl(base, _auds_strl(), before_video=True)
    # video is now stream 1: relabel its movi chunks 00dc -> 01dc and
    # inject a stray 00dc chunk (not a JPEG) at the front of movi.
    movi = p.index(b"movi")
    body = bytearray(p)
    i = movi
    while True:
        i = body.find(b"00dc", i)
        if i < 0:
            break
        body[i:i + 2] = b"01"
        i += 4
    stray = b"00dc" + struct.pack("<I", 4) + b"XXXX"
    body[movi + 4:movi + 4] = stray
    movi_list = movi - 8
    for pos in (movi_list + 4, 4):  # movi LIST size, RIFF size
        body[pos:pos + 4] = struct.pack(
            "<I", struct.unpack("<I", bytes(body[pos:pos + 4]))[0]
            + len(stray))
    frames = extract_avi_frames(bytes(body))
    assert len(frames) == n_base
    for f in frames:
        assert f[:2] == b"\xff\xd8"  # all sampled from the video stream


def test_frame_sampling_step_is_ceil(spark):
    """Consecutive samples must be >= every_ms apart: 12 frames at
    100ms with every_ms=250 → step ceil(2.5)=3 → indices 0,3,6,9.
    (Floor would step 2 and sample more often than asked — ADVICE r5.)"""
    p = make_avi(8, 6, 12, 10, 5)  # fps=10 → 100ms/frame
    df = spark.createDataFrame(
        [(1, "video", "avi", bytearray(p))],
        "media_id long, kind string, fmt string, payload binary")
    rows = sample_frames(df, every_ms=250).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3, 6, 9]
    assert all(r["error_kind"] is None for r in rows)


def test_frame_sampling_real_avi_and_mp4(spark, media_df):
    """sample_frames emits real decoded frames for AVI rows and for mp4
    rows with a sample table; legacy junk-mdat mp4s yield an
    error-as-row (MediaCodecUnavailable) — never a stage failure."""
    out = sample_frames(media_df, every_ms=1).collect()
    fmt_by_id = {r["media_id"]: r["fmt"]
                 for r in media_df.select("media_id", "fmt").collect()}
    avi_rows = [r for r in out if fmt_by_id[r["media_id"]] == "avi"]
    mp4_rows = [r for r in out if fmt_by_id[r["media_id"]] == "mp4"]
    assert avi_rows and mp4_rows
    mp4_err = [r for r in mp4_rows if r["error_kind"] is not None]
    mp4_ok = [r for r in mp4_rows if r["error_kind"] is None]
    assert mp4_err, "expected legacy no-stbl mp4 error rows"
    assert mp4_ok, "expected real mp4 sample-table frame rows"
    for r in mp4_err:
        assert r["error_kind"] == "MediaCodecUnavailable"
        assert r["frame"] is None
    ok = [r for r in avi_rows if r["error_kind"] is None] + mp4_ok
    assert ok, "expected at least one decodable frame row"
    for r in ok:
        assert r["frame"][:2] == bytes([0xFF, 0xD8])  # SOI
        assert r["frame_w"] > 0 and r["frame_h"] > 0
    # every_ms=1 with >=1ms frames → step 1 → all frames sampled
    by_id: dict[int, list] = {}
    for r in ok:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_mp4_sample_table_golden():
    """make_mp4 with frames carries a walkable stsd/stsz/stco whose
    samples are real decodable JPEGs at the declared dims; the legacy
    layout and a truncated file report no sample table."""
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    from pdf_inspector_spark.media import _mp4_sample_table
    p = make_mp4(3000, 11, n_frames=4, frame_w=10, frame_h=7)
    codec, samples = _mp4_sample_table(p)
    assert codec == b"jpeg" and len(samples) == 4
    for off, sz in samples:
        w, h, rgb = decode_baseline_jpeg(p[off:off + sz])
        assert (w, h, len(rgb)) == (10, 7, 10 * 7 * 3)
    assert _mp4_sample_table(make_mp4(3000, 11)) is None
    assert _mp4_sample_table(p[:60]) is None
    # truncation inside mdat: offsets point past the end → rejected
    assert _mp4_sample_table(p[:len(p) - 5]) is None


def test_mp4_frame_sampling_step(spark):
    """mp4 sampling uses the mvhd duration for frame spacing: 6 frames
    over 600ms (100ms each) with every_ms=250 → indices 0,3 (ceil)."""
    p = make_mp4(600, 9, n_frames=6, frame_w=8, frame_h=6)
    df = spark.createDataFrame(
        [(1, "video", "mp4", bytearray(p))],
        "media_id long, kind string, fmt string, payload binary")
    rows = sample_frames(df, every_ms=250).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3]
    assert all(r["error_kind"] is None for r in rows)


def test_payload_generator_is_pure():
    assert _payload_for(7, 100) == _payload_for(7, 100)
    assert _payload_for(7, 100) != _payload_for(8, 100)


# -- property tests: generator → parser/decoder roundtrips --------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 64), h=st.integers(1, 64), mid=st.integers(0, 10**6))
def test_prop_image_header_roundtrip(w, h, mid):
    for fmt, make, depth in (("png", make_png, 8), ("bmp", make_bmp, 24),
                             ("ppm", make_ppm, 8), ("jpeg", make_jpeg, 8)):
        hdr = parse_media_header(make(w, h, mid), fmt)
        assert (hdr["decoded_width"], hdr["decoded_height"],
                hdr["bit_depth"]) == (w, h, depth), fmt


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), mid=st.integers(0, 10**6))
def test_prop_pixel_decode_roundtrip(w, h, mid):
    for fmt, make in (("png", make_png), ("bmp", make_bmp)):
        dw, dh, rgb = decode_image(make(w, h, mid), fmt)
        assert (dw, dh) == (w, h)
        assert rgb == _payload_for(mid, w * h * 3), fmt


@settings(max_examples=40, deadline=None)
@given(ms=st.integers(1, 5000), mid=st.integers(0, 10**6))
def test_prop_duration_roundtrip(ms, mid):
    # WAV durations quantize to whole samples at 8 kHz
    n = 8000 * ms // 1000
    assert parse_media_header(make_wav(ms, mid),
                              "wav")["decoded_duration_ms"] == n * 1000 // 8000
    assert parse_media_header(make_mp4(ms, mid),
                              "mp4")["decoded_duration_ms"] == ms


@settings(max_examples=80, deadline=None)
@given(payload=st.binary(min_size=0, max_size=200),
       fmt=st.sampled_from(("png", "bmp", "ppm", "jpeg", "wav", "mp4")))
def test_prop_parser_never_raises_on_fuzz(payload, fmt):
    hdr = parse_media_header(payload, fmt)
    assert set(hdr) == {"decoded_width", "decoded_height", "bit_depth",
                        "decoded_duration_ms"}


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(min_size=0, max_size=200),
       prefix=st.sampled_from((b"", b"\x89PNG\r\n\x1a\n", b"BM", b"P6\n",
                               b"\xff\xd8", b"RIFF")))
def test_prop_parser_never_raises_on_magic_prefixed_fuzz(payload, prefix):
    """Valid magic + garbage body — the dangerous half-parse path."""
    for fmt in ("png", "bmp", "ppm", "jpeg", "wav", "mp4"):
        parse_media_header(prefix + payload, fmt)


@settings(max_examples=80, deadline=None)
@given(pos=st.integers(0, 10_000), chunk=st.binary(min_size=1, max_size=16),
       mid=st.integers(0, 50))
def test_prop_mp4_sample_table_never_raises_on_corruption(pos, chunk, mid):
    """Overwrite an arbitrary byte range of a valid frames-mp4: the
    sample-table walk must return None or a bounded, in-file sample list
    — never raise, never over-allocate (the r6 error-as-row contract)."""
    from pdf_inspector_spark.media import _mp4_sample_table
    base = make_mp4(900, mid, n_frames=3, frame_w=6, frame_h=5)
    p = bytearray(base)
    pos = pos % len(p)
    p[pos:pos + len(chunk)] = chunk
    p = bytes(p[:len(base)])
    tbl = _mp4_sample_table(p)
    if tbl is not None:
        codec, samples = tbl
        assert len(samples) <= len(p) // 4
        for off, sz in samples:
            assert 0 <= off and off + sz <= len(p)


# -- round-5 hardening: spec-legal JPEG variants, corrupt-payload rows,
# -- top-down BMP oracle sign-fold ------------------------------------------

def test_jpeg_header_fill_bytes_and_standalone_markers():
    """Spec-legal JPEGs may pad with 0xFF fill bytes between segments and
    emit length-less standalone markers (TEM 0x01, RST 0xD0-0xD7) before
    SOF — the walk must skip both instead of misreading a length."""
    base = make_jpeg(40, 30, 7)
    # Splice fill bytes + a TEM + an RST1 between APP0 and SOF0.
    app0_end = 2 + 2 + 16   # SOI + APP0 marker + APP0 payload
    spliced = (base[:app0_end]
               + b"\xff\xff\xff"          # fill bytes before next marker
               + b"\xff\x01"              # TEM (standalone)
               + b"\xff\xd1"              # RST1 (standalone)
               + base[app0_end:])
    hdr = parse_media_header(spliced, "jpeg")
    assert (hdr["decoded_width"], hdr["decoded_height"],
            hdr["bit_depth"]) == (40, 30, 8)


def test_decode_resize_corrupt_payload_error_as_row(spark):
    """Corrupt/truncated container bytes must yield a NULL pixel row
    (error-as-row), never a stage failure: bad-IHDR PNG (ValueError /
    TypeError path), truncated IDAT (zlib.error path), undersized BMP
    (struct/ValueError path) — mixed with one good row that must still
    decode."""
    good = make_png(4, 4, 1)
    bad_png = good[:12] + b"JUNK" + good[16:]          # IHDR tag destroyed
    trunc_png = good[:40]                               # cut inside IDAT
    bad_bmp = make_bmp(8, 8, 2)[:30]                    # header torn mid-way
    rows = [(0, "image", "png", good),
            (1, "image", "png", bad_png),
            (2, "image", "png", trunc_png),
            (3, "image", "bmp", bad_bmp)]
    df = spark.createDataFrame(rows, "media_id long, kind string, "
                                     "fmt string, payload binary")
    out = {r["media_id"]: r for r in decode_and_resize(df, 8, 8).collect()}
    assert len(out) == 4
    assert len(out[0]["pixels"]) == 8 * 8 * 3
    for mid in (1, 2, 3):
        assert out[mid]["pixels"] is None
        assert out[mid]["out_width"] is None


def test_bmp_oracle_height_signfold_top_down():
    """The DuckDB height oracle must reinterpret the LE@22 uint as a
    signed int32 before abs() — a top-down BMP (negative height) reads
    as >= 2^31 unsigned and a bare ::INT cast raises out-of-range."""
    import duckdb

    from pdf_inspector_spark.operators.multimodal import _DEC_H
    p = bytearray(make_bmp(3, 2, 0))
    p[22:26] = struct.pack("<i", -2)                    # top-down
    con = duckdb.connect()
    con.execute("CREATE TABLE m AS SELECT 'bmp' AS fmt, ? AS payload, "
                "hex(?) AS h", [bytes(p), bytes(p)])
    (h,) = con.execute(f"SELECT {_DEC_H} FROM m").fetchone()
    hdr = parse_media_header(bytes(p), "bmp")
    assert h == hdr["decoded_height"] == 2


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_prop_jpeg_decoder_never_hangs_or_crashes(data):
    """The decoder must raise ValueError (or MediaCodecUnavailable) on
    arbitrary garbage — never another exception type, never a hang —
    both bare and SOI-prefixed (the dangerous half-parse path)."""
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    for payload in (data, b"\xff\xd8" + data):
        try:
            decode_baseline_jpeg(payload)
        except (ValueError, MediaCodecUnavailable):
            pass


@settings(max_examples=15, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), mid=st.integers(0, 10**6))
def test_prop_jpeg_roundtrip_shape_and_nearlossless(w, h, mid):
    """Any dimensions (incl. partial blocks): encode→decode returns the
    exact dimensions and a w*h*3 buffer; at near-lossless quant the
    smooth-gradient error stays within DCT float-rounding distance."""
    import numpy as np

    from pdf_inspector_spark.jpeg import (decode_baseline_jpeg,
                                          encode_baseline_jpeg)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack([
        (x * 255) // max(w - 1, 1),
        (y * 255) // max(h - 1, 1),
        ((x + y) * 255) // max(w + h - 2, 1)], axis=-1).astype(np.uint8)
    enc = encode_baseline_jpeg(rgb.tobytes(), w, h, quant_scale=0.05)
    dw, dh, out = decode_baseline_jpeg(enc)
    assert (dw, dh) == (w, h) and len(out) == w * h * 3
    dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(dec - rgb.astype(int)).max() <= 3


def test_jpeg_decoder_truncated_segments_raise_valueerror():
    """Code-review r5: truncated SOS/DHT/SOF segments raised IndexError/
    struct.error — outside the documented ValueError contract and the
    error-as-row catch list. Each must raise ValueError."""
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    for payload in (
            b"\xff\xd8\xff\xda\x00\x04\x03\x01",      # SOS comp list cut
            b"\xff\xd8\xff\xc4\x00\x06\x00\x01\x02\x03",  # DHT counts cut
            b"\xff\xd8\xff\xc0\x00\x05\x08\x00",      # SOF0 header cut
            b"\xff\xd8\xff",                          # marker byte cut
    ):
        with pytest.raises(ValueError):
            decode_baseline_jpeg(payload)


def test_jpeg_decoder_rejects_noninterleaved_scans():
    """A baseline JPEG whose first SOS covers fewer components than the
    frame declares (spec-legal non-interleaved scans) must raise, not
    silently decode luma-only with zero chroma planes."""
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    base = make_jpeg(8, 8, 1)
    sos_at = base.find(b"\xff\xda")
    assert sos_at > 0
    # rewrite SOS to a single-component (Y) scan header
    one_comp_sos = (b"\xff\xda" + struct.pack(">H", 8)
                    + b"\x01" + bytes((1, 0x00)) + b"\x00\x3f\x00")
    spliced = base[:sos_at] + one_comp_sos + base[sos_at + 14:]
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_baseline_jpeg(spliced)


def _audio_trak() -> bytes:
    """Minimal audio trak: hdlr 'soun' + an mp4a sample table with zero
    samples — a parser that binds to the first trak with a sample table
    (instead of the first VIDEO trak) trips over it."""
    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body
    hdlr = box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 13)
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
               + struct.pack(">I", 16) + b"mp4a" + b"\x00" * 8)
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 0))
    stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", 0))
    stbl = box(b"stbl", stsd + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    return box(b"trak", mdia)


def test_mp4_sample_table_binds_to_video_trak():
    """An audio-first mux must not hand its mp4a sample table to the
    frame sampler (code-review r6): splice an audio trak before the
    video trak and patch the video stco for the shift."""
    from pdf_inspector_spark.media import _mp4_sample_table
    p = make_mp4(1000, 4, n_frames=3, frame_w=8, frame_h=6)
    atrak = _audio_trak()
    trak_pos = p.index(b"trak") - 4
    out = bytearray(p[:trak_pos] + atrak + p[trak_pos:])
    moov_pos = out.index(b"moov") - 4
    out[moov_pos:moov_pos + 4] = struct.pack(
        ">I", struct.unpack(">I", p[moov_pos:moov_pos + 4])[0] + len(atrak))
    # patch the VIDEO stco (the second stco in the file) for the shift
    first_stco = out.index(b"stco")
    vstco = out.index(b"stco", first_stco + 4)
    n = struct.unpack(">I", out[vstco + 8:vstco + 12])[0]
    for i in range(n):
        o = vstco + 12 + 4 * i
        out[o:o + 4] = struct.pack(
            ">I", struct.unpack(">I", bytes(out[o:o + 4]))[0] + len(atrak))
    from pdf_inspector_spark.jpeg import decode_baseline_jpeg
    codec, samples = _mp4_sample_table(bytes(out))
    assert codec == b"jpeg" and len(samples) == 3
    for off, sz in samples:
        w, h, _ = decode_baseline_jpeg(bytes(out[off:off + sz]))
        assert (w, h) == (8, 6)


def test_mp4_sample_table_corrupt_stsz_count_is_rejected():
    """A corrupt 32-bit stsz/stco count must be rejected by the box
    extent check BEFORE any list allocation (code-review r6: a 2^31
    count previously attempted a ~17 GB list -> MemoryError escaped the
    error-as-row boundary)."""
    from pdf_inspector_spark.media import _mp4_sample_table
    p = make_mp4(1000, 4, n_frames=3, frame_w=8, frame_h=6)
    stsz = p.index(b"stsz")
    stco = p.index(b"stco")
    for pos in (stsz + 12, stco + 8):  # stsz count / stco entry_count
        bad = bytearray(p)
        bad[pos:pos + 4] = struct.pack(">I", 2 ** 31)
        assert _mp4_sample_table(bytes(bad)) is None
    # fixed-size variant: sample_size != 0 with a huge count
    bad = bytearray(p)
    bad[stsz + 8:stsz + 16] = struct.pack(">II", 100, 2 ** 31)
    bad[stco + 8:stco + 12] = struct.pack(">I", 2 ** 31)
    assert _mp4_sample_table(bytes(bad)) is None


def test_mp4_torn_mvhd_samples_every_frame(spark):
    """Valid stbl but unparsable mvhd: frame timing is unknown, so
    sampling falls back to every frame instead of inventing a duration
    that collapses to frame 0 (code-review r6)."""
    p = bytearray(make_mp4(600, 9, n_frames=6, frame_w=8, frame_h=6))
    mvhd = p.index(b"mvhd")
    p[mvhd:mvhd + 4] = b"mvhX"  # fourcc corrupted in place, sizes intact
    df = spark.createDataFrame(
        [(1, "video", "mp4", bytes(p))],
        "media_id long, kind string, fmt string, payload binary")
    rows = sample_frames(df, every_ms=250).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3, 4, 5]
    assert all(r["error_kind"] is None for r in rows)
