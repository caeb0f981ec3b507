"""Multimodal media handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages. The
Spark-side plumbing (schema, batching, partitioning, UDF signatures) is
real and tested; the *codec* steps (image decode, resampling, frame
sampling) are stubbed behind ``MediaCodecUnavailable`` or a deterministic
fake, because no imaging/audio libraries exist in this environment — the
stubs mark exactly where PIL/ffmpeg drop in on a real cluster.

The synthetic media table is deterministic (seeded from ids) so tests
and oracles are stable:

    media(media_id long, kind string, fmt string, payload binary,
          width int, height int, duration_ms int, ts timestamp)
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.types as T
from pyspark.sql import DataFrame

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

_KINDS = (("image", "png"), ("image", "jpeg"), ("audio", "wav"),
          ("video", "mp4"))


class MediaCodecUnavailable(NotImplementedError):
    """Raised where a real codec (PIL / soundfile / ffmpeg) would run."""


def _payload_for(media_id: int, size: int) -> bytes:
    """Deterministic pseudo-payload: repeated md5 stream keyed by id."""
    out = bytearray()
    counter = 0
    while len(out) < size:
        out += hashlib.md5(f"media:{media_id}:{counter}".encode()).digest()
        counter += 1
    return bytes(out[:size])


def write_media(n_rows: int = 2000, data_dir: str = DATA_DIR,
                force: bool = False) -> str:
    path = os.path.join(data_dir, f"media_{n_rows}.parquet")
    if os.path.exists(path) and not force:
        return path
    os.makedirs(data_dir, exist_ok=True)
    cols: dict[str, list] = {f.name: [] for f in MEDIA_SCHEMA}
    for i in range(n_rows):
        h = int.from_bytes(hashlib.md5(f"m{i}".encode()).digest()[:8], "big")
        kind, fmt = _KINDS[h % len(_KINDS)]
        w = 64 + (h >> 8) % 1024 if kind != "audio" else 0
        hgt = 64 + (h >> 18) % 1024 if kind != "audio" else 0
        dur = (h >> 28) % 600_000 if kind != "image" else 0
        size = 256 + (h >> 4) % 4096
        cols["media_id"].append(i)
        cols["kind"].append(kind)
        cols["fmt"].append(fmt)
        cols["payload"].append(_payload_for(i, size))
        cols["width"].append(w)
        cols["height"].append(hgt)
        cols["duration_ms"].append(dur)
        cols["ts"].append(BASE_TS + timedelta(seconds=i * 37))
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
        rows.append({
            "media_id": r.media_id,
            "kind": r.kind,
            "fmt": r.fmt,
            "n_bytes": n,
            "byte_mean_milli": total * 1000 // n if n else 0,
            "byte_entropy_milli": int(entropy * 1000),
            "aspect_milli": (r.width * 1000 // r.height) if r.height else 0,
            "content_hash": int(digest[:15], 16),
        })
    return pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])


def media_features(df: DataFrame) -> DataFrame:
    """Byte-level feature extraction over binary payloads — fully real
    (no codec needed): size, mean, entropy, aspect, content hash."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_batch(pdf)
    return (df.select("media_id", "kind", "fmt", "payload", "width", "height")
            .mapInPandas(gen, FEATURES_SCHEMA))


# -- decode / resize / frame-sample (stubbed codec boundary) ----------------

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("pixels", T.BinaryType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
])


def decode_and_resize(df: DataFrame, out_w: int = 224,
                      out_h: int = 224) -> DataFrame:
    """Image decode + resize stage. The Spark plumbing (projection,
    batching, output schema) is real; the codec call is the stub."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append({
                    "media_id": r.media_id,
                    "pixels": _decode_image_stub(r.payload, r.fmt,
                                                 out_w, out_h),
                    "out_width": out_w,
                    "out_height": out_h,
                })
            yield pd.DataFrame(rows,
                               columns=[f.name for f in DECODED_SCHEMA.fields])
    return (df.where(df.kind == "image")
            .select("media_id", "fmt", "payload")
            .mapInPandas(gen, DECODED_SCHEMA))


def _decode_image_stub(payload: bytes, fmt: str, w: int, h: int) -> bytes:
    """STUB — a real deployment calls PIL here:
        Image.open(BytesIO(payload)).convert('RGB').resize((w, h)).tobytes()
    The deterministic fake keeps the batch shape and size contract
    (w*h*3 bytes) so downstream stages are testable without PIL."""
    seed = hashlib.md5(payload[:64] + f":{fmt}:{w}x{h}".encode()).digest()
    reps = (w * h * 3) // len(seed) + 1
    return (seed * reps)[:w * h * 3]


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — pure stub: raises MediaCodecUnavailable at
    executor time, demonstrating the error surface for missing codecs."""
    frame_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise MediaCodecUnavailable(
                    "video frame sampling requires ffmpeg; not available "
                    "in this environment")
            yield pd.DataFrame([], columns=[f.name for f in frame_schema.fields])

    return (df.where(df.kind == "video")
            .select("media_id", "payload")
            .mapInPandas(gen, frame_schema))
