"""Multimodal operators: binary media payloads with typed metadata.

- ``mm_media_features``: the real mapInPandas feature stage (byte stats,
  entropy, content hash, format metadata — the r2 mm_media_stats
  pure-SQL byte statistics are folded into this one gated query so the
  registry fits the driver's 50-query window), cross-checked against a
  DuckDB oracle that recomputes byte histograms from hex(payload).
  Entropy is bit-exact across engines because both accumulate
  ``p*log2(p)`` terms sequentially in ascending byte-value order (DuckDB
  via ``list_reduce`` over an ORDER BY b list; IEEE negation is exact,
  so sum-then-negate == sequential subtract).
- Since r4 the payloads are REAL container files (media.py builds valid
  PNG/BMP/PPM/WAV/MP4 and marker-correct JPEG with stdlib only) and the
  feature stage decodes width/height/bit-depth/duration from the actual
  header bytes (``parse_media_header`` — chunk/marker/box walks). The
  oracle re-derives the same fields in SQL from hex(payload): PNG/BMP/
  WAV/MP4/JPEG at their header offsets (fixed in the generated layout;
  the Python side does the real walk), PPM via regexp over the ASCII
  header. Pixel decode (decode_and_resize) is real for every image
  format including baseline JPEG (full entropy decode since r5,
  pdf_inspector_spark/jpeg.py; tests/test_media.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import register
from ..media import media_features, write_media


def _ensure(spark: SparkSession):
    path = write_media()
    df = spark.read.parquet(path)
    df.createOrReplaceTempView("media")
    return df, path


def _features_spark(spark: SparkSession, sf_dir: str):
    from . import cpu_fanout
    df, _ = _ensure(spark)
    # r7: the media parquet has 4 row groups, so the mapInPandas feature
    # stage (which includes real per-image pixel/JPEG entropy decode)
    # ran on 4 of 32 cores. Hash-repartition by media_id first — the
    # per-row kernel is partition-independent, so results are unchanged.
    df = df.repartition(cpu_fanout(spark), "media_id")
    return media_features(df).orderBy("media_id")


def _be(byte_off: int, n_bytes: int) -> str:
    """Big-endian unsigned int from hex(payload) at a byte offset."""
    return f"('0x' || substr(h, {byte_off * 2 + 1}, {n_bytes * 2}))::BIGINT"


def _le(byte_off: int, n_bytes: int) -> str:
    """Little-endian unsigned int: reverse the hex byte pairs."""
    pairs = "||".join(f"substr(h, {(byte_off + i) * 2 + 1}, 2)"
                      for i in reversed(range(n_bytes)))
    return f"('0x' || {pairs})::BIGINT"


# Header-decode mirrors (see module docstring). Offsets per format spec:
#   PNG  IHDR: width BE@16, height BE@20, bit depth @24
#   BMP  BITMAPINFOHEADER: width LE@18, height LE@22, bpp LE@28
#   JPEG (generated layout): SOF0 after the 16-byte APP0 → precision @24,
#        height BE@25, width BE@27
#   WAV  canonical 44-byte header: byte_rate LE@28, bits LE@34,
#        data size LE@40 → duration_ms = data*1000//byte_rate
#   MP4  ftyp(16) + moov + mvhd v0: timescale BE@44, duration BE@48
#   AVI  RIFF(12)+LIST hdrl(12)+avih(8): usec/frame LE@32, frames LE@48,
#        width LE@64, height LE@68; strf BITMAPINFOHEADER biBitCount LE@186
#   PPM  ASCII header (payload generated UTF-8-safe) via regexp
_DEC_W = f"""CASE fmt
    WHEN 'png'  THEN {_be(16, 4)}
    WHEN 'bmp'  THEN {_le(18, 4)}
    WHEN 'jpeg' THEN {_be(27, 2)}
    WHEN 'ppm'  THEN regexp_extract(decode(payload),
                     '^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s', 1)::BIGINT
    WHEN 'avi'  THEN {_le(64, 4)}
    ELSE NULL END"""

_DEC_H = f"""CASE fmt
    WHEN 'png'  THEN {_be(20, 4)}
    WHEN 'bmp'  THEN abs(CASE WHEN {_le(22, 4)} >= 2147483648
                         THEN {_le(22, 4)} - 4294967296
                         ELSE {_le(22, 4)} END)
    WHEN 'jpeg' THEN {_be(25, 2)}
    WHEN 'ppm'  THEN regexp_extract(decode(payload),
                     '^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s', 2)::BIGINT
    WHEN 'avi'  THEN {_le(68, 4)}
    ELSE NULL END"""

_DEC_DEPTH = f"""CASE fmt
    WHEN 'png'  THEN {_be(24, 1)}
    WHEN 'bmp'  THEN {_le(28, 2)}
    WHEN 'jpeg' THEN {_be(24, 1)}
    WHEN 'wav'  THEN {_le(34, 2)}
    WHEN 'ppm'  THEN CAST(floor(log2(regexp_extract(decode(payload),
                     '^P6\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s', 3)::DOUBLE))
                     AS BIGINT) + 1
    WHEN 'avi'  THEN {_le(186, 2)}
    ELSE NULL END"""

_DEC_DUR = f"""CASE fmt
    WHEN 'wav' THEN ({_le(40, 4)} * 1000) // {_le(28, 4)}
    WHEN 'mp4' THEN ({_be(48, 4)} * 1000) // {_be(44, 4)}
    WHEN 'avi' THEN ({_le(32, 4)} * {_le(48, 4)}) // 1000
    ELSE NULL END"""

# Oracle for the mapInPandas feature stage: byte histogram from the hex
# encoding, mean via exact integer arithmetic, Shannon entropy via a
# sequential list_reduce in ascending byte order (matches the Python
# kernel's accumulation order bit-for-bit), content hash = md5 of the
# uppercase hex payload (DuckDB v1.0 md5 takes VARCHAR only), and the
# header-decode mirrors above.
_FEATURES_DUCK = f"""
WITH hx AS (
  SELECT media_id, kind, fmt, width, height, payload,
         octet_length(payload) AS n_bytes, hex(payload) AS h
  FROM {{src}}
),
bts AS (
  SELECT media_id, ('0x' || substr(h, (i*2+1)::int, 2))::INT AS b
  FROM hx, unnest(range(0, n_bytes)) AS t(i)
),
cnts AS (
  SELECT media_id, b, COUNT(*)::BIGINT AS c
  FROM bts GROUP BY 1, 2
),
ent AS (
  SELECT c.media_id,
         CAST(SUM(c.b * c.c) AS BIGINT) AS total,
         list_reduce(list((c.c::DOUBLE / x.n_bytes)
                          * log2(c.c::DOUBLE / x.n_bytes) ORDER BY c.b),
                     (acc, t) -> acc + t) AS neg_ent
  FROM cnts c JOIN hx x USING (media_id)
  GROUP BY c.media_id
)
SELECT x.media_id, x.kind, x.fmt,
       CAST(x.n_bytes AS BIGINT) AS n_bytes,
       e.total * 1000 // x.n_bytes AS byte_mean_milli,
       CAST(trunc(-e.neg_ent * 1000) AS BIGINT) AS byte_entropy_milli,
       CASE WHEN x.height > 0 THEN x.width::BIGINT * 1000 // x.height
            ELSE 0 END AS aspect_milli,
       ('0x' || substr(md5(x.h), 1, 15))::BIGINT AS content_hash,
       {_DEC_W} AS decoded_width,
       {_DEC_H} AS decoded_height,
       {_DEC_DEPTH} AS bit_depth,
       {_DEC_DUR} AS decoded_duration_ms
FROM hx x JOIN ent e USING (media_id)
ORDER BY x.media_id
"""


def _register() -> None:
    from ..media import media_table_path
    path = media_table_path()  # written on demand
    src = f"read_parquet('{path}')"
    register("mm_media_features", _features_spark,
             _FEATURES_DUCK.format(src=src),
             "mapInPandas media feature extraction (byte stats, entropy, "
             "content hash) + REAL header decode of width/height/bit-depth/"
             "duration from valid PNG/BMP/PPM/JPEG/WAV/MP4/AVI container "
             "bytes vs hex-offset DuckDB oracle (bit-exact entropy)")


_register()
