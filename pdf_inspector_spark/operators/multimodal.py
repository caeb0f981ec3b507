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
- decode/resize and frame-sample stages live in ``media.py`` with the
  codec boundary stubbed (no imaging libs in this environment); their
  Spark plumbing is covered by tests/test_media.py.
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
    df, _ = _ensure(spark)
    return media_features(df).orderBy("media_id")


# Oracle for the mapInPandas feature stage: byte histogram from the hex
# encoding, mean via exact integer arithmetic, Shannon entropy via a
# sequential list_reduce in ascending byte order (matches the Python
# kernel's accumulation order bit-for-bit), content hash = md5 of the
# uppercase hex payload (DuckDB v1.0 md5 takes VARCHAR only).
_FEATURES_DUCK = """
WITH hx AS (
  SELECT media_id, kind, fmt, width, height,
         octet_length(payload) AS n_bytes, hex(payload) AS h
  FROM {src}
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
       ('0x' || substr(md5(x.h), 1, 15))::BIGINT AS content_hash
FROM hx x JOIN ent e USING (media_id)
ORDER BY x.media_id
"""


def _register() -> None:
    import os

    from ..transcripts import DATA_DIR
    path = os.path.join(DATA_DIR, "media_2000.parquet")  # written on demand
    src = f"read_parquet('{path}')"
    register("mm_media_features", _features_spark,
             _FEATURES_DUCK.format(src=src),
             "mapInPandas media feature extraction (byte stats, entropy, "
             "content hash, format metadata) vs hex-histogram DuckDB "
             "oracle (bit-exact entropy)")


_register()
