"""Multimodal-asset queries (extended surface): the binary-column
pipeline as oracle-checked catalog entries.

The driver's tables carry no binary columns, so the asset table is
synthesized DETERMINISTICALLY from ``documents`` (payload = UTF-8 bytes
of the text, media type round-robins by id, video durations derived
from n_chars) — both the engine and the DuckDB oracle construct the
same bytes, which makes the whole mapInPandas decode/feature pipeline
value-checkable: byte counts, md5-derived content fingerprints, and the
stub decoder's deterministic thumbnail dimensions
(operators/multimodal.py; the codec itself stays a documented stub —
no image libraries in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
)
from data_export_tool_spark.parallelism import fan_out
from data_export_tool_spark.queries import QuerySpec


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic multimodal asset table
    (ASSET_SCHEMA shape: opaque payload + typed metadata)."""
    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image/jpeg")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(
            F.col("doc_id") % 3 == 2, (F.col("n_chars") % 10) * 1000 + 500
        )
        .cast("int")
        .alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# x01 — decode + feature-extract over mapInPandas (Arrow batches)
# --------------------------------------------------------------------------
def x01_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(synth_assets(spark, sf_dir)).orderBy("asset_id")


#: the stub decoder: side = max(1, n_bytes % 4096), h = max(1, side//2)
#: (multimodal._decode_image_stub); fingerprint = first 8 md5 bytes,
#: sign bit cleared (multimodal.extract_features)
X01_ORACLE = """
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS hex
  FROM documents
)
SELECT asset_id, media_type, n_bytes,
       CAST(('0x' || substring(hex, 1, 16))::UBIGINT
            & 9223372036854775807::UBIGINT AS BIGINT) AS feat_hash,
       CASE WHEN n_bytes > 0
            THEN greatest(1, n_bytes % 4096) END::INTEGER AS thumb_width,
       CASE WHEN n_bytes > 0
            THEN greatest(1, greatest(1, n_bytes % 4096) // 2) END::INTEGER
           AS thumb_height
FROM a
ORDER BY asset_id
"""


# --------------------------------------------------------------------------
# x02 — video frame-sampling manifest (JVM sequence/explode; the
# expansion a per-frame decode pass would consume)
# --------------------------------------------------------------------------
def x02_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample_plan(synth_assets(spark, sf_dir), every_ms=1000)
    return frames.select(
        "asset_id", "media_type", "frame_ts_ms", F.length("payload").alias("n_bytes")
    ).orderBy("asset_id", "frame_ts_ms")


X02_ORACLE = """
SELECT doc_id AS asset_id,
       'video/mp4' AS media_type,
       CAST(unnest(generate_series(
           0, greatest((n_chars % 10) * 1000 + 500 - 1, 0), 1000)) AS BIGINT
       ) AS frame_ts_ms,
       octet_length(encode(text)) AS n_bytes
FROM documents
WHERE doc_id % 3 = 2
ORDER BY asset_id, frame_ts_ms
"""


QUERIES = [
    QuerySpec("x01_asset_features", x01_asset_features, X01_ORACLE, "multimodal:decode/features"),
    QuerySpec("x02_frame_manifest", x02_frame_manifest, X02_ORACLE, "multimodal:frame-sample"),
]
