"""Multimodal-asset queries (extended surface): the binary-column
pipeline as oracle-checked catalog entries.

The driver's tables carry no binary columns, so the asset table is
synthesized DETERMINISTICALLY from ``documents`` (media type
round-robins by id, video durations derived from n_chars). Image
assets get a REAL minimal PNG: an IHDR header with width/height
derived from the document columns, followed by the text bytes — so
the driver gate exercises the real header parser
(operators/multimodal.decode_image_dimensions), whose output
dimensions must round-trip the values the oracle computes
arithmetically. Audio/video payloads are raw text bytes (no image
header → NULL dimensions by the corrupt-asset contract). Both engines
construct identical bytes, so byte counts and the hex-md5 content
fingerprints are fully value-checked.
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


#: PNG signature + IHDR chunk prefix (length=13, type) — 16 bytes
_PNG_HDR_HEX = "89504E470D0A1A0A0000000D49484452"
#: bit depth 8, color type 2 (truecolor), compression/filter/interlace
#: 0, then a placeholder CRC (header parsers don't validate CRCs)
_PNG_TAIL_HEX = "080200000000000000"


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic multimodal asset table
    (ASSET_SCHEMA shape: opaque payload + typed metadata). Image
    assets are REAL minimal PNGs (parseable IHDR with deterministic
    dimensions), so the default header codec does real work on them."""
    docs = fan_out(Catalog(spark, sf_dir).load("documents"))
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    w = (F.col("n_chars") % 1920 + 1).cast("int")
    h = (F.col("doc_id") % 1080 + 1).cast("int")
    png = F.concat(
        F.unhex(
            F.concat(
                F.lit(_PNG_HDR_HEX),
                F.lpad(F.hex(w), 8, "0"),
                F.lpad(F.hex(h), 8, "0"),
                F.lit(_PNG_TAIL_HEX),
            )
        ),
        F.encode(F.col("text"), "UTF-8"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.when(F.col("doc_id") % 3 == 0, png)
        .otherwise(F.encode(F.col("text"), "UTF-8"))
        .alias("payload"),
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
    # sort via a materialized stage: a plain orderBy's range-sampling
    # pass would run the Arrow-batched header decode TWICE
    from data_export_tool_spark.parallelism import sort_after_stage

    return sort_after_stage(
        extract_features(synth_assets(spark, sf_dir)), "asset_id"
    )


#: the oracle replays the byte construction (identical PNG header for
#: image assets), the hex-md5 fingerprint (first 8 md5 bytes of
#: hex(payload), sign bit cleared — multimodal.extract_features), and
#: the header parser's round-tripped dimensions; non-image payloads
#: carry no parseable header → NULL dims per the corrupt-asset contract
X01_ORACLE = f"""
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         CASE WHEN doc_id % 3 = 0 THEN
           unhex('{_PNG_HDR_HEX}'
                 || lpad(to_hex((n_chars % 1920) + 1), 8, '0')
                 || lpad(to_hex((doc_id % 1080) + 1), 8, '0')
                 || '{_PNG_TAIL_HEX}') || encode(text)
         ELSE encode(text) END AS payload,
         CASE WHEN doc_id % 3 = 0 THEN (n_chars % 1920) + 1 END AS w,
         CASE WHEN doc_id % 3 = 0 THEN (doc_id % 1080) + 1 END AS h
  FROM documents
)
SELECT asset_id, media_type,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CAST(('0x' || substring(md5(hex(payload)), 1, 16))::UBIGINT
            & 9223372036854775807::UBIGINT AS BIGINT) AS feat_hash,
       w::INTEGER AS thumb_width,
       h::INTEGER AS thumb_height
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
