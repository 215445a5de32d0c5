"""Multimodal (binary) column operators — Spark plumbing, stubbed codecs.

A 100 TB training-data pipeline treats images/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions over ``mapInPandas``. The Spark side here — schema,
partition sizing, UDF signature, batch iteration — is real and tested;
the codec step is stubbed (deterministic fake or NotImplementedError)
because no image/audio libraries exist in this container. Swapping
``_decode_image_stub`` for PIL/torchvision is a one-function change
that alters no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ship worker-side functions by value — executors may not have this
# package importable (see streaming/events.py for rationale)
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: opaque payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image/jpeg, audio/wav, ...
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    "feat_hash long, thumb_width int, thumb_height int"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: a real implementation would parse the image header
    (PIL.Image.open). Deterministic fake derived from content length so
    tests can assert plumbing end-to-end. Raises on empty payloads the
    way a real decoder raises on corrupt files."""
    if not payload:
        raise ValueError("empty payload (corrupt asset)")
    side = max(1, len(payload) % 4096)
    return side, max(1, side // 2)


def extract_features(
    assets: DataFrame,
    batch_target_rows: int = 1024,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract binary assets via mapInPandas.

    ``decoder`` is the injection seam: a callable ``bytes -> (width,
    height)`` shipped to executors by value. Default is the
    deterministic stub (no image libraries in this container); a real
    deployment passes e.g. ``lambda b: PIL.Image.open(io.BytesIO(b))
    .size`` without editing the operator — the plan shape is identical.

    Plan shape: one narrow Arrow-batched pass, no shuffle; payload
    bytes never leave the executor. Decode failures are recorded as
    NULL dimensions, not task failures (a corrupt asset must not kill
    a 100 TB scan).
    """
    import pandas as pd

    decode = decoder if decoder is not None else _decode_image_stub

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            widths, heights, hashes, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                try:
                    w, h = decode(raw)
                    widths.append(w)
                    heights.append(h)
                except Exception:  # injected codecs raise arbitrary errors
                    widths.append(None)
                    heights.append(None)
                # content fingerprint: md5-derived (python hash() is
                # per-process salted for bytes — not reproducible)
                digest = hashlib.md5(raw).digest()
                hashes.append(int.from_bytes(digest[:8], "big") & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": np.array(sizes, dtype="int64"),
                    "feat_hash": np.array(hashes, dtype="int64"),
                    "thumb_width": pd.array(widths, dtype="Int32"),
                    "thumb_height": pd.array(heights, dtype="Int32"),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video asset into one
    row per sampled frame timestamp (the decode itself is the stubbed
    step). The expansion is a JVM-side sequence/explode — the expensive
    per-frame work lands in extract_features afterwards."""
    return (
        assets.filter(F.col("media_type").startswith("video/"))
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "media_type", "frame_ts_ms", "payload")
    )
