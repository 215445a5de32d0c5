"""Multimodal (binary) column operators.

A 100 TB training-data pipeline treats images/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions over ``mapInPandas``. The Spark side — schema,
partition sizing, UDF signature, batch iteration — is real and tested,
and so is the DEFAULT codec: a pure-Python header-only dimension
parser for PNG (IHDR chunk), GIF (logical screen descriptor) and
JPEG (SOFn frame scan) — the three formats whose headers are fully
public and parseable without an image library. Full pixel decode /
resampling still needs PIL/torchvision (absent in this container);
``decoder=`` remains the injection seam for that, and swapping it in
alters no plan shape.
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


class ImageDecodeError(ValueError):
    """Payload is not a parseable PNG/GIF/JPEG (or is truncated).

    The injection contract for custom decoders: signal corrupt or
    unsupported payloads by raising ``ValueError`` (this class or any
    other subclass) — those become NULL dimensions. Any OTHER exception
    type (TypeError from a wrong-arity lambda, ImportError from a
    missing codec library, ...) is treated as a systematic failure and
    propagates as a task failure instead of silently nulling every row.
    """


#: JPEG start-of-frame markers that carry dimensions (baseline,
#: extended/progressive/lossless, arithmetic variants). C4/C8/CC are
#: DHT/JPG/DAC — tables, not frames.
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def decode_image_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the image header alone — pure Python, no
    image library, O(header) not O(pixels).

    Formats (all public specs):
    - PNG: 8-byte signature, then the IHDR chunk holds width/height as
      big-endian u32 at fixed offsets 16/20.
    - GIF: ``GIF87a``/``GIF89a`` signature, then the logical screen
      descriptor holds width/height as little-endian u16 at offsets 6/8.
    - JPEG: ``FFD8`` SOI, then a marker walk (each segment is
      ``FF <marker> <u16 length>``) to the first SOFn frame header,
      whose payload is precision u8, height u16, width u16 big-endian.

    Raises :class:`ImageDecodeError` on anything else (including empty
    or truncated payloads) — callers map that to NULL dimensions.
    """
    if not payload:
        raise ImageDecodeError("empty payload (corrupt asset)")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ImageDecodeError("truncated PNG (no IHDR)")
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        # PNG spec caps dimensions at 2^31 - 1; anything larger would
        # also overflow the Int32 output column downstream
        if not (0 < w < 1 << 31 and 0 < h < 1 << 31):
            raise ImageDecodeError("PNG dimensions out of range")
        return w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ImageDecodeError("truncated GIF (no screen descriptor)")
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        if w == 0 or h == 0:
            raise ImageDecodeError("GIF dimensions out of range")
        return w, h
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                raise ImageDecodeError("JPEG marker desync")
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill bytes before a marker are legal
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if seg_len < 2:
                raise ImageDecodeError("JPEG segment length underflow")
            if marker in _JPEG_SOF_MARKERS:
                if pos + 9 > n:
                    raise ImageDecodeError("truncated JPEG SOF")
                h = int.from_bytes(payload[pos + 5 : pos + 7], "big")
                w = int.from_bytes(payload[pos + 7 : pos + 9], "big")
                if w == 0 or h == 0:
                    raise ImageDecodeError("JPEG dimensions out of range")
                return w, h
            pos += 2 + seg_len
        raise ImageDecodeError("JPEG has no SOF frame header")
    raise ImageDecodeError("unrecognized image format")


def extract_features(
    assets: DataFrame,
    batch_target_rows: int = 1024,
    decoder=None,
) -> DataFrame:
    """Decode + feature-extract binary assets via mapInPandas.

    ``decoder`` is the injection seam: a callable ``bytes -> (width,
    height)`` shipped to executors by value. Default is
    :func:`decode_image_dimensions` — a real pure-Python header parser
    for PNG/GIF/JPEG. A deployment with image libraries must translate
    its library's corrupt-input errors to the contract's ``ValueError``
    (PIL, for instance, raises ``UnidentifiedImageError`` — an OSError
    subclass — on bad bytes)::

        def pil_dims(b):
            try:
                return PIL.Image.open(io.BytesIO(b)).size
            except PIL.UnidentifiedImageError as e:
                raise ImageDecodeError(str(e)) from e

    The plan shape is identical whichever decoder is injected.

    Plan shape: one narrow Arrow-batched pass, no shuffle; payload
    bytes never leave the executor. PER-ROW decode failures —
    signalled by ``ValueError`` per the injection contract
    (:class:`ImageDecodeError`) — are recorded as NULL dimensions, not
    task failures (a corrupt asset must not kill a 100 TB scan). Any
    other exception type is a systematic failure (wrong-arity lambda,
    missing import inside the codec) and PROPAGATES: a decoder broken
    on 100% of assets must fail the job, not emit all-NULL columns.
    """
    import pandas as pd

    decode = decoder if decoder is not None else decode_image_dimensions

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
                    dims = decode(raw)
                except ValueError:  # the documented corrupt-asset signal
                    dims = None
                if dims is None:
                    widths.append(None)
                    heights.append(None)
                else:
                    # unpack OUTSIDE the try: a decoder returning the
                    # wrong shape is a systematic failure and must
                    # raise, not masquerade as per-row corruption
                    w, h = dims
                    widths.append(w)
                    heights.append(h)
                # content fingerprint: md5 over the UPPERCASE HEX of the
                # bytes (python hash() is per-process salted; and SQL
                # engines can md5 strings but often not blobs — hex-then-
                # md5 is reproducible anywhere: DuckDB md5(hex(payload)))
                digest = hashlib.md5(raw.hex().upper().encode("ascii")).digest()
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


# ---------------------------------------------------------------------------
# Audio metadata (same design as the image codec: a REAL pure-Python
# parser for the one format whose header is fully public and
# library-free — RIFF/WAVE — and the documented ValueError contract as
# the injection seam for compressed codecs)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    "sample_rate int, channels int, duration_ms long"
)


class AudioDecodeError(ValueError):
    """Corrupt/unsupported audio payload. Injected decoders signal
    per-row failures with ``ValueError`` (this class or any subclass);
    any other exception type is treated as systematic and propagates.
    """


def decode_wav_metadata(payload: bytes) -> tuple[int, int, int]:
    """``(sample_rate, channels, n_frames)`` from a RIFF/WAVE header —
    pure chunk-walk over the public container layout (RIFF magic,
    'fmt ' chunk fields, 'data' chunk size; chunk sizes pad to even).
    No audio library, no sample decode. Raises
    :class:`AudioDecodeError` on anything that is not a well-formed
    PCM-style WAV."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    off = 12
    sample_rate = channels = bits = None
    data_size = None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = off + 8
        if cid == b"fmt ":
            if body + 16 > len(payload):
                raise AudioDecodeError("truncated fmt chunk")
            channels = int.from_bytes(payload[body + 2 : body + 4], "little")
            sample_rate = int.from_bytes(payload[body + 4 : body + 8], "little")
            bits = int.from_bytes(payload[body + 14 : body + 16], "little")
        elif cid == b"data":
            data_size = min(size, len(payload) - body)
        off = body + size + (size & 1)  # chunks pad to even
    if not sample_rate or not channels or not bits or data_size is None:
        raise AudioDecodeError("missing fmt/data chunk")
    # a corrupt-but-walkable header with absurd u32/u16 fields must be
    # a per-row decode error, not an Int32 overflow that kills the
    # whole mapInPandas stage downstream
    if sample_rate > 2_147_483_647 or channels > 32_767 or bits > 256:
        raise AudioDecodeError("implausible fmt fields (corrupt header)")
    bytes_per_frame = channels * max(bits // 8, 1)
    return sample_rate, channels, data_size // bytes_per_frame


def audio_features(
    assets: DataFrame,
    decoder=None,
) -> DataFrame:
    """Audio metadata extraction via one narrow Arrow-batched pass —
    the audio twin of :func:`extract_features`, with the identical
    failure contract: per-row ``ValueError`` → NULL metadata columns;
    any other exception propagates as a systematic decoder failure.
    Default decoder is the real WAV parser; inject a library-backed
    callable ``bytes -> (sample_rate, channels, n_frames)`` for
    compressed formats."""
    import pandas as pd

    decode = decoder if decoder is not None else decode_wav_metadata

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rates, chans, durs, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                try:
                    meta = decode(raw)
                except ValueError:
                    meta = None
                if meta is None:
                    rates.append(None)
                    chans.append(None)
                    durs.append(None)
                else:
                    sr, ch, n_frames = meta
                    rates.append(sr)
                    chans.append(ch)
                    durs.append((n_frames * 1000) // max(sr, 1))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": np.array(sizes, dtype="int64"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "channels": pd.array(chans, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
