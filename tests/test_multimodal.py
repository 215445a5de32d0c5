"""Multimodal binary-column tests: the real header-only image codec
(PNG/GIF/JPEG dimension parsing) plus the mapInPandas plumbing."""

from __future__ import annotations

import pytest

from tests.conftest import record_opcheck

from data_export_tool_spark.operators.multimodal import (
    ImageDecodeError,
    decode_image_dimensions,
    extract_features,
    frame_sample_plan,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"  # CRC placeholder (parsers don't check)
    )


def _gif(w: int, h: int, version: bytes = b"89a") -> bytes:
    return (
        b"GIF" + version + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\xf7\x00\x00"
    )


def _jpeg(w: int, h: int, sof: int = 0xC0) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof_seg = (
        bytes([0xFF, sof])
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof_seg + b"\xff\xd9"


def test_decode_dimensions_png_gif_jpeg():
    assert decode_image_dimensions(_png(640, 480)) == (640, 480)
    assert decode_image_dimensions(_png(1, 1 << 20)) == (1, 1 << 20)
    assert decode_image_dimensions(_gif(320, 200)) == (320, 200)
    assert decode_image_dimensions(_gif(65535, 1, b"87a")) == (65535, 1)
    assert decode_image_dimensions(_jpeg(1920, 1080)) == (1920, 1080)
    # progressive (SOF2) and extended-sequential (SOF1) frames
    assert decode_image_dimensions(_jpeg(800, 600, sof=0xC2)) == (800, 600)
    assert decode_image_dimensions(_jpeg(12, 34, sof=0xC1)) == (12, 34)
    # restart markers / fill bytes before the SOF are skipped
    weird = b"\xff\xd8" + b"\xff\xff" + b"\xff\xd0" + _jpeg(5, 7)[2:]
    assert decode_image_dimensions(weird) == (5, 7)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"not an image at all",
        b"\x89PNG\r\n\x1a\n\x00\x00",  # truncated before IHDR
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"XXXX" + b"\x00" * 13,
        b"GIF89a\x00",  # truncated screen descriptor
        b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9",  # JPEG without SOF
        b"\xff\xd8zz",  # marker desync
        _png(0, 10),  # zero dimension
    ],
)
def test_decode_dimensions_rejects_corrupt(payload):
    with pytest.raises(ImageDecodeError):
        decode_image_dimensions(payload)


def _assets(spark):
    rows = [
        (1, "image/jpeg", bytearray(_jpeg(640, 360) + b"x" * 100), 0, 0, None),
        (2, "image/png", bytearray(_png(1024, 768) + b"y" * 5000), 0, 0, None),
        (3, "image/jpeg", bytearray(b""), 0, 0, None),  # corrupt/empty
        (4, "video/mp4", bytearray(b"ftyp" + b"z" * 64), 0, 0, 3500),
    ]
    return spark.createDataFrame(
        rows,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_extract_features_real_codec(spark):
    out = {r.asset_id: r for r in extract_features(_assets(spark)).collect()}
    # the DEFAULT codec parses real headers (trailing junk is fine —
    # only the header is read)
    assert (out[1].thumb_width, out[1].thumb_height) == (640, 360)
    assert (out[2].thumb_width, out[2].thumb_height) == (1024, 768)
    assert out[1].n_bytes == len(_jpeg(640, 360)) + 100
    assert out[2].n_bytes == len(_png(1024, 768)) + 5000
    # corrupt asset → NULL dims, row preserved (no task failure)
    assert out[3].thumb_width is None and out[3].n_bytes == 0
    # video payload has no image header → NULL dims, bytes intact
    assert out[4].thumb_width is None and out[4].n_bytes == 68
    # deterministic fingerprints
    assert out[1].feat_hash >= 0
    again = {r.asset_id: r.feat_hash for r in extract_features(_assets(spark)).collect()}
    assert again == {k: v.feat_hash for k, v in out.items()}


def test_systematic_codec_failure_propagates(spark):
    # a decoder broken on EVERY row (wrong arity → TypeError) must fail
    # the job, not silently emit all-NULL dimensions (ValueError is the
    # only documented corrupt-asset signal)
    def broken():  # pragma: no cover - never called successfully
        return (1, 1)

    with pytest.raises(Exception):
        extract_features(_assets(spark), decoder=broken).collect()


def test_extract_features_codec_injection(spark):
    # a user-supplied decoder flows through the mapInPandas seam; rows
    # it rejects degrade to NULL dims exactly like the stub's failures.
    # (Defined locally so cloudpickle ships it by value — the tests
    # module isn't importable on executor workers, exactly like a
    # user's ad-hoc codec wouldn't be.)
    def header_codec(raw: bytes) -> tuple[int, int]:
        if raw.startswith(b"\xff\xd8"):
            return 640, 480
        if raw.startswith(b"\x89PNG"):
            return 800, 600
        raise ValueError("unknown format")

    out = {
        r.asset_id: r
        for r in extract_features(_assets(spark), decoder=header_codec).collect()
    }
    assert (out[1].thumb_width, out[1].thumb_height) == (640, 480)
    assert (out[2].thumb_width, out[2].thumb_height) == (800, 600)
    assert out[3].thumb_width is None  # empty payload rejected
    assert out[4].thumb_width is None  # video magic unknown to codec
    # fingerprints/byte counts are codec-independent
    assert out[2].n_bytes == len(_png(1024, 768)) + 5000


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_assets(spark), every_ms=1000).collect()
    # only the video asset expands; 3500ms at 1000ms cadence → 0,1000,2000,3000
    assert {f.asset_id for f in frames} == {4}
    assert sorted(f.frame_ts_ms for f in frames) == [0, 1000, 2000, 3000]


# ---------------------------------------------------------------------------
# audio: WAV metadata codec + audio_features
# ---------------------------------------------------------------------------


def _make_wav(sample_rate=16000, channels=1, n_frames=1600, bits=16):
    """A real WAV built with the stdlib wave module — the parser is
    tested against the reference writer, not a hand-rolled fixture."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00" * (n_frames * channels * (bits // 8)))
    return buf.getvalue()


def test_decode_wav_metadata_against_stdlib_writer():
    from data_export_tool_spark.operators.multimodal import decode_wav_metadata

    cases = [
        ((16000, 1, 1600), {}),
        ((44100, 2, 4410), {}),
        ((8000, 1, 80), {"bits": 8}),
    ]
    ok = all(
        decode_wav_metadata(_make_wav(*want, **kw)) == want
        for want, kw in cases
    )
    record_opcheck("audio_wav_codec", len(cases), ok, oracle="stdlib-wave-writer")
    assert ok


def test_decode_wav_metadata_rejects_corrupt():
    import pytest as _pytest

    from data_export_tool_spark.operators.multimodal import (
        AudioDecodeError,
        decode_wav_metadata,
    )

    for bad in [b"", b"RIFF", b"RIFFxxxxWAVE", b"\x89PNG" + b"\x00" * 40,
                _make_wav()[:20]]:
        with _pytest.raises(AudioDecodeError):
            decode_wav_metadata(bad)


def test_audio_features_mixed_batch(spark):
    from data_export_tool_spark.operators.multimodal import audio_features

    wav = _make_wav(22050, 2, 22050)  # exactly 1000 ms
    rows = [
        (1, "audio/wav", bytearray(wav)),
        (2, "audio/mpeg", bytearray(b"ID3\x04corrupt-or-compressed")),
        (3, "audio/wav", None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in audio_features(df).collect()}
    assert got[1]["sample_rate"] == 22050
    assert got[1]["channels"] == 2
    assert got[1]["duration_ms"] == 1000
    assert got[1]["n_bytes"] == len(wav)
    # undecodable rows -> NULL metadata, job survives
    assert got[2]["sample_rate"] is None and got[2]["duration_ms"] is None
    assert got[3]["sample_rate"] is None and got[3]["n_bytes"] == 0


def test_audio_features_systematic_failure_propagates(spark):
    from data_export_tool_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(1, "audio/wav", bytearray(b"RIFFxxxxWAVE"))],
        "asset_id long, media_type string, payload binary",
    )

    def broken(_payload):
        raise RuntimeError("codec import missing on executor")

    import pytest as _pytest

    with _pytest.raises(Exception, match="codec import missing"):
        audio_features(df, decoder=broken).collect()


def test_audio_implausible_header_is_per_row_null(spark):
    """Review finding: a walkable RIFF header with absurd u32 fields
    overflowed the Int32 batch array and killed the stage. It must be
    a per-row NULL like any other corrupt asset."""
    from data_export_tool_spark.operators.multimodal import audio_features

    bad = bytearray(_make_wav(16000, 1, 16))
    # fmt chunk starts at offset 12+8; sample_rate at fmt_body+4
    sr_off = 12 + 8 + 4
    bad[sr_off : sr_off + 4] = (0xFFFFFFF0).to_bytes(4, "little")
    df = spark.createDataFrame(
        [(1, "audio/wav", bad), (2, "audio/wav", bytearray(_make_wav()))],
        "asset_id long, media_type string, payload binary",
    )
    got = {r["asset_id"]: r["sample_rate"] for r in audio_features(df).collect()}
    assert got[1] is None and got[2] == 16000
