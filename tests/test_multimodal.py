"""Multimodal binary-column plumbing tests (stubbed codecs)."""

from __future__ import annotations

from data_export_tool_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
)


def _assets(spark):
    rows = [
        (1, "image/jpeg", bytearray(b"\xff\xd8" + b"x" * 100), 0, 0, None),
        (2, "image/png", bytearray(b"\x89PNG" + b"y" * 5000), 0, 0, None),
        (3, "image/jpeg", bytearray(b""), 0, 0, None),  # corrupt/empty
        (4, "video/mp4", bytearray(b"ftyp" + b"z" * 64), 0, 0, 3500),
    ]
    return spark.createDataFrame(
        rows,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_extract_features_plumbing(spark):
    out = {r.asset_id: r for r in extract_features(_assets(spark)).collect()}
    assert out[1].n_bytes == 102
    assert out[2].n_bytes == 5004
    # corrupt asset → NULL dims, row preserved (no task failure)
    assert out[3].thumb_width is None and out[3].n_bytes == 0
    # deterministic fingerprints
    assert out[1].feat_hash == out[1].feat_hash >= 0
    again = {r.asset_id: r.feat_hash for r in extract_features(_assets(spark)).collect()}
    assert again == {k: v.feat_hash for k, v in out.items()}


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
    assert out[2].n_bytes == 5004


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_assets(spark), every_ms=1000).collect()
    # only the video asset expands; 3500ms at 1000ms cadence → 0,1000,2000,3000
    assert {f.asset_id for f in frames} == {4}
    assert sorted(f.frame_ts_ms for f in frames) == [0, 1000, 2000, 3000]
