"""Multimodal decode tests: real header parsing on tiny hand-built
binary fixtures (no codec library), plus the Arrow-batched Spark path.
"""

from __future__ import annotations

import pytest

from kyiv_traffic_bigdata_spark.operators.multimodal import (
    extract_media_metadata,
    fake_decode_features,
    real_decode,
    try_decode_header,
)


def _png(w=640, h=480):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )


def _bmp(w=320, h=-240):  # negative height = top-down row order
    return (
        b"BM"
        + (62).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + b"\x01\x00\x18\x00"
    )


def _gif(w=12, h=34):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def _jpeg(w=1024, h=768):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(channels=2, rate=44100, seconds=2.0, bits=16):
    byte_rate = rate * channels * bits // 8
    data_size = int(byte_rate * seconds)
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + data_size.to_bytes(4, "little")  # size only; no samples
    return b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little") + b"WAVE" + fmt + data


def test_image_headers_decode_real_dimensions():
    assert try_decode_header(_png()) == {
        "format": "png", "width": 640, "height": 480,
        "channels": None, "sample_rate_hz": None, "duration_s": None,
    }
    assert try_decode_header(_bmp())["width"] == 320
    assert try_decode_header(_bmp())["height"] == 240  # top-down magnitude
    g = try_decode_header(_gif())
    assert (g["format"], g["width"], g["height"]) == ("gif", 12, 34)
    j = try_decode_header(_jpeg())
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1024, 768)


def test_wav_header_decodes_audio_metadata():
    m = try_decode_header(_wav(channels=2, rate=44100, seconds=2.0))
    assert m["format"] == "wav" and m["channels"] == 2
    assert m["sample_rate_hz"] == 44100 and m["duration_s"] == 2.0


def test_unknown_formats_raise_not_implemented_only():
    # the real decoder works on header formats...
    assert real_decode(_png())["format"] == "png"
    # ...and raises ONLY for genuinely codec-requiring payloads
    mp4ish = b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64
    for bad in (mp4ish, b"", b"\xff\xd8\x00garbage"):
        with pytest.raises(NotImplementedError):
            real_decode(bad)


def test_truncated_headers_are_rejected_not_misparsed():
    # signature present but the dimension/fmt fields cut off → None,
    # never a misparse or an exception
    assert try_decode_header(_png()[:12]) is None
    assert try_decode_header(_bmp()[:20]) is None
    assert try_decode_header(_gif()[:8]) is None
    assert try_decode_header(_wav()[:14]) is None  # RIFF/WAVE, no fmt chunk
    assert try_decode_header(b"") is None


def test_extract_media_metadata_spark_path(spark):
    rows = [
        (1, bytearray(_png(7, 9))),
        (2, bytearray(_wav(1, 8000, 0.5))),
        (3, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in extract_media_metadata(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 7, 9)
    assert (got[2]["format"], got[2]["sample_rate_hz"], got[2]["duration_s"]) == (
        "wav", 8000, 0.5,
    )
    assert got[3]["format"] is None  # log-and-continue, not a batch failure


def test_fake_features_remain_deterministic():
    assert fake_decode_features(b"abc") == [3.0, 97.0, 99.0, float(sum(b"abc") % 997)]
