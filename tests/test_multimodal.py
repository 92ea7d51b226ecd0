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


def _bmp24(w, h, pixel_fn):
    """Build a bottom-up uncompressed 24-bit BMP with pixel_fn(x, y) -> (b, g, r)."""
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h):  # bottom-up: row 0 is the BOTTOM image row
        row = bytearray()
        for x in range(w):
            row += bytes(pixel_fn(x, y))
        row += b"\x00" * (stride - len(row))
        rows += row
    data = bytes(rows)
    header = (
        b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
    )
    return header + data


def _wav_fixture(rate, channels, bits, n_samples, sample_fn):
    import struct as _struct

    block = channels * bits // 8
    data = b"".join(
        _struct.pack("<h", sample_fn(i)) * channels for i in range(n_samples)
    )
    fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def test_resize_bmp_real_nearest_neighbor(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import (
        resize_bmp_nearest,
        resize_images,
        try_decode_header,
    )

    # 4x4 quadrant image: each 2x2 quadrant has one solid color
    colors = {(0, 0): (1, 2, 3), (1, 0): (4, 5, 6), (0, 1): (7, 8, 9), (1, 1): (10, 11, 12)}
    src = _bmp24(4, 4, lambda x, y: colors[(x // 2, y // 2)])
    out = resize_bmp_nearest(src, 2, 2)
    meta = try_decode_header(out)
    assert meta["format"] == "bmp" and meta["width"] == 2 and meta["height"] == 2
    # resized pixels = the quadrant colors (nearest neighbor picks top-left of each)
    parsed = resize_bmp_nearest(out, 2, 2)  # identity round-trip on 2x2
    assert parsed == out

    df = spark.createDataFrame(
        [(1, bytearray(src)), (2, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in resize_images(df, 2, 2).collect()}
    assert got[1].status == "resized" and got[1].width == 2
    assert try_decode_header(bytes(got[1].payload))["width"] == 2
    assert got[2].status == "needs_codec" and got[2].payload is None
    assert got[3].status == "unsupported"


def test_sample_audio_frames_real_pcm_slicing(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import sample_audio_frames

    # 1 kHz mono 16-bit, 2500 samples = 2.5 s -> 3 windows of 1 s
    wav = _wav_fixture(1000, 1, 16, 2500, lambda i: i % 32000)
    df = spark.createDataFrame(
        [(7, bytearray(wav)), (8, bytearray(b"not audio"))],
        "media_id long, payload binary",
    )
    rows = sorted(
        sample_audio_frames(df, window_ms=1000).collect(), key=lambda r: r.frame_idx
    )
    assert [r.media_id for r in rows] == [7, 7, 7]
    assert [r.n_samples for r in rows] == [1000, 1000, 500]
    assert [r.start_ms for r in rows] == [0, 1000, 2000]
    # byte-exact PCM: window 1 starts with sample value 1000
    import struct as _struct

    assert _struct.unpack("<h", bytes(rows[1].pcm[:2]))[0] == 1000
    assert sum(len(r.pcm) for r in rows) == 2500 * 2


# ---------------------------------------------------------------------------
# GIF LZW pixel decode (round 4): real frames from stdlib byte math.
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size, indices):
    """Minimal test-side GIF-LZW encoder (variable width, LSB-first)."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    bits = []

    def emit(code):
        for k in range(code_size):
            bits.append((code >> k) & 1)

    emit(clear)
    prev = b""
    for ix in bytes(indices):
        cur = prev + bytes([ix])
        if cur in table:
            prev = cur
        else:
            emit(table[prev])
            table[cur] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
            prev = bytes([ix])
    if prev:
        emit(table[prev])
    emit(end)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for k, bit in enumerate(bits[i : i + 8]):
            byte |= bit << k
        data.append(byte)
    return bytes(data)


def _sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return bytes(out) + b"\x00"


def _gif_file(w, h, frames, palette, version=b"GIF89a"):
    """frames: list of (left, top, fw, fh, indices, interlace)."""
    entries = 2
    while entries < len(palette):
        entries *= 2
    f = entries.bit_length() - 2  # 2^(f+1) = entries
    gct = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * (entries - len(palette)))
    out = bytearray(
        version + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | f, 0, 0]) + gct
    )
    # a GCE extension block, to prove the extension walker skips them
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    for left, top, fw, fh, idx, interlace in frames:
        mcs = max(2, entries.bit_length() - 1)
        out += (
            b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
            + fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
            + bytes([0x40 if interlace else 0])
            + bytes([mcs]) + _sub_blocks(_lzw_encode(mcs, idx))
        )
    out += b"\x3b"
    return bytes(out)


def test_gif_lzw_decode_hand_pinned_bitstream():
    """1x1 GIF whose LZW stream is hand-computed (clear=100b, idx=001b,
    end=101b, LSB-first => 0x4C 0x01) — pins the decoder against an
    independent bit-level derivation, not the test encoder."""
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_gif_frames

    gif = (
        b"GIF89a" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x81, 0, 0])
        + bytes([0, 0, 0, 10, 20, 30, 1, 1, 1, 2, 2, 2])  # 4-color GCT
        + b"\x2c" + b"\x00\x00\x00\x00" + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + b"\x00"
        + b"\x02" + b"\x02\x4c\x01" + b"\x00" + b"\x3b"
    )
    decoded = decode_gif_frames(gif)
    assert decoded is not None
    sw, sh, frames = decoded
    assert (sw, sh) == (1, 1) and len(frames) == 1
    assert frames[0]["rgb"] == bytes([10, 20, 30])


def test_gif_decode_round_trip_with_code_width_growth():
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_gif_frames

    palette = [(i, 2 * i, 255 - i) for i in range(4)]
    # repeating pattern long enough to grow the dictionary past a width bump
    idx = bytes([0, 1, 2, 3] * 12 + [0, 0, 1, 1, 2, 2, 3, 3] * 6)  # 96 px
    gif = _gif_file(12, 8, [(0, 0, 12, 8, idx, False)], palette)
    sw, sh, frames = decode_gif_frames(gif)
    assert (sw, sh) == (12, 8)
    expect = b"".join(bytes(palette[i]) for i in idx)
    assert frames[0]["rgb"] == expect


def test_gif_decode_interlaced_rows_reordered():
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_gif_frames

    palette = [(i, i, i) for i in range(8)]
    w, h = 4, 8
    # row r has solid color r; encoder writes rows in interlace pass order
    pass_order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    idx = bytes(b"".join(bytes([r]) * w for r in pass_order))
    gif = _gif_file(w, h, [(0, 0, w, h, idx, True)], palette)
    _, _, frames = decode_gif_frames(gif)
    got = frames[0]["rgb"]
    for r in range(h):
        row = got[r * w * 3 : (r + 1) * w * 3]
        assert row == bytes(palette[r]) * w, f"row {r} misplaced"


def test_sample_gif_frames_spark(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import sample_gif_frames

    palette = [(9, 9, 9), (200, 100, 50)]
    frames = [
        (0, 0, 2, 2, bytes([0, 0, 1, 1]), False),
        (1, 1, 2, 1, bytes([1, 0]), False),
        (0, 0, 1, 1, bytes([1]), False),
    ]
    gif = _gif_file(4, 4, frames, palette)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"not a gif"))],
        "media_id long, payload binary",
    )
    rows = sorted(sample_gif_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.media_id for r in rows] == [1, 1, 1]
    assert [(r.left, r.top, r.width, r.height) for r in rows] == [(0, 0, 2, 2), (1, 1, 2, 1), (0, 0, 1, 1)]
    assert bytes(rows[1].rgb) == bytes(palette[1]) + bytes(palette[0])
    sampled = sample_gif_frames(df, every_n=2).collect()
    assert sorted(r.frame_idx for r in sampled) == [0, 2]


def test_resize_images_decodes_gif_for_real(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import (
        resize_images,
        try_decode_header,
    )

    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)]
    gif = _gif_file(2, 2, [(0, 0, 2, 2, bytes([0, 1, 2, 3]), False)], palette)
    df = spark.createDataFrame([(5, bytearray(gif))], "media_id long, payload binary")
    row = resize_images(df, 1, 1).collect()[0]
    assert row.status == "resized" and (row.width, row.height) == (1, 1)
    bmp = bytes(row.payload)
    meta = try_decode_header(bmp)
    assert meta["format"] == "bmp" and meta["width"] == 1 and meta["height"] == 1
    # nearest(1x1) picks the top-left pixel; BMP stores BGR
    assert bmp[54:57] == bytes([30, 20, 10])


def test_gif_decoder_never_raises_on_malformed_input():
    """Log-and-continue contract: arbitrary/truncated/corrupt bytes must
    yield None (or valid frames), never an exception — a poisoned row
    must not kill an Arrow batch."""
    from hypothesis import given, settings, strategies as st

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_gif_frames

    palette = [(1, 2, 3), (4, 5, 6)]
    good = _gif_file(3, 3, [(0, 0, 3, 3, bytes([0, 1, 0, 1, 0, 1, 0, 1, 0]), False)], palette)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64), st.integers(0, len(good)), st.integers(0, 255), st.integers(0, len(good) - 1))
    def check(junk, cut, byte, pos):
        # pure junk, GIF-prefixed junk, truncations, single-byte corruptions
        for payload in (
            junk,
            b"GIF89a" + junk,
            good[:cut],
            good[:pos] + bytes([byte]) + good[pos + 1 :],
        ):
            out = decode_gif_frames(payload)
            if out is not None:
                sw, sh, frames = out
                assert frames and all(len(f["rgb"]) == 3 * f["width"] * f["height"] for f in frames)

    check()


# ---------------------------------------------------------------------------
# Real PNG pixel decode (stdlib zlib + unfilters) and the codec probe
# ---------------------------------------------------------------------------


def _chunk(typ: bytes, data: bytes) -> bytes:
    import zlib as _z

    return (
        len(data).to_bytes(4, "big") + typ + data
        + _z.crc32(typ + data).to_bytes(4, "big")
    )


def _png_full(w, h, ctype, raw_rows, plte=None):
    """Encode a complete PNG: raw_rows = list of (filter_byte, filtered
    scanline bytes) — lets tests exercise each filter explicitly."""
    import zlib as _z

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    body = b"".join(bytes([f]) + ln for f, ln in raw_rows)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", _z.compress(body)) + _chunk(b"IEND", b"")


def _filter_rows(pixels, channels, filters):
    """Apply PNG filters to reference pixel rows (h x stride bytes) so
    the decoder's unfilter path is verified against a forward model."""
    h = len(pixels)
    stride = len(pixels[0])
    bpp = channels
    rows = []
    for y in range(h):
        f = filters[y % len(filters)]
        cur, prev = pixels[y], (pixels[y - 1] if y else bytes(stride))
        ln = bytearray()
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            ln.append((cur[x] - pred) & 0xFF)
        rows.append((f, bytes(ln)))
    return rows


def test_decode_png_pixels_all_filters_and_color_types():
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    import random

    rng = random.Random(55)
    w, h = 5, 6
    # RGB truth image, every filter type across the rows
    px = [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]
    png = _png_full(w, h, 2, _filter_rows(px, 3, [0, 1, 2, 3, 4, 4]))
    got = decode_png_pixels(png)
    assert got is not None and got[0] == w and got[1] == h
    assert got[2] == b"".join(px)

    # grayscale -> replicated channels
    g = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
    png_g = _png_full(w, h, 0, _filter_rows(g, 1, [0, 1, 2, 3, 4]))
    got_g = decode_png_pixels(png_g)
    assert got_g[2] == b"".join(bytes(v for v in row for _ in range(3)) for row in g)

    # RGBA -> alpha dropped
    rgba = [bytes(rng.randrange(256) for _ in range(w * 4)) for _ in range(h)]
    got_a = decode_png_pixels(_png_full(w, h, 6, _filter_rows(rgba, 4, [4, 3, 2, 1, 0])))
    expect = b"".join(
        bytes(row[i] for i in range(len(row)) if i % 4 != 3) for row in rgba
    )
    assert got_a[2] == expect

    # palette
    pal = bytes(range(30))  # 10 RGB entries
    idx = [bytes(rng.randrange(10) for _ in range(w)) for _ in range(h)]
    got_p = decode_png_pixels(_png_full(w, h, 3, _filter_rows(idx, 1, [0]), plte=pal))
    expect_p = b"".join(bytes(pal[3 * v + k] for v in row for k in range(3)) for row in idx)
    assert got_p[2] == expect_p

    # refusals: a 16-bit header over 8-bit-sized data (truncation
    # guard; real 16-bit now decodes), corrupt deflate, truncated chunk
    bad16 = _png_full(w, h, 2, _filter_rows(px, 3, [0]))
    bad16 = bad16.replace(bytes([8, 2]), bytes([16, 2]), 1)
    assert decode_png_pixels(bad16) is None
    assert decode_png_pixels(png[:40]) is None
    assert decode_png_pixels(png.replace(b"IDAT", b"IDAT", 1)[: len(png) - 20] + b"x" * 20) is None


def test_resize_images_decodes_png_for_real(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import (
        resize_images,
        try_decode_header,
    )

    # 2x2 quadrant colors, RGB rows unfiltered
    px = [bytes([10, 11, 12, 200, 201, 202]), bytes([50, 51, 52, 90, 91, 92])]
    png = _png_full(2, 2, 2, [(0, px[0]), (0, px[1])])
    df = spark.createDataFrame([(7, bytearray(png))], "media_id long, payload binary")
    row = resize_images(df, 1, 1).collect()[0]
    assert row.status == "resized"
    bmp = bytes(row.payload)
    meta = try_decode_header(bmp)
    assert meta["format"] == "bmp" and meta["width"] == 1 and meta["height"] == 1
    # nearest-neighbor at 1x1 picks the top-left pixel; BMP rows are
    # bottom-up BGR with 4-byte row padding (1 px row = 3 B + 1 pad)
    assert bmp[-4:-1] == bytes([12, 11, 10])


def test_optional_codec_probe_default_absent():
    """In this container no codec library ships: the probe returns None,
    JPEG stays needs_codec — and the probe result is cached."""
    import importlib.util

    from kyiv_traffic_bigdata_spark.operators import multimodal as M

    if importlib.util.find_spec("PIL") is not None:
        import pytest

        pytest.skip("Pillow unexpectedly present; probe exercises real codec")
    assert M.optional_image_codec() is None
    assert M.optional_image_codec() is None  # cached second call
    assert M._resize_with_codec(b"\xff\xd8\xff\xe0junk", 2, 2) is None


def test_png_decoder_fuzz_never_raises():
    """Same never-raise contract as the GIF/JPEG decoders: byte damage
    or truncation yields None or a decoded image, never an exception."""
    import random

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(31)
    px = [bytes(rng.randrange(256) for _ in range(6 * 3)) for _ in range(5)]
    base = _png_full(6, 5, 2, _filter_rows(px, 3, [0, 1, 2, 3, 4]))
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(len(b) + 1)
        try:
            out = decode_png_pixels(bytes(b[:cut]))
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"decoder raised on fuzzed input: {exc!r}")
        if out is not None:
            w, h, rgb = out
            assert len(rgb) == w * h * 3


def _png_full_d(w, h, ctype, depth, raw_rows, plte=None, interlace=0):
    """Like _png_full but with explicit bit depth and interlace flag."""
    import zlib as _z

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, ctype, 0, 0, interlace])
    )
    body = b"".join(bytes([f]) + ln for f, ln in raw_rows)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", _z.compress(body)) + _chunk(b"IEND", b"")


def test_png_16bit_depth_keeps_high_bytes():
    """16-bit PNG: each sample is 2 bytes big-endian; the decoder keeps
    the high byte (the standard 8-bit reduction). Filters run on BYTES
    with bpp = channels*2 — exercised across all five filters."""
    import random

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(17)
    w, h = 5, 6
    # 16-bit RGB rows: stride w*6; remember the expected high bytes
    rows16 = [bytes(rng.randrange(256) for _ in range(w * 6)) for _ in range(h)]
    expected = b"".join(
        bytes(row[2 * s] for s in range(w * 3)) for row in rows16
    )
    png = _png_full_d(w, h, 2, 16, _filter_rows(rows16, 6, [0, 1, 2, 3, 4, 2]))
    got = decode_png_pixels(png)
    assert got is not None and (got[0], got[1]) == (w, h)
    assert got[2] == expected

    # 16-bit grayscale too (bpp = 2)
    g16 = [bytes(rng.randrange(256) for _ in range(w * 2)) for _ in range(h)]
    png_g = _png_full_d(w, h, 0, 16, _filter_rows(g16, 2, [0, 4]))
    got_g = decode_png_pixels(png_g)
    exp_g = b"".join(
        bytes(row[2 * s] for s in range(w) for _ in range(3)) for row in g16
    )
    assert got_g is not None and got_g[2] == exp_g


_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def test_png_adam7_interlaced_decodes_exactly():
    """Adam7: seven independently-filtered sub-images deinterlace into
    the full canvas. Built from a reference image by the spec's pass
    pattern; decode must reproduce the reference bit-exactly."""
    import random

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(23)
    w, h = 9, 10  # odd dims exercise empty/ragged pass edges
    img = [
        [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
        for _ in range(h)
    ]
    raw_rows = []
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7_PASSES):
        sub = [
            b"".join(bytes(img[y][x]) for x in range(x0, w, dx))
            for y in range(y0, h, dy)
        ]
        if not sub or not sub[0]:
            continue
        raw_rows.extend(_filter_rows(sub, 3, [pi % 5, (pi + 2) % 5]))
    png = _png_full_d(w, h, 2, 8, raw_rows, interlace=1)
    got = decode_png_pixels(png)
    assert got is not None and (got[0], got[1]) == (w, h)
    expected = b"".join(bytes(px) for row in img for px in row)
    assert got[2] == expected


def test_png_adam7_flows_through_resize_images(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import resize_images

    w = h = 8
    img = [[(x * 30 % 256, y * 30 % 256, 7) for x in range(w)] for y in range(h)]
    raw_rows = []
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = [
            b"".join(bytes(img[y][x]) for x in range(x0, w, dx))
            for y in range(y0, h, dy)
        ]
        if not sub or not sub[0]:
            continue
        raw_rows.extend(_filter_rows(sub, 3, [0]))
    png = _png_full_d(w, h, 2, 8, raw_rows, interlace=1)
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, payload binary")
    row = resize_images(df, 2, 2).collect()[0]
    assert row.status == "resized"


def _pack_rows(sample_rows, depth):
    """Pack per-row sample lists MSB-first at ``depth`` bits/sample,
    byte-padding each scanline — the forward model of the decoder's
    sub-byte unpack."""
    packed = []
    for row in sample_rows:
        acc, nbits, out = 0, 0, bytearray()
        for s in row:
            acc = (acc << depth) | (s & ((1 << depth) - 1))
            nbits += depth
            if nbits == 8:
                out.append(acc)
                acc, nbits = 0, 0
        if nbits:
            out.append(acc << (8 - nbits))
        packed.append(bytes(out))
    return packed


def test_png_sub_byte_gray_depths_decode_bit_exact():
    """1/2/4-bit grayscale: MSB-first packed samples, filters over
    PACKED BYTES with bpp=1, scanline byte-padding, and the exact
    255/(2^d−1) scale — all five filters, width chosen so the last
    byte is ragged."""
    import random

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(31)
    for depth in (1, 2, 4):
        w, h = 11, 5  # 11 samples/row → ragged final byte at every depth
        scale = 255 // ((1 << depth) - 1)
        samples = [
            [rng.randrange(1 << depth) for _ in range(w)] for _ in range(h)
        ]
        packed = _pack_rows(samples, depth)
        png = _png_full_d(
            w, h, 0, depth, _filter_rows(packed, 1, [0, 1, 2, 3, 4])
        )
        got = decode_png_pixels(png)
        assert got is not None and (got[0], got[1]) == (w, h), depth
        expect = b"".join(
            bytes(v * scale for v in row for _ in range(3)) for row in samples
        )
        assert got[2] == expect, f"depth {depth} mismatch"


def test_png_sub_byte_palette_decodes_via_plte():
    """4-bit (and 2-bit) palette: packed indices look up PLTE entries
    directly — no sample scaling — and an out-of-range index is still
    rejected."""
    import random

    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(37)
    pal = bytes(rng.randrange(256) for _ in range(16 * 3))
    for depth, n_colors in ((4, 16), (2, 4), (1, 2)):
        w, h = 9, 4
        idx = [[rng.randrange(n_colors) for _ in range(w)] for _ in range(h)]
        png = _png_full_d(
            w, h, 3, depth, _filter_rows(_pack_rows(idx, depth), 1, [0, 2]),
            plte=pal[: n_colors * 3],
        )
        got = decode_png_pixels(png)
        assert got is not None, depth
        expect = b"".join(
            bytes(pal[3 * v + k] for v in row for k in range(3)) for row in idx
        )
        assert got[2] == expect, f"palette depth {depth} mismatch"
    # out-of-range index against a short palette still refuses
    short = _png_full_d(
        2, 1, 3, 4, _filter_rows(_pack_rows([[0, 3]], 4), 1, [0]),
        plte=bytes(6),  # 2 entries; index 3 out of range
    )
    assert decode_png_pixels(short) is None


def test_png_sub_byte_adam7_pads_each_pass_scanline():
    """Adam7 + 1-bit depth: every pass scanline byte-pads independently
    (the spec's sub-image rule) — ragged 9×10 dims make pass widths of
    1/1/2/3/4/4/9 samples, all shorter than a byte."""
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    w, h = 9, 10
    img = [[(x ^ y) & 1 for x in range(w)] for y in range(h)]
    raw_rows = []
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7_PASSES):
        sub = [
            [img[y][x] for x in range(x0, w, dx)] for y in range(y0, h, dy)
        ]
        if not sub or not sub[0]:
            continue
        raw_rows.extend(_filter_rows(_pack_rows(sub, 1), 1, [pi % 5]))
    png = _png_full_d(w, h, 0, 1, raw_rows, interlace=1)
    got = decode_png_pixels(png)
    assert got is not None and (got[0], got[1]) == (w, h)
    expect = b"".join(
        bytes(v * 255 for v in row for _ in range(3)) for row in img
    )
    assert got[2] == expect


def test_png_illegal_depth_combos_refused():
    """Spec guardrails: sub-byte RGB/RGBA/gray+alpha are illegal, as are
    non-power-of-two depths and 16-bit palettes."""
    from kyiv_traffic_bigdata_spark.operators.multimodal import decode_png_pixels

    for ctype in (2, 4, 6):
        png = _png_full_d(2, 1, ctype, 4, [(0, bytes(4))])
        assert decode_png_pixels(png) is None, ctype
    assert decode_png_pixels(_png_full_d(2, 1, 0, 3, [(0, bytes(1))])) is None
    assert decode_png_pixels(_png_full_d(2, 1, 3, 16, [(0, bytes(4))], plte=bytes(6))) is None
