"""Baseline JPEG decoder tests (operators/jpeg.py).

Verification strategy (no codec library exists in this container to
produce fixtures): a self-contained baseline ENCODER lives here in the
test — forward DCT + quantization + canonical Huffman + byte stuffing —
sharing nothing with the decoder beyond the file format itself. The
decoder is then checked three ways:

1. unit: bit reader (stuffing, marker stop), IDCT vs a naive-loop
   DCT-III reference;
2. round-trip: decode(encode(img)) within quantization-derived error
   bounds on flat / gradient / random images, grayscale and 4:2:0,
   odd (non-MCU-aligned) sizes, and restart intervals;
3. refusal: progressive SOF2, truncated streams, oversized dims.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kyiv_traffic_bigdata_spark.operators.jpeg import (
    ZIGZAG,
    _BitReader,
    _build_huffman,
    _idct_blocks,
    decode_jpeg_pixels,
)

# ---------------------------------------------------------------------------
# Minimal baseline encoder (test-only). Tables are deliberately NOT the
# spec's Annex K set: DC symbols 0..11 all at code length 8, AC symbols
# (EOB, ZRL, every (run, size) run 0..15 size 1..10) all at length 12 —
# valid canonical tables that exercise the decoder's generic machinery.
# ---------------------------------------------------------------------------

_DC_SYMBOLS = bytes(range(12))
_DC_COUNTS = [0] * 16
_DC_COUNTS[7] = 12  # 12 codes of length 8
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_COUNTS = [0] * 16
_AC_COUNTS[11] = len(_AC_SYMBOLS)  # all codes at length 12


def _codes(counts, symbols):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _codes(_AC_COUNTS, _AC_SYMBOLS)

# extended tables for 12-bit precision (F.1.2.1: DC categories 0..15,
# AC magnitude sizes 1..14 — wider than the 8-bit 0..11 / 1..10 set)
_DC12_SYMBOLS = bytes(range(16))
_DC12_COUNTS = [0] * 16
_DC12_COUNTS[7] = 16  # 16 codes of length 8
_AC12_SYMBOLS = bytes(
    [0x00, 0xF0] + [(run << 4) | size for run in range(16) for size in range(1, 15)]
)
_AC12_COUNTS = [0] * 16
_AC12_COUNTS[11] = len(_AC12_SYMBOLS)  # 226 codes of length 12 (≤ 4096)

_DC12_CODES = _codes(_DC12_COUNTS, _DC12_SYMBOLS)
_AC12_CODES = _codes(_AC12_COUNTS, _AC12_SYMBOLS)


def _dct_matrix():
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0, :] *= 1 / np.sqrt(2)
    return c


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v):
    """(size, bits) JPEG magnitude coding of a signed value."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, block_zz, pred, dc_codes=None, ac_codes=None):
    """Entropy-encode one quantized block (zigzag order); returns new DC
    predictor. ``dc_codes``/``ac_codes`` default to the 8-bit tables;
    the 12-bit encoder passes its extended tables."""
    dc_codes = dc_codes if dc_codes is not None else _DC_CODES
    ac_codes = ac_codes if ac_codes is not None else _AC_CODES
    diff = block_zz[0] - pred
    size, bits = _magnitude(diff)
    ln, code = dc_codes[size]
    bw.put(code, ln)
    if size:
        bw.put(bits, size)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if block_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = block_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        ln, code = ac_codes[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return block_zz[0]


def encode_baseline_jpeg(rgb, q=4, subsample=False, gray=False, restart=0,
                         gray_samp=(1, 1)):
    """rgb: (h, w, 3) uint8 -> baseline JPEG bytes. Flat quant table q.
    subsample=True -> 4:2:0 (callers should use constant-chroma images
    for exact chroma round-trips). gray -> single component, whose
    declared sampling factors ``gray_samp`` may exceed (1,1): the spec
    makes a lone-component scan NON-INTERLEAVED (raster block order,
    no dummy blocks), so the entropy stream is written accordingly."""
    h, w = rgb.shape[:2]
    C = _dct_matrix()
    qtab = [q] * 64

    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if gray:
        comps = [{"plane": y, "h": gray_samp[0], "v": gray_samp[1]}]
    elif subsample:
        comps = [
            {"plane": y, "h": 2, "v": 2},
            {"plane": cb[::2, ::2], "h": 1, "v": 1},
            {"plane": cr[::2, ::2], "h": 1, "v": 1},
        ]
    else:
        comps = [
            {"plane": y, "h": 1, "v": 1},
            {"plane": cb, "h": 1, "v": 1},
            {"plane": cr, "h": 1, "v": 1},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    for c in comps:
        pw, ph = 8 * mcux * c["h"], 8 * mcuy * c["v"]
        plane = np.full((ph, pw), 128.0)
        src = c["plane"]
        plane[: src.shape[0], : src.shape[1]] = src
        # edge-replicate padding keeps high-frequency energy (and hence
        # quantization error) low at the borders
        plane[src.shape[0]:, : src.shape[1]] = src[-1:, :]
        plane[:, src.shape[1]:] = plane[:, src.shape[1] - 1 : src.shape[1]]
        c["padded"] = plane
        c["pred"] = 0

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0]) + bytes(qtab)
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for idx, c in enumerate(comps):
        sof += bytes([idx + 1, (c["h"] << 4) | c["v"], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc in (0, 1):
        counts = _DC_COUNTS if tc == 0 else _AC_COUNTS
        symbols = _DC_SYMBOLS if tc == 0 else _AC_SYMBOLS
        seg = bytes([tc << 4]) + bytes(counts) + symbols
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for idx in range(nc):
        sos += bytes([idx + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()

    def emit(c, y0, x0):
        blk = c["padded"][y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coef = C @ blk @ C.T
        zz = [int(np.round(coef.flat[ZIGZAG[k]] / qtab[k])) for k in range(64)]
        c["pred"] = _encode_block(bw, zz, c["pred"])

    mcu_i = 0
    rst = 0

    def maybe_restart():
        nonlocal rst
        if restart and mcu_i and mcu_i % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            for c in comps:
                c["pred"] = 0

    if nc == 1:
        # non-interleaved: raster over the component's own block grid
        c = comps[0]
        for byi in range((h + 7) // 8):
            for bxi in range((w + 7) // 8):
                maybe_restart()
                emit(c, byi * 8, bxi * 8)
                mcu_i += 1
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            emit(c, (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                mcu_i += 1
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def encode_ext12_jpeg(img12, q=8):
    """img12: (h, w) gray or (h, w, 3) RGB uint16 in [0, 4095] ->
    EXTENDED SEQUENTIAL (SOF1, precision 12) JPEG bytes. Exercises the
    12-bit decode path end-to-end: 16-bit (pq=1) quant table, level
    shift 2048, extended Huffman tables (DC categories 0..15, AC sizes
    1..14). Structure mirrors encode_baseline_jpeg (full-resolution
    components, non-interleaved for gray); shares only the file format
    with the decoder."""
    h, w = img12.shape[:2]
    C = _dct_matrix()
    qtab = [q] * 64

    if img12.ndim == 2:
        comps = [{"plane": img12.astype(np.float64)}]
    else:
        r = img12[:, :, 0].astype(np.float64)
        g = img12[:, :, 1].astype(np.float64)
        b = img12[:, :, 2].astype(np.float64)
        comps = [
            {"plane": 0.299 * r + 0.587 * g + 0.114 * b},
            {"plane": 2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b},
            {"plane": 2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b},
        ]
    bxs, bys = (w + 7) // 8, (h + 7) // 8
    for c in comps:
        plane = np.full((bys * 8, bxs * 8), 2048.0)
        src = c["plane"]
        plane[:h, :w] = src
        plane[h:, :w] = src[-1:, :]
        plane[:, w:] = plane[:, w - 1 : w]
        c["padded"] = plane
        c["pred"] = 0

    out = bytearray(b"\xff\xd8")
    seg = bytes([0x10]) + b"".join(struct.pack(">H", v) for v in qtab)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(seg)) + seg
    nc = len(comps)
    sof = struct.pack(">BHHB", 12, h, w, nc)
    for idx in range(nc):
        sof += bytes([idx + 1, 0x11, 0])
    out += b"\xff\xc1" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, symbols in (
        (0, _DC12_COUNTS, _DC12_SYMBOLS),
        (1, _AC12_COUNTS, _AC12_SYMBOLS),
    ):
        seg = bytes([tc << 4]) + bytes(counts) + symbols
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for idx in range(nc):
        sos += bytes([idx + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()

    def emit(c, y0, x0):
        blk = c["padded"][y0 : y0 + 8, x0 : x0 + 8] - 2048.0
        coef = C @ blk @ C.T
        zz = [int(np.round(coef.flat[ZIGZAG[k]] / qtab[k])) for k in range(64)]
        c["pred"] = _encode_block(bw, zz, c["pred"], _DC12_CODES, _AC12_CODES)

    if nc == 1:  # non-interleaved raster (A.2.2)
        for byi in range(bys):
            for bxi in range(bxs):
                emit(comps[0], byi * 8, bxi * 8)
    else:  # all factors (1,1): one block per component per MCU
        for byi in range(bys):
            for bxi in range(bxs):
                for c in comps:
                    emit(c, byi * 8, bxi * 8)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# unit tests
# ---------------------------------------------------------------------------


def test_bitreader_stuffing_and_marker_stop():
    # 0xFF 0x00 is a stuffed literal 0xFF byte; 0xFF 0xD9 is a marker
    br = _BitReader(bytes([0b10101010, 0xFF, 0x00, 0xFF, 0xD9]), 0)
    assert br.read_bits(8) == 0b10101010
    assert br.read_bits(8) == 0xFF
    assert br.read_bit() is None  # stopped at the real marker
    assert br.at_marker() == 0xD9


def test_huffman_canonical_roundtrip():
    table = _build_huffman(_DC_COUNTS, _DC_SYMBOLS)
    # every symbol decodable from its own code
    for sym, (ln, code) in _DC_CODES.items():
        data = bytes([(code << (8 - ln)) & 0xFF]) if ln <= 8 else None
        br = _BitReader(data, 0)
        got = None
        c = 0
        for length in range(1, ln + 1):
            c = (c << 1) | br.read_bit()
            if (length, c) in table:
                got = table[(length, c)]
                break
        assert got == sym


def test_idct_matches_naive_reference():
    rng = np.random.default_rng(7)
    blocks = rng.integers(-512, 512, size=(5, 8, 8)).astype(np.float64)

    def naive(block):
        out = np.zeros((8, 8))
        for x in range(8):
            for yy in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv / 4.0 * block[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * yy + 1) * v * np.pi / 16)
                        )
                out[x, yy] = s
        return out

    fast = _idct_blocks(blocks)
    for i in range(len(blocks)):
        assert np.allclose(fast[i], naive(blocks[i]), atol=1e-9)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def _decode_to_array(payload):
    got = decode_jpeg_pixels(payload)
    assert got is not None
    w, h, rgb = got
    return np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)


def test_flat_color_roundtrip_tight():
    img = np.full((16, 24, 3), 0, np.uint8)
    img[:, :] = (200, 80, 40)
    out = _decode_to_array(encode_baseline_jpeg(img, q=4))
    assert out.shape == (16, 24, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_gradient_and_random_roundtrip_bounded():
    yy, xx = np.mgrid[0:24, 0:32]
    grad = np.stack([(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], 2).astype(
        np.uint8
    )
    q = 4
    out = _decode_to_array(encode_baseline_jpeg(grad, q=q))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.mean() < 3.0 and err.max() <= 8 * q

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    out = _decode_to_array(encode_baseline_jpeg(noise, q=q))
    err = np.abs(out.astype(int) - noise.astype(int))
    assert err.max() <= 8 * q  # quantization-bounded, never structural


def test_grayscale_single_component():
    yy = (np.arange(16)[:, None] * 16).astype(np.uint8)
    img = np.repeat(np.repeat(yy[:, :, None], 16, axis=1), 3, axis=2)
    out = _decode_to_array(encode_baseline_jpeg(img, q=2, gray=True))
    # grayscale decode replicates Y into all channels
    assert np.abs(out[:, :, 0].astype(int) - img[:, :, 0].astype(int)).max() <= 4
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()


def test_grayscale_sampling_gt1_decodes_non_interleaved():
    """r5 ADVICE: a lone-component scan is non-interleaved per spec
    A.2.2 — raster block order, no dummy blocks — whatever the declared
    sampling factors. A gray image declared (2,2) must decode to the
    exact same pixels as the same image declared (1,1); the old
    interleaved layout garbled it (or returned None)."""
    yy = (np.arange(24)[:, None] * 7 % 256).astype(np.uint8)
    img = np.repeat(np.repeat(yy[:, :, None], 20, axis=1), 3, axis=2)
    plain = encode_baseline_jpeg(img, q=2, gray=True)
    sampled = encode_baseline_jpeg(img, q=2, gray=True, gray_samp=(2, 2))
    out_plain = _decode_to_array(plain)
    out_sampled = _decode_to_array(sampled)
    assert (out_plain == out_sampled).all()
    # restart markers count non-interleaved MCUs (= blocks)
    rst = encode_baseline_jpeg(img, q=2, gray=True, gray_samp=(2, 2), restart=3)
    assert (_decode_to_array(rst) == out_plain).all()


def test_fill_bytes_before_markers_are_skipped():
    """Spec B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Insert one before a header marker and before an RST marker; decode
    must be unchanged (the old walk returned None)."""
    yy, xx = np.mgrid[0:16, 0:40]
    img = np.stack([(xx * 6) % 256] * 3, 2).astype(np.uint8)
    base = encode_baseline_jpeg(img, q=4, restart=2)
    ref = _decode_to_array(base)
    padded = base.replace(b"\xff\xc4", b"\xff\xff\xc4", 1)  # before DHT
    assert (_decode_to_array(padded) == ref).all()
    padded_rst = base.replace(b"\xff\xd0", b"\xff\xff\xd0", 1)  # before RST0
    assert (_decode_to_array(padded_rst) == ref).all()


def test_subsampled_420_constant_chroma():
    img = np.zeros((24, 24, 3), np.uint8)
    # constant chroma (one hue), varying luma: 2x2 downsample is exact
    for i in range(24):
        v = 40 + 7 * i
        img[i, :, :] = (v, v, v)
    out = _decode_to_array(encode_baseline_jpeg(img, q=4, subsample=True))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_odd_dimensions_cropped():
    img = np.full((11, 13, 3), 99, np.uint8)
    out = _decode_to_array(encode_baseline_jpeg(img, q=4))
    assert out.shape == (11, 13, 3)
    assert np.abs(out.astype(int) - 99).max() <= 2


def test_restart_markers():
    yy, xx = np.mgrid[0:16, 0:40]
    img = np.stack([(xx * 6) % 256] * 3, 2).astype(np.uint8)
    out = _decode_to_array(encode_baseline_jpeg(img, q=4, restart=2))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 32


def test_refusals():
    img = np.full((8, 8, 3), 10, np.uint8)
    good = encode_baseline_jpeg(img, q=4)
    # progressive: flip SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None
    assert decode_jpeg_pixels(good[:20]) is None
    assert decode_jpeg_pixels(b"\xff\xd8junk") is None
    assert decode_jpeg_pixels(good, max_pixels=16) is None


def test_fuzz_never_raises():
    import random

    rng = random.Random(21)
    img = np.full((16, 16, 3), 120, np.uint8)
    base = encode_baseline_jpeg(img, q=4)
    for _ in range(80):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(len(b) + 1)
        try:
            decode_jpeg_pixels(bytes(b[:cut]))
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"decoder raised on fuzzed input: {exc!r}")


def test_resize_images_decodes_jpeg_for_real(spark):
    from kyiv_traffic_bigdata_spark.operators.multimodal import (
        resize_images,
        try_decode_header,
    )

    img = np.zeros((8, 8, 3), np.uint8)
    img[:4, :4] = (200, 50, 50)
    img[4:, 4:] = (50, 200, 50)
    payload = encode_baseline_jpeg(img, q=2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert row.status == "resized"
    meta = try_decode_header(bytes(row.payload))
    assert meta["format"] == "bmp" and meta["width"] == 2 and meta["height"] == 2


# ---------------------------------------------------------------------------
# progressive encoder (spec G.1.2 scan scripts; jcphuff's EOB-run and
# buffered-correction-bit bookkeeping) — shares only the tables and the
# bit-writer with the baseline encoder, nothing with the decoder.
# ---------------------------------------------------------------------------

#: Flat canonical AC table for progressive scans: Annex K's baseline AC
#: table lacks the EOBn symbols ((r<<4)|0 for r>0), so cover every
#: symbol a progressive AC scan can emit with 9-bit codes (208 < 512,
#: no all-ones code).
_PROG_AC_SYMBOLS = bytes(
    [(r << 4) | s for r in range(16) for s in range(1, 13)]
    + [(r << 4) for r in range(15)]
    + [0xF0]
)
_PROG_AC_COUNTS = [0] * 8 + [len(_PROG_AC_SYMBOLS)] + [0] * 7
_PROG_AC_CODES = _codes(_PROG_AC_COUNTS, _PROG_AC_SYMBOLS)


class _ProgScanWriter:
    """One progressive scan's emission state: huffman symbols, raw
    bits, pending EOB run and its buffered correction bits."""

    def __init__(self, bw):
        self.bw = bw
        self.eobrun = 0
        self.be = []

    def sym(self, s):
        ln, code = _PROG_AC_CODES[s]
        self.bw.put(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            self.sym(nb << 4)
            if nb:
                self.bw.put(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.be:
            self.bw.put(b, 1)
        self.be = []


def encode_progressive_jpeg(
    rgb, q=4, gray=False, subsample=False, restart=0,
    dc_al=1, ac_al=1, bands=((1, 5), (6, 63)), precision=8,
):
    """rgb (h, w, 3) uint8 -> PROGRESSIVE (SOF2) JPEG bytes.
    precision=12 accepts (h, w, 3) uint16 in [0, 4095] instead (narrow
    dynamic range recommended — the scan tables cap AC size at 12).

    Scan script: interleaved DC first (Al=dc_al) → per-component AC
    first scans per spectral band (Al=ac_al) → DC refinement bit scans
    down to bit 0 → AC refinement scans down to bit 0. With
    dc_al=ac_al=0 this degenerates to spectral selection only. Since
    every bit is eventually delivered, the decoded coefficients equal
    the baseline encoder's — decode output must be IDENTICAL."""
    h, w = rgb.shape[:2]
    C = _dct_matrix()
    qtab = [q] * 64
    half = float(1 << (precision - 1))

    r_ = rgb[:, :, 0].astype(np.float64)
    g_ = rgb[:, :, 1].astype(np.float64)
    b_ = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = half - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = half + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_

    if gray:
        comps = [{"plane": y, "h": 1, "v": 1}]
    elif subsample:
        comps = [
            {"plane": y, "h": 2, "v": 2},
            {"plane": cb[::2, ::2], "h": 1, "v": 1},
            {"plane": cr[::2, ::2], "h": 1, "v": 1},
        ]
    else:
        comps = [
            {"plane": y, "h": 1, "v": 1},
            {"plane": cb, "h": 1, "v": 1},
            {"plane": cr, "h": 1, "v": 1},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    for c in comps:
        pw, ph = 8 * mcux * c["h"], 8 * mcuy * c["v"]
        plane = np.full((ph, pw), half)
        src = c["plane"]
        plane[: src.shape[0], : src.shape[1]] = src
        plane[src.shape[0]:, : src.shape[1]] = src[-1:, :]
        plane[:, src.shape[1]:] = plane[:, src.shape[1] - 1 : src.shape[1]]
        bwb, bhb = pw // 8, ph // 8
        zz = np.zeros((bhb * bwb, 64), dtype=np.int64)
        for byi in range(bhb):
            for bxi in range(bwb):
                blk = plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] - half
                coefn = C @ blk @ C.T
                zz[byi * bwb + bxi] = [
                    int(np.round(coefn.flat[ZIGZAG[k]] / qtab[k]))
                    for k in range(64)
                ]
        c["zz"], c["bw"], c["bh"] = zz, bwb, bhb
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["bw_ni"], c["bh_ni"] = (cw + 7) // 8, (ch + 7) // 8

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0]) + bytes(qtab)
    nc = len(comps)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for idx, c in enumerate(comps):
        sof += bytes([idx + 1, (c["h"] << 4) | c["v"], 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dcseg = bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
    acseg = bytes([0x10]) + bytes(_PROG_AC_COUNTS) + _PROG_AC_SYMBOLS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dcseg)) + dcseg
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(acseg)) + acseg
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos_header(comp_specs, ss, se, ah, al):
        seg = bytes([len(comp_specs)])
        for idx, td, ta in comp_specs:
            seg += bytes([idx + 1, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    def dc_first_scan(al):
        nonlocal out
        out += sos_header([(i, 0, 0) for i in range(nc)], 0, 0, 0, al)
        bw = _BitWriter()
        preds = [0] * nc
        rst = mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_i and mcu_i % restart == 0:
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
                    rst += 1
                    preds = [0] * nc
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            dc = int(c["zz"][bi, 0]) >> al  # arithmetic
                            diff = dc - preds[ci]
                            preds[ci] = dc
                            size, bits = _magnitude(diff)
                            ln, code = _DC_CODES[size]
                            bw.put(code, ln)
                            if size:
                                bw.put(bits, size)
                mcu_i += 1
        bw.flush()
        out += bw.out

    class _Restarter:
        """DRI applies to EVERY scan: emit RSTn each `restart` MCUs
        (flushing any pending EOB run + padding first)."""

        def __init__(self, bw, sw=None):
            self.bw, self.sw = bw, sw
            self.mcu = 0
            self.rst = 0

        def tick(self):
            if restart and self.mcu and self.mcu % restart == 0:
                if self.sw is not None:
                    self.sw.flush_eobrun()
                self.bw.flush()
                self.bw.out += bytes([0xFF, 0xD0 + (self.rst % 8)])
                self.rst += 1
                return True
            return False

        def advance(self):
            self.mcu += 1

    def dc_refine_scan(al):
        nonlocal out
        out += sos_header([(i, 0, 0) for i in range(nc)], 0, 0, al + 1, al)
        bw = _BitWriter()
        rs = _Restarter(bw)
        for my in range(mcuy):
            for mx in range(mcux):
                rs.tick()
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            bw.put((int(c["zz"][bi, 0]) >> al) & 1, 1)
                rs.advance()
        bw.flush()
        out += bw.out

    def ac_first_scan(ci, ss, se, al):
        nonlocal out
        c = comps[ci]
        out += sos_header([(ci, 0, 0)], ss, se, 0, al)
        bw = _BitWriter()
        sw = _ProgScanWriter(bw)
        rs = _Restarter(bw, sw)
        for byi in range(c["bh_ni"]):
            for bxi in range(c["bw_ni"]):
                rs.tick()
                rs.advance()
                zz = c["zz"][byi * c["bw"] + bxi]
                r = 0
                wrote = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    v = (abs(v) >> al) * (1 if v >= 0 else -1)  # point xform
                    if v == 0:
                        r += 1
                        continue
                    sw.flush_eobrun()
                    while r > 15:
                        sw.sym(0xF0)
                        r -= 16
                    size, bits = _magnitude(v)
                    sw.sym((r << 4) | size)
                    bw.put(bits, size)
                    r = 0
                    wrote = True
                if r > 0 or not wrote:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun()
        sw.flush_eobrun()
        bw.flush()
        out += bw.out

    def ac_refine_scan(ci, ss, se, al):
        nonlocal out
        c = comps[ci]
        out += sos_header([(ci, 0, 0)], ss, se, al + 1, al)
        bw = _BitWriter()
        sw = _ProgScanWriter(bw)
        rs = _Restarter(bw, sw)
        for byi in range(c["bh_ni"]):
            for bxi in range(c["bw_ni"]):
                rs.tick()
                rs.advance()
                zz = c["zz"][byi * c["bw"] + bxi]
                absv = [abs(int(zz[k])) >> al for k in range(64)]
                eob_k = ss - 1  # index of last newly-nonzero coef
                for k in range(ss, se + 1):
                    if absv[k] == 1:
                        eob_k = k
                r = 0
                br_bits = []
                for k in range(ss, se + 1):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_k:
                        sw.flush_eobrun()
                        sw.sym(0xF0)
                        r -= 16
                        for b in br_bits:
                            bw.put(b, 1)
                        br_bits = []
                    if t > 1:  # previously-significant: correction bit
                        br_bits.append(t & 1)
                        continue
                    sw.flush_eobrun()
                    sw.sym((r << 4) | 1)
                    bw.put(1 if int(zz[k]) >= 0 else 0, 1)
                    for b in br_bits:
                        bw.put(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    sw.eobrun += 1
                    sw.be.extend(br_bits)
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun()
        sw.flush_eobrun()
        bw.flush()
        out += bw.out

    dc_first_scan(dc_al)
    for ci in range(nc):
        for (ss, se) in bands:
            ac_first_scan(ci, ss, se, ac_al)
    for al in range(dc_al - 1, -1, -1):
        dc_refine_scan(al)
    for al in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            for (ss, se) in bands:
                ac_refine_scan(ci, ss, se, al)
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_spectral_selection_only_equals_baseline():
    """Spectral selection without successive approximation: the decoded
    pixels must be IDENTICAL to the baseline encode→decode of the same
    image (same quantized coefficients, same IDCT)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 20, 3)).astype(np.uint8)
    base = _decode_to_array(encode_baseline_jpeg(img, q=4))
    prog = _decode_to_array(
        encode_progressive_jpeg(img, q=4, dc_al=0, ac_al=0)
    )
    assert (prog == base).all()


def test_progressive_successive_approximation_equals_baseline():
    """Full progressive (spectral selection + successive approximation
    down to bit 0): every coefficient bit is eventually delivered, so
    the decode must again be bit-identical to baseline."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    base = _decode_to_array(encode_baseline_jpeg(img, q=2))
    prog = _decode_to_array(
        encode_progressive_jpeg(img, q=2, dc_al=1, ac_al=1)
    )
    assert (prog == base).all()
    # deeper approximation + single band
    prog2 = _decode_to_array(
        encode_progressive_jpeg(img, q=2, dc_al=2, ac_al=2, bands=((1, 63),))
    )
    assert (prog2 == base).all()


def test_progressive_gray_subsampled_and_restart():
    yy = (np.arange(24)[:, None] * 9 % 256).astype(np.uint8)
    img = np.repeat(np.repeat(yy[:, :, None], 20, axis=1), 3, axis=2)
    base = _decode_to_array(encode_baseline_jpeg(img, q=2, gray=True))
    prog = _decode_to_array(encode_progressive_jpeg(img, q=2, gray=True))
    assert (prog == base).all()

    flat = np.zeros((24, 24, 3), np.uint8)
    for i in range(24):
        v = 40 + 7 * i
        flat[i, :, :] = (v, v, v)
    base420 = _decode_to_array(encode_baseline_jpeg(flat, q=4, subsample=True))
    prog420 = _decode_to_array(
        encode_progressive_jpeg(flat, q=4, subsample=True)
    )
    assert (prog420 == base420).all()

    # restart markers in the interleaved DC scan
    rst = _decode_to_array(encode_progressive_jpeg(img, q=2, gray=True, restart=2))
    assert (rst == base).all()


def test_progressive_truncation_and_fuzz_never_raise():
    """Prefix decode: cutting a progressive file after any scan still
    decodes (lower quality, never an exception); random byte damage
    never raises (same contract as baseline)."""
    import random

    img = np.full((16, 16, 3), 120, np.uint8)
    base = encode_progressive_jpeg(img, q=4)
    rng = random.Random(33)
    for _ in range(80):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(len(b) + 1)
        try:
            decode_jpeg_pixels(bytes(b[:cut]))
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"decoder raised on fuzzed progressive input: {exc!r}")


def test_progressive_flows_through_resize_images(spark):
    """The multimodal pipeline upgrade: a progressive payload now
    resizes for real instead of landing in needs_codec."""
    from kyiv_traffic_bigdata_spark.operators.multimodal import resize_images

    img = np.zeros((8, 8, 3), np.uint8)
    img[:4, :4] = (200, 50, 50)
    payload = encode_progressive_jpeg(img, q=2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert row.status == "resized"


# ---------------------------------------------------------------------------
# 12-bit precision (SOF1 extended sequential + 12-bit progressive)
# ---------------------------------------------------------------------------


def test_ext12_gray_gradient_uses_full_dynamic_range():
    """A 12-bit ramp spanning 0..4095 must decode to the full 0..255
    output range — proving values above the 8-bit ceiling survive
    (a clipped-at-255 decode would flatten the top half)."""
    q = 8
    ramp = np.linspace(0.0, 4095.0, 32)
    img12 = np.tile(np.round(ramp).astype(np.uint16), (16, 1))
    out = _decode_to_array(encode_ext12_jpeg(img12, q=q))
    assert out.shape == (16, 32, 3)
    expected = np.round(img12.astype(np.float64) * 255.0 / 4095.0)
    err = np.abs(out[:, :, 0].astype(float) - expected)
    # pixel-space quantization error ≤ 8q twelve-bit units → /16.06 in
    # 8-bit units, +1 for the two rounding steps
    assert err.max() <= 8 * q / 16.0 + 1.0
    assert out[:, :, 0].min() == 0 and out[:, :, 0].max() == 255
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()


def test_ext12_flat_color_roundtrip():
    img12 = np.zeros((16, 24, 3), np.uint16)
    img12[:, :] = (3600, 1200, 300)  # values far above the 8-bit range
    out = _decode_to_array(encode_ext12_jpeg(img12, q=4))
    expected = np.round(img12.astype(np.float64) * 255.0 / 4095.0)
    assert np.abs(out.astype(float) - expected).max() <= 2.0


def test_ext12_random_bounded_and_never_raises():
    rng = np.random.default_rng(23)
    q = 8
    img12 = rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)
    payload = encode_ext12_jpeg(img12, q=q)
    out = _decode_to_array(payload)
    expected = img12.astype(np.float64) * 255.0 / 4095.0
    # random content: quantization-bounded, never structural
    assert np.abs(out[:, :, 0].astype(float) - expected).max() <= 8 * q / 16.0 + 1.0
    import random as _random

    r = _random.Random(5)
    b = bytearray(payload)
    for _ in range(200):
        i = r.randrange(len(b))
        b[i] ^= 1 << r.randrange(8)
        cut = r.randrange(len(b) + 1)
        try:
            decode_jpeg_pixels(bytes(b[:cut]))
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"decoder raised on fuzzed 12-bit input: {exc!r}")


def test_ext12_odd_dimensions_cropped():
    img12 = np.full((13, 11), 2048, np.uint16)
    out = _decode_to_array(encode_ext12_jpeg(img12, q=2))
    assert out.shape == (13, 11, 3)
    assert np.abs(out[:, :, 0].astype(float) - round(2048 * 255 / 4095)).max() <= 1


def test_unsupported_precision_refused():
    img12 = np.full((8, 8), 100, np.uint16)
    good = encode_ext12_jpeg(img12, q=4)
    sof_at = good.index(b"\xff\xc1")
    bad = bytearray(good)
    bad[sof_at + 4] = 10  # precision 10: legal only for lossless
    assert decode_jpeg_pixels(bytes(bad)) is None
    bad[sof_at + 4] = 16
    assert decode_jpeg_pixels(bytes(bad)) is None


def test_progressive_12bit_narrow_band():
    """12-bit progressive (SOF2, precision 12): spectral selection +
    successive approximation over a narrow-band 12-bit image decodes to
    the same pixels as the 12-bit sequential encoder's output."""
    rng = np.random.default_rng(7)
    img12 = (2048 + rng.integers(-200, 200, size=(16, 24, 3))).astype(np.uint16)
    seq = _decode_to_array(encode_ext12_jpeg(img12, q=4))
    prog = _decode_to_array(
        encode_progressive_jpeg(img12, q=4, precision=12, dc_al=1, ac_al=1)
    )
    assert np.abs(prog.astype(int) - seq.astype(int)).max() <= 1


def test_ext12_flows_through_resize_images(spark):
    """multimodal upgrade: a 12-bit medical-profile payload resizes for
    real instead of landing in needs_codec (the r07/r08 residue)."""
    from kyiv_traffic_bigdata_spark.operators.multimodal import resize_images

    img12 = np.zeros((8, 8, 3), np.uint16)
    img12[:4, :4] = (4000, 500, 500)
    payload = encode_ext12_jpeg(img12, q=2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert row.status == "resized"
