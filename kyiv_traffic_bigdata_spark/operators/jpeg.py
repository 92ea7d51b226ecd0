"""Baseline JPEG pixel decode — pure stdlib + numpy, no codec library.

Closes the last ``needs_codec`` gap in the multimodal pipeline
(operators/multimodal.py): PNG was already real (zlib + unfilters), GIF
real (LZW); this module decodes baseline sequential DCT JPEG (SOF0), extended
sequential (SOF1, incl. 12-bit precision) AND progressive DCT JPEG
(SOF2, 8- or 12-bit) — together the overwhelming majority of web crawl
images plus the medical/scientific 12-bit profile — end-to-end:

* marker/segment walk (DQT, DHT, SOF0/SOF2, SOS, DRI; APPn/COM
  skipped; 0xFF fill bytes tolerated),
* canonical Huffman entropy decode with 0xFF00 byte-stuffing and
  restart-marker (RSTn) handling; non-interleaved block order for
  single-component scans (A.2.2),
* progressive multi-scan accumulation: spectral selection +
  successive approximation, EOBRUN, refinement correction bits
  (G.1.2 / the jdphuff algorithms) — see _decode_progressive,
* dequantize → de-zigzag → batched 8×8 IDCT (one numpy einsum over all
  blocks of a component — the hot loop is C-side),
* chroma upsampling for any (h, v) sampling factors (nearest), JFIF
  full-range YCbCr→RGB (BT.601) with clamp.

12-bit handling (r09, closes the r07/r08 "medical imagery" residue):
SOF1/SOF2 frames with precision 12 decode natively — level shift
2^(P-1)=2048, chroma centered at 2048, extended Huffman magnitude
categories (DC ≤ 15, AC size ≤ 14 ride the same generic tables) — and
the result is scaled to the pipeline's 8-bit RGB contract (×255/4095).
Verified by a 12-bit test encoder (SOF1, 16-bit DQT, extended tables)
in tests/test_jpeg.py via decode(encode(img12)) error bounds.

Out of scope (returns None, callers fall back to ``needs_codec``):
arithmetic coding, hierarchical, lossless, >4 components.
``max_pixels`` bounds memory/CPU per payload — the same guard contract
as decode_png_pixels/decode_gif_frames.

DECISION (r07, narrowed r09): arithmetic-coded JPEG stays Pillow-gated
rather than hand-implemented. It is effectively absent from real
corpora — patent-encumbered for the format's formative decades,
virtually no encoder emits it (libjpeg ships with it disabled), and
browsers don't render it — and a from-scratch QM-coder needs the
113-row empirical Qe state table from ITU T.81 Table D.3, which is not
derivable from first principles; transcribing it from memory risks a
decoder that silently mis-decodes spec-compliant files, strictly worse
than the honest per-row ``needs_codec`` status (never a failed batch).
The optional Pillow probe (multimodal.py ``optional_image_codec``)
upgrades such rows to ``resized`` wherever a codec library exists.

Reference parity note: the reference repo ships no image codecs (its
multimodal surface is this repo's extension); the decoder exists so the
Spark-side media plumbing is real in codec-less environments. Verified
by self-contained baseline AND progressive ENCODERS in
tests/test_jpeg.py (spec Annex K tables / G.1.2 scan scripts) via
decode(encode(img)) equality and error bounds plus numpy-reference IDCT
and bit-reader unit tests — encoders and decoder share no code paths
beyond the tables' spec values.
"""

from __future__ import annotations

import struct

#: zigzag index: ZIGZAG[i] = natural position of the i-th zigzag coef
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    stuffing; stops at any real marker (0xFF xx, xx not 0x00). Restart
    markers are consumed by the caller via ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return False
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < n and d[self.pos + 1] == 0x00:
                self.pos += 2
            else:
                return False  # a real marker — entropy data ends here
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align(self) -> None:
        self.nbits = 0
        self.bitbuf = 0

    def at_marker(self) -> int | None:
        """The marker byte at the current (aligned) position, if any."""
        d, n = self.data, len(self.data)
        if self.pos + 1 < n and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None

    def sync_restart(self) -> bool:
        """Consume an RSTn marker at an MCU-restart boundary (skipping
        any legal 0xFF fill bytes preceding it, spec B.1.1.2)."""
        self.align()
        d, n = self.data, len(self.data)
        while self.pos + 1 < n and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        m = self.at_marker()
        if m is not None and 0xD0 <= m <= 0xD7:
            self.pos += 2
            return True
        return False


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map ``size`` magnitude bits to a signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _idct_blocks(blocks):
    """Batched 8×8 IDCT (DCT-III with JPEG normalization) over an
    (n, 8, 8) coefficient array — one einsum, all blocks at once."""
    import numpy as np

    k = np.arange(8)
    # C[u, x] = c(u)/2 * cos((2x+1)uπ/16)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0, :] *= 1 / np.sqrt(2)
    # spatial = Cᵀ · coef · C
    return np.einsum("ux,nuv,vy->nxy", c, blocks, c, optimize=True)


def decode_jpeg_pixels(
    payload: bytes, max_pixels: int = 1 << 22
) -> tuple[int, int, bytes] | None:
    """Decode a baseline JPEG into ``(width, height, rgb24 bytes)``, or
    None for non-baseline/corrupt/oversized input (never raises — the
    log-and-continue parser stance, fuzz-pinned)."""
    try:
        return _decode_jpeg(payload, max_pixels)
    except (struct.error, IndexError, ValueError):
        return None


def _decode_jpeg(
    payload: bytes, max_pixels: int
) -> tuple[int, int, bytes] | None:
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    precision = 8
    restart_interval = 0
    i, n = 2, len(payload)
    sos_at = -1
    scan_comps: list[dict] = []
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            i += 1
            continue
        if marker == 0xD8:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) < seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = list(seg[j : j + 64])
                    j += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[j + 2 * t : j + 2 * t + 2])[0]
                        for t in range(64)
                    ]
                    j += 128
                if len(vals) < 64:
                    return None
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                if len(symbols) < total:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, symbols
                )
                j += 17 + total
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq.
            precision = seg[0]
            if precision not in (8, 12):
                return None  # only 8/12-bit sample precision (B.2.2)
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc == 0 or nc > 4 or w == 0 or h == 0 or w * h > max_pixels:
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
                if comps[-1]["h"] not in (1, 2, 4) or comps[-1]["v"] not in (1, 2, 4):
                    return None
        elif marker == 0xC2:  # SOF2: hand the whole payload to the
            return _decode_progressive(payload, max_pixels)  # multi-scan path
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # unsupported SOF (arithmetic/hierarchical/lossless)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for s in range(ns):
                cs, tds = seg[1 + 2 * s], seg[2 + 2 * s]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    return None
                scan_comps.append(
                    {**comp, "dc": tds >> 4, "ac": tds & 0x0F}
                )
            sos_at = i + 2 + seglen
            break
        i += 2 + seglen
    if sos_at < 0 or not comps or not scan_comps or w == 0:
        return None
    if len(scan_comps) != len(comps):
        return None  # multi-scan baseline not supported

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # A single-component scan is NON-INTERLEAVED per the spec (A.2.2):
    # the MCU is one 8×8 block and blocks run in raster order over the
    # component's own ceil(cw/8) × ceil(ch/8) grid — no dummy blocks,
    # regardless of the declared sampling factors (r5 ADVICE: the old
    # interleaved layout garbled lone components with sampling > 1).
    non_interleaved = len(scan_comps) == 1

    for c in scan_comps:
        if c["tq"] not in qt or c["dc"] not in huff_dc or c["ac"] not in huff_ac:
            return None
        c["qtab"] = qt[c["tq"]]
        if non_interleaved:
            cw = (w * c["h"] + hmax - 1) // hmax  # component resolution
            ch = (h * c["v"] + vmax - 1) // vmax
            c["bw"] = (cw + 7) // 8
            c["bh"] = (ch + 7) // 8
        else:
            c["bw"] = mcux * c["h"]  # blocks across (MCU-padded)
            c["bh"] = mcuy * c["v"]
        c["coef"] = []  # list of 64-coef blocks in scan order
        c["pred"] = 0

    def decode_block(c) -> bool:
        block = [0] * 64
        s = _decode_symbol(br, huff_dc[c["dc"]])
        if s is None:
            return False
        bits = br.read_bits(s) if s else 0
        if bits is None:
            return False
        c["pred"] += _extend(bits, s)
        block[0] = c["pred"] * c["qtab"][0]
        kpos = 1
        while kpos < 64:
            sym = _decode_symbol(br, huff_ac[c["ac"]])
            if sym is None:
                return False
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    return False
                kpos += 16  # ZRL
                continue
            kpos += run
            if kpos > 63:
                return False
            bits = br.read_bits(size)
            if bits is None:
                return False
            block[ZIGZAG[kpos]] = _extend(bits, size) * c["qtab"][kpos]
            kpos += 1
        c["coef"].append(block)
        return True

    br = _BitReader(payload, sos_at)
    mcu_count = 0
    if non_interleaved:
        c0 = scan_comps[0]
        n_units = c0["bw"] * c0["bh"]  # MCU = one block here
    else:
        n_units = mcux * mcuy
    for _ in range(n_units):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            if not br.sync_restart():
                return None
            for c in scan_comps:
                c["pred"] = 0
        if non_interleaved:
            if not decode_block(scan_comps[0]):
                return None
        else:
            for c in scan_comps:
                for _ in range(c["h"] * c["v"]):
                    if not decode_block(c):
                        return None
        mcu_count += 1

    # batched IDCT per component, then assemble plane from scan order
    planes = []
    for c in scan_comps:
        blocks = np.array(c["coef"], dtype=np.float64).reshape(-1, 8, 8)
        spatial = _idct_blocks(blocks) + float(1 << (precision - 1))
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        bi = 0
        if non_interleaved:  # raster block order
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial[bi]
                    bi += 1
        else:  # MCU-interleaved block order
            for my in range(mcuy):
                for mx in range(mcux):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                            bi += 1
        # upsample to full resolution (nearest) and crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    return _planes_to_rgb(planes, w, h, precision)


def _planes_to_rgb(
    planes, w: int, h: int, precision: int = 8
) -> tuple[int, int, bytes] | None:
    """Shared color tail (baseline + progressive): gray replication or
    JFIF full-range YCbCr→RGB (BT.601) with clamp. 12-bit samples
    (extended sequential / 12-bit progressive) convert in the native
    range — chroma centered at 2^(P-1) — then scale to the pipeline's
    8-bit RGB contract (×255/4095); for P=8 the scale is exactly 1.0,
    so the 8-bit path is bit-identical to the pre-12-bit code."""
    import numpy as np

    maxval = float((1 << precision) - 1)
    half = float(1 << (precision - 1))
    if len(planes) == 1:
        ycc = np.clip(planes[0], 0, maxval)
        rgb = np.repeat(ycc[:, :, None], 3, axis=2)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - half)
        g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        b = y + 1.772 * (cb - half)
        rgb = np.stack(
            [np.clip(r, 0, maxval), np.clip(g, 0, maxval), np.clip(b, 0, maxval)],
            axis=2,
        )
    else:
        return None  # CMYK/4-component not supported
    if precision != 8:
        rgb = rgb * (255.0 / maxval)
    return w, h, np.round(rgb).astype(np.uint8).tobytes()


def _decode_progressive(
    payload: bytes, max_pixels: int
) -> tuple[int, int, bytes] | None:
    """Progressive (SOF2) decode: multi-scan spectral-selection +
    successive-approximation entropy decoding (spec G.1.2 — EOBRUN,
    refinement correction bits, interleaved DC / non-interleaved AC
    block order, per-scan restart handling; algorithms follow the
    spec's figures G.3-G.7, the same logic libjpeg's jdphuff
    implements). Coefficients accumulate raw (point-transformed) per
    component and are dequantized + IDCT'd once, at end of image.
    Truncated files decode their scan prefix (log-and-continue
    stance)."""
    import numpy as np

    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    state: dict[int, dict] = {}
    w = h = 0
    precision = 8
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    i, n = 2, len(payload)

    while i + 2 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2)
            i += 1
            continue
        if marker == 0xD8:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            break  # truncated mid-header: decode what we have
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) < seglen - 2:
            break
        if marker == 0xDB:  # DQT (tables may arrive between scans)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = list(seg[j : j + 64])
                    j += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[j + 2 * t : j + 2 * t + 2])[0]
                        for t in range(64)
                    ]
                    j += 128
                if len(vals) < 64:
                    return None
                qt[tq] = vals
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                if len(symbols) < total:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, symbols
                )
                j += 17 + total
        elif marker == 0xC2:  # SOF2
            precision = seg[0]
            if precision not in (8, 12):
                return None  # only 8/12-bit sample precision (B.2.2)
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc == 0 or nc > 4 or w == 0 or h == 0 or w * h > max_pixels:
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
                if comps[-1]["h"] not in (1, 2, 4) or comps[-1]["v"] not in (1, 2, 4):
                    return None
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for ci, c in enumerate(comps):
                bw, bh = mcux * c["h"], mcuy * c["v"]
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                state[ci] = {
                    "bw": bw,  # MCU-padded block grid (interleaved order)
                    "bh": bh,
                    "bw_ni": (cw + 7) // 8,  # the component's own grid
                    "bh_ni": (ch + 7) // 8,  # (non-interleaved scans)
                    "coef": np.zeros((bw * bh, 64), dtype=np.int32),
                }
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # a second, non-progressive SOF is malformed
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS: entropy-decode one scan
            if not comps:
                return None
            ns = seg[0]
            scan = []
            for s in range(ns):
                cs, tds = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(
                    (k for k, c in enumerate(comps) if c["id"] == cs), None
                )
                if ci is None:
                    return None
                scan.append((ci, tds >> 4, tds & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            br = _BitReader(payload, i + 2 + seglen)
            if not _progressive_scan(
                br, comps, state, scan, ss, se, ah, al,
                restart_interval, huff_dc, huff_ac, mcux, mcuy,
            ):
                return None
            br.align()
            i = br.pos  # resume the walk at the marker ending the scan
            continue
        i += 2 + seglen

    if not comps or w == 0:
        return None
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        st = state[ci]
        qnat = np.zeros(64, dtype=np.int64)
        for k in range(64):
            qnat[ZIGZAG[k]] = qt[c["tq"]][k]
        blocks = (st["coef"].astype(np.float64) * qnat).reshape(-1, 8, 8)
        spatial = _idct_blocks(blocks) + float(1 << (precision - 1))
        plane = np.zeros((st["bh"] * 8, st["bw"] * 8), dtype=np.float64)
        for bi in range(st["bh"] * st["bw"]):
            by, bx = divmod(bi, st["bw"])
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial[bi]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    return _planes_to_rgb(planes, w, h, precision)


def _progressive_scan(
    br, comps, state, scan, ss, se, ah, al,
    restart_interval, huff_dc, huff_ac, mcux, mcuy,
) -> bool:
    """Entropy-decode one progressive scan into the per-component raw
    coefficient arrays. Returns False on malformed data."""
    interleaved = len(scan) > 1
    if ss == 0 and se != 0:
        return False  # a DC scan is exactly Ss=Se=0
    if ss != 0 and interleaved:
        return False  # AC scans are single-component (G.1.1.1.1)
    preds = {ci: 0 for ci, _, _ in scan}
    eobrun = 0

    def dc_block(ci, td, bi) -> bool:
        coef = state[ci]["coef"]
        if ah == 0:  # first DC scan: huffman diff, scaled by 2^Al
            table = huff_dc.get(td)
            if table is None:
                return False
            s = _decode_symbol(br, table)
            if s is None:
                return False
            bits = br.read_bits(s) if s else 0
            if bits is None:
                return False
            preds[ci] += _extend(bits, s)
            coef[bi, 0] = preds[ci] << al
        else:  # refinement: one raw bit ORs into bit Al
            bit = br.read_bit()
            if bit is None:
                return False
            if bit:
                coef[bi, 0] |= 1 << al
        return True

    def ac_block_first(ci, ta, bi) -> bool:
        nonlocal eobrun
        coef = state[ci]["coef"]
        table = huff_ac.get(ta)
        if table is None:
            return False
        if eobrun > 0:
            eobrun -= 1
            return True
        k = ss
        while k <= se:
            sym = _decode_symbol(br, table)
            if sym is None:
                return False
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # current block is a member
                if r:
                    bits = br.read_bits(r)
                    if bits is None:
                        return False
                    eobrun += bits
                break
            k += r
            if k > se:
                return False
            bits = br.read_bits(s)
            if bits is None:
                return False
            coef[bi, ZIGZAG[k]] = _extend(bits, s) << al
            k += 1
        return True

    def ac_block_refine(ci, ta, bi) -> bool:
        nonlocal eobrun
        coef = state[ci]["coef"]
        table = huff_ac.get(ta)
        if table is None:
            return False
        p1 = 1 << al
        m1 = -1 << al
        k = ss

        def refine_nonzero(idx) -> bool:
            bit = br.read_bit()
            if bit is None:
                return False
            c = int(coef[bi, idx])
            if bit and (c & p1) == 0:
                coef[bi, idx] = c + (p1 if c >= 0 else m1)
            return True

        if eobrun == 0:
            while k <= se:
                sym = _decode_symbol(br, table)
                if sym is None:
                    return False
                r, s = sym >> 4, sym & 0x0F
                val = 0
                if s == 0:
                    if r < 15:
                        # refine-pass EOB counts the CURRENT block too:
                        # the tail loop below refines it, then decrements
                        eobrun = 1 << r
                        if r:
                            bits = br.read_bits(r)
                            if bits is None:
                                return False
                            eobrun += bits
                        break
                    # r == 15 (ZRL): pass over 16 zero-history coefs
                else:
                    if s != 1:
                        return False  # refine can only create ±1<<Al
                    bit = br.read_bit()
                    if bit is None:
                        return False
                    val = p1 if bit else m1
                # advance: correction bits for nonzeros, count r zeros
                while k <= se:
                    idx = ZIGZAG[k]
                    if coef[bi, idx] != 0:
                        if not refine_nonzero(idx):
                            return False
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0:
                    if k > se:
                        return False
                    coef[bi, ZIGZAG[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # band remainder: refine existing nonzeros
                idx = ZIGZAG[k]
                if coef[bi, idx] != 0:
                    if not refine_nonzero(idx):
                        return False
                k += 1
            eobrun -= 1
        return True

    def decode_unit(unit_idx) -> bool:
        if interleaved:  # DC scan over full MCUs, dummy blocks included
            my, mx = divmod(unit_idx, mcux)
            for ci, td, _ta in scan:
                c = comps[ci]
                bw = state[ci]["bw"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        if not dc_block(ci, td, bi):
                            return False
            return True
        # non-interleaved: raster over the component's OWN grid, mapped
        # into the MCU-padded coefficient array
        ci, td, ta = scan[0]
        st = state[ci]
        by, bx = divmod(unit_idx, st["bw_ni"])
        bi = by * st["bw"] + bx
        if ss == 0:
            return dc_block(ci, td, bi)
        if ah == 0:
            return ac_block_first(ci, ta, bi)
        return ac_block_refine(ci, ta, bi)

    if interleaved:
        n_units = mcux * mcuy
    else:
        st0 = state[scan[0][0]]
        n_units = st0["bw_ni"] * st0["bh_ni"]

    mcu_count = 0
    for u in range(n_units):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            if not br.sync_restart():
                return False
            for ci in preds:
                preds[ci] = 0
            eobrun = 0
        if not decode_unit(u):
            return False
        mcu_count += 1
    return True
