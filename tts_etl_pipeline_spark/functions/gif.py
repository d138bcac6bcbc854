"""Dependency-free GIF decoder/encoder (GIF87a/89a, W3C spec + LZW from
Welch 1984) — extends the multimodal codec family (operators/multimodal.py)
with the third real still-image format next to BMP and PNG/JPEG.

Decoder surface: first-frame decode to HxWx3 uint8 RGB (global/local color
tables, interlaced row order, frame offsets pasted onto the logical-screen
canvas) and a structural metadata probe (width/height/frame count) that
walks block lengths — never scans pixel bytes for markers (the y4m lesson:
payload bytes can coincidentally contain anything).

Encoder surface (fixture path, like encode_bmp): palette-exact images
(≤256 distinct colors) via LZW with a CLEAR code emitted whenever the code
table would outgrow 9-bit codes — the classic "uncompressed GIF" trick:
valid output any decoder accepts, no table-eviction ambiguity.

Used inside the existing chunked-binary mapInPandas stages; nothing here
touches Spark directly.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------
def lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> bytearray:
    """Decode a GIF LZW stream (sub-blocks already concatenated) into color
    indices. Stops at END, or after `expected` pixels if the stream omits
    the END code (tolerated by common decoders)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return out  # stream ended without END code
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # table growth widens the code — capped at 12 bits per the spec
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if expected is not None and len(out) >= expected:
            return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """CLEAR-heavy LZW: emit each pixel as a literal code and reset the
    table whenever the next addition would push codes past 9 bits. The
    decoder's table then never exceeds 511 entries, so every emitted code
    fits the current width — simple, valid, deterministic."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # decoder-side table grows by 1 per emitted literal (after the first);
    # reset before it would reach 1 << (min_code_size + 1)
    budget = (1 << code_size) - end - 2
    used = 0
    for idx in indices.ravel():
        emit(int(idx))
        used += 1
        if used >= budget:
            emit(clear)
            used = 0
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------
_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (first row, step)


def _skip_subblocks(content: bytes, p: int) -> int:
    while True:
        if p >= len(content):
            raise ValueError("truncated GIF sub-blocks")
        ln = content[p]
        p += 1
        if ln == 0:
            return p
        p += ln


def _read_subblocks(content: bytes, p: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        ln = content[p]
        p += 1
        if ln == 0:
            return b"".join(chunks), p
        chunks.append(content[p : p + ln])
        p += ln


def _walk(content: bytes):
    """Yield (kind, payload) per block: 'image' -> dict, 'ext' -> label."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _ = struct.unpack_from("<HHBBB", content, 6)
    p = 13
    gct = None
    if packed & 0x80:
        ngct = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, ngct * 3, p).reshape(-1, 3)
        p += ngct * 3
    yield "screen", {"width": sw, "height": sh, "gct": gct, "bg": bg}
    while p < len(content):
        b = content[p]
        p += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks
            label = content[p]
            if label == 0xF9:  # Graphic Control Extension: keep the payload
                gce, p = _read_subblocks(content, p + 1)
                yield "gce", gce
            else:
                p = _skip_subblocks(content, p + 1)
                yield "ext", label
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", content, p)
            p += 9
            lct = None
            if ipacked & 0x80:
                nlct = 2 << (ipacked & 0x07)
                lct = np.frombuffer(content, np.uint8, nlct * 3, p).reshape(-1, 3)
                p += nlct * 3
            min_code = content[p]
            data, p = _read_subblocks(content, p + 1)
            yield "image", {
                "left": left, "top": top, "w": w, "h": h,
                "interlaced": bool(ipacked & 0x40), "lct": lct,
                "min_code": min_code, "data": data,
            }
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def gif_meta(content: bytes) -> dict:
    """Structural probe: dimensions + frame count without pixel decode."""
    width = height = None
    n_frames = 0
    for kind, payload in _walk(content):
        if kind == "screen":
            width, height = payload["width"], payload["height"]
        elif kind == "image":
            n_frames += 1
    return {"width": width, "height": height, "n_frames": n_frames}


def decode_gif(content: bytes) -> np.ndarray:
    """Decode the FIRST frame onto the logical-screen canvas as HxWx3 RGB.

    The canvas initializes to the background color (or black without a
    GCT); the frame rectangle (left/top offsets) pastes over it, and a
    preceding Graphic Control Extension's transparent index (GIF89a) is
    honored — transparent pixels leave the canvas showing through.
    Animation composition beyond frame 1 is out of scope (the metadata
    probe still counts all frames)."""
    screen = None
    transparent = None
    for kind, payload in _walk(content):
        if kind == "screen":
            screen = payload
        elif kind == "gce":
            # packed byte bit 0 = transparent-color flag; byte 3 = index
            if len(payload) >= 4 and payload[0] & 0x01:
                transparent = payload[3]
        elif kind == "image":
            gct = screen["gct"]
            palette = payload["lct"] if payload["lct"] is not None else gct
            if palette is None:
                raise ValueError("GIF frame has no color table")
            w, h = payload["w"], payload["h"]
            idx = lzw_decode(payload["data"], payload["min_code"], expected=w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data underrun")
            rows = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
            if payload["interlaced"]:
                deinter = np.empty_like(rows)
                src = 0
                for first, step in _INTERLACE_PASSES:
                    n = len(range(first, h, step))
                    deinter[first::step] = rows[src : src + n]
                    src += n
                rows = deinter
            frame = palette[rows]  # HxWx3 uint8
            sw, sh = screen["width"], screen["height"]
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and screen["bg"] < len(gct):
                canvas[:, :] = gct[screen["bg"]]
            top, left = payload["top"], payload["left"]
            if transparent is not None:
                opaque = rows != transparent
                region = canvas[top : top + h, left : left + w]
                region[opaque] = frame[opaque]
            else:
                canvas[top : top + h, left : left + w] = frame
            return canvas
    raise ValueError("GIF contains no image block")


def encode_gif(
    img: np.ndarray, interlaced: bool = False, extra_frames: int = 0
) -> bytes:
    """Encode an HxWx3 uint8 RGB array (≤256 distinct colors) as GIF89a.

    `extra_frames` appends that many copies of the frame (a deterministic
    multi-frame fixture for the metadata probe)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF fixture needs <=256 colors, got {len(palette)}")
    # color-table sizes are powers of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, bits)  # LZW minimum code size must be >= 2

    indices = inverse.astype(np.uint16).reshape(h, w)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()

    def frame_block(rows: np.ndarray, inter: bool) -> bytes:
        if inter:
            order = [r for first, step in _INTERLACE_PASSES for r in range(first, h, step)]
            rows = rows[order]
        blob = lzw_encode(rows, min_code)
        blk = bytearray()
        blk += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if inter else 0)
        blk.append(min_code)
        for i in range(0, len(blob), 255):
            chunk = blob[i : i + 255]
            blk.append(len(chunk))
            blk += chunk
        blk.append(0)
        return bytes(blk)

    out += frame_block(indices, interlaced)
    for _ in range(extra_frames):
        out += frame_block(indices, False)
    out += b"\x3B"
    return bytes(out)
