"""Image decoding with no codec library: baseline JPEG and GIF (PNG/BMP
live in operators/multimodal.py next to the header sniffing).

JPEG scope: baseline sequential DCT (SOF0), 8-bit, grayscale / 4:4:4 /
4:2:0 / 4:2:2 chroma subsampling, optional restart markers. Progressive
(SOF2), arithmetic coding, and 12-bit depth raise NotImplementedError —
callers fall back to the declared codec stub path. GIF scope: 87a/89a
first frame, global/local palettes, interlace, LZW with table resets.

Reference context: the reference opens images with PIL for OCR input and
metadata (app.py:94-119, metadata_extractor.py:148-207). This sandbox has
no PIL/libjpeg, but baseline JPEG needs none: entropy decode is a Huffman
bit reader, and the 8×8 inverse DCT is one numpy basis multiply per block.
"""

from __future__ import annotations

import struct
from typing import Any

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
    ]
)

# 8x8 DCT-III basis (orthonormal): block = A.T @ coeffs @ A
_K = np.arange(8)
_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16.0)
_A[0] *= 1.0 / np.sqrt(2.0)


class _Huffman:
    """Canonical JPEG Huffman table: (length, code) → symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huffman) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(value: int, magnitude: int) -> int:
    if magnitude == 0:
        return 0
    if value < (1 << (magnitude - 1)):
        return value - (1 << magnitude) + 1
    return value


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → HxWx3 uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huffman] = {}  # (class, id)
    comps: list[dict[str, Any]] = []
    width = height = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    scan: bytes | None = None
    scan_map: list[tuple[int, int]] = []  # per component (dc_id, ac_id)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8).astype(np.int32)
                j += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                counts = seg[j + 1 : j + 17]
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                huff[(tc, th)] = _Huffman(counts, symbols)
                j += 17 + total
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_map = []
            for c in range(ns):
                _cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                scan_map.append((tables >> 4, tables & 0xF))
            # entropy data runs from after the header to EOI; unstuff FF00
            j = i + 2 + seg_len
            raw = bytearray()
            while j < n - 1:
                b = payload[j]
                if b == 0xFF:
                    nxt = payload[j + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker: keep a sentinel
                        raw.append(0xFF)
                        raw.append(nxt)
                        j += 2
                        continue
                    break  # EOI or next marker
                raw.append(b)
                j += 1
            scan = bytes(raw)
            break
        i += 2 + seg_len
    if scan is None or not comps:
        raise ValueError("no scan data")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64) for c in comps
    ]
    pred = [0] * len(comps)
    reader = _BitReader(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                # skip the restart marker sentinel
                if (
                    reader.pos + 1 < len(reader.data)
                    and reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                pred = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_tab = huff[(0, scan_map[ci][0])]
                ac_tab = huff[(1, scan_map[ci][1])]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        mag = reader.decode(dc_tab)
                        diff = _extend(reader.read_bits(mag), mag)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = zz * q
                        block = _A.T @ coeffs.reshape(8, 8) @ _A
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:height, :width] + 128.0)
    if len(full) == 1:
        gray = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → HxWx3 uint8 RGB, pure-Python LZW.

    Global/local color tables, interlaced images, and sub-block framing are
    handled; animation beyond the first image descriptor is ignored (the
    multimodal contract treats video-ish payloads via frame_sample)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * size, offset=pos).reshape(size, 3)
        pos += 3 * size
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            iflags = payload[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * size, offset=pos
                ).reshape(size, 3)
                pos += 3 * size
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
            idx = np.asarray(indices, dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                de = np.empty_like(idx)
                de[order] = idx[: len(order)]
                idx = de
            rgb = table[np.clip(idx, 0, len(table) - 1)]
            # compose onto the logical screen (descriptor offset)
            canvas = np.zeros((height, width, 3), dtype=np.uint8)
            canvas[iy : iy + ih, ix : ix + iw] = rgb[: height - iy, : width - ix]
            return canvas
        elif b == 0x3B:  # trailer
            break
        else:
            pos += 1
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size and len(out) < max_pixels:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [(i,) for i in range(clear)] + [(), ()]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table) and code != end:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + (entry[0],))
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return out
