"""From-scratch baseline JPEG codec (pure numpy, no external libs).

Decoder: SOI/APPn/DQT/DHT/SOF0/DRI/SOS marker parse, byte-unstuffed
MSB-first bit reader, canonical Huffman decode (DC category + diff,
AC run/size with ZRL/EOB), dequantize → de-zigzag → 8×8 IDCT-II →
level shift, 4:4:4 and 4:2:0/4:2:2 chroma upsampling (nearest),
BT.601 YCbCr→RGB, restart-interval support. Progressive (SOF2) and
arithmetic coding are out of scope and raise.

Encoder: baseline 4:4:4 with the Annex-K example quantization and
Huffman tables (scaled by a quality factor), used by the round-trip
tests and available to pipelines that need a compressed sink.

Verification strategy (tests/test_mm_jpeg.py): the IDCT is checked
against an independent explicit-cosine-sum DCT oracle, the zigzag
table against an independently generated one, and solid-color images
against hand-computed DC-only closed forms — so an encoder/decoder
bug pair cannot silently cancel.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# JPEG Annex K example tables (the de-facto standard set)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# (bits[1..16], values) — Annex K typical Huffman tables
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
STD_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis matrix C: dct = C @ x @ C.T."""
    u = np.arange(8)
    c = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16.0)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_C = _dct_matrix()


def idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------- huffman

class _HuffTable:
    """Canonical Huffman: (length, code) → symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.enc: dict[int, tuple[int, int]] = {}
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                sym = values[k]
                self.lookup[(ln, code)] = sym
                self.enc[sym] = (code, ln)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over byte-unstuffed entropy data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, size: int) -> int:
    """JPEG F.2.2.1 EXTEND: map `size`-bit magnitude to signed."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- decoder

def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG → (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:          # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    qtabs[tq] = np.frombuffer(seg, np.uint8, 64,
                                              p).astype(np.int64)
                    p += 64
                else:
                    qtabs[tq] = np.frombuffer(
                        seg[p:p + 128], ">u2").astype(np.int64)
                    p += 128
        elif marker == 0xC4:        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker == 0xC0:        # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), \
                seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:        # SOS — entropy data follows
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 15)
            # collect entropy bytes, un-stuffing 0xFF00 and stripping
            # RST markers
            body = bytearray()
            rst_positions = []
            p = pos
            while p < len(data) - 1:
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        body.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        rst_positions.append(len(body))
                        p += 2
                        continue
                    break  # EOI or next marker
                body.append(b)
                p += 1
            return _decode_scan(frame, qtabs, htabs, sel, bytes(body),
                                restart_interval)
        # APPn/COM and others: skipped
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(frame, qtabs, htabs, sel, body: bytes,
                 restart_interval: int) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                               dtype=np.float64))
    rd = _BitReader(body)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rd.byte_align()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = htabs[(0, sel[c["id"]][0])]
                ac_t = htabs[(1, sel[c["id"]][1])]
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = rd.decode(dc_t)
                        diff = _extend(rd.read_bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:   # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = (zz * q).astype(np.float64)
                        px = idct2(blk.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample each plane to full MCU-aligned resolution, crop, stack
    full = []
    for c, pl in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w])
    if len(comps) == 1:
        ycc = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(ycc[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2) + 0.5,
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(wtr, blk, q, dc_t, ac_t, pred):
    coef = dct2(blk - 128.0)
    zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    code, ln = dc_t.enc[size]
    wtr.write(code, ln)
    if size:
        wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                c, l = ac_t.enc[0xF0]   # ZRL
                wtr.write(c, l)
                run = 0
            continue
        s = int(abs(v)).bit_length()
        c, l = ac_t.enc[(run << 4) | s]
        wtr.write(c, l)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_t.enc[0x00]          # EOB
        wtr.write(c, l)
    return int(zz[0])


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG (Annex-K tables).
    subsampling: "444" (no chroma downsample) or "420" (2×2 box —
    what most real-world JPEGs use; 16×16-luma MCUs)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.asarray(arr, dtype=np.float64)
    h, w, _ = arr.shape
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # zigzag-ordered quant tables: DQT stores them in zigzag order,
    # and _encode_block divides zigzag-ordered coefficients — one
    # representation end-to-end (the decoder interprets DQT the same
    # spec-correct way)
    ql = _scaled_q(STD_LUMA_Q, quality)[ZIGZAG]
    qc = _scaled_q(STD_CHROMA_Q, quality)[ZIGZAG]
    dc_l, ac_l = _HuffTable(*STD_DC_LUMA), _HuffTable(*STD_AC_LUMA)
    dc_c, ac_c = _HuffTable(*STD_DC_CHROMA), _HuffTable(*STD_AC_CHROMA)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    luma_hv = 0x11 if subsampling == "444" else 0x22
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql.tolist()))
    out += seg(0xDB, bytes([1]) + bytes(qc.tolist()))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, luma_hv, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for (tc, th), (bits, values) in ((((0, 0)), STD_DC_LUMA),
                                     (((1, 0)), STD_AC_LUMA),
                                     (((0, 1)), STD_DC_CHROMA),
                                     (((1, 1)), STD_AC_CHROMA)):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(values))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    wtr = _BitWriter()
    mb = 8 if subsampling == "444" else 16  # luma pixels per MCU side
    mcux, mcuy = (w + mb - 1) // mb, (h + mb - 1) // mb

    def pad(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    y = pad(y, mcuy * mb, mcux * mb)
    if subsampling == "420":
        # 2×2 box-average chroma, padded to even dims first
        cbp = pad(cb, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
        crp = pad(cr, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
        cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2]
              + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[1::2, 0::2]
              + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
    cb = pad(cb, mcuy * 8, mcux * 8)
    cr = pad(cr, mcuy * 8, mcux * 8)
    nb = 1 if subsampling == "444" else 2  # luma blocks per MCU side
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(nb):
                for bx in range(nb):
                    y0 = (my * nb + by) * 8
                    x0 = (mx * nb + bx) * 8
                    preds[0] = _encode_block(
                        wtr, y[y0:y0 + 8, x0:x0 + 8], ql, dc_l, ac_l,
                        preds[0])
            for ci, pl in ((1, cb), (2, cr)):
                blk = pl[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[ci] = _encode_block(wtr, blk, qc, dc_c, ac_c,
                                          preds[ci])
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


