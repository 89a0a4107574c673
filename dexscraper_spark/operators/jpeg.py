"""Baseline JPEG (JFIF) codec — pure Python + numpy, from the public
spec (ITU-T T.81 baseline sequential DCT; JFIF colour conventions).
Retires the last multimodal ``NotImplementedError``: the engine's
decode path no longer needs an external codec library for the dominant
training-corpus image format.

Decoder (``decode_jpeg``): marker parse (SOI/APPn/DQT/SOF0/DHT/DRI/
SOS/EOI), DHT-driven Huffman decode (tables always come from the file,
so any baseline encoder's stream decodes), DC prediction + amplitude
extend, dequantize, inverse zigzag, orthonormal 8×8 IDCT (numpy),
per-component subsampling up to 2×2 (4:4:4 / 4:2:2 / 4:2:0) with
nearest upsample, restart-marker resync, JFIF full-range YCbCr→RGB.
Greyscale (1-component) and colour (3-component) frames. Progressive
(SOF2) and arithmetic coding stay honestly out of scope and raise.

Encoder (``encode_jpeg``): the test-fixture twin — 4:4:4, Annex K
quantization tables scaled by a quality factor, Annex K typical Huffman
tables (embedded in DHT like every real encoder), byte stuffing. It
exists so the decoder is provable by roundtrip without any external
image library in the container.

Scale shape: this is a per-payload kernel invoked from the multimodal
``mapInPandas`` stages (operators/multimodal.py) — each executor decodes
its own partition's blobs; nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants from the public spec -----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal DCT-II basis: row k, col n = alpha(k) cos((2n+1)kπ/16)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125 if _k == 0 else 0.25)
                      * np.cos((2 * _n + 1) * _k * np.pi / 16.0))


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# -- Huffman ----------------------------------------------------------------

def _build_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, canonical code assignment (spec C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("DHT: bits/values mismatch")
    return table


def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RST markers surface as a resync signal, any other marker
    ends the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # spec F.2.2.5: pad with 1-bits past the end of data
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: note it, stop consuming until reset
                    self.marker = nxt
                    self.pos += 2
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # drop consumed high bits: an unmasked accumulator grows into an
        # ever-larger bigint and makes decode quadratic in stream length
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def restart(self):
        """Consume a pending RST marker and byte-align (spec F.2.1.3.1).
        Any bits still buffered here are the encoder's byte-alignment
        padding — discard them; if the eager _fill has not reached the
        marker yet (the pad byte was only partially consumed), scan
        forward to it before resyncing."""
        self.acc = 0
        self.nbits = 0
        while self.marker is None and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF and self.pos + 1 < len(self.data):
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    self.marker = nxt
                    if 0xD0 <= nxt <= 0xD7:
                        self.pos += 2
                    break
                self.pos += 2  # stuffed 0xFF00 inside the pad
                continue
            self.pos += 1
        if not (self.marker is not None and 0xD0 <= self.marker <= 0xD7):
            raise ValueError("jpeg: expected restart marker")
        self.marker = None

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(value: int, nbits: int) -> int:
    """Amplitude decode (spec F.2.2.1): top bit 0 → negative branch."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


# -- decoder ----------------------------------------------------------------

def decode_jpeg(data: bytes) -> dict:
    """Baseline JFIF → {width, height, channels, pixels(bytes, row-major
    top-down, RGB or greyscale)}. Raises ValueError on malformed input,
    NotImplementedError on progressive/arithmetic/12-bit streams."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8
                                    ).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl  # stored in zigzag order → natural
                qt[tq] = q
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                n = sum(bits)
                vals = list(seg[p:p + n])
                p += n
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"jpeg: {ncomp}-component frames (CMYK etc.) are not "
                    "supported — only greyscale and YCbCr")
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": seg[8 + 3 * i]})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline sequential DCT (SOF0/SOF1)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td_ta = seg[2 + 2 * i]
                scan_sel[cs] = (td_ta >> 4, td_ta & 0x0F)
            pixels = _decode_scan(data, pos + seglen, frame, scan_sel, qt,
                                  huff_dc, huff_ac, restart_interval)
            chans = len(frame["comps"])
            return {"format": "jpeg", "width": frame["w"],
                    "height": frame["h"],
                    "channels": 3 if chans == 3 else 1,
                    "pixels": pixels.tobytes()}
        pos += seglen
    raise ValueError("jpeg: no scan data")


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(
            c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("jpeg: sampling factors beyond 2x2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.restart()
                pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                dctab, actab = huff_dc[td], huff_ac[ta]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(dctab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(actab)
                            r, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coef[k] = _extend(reader.read_bits(ssss), ssss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        # coef is in zigzag order, q in natural order:
                        # coefficient at zigzag index k dequantizes by
                        # q[ZIGZAG[k]] — its own natural position's step
                        block[ZIGZAG] = coef * q[ZIGZAG]
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1),
                      vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder (test fixture twin: 4:4:4, Annex K tables) ---------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1  # same bigint-growth guard

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of the Annex K tables (public recipe)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    coef = np.round(_dct2(block - 128.0) / q.reshape(8, 8)).astype(np.int32)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    mag = int(abs(diff)).bit_length()
    code, ln = dc_tab[mag]
    bw.write(code, ln)
    if mag:
        v = diff if diff >= 0 else diff + (1 << mag) - 1
        bw.write(v & ((1 << mag) - 1), mag)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        mag = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | mag]
        bw.write(code, ln)
        vv = v if v >= 0 else v + (1 << mag) - 1
        bw.write(vv & ((1 << mag) - 1), mag)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels: bytes, width: int, height: int, channels: int,
                *, quality: int = 85, restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """RGB (3) or greyscale (1) row-major bytes → baseline JFIF.
    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2×2 luma sampling, chroma average-pooled — the common camera
    layout, and the coverage for the decoder's upsample/MCU path).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs (and
    exercises the decoder's resync path)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 3:
        arr = arr.reshape(height, width, 3)
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    elif channels == 1:
        planes = [arr.reshape(height, width)]
    else:
        raise ValueError("encode_jpeg: channels must be 1 or 3")
    qts = [_scale_qt(QT_LUMA, quality), _scale_qt(QT_CHROMA, quality)]

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0

    def dqt(tq, q):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q[ZIGZAG]
        return (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq])
                + zz.tobytes())
    out += dqt(0, qts[0])
    if channels == 3:
        out += dqt(1, qts[1])

    ncomp = channels
    if channels == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "444" or channels == 1:
        samp = [(1, 1)] * ncomp
    else:
        raise ValueError("encode_jpeg: subsampling must be '444' or '420'")
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1],
                      0 if i == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, bits, vals):
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    bw = _BitWriter()
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, p in enumerate(planes):
        # full-res edge-replicate pad to the MCU grid...
        pp = np.empty((mcuy * vmax * 8, mcux * hmax * 8), dtype=np.float64)
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1:width]
        hs, vs = samp[ci]
        fx, fy = hmax // hs, vmax // vs
        if fx > 1 or fy > 1:
            # ...then average-pool to the component's sampling grid
            hh, ww = pp.shape[0] // fy, pp.shape[1] // fx
            pp = pp.reshape(hh, fy, ww, fx).mean(axis=(1, 3))
        padded.append(pp)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
                mcu_count = 0
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qts[t], enc_dc[t], enc_ac[t],
                            pred[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
