"""Pure-stdlib baseline JPEG codec (numpy DCT + Huffman).

Decoder: baseline sequential DCT (SOF0) — DQT/DHT/SOF0/DRI/SOS markers,
per-MCU Huffman entropy decode with byte unstuffing and restart markers,
dequantize → inverse zigzag → 2-D IDCT (orthonormal DCT-II matrix),
chroma upsampling for 4:2:0/4:2:2/4:4:4, JFIF YCbCr→RGB.  Progressive
(SOF2) and arithmetic coding are rejected with ValueError (the stages'
error column captures them).

Encoder: baseline 4:4:4 or 4:2:0, ITU-T T.81 Annex K quantization
tables scaled by a libjpeg-style quality factor and the Annex K typical
Huffman tables — so encoder output is a strictly standard stream any
JPEG decoder reads.

Quality note: JPEG is lossy; tests assert decode-exactness on DC-only
content and PSNR bounds on natural content (see tests/test_codecs.py),
not bit-identity.
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
], dtype=np.int32)

# ITU-T T.81 Annex K.1 quantization tables (luminance, chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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

# orthonormal DCT-II basis: block_dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (jcparam.c jpeg_quality_scaling)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


# ---------------------------------------------------------------- decode

class _HuffTable:
    __slots__ = ("lookup",)

    def __init__(self, bits, huffval):
        # (length, code) → symbol
        self.lookup = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if \
                    self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via align_restart
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # real marker terminates the segment; pad with zeros
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # mask consumed high bits or the bigint grows with the stream
        # and every shift becomes O(stream) (review r3)
        self.acc &= (1 << self.nbits) - 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Skip to just after the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: missing restart marker")

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, n: int) -> int:
    """EXTEND (T.81 F.2.2.1): map magnitude bits to signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated).
    Corrupt streams always raise ValueError (the stages' error-column
    contract): structural exceptions are normalized here."""
    try:
        return _jpeg_decode_impl(data)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(
            f"JPEG: corrupt stream ({type(exc).__name__})") from exc


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad signature")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    qt = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    qt = np.frombuffer(seg, np.uint8, 64,
                                       p).astype(np.int32)
                    p += 64
                qts[tq] = qt
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17:p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = \
                    _HuffTable(bits, huffval)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if not (0 < h <= 16384 and 0 < w <= 16384) or \
                    not 1 <= nc <= 4:
                raise ValueError("JPEG: unreasonable frame header")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("JPEG: bad sampling factors")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only baseline (SOF0/1) supported")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # spec-legal non-interleaved scans (one per component)
                # would silently mis-decode under interleaved MCU
                # geometry — reject like SOF2 (review r3)
                raise ValueError("JPEG: non-interleaved scans "
                                 "unsupported")
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next((c for c in frame["comps"]
                             if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("JPEG: scan references unknown "
                                     "component")
                scan.append({"comp": comp, "dc": tdta >> 4,
                             "ac": tdta & 15})
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qts, dc_tables,
                                ac_tables, restart_interval)
        pos += seglen
    raise ValueError("JPEG: no scan data")


def _decode_scan(data, pos, frame, scan, qts, dc_tables, ac_tables,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                                np.float64) for c in comps}
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    idct_t = _D.T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for s in scan:
                c = s["comp"]
                qt = qts[c["tq"]]
                dct_tbl = dc_tables[s["dc"]]
                act_tbl = ac_tables[s["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        t = br.decode_huff(dct_tbl)
                        diff = _extend(br.receive(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(act_tbl)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[ZIGZAG] = zz * qt
                        px = idct_t @ block.reshape(8, 8) @ _D
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px + 128
    # upsample + color convert
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out_planes[0], out_planes[1] - 128, out_planes[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.acc &= (1 << self.nbits) - 1  # keep the bigint small
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _enc_table(bits, huffval):
    """symbol → (code, length)"""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int):
    a = abs(v)
    n = a.bit_length()
    bits = v if v >= 0 else v + (1 << n) - 1
    return n, bits & ((1 << n) - 1)


def jpeg_encode(px: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JFIF bytes (4:4:4 default,
    4:2:0 with ``subsample=True``)."""
    px = np.asarray(px, np.uint8)
    gray = px.ndim == 2
    if gray:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    rgb = px.astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
         + 0.114 * rgb[:, :, 2])
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2] + 128

    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)

    if subsample:
        # average 2x2 → 4:2:0
        he = h + (h & 1)
        we = w + (w & 1)

        def pad_even(p):
            q = np.empty((he, we))
            q[:h, :w] = p
            if he > h:
                q[h:, :w] = p[h - 1:, :]
            if we > w:
                q[:, w:] = q[:, w - 1:w]
            return q

        cb = pad_even(cb).reshape(he // 2, 2, we // 2, 2).mean((1, 3))
        cr = pad_even(cr).reshape(he // 2, 2, we // 2, 2).mean((1, 3))
        samp = ((2, 2), (1, 1), (1, 1))
    else:
        samp = ((1, 1), (1, 1), (1, 1))

    enc_dc = (_enc_table(*DC_LUM), _enc_table(*DC_CHROM))
    enc_ac = (_enc_table(*AC_LUM), _enc_table(*AC_CHROM))

    bw = _BitWriter()

    def write_block(zz, tdc, tac, pred):
        n, bits = _magnitude(int(zz[0]) - pred)
        code, ln = enc_dc[tdc][n]
        bw.write(code, ln)
        if n:
            bw.write(bits, n)
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[tac][0xF0]
                bw.write(code, ln)
                run -= 16
            n, bits = _magnitude(v)
            code, ln = enc_ac[tac][(run << 4) | n]
            bw.write(code, ln)
            bw.write(bits, n)
            run = 0
        if last_nz < 63:
            code, ln = enc_ac[tac][0x00]
            bw.write(code, ln)
        return int(zz[0])

    planes = (y, cb, cr)
    qts = (qt_l, qt_c, qt_c)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                ch, cv = samp[ci]
                qt = qts[ci]
                for by in range(cv):
                    for bx in range(ch):
                        plane = planes[ci]
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = np.zeros((8, 8))
                        ph, pw = plane.shape
                        ys = max(0, min(8, ph - y0))
                        xs = max(0, min(8, pw - x0))
                        if ys > 0 and xs > 0:
                            blk[:ys, :xs] = plane[y0:y0 + ys, x0:x0 + xs]
                            if ys < 8:
                                blk[ys:, :] = blk[ys - 1, :]
                            if xs < 8:
                                blk[:, xs:] = blk[:, xs - 1][:, None]
                        coef = _D @ (blk - 128.0) @ _D.T
                        q = np.round(coef / qt.reshape(8, 8))
                        zz = q.reshape(-1)[ZIGZAG]
                        preds[ci] = write_block(
                            zz.astype(np.int32), 0 if ci == 0 else 1,
                            0 if ci == 0 else 1, preds[ci])
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" + \
        b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + \
            bytes(int(qt.reshape(-1)[z]) for z in ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for i, (cid, (ch, cv), tq) in enumerate(
            zip((1, 2, 3), samp, (0, 1, 1))):
        out += bytes([cid, (ch << 4) | cv, tq])
    for tc, th, (bits, huffval) in ((0, 0, DC_LUM), (0, 1, DC_CHROM),
                                    (1, 0, AC_LUM), (1, 1, AC_CHROM)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(huffval), (tc << 4) | th) + \
            bytes(bits) + bytes(huffval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, t in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, t])
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
