"""Pure numpy+stdlib baseline JPEG codec (ITU-T T.81 / JFIF).

Superset scope — the reference pipeline has no media surface at all;
this closes the last native-decode gap in operators/multimodal.py
(PPM/BMP/PNG already decode with zero codec dependencies, JPEG used to
gate on a PIL import this container doesn't ship).

Decoder: baseline sequential (SOF0), 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 sampling, byte-stuffed entropy stream, restart
intervals (DRI/RSTn). Progressive (SOF2), arithmetic coding and 12-bit
precision raise ValueError so callers fall through to the
byte-histogram path, same contract as decode_png.

Encoder: exists to make the decoder testable without any codec library
(and to exercise the 4:2:0 MCU interleave + restart paths end-to-end);
standard Annex K quant tables scaled by the usual IJG quality curve and
Annex K.3 typical huffman tables. encode->decode is lossy but bounded:
tests assert exactness on solid colors and small mean error on
gradients/noise at high quality.

Scale shape: like the PNG path, rows decode independently inside
mapInPandas Arrow batches; the per-bit python entropy decode is capped
by max_pixels (default 1 MP) so one oversized blob degrades to the
byte path instead of stalling a task.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# ITU-T T.81 Annex K.1 luminance / chrominance quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 "typical" huffman tables: (bits-per-length[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# orthonormal 8-point DCT-II basis; forward = M @ X @ M.T, inverse =
# M.T @ X @ M (float64 — the spec's IDCT accuracy bounds are far looser)
_C = np.cos(np.pi * (2 * np.arange(8)[None, :] + 1)
            * np.arange(8)[:, None] / 16)
_DCT_M = _C * np.where(np.arange(8) == 0, np.sqrt(1 / 8),
                       np.sqrt(2 / 8))[:, None]


def _huff_encode_table(bits, values):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.n += size
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing (T.81 F.1.2.3)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category (SSSS) + appended bits for value v."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode a (h, w[, c]) uint8 array as baseline JFIF.

    Grayscale (2-D / c=1) emits one component; RGB emits YCbCr at
    4:4:4, or 4:2:0 (2x2-mean chroma) when `subsample`. A nonzero
    `restart_interval` emits DRI + RSTn markers every that many MCUs
    (resettable entropy stream — what makes parallel/robust decode
    possible in real pipelines, and what tests the decoder's RST path).
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            def down2(p):
                pp = np.pad(p, ((0, p.shape[0] & 1), (0, p.shape[1] & 1)),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4
            planes = [y, down2(cb), down2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    # IJG quality -> quant-table scaling curve
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality

    def q(tab):
        return np.clip(np.floor((tab * scale + 50) / 100),
                       1, 255).astype(np.int32)

    qts = [q(QT_LUMA), q(QT_CHROMA)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for (hi, vi), p in zip(samps, planes):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]),
                                 (0, tw - p.shape[1])), mode="edge"))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid in range(1 if nc == 1 else 2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(qts[tid][z]) for z in ZIGZAG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * len(planes)) \
        + b"\x08" + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (hi, vi) in enumerate(samps):
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    hts = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if nc == 3:
        hts += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tc]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(planes)) \
        + bytes([len(planes)])
    for ci in range(len(planes)):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    enc_dc = [_huff_encode_table(*DC_LUMA), _huff_encode_table(*DC_CHROMA)]
    enc_ac = [_huff_encode_table(*AC_LUMA), _huff_encode_table(*AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * len(planes)

    def emit_block(block, tid, ci):
        coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
        zz = np.round(coef.flatten()[ZIGZAG] / qts[tid][ZIGZAG]
                      ).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, bits = _mag_bits(diff)
        c, ln = enc_dc[tid][size]
        bw.write(c, ln)
        if size:
            bw.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = enc_ac[tid][0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size, bits = _mag_bits(v)
            c, ln = enc_ac[tid][(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            run = 0
        if run:
            c, ln = enc_ac[tid][0x00]  # EOB
            bw.write(c, ln)

    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred[:] = [0] * len(planes)
            for ci, ((hi, vi), p) in enumerate(zip(samps, padded)):
                for v in range(vi):
                    for hh in range(hi):
                        py, px = (my * vi + v) * 8, (mx * hi + hh) * 8
                        emit_block(p[py:py + 8, px:px + 8],
                                   0 if ci == 0 else 1, ci)
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy segment, un-stuffing
    0xFF00 and refusing to read through real markers."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    # a lone 0xFF at end-of-data has no stuffing byte;
                    # defaulting one in would fabricate entropy data and
                    # let a truncated stream "decode" to a corrupt image
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"marker 0xff{nxt:02x} inside entropy data")
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def sync_restart(self) -> None:
        """Discard pad bits, consume the next RSTn marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF \
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _huff_read(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid JPEG huffman code")


def _upsample_nn(pl: np.ndarray, hi: int, vi: int, hmax: int, vmax: int,
                 h: int, w: int) -> np.ndarray:
    """Upsample one component plane to full (h, w) resolution by
    nearest neighbor via an index map: full-res row y reads component
    row floor(y*vi/vmax). An integer repeat factor (vmax//vi) only
    works for divisor ratios — for legal non-divisor ones (e.g. luma
    hi=3 x chroma hi=2) it truncates to 1 and silently misaligns
    chroma, so the map is used whenever sampling differs."""
    if vi == vmax and hi == hmax:
        return pl[:h, :w]
    ph, pw = pl.shape
    yi = np.minimum(np.arange(h) * vi // vmax, ph - 1)
    xi = np.minimum(np.arange(w) * hi // hmax, pw - 1)
    return pl[yi][:, xi]


def decode_jpeg(content: bytes, max_pixels: int = 1 << 20) -> np.ndarray:
    """Decode baseline sequential JFIF bytes -> (h, w, 3) uint8.

    Grayscale expands to 3 channels; YCbCr converts per JFIF with
    chroma planes nearest-neighbor upsampled from any hi/vi sampling
    (4:4:4, 4:2:2, 4:2:0). Raises ValueError on progressive/arithmetic/
    12-bit streams, corrupt entropy data, or images over `max_pixels`
    — callers treat that as "fall back to the byte path", same as
    decode_png.
    """
    try:
        return _decode_jpeg_impl(content, max_pixels)
    except (struct.error, IndexError) as exc:
        # truncated segment bodies surface from unpack_from / byte
        # indexing as struct.error/IndexError; the documented contract
        # is ValueError so callers can degrade to the byte path
        raise ValueError(f"truncated JPEG segment: {exc}") from exc


def _decode_jpeg_impl(content: bytes, max_pixels: int) -> np.ndarray:
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a
            # marker; consume one and re-examine, else the fill byte
            # would be parsed as a marker with a bogus segment length
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9 or pos + 4 > len(content):
            break
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        seg = content[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                if sp + 65 > len(seg):
                    raise ValueError("truncated JPEG DQT segment")
                tab = np.zeros(64, np.int32)
                tab[ZIGZAG] = np.frombuffer(seg[sp + 1:sp + 65], np.uint8)
                qts[tq] = tab
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                if len(bits) < 16 or sp + 17 + nv > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                tab = _huff_decode_table(bits,
                                         list(seg[sp + 17:sp + 17 + nv]))
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                sp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline sequential
            prec = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            if h * w > max_pixels:
                raise ValueError(
                    f"JPEG {w}x{h} exceeds the {max_pixels}-pixel "
                    "decode cap for the pure-python entropy path")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "hi": samp >> 4,
                              "vi": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tabs >> 4, tabs & 0xF)
            scan = (sel, pos + 2 + seg_len)
            break
        pos += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("missing JPEG SOF0/SOS segment")
    sel, data_start = scan
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    # validate header cross-references up front so malformed-but-
    # realistic streams (MJPEG frames shipped without DHT, zero
    # sampling factors, scan ids not in the frame) surface as the
    # contract's ValueError, not KeyError/ZeroDivisionError that would
    # crash a mapInPandas task instead of degrading to the byte path
    for c in comps:
        if not (1 <= c["hi"] <= 4 and 1 <= c["vi"] <= 4):
            raise ValueError("bad JPEG sampling factors")
        if c["tq"] not in qts:
            raise ValueError("JPEG quant table missing")
        if c["id"] not in sel:
            raise ValueError("JPEG scan omits a frame component")
        dct, act = sel[c["id"]]
        if dct not in dc_tabs or act not in ac_tabs:
            raise ValueError("JPEG huffman table missing (MJPEG-style "
                             "tableless stream unsupported)")
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["vi"] * 8, mcux * c["hi"] * 8))
              for c in comps]
    br = _BitReader(content[data_start:])
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                qt = qts[c["tq"]]
                for v in range(c["vi"]):
                    for hh in range(c["hi"]):
                        zz = np.zeros(64, np.int64)
                        s = _huff_read(br, dc_tabs[dct])
                        pred[c["id"]] += _receive_extend(br, s)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, ac_tabs[act])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: skip 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _receive_extend(br, s)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz * qt[ZIGZAG]
                        blk = (_DCT_M.T @ coef.reshape(8, 8) @ _DCT_M
                               + 128.0)
                        py = (my * c["vi"] + v) * 8
                        px = (mx * c["hi"] + hh) * 8
                        planes[ci][py:py + 8, px:px + 8] = blk
            mcu_count += 1
    out_planes = [_upsample_nn(pl, c["hi"], c["vi"], hmax, vmax, h, w)
                  for c, pl in zip(comps, planes)]
    if len(comps) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    rgb = np.stack([y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128)], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
