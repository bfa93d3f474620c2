"""Pure in-container baseline JPEG codec (grayscale, sequential DCT)
— extends the engine's real-codec multimodal path (BMP, PNG, WAV in
`ext/multimodal.py`) to the lossy family without Pillow.

Implements the subset of ITU-T T.81 a single-component baseline file
needs (plus 4:2:0 color and SOF2 spectral-selection progressive): 8x8 forward/inverse DCT (numpy matrix form), the Annex K.1
luminance quantization table with IJG quality scaling, zigzag, DC
prediction, the Annex K.3 standard Huffman tables, 0xFF byte
stuffing, and the SOI/DQT/SOF0/DHT/SOS/EOI marker skeleton. All
tables are published spec constants.

The codec is deterministic (same pixels -> same bytes -> same decoded
pixels), which is what makes a LOSSY format gradeable: exactness is
gone by design, so queries grade the round-trip with bounded-error
checks (mean/max reconstruction error) plus exact structural facts
(dimensions, pixel counts) — the same pattern the ANN recall gates
use for approximate answers.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (zigzag order NOT applied —
# this is row-major natural order).
_QUANT_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# zigzag index order (position k of the scan -> (row, col))
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K.3 standard luminance Huffman tables: (bits[1..16], huffval)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Annex K.2 chrominance quantization table and the K.3 standard
# CHROMINANCE Huffman tables (DC table K.4 / AC table K.6) — the
# second table set a 3-component 4:2:0 scan declares alongside the
# luminance set above.
_QUANT_BASE_C = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ]
)
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_encode_table(bits, vals):
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(code, length) -> symbol."""
    enc = _huff_encode_table(bits, vals)
    return {(c, ln): sym for sym, (c, ln) in enc.items()}


_DC_ENC = _huff_encode_table(_DC_BITS, _DC_VALS)
_AC_ENC = _huff_encode_table(_AC_BITS, _AC_VALS)
_DC_DEC = _huff_decode_table(_DC_BITS, _DC_VALS)
_AC_DEC = _huff_decode_table(_AC_BITS, _AC_VALS)
_DC_ENC_C = _huff_encode_table(_DC_BITS_C, _DC_VALS_C)
_AC_ENC_C = _huff_encode_table(_AC_BITS_C, _AC_VALS_C)
_DC_DEC_C = _huff_decode_table(_DC_BITS_C, _DC_VALS_C)
_AC_DEC_C = _huff_decode_table(_AC_BITS_C, _AC_VALS_C)

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quant_table(quality: int, base: np.ndarray | None = None) -> np.ndarray:
    """IJG quality scaling of an Annex K table (1..100); defaults to
    the K.1 luminance table, pass ``_QUANT_BASE_C`` for chroma."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = ((_QUANT_BASE if base is None else base) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1 (one's complement for
    negatives)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_gray(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 75,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``width*height`` 8-bit grayscale pixels as a baseline
    sequential JPEG. ``restart_interval`` > 0 emits a DRI segment and
    an RST0..RST7 marker after every that-many MCUs (byte-aligned,
    DC predictor reset) — the resync points hardware and parallel
    decoders use to recover mid-scan."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    qt = _quant_table(quality)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    padded = np.pad(
        img, ((0, bh - height), (0, bw - width)), mode="edge"
    ).astype(np.float64) - 128.0

    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # restart: 1-pad to byte boundary, raw marker (markers
                # are never byte-stuffed), reset the DC predictor
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8]
            coef = _DCT @ block @ _DCT.T
            qz = np.round(coef / qt).astype(np.int64)
            zz = [int(qz[r, c]) for (r, c) in _ZIGZAG]
            # DC
            cat, bits = _magnitude(zz[0] - prev_dc)
            prev_dc = zz[0]
            code, ln = _DC_ENC[cat]
            w.write(code, ln)
            if cat:
                w.write(bits, cat)
            # AC with run-length + EOB/ZRL
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                cat, bits = _magnitude(v)
                code, ln = _AC_ENC[(run << 4) | cat]
                w.write(code, ln)
                w.write(bits, cat)
                run = 0
            if run:
                code, ln = _AC_ENC[0x00]  # EOB
                w.write(code, ln)
    w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])
    dqt = seg(0xDB, b"\x00" + zz_q)
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)) + seg(
        0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri + dht + sos + bytes(w.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            # stuffed zero follows a literal FF in entropy data
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> int:
        """Byte-align (drop the 1-fill pad bits), consume an RSTn
        marker, return n. The scan loop calls this exactly where the
        declared restart interval puts a marker, so inside entropy
        data 0xFF is still always a stuffed FF00."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker at restart boundary")
        n = self.data[self.pos + 1] - 0xD0
        self.pos += 2
        return n


def _huff_read(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("invalid huffman stream")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits >> (cat - 1):
        return bits
    return bits - (1 << cat) + 1


def decode_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a single-component baseline JPEG — streams from
    :func:`encode_gray`, or foreign files of the same shape (single
    component, baseline DCT, DQT/DHT tables in-stream). Restart
    intervals are supported: a DRI segment makes the entropy decoder
    byte-align and consume an RST0..RST7 marker after every declared
    count of MCUs, verifying the 0..7 sequence and resetting the DC
    predictor. Progressive/multi-component files are rejected by
    their SOF. Returns (width, height, pixels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = None
    width = height = None
    dc_dec, ac_dec = _DC_DEC, _AC_DEC
    scan_start = None
    interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            if len(body) < 65:
                raise ValueError("truncated DQT segment")
            if body[0] >> 4 != 0:
                raise ValueError(
                    "baseline JPEG requires 8-bit (Pq=0) quantization "
                    "tables"
                )
            if body[0] & 0x0F == 0:
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = body[1 + k]
                qt = t
        elif marker == 0xC0:
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only single-component baseline supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "only baseline DCT (SOF0) is supported, got "
                f"SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                table = _huff_decode_table(bits, vals)
                if tc_th >> 4 == 0:
                    dc_dec = table
                else:
                    ac_dec = table
                i += 17 + nvals
        elif marker == 0xDA:
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if qt is None or width is None or scan_start is None:
        raise ValueError("incomplete JPEG stream")

    reader = _BitReader(payload[scan_start : len(payload) - 2])
    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    out = np.zeros((bh, bw), dtype=np.float64)
    prev_dc = 0
    mcu = 0
    expected_rst = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            if interval and mcu and mcu % interval == 0:
                n = reader.sync_restart()
                if n != expected_rst:
                    raise ValueError(
                        f"restart marker out of sequence: got RST{n}, "
                        f"expected RST{expected_rst}"
                    )
                expected_rst = (expected_rst + 1) % 8
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            cat = _huff_read(reader, dc_dec)
            diff = _extend(reader.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_read(reader, ac_dec)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, cat = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(reader.read_bits(cat), cat)
                k += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for k2, (r, c) in enumerate(_ZIGZAG):
                coef[r, c] = zz[k2] * qt[r, c]
            out[by : by + 8, bx : bx + 8] = _DCT.T @ coef @ _DCT
    pix = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return width, height, pix[:height, :width].tobytes()


def _emit_block(w, block, qt, dc_enc, ac_enc, prev_dc):
    """Quantize + zigzag + entropy-code one 8x8 block (the shared
    kernel of the gray and 4:2:0 color scan loops); returns the new
    DC predictor for this block's component."""
    coef = _DCT @ block @ _DCT.T
    qz = np.round(coef / qt).astype(np.int64)
    zz = [int(qz[r, c]) for (r, c) in _ZIGZAG]
    cat, bits = _magnitude(zz[0] - prev_dc)
    code, ln = dc_enc[cat]
    w.write(code, ln)
    if cat:
        w.write(bits, cat)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_enc[(run << 4) | cat]
        w.write(code, ln)
        w.write(bits, cat)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
    return zz[0]


def _read_block(reader, dc_dec, ac_dec, qt, prev_dc):
    """Entropy-decode + dequantize + inverse-DCT one 8x8 block;
    returns (spatial block, new DC predictor)."""
    zz = [0] * 64
    cat = _huff_read(reader, dc_dec)
    diff = _extend(reader.read_bits(cat), cat) if cat else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _huff_read(reader, ac_dec)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, cat = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(reader.read_bits(cat), cat)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    for k2, (r, c) in enumerate(_ZIGZAG):
        coef[r, c] = zz[k2] * qt[r, c]
    return _DCT.T @ coef @ _DCT, dc


def _seg(marker: int, payload: bytes) -> bytes:
    return (
        bytes([0xFF, marker])
        + struct.pack(">H", len(payload) + 2)
        + payload
    )


def encode_color(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 75,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``width*height`` interleaved 8-bit RGB pixels as a
    baseline 4:2:0 (2x2-subsampled chroma) YCbCr JPEG — the framing
    virtually every camera/web JPEG uses. BT.601 full-range color
    transform, box-averaged chroma subsampling, the Annex K.2 chroma
    quantization table under the same IJG quality scaling, the K.3
    standard chrominance Huffman set, and interleaved 16x16 MCUs
    (4 Y blocks + Cb + Cr) with one DC predictor per component.
    ``restart_interval`` > 0 emits a DRI segment and an RST0..RST7
    marker after every that-many MCUs (byte-aligned, all three DC
    predictors reset), as in :func:`encode_gray`."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    img = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    mh = (height + 15) // 16 * 16
    mw = (width + 15) // 16 * 16

    def pad(p):
        return np.pad(
            p, ((0, mh - height), (0, mw - width)), mode="edge"
        )

    y = pad(y) - 128.0
    # 4:2:0: box-average each 2x2 chroma neighborhood (matches the
    # replicate upsampling in decode_color)
    cbs = pad(cb).reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)) - 128.0
    crs = pad(cr).reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)) - 128.0

    qy = _quant_table(quality)
    qc = _quant_table(quality, _QUANT_BASE_C)
    w = _BitWriter()
    dcs = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(0, mh, 16):
        for mx in range(0, mw, 16):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # restart: 1-pad to byte boundary, raw marker (markers
                # are never byte-stuffed), reset ALL DC predictors
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dcs = [0, 0, 0]
            mcu += 1
            for sy in (0, 8):
                for sx in (0, 8):
                    blk = y[my + sy : my + sy + 8, mx + sx : mx + sx + 8]
                    dcs[0] = _emit_block(w, blk, qy, _DC_ENC, _AC_ENC, dcs[0])
            cy, cx = my // 2, mx // 2
            dcs[1] = _emit_block(
                w, cbs[cy : cy + 8, cx : cx + 8], qc, _DC_ENC_C, _AC_ENC_C, dcs[1]
            )
            dcs[2] = _emit_block(
                w, crs[cy : cy + 8, cx : cx + 8], qc, _DC_ENC_C, _AC_ENC_C, dcs[2]
            )
    w.flush()

    def zz_of(qt):
        return bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])

    dqt = _seg(0xDB, b"\x00" + zz_of(qy)) + _seg(0xDB, b"\x01" + zz_of(qc))
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = (
        _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
        + _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
        + _seg(0xC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
        + _seg(0xC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri + dht + sos + bytes(w.out) + b"\xff\xd9"
    )


def decode_color(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline 4:2:0 three-component YCbCr JPEG (streams
    from :func:`encode_color`, or foreign files of the same shape) to
    (width, height, interleaved top-down RGB bytes). Chroma upsamples
    by 2x2 replication (the box-average inverse). Restart intervals
    are supported as in :func:`decode_gray` (DRI + RSTn sequence
    check, all DC predictors reset); components resolve by SOF
    position, so foreign id schemes (0/1/2, ...) decode correctly;
    other sampling grids, 16-bit quant tables, and progressive scans
    are rejected loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comp_qt: dict[int, int] = {}
    comp_tables: dict[int, tuple[int, int]] = {}
    sof_ids: list[int] | None = None
    sos_ids: list[int] = []
    interval = 0
    scan_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                if body[i] >> 4 != 0:
                    # a 16-bit (Pq=1) table is 129 bytes, not 65 —
                    # parsing it as 8-bit would corrupt both the
                    # values and the offset of any following table
                    raise ValueError(
                        "baseline JPEG requires 8-bit (Pq=0) "
                        "quantization tables"
                    )
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                tid = body[i] & 0x0F
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = body[i + 1 + k]
                qts[tid] = t
                i += 65
        elif marker == 0xC0:
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 3:
                raise ValueError("decode_color handles 3-component scans"
                                 " (use decode_gray for 1)")
            samp = []
            sof_ids = []
            for ci in range(3):
                cid, sf, tq = body[6 + 3 * ci : 9 + 3 * ci]
                samp.append(sf)
                comp_qt[cid] = tq
                sof_ids.append(cid)
            if samp != [0x22, 0x11, 0x11]:
                raise ValueError("only 4:2:0 sampling is supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "only baseline DCT (SOF0) is supported, got "
                f"SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_table(
                    bits, vals
                )
                i += 17 + nvals
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise ValueError("expected a 3-component scan")
            for ci in range(3):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                comp_tables[cid] = (tabs >> 4, tabs & 0x0F)
                sos_ids.append(cid)
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if not qts or width is None or scan_start is None or sof_ids is None:
        raise ValueError("incomplete JPEG stream")
    # components are resolved by SOF POSITION, not by hard-coded ids:
    # the 0x22-sampled (first) SOF component is luma; the interleaved
    # scan must list the same components with luma first (T.81 B.2.3
    # orders scan components as in the frame header)
    if sos_ids != sof_ids:
        raise ValueError(
            f"SOS component order {sos_ids} does not match SOF order "
            f"{sof_ids} (interleaved baseline requires frame order)"
        )
    cid_y, cid_cb, cid_cr = sof_ids

    reader = _BitReader(payload[scan_start : len(payload) - 2])
    mh = (height + 15) // 16 * 16
    mw = (width + 15) // 16 * 16
    y = np.zeros((mh, mw), dtype=np.float64)
    cbs = np.zeros((mh // 2, mw // 2), dtype=np.float64)
    crs = np.zeros((mh // 2, mw // 2), dtype=np.float64)
    dcs = {cid: 0 for cid in sof_ids}
    mcu = 0
    expected_rst = 0
    for my in range(0, mh, 16):
        for mx in range(0, mw, 16):
            if interval and mcu and mcu % interval == 0:
                n = reader.sync_restart()
                if n != expected_rst:
                    raise ValueError(
                        f"restart marker out of sequence: got RST{n}, "
                        f"expected RST{expected_rst}"
                    )
                expected_rst = (expected_rst + 1) % 8
                for cid in dcs:
                    dcs[cid] = 0
            mcu += 1
            for sy in (0, 8):
                for sx in (0, 8):
                    blk, dcs[cid_y] = _read_block(
                        reader,
                        huff[(0, comp_tables[cid_y][0])],
                        huff[(1, comp_tables[cid_y][1])],
                        qts[comp_qt[cid_y]],
                        dcs[cid_y],
                    )
                    y[my + sy : my + sy + 8, mx + sx : mx + sx + 8] = blk
            cy, cx = my // 2, mx // 2
            blk, dcs[cid_cb] = _read_block(
                reader,
                huff[(0, comp_tables[cid_cb][0])],
                huff[(1, comp_tables[cid_cb][1])],
                qts[comp_qt[cid_cb]],
                dcs[cid_cb],
            )
            cbs[cy : cy + 8, cx : cx + 8] = blk
            blk, dcs[cid_cr] = _read_block(
                reader,
                huff[(0, comp_tables[cid_cr][0])],
                huff[(1, comp_tables[cid_cr][1])],
                qts[comp_qt[cid_cr]],
                dcs[cid_cr],
            )
            crs[cy : cy + 8, cx : cx + 8] = blk

    yy = y + 128.0
    cb = np.repeat(np.repeat(cbs, 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(crs, 2, axis=0), 2, axis=1)
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack(
        [
            np.clip(np.round(ch), 0, 255).astype(np.uint8)
            for ch in (r, g, b)
        ],
        axis=-1,
    )
    return width, height, rgb[:height, :width].tobytes()


def text_jpeg_roundtrip(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 48,
    quality: int = 75,
):
    """Arrow-batched round-trip through the REAL codec: each
    document's UTF-8 bytes tile a ``side`` x ``side`` grayscale image
    (text bytes are high-frequency content — the hard case for a DCT
    codec), which is encoded and decoded in the same task; emits the
    reconstruction-error facts a lossy codec CAN be graded on —
    exact pixel count, bounded mean/max error, and compression
    actually happening. A broken DCT, Huffman table, zigzag, or
    byte-stuffing path fails the bounds immediately (garbage decode
    has mean error ~80 on this content)."""
    from pyspark.sql import functions as F  # noqa: F401

    n_px = side * side

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or " ").encode("utf-8")
                reps = n_px // len(b) + 1
                pix = (b * reps)[:n_px]
                enc = encode_gray(side, side, pix, quality=quality)
                w, h, dec = decode_gray(enc)
                a = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
                c = np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                err = np.abs(a - c)
                out.append(
                    (
                        did,
                        w * h,
                        float(err.mean()),
                        int(err.max()),
                        len(enc),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "n_pixels", "mean_err", "max_err", "n_bytes"],
            )

    schema = (
        f"{id_col} long, n_pixels long, mean_err double, "
        "max_err int, n_bytes int"
    )
    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def text_jpeg_color_roundtrip(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 48,
    quality: int = 75,
):
    """Arrow-batched round-trip through the 4:2:0 COLOR codec: each
    document's UTF-8 bytes tile a ``side`` x ``side`` interleaved-RGB
    image (three consecutive bytes per pixel — high-frequency content
    in all three channels, the hard case for subsampled chroma),
    encoded and decoded in one task. Emits the same gradeable facts
    as :func:`text_jpeg_roundtrip` — exact pixel count, bounded
    mean/max reconstruction error over all three channels, real
    compression — and a broken color transform, chroma table, or MCU
    interleave fails the bounds immediately."""
    n_px = side * side

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or " ").encode("utf-8")
                reps = (n_px * 3) // len(b) + 1
                rgb = (b * reps)[: n_px * 3]
                enc = encode_color(side, side, rgb, quality=quality)
                w, h, dec = decode_color(enc)
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                c = np.frombuffer(dec, dtype=np.uint8).astype(np.int64)
                err = np.abs(a - c)
                out.append(
                    (
                        did,
                        w * h,
                        float(err.mean()),
                        int(err.max()),
                        len(enc),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_pixels", "mean_err", "max_err", "n_bytes",
                ],
            )

    schema = (
        f"{id_col} long, n_pixels long, mean_err double, "
        "max_err int, n_bytes int"
    )
    return df.select(id_col, text_col).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# Progressive (SOF2) grayscale: spectral selection
# ---------------------------------------------------------------------------


def _quantized_blocks(width, height, pixels, quality):
    """Shared with the baseline path: pad to 8x8 blocks, DCT,
    quantize, zigzag — returns (list of 64-coefficient lists in
    raster block order, quant table, padded dims)."""
    qt = _quant_table(quality)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    padded = np.pad(
        img, ((0, bh - height), (0, bw - width)), mode="edge"
    ).astype(np.float64) - 128.0
    zzs = []
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            coef = _DCT @ padded[by : by + 8, bx : bx + 8] @ _DCT.T
            qz = np.round(coef / qt).astype(np.int64)
            zzs.append([int(qz[r, c]) for (r, c) in _ZIGZAG])
    return zzs, qt, bh, bw


def encode_gray_progressive(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 75,
    bands: tuple = ((1, 5), (6, 63)),
    restart_interval: int = 0,
    dc_levels: int = 0,
    ac_levels: int = 0,
) -> bytes:
    """Encode as a SOF2 PROGRESSIVE grayscale JPEG using spectral
    selection: one DC scan (Ss=Se=0) followed by one AC scan per
    entry of ``bands`` — the multi-pass framing web browsers render
    coarse-to-fine. With ``dc_levels``/``ac_levels`` > 0, SUCCESSIVE
    APPROXIMATION is added (T.81 G.1.2): first scans carry the
    point-transformed coefficients (DC: arithmetic ``>> Al``; AC:
    sign-magnitude ``|v| >> Al``) and one refinement scan per level
    restores the next lower bit (DC: one raw bit per block; AC: the
    G.1.2.3 correction-bit coding). Defaults (0, 0) emit Ah=Al=0
    scans byte-identical to the pre-SA encoder.

    ``bands`` must tile 1..63 contiguously: the quantized
    coefficients are then IDENTICAL to :func:`encode_gray`'s at the
    same quality, so the progressive decode is BIT-EXACT against the
    baseline round-trip — the grading contract of
    `z3_jpeg_progressive_roundtrip`. AC scans use the progressive
    EOB0 code (T.81 G.1.2.2: RRRRSSSS with SSSS=0 is an EOB RUN of
    2^RRRR blocks; the encoder emits run length 1, the decoder
    handles the general EOBn form).

    ``restart_interval`` > 0 emits a DRI segment and an RST0..RST7
    marker after every that-many blocks in EVERY scan (byte-aligned;
    the DC scan also resets its predictor, per T.81 E.1.2 the RST
    counter restarts at 0 in each scan) — the resync points parallel
    decoders use."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    prev_end = 0
    for ss, se in bands:
        if ss != prev_end + 1 or se < ss or se > 63:
            raise ValueError(
                "bands must tile 1..63 contiguously (bit-exact "
                f"contract); got {bands}"
            )
        prev_end = se
    if prev_end != 63:
        raise ValueError("bands must end at coefficient 63")

    zzs, qt, _bh, _bw = _quantized_blocks(width, height, pixels, quality)
    if dc_levels < 0 or ac_levels < 0 or dc_levels > 13 or ac_levels > 13:
        raise ValueError("successive-approximation levels out of range")

    # scan script: every (band, level) pair precedes its (band,
    # level-1) refinement, DC first precedes all AC scans (T.81 G.1)
    scans = [(0, 0, 0, dc_levels)]  # (ss, se, ah, al)
    for ss, se in bands:
        scans.append((ss, se, 0, ac_levels))
    for al in range(dc_levels - 1, -1, -1):
        scans.append((0, 0, al + 1, al))
    for al in range(ac_levels - 1, -1, -1):
        for ss, se in bands:
            scans.append((ss, se, al + 1, al))

    out = bytearray(b"\xff\xd8")
    zz_q = bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])
    out += _seg(0xDB, b"\x00" + zz_q)
    out += _seg(
        0xC2, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    for ss, se, ah, al in scans:
        if ss == 0:
            data = (
                _emit_dc_first(zzs, al, restart_interval)
                if ah == 0
                else _emit_dc_refine(zzs, al, restart_interval)
            )
        else:
            data = (
                _emit_ac_first(zzs, ss, se, al, restart_interval)
                if ah == 0
                else _emit_ac_refine(zzs, ss, se, al, restart_interval)
            )
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def _prog_restart(w, b, rst, restart_interval):
    """Restart boundary for progressive scan emitters: 1-pad to byte
    alignment, raw RSTn marker (markers are never byte-stuffed);
    numbering is mod 8 and starts at 0 within each scan (T.81 E.1.2).
    Returns (next_rst, hit) so the boundary condition lives in exactly
    one place — DC predictor resets and refinement EOB/bit flushes
    key off the hit flag and can never desync from the marker."""
    if restart_interval and b and b % restart_interval == 0:
        w.flush()
        w.out += bytes([0xFF, 0xD0 + rst])
        return (rst + 1) % 8, True
    return rst, False


def _emit_dc_first(zzs, al, restart_interval, dc_enc=_DC_ENC) -> bytes:
    """DC first scan (Ah=0): DPCM of the point-transformed DC
    (ARITHMETIC shift ``v >> al`` per T.81 A.4 — DC uses two's-
    complement shift, unlike AC's sign-magnitude divide), baseline DC
    Huffman, block raster order."""
    w = _BitWriter()
    prev = 0
    rst = 0
    for b, zz in enumerate(zzs):
        rst, hit = _prog_restart(w, b, rst, restart_interval)
        if hit:
            prev = 0  # restart resets the DC predictor
        v = zz[0] >> al
        cat, bits = _magnitude(v - prev)
        prev = v
        code, ln = dc_enc[cat]
        w.write(code, ln)
        if cat:
            w.write(bits, cat)
    w.flush()
    return bytes(w.out)


def _emit_dc_refine(zzs, al, restart_interval) -> bytes:
    """DC refinement scan (Ah=Al+1): no Huffman — one raw bit per
    block, bit ``al`` of the two's-complement DC value (the decoder
    ORs it in; T.81 G.1.2.1)."""
    w = _BitWriter()
    rst = 0
    for b, zz in enumerate(zzs):
        rst, _hit = _prog_restart(w, b, rst, restart_interval)
        w.write((zz[0] >> al) & 1, 1)
    w.flush()
    return bytes(w.out)


def _emit_ac_first(zzs, ss, se, al, restart_interval, ac_enc=_AC_ENC) -> bytes:
    """AC first scan for a band (Ah=0): spectral-selection coding of
    the point-transformed values ``sign(v) * (|v| >> al)`` (AC point
    transform is sign-magnitude per T.81 A.4, NOT arithmetic shift).
    EOB0 terminates a block whose band tail is all zero."""
    w = _BitWriter()
    rst = 0
    for b, zz in enumerate(zzs):
        rst, _hit = _prog_restart(w, b, rst, restart_interval)
        run = 0
        for k in range(ss, se + 1):
            v = zz[k]
            v = (abs(v) >> al) * (1 if v >= 0 else -1)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = ac_enc[(run << 4) | cat]
            w.write(code, ln)
            w.write(bits, cat)
            run = 0
        if run:
            code, ln = ac_enc[0x00]  # EOB0 (run of exactly 1)
            w.write(code, ln)
    w.flush()
    return bytes(w.out)


def _emit_ac_refine(zzs, ss, se, al, restart_interval, ac_enc=_AC_ENC) -> bytes:
    """AC refinement scan (Ah=Al+1), T.81 G.1.2.3: coefficients whose
    magnitude at the PREVIOUS precision was already nonzero
    (|v| >> al > 1) each contribute one correction bit (bit ``al`` of
    |v|), buffered and flushed after the next Huffman symbol; newly
    significant coefficients (|v| >> al == 1) are coded as RS=(r<<4)|1
    + a sign bit, where the run r counts only ZERO-history positions;
    EOB0 closes each block whose band tail holds no new significants
    (followed by that tail's buffered correction bits)."""
    w = _BitWriter()
    rst = 0
    for b, zz in enumerate(zzs):
        rst, _hit = _prog_restart(w, b, rst, restart_interval)
        run = 0
        pending: list[int] = []  # correction bits since last symbol
        for k in range(ss, se + 1):
            v = zz[k]
            a = abs(v) >> al
            if a == 0:
                run += 1
                continue
            # ZRLs settle at ANY nonzero (history included), so each
            # correction bit is flushed after the symbol whose run
            # actually crosses its coefficient — the decoder consumes
            # bits positionally during that symbol's walk, and a bit
            # flushed one symbol early would desync the Huffman read
            while run > 15:
                code, ln = ac_enc[0xF0]  # ZRL: 16 zero-HISTORY skips
                w.write(code, ln)
                for bit in pending:
                    w.write(bit, 1)
                pending = []
                run -= 16
            if a > 1:  # history coefficient: correction bit only
                pending.append(a & 1)
                continue
            # newly significant at this precision
            code, ln = ac_enc[(run << 4) | 1]
            w.write(code, ln)
            w.write(1 if v >= 0 else 0, 1)  # sign: 1 = positive
            for bit in pending:
                w.write(bit, 1)
            pending = []
            run = 0
        if run or pending:
            code, ln = ac_enc[0x00]  # EOB0
            w.write(code, ln)
            for bit in pending:
                w.write(bit, 1)
    w.flush()
    return bytes(w.out)


def _next_marker(payload: bytes, pos: int) -> int:
    """Index of the next REAL marker at/after ``pos``: 0xFF followed
    by anything except 0x00 (stuffing) or RST0-7 (in-scan resync)."""
    i = pos
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF and payload[i + 1] != 0x00 and not (
            0xD0 <= payload[i + 1] <= 0xD7
        ):
            return i
        i += 1
    raise ValueError("unterminated scan (no trailing marker)")


def _decode_prog_scan(
    coefs, n_blocks, data, ss, se, ah, al, td, ta, tables, interval
) -> None:
    """Decode ONE progressive scan (any of the four T.81 G.1.2 scan
    kinds - DC/AC x first/refinement) into the per-block coefficient
    array ``coefs`` (n_blocks x 64, zigzag order). Shared by the
    grayscale and color progressive decoders: a progressive color
    scan is single-component (Ns=1), so each one is exactly this
    routine run against its component-own coefficient plane with its
    own Huffman tables."""
    reader = _BitReader(data)
    expected_rst = 0

    def _sync(b):
        nonlocal expected_rst
        n = reader.sync_restart()
        if n != expected_rst:
            raise ValueError(
                f"restart marker out of sequence: got RST{n}, "
                f"expected RST{expected_rst}"
            )
        expected_rst = (expected_rst + 1) % 8

    if ss == 0:
        if se != 0:
            raise ValueError(
                "a progressive DC scan must have Ss=Se=0"
            )
        if ah:  # DC refinement: one raw bit per block, OR-ed in
            for b in range(n_blocks):
                if interval and b and b % interval == 0:
                    _sync(b)
                if reader.read_bit():
                    coefs[b, 0] |= 1 << al
            return
        if (0, td) not in tables:
            raise ValueError(
                f"scan references undefined DC Huffman table {td}"
            )
        dc_dec = tables[(0, td)]
        prev = 0
        for b in range(n_blocks):
            if interval and b and b % interval == 0:
                _sync(b)
                prev = 0  # restart resets the DC predictor
            cat = _huff_read(reader, dc_dec)
            diff = _extend(reader.read_bits(cat), cat) if cat else 0
            prev += diff
            # store shifted back (T.81 G.1.2.1); refinement scans
            # OR the lower bits in
            coefs[b, 0] = prev << al
    else:
        if not (1 <= ss <= se <= 63):
            raise ValueError("invalid spectral band")
        if (1, ta) not in tables:
            raise ValueError(
                f"scan references undefined AC Huffman table {ta}"
            )
        ac_dec = tables[(1, ta)]
        eobrun = 0
        if ah:  # AC refinement (T.81 G.1.2.3)
            p1, m1 = 1 << al, -(1 << al)

            def _correct(b, k):
                # one correction bit for an already-nonzero coef;
                # sign-magnitude growth: |coef| += 2^al iff the
                # bit is set and bit al is still clear
                if reader.read_bit() and not (
                    int(coefs[b, k]) & p1
                ):
                    coefs[b, k] += p1 if coefs[b, k] > 0 else m1

            for b in range(n_blocks):
                if interval and b and b % interval == 0:
                    if eobrun:
                        raise ValueError(
                            "EOB run extends across a restart "
                            "boundary"
                        )
                    _sync(b)
                k = ss
                if eobrun:
                    eobrun -= 1
                else:
                    while k <= se:
                        sym = _huff_read(reader, ac_dec)
                        r, s = sym >> 4, sym & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                # EOBn: this block + 2^r - 1 more
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            # ZRL: skip 16 zero-history positions
                        elif s == 1:
                            newval = p1 if reader.read_bit() else m1
                        else:
                            raise ValueError(
                                "refinement magnitude must be 1 "
                                f"(got {s})"
                            )
                        # walk: correction bits at nonzero-history
                        # positions; count down r at zero-history
                        while k <= se:
                            if coefs[b, k] != 0:
                                _correct(b, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "refinement run extends beyond "
                                    "the scan band"
                                )
                            coefs[b, k] = newval
                        k += 1
                # EOB/tail correction pass for the rest of the band
                while k <= se:
                    if coefs[b, k] != 0:
                        _correct(b, k)
                    k += 1
            return
        for b in range(n_blocks):
            if interval and b and b % interval == 0:
                if eobrun:
                    raise ValueError(
                        "EOB run extends across a restart "
                        "boundary"
                    )
                _sync(b)
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_read(reader, ac_dec)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        if k > se + 1:
                            raise ValueError(
                                "ZRL run extends beyond the scan "
                                "band"
                            )
                        continue
                    # EOBn: run of 2^r blocks (this one included)
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError(
                        "AC coefficient index beyond the scan band"
                    )
                # sign-magnitude point transform: store << al
                coefs[b, k] = _extend(reader.read_bits(s), s) << al
                k += 1


def decode_gray_progressive(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a SOF2 progressive grayscale JPEG — spectral selection
    AND successive approximation (streams from
    :func:`encode_gray_progressive`, or foreign files of the same
    shape). Coefficients accumulate across scans into one coefficient
    plane; dequantization + IDCT run once at the end, so the pixel
    math is shared bit-for-bit with the baseline decoder. Handles the
    general EOBn run code, restart intervals (DRI + RSTn in every
    scan: byte-align, verify the mod-8 sequence, reset the DC
    predictor / require the EOB run to terminate at the boundary per
    T.81 G.1.2.2), DC/AC first scans at Al > 0 (point-transformed
    coefficients stored shifted back), DC refinement (one raw bit per
    block, OR-ed in) and AC refinement (the G.1.2.3 correction-bit
    walk). Rejected loudly: Ah != Al+1 refinements, magnitude > 1 in
    a refinement symbol, multi-component frames, baseline SOF0 (use
    :func:`decode_gray`), 16-bit quant tables."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = None
    width = height = None
    interval = 0
    tables: dict[tuple[int, int], dict] = {}
    # (ss, se, td, ta, entropy bytes, interval, tables) — the restart
    # interval and Huffman tables IN EFFECT at SOS time are
    # snapshotted per scan: a conforming T.81 stream may redefine DRI
    # or DHT between scans, so applying the post-parse globals
    # retroactively would decode earlier scans with the wrong
    # interval/tables (shallow dict copy suffices; table entries are
    # replaced on redefinition, never mutated)
    scans = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            if len(body) < 65:
                raise ValueError("truncated DQT segment")
            if body[0] >> 4 != 0:
                raise ValueError(
                    "baseline JPEG requires 8-bit (Pq=0) quantization "
                    "tables"
                )
            if body[0] & 0x0F == 0:
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = body[1 + k]
                qt = t
        elif marker == 0xC2:
            if len(body) < 6:
                raise ValueError("truncated SOF2 segment")
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError(
                    "only single-component progressive is supported"
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "decode_gray_progressive handles SOF2 only (use "
                f"decode_gray for SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                tables[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_table(
                    bits, vals
                )
                i += 17 + nvals
        elif marker == 0xDA:
            ns = body[0]
            if ns != 1:
                raise ValueError("expected a single-component scan")
            td, ta = body[2] >> 4, body[2] & 0x0F
            ss, se, ah_al = body[3], body[4], body[5]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if ah and ah != al + 1:
                raise ValueError(
                    "successive-approximation refinement must have "
                    f"Ah = Al + 1 (got Ah={ah}, Al={al})"
                )
            start = pos + 2 + ln
            end = _next_marker(payload, start)
            scans.append(
                (
                    ss, se, td, ta, ah, al,
                    payload[start:end], interval, dict(tables),
                )
            )
            pos = end
            continue
        pos += 2 + ln
    if qt is None or width is None or not scans:
        raise ValueError("incomplete JPEG stream")

    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    n_blocks = (bh // 8) * (bw // 8)
    coefs = np.zeros((n_blocks, 64), dtype=np.int64)
    for ss, se, td, ta, ah, al, data, interval, tables in scans:
        _decode_prog_scan(
            coefs, n_blocks, data, ss, se, ah, al, td, ta, tables,
            interval,
        )

    out = np.zeros((bh, bw), dtype=np.float64)
    b = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            coef = np.zeros((8, 8), dtype=np.float64)
            for k2, (r, c) in enumerate(_ZIGZAG):
                coef[r, c] = coefs[b, k2] * qt[r, c]
            out[by : by + 8, bx : bx + 8] = _DCT.T @ coef @ _DCT
            b += 1
    pix = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return width, height, pix[:height, :width].tobytes()


def _plane_to_zzs(plane, qt) -> list:
    """Level-shifted float plane (dims multiples of 8) -> zigzag-
    quantized blocks in raster order — the per-component analysis
    step the progressive color encoder shares with the grayscale
    paths (same DCT/quantize math, so progressive re-framing keeps
    the baseline's exact coefficients)."""
    bh, bw = plane.shape
    zzs = []
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            coef = _DCT @ plane[by : by + 8, bx : bx + 8] @ _DCT.T
            qz = np.round(coef / qt).astype(np.int64)
            zzs.append([int(qz[r, c]) for (r, c) in _ZIGZAG])
    return zzs


def _emit_dc_first_interleaved(
    zz_y_full, zz_cb, zz_cr, mcu_rows, mcu_cols, al, restart_interval
) -> bytes:
    """Interleaved (Ns=3) progressive DC first scan for 4:2:0: MCU
    order (4 luma blocks + Cb + Cr), one DPCM predictor per
    component, restart interval counted in MCUs (all predictors
    reset). ``zz_y_full`` is the MCU-16 luma grid (2*mcu_cols block
    columns); chroma grids equal their MCU grid."""
    w = _BitWriter()
    prev = [0, 0, 0]
    rst = 0
    mcu = 0
    ycols = 2 * mcu_cols

    def dc(v, ci, enc):
        cat, bits = _magnitude(v - prev[ci])
        prev[ci] = v
        code, ln = enc[cat]
        w.write(code, ln)
        if cat:
            w.write(bits, cat)

    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev = [0, 0, 0]
            mcu += 1
            for sy in (0, 1):
                for sx in (0, 1):
                    b = (2 * my + sy) * ycols + (2 * mx + sx)
                    dc(zz_y_full[b][0] >> al, 0, _DC_ENC)
            cb = my * mcu_cols + mx
            dc(zz_cb[cb][0] >> al, 1, _DC_ENC_C)
            dc(zz_cr[cb][0] >> al, 2, _DC_ENC_C)
    w.flush()
    return bytes(w.out)


def _emit_dc_refine_interleaved(
    zz_y_full, zz_cb, zz_cr, mcu_rows, mcu_cols, al, restart_interval
) -> bytes:
    """Interleaved DC refinement: one raw bit per block in MCU order
    (bit ``al`` of each DC value), restarts counted in MCUs."""
    w = _BitWriter()
    rst = 0
    mcu = 0
    ycols = 2 * mcu_cols
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            mcu += 1
            for sy in (0, 1):
                for sx in (0, 1):
                    b = (2 * my + sy) * ycols + (2 * mx + sx)
                    w.write((zz_y_full[b][0] >> al) & 1, 1)
            cb = my * mcu_cols + mx
            w.write((zz_cb[cb][0] >> al) & 1, 1)
            w.write((zz_cr[cb][0] >> al) & 1, 1)
    w.flush()
    return bytes(w.out)


def encode_color_progressive(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 75,
    bands: tuple = ((1, 5), (6, 63)),
    restart_interval: int = 0,
    dc_levels: int = 0,
    ac_levels: int = 0,
    interleaved_dc: bool = False,
) -> bytes:
    """Encode interleaved RGB as a SOF2 PROGRESSIVE 4:2:0 YCbCr JPEG.
    Every scan is SINGLE-COMPONENT (Ns=1, legal per T.81 — progressive
    AC scans must be non-interleaved anyway, and emitting the DC
    scans per component too lets all three components reuse the
    single-component scan machinery verbatim, with each component
    coded over its OWN ceil-to-8 block grid per A.2.2). Color math is
    byte-identical to :func:`encode_color` (BT.601, box-averaged
    2x2 chroma, Annex-K tables under IJG quality scaling), and the
    quantized coefficients are the baseline's exact values — so the
    progressive decode is BIT-EXACT against the baseline color
    round-trip, the grading contract. ``interleaved_dc`` emits the
    DC scans in the Ns=3 MCU-ordered framing real-world progressive
    files use instead (luma quantized over the full MCU-16 grid for
    those scans only). Scan order: Y/Cb/Cr DC firsts,
    per-component AC band firsts, then DC and AC refinements
    (``dc_levels``/``ac_levels``, T.81 G.1.2 successive
    approximation, same semantics as the grayscale SA path).

    Note the luma grid subtlety: the baseline's interleaved MCUs pad
    luma to multiples of 16, but a NON-interleaved luma scan covers
    only ceil(dim/8) blocks — for dims with remainder 1..8 mod 16
    the baseline's final pad blocks simply do not exist here. Both
    grids contain every block that covers real pixels with identical
    coefficients (edge padding replicates the same rows/cols), so
    the cropped decode is unaffected."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    prev_end = 0
    for ss, se in bands:
        if ss != prev_end + 1 or se < ss or se > 63:
            raise ValueError(
                "bands must tile 1..63 contiguously (bit-exact "
                f"contract); got {bands}"
            )
        prev_end = se
    if prev_end != 63:
        raise ValueError("bands must end at coefficient 63")
    if dc_levels < 0 or ac_levels < 0 or dc_levels > 13 or ac_levels > 13:
        raise ValueError("successive-approximation levels out of range")

    img = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    mh = (height + 15) // 16 * 16
    mw = (width + 15) // 16 * 16

    def pad(p):
        return np.pad(p, ((0, mh - height), (0, mw - width)), mode="edge")

    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    y_full = pad(y) - 128.0  # MCU-16 grid (interleaved DC scans)
    yb = y_full[:bh, :bw]  # non-interleaved luma grid
    cbs = pad(cb).reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)) - 128.0
    crs = pad(cr).reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)) - 128.0

    qy = _quant_table(quality)
    qc = _quant_table(quality, _QUANT_BASE_C)
    comps = [
        (1, _plane_to_zzs(yb, qy), _DC_ENC, _AC_ENC, 0x00),
        (2, _plane_to_zzs(cbs, qc), _DC_ENC_C, _AC_ENC_C, 0x11),
        (3, _plane_to_zzs(crs, qc), _DC_ENC_C, _AC_ENC_C, 0x11),
    ]

    def zz_of(qt):
        return bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + zz_of(qy)) + _seg(0xDB, b"\x01" + zz_of(qc))
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
    out += _seg(0xC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))

    def sos(cid, tabs, ss, se, ah, al, data):
        return _seg(
            0xDA, bytes([1, cid, tabs, ss, se, (ah << 4) | al])
        ) + data

    ri = restart_interval
    if interleaved_dc:
        # the framing real-world progressive files use: ONE Ns=3 DC
        # scan in MCU order (luma quantized over the FULL MCU-16 grid
        # — its pad blocks exist only in this scan; the AC scans'
        # ceil-8 grid shares every real block's coefficients), then
        # non-interleaved AC scans as below
        zz_y_full = _plane_to_zzs(y_full, qy)
        hdr = _seg(
            0xDA,
            bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, dc_levels]),
        )
        out += hdr + _emit_dc_first_interleaved(
            zz_y_full, comps[1][1], comps[2][1], mh // 16, mw // 16,
            dc_levels, ri,
        )
    else:
        for cid, zzs, dc_enc, _ac, tabs in comps:  # DC firsts
            out += sos(cid, tabs, 0, 0, 0, dc_levels,
                       _emit_dc_first(zzs, dc_levels, ri, dc_enc))
    for cid, zzs, _dc, ac_enc, tabs in comps:  # AC band firsts
        for ss, se in bands:
            out += sos(cid, tabs, ss, se, 0, ac_levels,
                       _emit_ac_first(zzs, ss, se, ac_levels, ri, ac_enc))
    for al in range(dc_levels - 1, -1, -1):  # DC refinements
        if interleaved_dc:
            hdr = _seg(
                0xDA,
                bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0,
                       ((al + 1) << 4) | al]),
            )
            out += hdr + _emit_dc_refine_interleaved(
                zz_y_full, comps[1][1], comps[2][1], mh // 16, mw // 16,
                al, ri,
            )
        else:
            for cid, zzs, _dc, _ac, tabs in comps:
                out += sos(cid, tabs, 0, 0, al + 1, al,
                           _emit_dc_refine(zzs, al, ri))
    for al in range(ac_levels - 1, -1, -1):  # AC refinements
        for cid, zzs, _dc, ac_enc, tabs in comps:
            for ss, se in bands:
                out += sos(cid, tabs, ss, se, al + 1, al,
                           _emit_ac_refine(zzs, ss, se, al, ri, ac_enc))
    out += b"\xff\xd9"
    return bytes(out)


def _decode_dc_interleaved(
    coefs, grids, sof_ids, tds, data, ah, al, tables, interval,
    mcu_rows, mcu_cols,
) -> None:
    """Decode an interleaved (Ns=3) progressive DC scan for 4:2:0:
    MCU order, per-component DPCM predictors, restart interval in
    MCUs. The interleaved luma grid is MCU-16-padded, so blocks
    beyond the non-interleaved ceil-8 grid (dimension remainders
    1..8 mod 16) are entropy-decoded — they occupy real bits and
    advance the predictor — but DISCARDED: no AC scan covers them
    and the cropped reconstruction never reads them."""
    cid_y, cid_cb, cid_cr = sof_ids
    bh, bw = grids[cid_y]
    yrows, ycols = bh // 8, bw // 8
    reader = _BitReader(data)
    expected_rst = 0
    prev = {cid: 0 for cid in sof_ids}
    refine = ah != 0
    decs = {}
    if not refine:
        for cid, td in zip(sof_ids, tds):
            if (0, td) not in tables:
                raise ValueError(
                    f"scan references undefined DC Huffman table {td}"
                )
            decs[cid] = tables[(0, td)]
    mcu = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if interval and mcu and mcu % interval == 0:
                n = reader.sync_restart()
                if n != expected_rst:
                    raise ValueError(
                        f"restart marker out of sequence: got RST{n},"
                        f" expected RST{expected_rst}"
                    )
                expected_rst = (expected_rst + 1) % 8
                prev = {cid: 0 for cid in sof_ids}
            mcu += 1

            def one(cid, b, in_grid):
                if refine:
                    if reader.read_bit() and in_grid:
                        coefs[cid][b, 0] |= 1 << al
                    return
                cat = _huff_read(reader, decs[cid])
                diff = (
                    _extend(reader.read_bits(cat), cat) if cat else 0
                )
                prev[cid] += diff
                if in_grid:
                    coefs[cid][b, 0] = prev[cid] << al

            for sy in (0, 1):
                for sx in (0, 1):
                    row, col = 2 * my + sy, 2 * mx + sx
                    one(
                        cid_y,
                        row * ycols + col,
                        row < yrows and col < ycols,
                    )
            cb = my * mcu_cols + mx
            one(cid_cb, cb, True)
            one(cid_cr, cb, True)


def decode_color_progressive(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a SOF2 progressive 4:2:0 YCbCr JPEG. Scans may be
    single-component (Ns=1), or — for DC only, the framing real-world
    progressive files use for their first scan — interleaved (Ns=3,
    MCU order, per-component predictors, :func:`_decode_dc_interleaved`).
    Per-component coefficient planes accumulate across scans via the
    shared :func:`_decode_prog_scan` (spectral selection + successive
    approximation + restarts, with per-scan DRI/DHT snapshots);
    dequantization, IDCT, 2x2 chroma replication and BT.601 inversion
    run once at the end with exactly :func:`decode_color`'s math — so
    the output is bit-identical to the baseline color decode of the
    same quantized coefficients. Rejected loudly: interleaved AC
    scans (illegal per T.81 G.1.1.1), non-4:2:0 sampling,
    Ah != Al+1, 16-bit quant tables."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    tables: dict[tuple[int, int], dict] = {}
    width = height = None
    comp_qt: dict[int, int] = {}
    sof_ids: list[int] | None = None
    interval = 0
    scans = []  # (cid, ss, se, td, ta, ah, al, data, interval, tables)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                if body[i] >> 4 != 0:
                    raise ValueError(
                        "baseline JPEG requires 8-bit (Pq=0) "
                        "quantization tables"
                    )
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                tid = body[i] & 0x0F
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (rr, cc) in enumerate(_ZIGZAG):
                    t[rr, cc] = body[i + 1 + k]
                qts[tid] = t
                i += 65
        elif marker == 0xC2:
            if len(body) < 6:
                raise ValueError("truncated SOF2 segment")
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 3:
                raise ValueError(
                    "decode_color_progressive handles 3-component "
                    "frames (use decode_gray_progressive for 1)"
                )
            samp = []
            sof_ids = []
            for ci in range(3):
                cid, sf, tq = body[6 + 3 * ci : 9 + 3 * ci]
                samp.append(sf)
                comp_qt[cid] = tq
                sof_ids.append(cid)
            if samp != [0x22, 0x11, 0x11]:
                raise ValueError("only 4:2:0 sampling is supported")
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError(
                "decode_color_progressive handles SOF2 only (use "
                f"decode_color for SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                tables[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_table(
                    bits, vals
                )
                i += 17 + nvals
        elif marker == 0xDA:
            ns = body[0]
            if ns == 3:
                # interleaved DC scan (the framing real progressive
                # files use for their first scan); AC scans must
                # still be non-interleaved per T.81 G.1.1.1
                cids = [body[1 + 2 * ci] for ci in range(3)]
                tds = [body[2 + 2 * ci] >> 4 for ci in range(3)]
                ss, se, ah_al = body[7], body[8], body[9]
                ah, al = ah_al >> 4, ah_al & 0x0F
                if ss != 0 or se != 0:
                    raise ValueError(
                        "interleaved progressive scans are legal for "
                        "DC only (Ss=Se=0); AC scans must be "
                        "single-component"
                    )
                if ah and ah != al + 1:
                    raise ValueError(
                        "successive-approximation refinement must "
                        f"have Ah = Al + 1 (got Ah={ah}, Al={al})"
                    )
                start = pos + 2 + ln
                end = _next_marker(payload, start)
                scans.append(
                    (("MCU", cids, tds), 0, 0, 0, 0, ah, al,
                     payload[start:end], interval, dict(tables))
                )
                pos = end
                continue
            if ns != 1:
                raise ValueError(
                    "progressive color scans must be single-component "
                    "(Ns=1) or an interleaved DC scan (Ns=3)"
                )
            cid, tabs = body[1], body[2]
            td, ta = tabs >> 4, tabs & 0x0F
            ss, se, ah_al = body[3], body[4], body[5]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if ah and ah != al + 1:
                raise ValueError(
                    "successive-approximation refinement must have "
                    f"Ah = Al + 1 (got Ah={ah}, Al={al})"
                )
            start = pos + 2 + ln
            end = _next_marker(payload, start)
            scans.append(
                (cid, ss, se, td, ta, ah, al, payload[start:end],
                 interval, dict(tables))
            )
            pos = end
            continue
        pos += 2 + ln
    if not qts or width is None or sof_ids is None or not scans:
        raise ValueError("incomplete JPEG stream")

    cid_y, cid_cb, cid_cr = sof_ids
    bh = (height + 7) // 8 * 8
    bw = (width + 7) // 8 * 8
    ch = ((height + 1) // 2 + 7) // 8 * 8
    cw = ((width + 1) // 2 + 7) // 8 * 8
    grids = {
        cid_y: (bh, bw),
        cid_cb: (ch, cw),
        cid_cr: (ch, cw),
    }
    coefs = {
        cid: np.zeros(((gh // 8) * (gw // 8), 64), dtype=np.int64)
        for cid, (gh, gw) in grids.items()
    }
    mcu_rows = (height + 15) // 16
    mcu_cols = (width + 15) // 16
    for cid, ss, se, td, ta, ah, al, data, ivl, tbls in scans:
        if isinstance(cid, tuple):  # interleaved DC scan
            _mark, cids, tds = cid
            if cids != sof_ids:
                raise ValueError(
                    f"interleaved scan component order {cids} does "
                    f"not match SOF order {sof_ids}"
                )
            _decode_dc_interleaved(
                coefs, grids, sof_ids, tds, data, ah, al, tbls, ivl,
                mcu_rows, mcu_cols,
            )
            continue
        if cid not in coefs:
            raise ValueError(f"scan references unknown component {cid}")
        _decode_prog_scan(
            coefs[cid], coefs[cid].shape[0], data, ss, se, ah, al,
            td, ta, tbls, ivl,
        )

    def plane_of(cid):
        gh, gw = grids[cid]
        qt = qts[comp_qt[cid]]
        out = np.zeros((gh, gw), dtype=np.float64)
        b = 0
        for by in range(0, gh, 8):
            for bx in range(0, gw, 8):
                coef = np.zeros((8, 8), dtype=np.float64)
                for k2, (rr, cc) in enumerate(_ZIGZAG):
                    coef[rr, cc] = coefs[cid][b, k2] * qt[rr, cc]
                out[by : by + 8, bx : bx + 8] = _DCT.T @ coef @ _DCT
                b += 1
        return out

    yy = (plane_of(cid_y) + 128.0)[:height, :width]
    cb = np.repeat(np.repeat(plane_of(cid_cb), 2, axis=0), 2, axis=1)[
        :height, :width
    ]
    cr = np.repeat(np.repeat(plane_of(cid_cr), 2, axis=0), 2, axis=1)[
        :height, :width
    ]
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack(
        [
            np.clip(np.round(ch_), 0, 255).astype(np.uint8)
            for ch_ in (r, g, b)
        ],
        axis=-1,
    )
    return width, height, rgb.tobytes()


def text_jpeg_color_progressive_roundtrip(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 48,
    quality: int = 75,
    dc_levels: int = 1,
    ac_levels: int = 1,
):
    """Arrow-batched COLOR progressive round-trip graded BIT-EXACTLY:
    each document's UTF-8 bytes tile a side x side RGB image pushed
    through the baseline 4:2:0 codec AND the single-component-scan
    progressive color codec (with successive approximation) in the
    same task; the two decodes must agree byte for byte because both
    reconstruct from the same quantized coefficients with the same
    pixel math. ``n_scans`` = 3 components x (1 DC + dc_levels
    refinements + 2 bands x (1 + ac_levels))."""
    n_scans = 3 * (1 + dc_levels + 2 * (1 + ac_levels))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or " ").encode("utf-8")
                n_px = side * side * 3
                reps = n_px // len(b) + 1
                pix = (b * reps)[:n_px]
                base = decode_color(
                    encode_color(side, side, pix, quality)
                )[2]
                enc = encode_color_progressive(
                    side, side, pix, quality,
                    dc_levels=dc_levels, ac_levels=ac_levels,
                )
                prog = decode_color_progressive(enc)[2]
                out.append((did, n_px, prog == base, len(enc), n_scans))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_pixels", "bit_exact", "n_bytes",
                    "n_scans",
                ],
            )

    return df.mapInPandas(
        kernel,
        "doc_id long, n_pixels long, bit_exact boolean, n_bytes long,"
        " n_scans int",
    )


def text_jpeg_progressive_roundtrip(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 48,
    quality: int = 75,
    dc_levels: int = 0,
    ac_levels: int = 0,
):
    """Arrow-batched progressive round-trip graded BIT-EXACTLY: each
    document's UTF-8 bytes tile a grayscale image pushed through BOTH
    the baseline codec and the progressive codec in the same task.
    Because spectral selection (and, with ``dc_levels``/``ac_levels``,
    successive approximation) re-frames the SAME quantized
    coefficients, the two decodes must agree byte for byte — a far
    stronger gate than the lossy error bounds, and one that any
    EOB-run, band-split, correction-bit, or multi-scan bookkeeping
    bug breaks. ``n_scans`` = 1 DC first + dc_levels DC refinements +
    (1 + ac_levels) scans per AC band (2 bands)."""
    n_scans = 1 + dc_levels + 2 * (1 + ac_levels)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or " ").encode("utf-8")
                n_px = side * side
                reps = n_px // len(b) + 1
                pix = (b * reps)[:n_px]
                base = decode_gray(encode_gray(side, side, pix, quality))[2]
                enc = encode_gray_progressive(
                    side, side, pix, quality,
                    dc_levels=dc_levels, ac_levels=ac_levels,
                )
                prog = decode_gray_progressive(enc)[2]
                out.append(
                    (did, n_px, prog == base, len(enc), n_scans)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_pixels", "bit_exact", "n_bytes",
                    "n_scans",
                ],
            )

    return df.mapInPandas(
        kernel,
        "doc_id long, n_pixels long, bit_exact boolean, n_bytes long,"
        " n_scans int",
    )
