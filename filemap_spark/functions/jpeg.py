"""Baseline JPEG codec on numpy + stdlib only (round 13) — the compressed
image format a web-scale training corpus actually ingests, with no codec
library in the container.

Scope: 8-bit baseline grayscale (SOF0, one component, standard Annex K
quantization + Huffman tables) — the mechanism layer (marker segments,
zigzag, DPCM DC, run-length AC, Huffman entropy coding, byte stuffing,
dequantization, IDCT) is the same one a color pipeline runs per channel.

Two deliberately different transform implementations so symmetric bugs
cannot cancel between the builder and the decoder:
- encoder forward DCT: direct matrix product  C @ X @ C.T
- decoder inverse DCT: one 64x64 basis-matrix product (the separable
  basis-accumulation form, vectorized), built independently of C.

Verification contract (why this is honest despite lossy compression):
- the ENTROPY + QUANTIZATION layer is lossless — the decoder must
  recover the encoder's quantized coefficient blocks BIT-EXACTLY
  (pinned via md5 over the coefficient stream on both sides);
- the TRANSFORM layer is lossy by design — reconstruction error is
  bounded (quant-table-scaled), pinned as a max-abs-error ceiling.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K Table K.1 luminance quantization matrix.
QT_STD = np.array(
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

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Standard Annex K luminance Huffman specs (Tables K.3 / K.5):
# bits[i] = number of codes of length i; vals in code order.
DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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


def scale_qt(qt: np.ndarray, quality: int = 90) -> np.ndarray:
    """libjpeg-convention quality scaling of a quantization table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality must be in 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int32)


def build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder table: value -> (code, bit length), per the JPEG canonical
    code construction (Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes

def build_decode_table(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """Decoder table: (bit length, code) -> value — a different lookup
    structure than the encoder's, built from the same spec."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _dct_matrix() -> np.ndarray:
    C = np.zeros((8, 8))
    for k in range(8):
        a = np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
        for n in range(8):
            C[k, n] = a * np.cos((2 * n + 1) * k * np.pi / 16)
    return C


_C = _dct_matrix()


def _idct_basis() -> np.ndarray:
    """64x64 inverse-DCT basis, built from the separable cosine basis
    directly (NOT from _C) — the decoder's independent transform."""
    B = np.zeros((64, 64))
    for u in range(8):
        cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        bu = cu * np.cos((2 * np.arange(8) + 1) * u * np.pi / 16)
        for v in range(8):
            cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            bv = cv * np.cos((2 * np.arange(8) + 1) * v * np.pi / 16)
            B[:, u * 8 + v] = np.outer(bu, bv).reshape(64)
    return B


_B = _idct_basis()


class BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per the spec
        return bytes(self.buf)


class BitReader:
    """Unstuffs the whole entropy segment up front (numpy pass), then
    serves bits by index — no per-bit byte logic in the hot loop."""

    def __init__(self, data: bytes) -> None:
        arr = np.frombuffer(data, dtype=np.uint8)
        # drop every 0x00 that FOLLOWS a 0xFF (stuffing); a 0xFF followed
        # by anything else is a marker — entropy data must end before it
        keep = np.ones(len(arr), dtype=bool)
        ff = arr == 0xFF
        nxt_zero = np.zeros(len(arr), dtype=bool)
        nxt_zero[1:] = arr[1:] == 0x00
        keep[1:] &= ~(ff[:-1] & nxt_zero[1:])
        marker_at = np.flatnonzero(ff[:-1] & ~nxt_zero[1:])
        end = marker_at[0] if len(marker_at) else len(arr)
        self.bits = np.unpackbits(arr[:end][keep[:end]])
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = self.bits[self.pos]
        self.pos += 1
        return int(b)

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        v = 0
        for b in self.bits[self.pos : self.pos + k]:
            v = (v << 1) | int(b)
        self.pos += k
        return v


def magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category (size) + appended bits for a value."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def extend(bits: int, size: int) -> int:
    """Inverse of `magnitude`: sign-extend `size` appended bits."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _read_code(br: BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in entropy stream")


_DC_CODES = build_codes(DC_BITS, DC_VALS)
_AC_CODES = build_codes(AC_BITS, AC_VALS)


def encode_gray(
    img: np.ndarray, quality: int = 90
) -> tuple[bytes, np.ndarray]:
    """(h, w) uint8 (dims multiples of 8) -> (jpeg bytes, quantized
    coefficient blocks as one (n_blocks, 8, 8) int32 array)."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encode_gray: dims must be multiples of 8")
    qt = scale_qt(QT_STD, quality)
    bw = BitWriter()
    prev_dc = 0
    coefs = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = img[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            q = np.round((_C @ block @ _C.T) / qt).astype(np.int32)
            coefs.append(q)
            zz = q.reshape(64)[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size, bits = magnitude(diff)
            code, length = _DC_CODES[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:  # ZRL
                    zc, zl = _AC_CODES[0xF0]
                    bw.write(zc, zl)
                    run -= 16
                size, bits = magnitude(v)
                code, length = _AC_CODES[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if run:  # EOB
                ec, el = _AC_CODES[0x00]
                bw.write(ec, el)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    qt_zz = qt.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    return (
        b"\xFF\xD8"
        + seg(0xDB, b"\x00" + qt_zz)
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, b"\x00" + bytes(DC_BITS[1:]) + bytes(DC_VALS))
        + seg(0xC4, b"\x10" + bytes(AC_BITS[1:]) + bytes(AC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xFF\xD9",
        np.stack(coefs),
    )


def decode_gray(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Full header-driven parse: -> (w, h, pixels (h,w) uint8, quantized
    coefficient blocks (n_blocks, 8, 8) int32). The quantization and
    Huffman tables are read from the STREAM'S OWN segments, never assumed
    — a builder that writes a wrong table mismatches here."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = None
    w = h = None
    dc_dec = ac_dec = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            if body[0] != 0x00:
                raise ValueError("only 8-bit quantization table 0 supported")
            flat = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int32)
            qt = np.zeros(64, dtype=np.int32)
            qt[ZIGZAG] = flat
            qt = qt.reshape(8, 8)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("baseline 8-bit single-component only")
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = [0] + list(body[p + 1 : p + 17])
                nval = sum(bits)
                vals = list(body[p + 17 : p + 17 + nval])
                if tc_th == 0x00:
                    dc_dec = build_decode_table(bits, vals)
                elif tc_th == 0x10:
                    ac_dec = build_decode_table(bits, vals)
                p += 17 + nval
        elif marker == 0xDA:
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if (
        qt is None or w is None or h is None
        or dc_dec is None or ac_dec is None or scan_start is None
    ):
        raise ValueError("missing required JPEG segment")
    br = BitReader(data[scan_start:])
    # real-world baseline JPEGs carry TRUE dims in SOF while the entropy
    # stream covers the 8-aligned MCU grid — decode the padded grid and
    # crop to the declared dims
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.zeros((ph, pw), dtype=np.uint8)
    coefs = []
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int32)
            size = _read_code(br, dc_dec)
            prev_dc += extend(br.read_bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_code(br, ac_dec)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                zz[k] = extend(br.read_bits(size), size)
                k += 1
            q = np.zeros(64, dtype=np.int32)
            q[ZIGZAG] = zz
            coefs.append(q.reshape(8, 8))
            pix = (_B @ (q.reshape(64) * qt.reshape(64)).astype(np.float64))
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.round(pix.reshape(8, 8) + 128.0), 0, 255
            ).astype(np.uint8)
    return w, h, out[:h, :w], np.stack(coefs)
