"""Baseline grayscale JPEG codec, stdlib + numpy only.

The last image format a real training-data pipeline hits before the
external-codec seam. This is a genuine ITU-T T.81 baseline sequential
DCT codec for the 8-bit single-component (grayscale) case:

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI marker walk, canonical
  Huffman tables built FROM the DHT segments (any spec-valid table
  decodes, not just the ones our encoder writes), byte-stuffed (FF 00)
  entropy reader, DC difference + AC run/size entropy decode, de-zigzag,
  dequantize, orthonormal-matrix IDCT, level shift + clamp;
- encoder: the exact inverse (forward DCT, quantize, zigzag, canonical
  Huffman with spec-valid uniform-length tables, byte stuffing), used to
  synthesize REAL fixture containers deterministically.

Scope is the honestly-implementable subset: progressive (SOF2),
multi-component/color (Nf>1), 12-bit precision, arithmetic coding and
restart intervals raise NotImplementedError at the same external-codec
seam the rest of the multimodal module uses; malformed containers raise
ValueError (reject-sink route). Exactness contract used by the driver
oracle: a constant 8x8 block with an all-ones quantization table
round-trips EXACTLY (only the DC coefficient 8*(v-128) survives, it
quantizes losslessly, and the IDCT of a DC-only block is constant), so
fixtures built from per-block constant values are value-regenerable by
the DuckDB oracle in closed form.

Reference parity note: the reference repo (suconghou/nginx_log) has no
media path at all — this module belongs to the §2.10 training-data
extension surface (SURVEY.md), alongside the WAV/PPM/PNG codecs in
functions/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag index -> raster index (ITU-T T.81 Figure 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Orthonormal 8x8 DCT-II basis: A[u, x] = 0.5 * c(u) * cos((2x+1)u*pi/16),
# c(0) = 1/sqrt(2). Forward F = A f A^T, inverse f = A^T F A — exactly the
# T.81 Annex A definition. A constant block v has F[0,0] = 8 * v and all
# AC terms ~1e-14 (mathematically 0), which is what makes the all-ones-
# qtable constant-block fixtures exact.
_A = np.array(
    [
        [
            0.5 * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Encoder Huffman tables: spec-valid canonical tables with uniform code
# lengths (simpler than Annex K, decodes through ANY conforming decoder):
# DC — 12 category symbols, all 4 bits (codes 0000..1011, the reserved
# all-ones code stays unassigned); AC — EOB + ZRL + (run 0..15 x size
# 1..10), 162 symbols, all 8 bits (codes 0..161, same property).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 Annex C canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial Huffman decode."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs FF 00, treats any other
    marker (including EOI) as end-of-data — reading past it is a
    truncation and raises ValueError."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.ended = False

    def _next_byte(self) -> int:
        if self.ended or self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed FF
            else:
                self.ended = True  # a real marker terminates the scan
                raise ValueError("JPEG entropy stream ended early (truncated scan)")
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t low bits back to the signed amplitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in JPEG entropy stream")


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential grayscale JPEG. Returns
    (width, height, raster bytes, row-major). ValueError on malformed
    containers; NotImplementedError for the out-of-scope JPEG variants
    (progressive, color, 12-bit, arithmetic coding, restart intervals)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG container (missing SOI)")
    if payload[-2:] != b"\xff\xd9":
        raise ValueError("JPEG missing EOI marker (truncated container)")
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    pos = 2
    try:
        while pos < len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"expected marker at offset {pos}")
            while pos < len(payload) and payload[pos] == 0xFF:
                pos += 1  # fill bytes are legal before a marker code
            marker = payload[pos]
            pos += 1
            if marker == 0xD9:  # EOI with no scan
                raise ValueError("JPEG has no SOS scan")
            if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                          0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "only baseline sequential JPEG (SOF0) is supported without "
                    "an external codec; progressive/extended/arithmetic need PIL"
                )
            (seglen,) = struct.unpack_from(">H", payload, pos)
            if seglen < 2 or pos + seglen > len(payload):
                raise ValueError("truncated JPEG segment")
            body = payload[pos + 2 : pos + seglen]
            if marker == 0xDB:  # DQT
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0x0F
                    if pq != 0:
                        raise NotImplementedError(
                            "16-bit quantization tables need an external codec"
                        )
                    if b + 65 > len(body):
                        raise ValueError("truncated DQT segment")
                    qtables[tq] = list(body[b + 1 : b + 65])
                    b += 65
            elif marker == 0xC4:  # DHT
                b = 0
                while b < len(body):
                    if b + 17 > len(body):
                        raise ValueError("truncated DHT segment")
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1 : b + 17])
                    n = sum(bits)
                    if b + 17 + n > len(body):
                        raise ValueError("truncated DHT segment")
                    vals = list(body[b + 17 : b + 17 + n])
                    htables[(tc, th)] = _decode_table(bits, vals)
                    b += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                if len(body) < 6:
                    raise ValueError("truncated SOF0 segment")
                precision, h, w, nf = body[0], *struct.unpack_from(">HH", body, 1), body[5]
                if precision != 8:
                    raise NotImplementedError("only 8-bit JPEG precision supported")
                if nf != 1:
                    raise NotImplementedError(
                        "color (multi-component) JPEG needs an external codec; "
                        "only grayscale is supported stdlib-side"
                    )
                if len(body) < 6 + 3:
                    raise ValueError("truncated SOF0 component spec")
                if body[7] != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG needs an external codec"
                    )
                if w <= 0 or h <= 0:
                    raise ValueError(f"bad JPEG dimensions {w}x{h}")
                sof = (w, h, body[8])  # width, height, qtable id
            elif marker == 0xDD:  # DRI
                if len(body) >= 2 and struct.unpack_from(">H", body)[0] != 0:
                    raise NotImplementedError(
                        "restart intervals are out of scope for the stdlib codec"
                    )
            elif marker == 0xDA:  # SOS
                if sof is None:
                    raise ValueError("SOS before SOF0")
                if len(body) < 4 or body[0] != 1:
                    raise ValueError("SOS must reference exactly one component")
                td, ta = body[2] >> 4, body[2] & 0x0F
                w, h, tq = sof
                if tq not in qtables:
                    raise ValueError(f"SOF references missing qtable {tq}")
                if (0, td) not in htables or (1, ta) not in htables:
                    raise ValueError("SOS references missing Huffman table")
                return (
                    w,
                    h,
                    _decode_scan(
                        payload, pos + seglen, w, h,
                        qtables[tq], htables[(0, td)], htables[(1, ta)],
                    ),
                )
            # APPn / COM / other tables: skip
            pos += seglen
        raise ValueError("JPEG has no SOS scan")
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated JPEG container: {exc}") from exc


def _decode_scan(
    payload: bytes,
    pos: int,
    w: int,
    h: int,
    qtable: list[int],
    dc_table: dict[tuple[int, int], int],
    ac_table: dict[tuple[int, int], int],
) -> bytes:
    """Entropy-decode the single-component scan: per 8x8 block, DC diff +
    AC run/size symbols -> de-zigzag -> dequantize -> IDCT -> level shift."""
    br = _BitReader(payload, pos)
    bx, by = (w + 7) // 8, (h + 7) // 8
    # Every MCU consumes >= 2 bits (a DC Huffman code and an EOB), so a
    # scan with fewer entropy bytes than blocks/4 can only be truncated —
    # reject BEFORE allocating the raster (a dim-corrupted container must
    # not cost a multi-GB allocation on its way to the reject sink). The
    # raster costs 64 output bytes per block, so the guard is also capped
    # absolutely: a spec-conforming giant raster past 256 MB belongs to
    # the external-codec seam, not a stdlib decoder allocation.
    if bx * by > 4 * max(len(payload) - pos, 0):
        raise ValueError("JPEG entropy stream too short for the SOF dimensions")
    if bx * by * 64 > 256 * 1024 * 1024:
        raise ValueError(
            f"JPEG raster {w}x{h} exceeds the stdlib decoder's 256 MB cap"
        )
    q = np.array([qtable[k] for k in range(64)], dtype=np.float64)
    out = np.zeros((by * 8, bx * 8), dtype=np.uint8)
    pred = 0
    for b in range(bx * by):
        zz = np.zeros(64, dtype=np.float64)
        t = _huff_decode(br, dc_table)
        if t > 11:
            raise ValueError(f"bad DC category {t}")
        diff = _extend(br.read_bits(t), t) if t else 0
        pred += diff
        zz[0] = pred
        k = 1
        while k < 64:
            sym = _huff_decode(br, ac_table)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run overflows the block")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        block = np.zeros(64, dtype=np.float64)
        block[ZIGZAG] = zz * q  # de-zigzag + dequantize in one indexed store
        f = _A.T @ block.reshape(8, 8) @ _A
        pix = np.clip(np.rint(f + 128.0), 0, 255).astype(np.uint8)
        y0, x0 = (b // bx) * 8, (b % bx) * 8
        out[y0 : y0 + 8, x0 : x0 + 8] = pix
    return out[:h, :w].tobytes()


def encode_jpeg_gray(img: np.ndarray, qtable: list[int] | None = None) -> bytes:
    """Encode an (h, w) uint8 array as baseline grayscale JPEG. Default
    quantization table is all ones (lossless up to DCT float rounding —
    and EXACTLY lossless for per-block-constant content, the property the
    driver-oracle fixtures rely on). Quantized AC amplitudes are clamped
    to the baseline-representable +-1023 (category 10)."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects an (h, w) uint8 array")
    h, w = img.shape
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad image dimensions {w}x{h}")
    q64 = list(qtable) if qtable is not None else [1] * 64
    if len(q64) != 64 or any(not 1 <= v <= 255 for v in q64):
        raise ValueError("qtable must be 64 values in 1..255")
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    q = np.array(q64, dtype=np.float64)
    bx, by = (w + 7) // 8, (h + 7) // 8
    padded = np.empty((by * 8, bx * 8), dtype=np.uint8)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # edge-replicate pad (standard practice)
    padded[:, w:] = padded[:, w - 1 : w]
    bw = _BitWriter()
    pred = 0
    for b in range(bx * by):
        y0, x0 = (b // bx) * 8, (b % bx) * 8
        f = padded[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
        coef = _A @ f @ _A.T
        zz = np.rint(coef.reshape(64)[ZIGZAG] / q)
        zz = np.clip(zz, -1023.0, 1023.0).astype(np.int64)
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = int(abs(diff)).bit_length()
        code, ln = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(zz[1:])[0]
        last = (nz[-1] + 1) if len(nz) else 0
        k, run = 1, 0
        while k <= last:
            v = int(zz[k])
            if v == 0:
                run += 1
            else:
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size = abs(v).bit_length()
                code, ln = ac_codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            k += 1
        if last < 63:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + bytes(q64))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
