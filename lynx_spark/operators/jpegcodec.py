"""A dependency-free baseline JPEG codec (numpy + stdlib).

Scope: baseline sequential DCT JPEG (SOF0), 8-bit, grayscale (1
component) and YCbCr 4:4:4 (3 components, no chroma subsampling),
standard JFIF byte layout — the subset our encoder emits, which is
also a large slice of real-world baseline files. Progressive (SOF2),
subsampled chroma, arithmetic coding and restart markers raise
ValueError and fall through to the caller's PIL gate.

Why hand-written: the reference treats media as opaque bytes; this
repo's multimodal tier proves REAL pixel work can run inside Spark's
Arrow-batched ``mapInPandas`` with no image libraries in the
container. BMP (stride/orientation), PNG (deflate + row filters) and
GIF (LZW + palette) are exact codecs; JPEG is the lossy one — the
encoder/decoder pair here is validated by round-trip-within-tolerance
tests (DCT float rounding and the YCbCr integer transform bound the
error) plus an exactness test at quantization 1 on DCT-friendly
inputs.

Everything numerical is plain numpy: the 2D DCT-II/III are exact
orthonormal matrix products (D @ B @ D.T), Huffman tables are built
from the spec's (BITS, HUFFVAL) lists, and the bitstream does 0xFF00
byte stuffing per the spec.
"""

from __future__ import annotations

import struct

# -------------------------------------------------- spec constants

#: zigzag order: index i of the scan -> (row, col) flattened position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K standard Huffman tables: (BITS[1..16], HUFFVAL)
STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """The exact orthonormal 8×8 DCT-II matrix (row k, col n):
    c_k·cos((2n+1)kπ/16)·/2 — D @ B @ D.T is the 2D forward DCT,
    D.T @ C @ D the inverse."""
    import numpy as np  # noqa: PLC0415

    n = np.arange(8)
    k = n[:, None]
    d = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


def _huff_encode_table(bits, huffval):
    """symbol -> (code, length) per the spec's canonical assignment."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


def _huff_decode_table(bits, huffval):
    """(code, length) -> symbol — inverse of the canonical map."""
    enc = _huff_encode_table(bits, huffval)
    return {(c, ln): sym for sym, (c, ln) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, extra-bits value)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _extend(value: int, cat: int) -> int:
    """Inverse magnitude coding."""
    if cat == 0:
        return 0
    if value < (1 << (cat - 1)):
        return value - (1 << cat) + 1
    return value


def _blocks(plane):
    """(n_by, n_bx, 8, 8) edge-replicated blocks of a 2D plane."""
    import numpy as np  # noqa: PLC0415

    h, w = plane.shape
    bh = (h + 7) // 8 * 8
    bw = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")
    return padded.reshape(bh // 8, 8, bw // 8, 8).swapaxes(1, 2)


def _mean2x2(plane):
    """2×2 box-average chroma subsample (the 4:2:0 reduction), odd
    edges padded by replication so every output pixel averages a full
    quad."""
    import numpy as np  # noqa: PLC0415

    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def _pad_to(plane, rows: int, cols: int):
    """Edge-replicate a plane out to (rows, cols) — MCU-grid padding
    (a component's block grid is mcus·sampling blocks, which can
    exceed the ceil-to-8 cover of its own resolution)."""
    import numpy as np  # noqa: PLC0415

    h, w = plane.shape
    return np.pad(plane, ((0, rows - h), (0, cols - w)), mode="edge")


def encode_jpeg(pixels, quant: int = 1, subsampling: str = "444") -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JPEG. ``quant`` is the flat quantization step
    for every coefficient (1 = near-lossless; larger = real lossy
    compression). ``subsampling``: "444" (one block per component per
    MCU) or "420" (2×2 luma blocks + one box-averaged chroma block
    per 16×16 MCU — the dominant real-world baseline layout).
    Standard Huffman tables."""
    import numpy as np  # noqa: PLC0415

    # the DQT stores each step as one byte, so the value used to
    # quantize MUST be the byte-representable one — a clamped-in-DQT/
    # raw-in-math mismatch would make every decoder reconstruct wrong
    # intensities (and quant=0 divides by zero)
    quant = int(quant)
    if not 1 <= quant <= 255:
        raise ValueError(f"quant must be in [1, 255], got {quant}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got {subsampling}")
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        # JFIF YCbCr, kept as floats until the decoder's int round —
        # the round trip error is bounded by the two roundings
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    # (plane, h_sampling, v_sampling) per component
    if gray or subsampling == "444":
        comps = [(p, 1, 1) for p in planes]
    else:
        y, cb, cr = planes
        comps = [(y, 2, 2), (_mean2x2(cb), 1, 1), (_mean2x2(cr), 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    qtab = np.full(64, float(quant))
    d = _dct_matrix()

    dc_lum = _huff_encode_table(*STD_DC_LUM)
    ac_lum = _huff_encode_table(*STD_AC_LUM)
    dc_chr = _huff_encode_table(*STD_DC_CHR)
    ac_chr = _huff_encode_table(*STD_AC_CHR)
    writer = _BitWriter()
    preds = [0] * len(comps)
    coefs = []
    for plane, hs, vs, in comps:
        nby = mcus_y * vs
        nbx = mcus_x * hs
        blocks = _blocks(_pad_to(plane, nby * 8, nbx * 8)) - 128.0
        f = np.einsum("ij,xyjk,lk->xyil", d, blocks, d)
        q = np.round(f.reshape(nby, nbx, 64) / qtab).astype(np.int64)
        coefs.append(q[:, :, ZIGZAG])

    def emit(blk, ci: int) -> None:
        dct, act = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
        diff = int(blk[0]) - preds[ci]
        preds[ci] = int(blk[0])
        cat, extra = _magnitude(diff)
        code, ln = dct[cat]
        writer.write(code, ln)
        if cat:
            writer.write(extra, cat)
        run = 0
        last_nz = 0
        for i in range(63, 0, -1):
            if blk[i]:
                last_nz = i
                break
        for i in range(1, last_nz + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            cat, extra = _magnitude(v)
            code, ln = act[(run << 4) | cat]
            writer.write(code, ln)
            writer.write(extra, cat)
            run = 0
        if last_nz != 63:
            code, ln = act[0x00]  # EOB
            writer.write(code, ln)

    # interleaved MCUs: per MCU, each component contributes its
    # h_s×v_s block grid in raster order (4:4:4 degenerates to one
    # block each — byte-identical to the pre-420 encoder)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_plane, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        emit(coefs[ci][my * vs + by, mx * hs + bx], ci)
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    zz_q = bytes(quant for _ in range(64))
    out += seg(0xDB, b"\x00" + zz_q)  # DQT id 0
    if not gray:
        out += seg(0xDB, b"\x01" + zz_q)  # DQT id 1 (chroma)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        _p, hs, vs = comps[ci]
        sof += struct.pack(
            "BBB", ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1
        )
    out += seg(0xC0, sof)  # SOF0 baseline

    def dht(cls: int, tid: int, table) -> bytes:
        bits, huffval = table
        return seg(
            0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(huffval)
        )

    out += dht(0, 0, STD_DC_LUM) + dht(1, 0, STD_AC_LUM)
    if not gray:
        out += dht(0, 1, STD_DC_CHR) + dht(1, 1, STD_AC_CHR)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos) + scan + b"\xff\xd9"  # SOS + data + EOI
    return bytes(out)


def decode_jpeg_pixels(data: bytes):
    """Decode a baseline sequential JPEG (SOF0, 8-bit, sampling
    factors up to 2×2 — 4:4:4, 4:2:2, 4:4:0 and the dominant 4:2:0,
    chroma replicate-upsampled; no restart markers) to an (h, w)
    grayscale or (h, w, 3) RGB uint8 array. ValueError on
    progressive/arithmetic files, >2× sampling, and malformed
    payloads — the caller's PIL gate handles the rest of the format
    space."""
    import numpy as np  # noqa: PLC0415

    try:
        return _decode_jpeg_inner(data, np)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed JPEG payload: {e}") from e


def _decode_jpeg_inner(data: bytes, np):
    if data is None or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps = None
    scan_start = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # spec-legal 0xFF fill bytes may pad between segments: skip
        # them so the marker byte is the first non-FF after the run
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are stand-alone 2-byte tokens with no length
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment header")
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[prec_id & 0x0F] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=b + 1
                ).astype(np.float64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls_id = body[b]
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                htabs[(cls_id >> 4, cls_id & 0x0F)] = _huff_decode_table(
                    bits, huffval
                )
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, sampling, qid = struct.unpack_from(
                    "BBB", body, 6 + 3 * ci
                )
                hs, vs = sampling >> 4, sampling & 0x0F
                # 1- and 2-fold factors cover 4:4:4, 4:2:2, 4:4:0 and
                # the dominant 4:2:0; 3/4-fold layouts are exotic
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        "sampling factors beyond 2x2 unsupported"
                    )
                comps.append((cid, hs, vs, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)
            ]
            scan_start = pos
            break
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    reader = _BitReader(data[scan_start:])

    def read_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid Huffman code in JPEG stream")

    d = _dct_matrix()
    ncomp = len(comps)
    # a single-component scan is non-interleaved: the MCU is ONE data
    # unit and the declared sampling factors don't shape the layout
    layout = (
        [(1, 1)] if ncomp == 1 else [(hs, vs) for _c, hs, vs, _q in comps]
    )
    hmax = max(hs for hs, _ in layout)
    vmax = max(vs for _, vs in layout)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for hs, vs in layout
    ]
    preds = [0] * ncomp
    inv_zz = np.argsort(np.array(ZIGZAG))

    def decode_block(ci: int):
        _cid, td_ta = scan_comps[ci]
        dc_tab = htabs[(0, td_ta >> 4)]
        ac_tab = htabs[(1, td_ta & 0x0F)]
        qtab = qtabs[comps[ci][3]]
        zz = np.zeros(64, dtype=np.float64)
        cat = read_symbol(dc_tab)
        diff = _extend(reader.bits(cat), cat) if cat else 0
        preds[ci] += diff
        zz[0] = preds[ci]
        i = 1
        while i < 64:
            rs = read_symbol(ac_tab)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                i += 16
                continue
            run, cat = rs >> 4, rs & 0x0F
            i += run
            if i > 63:
                raise ValueError("AC run past block end")
            zz[i] = _extend(reader.bits(cat), cat)
            i += 1
        block = (zz * qtab)[inv_zz].reshape(8, 8)
        return d.T @ block @ d + 128.0

    # interleaved MCU walk mirroring the encoder: each component
    # contributes its h_s×v_s block grid per MCU in raster order
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hs, vs) in enumerate(layout):
                for by in range(vs):
                    for bx in range(hs):
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = decode_block(
                            ci
                        )
    # crop each component to its own resolution, then replicate-
    # upsample subsampled chroma back to full frame size
    full = []
    for (hs, vs), p in zip(layout, planes):
        ch = (h * vs + vmax - 1) // vmax
        cw = (w * hs + hmax - 1) // hmax
        p = p[:ch, :cw]
        if vs != vmax or hs != hmax:
            p = np.repeat(
                np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(p[:h, :w])
    planes = full
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
