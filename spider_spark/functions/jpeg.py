"""Dependency-free baseline JPEG codec (ITU-T T.81 / JFIF) — closes the
LAST stubbed image format at the multimodal decode boundary: PNG decodes
through functions/png.py, WAV through functions/wav.py, MPNG video
through the container parser, and JPEG — the format the reference
crawler actually writes to disk (share_func.py:224-242 saveImage
response.content passthrough) — previously hit the strict
NotImplementedError guard.

Public-knowledge implementation of baseline sequential DCT mode:
  - markers: SOI/APP0(JFIF)/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI
  - canonical Huffman entropy coding with 0xFF00 byte stuffing
  - 8x8 type-II DCT via the orthonormal basis-matrix product
  - grayscale (1 component) and YCbCr 4:4:4 / 4:2:0 (BT.601)
  - restart intervals (DRI + RSTn, DC-predictor reset)

The encoder uses flat quantization tables (default step 8) and fixed
single-length canonical Huffman tables (12 DC symbols at 4 bits, 162 AC
symbols at 8 bits) — legal per T.81 since DHT carries the tables; the
decoder reads DHT generically so it also accepts Annex-K-style tables
from other producers.  Flat step 8 makes constant 8x8 blocks roundtrip
EXACTLY (DC = 8*(v-128) is a multiple of the step; AC quantize to 0),
which is what the m8 oracle exploits.  Progressive (SOF2) and arithmetic
coding are out of scope and raise with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 3 and bytes(data[:3]) == JPEG_MAGIC


# ------------------------------------------------------------- DCT basis
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    a = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    a[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return a


_A = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(..., 8, 8) spatial -> coefficients: C = A @ X @ A.T"""
    return np.einsum("ij,...jk,lk->...il", _A, blocks, _A)


def _idct(coefs: np.ndarray) -> np.ndarray:
    """(..., 8, 8) coefficients -> spatial: X = A.T @ C @ A"""
    return np.einsum("ji,...jk,kl->...il", _A, coefs, _A)


def _zigzag_order() -> np.ndarray:
    """Flat (row-major) indices of the 64 coefficients in zigzag order."""
    cells: list[tuple[int, int]] = []
    for d in range(15):
        diag = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        if d % 2 == 0:
            diag.reverse()
        cells.extend(diag)
    return np.array([i * 8 + j for i, j in cells], dtype=np.int64)


_ZIGZAG = _zigzag_order()

# ------------------------------------------- fixed encoder Huffman tables
# Canonical single-length tables: every DC category (0..11) gets a 4-bit
# code, every AC run/size symbol gets an 8-bit code.  Kraft holds
# (12 <= 2^4, 162 <= 2^8) and no code is the all-ones reserved word.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
] + [0xF0]
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # counts for lengths 1..16
_AC_BITS = [0] * 7 + [162] + [0] * 8


def _fixed_code(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (idx, length) for idx, sym in enumerate(symbols)}


_DC_CODE = _fixed_code(_DC_SYMBOLS, 4)
_AC_CODE = _fixed_code(_AC_SYMBOLS, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _write_coef(bw: _BitWriter, v: int, size: int) -> None:
    bw.write(v if v >= 0 else v + (1 << size) - 1, size)


def _encode_block(bw: _BitWriter, zz: np.ndarray, dc_pred: int) -> int:
    dc = int(zz[0])
    diff = dc - dc_pred
    size = _category(diff)
    code, ln = _DC_CODE[size]
    bw.write(code, ln)
    _write_coef(bw, diff, size)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODE[0xF0]
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = _AC_CODE[(run << 4) | size]
        bw.write(code, ln)
        _write_coef(bw, v, size)
        run = 0
    if last < 63:
        code, ln = _AC_CODE[0x00]
        bw.write(code, ln)
    return dc


# ------------------------------------------------------------- encoder
def _plane_to_blocks(plane: np.ndarray, quant: int) -> np.ndarray:
    """Pad a (h, w) float plane to 8-multiples (edge replication), FDCT,
    quantize; returns (by, bx, 64) int32 in zigzag order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = _fdct(blocks)
    q = np.round(coefs / quant).astype(np.int32)
    return q.reshape(by, bx, 64)[..., _ZIGZAG]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([tc_th, *bits, *symbols])


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def encode_jpeg(
    px: np.ndarray,
    quant: int = 8,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential encode.  px: (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB.  subsample=True emits 4:2:0 (2x2-mean chroma),
    else 4:4:4.  restart_interval > 0 emits DRI + RSTn every N MCUs."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        tq = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        y, cb, cr = (np.round(p).clip(0, 255) for p in (y, cb, cr))
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = np.round(cb.reshape(-1, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3)))
            cr = np.round(cr.reshape(-1, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3)))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        tq = [0, 1, 1]

    h_max = max(s[0] for s in samp)
    v_max = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * h_max))
    mcus_y = -(-h // (8 * v_max))

    blocks = []
    for plane, (hc, vc) in zip(planes, samp):
        need_h, need_w = mcus_y * vc * 8, mcus_x * hc * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        blocks.append(_plane_to_blocks(plane, quant))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qt_zz = bytes(np.full(64, quant, dtype=np.uint8))
    out += _seg(0xFFDB, b"\x00" + qt_zz)
    if not gray:
        out += _seg(0xFFDB, b"\x01" + qt_zz)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tq[ci]])
    out += _seg(0xFFC0, sof)
    dht = _dht_payload(0x00, _DC_BITS, _DC_SYMBOLS) + _dht_payload(
        0x10, _AC_BITS, _AC_SYMBOLS
    )
    if not gray:
        dht += _dht_payload(0x01, _DC_BITS, _DC_SYMBOLS) + _dht_payload(
            0x11, _AC_BITS, _AC_SYMBOLS
        )
    out += _seg(0xFFC4, dht)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tab = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, tab])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            bw.buf += struct.pack(">H", 0xFFD0 + rst)
            rst = (rst + 1) % 8
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci in range(ncomp):
            hc, vc = samp[ci]
            for byy in range(vc):
                for bxx in range(hc):
                    zz = blocks[ci][my * vc + byy, mx * hc + bxx]
                    preds[ci] = _encode_block(bw, zz, preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder
class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = self.read_bits(size)
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.n = 0
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _build_huff(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """DHT (BITS counts per length 1..16 + symbols) -> canonical
    {(length, code): symbol} lookup."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = symbols[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential decode -> (h, w, 3) uint8 RGB (grayscale is
    replicated across channels).  Raises NotImplementedError on
    progressive (SOF2) / arithmetic streams, ValueError on corrupt data."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(id, hc, vc, tq), ...])
    restart_interval = 0

    while True:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG not supported")
        if marker in (0xC9, 0xCB, 0xCD):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                off += 1
                if pq:
                    vals = np.frombuffer(body[off : off + 128], dtype=">u2").astype(
                        np.float64
                    )
                    off += 128
                else:
                    vals = np.frombuffer(body[off : off + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    off += 64
                nat = np.empty(64, dtype=np.float64)
                nat[_ZIGZAG] = vals
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nsym = sum(bits)
                symbols = list(body[off + 17 : off + 17 + nsym])
                huff[tc_th] = _build_huff(bits, symbols)
                off += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            precision, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                scan[cid] = (tabs >> 4, tabs & 15)
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qtables, huff, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(data, pos, frame, scan, qtables, huff, restart_interval):
    fh, fw, comps = frame
    h_max = max(c[1] for c in comps)
    v_max = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * h_max))
    mcus_y = -(-fh // (8 * v_max))
    reader = _BitReader(data, pos)

    coef = [
        np.zeros((mcus_y * vc, mcus_x * hc, 64), dtype=np.float64)
        for _, hc, vc, _ in comps
    ]
    preds = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.sync_restart()
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, hc, vc, _tq) in enumerate(comps):
            dc_tab = huff[0x00 | scan[cid][0]]
            ac_tab = huff[0x10 | scan[cid][1]]
            for byy in range(vc):
                for bxx in range(hc):
                    zz = coef[ci][my * vc + byy, mx * hc + bxx]
                    size = reader.read_symbol(dc_tab)
                    preds[ci] += reader.receive_extend(size)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(ac_tab)
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        zz[k] = reader.receive_extend(size)
                        k += 1

    planes = []
    for ci, (_cid, hc, vc, tq) in enumerate(comps):
        nat = np.empty_like(coef[ci])
        nat[..., _ZIGZAG] = coef[ci]
        by, bx = nat.shape[0], nat.shape[1]
        dq = nat.reshape(by, bx, 8, 8) * qtables[tq]
        spatial = _idct(dq) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full-resolution grid (nearest / pixel replication)
        ry, rx = v_max // vc, h_max // hc
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        g = np.round(planes[0]).clip(0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.round(rgb).clip(0, 255).astype(np.uint8)
