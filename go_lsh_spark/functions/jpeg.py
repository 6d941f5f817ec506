"""Baseline JPEG (ITU T.81) decode in numpy + a minimal grayscale encoder.

Written against the public spec so the multimodal image path has a real
lossy-codec decoder in this no-codec-library sandbox (the PNG module's
pattern: spec-derived decoder + own test encoder so every path is testable
without external fixtures).

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with any
H/V subsampling factors up to 2, restart markers. Progressive (SOF2),
arithmetic coding, and 12-bit are out of scope and raise NotImplementedError.

The decoder is numpy-vectorized where it matters (dequant + IDCT run as one
einsum over ALL blocks of a component); the entropy decode is a Python bit
loop, which is fine for the sandbox's small fixtures -- on a real cluster
this whole function is replaced by libjpeg-turbo behind the same signature.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = linear index (row*8+col) of the k-th
# coefficient in scan order (generated, not transcribed, to avoid typos)


def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

# orthonormal DCT-II basis: A[u, x] = c(u) * cos((2x+1) u pi / 16)
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex K.1 luminance quantization table (in zigzag order it is usually
# shown; this is natural row-major order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical luminance Huffman tables: (BITS counts per code length
# 1..16, HUFFVAL symbol list)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huffman(bits: list[int], vals: list[int]):
    """(bits, vals) -> {(length, code): symbol} canonical decode map, and
    the canonical {symbol: (code, length)} encode map."""
    decode, encode = {}, {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            decode[(ln, code)] = vals[k]
            encode[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    de-stuffing; RST markers are consumed by reset()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG stream")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached: spec says pad with 1-bits (never consumed
                # by a well-formed stream)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def reset(self) -> None:
        """Byte-align and consume an RST marker."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and (
            d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7)
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG stream")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array: (h, w) for grayscale, (h, w, 3) RGB."""
    data = bytes(raw)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    frame = None
    dri = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, s + 1).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = nat.reshape(8, 8)
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                vals = list(seg[s + 17 : s + 17 + n])
                hufftabs[(tc, th)], _ = _build_huffman(bits, vals)
                s += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                # legal-but-unsupported factors (e.g. 3:2) would otherwise
                # fall through to integer-division upsampling and die with
                # an opaque numpy shape error; in {1,2} every factor divides
                # hmax/vmax, so the repeat() upsample is exact
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {ch}x{cv}: only 1..2 supported"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0}: baseline only")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            return _decode_scan(data, pos, frame, scan, qt, hufftabs, dri)
    raise ValueError("JPEG missing SOS")


def _decode_scan(data, pos, frame, scan, qt, hufftabs, dri) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per component: coefficient planes (zigzag-order ints) per block
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                r.reset()
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                dc_tab = hufftabs[(0, td)]
                ac_tab = hufftabs[(1, ta)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = r.decode(dc_tab)
                        diff = _extend(r.receive(t), t)
                        pred[comp["id"]] += diff
                        blk[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = r.decode(ac_tab)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(r.receive(ss), ss)
                            k += 1
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        comp["coef"][row * comp["bw"] + col] = blk
            n_mcu += 1
    # dequant + IDCT, vectorized across every block of each component
    planes = []
    for c in comps:
        nat = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        nat[:, ZIGZAG] = c["coef"]
        blocks = nat.reshape(-1, 8, 8) * qt[c["tq"]]
        spatial = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A)
        px = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample subsampled components to full MCU resolution
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder --


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality scaling of a base table."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((q * s + 50) // 100, 1, 255)


def _mag(v: int) -> tuple[int, int]:
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _emit_block(bw: _BitWriter, blk: np.ndarray, prev_dc: int, dc_enc, ac_enc) -> int:
    """Entropy-code one zigzag-ordered quantized block; returns the new DC
    predictor."""
    diff = int(blk[0]) - prev_dc
    t, bits = _mag(diff)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    last_nz = int(np.nonzero(blk[1:])[0][-1]) + 1 if np.any(blk[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _mag(v)
        code, ln = ac_enc[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return int(blk[0])


def _block_grid(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """level-shift -> FDCT -> quantize -> zigzag, for every 8x8 block of a
    padded plane; returns (rows, cols, 64)."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    q = np.round(coef / qtab).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
    return q.reshape(ph // 8, pw // 8, 64)


def _jpeg_headers(h, w, comps_sof, qtab, restart_interval) -> tuple[bytes, bytes]:
    """(header bytes up to and incl. SOS, trailing EOI). comps_sof is the
    per-component (id, hv, tq) byte triple list; one shared quant/huffman
    table id 0 for all components keeps the encoder minimal and legal."""

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz = np.empty(64, dtype=np.uint8)
    zz[:] = qtab.reshape(-1)[ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + zz.tobytes())
    nc = len(comps_sof)
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, nc)
        + b"".join(bytes(c) for c in comps_sof),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(
        0xDA,
        bytes([nc])
        + b"".join(bytes([c[0], 0x00]) for c in comps_sof)
        + bytes([0, 63, 0]),
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return b"\xff\xd8" + dqt + sof + dht + dri + sos, b"\xff\xd9"


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Minimal baseline grayscale JPEG encoder (Annex K tables) -- exists so
    decode_jpeg's huffman/dequant/IDCT/restart paths are testable without
    external fixtures, mirroring the PNG module's encoder-for-tests
    pattern. restart_interval emits a DRI segment and RSTn markers every
    that-many MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray takes (h, w) uint8")
    h, w = img.shape
    qtab = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    quant = _block_grid(padded, qtab).reshape(-1, 64)

    _, dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    _, ac_enc = _build_huffman(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    rst_n = 0
    for n_blk, blk in enumerate(quant):
        if restart_interval and n_blk and n_blk % restart_interval == 0:
            bw.out = bytearray(bw.flush())  # byte-align with 1-bit padding
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            prev_dc = 0
        prev_dc = _emit_block(bw, blk, prev_dc, dc_enc, ac_enc)

    head, tail = _jpeg_headers(h, w, [(1, 0x11, 0)], qtab, restart_interval)
    return head + bw.flush() + tail


def encode_jpeg_color420(img: np.ndarray, quality: int = 90) -> bytes:
    """Minimal baseline YCbCr 4:2:0 encoder (2x2-subsampled chroma, the
    common camera layout) -- exists to test decode_jpeg's multi-component
    interleave, chroma upsampling, and YCbCr->RGB paths."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_color420 takes (h, w, 3) uint8 RGB")
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # pad luma to 16 (the 4:2:0 MCU), box-downsample chroma by 2
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
    cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
    cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    qtab = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    yg = _block_grid(y, qtab)
    cbg = _block_grid(cb, qtab)
    crg = _block_grid(cr, qtab)

    _, dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    _, ac_enc = _build_huffman(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    pred[0] = _emit_block(
                        bw, yg[my * 2 + by, mx * 2 + bx], pred[0], dc_enc, ac_enc
                    )
            pred[1] = _emit_block(bw, cbg[my, mx], pred[1], dc_enc, ac_enc)
            pred[2] = _emit_block(bw, crg[my, mx], pred[2], dc_enc, ac_enc)

    head, tail = _jpeg_headers(
        h, w, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)], qtab, 0
    )
    return head + bw.flush() + tail
