"""Baseline JFIF (wire-format JPEG) codec, pure numpy + stdlib.

The reference encodes leaf blocks as stdlib JPEG quality-75
(``pkg/quadtreeImage/quadtreeElement.go:254``) and decodes them on the read
path (``quadtreeElement.go:284-310``). This container has no libjpeg/PIL, so
real-archive interop needs an own implementation of the public ITU T.81
baseline process:

* :func:`decode_jfif` — baseline sequential DCT decoder: DQT/DHT/SOF0/SOS
  parsing, Huffman entropy decode with byte-stuffing and restart markers,
  dequantize → zigzag → batched IDCT, chroma upsampling for any sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 / grayscale), BT.601 YCbCr→RGB. Handles
  what Go's ``image/jpeg`` encoder emits (baseline, 4:2:0) and standard
  encoder output generally (tables are read from the stream, never assumed).
* :func:`encode_jfif` — baseline sequential encoder, 4:4:4 or 4:2:0 (the
  Go-stdlib output layout — full wire parity with reference-produced
  archives), Annex-K quantization tables scaled by quality with the IJG
  formula, Annex-K Huffman tables (carried in DHT, so decoders need no
  assumptions either).

Interop is tested against an independent standard implementation — Java
ImageIO through the Spark JVM (``tests/test_jfif.py``) — in both
directions, plus PSNR round-trips on this codec alone.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import _quant_tables, _D, _rgb_to_ycbcr, _ycbcr_to_rgb

# ---------------------------------------------------------------- tables ----


def _zigzag_order() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        ys = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            ys = ys[::-1]
        out.extend((y, s - y) for y in ys)
    return out


_ZZ = _zigzag_order()                       # index -> (y, x)
_ZZ_FLAT = np.array([y * 8 + x for y, x in _ZZ], dtype=np.int64)

# Annex K.3 Huffman table specs (bits[16], values). The encoder writes these
# into DHT and the decoder always reads DHT, so the stream stays
# self-describing either way.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical Huffman assignment."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, code_length)."""
    enc, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return enc


# --------------------------------------------------------------- decoder ----


class _BitReader:
    """Entropy-coded segment reader: byte-stuffed, marker-aware."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # hit a marker inside entropy data
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def expect_rst(self, n: int) -> None:
        self.align()
        m = self.data[self.pos:self.pos + 2]
        if len(m) != 2 or m[0] != 0xFF or m[1] != 0xD0 + (n % 8):
            raise ValueError(f"expected RST{n % 8}, got {m.hex()}")
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat and v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def decode_jfif(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes → (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[dict] = []
    h_img = w_img = 0
    restart_interval = 0
    scan: list[dict] = []

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                t = np.zeros(64)
                t[_ZZ_FLAT] = vals  # DQT is stored in zigzag order
                qtables[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline)
            _prec, h_img, w_img, ncomp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0x{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
                c = by_id[cid]
                scan.append({**c, "td": tsel >> 4, "ta": tsel & 0xF})
            pos += seglen
            break  # entropy data follows
        pos += seglen
    if not scan:
        raise ValueError("no SOS found")
    if len(scan) not in (1, 3):
        raise NotImplementedError(
            f"{len(scan)}-component JPEG (CMYK/Adobe) not supported")

    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    # per-component dequantized coefficient grids, filled MCU by MCU
    grids = {c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8)) for c in scan}

    rst_count = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.expect_rst(rst_count)
            rst_count += 1
            preds = {c["id"]: 0 for c in scan}
        my, mx = divmod(mcu, mcus_x)
        for c in scan:
            dc_t = htables[(0, c["td"])]
            ac_t = htables[(1, c["ta"])]
            q = qtables[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64)
                    cat = _decode_huff(reader, dc_t)
                    diff = _extend(reader.receive(cat), cat) if cat else 0
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        sym = _decode_huff(reader, ac_t)
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        zz[k] = _extend(reader.receive(size), size)
                        k += 1
                    blk = np.zeros(64)
                    blk[_ZZ_FLAT] = zz
                    grids[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = \
                        blk.reshape(8, 8) * q

    # batched IDCT + plane assembly + chroma upsampling
    planes = []
    for c in scan:
        g = grids[c["id"]]
        px = np.einsum("ji,yxjk,kl->yxil", _D, g, _D, optimize=True) + 128.0
        by, bx = g.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h_img, :w_img])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes[:3], axis=-1)
    rgb = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return rgb


# --------------------------------------------------------------- encoder ----


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _plane_to_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted float plane → (H/8, W/8, 64) int32 zigzag-
    quantized DCT blocks (H, W multiples of 8)."""
    H, W = plane.shape
    blocks = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ij,yxjk,lk->yxil", _D, blocks, _D, optimize=True)
    qi = np.round(coefs / q).astype(np.int32)
    return qi.reshape(H // 8, W // 8, 64)[..., _ZZ_FLAT]


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  enc_dc: dict, enc_ac: dict) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    dc = int(blk[0])
    diff = dc - pred
    cat = _category(diff)
    code, ln = enc_dc[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = enc_ac[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jfif(img: np.ndarray, quality: int = 75,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB → baseline JFIF bytes.

    ``subsampling``: ``"444"`` (one 8×8 MCU, chroma at full resolution) or
    ``"420"`` (16×16 MCU: four Y blocks + 2×2-box-downsampled Cb, Cr — the
    layout Go's stdlib encoder emits, ``quadtreeElement.go:254``, so output
    is wire-compatible with reference-produced archives in both directions).

    ``restart_interval``: if > 0, emit a DRI segment and an RSTn marker
    every that many MCUs (T.81 §B.2.4.4/§E.1.4): byte-align with 1-fill
    bits, cycle RST0–RST7, reset every DC predictor. Restart markers make
    the entropy stream independently decodable per interval — the
    parallel-decode hook — and are required for byte-level interop with
    encoders that default DRI on.
    """
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in [0, 65535]")
    img = np.ascontiguousarray(img[:, :, :3], dtype=np.uint8)
    h, w = img.shape[:2]
    mcu = 8 if subsampling == "444" else 16
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded.astype(np.float64)) - 128.0
    qy, qc = _quant_tables(quality)

    enc_dc = [_build_encode_table(*_DC_LUM), _build_encode_table(*_DC_CHR)]
    enc_ac = [_build_encode_table(*_AC_LUM), _build_encode_table(*_AC_CHR)]
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = [0]  # next RSTn index (mod 8)

    def maybe_restart(mcu_idx: int) -> None:
        # T.81 §E.1.4: byte-align (1-fill), emit RSTn, reset DC predictors
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst[0] % 8)])
            rst[0] += 1
            preds[:] = [0, 0, 0]

    if subsampling == "444":
        zz = [_plane_to_zz(ycc[:, :, ci], qy if ci == 0 else qc)
              for ci in range(3)]
        for by in range(ph // 8):
            for bx in range(pw // 8):
                maybe_restart(by * (pw // 8) + bx)
                for ci in range(3):
                    t = 0 if ci == 0 else 1
                    preds[ci] = _encode_block(bw, zz[ci][by, bx], preds[ci],
                                              enc_dc[t], enc_ac[t])
        samp = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:  # 420
        zz_y = _plane_to_zz(ycc[:, :, 0], qy)
        # 2×2 box downsample for each chroma plane (ph/pw are 16-aligned)
        chroma = [ycc[:, :, ci].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                  for ci in (1, 2)]
        zz_c = [_plane_to_zz(c, qc) for c in chroma]
        for my in range(ph // 16):
            for mx in range(pw // 16):
                maybe_restart(my * (pw // 16) + mx)
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            bw, zz_y[2 * my + by, 2 * mx + bx], preds[0],
                            enc_dc[0], enc_ac[0])
                for ci in (1, 2):
                    preds[ci] = _encode_block(bw, zz_c[ci - 1][my, mx],
                                              preds[ci], enc_dc[1], enc_ac[1])
        samp = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    bw.flush()

    def dqt(tid: int, t: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(t.reshape(64)[i]) for i in _ZZ_FLAT)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    sof = struct.pack(">BHHB", 8, h, w, 3) + samp
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dri = (_seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8"
            + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + _seg(0xDB, dqt(0, qy)) + _seg(0xDB, dqt(1, qc))
            + _seg(0xC0, sof)
            + _seg(0xC4, dht(0, 0, _DC_LUM)) + _seg(0xC4, dht(1, 0, _AC_LUM))
            + _seg(0xC4, dht(0, 1, _DC_CHR)) + _seg(0xC4, dht(1, 1, _AC_CHR))
            + dri
            + _seg(0xDA, sos) + bytes(bw.out) + b"\xff\xd9")
