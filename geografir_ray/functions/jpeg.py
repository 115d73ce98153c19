"""Pure-Python baseline JPEG codec (numpy only) — the last media
format gap closed with a REAL implementation of the public ITU-T T.81
(JPEG) specification + JFIF container.

Encoder: baseline sequential DCT, 8-bit, greyscale or YCbCr 4:4:4
(BT.601 full-range), per-image OPTIMAL Huffman tables (libjpeg's
"optimize" mode — counts → length-limited canonical codes, emitted in
DHT, all-ones codeword reserved per the spec), Annex-K-style
quantization scaled by the usual quality formula.  Deterministic:
identical input → identical bytes.

Decoder: any baseline sequential JPEG — arbitrary DHT/DQT, 1 or 3
components, chroma subsampling factors 1-2 in each axis (2x2 / 2x1 /
1x2 / 1x1), restart intervals (DRI/RSTn), 16-bit quant tables.
Progressive / arithmetic / 12-bit modes are rejected loudly.

Heavy math (DCT/IDCT, dequantize, color transform, upsample) is
batched numpy over all blocks at once; only the entropy-coded symbol
stream walks a Python loop.  At pipeline level the cost amortizes
across an actor pool (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex-K-style base quantization tables (embedded in DQT, so the
# decoder never depends on these exact values)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT-II coefficients."""
    return _C @ blocks @ _C.T


def _idct2(coefs: np.ndarray) -> np.ndarray:
    return _C.T @ coefs @ _C


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman (canonical, length-limited to 16 — libjpeg's optimize path)
# ---------------------------------------------------------------------------


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """symbol→count → (BITS[1..16] counts, symbols in canonical order).

    A dummy symbol (256) with count 1 takes the all-ones longest code,
    reserving it per T.81; it is dropped from the emitted table.
    """
    counts = dict(freqs)
    counts[256] = 1
    # classic Huffman by repeated merge (small alphabets — fine)
    nodes = [[c, [s]] for s, c in counts.items() if c > 0]
    lengths = {s: 0 for s, c in counts.items() if c > 0}
    if len(nodes) == 1:
        lengths[nodes[0][1][0]] = 1
    while len(nodes) > 1:
        nodes.sort(key=lambda n: (n[0], min(n[1])))
        a = nodes.pop(0)
        b = nodes.pop(0)
        for s in a[1] + b[1]:
            lengths[s] += 1
        nodes.append([a[0] + b[0], a[1] + b[1]])
    # length-limit to 16 (libjpeg jpeg_gen_optimal_table adjustment)
    bits = [0] * 33
    for s, l in lengths.items():
        bits[min(l, 32)] += 1
    for l in range(32, 16, -1):
        while bits[l] > 0:
            j = l - 2
            while bits[j] == 0:
                j -= 1
            bits[l] -= 2
            bits[l - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # drop the dummy's slot from the longest used length
    for l in range(16, 0, -1):
        if bits[l] > 0:
            bits[l] -= 1
            break
    # canonical symbol order: by code length, then symbol value —
    # rebuild per-symbol lengths consistent with the adjusted BITS
    by_len = sorted(
        (l, s) for s, l in lengths.items() if s != 256
    )
    symbols = [s for _, s in by_len]
    out_bits = [0] * 17
    i = 0
    for l in range(1, 17):
        take = bits[l]
        out_bits[l] = take
        i += take
    assert i == len(symbols), "huffman table construction mismatch"
    return out_bits[1:], symbols


def _assign_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """canonical (BITS, symbols) → symbol: (code, length)."""
    out = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            out[symbols[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a marker: stop feeding real data
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self):
        """Drop partial byte and any stuffing before an RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _receive_extend(r: "_BitReader", s: int) -> int:
    if s == 0:
        return 0
    v = r.read(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    pad = np.empty((bh * 8, bw * 8), dtype=np.float64)
    pad[:h, :w] = plane
    pad[h:, :w] = plane[h - 1 : h, :]  # edge-replicate padding
    pad[:, w:] = pad[:, w - 1 : w]
    blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _symbolize(coefs_q: np.ndarray):
    """(n,64) zigzagged quantized coefs → per-block symbol lists and
    global DC/AC frequency counts."""
    n = coefs_q.shape[0]
    dc_syms = np.zeros(n, dtype=np.int64)
    prev = 0
    seqs = []
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    for i in range(n):
        row = coefs_q[i]
        diff = int(row[0]) - prev
        prev = int(row[0])
        s = int(diff).bit_length() if diff > 0 else int(-diff).bit_length()
        dc_syms[i] = s
        dc_freq[s] = dc_freq.get(s, 0) + 1
        ac = []
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac.append((0xF0, 0, 0))
                ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                run -= 16
            sz = abs(v).bit_length()
            sym = (run << 4) | sz
            ac.append((sym, v, sz))
            ac_freq[sym] = ac_freq.get(sym, 0) + 1
            run = 0
        if last < 63:
            ac.append((0x00, 0, 0))
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
        seqs.append((diff, s, ac))
    return seqs, dc_freq, ac_freq


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (H,W) greyscale or (H,W,3) RGB → baseline JFIF bytes."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_jpeg: uint8 only, got {a.dtype}")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError(f"encode_jpeg: shape {arr.shape} unsupported")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    ncomp = len(planes)

    qt = [_quality_scale(QT_LUMA, quality)]
    if ncomp == 3:
        qt.append(_quality_scale(QT_CHROMA, quality))

    comp_data = []
    for ci, plane in enumerate(planes):
        q = qt[0] if ci == 0 else qt[1]
        blocks, bh, bw = _to_blocks(plane)
        coefs = _dct2(blocks - 128.0)
        cq = np.round(coefs / q[None, :, :]).astype(np.int64)
        zz = cq.reshape(-1, 64)[:, ZIGZAG]
        comp_data.append(zz)

    # interleave symbols per MCU (4:4:4 → one block per component per MCU)
    # gather per-component symbol streams + joint freq tables
    streams = []
    dc_freqs = [dict() for _ in range(min(ncomp, 2))]
    ac_freqs = [dict() for _ in range(min(ncomp, 2))]
    for ci, zz in enumerate(comp_data):
        ti = 0 if ci == 0 else 1
        seqs, dcf, acf = _symbolize(zz)
        streams.append(seqs)
        for k, v in dcf.items():
            dc_freqs[ti][k] = dc_freqs[ti].get(k, 0) + v
        for k, v in acf.items():
            ac_freqs[ti][k] = ac_freqs[ti].get(k, 0) + v

    ntab = min(ncomp, 2)
    dc_tables = [_build_huffman(dc_freqs[i]) for i in range(ntab)]
    ac_tables = [_build_huffman(ac_freqs[i]) for i in range(ntab)]
    dc_codes = [_assign_codes(*t) for t in dc_tables]
    ac_codes = [_assign_codes(*t) for t in ac_tables]

    wtr = _BitWriter()
    nblocks = len(streams[0])
    for bi in range(nblocks):
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            diff, s, ac = streams[ci][bi]
            code, ln = dc_codes[ti][s]
            wtr.write(code, ln)
            if s:
                amp = diff if diff > 0 else diff + (1 << s) - 1
                wtr.write(amp, s)
            for sym, v, sz in ac:
                code, ln = ac_codes[ti][sym]
                wtr.write(code, ln)
                if sz:
                    amp = v if v > 0 else v + (1 << sz) - 1
                    wtr.write(amp, sz)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qt):
        out += seg(0xFFDB, bytes([ti]) + bytes(int(v) for v in q.reshape(-1)[ZIGZAG]))
    comps = b""
    for ci in range(ncomp):
        comps += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    for ti in range(ntab):
        bits, syms = dc_tables[ti]
        out += seg(0xFFC4, bytes([ti]) + bytes(bits) + bytes(syms))
        bits, syms = ac_tables[ti]
        out += seg(0xFFC4, bytes([0x10 | ti]) + bytes(bits) + bytes(syms))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    __slots__ = ("maxcode", "mincode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        # T.81 F.2.2.3 decode tables
        code = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        k = 0
        for l in range(1, 17):
            if bits[l - 1] == 0:
                self.maxcode[l] = -1
            else:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1
        self.values = values

    def decode(self, r: _BitReader) -> int:
        code = r.read(1)
        l = 1
        while code > self.maxcode[l]:
            if l >= 16:
                raise ValueError("decode_jpeg: corrupt entropy stream")
            code = (code << 1) | r.read(1)
            l += 1
        return self.values[self.valptr[l] + code - self.mincode[l]]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → uint8 (H,W) or (H,W,3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("decode_jpeg: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + ln]
        seg_end = pos + ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(payload, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    vals = np.frombuffer(payload, ">u2", 64, p).astype(np.int64)
                    p += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals
                qts[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"decode_jpeg: {prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("decode_jpeg: only baseline sequential is supported")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            pos = seg_end
            break
        pos = seg_end
    if comps is None or scan_comps is None:
        raise ValueError("decode_jpeg: missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("decode_jpeg: sampling factors > 2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_comps:
        c = by_id[cs]
        order.append((c, huff[(0, td)], huff[(1, ta)]))

    # coefficient storage per component
    store = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        store.append(np.zeros((bh * bw, 64), dtype=np.int64))

    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_marker()
                preds = [0] * len(comps)
            for ci, (c, dct, act) in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = np.zeros(64, dtype=np.int64)
                        s = dct.decode(r)
                        diff = _receive_extend(r, s)
                        preds[ci] += diff
                        row[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = act.decode(r)
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("decode_jpeg: AC index overflow")
                            row[k] = _receive_extend(r, sz)
                            k += 1
                        bw = mcux * c["h"]
                        bi = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        store[ci][bi] = row
            mcu_count += 1

    planes = []
    for ci, c in enumerate(comps):
        q = qts[c["tq"]]
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        coefs = np.zeros((bh * bw, 64), dtype=np.float64)
        coefs[:, ZIGZAG] = store[ci]
        spatial = _idct2(coefs.reshape(-1, 8, 8) * q[None, :, :]) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
