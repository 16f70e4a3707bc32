"""Pure-stdlib JPEG decoder: baseline/extended sequential (SOF0/SOF1) AND
progressive (SOF2), Huffman, 8-bit.

Removes the PIL runtime dependency for the JPEG variants real corpora
actually contain — sequential (what cameras and libjpeg default output
emit) and progressive (what web optimizers emit). Supported:

- 1-component (grayscale) and 3-component (YCbCr) frames
- arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 chroma subsampling)
- 8- and 16-bit quantization tables, multiple DQT/DHT segments
- restart markers (DRI) with DC-predictor + bit-alignment reset
- byte stuffing (FF 00) in the entropy stream
- progressive spectral selection + successive approximation: DC/AC first
  and refinement scans (EOB runs, ZRL-interleaved correction bits —
  spec G.1.2.2/G.1.2.3), accumulated per-component, one batched IDCT at
  the end

NOT supported (raise NotImplementedError so `media._decode_bytes` can fall
back to PIL when it exists): lossless/hierarchical SOFs, arithmetic
coding, 12-bit precision, multi-scan SEQUENTIAL files (non-interleaved
sequential scans — rare libjpeg scan-script output; progressive
multi-scan IS supported).

The per-block Huffman walk is a Python bit reader — fine for the feature
path's thumbnails (decode cost is per-image, Arrow-batched across the
cluster via mapInPandas); a production cluster image with pillow installed
still routes non-baseline files there.

Reference for this engine's media surface: the reference repo has no media
decode at all — this extends the north-rule interleaved-document model
(media spans as opaque binary + typed metadata).
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: natural (row-major) position of each scan index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_SOF_UNSUPPORTED = {
    0xC3: "lossless",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}

_IDCT_M = None


def _idct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M[u, x] = c(u)/2 cos((2x+1)uπ/16);
    spatial = M.T @ coeffs @ M (coeffs indexed [vertical, horizontal])."""
    global _IDCT_M
    if _IDCT_M is None:
        x = np.arange(8)
        m = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
        m[0] *= 1.0 / np.sqrt(2.0)
        _IDCT_M = m
    return _IDCT_M


def build_huffman(counts, symbols) -> dict:
    """Canonical JPEG Huffman table: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _Bits:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed); reads past the end return 0 bits (spec-sanctioned pad)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read1(self) -> int:
        if self.pos >= self.n:
            self.pos += 1
            return 0
        b = self.data[self.pos >> 3]
        bit = (b >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read1()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read1()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude extension (spec F.12): top bit 0 => negative."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded segments after SOS, split at restart markers, with
    FF 00 byte stuffing removed; stops at any other marker (EOI/next SOS).
    Returns (segments, index of the terminating marker's 0xFF byte)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_block(bits: _Bits, dc_tbl: dict, ac_tbl: dict, pred: int) -> tuple[int, np.ndarray]:
    """One 8x8 block -> (new DC predictor, zigzag-order int coefficients)."""
    t = bits.huff(dc_tbl)
    dc = pred + (_extend(bits.read(t), t) if t else 0)
    zz = np.zeros(64, dtype=np.int32)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = bits.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            break
        zz[k] = _extend(bits.read(s), s)
        k += 1
    return dc, zz


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array (h, w) grayscale or (h, w, 3) RGB.

    Handles baseline/extended sequential (SOF0/SOF1, single scan) AND
    progressive (SOF2: spectral selection + successive approximation —
    DC/AC first and refinement scans accumulated into per-component
    coefficient arrays, one IDCT at the end). The name is historical —
    kept because it is the public swap point `media._decode_bytes` uses.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    coef = None  # progressive: per-component zigzag coefficient arrays
    eobrun_box = [0]
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker == 0xD9 and progressive and coef is not None:  # EOI
            return _finish_progressive(frame, qt, coef)
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
            continue  # fill bytes, TEM, RSTn, SOI/EOI — no payload
        (ln,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + ln]
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG variant not supported by the stdlib decoder: "
                f"{_SOF_UNSUPPORTED[marker]} (SOF{marker - 0xC0})"
            )
        if marker == 0xDB:  # DQT (tables stored in zigzag order)
            pos = 0
            while pos < len(seg):
                pq, tq = seg[pos] >> 4, seg[pos] & 15
                pos += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, pos).astype(np.int32)
                    pos += 64
                else:
                    qt[tq] = np.frombuffer(seg, ">u2", 64, pos).astype(np.int32)
                    pos += 128
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8-bit)")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT
            pos = 0
            while pos < len(seg):
                tc, th = seg[pos] >> 4, seg[pos] & 15
                pos += 1
                counts = list(seg[pos : pos + 16])
                pos += 16
                nsym = sum(counts)
                syms = list(seg[pos : pos + nsym])
                pos += nsym
                (huff_dc if tc == 0 else huff_ac)[th] = build_huffman(counts, syms)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            scan_order = []
            for c in range(ns):
                cs, t = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (t >> 4, t & 15)
                scan_order.append(cs)
            if not progressive:
                if ns < len(frame[2]):
                    # multi-scan sequential (non-interleaved scans, spec
                    # A.2.2): this decoder codes one interleaved scan only;
                    # NotImplementedError (not KeyError) so media's
                    # documented PIL fallback engages when PIL exists
                    raise NotImplementedError(
                        "multi-scan sequential JPEG (scan covers "
                        f"{ns}/{len(frame[2])} frame components)"
                    )
                return _decode_scan(
                    data, i + ln, frame, qt, huff_dc, huff_ac, scan, restart_interval
                )
            if coef is None:
                coef = _alloc_coef(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            i = _decode_progressive_scan(
                data, i + ln, frame, coef, huff_dc, huff_ac, scan, scan_order,
                (ss, se, ahal >> 4, ahal & 15), restart_interval,
            )
            continue
        i += ln
    if progressive and coef is not None:  # truncated file without EOI
        return _finish_progressive(frame, qt, coef)
    raise ValueError("JPEG has no SOS scan")


#: alias — the decoder covers sequential AND progressive JPEG
decode_jpeg = decode_baseline_jpeg


def _comp_geometry(frame):
    """Per-component block geometry: padded (MCU-aligned) grid and the TRUE
    grid (spec A.2.2 — non-interleaved scans code only the true blocks)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)  # component samples, ceil
        ch = -(-h * c["v"] // vmax)
        geo.append({
            "pad_bx": mcus_x * c["h"], "pad_by": mcus_y * c["v"],
            "true_bx": -(-cw // 8), "true_by": -(-ch // 8),
        })
    return mcus_x, mcus_y, geo


def _alloc_coef(frame):
    _, _, geo = _comp_geometry(frame)
    return [
        np.zeros((g["pad_by"], g["pad_bx"], 64), dtype=np.int32) for g in geo
    ]


def _decode_progressive_scan(
    data, pos, frame, coef, huff_dc, huff_ac, scan, scan_order, band, restart_interval
):
    """One progressive SOS: fills `coef` in place, returns the index of the
    marker that terminated the entropy data (spec G.2: DC scans may be
    interleaved, AC scans are always single-component / non-interleaved)."""
    h, w, comps = frame
    ss, se, ah, al = band
    mcus_x, mcus_y, geo = _comp_geometry(frame)
    segs, end = _entropy_segments(data, pos)
    seg_i = 0
    bits = _Bits(segs[0])
    eob = [0]  # EOB run shared across blocks, reset at restarts

    in_scan = [ci for ci, c in enumerate(comps) if c["id"] in scan]
    interleaved = len(in_scan) > 1

    def restart_check(unit, preds):
        nonlocal bits, seg_i
        if restart_interval and unit and unit % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG truncated: missing restart segment")
            bits = _Bits(segs[seg_i])
            preds[:] = [0] * len(preds)
            eob[0] = 0

    if ss == 0:  # DC scan (first or refinement)
        preds = [0] * len(comps)
        if interleaved:
            # iterate MCU-major with restart on MCU boundaries
            for mcu in range(mcus_x * mcus_y):
                restart_check(mcu, preds)
                my, mx = divmod(mcu, mcus_x)
                for ci in in_scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coef[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _dc_unit(bits, huff_dc, scan, c, preds, ci, blk, ah, al)
        else:
            ci = in_scan[0]
            g = geo[ci]
            for u in range(g["true_by"] * g["true_bx"]):
                restart_check(u, preds)
                by, bx = divmod(u, g["true_bx"])
                _dc_unit(bits, huff_dc, scan, comps[ci], preds, ci, coef[ci][by, bx], ah, al)
    else:  # AC scan — always non-interleaved (one component)
        if interleaved:
            raise ValueError("progressive AC scan with >1 component")
        ci = in_scan[0]
        g = geo[ci]
        ac_tbl = huff_ac[scan[comps[ci]["id"]][1]]
        dummy = [0]
        for u in range(g["true_by"] * g["true_bx"]):
            restart_check(u, dummy)
            by, bx = divmod(u, g["true_bx"])
            zz = coef[ci][by, bx]
            if ah == 0:
                _ac_first(bits, ac_tbl, zz, ss, se, al, eob)
            else:
                _ac_refine(bits, ac_tbl, zz, ss, se, al, eob)
    return end


def _dc_unit(bits, huff_dc, scan, c, preds, ci, blk, ah, al):
    if ah == 0:  # DC first: diff-coded, stored at Al precision
        t = bits.huff(huff_dc[scan[c["id"]][0]])
        preds[ci] += _extend(bits.read(t), t) if t else 0
        blk[0] = preds[ci] << al
    else:  # DC refinement: one bit per block
        if bits.read1():
            blk[0] |= 1 << al


def _ac_first(bits, ac_tbl, zz, ss, se, al, eob):
    """AC first scan for one block (spec G.1.2.2): EOB runs + new coeffs."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = bits.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob[0] = (1 << r) - 1  # EOBn: covers this block + (run-1) more
            if r:
                eob[0] += bits.read(r)
            break
        k += r
        if k > se:
            break
        zz[k] = _extend(bits.read(s), s) << al
        k += 1


def _ac_refine(bits, ac_tbl, zz, ss, se, al, eob):
    """AC refinement scan for one block (spec G.1.2.3): correction bits for
    history-nonzero coefficients, +-1<<Al insertions for new ones."""
    p1, m1 = 1 << al, -1 << al

    def correct(k_):
        if bits.read1() and (int(zz[k_]) & p1) == 0:
            zz[k_] += p1 if zz[k_] >= 0 else m1

    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = bits.huff(ac_tbl)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:  # EOBn
                    eob[0] = 1 << r
                    if r:
                        eob[0] += bits.read(r)
                    break
                s = 0  # ZRL: skip 16 zero-history coeffs below
            else:
                s = p1 if bits.read1() else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = s
            k += 1
    if eob[0] > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eob[0] -= 1


def _finish_progressive(frame, qt, coef):
    """Dequantize + batch-IDCT the accumulated coefficients, assemble."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    m = _idct_mat()
    full = []
    for ci, c in enumerate(comps):
        zz = coef[ci].astype(np.float64) * qt[c["tq"]][None, None, :]
        by, bx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        blocks = nat.reshape(by, bx, 8, 8)
        # batched 2-D IDCT: spatial = M.T @ C @ M per 8x8 block
        spat = np.einsum("ij,abjk,kl->abil", m.T, blocks, m) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components (1 or 3 only)")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, qt, huff_dc, huff_ac, scan, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    m = _idct_mat()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    segs, _ = _entropy_segments(data, pos)
    seg_i = 0
    bits = _Bits(segs[0])
    preds = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG truncated: missing restart segment")
            bits = _Bits(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            dc_t, ac_t = scan[c["id"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    preds[ci], zz = _decode_block(
                        bits, huff_dc[dc_t], huff_ac[ac_t], preds[ci]
                    )
                    nat = np.zeros(64, dtype=np.float64)
                    nat[ZIGZAG] = zz * q  # dequantize in zigzag domain
                    coef = nat.reshape(8, 8)
                    blk = m.T @ coef @ m + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
    # upsample each component to full MCU-grid resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components (1 or 3 only)")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# minimal baseline ENCODER: synthetic-media generation for tests, benches and
# oracle fixtures (constant-color frames round-trip EXACTLY through the
# decoder at qval=1 — pinned in tests/test_jpeg.py). Standard DCT + canonical
# Huffman tables built from scratch; not a general-purpose compressor.
# ---------------------------------------------------------------------------

# DC: symbols 0..11, all 4-bit codes; AC: all 162 standard (run,size)
# symbols, all 8-bit codes (canonical codes 0..161 — never all-ones)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_COUNTS = [0] * 16
_AC_COUNTS[7] = len(_AC_SYMS)  # all length 8


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s (spec)


def _fdct_quant(block, q):
    m = _idct_mat()
    coef = m @ (block - 128.0) @ m.T
    zz = coef.ravel()[ZIGZAG]
    return np.round(zz / q).astype(np.int64)


def _rgb_to_ycbcr(img):
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_to(p, hh, ww):
    return np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")


def _downsample(p, fy, fx):
    h, w = p.shape
    hh, ww = -(-h // fy) * fy, -(-w // fx) * fx
    p = _pad_to(p, hh, ww)
    return p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def encode_baseline_jpeg(img, sampling=(1, 1), qval=1, restart_interval=0):
    """Minimal baseline JFIF encoder: quant table = constant qval, custom
    canonical Huffman tables, Y sampling `sampling`, chroma 1x1."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sh, sv = sampling
    if gray:
        planes = [(img.astype(np.float64), 1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [(y, sh, sv), (_downsample(cb, sv, sh), 1, 1), (_downsample(cr, sv, sh), 1, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    qtab = np.full(64, qval, dtype=np.int64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes(int(v) for v in qtab)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hv = (sh << 4) | sv if ci == 0 and not gray else 0x11
        sof += bytes([ci + 1, hv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS), (1, _AC_COUNTS, _AC_SYMS)):
        payload = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMS)
    hmax = sh if not gray else 1
    vmax = sv if not gray else 1
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, ph, pv in planes:
        padded.append((_pad_to(p, mcus_y * pv * 8, mcus_x * ph * 8), ph, pv))

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bytes(bw.out)
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (p, ph, pv) in enumerate(padded):
            for by in range(pv):
                for bx in range(ph):
                    y0, x0 = (my * pv + by) * 8, (mx * ph + bx) * 8
                    zz = _fdct_quant(p[y0 : y0 + 8, x0 : x0 + 8], qval)
                    diff = int(zz[0]) - preds[ci]
                    t = int(abs(diff)).bit_length()
                    if t > 11:
                        raise ValueError(
                            "encode_baseline_jpeg: DC difference magnitude "
                            f"{abs(diff)} exceeds the encoder's 11-bit table "
                            "— input values outside the 8-bit range?"
                        )
                    ln, code = dc_codes[t]
                    bw.write(code, ln)
                    if t:
                        enc = diff if diff >= 0 else diff + (1 << t) - 1
                        bw.write(enc, t)
                    run = 0
                    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                    for k in range(1, last_nz + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            l2, c2 = ac_codes[0xF0]
                            bw.write(c2, l2)
                            run -= 16
                        s = int(abs(v)).bit_length()
                        if s > 10:
                            # the fixture encoder's AC table carries sizes
                            # 1-10 (|coef| <= 1023); at qval=1 a
                            # high-contrast block can exceed that — raise
                            # clearly instead of a KeyError deep in the
                            # bit writer (encoder constraint, not a
                            # decoder limit)
                            raise ValueError(
                                "encode_baseline_jpeg: quantized AC "
                                f"coefficient magnitude {abs(v)} exceeds the "
                                "fixture encoder's 1023 limit — raise qval "
                                "or lower image contrast"
                            )
                        l2, c2 = ac_codes[(run << 4) | s]
                        bw.write(c2, l2)
                        enc = v if v >= 0 else v + (1 << s) - 1
                        bw.write(enc, s)
                        run = 0
                    if last_nz < 63:
                        l2, c2 = ac_codes[0x00]
                        bw.write(c2, l2)
                    preds[ci] = int(zz[0])
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
