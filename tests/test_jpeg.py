"""Round-trip tests for the pure-stdlib baseline JPEG decoder: a minimal
baseline ENCODER lives here in the tests (standard DCT + canonical Huffman
tables built from scratch), so the decoder is exercised end-to-end without
PIL — constant blocks decode exactly, gradients within quantization
tolerance, across 4:4:4 / 4:2:0 sampling, grayscale, and restart markers."""

import struct

import numpy as np
import pytest

from fozzie_spark import jpeg as J


# ---------------------------------------------------------------------------
# minimal baseline encoder (test oracle's inverse)
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
    m = J._idct_mat()
    coef = m @ (block - 128.0) @ m.T
    zz = coef.ravel()[J.ZIGZAG]
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


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(h + w - 2, 1)),
        ],
        axis=2,
    ).astype(np.uint8)
    return img


def test_constant_color_roundtrip_exact():
    for rgb in ((0, 0, 0), (255, 255, 255), (10, 200, 77)):
        img = np.full((8, 16, 3), rgb, dtype=np.uint8)
        dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert dec.shape == (8, 16, 3)
        # constant blocks: DC-only, quant 1 — YCbCr round trip keeps every
        # channel within 1 count
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, rgb


def test_gradient_roundtrip_tolerance():
    img = _gradient(24, 40)
    dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() <= 2.0 and err.max() <= 12, (err.mean(), err.max())


def test_non_multiple_of_8_dims():
    img = _gradient(13, 21)  # forces edge-padded partial MCUs
    dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == (13, 21, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12


def test_420_subsampling():
    img = _gradient(32, 32)
    dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img, sampling=(2, 2)))
    assert dec.shape == (32, 32, 3)
    # luma survives subsampling tightly; chroma is block-averaged
    y_in, *_ = _rgb_to_ycbcr(img)
    y_out, *_ = _rgb_to_ycbcr(dec)
    assert np.abs(y_in - y_out).mean() <= 3.0
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 12


def test_422_subsampling_and_coarse_quant():
    img = _gradient(16, 48)
    dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img, sampling=(2, 1), qval=8))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 16


def test_grayscale_single_component():
    img = (_gradient(17, 9)[:, :, 0]).copy()
    dec = J.decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == (17, 9)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_restart_markers():
    img = _gradient(40, 24)
    plain = J.decode_baseline_jpeg(encode_baseline_jpeg(img))
    rst = J.decode_baseline_jpeg(encode_baseline_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_progressive_raises_not_implemented():
    # minimal SOF2 frame header after SOI: must be refused (PIL fallback
    # territory), not mis-decoded
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_baseline_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_media_decode_bytes_jpeg_without_pil():
    # the media wiring: jpeg magic routes to the stdlib baseline decoder
    # (no PIL in this container) and yields image metadata + pooled feature
    from fozzie_spark.media import _decode_bytes

    img = np.full((16, 24, 3), (40, 80, 120), dtype=np.uint8)
    kind, w, h, nf, feat = _decode_bytes(encode_baseline_jpeg(img), feat_dim=16)
    assert (kind, w, h, nf) == ("image", 24, 16, 1)
    y = 0.299 * 40 + 0.587 * 80 + 0.114 * 120
    # constant image: every pooled block mean ~= the constant gray value
    assert np.allclose(feat, ((40 + 80 + 120) / 3.0) / 255.0, atol=0.02) or np.allclose(
        feat, y / 255.0, atol=0.02
    )


def test_media_decode_features_jpeg_end_to_end(spark):
    # full mapInPandas path over a binary column of jpegs
    from fozzie_spark.media import decode_media_features

    rows = []
    for i in range(6):
        img = np.full((8 + i, 8 + 2 * i, 3), (i * 30 % 256, i * 50 % 256, i * 70 % 256),
                      dtype=np.uint8)
        rows.append((f"j{i}", bytearray(encode_baseline_jpeg(img))))
    df = spark.createDataFrame(rows, "doc_id string, media_bytes binary")
    out = decode_media_features(df, feat_dim=16, on_error="error").collect()
    got = {r["doc_id"]: (r["kind"], r["width"], r["height"], r["n_frames"]) for r in out}
    assert got == {f"j{i}": ("image", 8 + 2 * i, 8 + i, 1) for i in range(6)}
