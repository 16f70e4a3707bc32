"""Round-trip tests for the pure-stdlib baseline JPEG decoder: a minimal
baseline ENCODER lives here in the tests (standard DCT + canonical Huffman
tables built from scratch), so the decoder is exercised end-to-end without
PIL — constant blocks decode exactly, gradients within quantization
tolerance, across 4:4:4 / 4:2:0 sampling, grayscale, and restart markers."""

import struct

import numpy as np
import pytest

from fozzie_spark import jpeg as J


# baseline encoder now lives in the library (fozzie_spark.jpeg) so entry
# fixtures and synth can generate MJPEG frames; the PROGRESSIVE encoder
# below stays test-local as the independent spec-derived oracle
from fozzie_spark.jpeg import (  # noqa: F401
    _AC_COUNTS, _AC_SYMS, _DC_COUNTS, _DC_SYMS, _BitWriter,
    _canonical_codes, _downsample, _fdct_quant, _pad_to, _rgb_to_ycbcr,
    encode_baseline_jpeg,
)


# ---------------------------------------------------------------------------
# minimal progressive encoder (successive approximation, libjpeg scan script)
# ---------------------------------------------------------------------------

# progressive AC table needs EOBn symbols (r<<4 for r=1..14) on top of the
# sequential set; all 9-bit codes (176 symbols fit)
_PAC_SYMS = [0x00, 0xF0] + [r << 4 for r in range(1, 15)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_PAC_COUNTS = [0] * 16
_PAC_COUNTS[8] = len(_PAC_SYMS)  # all length 9


class _ProgScanWriter:
    """Entropy writer for one progressive scan: EOB-run accumulation plus
    the buffered-correction-bit protocol of refinement scans (libjpeg
    encode_mcu_AC_refine / spec G.1.2.3)."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.be = []  # correction bits owed after the next EOBn

    def sym(self, s):
        ln, code = self.ac[s]
        self.bw.write(code, ln)

    def bits(self, lst):
        for b in lst:
            self.bw.write(b, 1)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            self.sym(nb << 4)
            if nb:
                self.bw.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        self.bits(self.be)
        self.be = []

    def end_segment(self):
        self.flush_eobrun()
        self.bw.flush()
        out = bytes(self.bw.out)
        self.bw = _BitWriter()
        return out

    def ac_first(self, zz, ss, se, al):
        ab = [abs(int(v)) >> al for v in zz]
        last = max((k for k in range(ss, se + 1) if ab[k]), default=ss - 1)
        if last < ss:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        r = 0
        for k in range(ss, last + 1):
            if ab[k] == 0:
                r += 1
                continue
            while r > 15:
                self.sym(0xF0)
                r -= 16
            s = ab[k].bit_length()
            self.sym((r << 4) | s)
            v = ab[k] if int(zz[k]) > 0 else -ab[k]
            self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < se:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine(self, zz, ss, se, al):
        ab = [abs(int(v)) >> al for v in zz]
        eobidx = max((k for k in range(ss, se + 1) if ab[k] == 1), default=ss - 1)
        r = 0
        br = []
        for k in range(ss, se + 1):
            temp = ab[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eobidx:
                self.flush_eobrun()
                self.sym(0xF0)
                r -= 16
                self.bits(br)
                br = []
            if temp > 1:
                br.append(temp & 1)
                continue
            self.flush_eobrun()
            self.sym((r << 4) | 1)
            self.bw.write(1 if int(zz[k]) > 0 else 0, 1)
            self.bits(br)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_progressive_jpeg(img, sampling=(1, 1), qval=1, restart_interval=0,
                            spectral_only=False):
    """Minimal progressive (SOF2) encoder. Default scan script mirrors
    libjpeg's: DC first at Al=1 (interleaved), per-component AC 1-63 at
    Al=1, DC refine, per-component AC refine. `spectral_only=True` uses
    pure spectral selection (DC, AC 1-5, AC 6-63, all at Al=0) instead."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sh, sv = sampling
    if gray:
        planes = [(img.astype(np.float64), 1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [(y, sh, sv), (_downsample(cb, sv, sh), 1, 1), (_downsample(cr, sv, sh), 1, 1)]
    nc = len(planes)
    hmax = sh if not gray else 1
    vmax = sv if not gray else 1
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # quantized zigzag coefficients on the padded (MCU-aligned) grid, plus
    # each component's TRUE block grid (non-interleaved scans code only it)
    comps = []
    for p, ph, pv in planes:
        pad = _pad_to(p, mcus_y * pv * 8, mcus_x * ph * 8)
        pby, pbx = mcus_y * pv, mcus_x * ph
        zz = np.zeros((pby, pbx, 64), dtype=np.int64)
        for by in range(pby):
            for bx in range(pbx):
                zz[by, bx] = _fdct_quant(pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qval)
        cw, ch = -(-w * ph // hmax), -(-h * pv // vmax)
        comps.append({"zz": zz, "h": ph, "v": pv,
                      "tbx": -(-cw // 8), "tby": -(-ch // 8)})

    out = bytearray(b"\xff\xd8")
    qtab = np.full(64, qval, dtype=np.int64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes(int(v) for v in qtab)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hv = (sh << 4) | sv if ci == 0 and not gray else 0x11
        sof += bytes([ci + 1, hv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, counts, syms in ((0, _DC_COUNTS, _DC_SYMS), (1, _PAC_COUNTS, _PAC_SYMS)):
        payload = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_PAC_COUNTS, _PAC_SYMS)

    def sos_header(comp_ids, ss, se, ah, al):
        # both DC and AC use table slot 0 here
        sos = bytes([len(comp_ids)]) + b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def dc_scan(ah, al):
        nonlocal out
        out += sos_header(list(range(1, nc + 1)), 0, 0, ah, al)
        bw = _BitWriter()
        preds = [0] * nc
        rst = 0
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nc
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + by, mx * c["h"] + bx, 0])
                        if ah == 0:  # first scan: diff of point-transformed DC
                            v = dc >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            t = int(abs(diff)).bit_length()
                            ln, code = dc_codes[t]
                            bw.write(code, ln)
                            if t:
                                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        else:  # refinement: one raw bit
                            bw.write((dc >> al) & 1, 1)
        bw.flush()
        out += bytes(bw.out)

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos_header([ci + 1], ss, se, ah, al)
        c = comps[ci]
        sw = _ProgScanWriter(ac_codes)
        rst = 0
        for u in range(c["tby"] * c["tbx"]):
            if restart_interval and u and u % restart_interval == 0:
                out += sw.end_segment()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
            by, bx = divmod(u, c["tbx"])
            if ah == 0:
                sw.ac_first(c["zz"][by, bx], ss, se, al)
            else:
                sw.ac_refine(c["zz"][by, bx], ss, se, al)
        out += sw.end_segment()

    if spectral_only:
        dc_scan(0, 0)
        for ci in range(nc):
            ac_scan(ci, 1, 5, 0, 0)
        for ci in range(nc):
            ac_scan(ci, 6, 63, 0, 0)
    else:
        dc_scan(0, 1)
        for ci in range(nc):
            ac_scan(ci, 1, 63, 0, 1)
        dc_scan(1, 0)
        for ci in range(nc):
            ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
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


def test_arithmetic_raises_not_implemented():
    # arithmetic-coded SOF: must be refused (PIL fallback territory)
    sof9 = b"\xff\xc9" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_baseline_jpeg(b"\xff\xd8" + sof9 + b"\xff\xd9")


def test_multiscan_sequential_raises_not_implemented():
    # SEQUENTIAL multi-scan (non-interleaved scans, spec A.2.2): a baseline
    # SOS covering fewer components than the frame must raise
    # NotImplementedError — NOT KeyError — so media._decode_bytes's
    # documented PIL fallback engages for these valid-but-unsupported files
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + struct.pack(">BHHB", 8, 8, 8, 3)
        + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00"
    )
    sos1 = b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + b"\x01\x00" + b"\x00\x3f\x00"
    with pytest.raises(NotImplementedError, match="multi-scan sequential"):
        J.decode_baseline_jpeg(b"\xff\xd8" + sof0 + sos1 + b"\xff\xd9")


def test_progressive_matches_baseline_exactly():
    # the two codings carry the SAME quantized coefficients, so the decoded
    # pixels must be bit-identical between the baseline and progressive
    # paths — for both the successive-approximation and the pure
    # spectral-selection scan scripts
    for img in (_gradient(24, 40), _gradient(13, 21), _gradient(17, 9)[:, :, 0].copy()):
        base = J.decode_baseline_jpeg(encode_baseline_jpeg(img, qval=2))
        prog = J.decode_baseline_jpeg(encode_progressive_jpeg(img, qval=2))
        spec = J.decode_baseline_jpeg(encode_progressive_jpeg(img, qval=2, spectral_only=True))
        assert np.array_equal(base, prog)
        assert np.array_equal(base, spec)


def test_progressive_constant_color_roundtrip():
    for rgb in ((0, 0, 0), (255, 255, 255), (10, 200, 77)):
        img = np.full((8, 16, 3), rgb, dtype=np.uint8)
        dec = J.decode_baseline_jpeg(encode_progressive_jpeg(img))
        assert dec.shape == (8, 16, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, rgb


def test_progressive_420_subsampling():
    # interleaved DC scan with 4 Y blocks per MCU + per-component AC scans
    # over DIFFERENT true block grids (also exercises the padded-vs-true
    # grid distinction at non-multiple-of-16 dims)
    img = _gradient(35, 29)
    base = J.decode_baseline_jpeg(encode_baseline_jpeg(img, sampling=(2, 2), qval=2))
    prog = J.decode_baseline_jpeg(encode_progressive_jpeg(img, sampling=(2, 2), qval=2))
    assert np.array_equal(base, prog)


def test_progressive_restart_markers():
    img = _gradient(40, 24)
    plain = J.decode_baseline_jpeg(encode_progressive_jpeg(img, qval=2))
    rst = J.decode_baseline_jpeg(encode_progressive_jpeg(img, qval=2, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_progressive_coarse_quant_eob_runs():
    # qval=16 zeroes most AC coefficients -> long EOB runs across blocks,
    # exercising EOBn symbols with extension bits in first AND refine scans
    img = _gradient(48, 64)
    base = J.decode_baseline_jpeg(encode_baseline_jpeg(img, qval=16))
    prog = J.decode_baseline_jpeg(encode_progressive_jpeg(img, qval=16))
    assert np.array_equal(base, prog)


def test_media_decode_bytes_progressive_without_pil():
    from fozzie_spark.media import _decode_bytes

    img = np.full((16, 24, 3), (40, 80, 120), dtype=np.uint8)
    kind, w, h, nf, _feat = _decode_bytes(encode_progressive_jpeg(img), feat_dim=16)
    assert (kind, w, h, nf) == ("image", 24, 16, 1)


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


def test_progressive_equals_baseline_property():
    # property sweep: random images x quant x sampling x restart — the two
    # codings carry identical coefficients, so decode must be bit-equal
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        h=st.integers(8, 40), w=st.integers(8, 40),
        qval=st.sampled_from([1, 2, 5, 16]),
        sampling=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
        rst=st.sampled_from([0, 3]),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, qval, sampling, rst, gray, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w) if gray else (h, w, 3), dtype=np.uint8)
        if gray:
            sampling = (1, 1)
        base = J.decode_baseline_jpeg(
            encode_baseline_jpeg(img, sampling=sampling, qval=qval, restart_interval=rst))
        prog = J.decode_baseline_jpeg(
            encode_progressive_jpeg(img, sampling=sampling, qval=qval, restart_interval=rst))
        assert np.array_equal(base, prog)

    check()
