"""Real-decoder media tests: netpbm/PNG images and WAV PCM audio decoded
from inline binary columns (stdlib + NumPy only — no PIL/ffmpeg needed)."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from fozzie_spark.media import (
    _decode_netpbm,
    _decode_png,
    _decode_wav,
    block_mean_pool,
    decode_media_features,
    resize_nearest,
)


def ppm_bytes(w, h, rgb=(200, 10, 10), comment=True):
    hdr = b"P6\n" + (b"# test comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return hdr + bytes(rgb) * (w * h)


def pgm_bytes(w, h, val=77):
    return f"P5\n{w} {h}\n255\n".encode() + bytes([val]) * (w * h)


def wav_bytes(n_samples=800, rate=8000, nch=1, amp=0.5):
    t = np.arange(n_samples * nch)
    x = (np.sin(t * 0.3) * amp * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def test_netpbm_decode_local():
    img = _decode_netpbm(ppm_bytes(5, 3))
    assert img.shape == (3, 5, 3) and img[0, 0, 0] == 200 and img[0, 0, 1] == 10
    gray = _decode_netpbm(pgm_bytes(4, 2))
    assert gray.shape == (2, 4, 1) and int(gray[0, 0, 0]) == 77


def test_resize_nearest_shapes():
    img = _decode_netpbm(ppm_bytes(10, 6))
    small = resize_nearest(img, 3, 4)
    assert small.shape == (3, 4, 3)


def test_wav_decode_local():
    rate, nch, x = _decode_wav(wav_bytes(n_samples=100, rate=4000))
    assert rate == 4000 and nch == 1 and len(x) == 100
    assert np.abs(x).max() <= 1.0


def png_bytes(img, ctype, filter_type=0, palette=None):
    """Minimal PNG encoder (test-side forward filtering) for roundtrips."""
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w * ch).astype(np.int32)
    zero = np.zeros(ch, dtype=np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    raws = []
    for y in range(h):
        row = flat[y]
        left = np.concatenate([zero, row[:-ch]]) if w * ch > ch else zero[: w * ch]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = (row - left) % 256
        elif filter_type == 2:
            enc = (row - prev) % 256
        elif filter_type == 3:
            enc = (row - ((left + prev) >> 1)) % 256
        else:  # Paeth
            ul = np.concatenate([zero, prev[:-ch]]) if w * ch > ch else zero[: w * ch]
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (row - pred) % 256
        raws.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return b"\x89PNG\r\n\x1a\n" + body + chunk(b"IDAT", zlib.compress(b"".join(raws))) + chunk(b"IEND", b"")


def test_png_roundtrip_all_filters():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    for f in range(5):
        got = _decode_png(png_bytes(img, ctype=2, filter_type=f))
        assert np.array_equal(got, img), f"filter {f}"


def test_png_color_types():
    rng = np.random.RandomState(8)
    gray = rng.randint(0, 256, size=(5, 7), dtype=np.uint8)
    got = _decode_png(png_bytes(gray, ctype=0, filter_type=2))
    assert np.array_equal(got[:, :, 0], gray)
    rgba = rng.randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    got = _decode_png(png_bytes(rgba, ctype=6, filter_type=4))
    assert np.array_equal(got, rgba)
    # palette: indices resolve through PLTE to RGB
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(5, 5, 1), dtype=np.uint8)
    got = _decode_png(png_bytes(idx, ctype=3, filter_type=1, palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])
    with pytest.raises(NotImplementedError, match="interlace"):
        data = png_bytes(gray, ctype=0)
        # flip the interlace byte inside IHDR (offset 8+8+12)
        _decode_png(data[:28] + b"\x01" + data[29:])


def test_block_mean_pool():
    gray = np.arange(16, dtype=np.float64).reshape(4, 4)
    got = block_mean_pool(gray, 2)
    assert np.allclose(got, [[2.5, 4.5], [10.5, 12.5]])  # true 2x2 block means
    tiny = block_mean_pool(np.array([[4.0]]), 2)  # upsampled, all blocks = 4
    assert np.allclose(tiny, 4.0)


def test_decode_media_features_spark(spark):
    rng = np.random.RandomState(3)
    png_img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    rows = [
        ("img1", bytearray(ppm_bytes(8, 4))),
        ("img2", bytearray(pgm_bytes(6, 6, val=10))),
        ("png1", bytearray(png_bytes(png_img, ctype=2, filter_type=3))),
        ("aud1", bytearray(wav_bytes(n_samples=1600, rate=16000))),
        ("bad1", bytearray(b"\xff\xd8\xffjpegnotdecodable")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_bytes binary")
    out = {r["doc_id"]: r for r in decode_media_features(df, feat_dim=16).collect()}
    assert set(out) == {"img1", "img2", "png1", "aud1"}  # jpeg skipped
    assert out["png1"]["kind"] == "image"
    assert (out["png1"]["width"], out["png1"]["height"]) == (4, 5)
    exp0 = block_mean_pool(png_img.mean(axis=2), 4).astype(np.float32).ravel()[0] / np.float32(255.0)
    assert abs(out["png1"]["feature"][0] - float(exp0)) < 1e-6
    assert out["img1"]["kind"] == "image"
    assert (out["img1"]["width"], out["img1"]["height"], out["img1"]["n_frames"]) == (8, 4, 1)
    assert len(out["img1"]["feature"]) == 16  # grid 4x4
    assert out["img2"]["kind"] == "image"
    assert abs(out["img2"]["feature"][0] - 10 / 255.0) < 1e-6
    assert out["aud1"]["kind"] == "audio"
    assert (out["aud1"]["width"], out["aud1"]["height"], out["aud1"]["n_frames"]) == (16000, 1, 1600)
    assert len(out["aud1"]["feature"]) == 16
    assert max(out["aud1"]["feature"]) > 0.1  # real RMS energy, not zeros

    with pytest.raises(Exception, match="no stdlib decoder|needs PIL|JPEG has no SOS"):
        decode_media_features(df, feat_dim=16, on_error="error").collect()


def test_extract_media_features_file_refs(spark, tmp_path):
    # file:// refs decode for REAL through the by-reference path
    (tmp_path / "a.ppm").write_bytes(ppm_bytes(6, 4))
    (tmp_path / "b.wav").write_bytes(wav_bytes(n_samples=320, rate=8000))
    rng = np.random.RandomState(5)
    png_img = rng.randint(0, 256, size=(3, 7, 3), dtype=np.uint8)
    (tmp_path / "c.png").write_bytes(png_bytes(png_img, ctype=2, filter_type=2))

    def doc(i, name, kind):
        return (
            f"d{i}",
            [{"kind": kind, "text": "", "media_ref": f"file://{tmp_path}/{name}", "offset": 0}],
        )

    from fozzie_spark.media import extract_media_features

    docs = spark.createDataFrame(
        [doc(0, "a.ppm", "image"), doc(1, "b.wav", "audio"), doc(2, "c.png", "image")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {r["doc_id"]: r for r in extract_media_features(docs, feat_dim=16).collect()}
    assert (out["d0"]["width"], out["d0"]["height"]) == (6, 4)
    assert (out["d1"]["width"], out["d1"]["n_frames"]) == (8000, 320)
    assert (out["d2"]["width"], out["d2"]["height"]) == (7, 3)
    # unknown scheme: error by default, skipped with on_error="skip"
    bad = spark.createDataFrame(
        [("dx", [{"kind": "image", "text": "", "media_ref": "s3://bucket/x.jpg", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    with pytest.raises(Exception, match="NotImplementedError|no fetch client"):
        extract_media_features(bad, feat_dim=16).collect()
    assert extract_media_features(bad, feat_dim=16, on_error="skip").count() == 0
    # declared kind vs decoded kind mismatch: a "wav declared as image" must
    # not ship sample-rate/channels under width/height — error by default,
    # dropped with on_error="skip"
    lying = spark.createDataFrame(
        [doc(9, "b.wav", "image")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    with pytest.raises(Exception, match="declared kind"):
        extract_media_features(lying, feat_dim=16).collect()
    assert extract_media_features(lying, feat_dim=16, on_error="skip").count() == 0


def test_extract_media_features_injected_fetch(spark):
    # remote schemes decode end-to-end through an injected fetch client —
    # the callable ships to the workers with the UDF
    from fozzie_spark.media import extract_media_features

    blobs = {
        "s3://bucket/x.ppm": ppm_bytes(6, 4),
        "s3://bucket/y.wav": wav_bytes(n_samples=320, rate=8000),
    }

    def fake_fetch(ref: str) -> bytes:
        return blobs[ref]

    docs = spark.createDataFrame(
        [
            ("d0", [{"kind": "image", "text": "", "media_ref": "s3://bucket/x.ppm", "offset": 0}]),
            ("d1", [{"kind": "audio", "text": "", "media_ref": "s3://bucket/y.wav", "offset": 0}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {
        r["doc_id"]: r
        for r in extract_media_features(docs, feat_dim=16, fetch=fake_fetch).collect()
    }
    assert (out["d0"]["width"], out["d0"]["height"]) == (6, 4)
    assert (out["d1"]["width"], out["d1"]["n_frames"]) == (8000, 320)
    # a fetcher that raises is governed by on_error like any decode failure
    def broken_fetch(ref: str) -> bytes:
        raise IOError("bucket unreachable")

    assert (
        extract_media_features(docs, feat_dim=16, fetch=broken_fetch, on_error="skip").count()
        == 0
    )


def test_jpeg_decode_via_pil():
    # jpeg decodes when PIL exists at runtime; this sandbox has no pillow,
    # so the test self-skips there and runs on real cluster images
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io as _io

    from PIL import Image

    from fozzie_spark.media import _decode_bytes

    img = Image.new("RGB", (10, 6), (200, 30, 30))
    buf = _io.BytesIO()
    img.save(buf, format="JPEG")
    kind, w, h, nf, feat = _decode_bytes(buf.getvalue(), 16)
    assert (kind, w, h, nf) == ("image", 10, 6, 1)
    assert len(feat) == 16


def test_exotic_jpeg_without_pil_raises_not_implemented():
    # sequential AND progressive jpegs decode with the stdlib
    # (tests/test_jpeg.py); only the exotic variants (arithmetic SOF9
    # etc.) still need PIL
    import struct

    from fozzie_spark.media import _decode_bytes

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — the no-PIL path is not reachable here")
    except ImportError:
        pass
    sof9 = (b"\xff\xc9" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_bytes(b"\xff\xd8" + sof9 + b"\xff\xd9", 16)
    # corrupt jpeg bytes are a decode error, not a missing-dependency error
    with pytest.raises(ValueError, match="no SOS"):
        _decode_bytes(b"\xff\xd8\xff\xe0fakejpegbytes", 16)


# ---- container probing ------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + fourcc + payload


def _full(fourcc: bytes, ver: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([ver, 0, 0, 0]) + payload)


def mp4_bytes(w=640, h=360, n_samples=48, timescale=1000, duration=2000, ver=0):
    """Hand-assembled minimal ISO-BMFF: ftyp + moov[mvhd, trak[tkhd,
    mdia[mdhd, hdlr(vide), minf[stbl[stsd(avc1), stsz]]]]] + empty mdat."""
    i4 = lambda x: x.to_bytes(4, "big")
    i8 = lambda x: x.to_bytes(8, "big")
    if ver:
        mvhd = _full(b"mvhd", 1, i8(0) + i8(0) + i4(timescale) + i8(duration) + b"\x00" * 80)
        tkhd = _full(b"tkhd", 1, i8(0) + i8(0) + i4(1) + i4(0) + i8(duration)
                     + b"\x00" * 52 + i4(w << 16) + i4(h << 16))
    else:
        mvhd = _full(b"mvhd", 0, i4(0) + i4(0) + i4(timescale) + i4(duration) + b"\x00" * 80)
        tkhd = _full(b"tkhd", 0, i4(0) + i4(0) + i4(1) + i4(0) + i4(duration)
                     + b"\x00" * 52 + i4(w << 16) + i4(h << 16))
    mdhd = _full(b"mdhd", 0, i4(0) + i4(0) + i4(timescale) + i4(duration) + i4(0))
    hdlr = _full(b"hdlr", 0, i4(0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
    avc1 = _box(b"avc1", b"\x00" * 70)
    stsd = _full(b"stsd", 0, i4(1) + avc1)
    stsz = _full(b"stsz", 0, i4(0) + i4(n_samples))
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + i4(512) + b"isomiso2avc1mp41")
    return ftyp + moov + _box(b"mdat", b"")


def test_probe_bytes_local():
    from fozzie_spark.media import _probe_bytes

    assert _probe_bytes(mp4_bytes()) == ("mp4", "video", 640, 360, 48, 2000, "avc1")
    # version-1 (64-bit times) boxes parse identically
    assert _probe_bytes(mp4_bytes(ver=1)) == ("mp4", "video", 640, 360, 48, 2000, "avc1")
    assert _probe_bytes(pgm_bytes(5, 4)) == ("netpbm", "image", 5, 4, 1, None, "pgm")
    assert _probe_bytes(ppm_bytes(3, 2)) == ("netpbm", "image", 3, 2, 1, None, "ppm")
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert _probe_bytes(png_bytes(img, ctype=2)) == ("png", "image", 4, 2, 1, None, "png")
    c, k, rate, nch, nf, dur, codec = _probe_bytes(wav_bytes(n_samples=400, rate=8000))
    assert (c, k, rate, nch, nf, codec) == ("wav", "audio", 8000, 1, 400, "pcm")
    assert dur == 50  # 400 samples @ 8 kHz
    from tests.test_jpeg import encode_baseline_jpeg

    jimg = np.full((16, 24, 3), 128, dtype=np.uint8)
    c, k, w, h, nf, dur, codec = _probe_bytes(encode_baseline_jpeg(jimg))
    assert (c, k, w, h, nf) == ("jpeg", "image", 24, 16, 1)
    assert codec.startswith("jpeg-")
    with pytest.raises(ValueError):
        _probe_bytes(b"\x00\x01\x02\x03garbage")


def test_probe_media_spark(spark):
    from fozzie_spark.media import probe_media

    rows = [
        ("v1", bytearray(mp4_bytes())),
        ("p1", bytearray(pgm_bytes(6, 3))),
        ("bad", bytearray(b"\x00notmedia")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_bytes binary")
    got = {r["doc_id"]: r.asDict() for r in probe_media(df).collect()}
    assert set(got) == {"v1", "p1"}  # on_error=skip drops the garbage row
    assert got["v1"]["container"] == "mp4" and got["v1"]["kind"] == "video"
    assert (got["v1"]["width"], got["v1"]["height"]) == (640, 360)
    assert got["v1"]["n_frames"] == 48 and got["v1"]["duration_ms"] == 2000
    assert got["v1"]["codec"] == "avc1"
    assert got["p1"]["kind"] == "image" and got["p1"]["width"] == 6
    with pytest.raises(Exception):
        probe_media(df, on_error="error").collect()


# ---- mp4 sample byte ranges -------------------------------------------------


def mp4_bytes_with_samples():
    """Minimal mp4 with REAL sample tables: 7 samples of sizes
    10..70 across 3 chunks (stsc runs: chunk 1 -> 3 samples, chunks 2+ ->
    2), stco absolute offsets into a real mdat, stss sync samples {1, 4}
    (1-based). Returns (bytes, expected (idx, offset, size, sync) rows)."""
    i4 = lambda x: x.to_bytes(4, "big")
    sizes = [10, 20, 30, 40, 50, 60, 70]

    def build(offsets):
        mvhd = _full(b"mvhd", 0, i4(0) + i4(0) + i4(1000) + i4(2000) + b"\x00" * 80)
        tkhd = _full(b"tkhd", 0, i4(0) + i4(0) + i4(1) + i4(0) + i4(2000)
                     + b"\x00" * 52 + i4(64 << 16) + i4(64 << 16))
        mdhd = _full(b"mdhd", 0, i4(0) + i4(0) + i4(1000) + i4(2000) + i4(0))
        hdlr = _full(b"hdlr", 0, i4(0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
        stsd = _full(b"stsd", 0, i4(1) + _box(b"avc1", b"\x00" * 70))
        stsz = _full(b"stsz", 0, i4(0) + i4(len(sizes)) + b"".join(i4(s) for s in sizes))
        stsc = _full(b"stsc", 0, i4(2) + i4(1) + i4(3) + i4(1) + i4(2) + i4(2) + i4(1))
        stco = _full(b"stco", 0, i4(len(offsets)) + b"".join(i4(o) for o in offsets))
        stss = _full(b"stss", 0, i4(2) + i4(1) + i4(4))
        stbl = _box(b"stbl", stsd + stsz + stsc + stco + stss)
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
        moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
        ftyp = _box(b"ftyp", b"isom" + i4(512) + b"isomiso2avc1mp41")
        return ftyp + moov

    head = build([0, 0, 0])
    mdat_payload_at = len(head) + 8  # after mdat size+fourcc
    o1, o2, o3 = mdat_payload_at, mdat_payload_at + 60, mdat_payload_at + 150
    data = build([o1, o2, o3]) + _box(b"mdat", bytes(range(256)) + bytes(24))
    expected = [
        (0, o1, 10, True), (1, o1 + 10, 20, False), (2, o1 + 30, 30, False),
        (3, o2, 40, True), (4, o2 + 40, 50, False),
        (5, o3, 60, False), (6, o3 + 60, 70, False),
    ]
    return data, expected


def test_mp4_sample_table_local():
    from fozzie_spark.media import _mp4_sample_table

    data, expected = mp4_bytes_with_samples()
    assert _mp4_sample_table(data, "video") == ("avc1", expected)
    # samples must land inside the mdat payload
    for _idx, off, size, _sync in expected:
        assert off + size <= len(data)
    with pytest.raises(ValueError, match="no audio track"):
        _mp4_sample_table(data, "audio")
    # a track without chunk tables (the plain fixture) is a clear error
    with pytest.raises(ValueError, match="stsz/stsc/stco"):
        _mp4_sample_table(mp4_bytes(), "video")


def test_mp4_sample_ranges_spark(spark):
    from fozzie_spark.media import mp4_sample_ranges

    data, expected = mp4_bytes_with_samples()
    df = spark.createDataFrame(
        [("v0", bytearray(data)), ("bad", bytearray(b"nonsense"))],
        "doc_id string, media_bytes binary",
    )
    got = sorted(
        tuple(r) for r in mp4_sample_ranges(df).collect()
    )
    assert got == [("v0", i, o, s, y) for i, o, s, y in expected]
    sync = sorted(tuple(r) for r in mp4_sample_ranges(df, sync_only=True).collect())
    assert sync == [("v0", 0, expected[0][1], 10, True), ("v0", 3, expected[3][1], 40, True)]
    with pytest.raises(Exception):
        mp4_sample_ranges(df, on_error="error").collect()


def tone_wav_bytes(freq_hz, rate=8000, n_samples=4096, amp=0.5):
    t = np.arange(n_samples) / rate
    x = (np.sin(2 * np.pi * freq_hz * t) * amp * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def test_audio_spectral_features(spark):
    from fozzie_spark.media import audio_spectral_features

    rows = [
        ("tone1k", tone_wav_bytes(1000)),
        ("tone3k", tone_wav_bytes(3000)),
        ("notaudio", b"\x00\x01\x02\x03not a wav at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_bytes binary")
    got = {r["doc_id"]: r for r in
           audio_spectral_features(df, n_bands=16).collect()}
    # undecodable row skipped, WAVs decoded
    assert set(got) == {"tone1k", "tone3k"}
    for name, f in (("tone1k", 1000.0), ("tone3k", 3000.0)):
        r = got[name]
        assert r["sample_rate"] == 8000 and r["n_samples"] == 4096
        # a pure tone's centroid sits on its frequency (leakage < 2%)
        assert abs(r["spectral_centroid_hz"] - f) < f * 0.02, r
        bands = r["band_energy"]
        assert len(bands) == 16 and abs(sum(bands) - 1.0) < 1e-3
        # the tone's own band carries the bulk of the energy
        assert max(bands) > 0.9, bands
    # higher tone peaks in a strictly higher band (log-spaced edges)
    assert (max(range(16), key=lambda i: got["tone3k"]["band_energy"][i])
            > max(range(16), key=lambda i: got["tone1k"]["band_energy"][i]))

    import pytest as _pytest
    with _pytest.raises(Exception):
        audio_spectral_features(df, on_error="error").collect()


# ---- MJPEG-in-mp4 frame decode ------------------------------------------------


def mjpeg_mp4_bytes(grays, w=16, h=8, codec=b"jpeg", sync=(1,)):
    """mp4 whose video samples are REAL baseline JPEGs (one constant-gray
    frame per entry in `grays`), single chunk, stss = `sync` (1-based).
    Returns (bytes, jpeg_sample_bytes list)."""
    import numpy as np

    from fozzie_spark.jpeg import encode_baseline_jpeg

    i4 = lambda x: x.to_bytes(4, "big")
    jpegs = [encode_baseline_jpeg(np.full((h, w), g, dtype=np.uint8)) for g in grays]
    sizes = [len(j) for j in jpegs]

    def build(offset):
        mvhd = _full(b"mvhd", 0, i4(0) + i4(0) + i4(1000) + i4(1000) + b"\x00" * 80)
        tkhd = _full(b"tkhd", 0, i4(0) + i4(0) + i4(1) + i4(0) + i4(1000)
                     + b"\x00" * 52 + i4(w << 16) + i4(h << 16))
        mdhd = _full(b"mdhd", 0, i4(0) + i4(0) + i4(1000) + i4(1000) + i4(0))
        hdlr = _full(b"hdlr", 0, i4(0) + b"vide" + b"\x00" * 12 + b"V\x00")
        stsd = _full(b"stsd", 0, i4(1) + _box(codec, b"\x00" * 70))
        stsz = _full(b"stsz", 0, i4(0) + i4(len(sizes)) + b"".join(i4(s) for s in sizes))
        stsc = _full(b"stsc", 0, i4(1) + i4(1) + i4(len(sizes)) + i4(1))
        stco = _full(b"stco", 0, i4(1) + i4(offset))
        stss = _full(b"stss", 0, i4(len(sync)) + b"".join(i4(s) for s in sync))
        stbl = _box(b"stbl", stsd + stsz + stsc + stco + stss)
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
        moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
        return _box(b"ftyp", b"isom" + i4(512) + b"mp41") + moov

    head = build(0)
    data = build(len(head) + 8) + _box(b"mdat", b"".join(jpegs))
    return data, jpegs


def test_decode_mp4_frames_golden(spark):
    # constant-gray MJPEG frames round-trip EXACTLY through the stdlib
    # encoder/decoder at qval=1, so every pooled feature value is the
    # closed-form gray/255 — pins the stbl-range -> jpeg glue end to end
    import numpy as np

    from fozzie_spark.media import decode_mp4_frames

    grays = [40, 200, 129]
    data, _ = mjpeg_mp4_bytes(grays, w=16, h=8)
    avc, _ = mp4_bytes_with_samples()  # non-MJPEG codec: skipped
    df = spark.createDataFrame(
        [("v0", bytearray(data)), ("avc", bytearray(avc)), ("bad", bytearray(b"xx"))],
        "doc_id string, media_bytes binary",
    )
    rows = sorted(
        (r["doc_id"], r["sample_idx"], r["width"], r["height"], r["is_sync"],
         tuple(r["feature"]))
        for r in decode_mp4_frames(df, feat_dim=4).collect()
    )
    exp = [
        ("v0", i, 16, 8, i == 0,
         tuple(np.full(4, g, dtype=np.float64).astype(np.float32) / np.float32(255.0)))
        for i, g in enumerate(grays)
    ]
    assert rows == exp
    # sync_only + max_frames cut the decode set, not just the output
    sync = decode_mp4_frames(df, sync_only=True).collect()
    assert [(r["doc_id"], r["sample_idx"]) for r in sync] == [("v0", 0)]
    capped = decode_mp4_frames(df, max_frames=2).collect()
    assert sorted((r["doc_id"], r["sample_idx"]) for r in capped) == [("v0", 0), ("v0", 1)]
    # on_error="error" surfaces the honest boundary for inter-frame codecs
    with pytest.raises(Exception, match="avc1|nonsense|moov"):
        decode_mp4_frames(
            spark.createDataFrame([("a", bytearray(avc))], "doc_id string, media_bytes binary"),
            on_error="error",
        ).collect()


def test_decode_mp4_frames_narrow_errors(spark, monkeypatch):
    """on_error='skip' drops MALFORMED docs whole, but programming errors
    raise (round-7: the bare `except Exception` swallowed both)."""
    import numpy as np

    from fozzie_spark import jpeg as jpeg_mod
    from fozzie_spark.media import decode_mp4_frames

    grays = [40, 200]
    data, jpegs = mjpeg_mp4_bytes(grays, w=16, h=8)
    # doc whose SECOND sample is corrupt: the first frame decodes, the
    # second raises — the whole doc must be dropped (docstring contract),
    # not leak its first frame
    bad = bytearray(data)
    off = data.index(jpegs[1])
    bad[off:off + 8] = b"\x00" * 8
    df = spark.createDataFrame(
        [("ok", bytearray(data)), ("halfbad", bad), ("null", None)],
        "doc_id string, media_bytes binary",
    )
    got = sorted((r["doc_id"], r["sample_idx"])
                 for r in decode_mp4_frames(df, feat_dim=4).collect())
    assert got == [("ok", 0), ("ok", 1)]

    # a programming error inside the decode loop must RAISE even under
    # on_error='skip' — it is a bug, not bad media
    def boom(_b):
        raise TypeError("programming error")

    monkeypatch.setattr(jpeg_mod, "decode_baseline_jpeg", boom)
    with pytest.raises(Exception, match="programming error"):
        decode_mp4_frames(
            spark.createDataFrame([("a", bytearray(data))],
                                  "doc_id string, media_bytes binary"),
        ).collect()


def test_encode_baseline_jpeg_ac_overflow_raises():
    """Inputs past the 8-bit range (future 16-bit-ish fixtures) can push
    |AC| past the encoder's 1023-size table — a clear ValueError, not a
    KeyError deep in the bit writer. (8-bit content maxes out at |AC|
    1020 at qval=1, verified by a basis-sign sweep, so uint8 fixtures
    never hit this.)"""
    import numpy as np

    from fozzie_spark.jpeg import encode_baseline_jpeg

    img = np.full((8, 8), 128.0 - 4000.0)
    img[::2, :] = 128.0 + 4000.0  # zero-mean block: DC fine, AC overflows
    with pytest.raises(ValueError, match="1023"):
        encode_baseline_jpeg(img, qval=1)
    with pytest.raises(ValueError, match="11-bit"):
        encode_baseline_jpeg(np.full((8, 8), 5000.0), qval=1)
