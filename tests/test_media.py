"""Real-decoder media tests: netpbm images and WAV PCM audio decoded from
inline binary columns (stdlib + NumPy only — no PIL/ffmpeg needed)."""

import io
import wave

import numpy as np
import pytest

from fozzie_spark.media import (
    _decode_netpbm,
    _decode_wav,
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


def test_decode_media_features_spark(spark):
    rows = [
        ("img1", bytearray(ppm_bytes(8, 4))),
        ("img2", bytearray(pgm_bytes(6, 6, val=10))),
        ("aud1", bytearray(wav_bytes(n_samples=1600, rate=16000))),
        ("bad1", bytearray(b"\x89PNG\r\n\x1a\nnotdecodable")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_bytes binary")
    out = {r["doc_id"]: r for r in decode_media_features(df, feat_dim=16).collect()}
    assert set(out) == {"img1", "img2", "aud1"}  # png skipped
    assert out["img1"]["kind"] == "image"
    assert (out["img1"]["width"], out["img1"]["height"], out["img1"]["n_frames"]) == (8, 4, 1)
    assert len(out["img1"]["feature"]) == 16  # grid 4x4
    assert out["img2"]["kind"] == "image"
    assert abs(out["img2"]["feature"][0] - 10 / 255.0) < 1e-6
    assert out["aud1"]["kind"] == "audio"
    assert (out["aud1"]["width"], out["aud1"]["height"], out["aud1"]["n_frames"]) == (16000, 1, 1600)
    assert len(out["aud1"]["feature"]) == 16
    assert max(out["aud1"]["feature"]) > 0.1  # real RMS energy, not zeros

    with pytest.raises(Exception, match="no stdlib decoder"):
        decode_media_features(df, feat_dim=16, on_error="error").collect()
