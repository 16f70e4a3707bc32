"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

Two decode paths:

- `decode_media_features` — REAL decoders for formats parseable with the
  stdlib + NumPy (no PIL/ffmpeg in this container): binary netpbm images
  (P5 grayscale / P6 RGB), PNG (zlib inflate + scanline unfiltering, 8-bit
  color types 0/2/3/4/6), and RIFF/WAVE PCM audio. Decode, block-mean
  thumbnail pooling, and windowed-RMS audio features all run vectorized on
  the Arrow batch. Remaining compressed formats (jpeg/mp4) raise
  NotImplementedError with on_error="error" (default "skip" drops them) —
  swapping in PIL/ffmpeg touches only `_decode_bytes`.
- `extract_media_features` — for corpora that carry media by REFERENCE
  (media_ref URIs, no bytes): `file://` refs are fetched from the
  worker-local filesystem and decoded for real; remote schemes (s3/http)
  need a fetch client not present here and raise/skip per `on_error`, or
  substitute a seeded stand-in with `deterministic_fake=True` so the
  plumbing (schema, batch shape, partitioning) stays testable end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: the MALFORMED-MEDIA error set the per-doc decode loops catch under
#: on_error="skip": every error a truncated/garbage/unsupported container
#: or codec raises in the stdlib decode paths (struct/zlib/wave parse
#: failures, bounds/lookup misses on corrupt indices, PIL's OSError, our
#: own ValueError/NotImplementedError refusals). PROGRAMMING errors
#: (TypeError, AttributeError, ZeroDivisionError, ...) are deliberately
#: NOT in the set — a bare `except Exception` silently swallowed those
#: along with bad media (round-6 review), turning bugs into dropped docs.
_MEDIA_ERRORS = (
    NotImplementedError, ValueError, KeyError, IndexError, EOFError,
    OSError, struct.error, zlib.error, wave.Error,
)

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "width int, height int, n_frames int, feature array<float>"
)


def media_refs(docs: DataFrame) -> DataFrame:
    """Explode media spans out of an interleaved document table:
    (doc_id, media_ref, kind, offset). Pure JVM."""
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") != "text")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
            F.col("s.offset").alias("offset"),
        )
    )


def _fake_decode(ref: str, kind: str, feat_dim: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder: metadata + feature vector
    derived from sha256(media_ref). Stable across runs/partitions."""
    h = hashlib.sha256(ref.encode()).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 300
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    return width, height, n_frames, feat


def extract_media_features(
    docs: DataFrame,
    feat_dim: int = 32,
    deterministic_fake: bool = False,
    on_error: str = "error",
    fetch=None,
) -> DataFrame:
    """Decode + feature-extract every media span via mapInPandas.

    `file://` refs are REAL: bytes are read from the worker-local path and
    decoded by the stdlib decoders (netpbm / PNG / WAV, jpeg when PIL is
    installed — same path as `decode_media_features`). Other schemes
    (s3://, http://) decode through `fetch` when provided — an injectable
    `Callable[[str], bytes]` (e.g. a boto3/requests wrapper), serialized to
    the workers with the UDF, so production clusters plug their client in
    without this package growing dependencies. Without `fetch`, remote
    refs raise NotImplementedError (on_error="error", default) or are
    dropped (on_error="skip"), unless `deterministic_fake=True`, which
    substitutes a seeded stand-in so the plumbing (schema, batch shape,
    partitioning) stays testable end-to-end.
    """
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    refs = media_refs(docs)

    def _read_ref(ref: str) -> bytes | None:
        if ref and ref.startswith("file://"):
            with open(ref[len("file://"):], "rb") as f:
                return f.read()
        if fetch is not None:
            return fetch(ref)
        return None

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                if deterministic_fake:
                    w, h, nf, feat = _fake_decode(ref, kind, feat_dim)
                else:
                    try:
                        data = _read_ref(ref)
                        if data is None:
                            raise NotImplementedError(
                                f"no fetch client for media_ref {ref!r} — pass "
                                "fetch=<callable> for s3/http schemes; file:// "
                                "refs decode built-in, or deterministic_fake=True"
                            )
                        dec_kind, w, h, nf, feat = _decode_bytes(data, feat_dim)
                        if dec_kind != kind:
                            # declared "image" that decodes as WAV must not
                            # ship audio fields under image column names
                            raise ValueError(
                                f"media_ref {ref!r} declared kind={kind!r} but "
                                f"decoded as {dec_kind!r}"
                            )
                    except (*_MEDIA_ERRORS, RuntimeError):
                        # RuntimeError stays caught HERE only: the
                        # no-fetch-client refusal above is a per-ref
                        # condition this loop has always skipped
                        if on_error == "error":
                            raise
                        continue
                rows.append((doc_id, ref, kind, w, h, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "kind", "width", "height", "n_frames", "feature"],
            )

    return refs.mapInPandas(_decode_batch, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real decoders (stdlib + NumPy)
# ---------------------------------------------------------------------------


def _decode_netpbm(data: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB) -> uint8 array (h, w, channels)."""
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (with '#' comments), then ONE whitespace byte, then raw samples
    pos = 0
    tokens: list[bytes] = []
    while len(tokens) < 4:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm image: {magic!r}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 1 if magic == b"P5" else 3
    n = w * h * ch
    arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, ch)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (pure NumPy)."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ri[:, None], ci[None, :]]


def block_mean_pool(gray: np.ndarray, grid: int) -> np.ndarray:
    """grid x grid block-mean pooling (true grid means, not sampling).

    Block boundaries are (i*h)//grid; images smaller than the grid are
    nearest-upsampled first so no block is empty.
    """
    h, w = gray.shape
    if h < grid or w < grid:
        gray = resize_nearest(gray, max(h, grid), max(w, grid))
        h, w = gray.shape
    rb = (np.arange(grid + 1) * h) // grid
    cb = (np.arange(grid + 1) * w) // grid
    out = np.empty((grid, grid), dtype=np.float64)
    for i in range(grid):
        for j in range(grid):
            out[i, j] = gray[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].mean()
    return out


def _image_feature(img: np.ndarray, grid: int) -> np.ndarray:
    """grid x grid block-mean-pooled grayscale thumbnail in [0, 1]."""
    if img.ndim == 3 and img.shape[2] in (2, 4):
        img = img[:, :, : img.shape[2] - 1]  # drop the alpha channel
    gray = img.mean(axis=2) if img.ndim == 3 else img
    return (block_mean_pool(gray, grid).astype(np.float32) / 255.0).ravel()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _decode_png(data: bytes) -> np.ndarray:
    """PNG -> uint8 array (h, w, channels) with the stdlib only (zlib +
    struct). Supports 8-bit depth, color types 0/2/3/4/6, no interlacing —
    the overwhelmingly common encoder output. Palette images resolve to RGB.
    """
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc (crc not verified)
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} interlace={interlace} unsupported "
            "(stdlib decoder handles 8-bit, non-interlaced, color types 0/2/3/4/6)"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            cur = np.empty(stride, dtype=np.int32)
            for k in range(ch):
                cur[k::ch] = np.cumsum(row[k::ch]) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential left-dependency
            cur = np.zeros(stride, dtype=np.int32)
            zero = np.zeros(ch, dtype=np.int32)
            for x in range(0, stride, ch):
                left = cur[x - ch : x] if x else zero
                up = prev[x : x + ch]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    ul = prev[x - ch : x] if x else zero
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                cur[x : x + ch] = (row[x : x + ch] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def _decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, n_channels, mono float32 samples)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate, nch, sw = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, nch, x


def _audio_feature(x: np.ndarray, n_windows: int) -> np.ndarray:
    """Windowed RMS energy over n_windows equal slices (zero-padded tail)."""
    n = len(x)
    if n == 0:
        return np.zeros(n_windows, dtype=np.float32)
    pad = (-n) % n_windows
    x2 = np.pad(x, (0, pad)).reshape(n_windows, -1)
    return np.sqrt((x2 * x2).mean(axis=1)).astype(np.float32)


def _decode_bytes(data: bytes, feat_dim: int) -> tuple[str, int, int, int, np.ndarray]:
    """(kind, width, height, n_frames, feature) from raw bytes, by magic.

    Images: width/height = pixels, n_frames = 1, feature = pooled thumbnail
    (grid = sqrt(feat_dim)). Audio: width = sample rate, height = channels,
    n_frames = samples, feature = feat_dim RMS windows. Compressed formats
    need PIL/ffmpeg — NotImplementedError, handled per on_error policy.
    """
    if data[:2] in (b"P5", b"P6") or data[:8] == _PNG_SIG:
        img = _decode_png(data) if data[:8] == _PNG_SIG else _decode_netpbm(data)
        grid = max(int(feat_dim**0.5), 1)
        return "image", img.shape[1], img.shape[0], 1, _image_feature(img, grid)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        rate, nch, x = _decode_wav(data)
        return "audio", rate, nch, len(x), _audio_feature(x, feat_dim)
    if data[:3] == b"\xff\xd8\xff":
        # jpeg: sequential (SOF0/SOF1) AND progressive (SOF2) decode with
        # the pure-stdlib decoder, no PIL needed; the exotic variants it
        # refuses (arithmetic, lossless, 12-bit) fall back to PIL when
        # installed at runtime.
        from fozzie_spark.jpeg import decode_baseline_jpeg

        try:
            img = decode_baseline_jpeg(data)
        except NotImplementedError:
            try:
                from PIL import Image  # noqa: PLC0415
            except ImportError as e:
                raise NotImplementedError(
                    "exotic jpeg (arithmetic/lossless/12-bit) needs "
                    "PIL/pillow, not installed here; sequential + "
                    "progressive jpeg, netpbm/PNG/WAV decode with the stdlib"
                ) from e
            img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8)
        grid = max(int(feat_dim**0.5), 1)
        return "image", img.shape[1], img.shape[0], 1, _image_feature(img, grid)
    raise NotImplementedError(
        f"no stdlib decoder for magic {data[:4]!r} (jpeg needs PIL, mp4 ffmpeg)"
    )


def decode_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    feat_dim: int = 64,
    on_error: str = "skip",
) -> DataFrame:
    """Decode inline binary media columns -> typed metadata + feature vector.

    Arrow-batched mapInPandas; one output row per decodable input row.
    on_error: "skip" drops undecodable rows (count them upstream via an
    Observation if needed); "error" re-raises — reproducible failures.
    """
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bytes_col).alias("data"))

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                try:
                    if data is None:
                        raise ValueError("null media bytes")
                    kind, w, h, nf, feat = _decode_bytes(bytes(data), feat_dim)
                except _MEDIA_ERRORS:
                    if on_error == "error":
                        raise
                    continue
                rows.append((doc_id, None, kind, w, h, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "kind", "width", "height", "n_frames", "feature"],
            )

    return src.mapInPandas(_decode_batch, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video/audio media: one row per sampled frame
    index (JVM explode of a sequence — the decode of each frame would run in
    the same mapInPandas shape as extract_media_features)."""
    return media.where(F.col("n_frames") > 1).select(
        "doc_id",
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


# ---- container probing (no decode) ------------------------------------------

PROBE_SCHEMA = (
    "doc_id string, container string, kind string, width int, height int, "
    "n_frames int, duration_ms bigint, codec string"
)


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each ISO-BMFF box in
    data[start:end]. Handles 64-bit largesize (size==1) and to-end boxes
    (size==0); stops cleanly on truncation."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _parse_mp4(data: bytes) -> dict:
    """Real ISO-BMFF (mp4/mov/m4a) metadata from the container boxes — no
    codec or ffmpeg: moov/mvhd duration, per-trak tkhd dimensions, hdlr
    handler kind, stsd sample-entry fourcc, stsz/stts sample counts.

    Frame DECODE stays honestly out of scope (needs an AVC/HEVC/AAC codec);
    this parser makes the metadata half of the video path real so schema,
    partitioning, and batch plumbing are testable end-to-end.
    """
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box (fragmented/streaming mp4 not indexed here)")
    mb, me = moov
    duration_ms = None
    mvhd = _find_box(data, mb, me, b"mvhd")
    if mvhd is not None:
        b, _ = mvhd
        ver = data[b]
        if ver == 1:
            ts = int.from_bytes(data[b + 20:b + 24], "big")
            dur = int.from_bytes(data[b + 24:b + 32], "big")
        else:
            ts = int.from_bytes(data[b + 12:b + 16], "big")
            dur = int.from_bytes(data[b + 16:b + 20], "big")
        if ts:
            duration_ms = dur * 1000 // ts
    tracks = []
    for fc, tb, te in _iter_boxes(data, mb, me):
        if fc != b"trak":
            continue
        tr = {"kind": None, "codec": None, "width": None, "height": None, "n_samples": None}
        tkhd = _find_box(data, tb, te, b"tkhd")
        if tkhd is not None:
            b, e = tkhd
            ver = data[b]
            # fixed 16.16 width/height are the LAST 8 payload bytes
            tr["width"] = int.from_bytes(data[e - 8:e - 4], "big") >> 16
            tr["height"] = int.from_bytes(data[e - 4:e], "big") >> 16
        mdia = _find_box(data, tb, te, b"mdia")
        if mdia is None:
            tracks.append(tr)
            continue
        db, de = mdia
        hdlr = _find_box(data, db, de, b"hdlr")
        if hdlr is not None:
            b, _ = hdlr
            handler = data[b + 8:b + 12]
            tr["kind"] = {b"vide": "video", b"soun": "audio", b"text": "text"}.get(
                handler, handler.decode("latin1").strip()
            )
        minf = _find_box(data, db, de, b"minf")
        stbl = _find_box(data, *minf, b"stbl") if minf else None
        if stbl is not None:
            sb, se = stbl
            stsd = _find_box(data, sb, se, b"stsd")
            if stsd is not None:
                b, e = stsd
                n_entries = int.from_bytes(data[b + 4:b + 8], "big")
                if n_entries and b + 16 <= e:
                    tr["codec"] = data[b + 12:b + 16].decode("latin1")
            stsz = _find_box(data, sb, se, b"stsz")
            if stsz is not None:
                b, _ = stsz
                tr["n_samples"] = int.from_bytes(data[b + 8:b + 12], "big")
            elif (stts := _find_box(data, sb, se, b"stts")) is not None:
                b, _ = stts
                cnt = int.from_bytes(data[b + 4:b + 8], "big")
                tr["n_samples"] = sum(
                    int.from_bytes(data[b + 8 + 8 * i:b + 12 + 8 * i], "big")
                    for i in range(cnt)
                )
        tracks.append(tr)
    return {"container": "mp4", "duration_ms": duration_ms, "tracks": tracks}


def _probe_bytes(data: bytes) -> tuple:
    """(container, kind, width, height, n_frames, duration_ms, codec) from
    raw bytes by magic — header/box parsing only, NO pixel/sample decode, so
    it covers the codec formats (`mp4`, any jpeg variant) the decoder
    refuses in this container."""
    if data[:8] == _PNG_SIG:
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return ("png", "image", w, h, 1, None, "png")
    if data[:2] in (b"P5", b"P6"):
        fields: list[bytes] = []
        pos = 2
        while len(fields) < 2 and pos < min(len(data), 512):
            if data[pos:pos + 1] == b"#":  # comment to EOL
                while pos < len(data) and data[pos] not in b"\r\n":
                    pos += 1
            elif data[pos] in b" \t\r\n":
                pos += 1
            else:
                tok = bytearray()
                while pos < len(data) and data[pos] not in b" \t\r\n":
                    tok += data[pos:pos + 1]
                    pos += 1
                fields.append(bytes(tok))
        w, h = int(fields[0]), int(fields[1])
        return ("netpbm", "image", w, h, 1, None, "pgm" if data[:2] == b"P5" else "ppm")
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        with wave.open(io.BytesIO(data)) as wf:
            rate, nf = wf.getframerate(), wf.getnframes()
            return ("wav", "audio", rate, wf.getnchannels(), nf,
                    nf * 1000 // rate if rate else None, "pcm")
    if data[:3] == b"\xff\xd8\xff":
        # walk marker segments to the first SOFn for dimensions; no decode
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(data[pos + 5:pos + 7], "big")
                w = int.from_bytes(data[pos + 7:pos + 9], "big")
                kindmap = {0xC0: "baseline", 0xC1: "ext-seq", 0xC2: "progressive"}
                return ("jpeg", "image", w, h, 1, None,
                        f"jpeg-{kindmap.get(marker, hex(marker))}")
            pos += 2 + seg_len
        raise ValueError("jpeg without SOF header")
    if len(data) >= 12 and data[4:8] in (b"ftyp", b"styp", b"moov"):
        meta = _parse_mp4(data)
        vids = [t for t in meta["tracks"] if t["kind"] == "video"]
        auds = [t for t in meta["tracks"] if t["kind"] == "audio"]
        lead = vids[0] if vids else (auds[0] if auds else None)
        codecs = ",".join(sorted({t["codec"] for t in meta["tracks"] if t["codec"]}))
        return (
            "mp4",
            "video" if vids else ("audio" if auds else "unknown"),
            lead["width"] if lead else None,
            lead["height"] if lead else None,
            lead["n_samples"] if lead else None,
            meta["duration_ms"],
            codecs or None,
        )
    raise ValueError(f"unrecognized media magic {data[:8]!r}")


def probe_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    on_error: str = "skip",
) -> DataFrame:
    """Container-level metadata for binary media columns — REAL for every
    format including the codec ones the decoder must refuse (mp4 boxes,
    progressive jpeg): (container, kind, width, height, n_frames,
    duration_ms, codec). Arrow-batched mapInPandas, same scale shape as
    decode_media_features; no pixels or samples are ever decoded."""
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bytes_col).alias("data"))

    def _probe_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                try:
                    if data is None:
                        raise ValueError("null media bytes")
                    rows.append((doc_id, *_probe_bytes(bytes(data))))
                except _MEDIA_ERRORS:
                    if on_error == "error":
                        raise
                    continue
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "container", "kind", "width", "height",
                         "n_frames", "duration_ms", "codec"],
            )

    return src.mapInPandas(_probe_batch, PROBE_SCHEMA)


# ---- mp4 sample byte ranges (keyframe extraction plumbing) -------------------

SAMPLE_RANGE_SCHEMA = (
    "doc_id string, sample_idx int, offset bigint, size bigint, is_sync boolean"
)


def _mp4_sample_table(data: bytes, kind: str = "video"):
    """(codec, rows) for the first track of `kind`: codec is the stsd
    sample-entry fourcc ("avc1", "jpeg", ...) and rows are (sample_idx,
    byte_offset, byte_size, is_sync) from the stbl sample tables: stsz
    (sizes), stsc (chunk -> samples-per-chunk runs), stco/co64 (chunk
    offsets), stss (sync samples; absent => every sample is sync). Sample
    indices are 0-based; offsets are absolute file positions — at corpus
    scale these become ranged reads against the object store, no mdat
    scan."""
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for fc, tb, te in _iter_boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _find_box(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(data, *mdia, b"hdlr")
        want = {"video": b"vide", "audio": b"soun"}.get(kind, kind.encode())
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != want:
            continue
        minf = _find_box(data, *mdia, b"minf")
        stbl = _find_box(data, *minf, b"stbl") if minf else None
        if stbl is None:
            continue
        sb, se = stbl

        def full(fourcc):
            box = _find_box(data, sb, se, fourcc)
            return box[0] + 4 if box else None  # skip version/flags

        stsz = full(b"stsz")
        stsc = full(b"stsc")
        stco, wide = full(b"stco"), False
        if stco is None:
            stco, wide = full(b"co64"), True
        if stsz is None or stsc is None or stco is None:
            raise ValueError("track is missing stsz/stsc/stco sample tables")
        codec = ""
        stsd = full(b"stsd")
        if stsd is not None and int.from_bytes(data[stsd:stsd + 4], "big"):
            codec = data[stsd + 8:stsd + 12].decode("latin1")

        uniform = int.from_bytes(data[stsz:stsz + 4], "big")
        n_samples = int.from_bytes(data[stsz + 4:stsz + 8], "big")
        sizes = (
            [uniform] * n_samples
            if uniform
            else [
                int.from_bytes(data[stsz + 8 + 4 * i:stsz + 12 + 4 * i], "big")
                for i in range(n_samples)
            ]
        )
        n_chunks = int.from_bytes(data[stco:stco + 4], "big")
        step = 8 if wide else 4
        chunk_offsets = [
            int.from_bytes(data[stco + 4 + step * i:stco + 4 + step * (i + 1)], "big")
            for i in range(n_chunks)
        ]
        n_stsc = int.from_bytes(data[stsc:stsc + 4], "big")
        runs = [
            (
                int.from_bytes(data[stsc + 4 + 12 * i:stsc + 8 + 12 * i], "big"),
                int.from_bytes(data[stsc + 8 + 12 * i:stsc + 12 + 12 * i], "big"),
            )
            for i in range(n_stsc)
        ]  # (first_chunk 1-based, samples_per_chunk)
        sync = None
        stss = full(b"stss")
        if stss is not None:
            n_sync = int.from_bytes(data[stss:stss + 4], "big")
            sync = {
                int.from_bytes(data[stss + 4 + 4 * i:stss + 8 + 4 * i], "big") - 1
                for i in range(n_sync)
            }

        rows = []
        si = 0
        for ci in range(n_chunks):
            spc = next(
                (runs[ri][1] for ri in range(len(runs) - 1, -1, -1)
                 if runs[ri][0] <= ci + 1),
                runs[0][1] if runs else 0,
            )
            off = chunk_offsets[ci]
            for _ in range(spc):
                if si >= n_samples:
                    break
                rows.append((si, off, sizes[si], sync is None or si in sync))
                off += sizes[si]
                si += 1
        return codec, rows
    raise ValueError(f"no {kind} track with sample tables")


def mp4_sample_ranges(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    kind: str = "video",
    sync_only: bool = False,
    on_error: str = "skip",
) -> DataFrame:
    """Per-sample byte ranges for mp4 media columns: one row per sample
    (`sync_only=True`: keyframes only), (doc_id, sample_idx, offset, size,
    is_sync). This is the scale path for frame extraction over a 100-TB
    corpus: plan the exact byte ranges from the moov index (a few KB per
    file), then fetch ONLY those ranges — never stream whole videos
    through the decode stage. Arrow-batched mapInPandas like probe_media;
    the codec decode of the fetched sample bytes stays out of scope
    (AVC/HEVC needs a codec — `extract_media_features` documents the
    same boundary)."""
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bytes_col).alias("data"))

    def _ranges_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                try:
                    if data is None:
                        raise ValueError("null media bytes")
                    doc_rows = [
                        (doc_id, si, off, size, is_sync)
                        for si, off, size, is_sync in _mp4_sample_table(
                            bytes(data), kind
                        )[1]
                        if is_sync or not sync_only
                    ]
                except _MEDIA_ERRORS:
                    if on_error == "error":
                        raise
                    continue
                rows.extend(doc_rows)
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_idx", "offset", "size", "is_sync"]
            )

    return src.mapInPandas(_ranges_batch, SAMPLE_RANGE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id string, sample_idx int, width int, height int, is_sync boolean, "
    "feature array<float>"
)

#: stsd sample-entry fourccs whose samples are self-contained JPEG images
_MJPEG_CODECS = {"jpeg", "mjpa", "mjpb", "JPEG"}


def decode_mp4_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    feat_dim: int = 16,
    sync_only: bool = False,
    max_frames: int | None = None,
    on_error: str = "skip",
) -> DataFrame:
    """Decode MJPEG-in-mp4 video frames end-to-end with the stdlib: the
    stbl sample index (`_mp4_sample_table`) yields each sample's byte
    range, every MJPEG sample IS a complete JPEG image, and
    `jpeg.decode_baseline_jpeg` turns it into pixels — one row per decoded
    frame (doc_id, sample_idx, width, height, is_sync, pooled grayscale
    feature like `decode_media_features`).

    `sync_only` decodes keyframes only; `max_frames` caps frames per doc
    (taken in sample order) — at 100-TB scale the range plan means those
    are the ONLY bytes a remote fetch would read, never the whole mdat.
    Non-MJPEG codecs (avc1/hev1/... — inter-frame codecs that need a real
    video decoder) raise NotImplementedError, handled per `on_error`
    ("skip" drops the doc, "error" re-raises). Arrow-batched mapInPandas,
    same shape as probe_media."""
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    from fozzie_spark.jpeg import decode_baseline_jpeg

    src = df.select(F.col(id_col).alias("doc_id"), F.col(bytes_col).alias("data"))
    grid = max(int(feat_dim**0.5), 1)

    def _frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                # per-doc buffer: a decode failure mid-doc must drop the
                # WHOLE doc under on_error="skip" (the documented
                # contract) — appending straight to `rows` leaked the
                # already-decoded frames of a partially-bad doc
                doc_rows = []
                try:
                    if data is None:
                        raise ValueError("null media bytes")
                    b = bytes(data)
                    codec, samples = _mp4_sample_table(b, "video")
                    if codec not in _MJPEG_CODECS:
                        raise NotImplementedError(
                            f"mp4 video codec {codec!r} needs an inter-frame "
                            "decoder (only MJPEG samples decode with the stdlib)"
                        )
                    taken = 0
                    for si, off, size, is_sync in samples:
                        if sync_only and not is_sync:
                            continue
                        if max_frames is not None and taken >= max_frames:
                            break
                        img = decode_baseline_jpeg(b[off:off + size])
                        doc_rows.append((
                            doc_id, si, img.shape[1], img.shape[0], is_sync,
                            _image_feature(img, grid),
                        ))
                        taken += 1
                except _MEDIA_ERRORS:
                    if on_error == "error":
                        raise
                    continue
                rows.extend(doc_rows)
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_idx", "width", "height", "is_sync", "feature"],
            )

    return src.mapInPandas(_frames_batch, FRAME_SCHEMA)


# ---- audio spectral features -------------------------------------------------

SPECTRAL_SCHEMA = (
    "doc_id string, sample_rate int, n_samples bigint, "
    "spectral_centroid_hz double, band_energy array<float>"
)


def _spectral_feature(x: np.ndarray, rate: int, n_bands: int) -> tuple[float, np.ndarray]:
    """(spectral centroid in Hz, per-band energy fractions) from mono
    samples: one rfft, log-spaced bands from 20 Hz to Nyquist. Energy
    fractions sum to ~1 (silence => centroid 0, zero bands)."""
    n = len(x)
    if n == 0:
        return 0.0, np.zeros(n_bands, dtype=np.float32)
    mag2 = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = mag2.sum()
    if total <= 0:
        return 0.0, np.zeros(n_bands, dtype=np.float32)
    centroid = float((freqs * mag2).sum() / total)
    lo, hi = 20.0, rate / 2.0
    edges = np.concatenate(
        ([0.0], np.geomspace(lo, hi, n_bands)) if hi > lo else ([0.0], [hi] * n_bands)
    )
    idx = np.searchsorted(edges, freqs, side="right") - 1
    idx = np.clip(idx, 0, n_bands - 1)
    bands = np.zeros(n_bands, dtype=np.float64)
    np.add.at(bands, idx, mag2)
    return centroid, (bands / total).astype(np.float32)


def audio_spectral_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    n_bands: int = 16,
    on_error: str = "skip",
) -> DataFrame:
    """Spectral features for inline WAV audio columns: one rfft per clip in
    an Arrow-batched mapInPandas — (sample_rate, n_samples, spectral
    centroid Hz, log-spaced band energy fractions 20 Hz..Nyquist).
    Compressed codecs (mp3/aac/...) have no stdlib decoder: on_error="skip"
    drops them, "error" re-raises."""
    if on_error not in ("skip", "error"):
        raise ValueError(f"unknown on_error {on_error!r}")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bytes_col).alias("data"))

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                try:
                    if data is None:
                        raise ValueError("null media bytes")
                    b = bytes(data)
                    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                        raise NotImplementedError("not a RIFF/WAVE clip")
                    rate, _nch, x = _decode_wav(b)
                    centroid, bands = _spectral_feature(x, rate, n_bands)
                except _MEDIA_ERRORS:
                    if on_error == "error":
                        raise
                    continue
                rows.append((doc_id, rate, len(x), centroid, bands))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "spectral_centroid_hz", "band_energy",
                ],
            )

    return src.mapInPandas(_batch, SPECTRAL_SCHEMA)
