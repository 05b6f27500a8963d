"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque Arrow ``binary`` cells with typed metadata
columns. The Ray-side plumbing — schema, actor-pool stage, small batch
sizing for large payloads, output layout — is real and tested. The
JPEG/PNG/audio/video codec decode is STUBBED (no codec libraries exist
in this container): ``mode="real"`` raises ``NotImplementedError`` at
the decode call-site, ``mode="fake"`` substitutes a deterministic
byte-histogram "decode" so the distributed pipeline is exercised end
to end. Binary PPM (P6) is the exception — raw RGB behind an ASCII
header needs no codec, so :func:`decode_ppm` / :func:`resize_nearest`
/ :class:`PpmImageStats` below are a fully REAL decode → resize →
feature chain in pure numpy, with an exact SQL oracle over
deterministically synthesized images (``synth_ppm``).

Scale notes: payloads dominate block size, so callers pass a small
``batch_size`` (default 32) and the stage is an actor pool — a real
deployment loads the codec/model once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real decode (PIL/libsndfile/ffmpeg) is unavailable here."""
    raise NotImplementedError(
        f"no {media_type} codec in this environment; use mode='fake'")


def _fake_decode(payload: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic stand-in: normalized byte histogram → feature_dim."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if not len(arr):
        return np.zeros(feature_dim, dtype=np.float32)
    hist = np.bincount(arr % feature_dim, minlength=feature_dim)
    return (hist / hist.sum()).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payloads → feature vectors + metadata.

    Use: ``ds.map_batches(MediaFeatureExtractor,
    fn_constructor_kwargs=dict(media_col=..., id_cols=[...]),
    batch_size=32, concurrency=N, batch_format="pyarrow")``.
    """

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None,
                 media_type: str = "image", mode: str = "fake",
                 feature_dim: int = 16):
        # model / codec load happens ONCE per actor, here
        self.media_col = media_col
        self.id_cols = id_cols or []
        self.media_type = media_type
        self.mode = mode
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.media_col]
        payloads = col.to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        sizes = np.empty(len(payloads), dtype=np.int64)
        digests = []
        for i, p in enumerate(payloads):
            p = p or b""
            sizes[i] = len(p)
            digests.append(hashlib.md5(p).hexdigest())
            if self.mode == "fake":
                feats[i] = _fake_decode(p, self.feature_dim)
            else:
                feats[i] = decode_media(p, self.media_type)  # raises
        out = batch.select(self.id_cols)
        out = out.append_column("n_bytes", pa.array(sizes))
        out = out.append_column("digest", pa.array(digests, type=pa.string()))
        offs = pa.array(
            np.arange(0, (len(payloads) + 1) * self.feature_dim,
                      self.feature_dim, dtype=np.int32), type=pa.int32())
        out = out.append_column(
            "features",
            pa.ListArray.from_arrays(offs, pa.array(feats.ravel(),
                                                    type=pa.float32())))
        return out


class MediaResizer:
    """Actor-pool stage: payload → resized payload (binary → binary).

    Real resize (PIL/ffmpeg scale) is STUBBED like decode; fake mode
    emits a deterministic byte-stride downsample so the binary-in /
    binary-out plumbing (schema, offsets, small batches) is exercised.
    Output keeps id columns + ``payload`` (resized) + ``orig_bytes``."""

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None, mode: str = "fake",
                 target_bytes: int = 256):
        self.media_col = media_col
        self.id_cols = id_cols or []
        self.mode = mode
        self.target_bytes = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        out_payloads: list[bytes] = []
        orig = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            orig[i] = len(p)
            if self.mode != "fake":
                raise NotImplementedError(
                    "no image codec in this environment; use mode='fake'")
            stride = max(1, len(p) // self.target_bytes)
            out_payloads.append(p[::stride][:self.target_bytes])
        out = batch.select(self.id_cols)
        out = out.append_column(
            "payload", pa.array(out_payloads, type=pa.binary()))
        out = out.append_column("orig_bytes", pa.array(orig))
        return out


class FrameSampler:
    """Actor-pool stage: video payload → one row per sampled frame
    (the flat-map row-expansion layout real frame sampling needs).

    Real demux/decode is STUBBED; fake mode slices the payload into
    ``n_frames`` evenly spaced byte windows. Output:
    (id columns, frame_idx:int32, frame:binary)."""

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None, mode: str = "fake",
                 n_frames: int = 4, frame_bytes: int = 64):
        self.media_col = media_col
        self.id_cols = id_cols or []
        self.mode = mode
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        frames: list[bytes] = []
        fidx: list[int] = []
        row_of: list[int] = []
        for i, p in enumerate(payloads):
            p = p or b""
            if self.mode != "fake":
                raise NotImplementedError(
                    "no video demuxer in this environment; use mode='fake'")
            k = self.n_frames
            for j in range(k):
                start = (len(p) * j) // k
                frames.append(p[start:start + self.frame_bytes])
                fidx.append(j)
                row_of.append(i)
        out = batch.select(self.id_cols).take(pa.array(row_of))
        out = out.append_column(
            "frame_idx", pa.array(fidx, type=pa.int32()))
        out = out.append_column(
            "frame", pa.array(frames, type=pa.binary()))
        return out


# ---------------------------------------------------------------- PPM
# A REAL image path with no codec libraries: binary PPM (P6) is raw
# RGB behind a 3-token ASCII header, decodable in pure numpy. The
# JPEG/PNG-class codecs stay stubbed above; this gives the pipeline a
# genuine decode → resize → feature chain end to end.

def synth_ppm(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic P6 image: pixel(c, y, x) =
    (x + 2*y + 3*c + doc_id) % 256 — closed form a SQL oracle can
    recompute exactly."""
    header = f"P6\n{w} {h}\n255\n".encode()
    x = np.arange(w, dtype=np.int64).reshape(1, w, 1)
    y = np.arange(h, dtype=np.int64).reshape(h, 1, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, 3)
    px = ((x + 2 * y + 3 * c + int(doc_id)) % 256).astype(np.uint8)
    return header + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy binary-PPM (P6) decode → (h, w, 3) uint8. Minimal
    parser: magic + width/height/maxval tokens separated by ASCII
    whitespace, then raw RGB (comments unsupported, documented)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1                       # single whitespace before raster
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=i)
    return arr.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, factor: int = 2) -> np.ndarray:
    """Nearest-neighbor downsample by integer factor (pure striding —
    zero-copy view)."""
    return img[::factor, ::factor, :]


class PpmImageStats:
    """Actor-pool stage: REAL decode (PPM) → nearest-neighbor half
    resize → exact integer channel sums for both scales. Decode cost
    is per-image, so the batch loop is over images, each fully
    vectorized; payloads dominate block size → callers use a small
    batch_size, like every media stage here."""

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None):
        self.media_col = media_col
        self.id_cols = id_cols or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        n = len(payloads)
        out = {k: np.empty(n, dtype=np.int64)
               for k in ("w", "h", "sum_r", "sum_g", "sum_b",
                         "half_sum_r", "half_sum_g", "half_sum_b")}
        for i, p in enumerate(payloads):
            img = decode_ppm(p)
            half = resize_nearest(img, 2)
            out["h"][i], out["w"][i] = img.shape[0], img.shape[1]
            s = img.astype(np.int64).sum(axis=(0, 1))
            hs = half.astype(np.int64).sum(axis=(0, 1))
            out["sum_r"][i], out["sum_g"][i], out["sum_b"][i] = s
            (out["half_sum_r"][i], out["half_sum_g"][i],
             out["half_sum_b"][i]) = hs
        t = batch.select(self.id_cols)
        for k in ("w", "h", "sum_r", "sum_g", "sum_b",
                  "half_sum_r", "half_sum_g", "half_sum_b"):
            t = t.append_column(k, pa.array(out[k], type=pa.int64()))
        return t


# ---------------------------------------------------------------- WAV
# Same idea for audio: RIFF/WAVE PCM16 is raw samples behind a chunked
# binary header — a REAL decode in pure numpy, no libsndfile.

def synth_wav(doc_id: int, n_samples: int,
              sample_rate: int = 8000) -> bytes:
    """Deterministic mono PCM16 WAV: sample(t) =
    ((t * (doc_id + 1) + 7) % 4096) - 2048 — closed form for the SQL
    oracle."""
    t = np.arange(n_samples, dtype=np.int64)
    s = ((t * (int(doc_id) + 1) + 7) % 4096 - 2048).astype("<i2")
    data = s.tobytes()
    import struct as _st
    fmt = _st.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
            + b"data" + _st.pack("<I", len(data)) + data)
    return b"RIFF" + _st.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE PCM16 mono decode → (samples int16,
    sample_rate). Proper chunk walk — fmt and data chunks located by
    tag, unknown chunks skipped (word-aligned), like any real RIFF
    reader."""
    import struct as _st

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + _st.unpack("<I", payload[4:8])[0]
    rate, bits, channels = None, None, None
    data = None
    while pos + 8 <= min(end, len(payload)):
        tag = payload[pos:pos + 4]
        size = _st.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, rate = _st.unpack("<HHI", body[:8])
            bits = _st.unpack("<H", body[14:16])[0]
            if fmt_code != 1:
                raise ValueError("only PCM (format 1) supported")
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)      # chunks are word-aligned
    if data is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError("only 16-bit mono supported")
    return np.frombuffer(data, dtype="<i2"), rate


class WavAudioStats:
    """Actor-pool stage: REAL WAV decode → exact integer features
    (sample count, sum |s|, sum s², strict zero crossings) — the
    audio analog of :class:`PpmImageStats`, same small-batch layout."""

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None):
        self.media_col = media_col
        self.id_cols = id_cols or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        n = len(payloads)
        out = {k: np.empty(n, dtype=np.int64)
               for k in ("n_samples", "sample_rate", "sum_abs",
                         "sum_sq", "crossings")}
        for i, p in enumerate(payloads):
            s, rate = decode_wav(p)
            s64 = s.astype(np.int64)
            out["n_samples"][i] = len(s)
            out["sample_rate"][i] = rate
            out["sum_abs"][i] = np.abs(s64).sum()
            out["sum_sq"][i] = (s64 * s64).sum()
            out["crossings"][i] = int((s64[:-1] * s64[1:] < 0).sum())
        t = batch.select(self.id_cols)
        for k in ("n_samples", "sample_rate", "sum_abs", "sum_sq",
                  "crossings"):
            t = t.append_column(k, pa.array(out[k], type=pa.int64()))
        return t


# ---------------------------------------------------------------- Y4M
# And video: YUV4MPEG2 (.y4m) is the standard uncompressed video
# interchange format — ASCII stream header, then per-frame "FRAME\n"
# markers ahead of raw YUV 4:2:0 planes. Real parse + frame sampling
# in pure numpy, no demuxer library.

def synth_y4m(doc_id: int, w: int, h: int, n_frames: int) -> bytes:
    """Deterministic YUV4MPEG2 clip: Y(f, y, x) =
    (x + y + 5*f + doc_id) % 256; U and V are the Y formula offset by
    64 and 128 over the half-resolution grid."""
    parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    x = np.arange(w, dtype=np.int64).reshape(1, w)
    y = np.arange(h, dtype=np.int64).reshape(h, 1)
    xh = np.arange(w // 2, dtype=np.int64).reshape(1, w // 2)
    yh = np.arange(h // 2, dtype=np.int64).reshape(h // 2, 1)
    for f in range(n_frames):
        base = 5 * f + int(doc_id)
        yp = ((x + y + base) % 256).astype(np.uint8)
        up = ((xh + yh + base + 64) % 256).astype(np.uint8)
        vp = ((xh + yh + base + 128) % 256).astype(np.uint8)
        parts.append(b"FRAME\n" + yp.tobytes() + up.tobytes()
                     + vp.tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Pure-numpy YUV4MPEG2 parse → (w, h, [Y planes]). Stream header
    tags are split on spaces (W/H required, C420 assumed/verified);
    each frame is located by its FRAME marker line (frame parameters
    after FRAME are allowed and skipped, per spec)."""
    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tag in head[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C" and tag != b"C420":
            raise ValueError("only C420 supported")
    if not w or not h:
        raise ValueError("missing W/H header tags")
    fsize = w * h + 2 * (w // 2) * (h // 2)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        yp = np.frombuffer(payload, dtype=np.uint8, count=w * h,
                           offset=pos).reshape(h, w)
        frames.append(yp)
        pos += fsize
    return w, h, frames


class Y4mFrameStats:
    """Actor-pool stage: REAL video parse → sample every ``stride``-th
    frame → one OUTPUT ROW PER SAMPLED FRAME with the exact integer
    Y-plane sum (the flat-map row-expansion layout real frame
    sampling needs — the video analog of :class:`FrameSampler`, but
    on a genuine container)."""

    def __init__(self, media_col: str = "payload",
                 id_cols: list[str] | None = None, stride: int = 2):
        self.media_col = media_col
        self.id_cols = id_cols or []
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        row_of: list[int] = []
        fidx: list[int] = []
        ysum: list[int] = []
        for i, p in enumerate(payloads):
            _, _, frames = decode_y4m(p)
            for j in range(0, len(frames), self.stride):
                row_of.append(i)
                fidx.append(j)
                ysum.append(int(frames[j].astype(np.int64).sum()))
        out = batch.select(self.id_cols).take(pa.array(row_of))
        out = out.append_column("frame_idx",
                                pa.array(fidx, type=pa.int64()))
        out = out.append_column("y_sum",
                                pa.array(ysum, type=pa.int64()))
        return out


def extract_media_features(ds: ray.data.Dataset, media_col: str,
                           id_cols: list[str], media_type: str = "image",
                           mode: str = "fake", feature_dim: int = 16,
                           batch_size: int = 32, concurrency: int = 2
                           ) -> ray.data.Dataset:
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs=dict(media_col=media_col, id_cols=id_cols,
                                   media_type=media_type, mode=mode,
                                   feature_dim=feature_dim),
        batch_size=batch_size, concurrency=concurrency,
        batch_format="pyarrow")
