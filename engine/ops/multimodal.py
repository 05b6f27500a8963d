"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque Arrow ``binary`` cells with typed metadata
columns. The Ray-side plumbing — schema, actor-pool stage, small batch
sizing for large payloads, output layout — is real and tested; the
actual codec decode is STUBBED (no image/audio libraries exist in this
container): ``mode="real"`` raises ``NotImplementedError`` at the
decode call-site, ``mode="fake"`` substitutes a deterministic
byte-histogram "decode" so the distributed pipeline is exercised end
to end.

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
