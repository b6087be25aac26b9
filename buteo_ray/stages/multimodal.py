"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed
exactly as the task brief requires: ``decoder="real"`` raises
``NotImplementedError`` at the decode call site (drop in PIL/ffmpeg
there on a real deployment), while ``decoder="fake"`` produces a
deterministic pseudo-image from the payload hash so the Ray-side
plumbing — schema, batch sizing, actor lifecycle, output layout — is
real and tested end-to-end. Downstream stages (resize, feature
extraction, frame sampling) operate on decoded arrays and are fully
real.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.stages.dedup import _splitmix64


def _resize_bilinear(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Axis-independent bilinear resize to exactly (th, tw)."""
    h, w, c = img.shape
    fy = (np.arange(th) + 0.5) * h / th - 0.5
    fx = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    tx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = img[y0[:, None], x0[None, :], :].astype(np.float64)
    b = img[y0[:, None], x1[None, :], :].astype(np.float64)
    cc = img[y1[:, None], x0[None, :], :].astype(np.float64)
    d = img[y1[:, None], x1[None, :], :].astype(np.float64)
    return a * (1 - ty) * (1 - tx) + b * (1 - ty) * tx + cc * ty * (1 - tx) + d * ty * tx

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # image | audio | video
    ("payload", pa.binary()),          # encoded bytes (opaque)
    ("width", pa.int32()),             # declared metadata
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])


def synth_media_table(n: int, media_type: str = "image",
                      width: int = 64, height: int = 48,
                      n_frames: int = 1) -> pa.Table:
    """Deterministic fake encoded-media table (payload = seeded bytes)."""
    ids = np.arange(n, dtype=np.int64)
    payloads = []
    for i in ids:
        h = _splitmix64(np.arange(32, dtype=np.uint64) + np.uint64(i * 7919))
        payloads.append(h.tobytes())
    return pa.table({
        "media_id": ids,
        "media_type": [media_type] * n,
        "payload": pa.array(payloads, type=pa.binary()),
        "width": np.full(n, width, dtype=np.int32),
        "height": np.full(n, height, dtype=np.int32),
        "n_frames": np.full(n, n_frames, dtype=np.int32),
    })


def _fake_decode(payload: bytes, height: int, width: int, channels: int = 3) -> np.ndarray:
    """Deterministic pseudo-decode: payload hash → uint8 pixels."""
    seed = np.frombuffer(payload[:8], dtype=np.uint64)[0] if len(payload) >= 8 else np.uint64(0)
    idx = np.arange(height * width * channels, dtype=np.uint64) + seed
    return (_splitmix64(idx) % np.uint64(256)).astype(np.uint8).reshape(height, width, channels)


class MediaDecoder:
    """Actor-pool decode stage. ``__init__`` is where a real deployment
    loads codecs/models ONCE per actor; ``__call__`` decodes per batch.

    Output: ``media_id`` + decoded ``pixels:binary`` (uint8 C-order) +
    ``dec_height/dec_width/dec_channels``. Keep ``batch_size`` small —
    decoded frames are ~H·W·3 bytes per row and batch × concurrency
    must fit the worker heap (task-brief sizing note).
    """

    def __init__(self, decoder: str = "fake", target: Optional[Tuple[int, int]] = None):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder = decoder
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            # Drop in PIL.Image.open / av.open here on a deployment with
            # codecs installed.
            raise NotImplementedError(
                "no image/audio codecs in this environment; use decoder='fake'"
            )
        out_pixels, oh, ow, oc = [], [], [], []
        for i in range(batch.num_rows):
            h = batch["height"][i].as_py()
            w = batch["width"][i].as_py()
            img = _fake_decode(batch["payload"][i].as_py(), h, w)
            if self.target is not None:
                th, tw = self.target
                img = np.clip(_resize_bilinear(img, th, tw), 0, 255).astype(np.uint8)
            out_pixels.append(np.ascontiguousarray(img).tobytes())
            oh.append(img.shape[0])
            ow.append(img.shape[1])
            oc.append(img.shape[2])
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.array(out_pixels, type=pa.binary()),
            "dec_height": pa.array(oh, type=pa.int32()),
            "dec_width": pa.array(ow, type=pa.int32()),
            "dec_channels": pa.array(oc, type=pa.int32()),
        })


def decode_media(ds, decoder: str = "fake", target: Optional[Tuple[int, int]] = None,
                 concurrency: int = 2, batch_size: int = 64):
    """Decode (or fake-decode) a media Dataset via the actor pool."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(decoder=decoder, target=target),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def _binary_column_view(batch: pa.Table, name: str):
    """(values: uint8 view over the Arrow data buffer, offsets: int64) —
    zero-copy access to a binary column, no per-row ``.as_py()``."""
    col = batch.column(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if pa.types.is_large_binary(arr.type):
        off_dtype = np.int64          # large_binary carries int64 offsets
    elif pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"column {name!r}: expected binary/large_binary, "
                        f"got {arr.type}")
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, off


def extract_features(decoded_ds):
    """Per-image channel statistics (the feature-extraction stage shape:
    swap the body for a model forward pass). Uniform-dims batches take
    the vectorized path: one zero-copy uint8 view reshaped (n, h·w, c)
    with float64-accumulated mean/std — no per-row Python, no float64
    pixel copy; mixed-dims batches fall back to the per-row loop."""

    def _stats_per_row(batch: pa.Table):
        means, stds = [], []
        for i in range(batch.num_rows):
            h = batch["dec_height"][i].as_py()
            w = batch["dec_width"][i].as_py()
            c = batch["dec_channels"][i].as_py()
            img = np.frombuffer(batch["pixels"][i].as_py(), dtype=np.uint8).reshape(h, w, c)
            means.append(img.mean(axis=(0, 1)))
            stds.append(img.std(axis=(0, 1)))
        c_off = np.concatenate([[0], np.cumsum([len(m) for m in means])])
        m = np.concatenate(means) if means else np.empty(0, np.float64)
        s = np.concatenate(stds) if stds else np.empty(0, np.float64)
        return m, s, c_off

    def _fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = batch["dec_height"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["dec_width"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["dec_channels"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniform = n > 0 and (h == h[0]).all() and (w == w[0]).all() and (c == c[0]).all()
        if uniform:
            data, off = _binary_column_view(batch, "pixels")
            row_bytes = h[0] * w[0] * c[0]
            if not (np.diff(off) == row_bytes).all():
                raise ValueError("pixels byte length != dec_height*dec_width*dec_channels")
            flat = data[off[0]:off[-1]].reshape(n, h[0] * w[0], c[0])
            m = flat.mean(axis=1, dtype=np.float64)
            # Two-pass population std — same op order as per-image
            # img.std(axis=(0, 1)), so results are bit-identical. The
            # float64 diff copy is bounded by this stage's batch_size.
            d = flat - m[:, None, :]
            s = np.sqrt((d * d).mean(axis=1))
            mean_vals, std_vals = m.ravel(), s.ravel()
            c_off = np.arange(n + 1, dtype=np.int64) * c[0]
        else:
            mean_vals, std_vals, c_off = _stats_per_row(batch)
        offsets = pa.array(c_off, type=pa.int32())
        return pa.table({
            "media_id": batch["media_id"],
            "channel_mean": pa.ListArray.from_arrays(
                offsets, pa.array(mean_vals, type=pa.float64())),
            "channel_std": pa.ListArray.from_arrays(
                offsets, pa.array(std_vals, type=pa.float64())),
        })

    # Bounded batch: the vectorized path holds one float64 copy of the
    # batch's pixels (~24 B/px at c=3) — 256 rows of 64×48×3 ≈ 19 MB.
    return decoded_ds.map_batches(_fn, batch_format="pyarrow", batch_size=256)


def sample_frames(ds, every_nth: int = 2):
    """Frame sampling for video rows: explode n_frames → keep every
    n-th (the video-pipeline plumbing; frames share the payload stub)."""

    def _fn(batch: pa.Table) -> pa.Table:
        n = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        # len(range(0, n, k)) == ceil(n / k), 0 for n <= 0
        counts = np.maximum(n, 0)
        counts = (counts + every_nth - 1) // every_nth
        ids = np.repeat(mids, counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        frame_idx = (np.arange(counts.sum(), dtype=np.int64) - starts) * every_nth
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frame_idx, type=pa.int64()),
        })

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
