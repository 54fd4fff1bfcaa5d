"""Multimodal column stages: image/audio as opaque binary + metadata.

The image/audio decode libraries are not present in this environment,
so the DECODE KERNELS are stubbed (deterministic fake or
NotImplementedError), while everything Ray-side is real and tested:
schemas, actor-pool signatures, batch sizing for wide binary payloads,
and output layout (SURVEY.md training-data additions; the reference has
no binary columns at all, SURVEY.md §1.2).

Pattern notes for real deployments:
- binary payload stages use SMALL batch sizes (payload x batch x
  concurrency must fit worker heaps; §7.4 hard part 4);
- decoders are actor pools: model/codec loaded once in ``__init__``;
- decoded features replace payloads as early as possible (project the
  binary away before any shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geodata_ray.sources.synth import splitmix64


def synth_image_table(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic fake image corpus: (image_id, payload binary,
    width, height, format)."""
    idx = np.arange(n, dtype=np.uint64)
    h = splitmix64(idx ^ np.uint64(seed * 7919))
    w = (64 + (h % np.uint64(192))).astype(np.int32)
    ht = (64 + ((h >> np.uint64(8)) % np.uint64(192))).astype(np.int32)
    payloads = []
    for i in range(n):
        rng = np.random.default_rng(int(h[i]) & 0x7FFFFFFF)
        payloads.append(rng.bytes(256))  # stand-in compressed bytes
    return pa.table(
        {
            "image_id": pa.array(idx.astype(np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(w),
            "height": pa.array(ht),
            "format": pa.array(np.where(idx % 3 == 0, "png", "jpeg")),
        }
    )


class ImageDecoder:
    """Actor-pool stage: payload -> decoded feature vector.

    ``__init__`` is where a real build loads the codec/model once per
    actor.  The decode itself is STUBBED: ``fake=True`` (default)
    derives a deterministic feature vector from the payload bytes so
    pipelines are end-to-end testable; ``fake=False`` raises
    NotImplementedError (no imaging library in this sandbox).
    """

    def __init__(self, *, feature_dim: int = 16, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        # real build: self.codec = load_codec(); self.model = load_model()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an imaging library not present "
                "in this environment; run with fake=True for plumbing"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = np.frombuffer(p, dtype=np.uint8)
            # deterministic per-byte-histogram "features"
            seg = np.array_split(b.astype(np.float32), self.feature_dim)
            feats[i] = [s.mean() if s.size else 0.0 for s in seg]
        out = batch.drop_columns(["payload"])  # drop binary before shuffles
        return out.append_column(
            "features",
            pa.array(list(feats), type=pa.list_(pa.float32())),
        )


def decode_images(ds, *, feature_dim: int = 16, concurrency=(1, 4),
                  batch_size: int = 256):
    """Wide-binary actor-pool stage: note the small ``batch_size``."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Resize stub: real build wraps a codec resize; here the stage
    rewrites width/height metadata to the target box (aspect preserved)
    and passes the payload through — the schema/actor plumbing is what
    pipelines depend on."""

    def __init__(self, *, max_side: int = 128, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resizing requires an imaging library not present "
                "in this environment"
            )
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        nw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        nh = np.maximum(1, np.round(h * scale)).astype(np.int32)
        i = batch.schema.get_field_index("width")
        batch = batch.set_column(i, "width", pa.array(nw))
        i = batch.schema.get_field_index("height")
        return batch.set_column(i, "height", pa.array(nh))


def resize_images(ds, *, max_side: int = 128, concurrency=(1, 4),
                  batch_size: int = 256):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeaturizer:
    """Audio feature-extraction stub (MFCC-shaped): deterministic fake
    spectral summary from the payload bytes; ``fake=False`` raises
    (no audio codec in this environment)."""

    def __init__(self, *, n_coeffs: int = 13, fake: bool = True):
        self.n_coeffs = n_coeffs
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decoding requires an audio library not present "
                "in this environment"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.n_coeffs), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
            # fake cepstrum: cosine projections of the byte sequence
            t = np.arange(b.size)
            for c in range(self.n_coeffs):
                feats[i, c] = float(
                    (b * np.cos(np.pi * (c + 1) * t / max(b.size, 1))).mean()
                )
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "mfcc", pa.array(list(feats), type=pa.list_(pa.float32()))
        )


def extract_audio_features(ds, *, n_coeffs: int = 13, concurrency=(1, 4),
                           batch_size: int = 128):
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"n_coeffs": n_coeffs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling stub: emits one row per sampled frame
    (flat-map shape).  Deterministic fake: frame count derived from
    payload length."""

    def __init__(self, *, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy()
        sizes = pa.compute.binary_length(batch["payload"]).to_numpy()
        n_frames = np.maximum(sizes // (self.every_n * 8), 1)
        rep = np.repeat(np.arange(len(ids)), n_frames)
        frame_no = np.concatenate([np.arange(k) for k in n_frames])
        return pa.table(
            {
                "image_id": pa.array(ids[rep]),
                "frame_no": pa.array(frame_no.astype(np.int64)),
            }
        )


def sample_frames(ds, *, every_n: int = 10, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )
