"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool stages.

The image/audio codec libraries are not available in this environment, so
the codec step is STUBBED: ``backend='real'`` raises NotImplementedError
at actor construction, while the default ``backend='fake'`` produces
deterministic hash-derived features with the exact schema, batch sizing
and actor plumbing the real stage would use. Everything Ray-side (small
batches for large payloads, actor pools with per-actor codec state,
zero-copy binary columns kept in Arrow) is real and tested.

Schema convention:
    media(id:int64, kind:string{image,audio,video}, payload:binary,
          meta:{width,height,sample_rate,...} as typed columns)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic opaque payloads standing in for encoded media."""
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        h = hashlib.sha256(f"media:{seed}:{i}".encode()).digest()
        size = 256 + (h[0] << 4)
        ids.append(i)
        kind_col.append(kinds[i % 3])
        payloads.append((h * ((size // len(h)) + 1))[:size])
        widths.append(64 + h[1] % 192)
        heights.append(64 + h[2] % 192)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


class MediaDecoder:
    """Actor: codec state in __init__, per-batch decode in __call__.

    ``backend='real'`` is the slot for PIL/av/torchaudio — unavailable
    here, so it raises NotImplementedError (clearly-marked stub per the
    build brief). ``backend='fake'`` derives deterministic features from
    the payload bytes so the pipeline shape is fully exercised."""

    def __init__(self, backend: str = "fake", feature_dim: int = 16):
        if backend == "real":
            raise NotImplementedError(
                "real media codecs (PIL/av) are not available in this "
                "environment; use backend='fake'"
            )
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = (h * ((self.feature_dim // len(h)) + 1))[: self.feature_dim]
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        return v / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._features(p) for p in payloads]
        n_bytes = [len(p) for p in payloads]
        return pa.table(
            {
                "id": batch.column("id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats],
                    pa.list_(pa.float32(), self.feature_dim),
                ),
            }
        )


class FrameSampler:
    """Actor: sample K deterministic 'frames' per video payload —
    one row in, K rows out (flat-map shape)."""

    def __init__(self, num_frames: int = 4, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("real video decode unavailable; use fake")
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offsets = [], [], []
        for i, payload in zip(
            batch.column("id").to_pylist(), batch.column("payload").to_pylist()
        ):
            step = max(1, len(payload) // self.num_frames)
            for k in range(self.num_frames):
                ids.append(i)
                frames.append(k)
                offsets.append(
                    payload[k * step : k * step + 16]
                )
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "frame_bytes": pa.array(offsets, pa.binary()),
            }
        )


def decode_media(media_ds, *, batch_size: int = 64, concurrency=(1, 8)):
    """Large binary payloads → SMALL batches (the guide's memory rule)."""
    return media_ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, *, num_frames: int = 4, batch_size: int = 32,
                  concurrency=(1, 4)):
    video = media_ds.filter(expr="kind == 'video'")
    return video.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(num_frames=num_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
