"""Multimodal column stages: image / audio / video as opaque ``binary``
columns with typed metadata.

The container has no codec libraries, so the DECODE step itself is
stubbed (clearly marked) behind ``set_decoder`` — either raise
``NotImplementedError`` (default strict mode) or use the deterministic
fake decoder for tests.  Everything Ray-side is real and tested: the
schema convention, actor-pool stage shape, batch sizing for wide binary
payloads, and the output layout.

Schema convention for a media column ``m``::

    m:            binary        (encoded payload)
    m_mime:       string        (e.g. "image/jpeg")
    m_width/m_height/m_frames/m_sample_rate: typed metadata columns

Wide-payload guidance (ray_guide "Memory-aware"): media batches must be
small — these stages default to ``batch_size=32`` so
batch × concurrency stays inside a worker's heap, and they should run
with ``DataContext.target_max_block_size`` raised so a block is not
split to absurdly few rows.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


def _strict_decoder(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject one with set_decoder() or use "
        "fake_decoder for deterministic tests"
    )


def fake_decoder(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: expands the payload bytes into a
    (h, w, 3) uint8 array seeded by the payload content.  Lets every
    downstream stage (resize, feature extract, frame sample) be tested
    for real."""
    h = 8 + (len(payload) % 8)
    w = 8 + (payload[0] % 8 if payload else 0)
    rng = np.random.default_rng(np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class MediaDecode:
    """Actor-pool stage: decode a binary media column to a fixed-size
    feature layout.  Decoder state is injected once per actor.

    Usage::

        ds.map_batches(MediaDecode, fn_constructor_kwargs={
                           "decoder": fake_decoder, "resize": (16, 16)},
                       batch_format="pyarrow", batch_size=32,
                       concurrency=8)
    """

    def __init__(
        self,
        media_col: str = "image",
        mime_col: str | None = None,
        decoder: Callable[[bytes, str], np.ndarray] | None = None,
        resize: tuple[int, int] | None = (16, 16),
        drop_payload: bool = True,
    ):
        self.media_col = media_col
        self.mime_col = mime_col
        self.decoder = decoder or _strict_decoder
        self.resize = resize
        self.drop_payload = drop_payload

    @staticmethod
    def _resize_nn(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
        """Nearest-neighbour resize — pure numpy, no codec libs."""
        h, w = hw
        yi = (np.arange(h) * img.shape[0] / h).astype(np.int64)
        xi = (np.arange(w) * img.shape[1] / w).astype(np.int64)
        return img[yi][:, xi]

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.media_col].to_pylist()
        mimes = (
            t[self.mime_col].to_pylist() if self.mime_col else [""] * len(payloads)
        )
        feats = np.empty((len(payloads), 6), dtype=np.float64)
        pixels: list[np.ndarray] = []
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            img = self.decoder(p or b"", m or "")
            if self.resize is not None:
                img = self._resize_nn(img, self.resize)
            f = img.astype(np.float64)
            feats[i] = [
                img.shape[0], img.shape[1], f.mean(), f.std(),
                float(f.min()), float(f.max()),
            ]
            pixels.append(img.ravel())
        pix = np.stack(pixels) if pixels else np.empty((0, 0))
        n, d = pix.shape if pix.ndim == 2 else (0, 0)
        t = t.append_column(
            "media_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), 6),
        )
        t = t.append_column(
            "pixels",
            pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * d),
                pa.array(pix.ravel().astype(np.uint8) if n else np.array([], dtype=np.uint8)),
            ),
        )
        if self.drop_payload:
            t = t.drop_columns([self.media_col])
        return t


class FrameSample:
    """Video-style stage: sample every k-th frame index from a frames
    metadata column (decode itself stubbed as above)."""

    def __init__(self, frames_col: str = "n_frames", every_k: int = 10):
        self.frames_col = frames_col
        self.k = every_k

    def __call__(self, t: pa.Table) -> pa.Table:
        n_frames = t[self.frames_col].to_numpy()
        idx_lists = [np.arange(0, int(n), self.k, dtype=np.int64) for n in n_frames]
        lens = np.array([len(x) for x in idx_lists], dtype=np.int64)
        values = np.concatenate(idx_lists) if idx_lists else np.array([], dtype=np.int64)
        t = t.append_column(
            "sampled_frames",
            pa.ListArray.from_arrays(pa.array(np.r_[0, np.cumsum(lens)]), pa.array(values)),
        )
        return t


def media_corpus(n_rows: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media table for tests/bench plumbing."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(16, 256)), dtype=np.uint8).tobytes()
                for _ in range(n_rows)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "image": pa.array(payloads, type=pa.binary()),
            "image_mime": pa.array(["image/fake"] * n_rows, type=pa.string()),
            "n_frames": pa.array(rng.integers(1, 300, n_rows).astype(np.int64)),
        }
    )
