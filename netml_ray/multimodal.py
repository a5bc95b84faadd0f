"""Multimodal column stages: image / audio / video as opaque ``binary``
columns with typed metadata.

Decoding is REAL for the uncompressed public formats — binary PPM
(Netpbm P6), 24-bit BMP, uncompressed true-color TGA, and RIFF/WAVE
PCM-16 — implemented in pure
numpy/struct (``decode_ppm`` / ``decode_bmp`` / ``decode_wav``, with
matching encoders for deterministic test corpora).  Compressed codecs
(jpeg/png/mp3/h264) genuinely need libraries absent from this
container and raise ``NotImplementedError`` (clearly marked); inject a
decoder via the ``decoder=`` constructor arg when those libs exist.
Everything Ray-side — schema convention, actor-pool stage shape, batch
sizing for wide binary payloads, output layout — is real and tested.

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


# ---------------------------------------------------------------------------
# real decoders for the uncompressed public formats (pure numpy/struct;
# specs: Netpbm PPM P6, Windows BITMAPINFOHEADER BMP, RIFF/WAVE PCM) —
# compressed codecs (jpeg/png/mp3/h264) genuinely need libraries absent
# from this container and still raise NotImplementedError.
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Handles comment lines and
    arbitrary whitespace in the header per the Netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval tokens (comments start '#')
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, 4-byte row padding)."""
    import struct

    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up + BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM → RIFF/WAVE."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 mono/stereo → (sample_rate, (n, ch) int16).
    Walks the chunk list per the RIFF spec (fmt may not be first)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    rate = None
    n_ch = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return rate, arr.reshape(-1, n_ch).copy()


def encode_tga(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed true-color TGA (type 2,
    24 bpp, bottom-up BGR — the spec's default origin)."""
    import struct

    h, w, _ = img.shape
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0,
                         w, h, 24, 0)
    return header + img[::-1, :, ::-1].astype(np.uint8).tobytes()


def decode_tga(payload: bytes) -> np.ndarray:
    """Uncompressed true-color TGA (type 2, 24 bpp) → (h, w, 3) uint8
    RGB.  Honors the descriptor's top-origin bit (bit 5)."""
    import struct

    (idlen, cmap_type, img_type, _c1, _c2, _c3, _x0, _y0,
     w, h, bpp, desc) = struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    if img_type != 2 or cmap_type != 0 or bpp != 24:
        raise ValueError(
            f"unsupported TGA (type={img_type}, cmap={cmap_type}, bpp={bpp})")
    off = 18 + idlen
    bgr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                        offset=off).reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    top_origin = bool(desc & 0x20)
    return (rgb if top_origin else rgb[::-1]).copy()


def _looks_like_tga(payload: bytes) -> bool:
    """TGA has no magic; accept the exact shape we emit/decode
    (no colormap, type 2, 24 bpp)."""
    return (len(payload) > 18 and payload[1] == 0 and payload[2] == 2
            and payload[16] == 24)


def builtin_decoder(payload: bytes, mime: str) -> np.ndarray:
    """Magic-byte dispatch over the formats decodable WITHOUT codec
    libraries; anything else (jpeg/png/...) raises — honestly — via
    the strict stub."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if mime in ("image/x-tga", "image/tga") or (
            mime.startswith("image/") and _looks_like_tga(payload)):
        return decode_tga(payload)
    return _strict_decoder(payload, mime)


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
                       concurrency=partition.auto_concurrency())
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
        self.decoder = decoder or builtin_decoder
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


class AudioDecode:
    """Actor-pool stage: RIFF/WAVE PCM binary column → per-row audio
    features ``[sample_rate, n_samples, duration_s, rms, peak, zcr]``
    (FixedSizeList of 6) — decode is the REAL pure-numpy WAV parser
    above, so no codec library is needed for PCM audio."""

    def __init__(self, media_col: str = "audio", drop_payload: bool = True):
        self.media_col = media_col
        self.drop_payload = drop_payload

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.media_col].to_pylist()
        feats = np.empty((len(payloads), 6), dtype=np.float64)
        for i, p in enumerate(payloads):
            rate, x = decode_wav(p)
            mono = x.astype(np.float64).mean(axis=1)
            n = len(mono)
            rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
            peak = float(np.abs(mono).max()) if n else 0.0
            zc = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
            feats[i] = [rate, n, n / rate if rate else 0.0, rms, peak, zc]
        t = t.append_column(
            "audio_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), 6),
        )
        if self.drop_payload:
            t = t.drop_columns([self.media_col])
        return t


class SpectralFeatures:
    """Actor-pool stage: WAV PCM binary column → spectral features
    ``[dominant_hz, centroid_hz, bandwidth_hz, rolloff85_hz]`` (one
    rFFT per row over the mono signal, DC excluded) — the multimodal
    analog of the session FFT extractor (reference parser.py FFT
    feature, W6): dominant = argmax-magnitude bin, centroid =
    magnitude-weighted mean frequency, bandwidth = magnitude-weighted
    std around the centroid, rolloff85 = frequency below which 85% of
    spectral energy lies."""

    def __init__(self, media_col: str = "audio",
                 drop_payload: bool = True):
        self.media_col = media_col
        self.drop_payload = drop_payload

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.media_col].to_pylist()
        feats = np.zeros((len(payloads), 4), dtype=np.float64)
        for i, p in enumerate(payloads):
            rate, x = decode_wav(p)
            mono = x.astype(np.float64).mean(axis=1)
            n = len(mono)
            if n < 2 or not rate:
                continue
            mag = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(n, d=1.0 / rate)
            mag[0] = 0.0  # drop DC
            tot = mag.sum()
            if tot <= 0:
                continue
            dom = float(freqs[int(np.argmax(mag))])
            cent = float((freqs * mag).sum() / tot)
            bw = float(np.sqrt(((freqs - cent) ** 2 * mag).sum() / tot))
            energy = mag ** 2
            cums = np.cumsum(energy)
            roll = float(freqs[int(np.searchsorted(
                cums, 0.85 * cums[-1]))])
            feats[i] = [dom, cent, bw, roll]
        t = t.append_column(
            "spectral_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), 4),
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


def media_corpus(n_rows: int, seed: int = 3, real: bool = False) -> pa.Table:
    """Deterministic media table for tests/bench plumbing.  With
    ``real=True`` the payloads are genuine PPM/BMP images (alternating),
    decodable by ``builtin_decoder`` without any codec library."""
    rng = np.random.default_rng(seed)
    payloads = []
    mimes = []
    for i in range(n_rows):
        if real:
            h = int(rng.integers(4, 24))
            w = int(rng.integers(4, 24))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 2 == 0:
                payloads.append(encode_ppm(img))
                mimes.append("image/x-portable-pixmap")
            else:
                payloads.append(encode_bmp(img))
                mimes.append("image/bmp")
        else:
            payloads.append(rng.integers(0, 256, size=int(rng.integers(16, 256)),
                                         dtype=np.uint8).tobytes())
            mimes.append("image/fake")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "image": pa.array(payloads, type=pa.binary()),
            "image_mime": pa.array(mimes, type=pa.string()),
            "n_frames": pa.array(rng.integers(1, 300, n_rows).astype(np.int64)),
        }
    )


def audio_corpus(n_rows: int, seed: int = 4) -> pa.Table:
    """Deterministic WAV (PCM-16) table — real RIFF payloads."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n_rows):
        rate = int(rng.choice([8000, 16000]))
        n = int(rng.integers(100, 2000))
        freq = float(rng.uniform(50, 2000))
        ts = np.arange(n) / rate
        x = (10000 * np.sin(2 * np.pi * freq * ts)).astype(np.int16)
        payloads.append(encode_wav(x, rate))
    return pa.table({
        "audio_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "audio": pa.array(payloads, type=pa.binary()),
    })


class ImageDHash:
    """Actor-pool stage: perceptual difference-hash (dHash, the
    classic 64-bit gradient fingerprint — Krawetz 2013, public
    technique) of a binary image column: decode → grayscale → 9×8
    nearest-neighbour resize → horizontal-gradient bits.  Two images
    within a few bits of hamming distance are near-duplicates even
    across re-encodes / mild noise — the multimodal analog of text
    SimHash, and the standard web-scale image-dedup key.

    Emits ``dhash`` as int64 (the uint64 bit-view, same convention as
    SimHash) so the output Dataset feeds straight into
    ``dedup.hamming_near_duplicates(sig_ds, hash_col="dhash")`` — one
    banded exchange, no pairwise image comparison anywhere.

    Decoder injection works like :class:`MediaDecode`: the real
    PPM/BMP/TGA/WAV codecs work out of the box; compressed codecs
    (jpeg/png) raise unless a decoder is injected."""

    def __init__(
        self,
        media_col: str = "image",
        mime_col: str | None = None,
        decoder: Callable[[bytes, str], np.ndarray] | None = None,
        drop_payload: bool = True,
    ):
        self.media_col = media_col
        self.mime_col = mime_col
        self.decoder = decoder or builtin_decoder
        self.drop_payload = drop_payload

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.media_col].to_pylist()
        mimes = (
            t[self.mime_col].to_pylist() if self.mime_col
            else [""] * len(payloads)
        )
        out = np.empty(len(payloads), dtype=np.uint64)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            img = self.decoder(p or b"", m or "")
            f = img.astype(np.float64)
            if f.ndim == 3:                      # RGB -> luma
                f = (0.299 * f[..., 0] + 0.587 * f[..., 1]
                     + 0.114 * f[..., 2])
            g = MediaDecode._resize_nn(f, (8, 9))
            bits = (g[:, 1:] > g[:, :-1]).ravel()  # 8x8 gradient
            out[i] = np.dot(bits.astype(np.uint64), weights)
        t = t.append_column("dhash", pa.array(out.view(np.int64)))
        if self.drop_payload:
            t = t.drop_columns([self.media_col])
        return t
