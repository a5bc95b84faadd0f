"""Salted (skew-aware) sessionization equivalence + multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from netml_ray.multimodal import FrameSample, MediaDecode, fake_decoder, media_corpus
from netml_ray.salted import sessionize_salted
from netml_ray.sessionize import SESSION, TS_SEC, sessionize_netml, sessionize_simple
from tests.test_kernels import make_keyed_data


def _mk_ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _sessions_set(df, key="url"):
    return sorted(
        (k, s, tuple(g[TS_SEC])) for (k, s), g in
        df.sort_values([key, TS_SEC]).groupby([key, SESSION])
    )


@pytest.fixture(scope="module")
def skewed_df():
    df = make_keyed_data(seed=31, n_keys=20, max_rows=40)
    # plant a hot key with many rows spanning many chunks
    rng = np.random.default_rng(5)
    n_hot = 2500
    t = 0.0
    rows = []
    for i in range(n_hot):
        rows.append(("hotkey", t, float(rng.integers(1, 500))))
        t += float(rng.choice([0.0, 30.0, 120.0, 650.0, 2000.0], p=[0.05, 0.5, 0.3, 0.1, 0.05]))
    hot = pd.DataFrame(rows, columns=["key", "ts", "size"])
    df = pd.concat([df, hot], ignore_index=True)
    df = df.rename(columns={"key": "url", "ts": "tsv"})
    df["rid"] = np.arange(len(df))
    return df


@pytest.mark.parametrize("netml", [False, True])
def test_salted_equals_unsalted(skewed_df, ray_session, netml):
    ds = _mk_ds(skewed_df[["url", "tsv", "size", "rid"]])
    salted = sessionize_salted(
        ds, key="url", ts_col="tsv", gap=600.0, netml=netml, min_rows=2,
        hot_threshold=500, chunk=5000.0, tiebreak="rid", num_partitions=8,
    ).to_pandas()
    ds2 = _mk_ds(skewed_df[["url", "tsv", "size", "rid"]])
    if netml:
        ref = sessionize_netml(ds2, key="url", ts_col="tsv", gap=600.0,
                               min_rows=2, tiebreak="rid", num_partitions=8).to_pandas()
    else:
        ref = sessionize_simple(ds2, key="url", ts_col="tsv", gap=600.0,
                                tiebreak="rid", num_partitions=8).to_pandas()
    assert len(salted) == len(ref)
    assert _sessions_set(salted) == _sessions_set(ref)
    # the hot key actually went through the salted path in >1 chunk
    hot_sessions = salted[salted["url"] == "hotkey"]
    assert len(hot_sessions) > 0


def test_salted_no_hot_keys_passthrough(ray_session):
    df = make_keyed_data(seed=2, n_keys=8).rename(columns={"key": "url", "ts": "tsv"})
    df["rid"] = np.arange(len(df))
    ds = _mk_ds(df[["url", "tsv", "size", "rid"]])
    out = sessionize_salted(ds, key="url", ts_col="tsv", gap=600.0,
                            hot_threshold=10**9, tiebreak="rid", num_partitions=4).to_pandas()
    assert len(out) == len(df)


def test_media_decode_plumbing(ray_session):
    import ray.data as rd

    t = media_corpus(100)
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs={"decoder": fake_decoder, "resize": (8, 8)},
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).map_batches(FrameSample, batch_format="pyarrow", concurrency=2)
    df = out.to_pandas()
    assert len(df) == 100
    assert "image" not in df.columns  # payload dropped after decode
    assert all(len(f) == 6 for f in df["media_features"])
    assert all(len(p) == 8 * 8 * 3 for p in df["pixels"])
    # deterministic across runs
    df2 = rd.from_arrow(t).map_batches(
        MediaDecode,
        fn_constructor_kwargs={"decoder": fake_decoder, "resize": (8, 8)},
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).to_pandas()
    a = np.stack(df.sort_values("media_id")["media_features"].to_numpy())
    b = np.stack(df2.sort_values("media_id")["media_features"].to_numpy())
    np.testing.assert_array_equal(a, b)
    # frame sampling
    assert (df["sampled_frames"].map(len) == np.ceil(df["n_frames"] / 10)).all()


def test_media_strict_mode_raises():
    md = MediaDecode()
    with pytest.raises(NotImplementedError):
        md(media_corpus(2))


def test_real_codec_roundtrips():
    """Pure-numpy PPM/BMP/WAV codecs: encode→decode is identity."""
    from netml_ray.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (5, 7), (16, 3), (11, 11)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
    # PPM with a comment line in the header
    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    p = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(p), img)
    for rate in (8000, 44100):
        x = rng.integers(-30000, 30000, size=777).astype(np.int16)
        r2, y = decode_wav(encode_wav(x, rate))
        assert r2 == rate
        np.testing.assert_array_equal(y[:, 0], x)


def test_media_decode_real_formats(ray_session):
    """builtin_decoder handles real PPM/BMP payloads end-to-end through
    the actor-pool stage — decode is no longer a stub."""
    import ray.data as rd

    from netml_ray.multimodal import decode_bmp, decode_ppm

    t = media_corpus(60, real=True)
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        MediaDecode, fn_constructor_kwargs={"resize": (8, 8)},
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 60
    # spot-check feature parity vs direct decode (+ the stage's resize)
    raw = t["image"].to_pylist()
    for i in (0, 1, 17):
        img = decode_ppm(raw[i]) if raw[i][:2] == b"P6" else decode_bmp(raw[i])
        img = MediaDecode._resize_nn(img, (8, 8))
        f = out.loc[i, "media_features"]
        assert f[0] == img.shape[0] and f[1] == img.shape[1]
        np.testing.assert_allclose(f[2], img.astype(np.float64).mean())
        np.testing.assert_array_equal(
            np.asarray(out.loc[i, "pixels"], dtype=np.uint8), img.ravel())


def test_audio_decode_stage(ray_session):
    import ray.data as rd

    from netml_ray.multimodal import AudioDecode, audio_corpus, decode_wav

    t = audio_corpus(40)
    out = rd.from_arrow(t).map_batches(
        AudioDecode, batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas().sort_values("audio_id").reset_index(drop=True)
    assert len(out) == 40 and "audio" not in out.columns
    raw = t["audio"].to_pylist()
    for i in (0, 13, 39):
        rate, x = decode_wav(raw[i])
        f = out.loc[i, "audio_features"]
        assert f[0] == rate and f[1] == len(x)
        np.testing.assert_allclose(
            f[3], np.sqrt((x[:, 0].astype(np.float64) ** 2).mean()), rtol=1e-12)


def test_media_unsupported_codec_raises():
    from netml_ray.multimodal import builtin_decoder

    with pytest.raises(NotImplementedError):
        builtin_decoder(b"\x89PNG\r\n\x1a\n....", "image/png")


def test_hot_keys_sampled_matches_exact(ray_session):
    """Sampled hot-key detection finds exactly the planted hot url on
    the test corpus (and the exact fallback engages for tiny
    thresholds)."""
    import ray.data as rd

    from netml_ray.corpus import corpus_path
    from netml_ray.pipeline import extract_narrow
    from netml_ray.salted import hot_keys, hot_keys_sampled

    cp = corpus_path(4000, seed=7, cache_dir="/tmp/netml_ray_test_corpus")
    narrow = extract_narrow(cp)
    exact = hot_keys(narrow, "url", 300)
    sampled = hot_keys_sampled(narrow, "url", 300)
    assert exact == {"https://example.com/page/0"}
    # the truly hot key is never missed; the 2x margin may add warm
    # keys, but on this corpus the next-largest key is ~40 rows
    assert sampled == exact
    # threshold <= oversample → exact fallback
    assert hot_keys_sampled(narrow, "url", 40) == hot_keys(narrow, "url", 40)


def test_tga_roundtrip_and_stage(ray_session):
    """Real TGA codec: byte-exact roundtrip (both origins) and the
    decode stage end-to-end on TGA payloads."""
    import ray.data as rd

    from netml_ray.multimodal import (MediaDecode, builtin_decoder,
                                      decode_tga, encode_tga)

    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(9, 13), (32, 32), (1, 1)]]
    for img in imgs:
        b = encode_tga(img)
        assert np.array_equal(decode_tga(b), img)
        assert np.array_equal(builtin_decoder(b, "image/x-tga"), img)
    t = pa.table({
        "media_id": pa.array(range(len(imgs)), type=pa.int64()),
        "payload": pa.array([encode_tga(i) for i in imgs],
                            type=pa.binary()),
        "mime": pa.array(["image/x-tga"] * len(imgs)),
        "width": pa.array([i.shape[1] for i in imgs], type=pa.int64()),
        "height": pa.array([i.shape[0] for i in imgs], type=pa.int64()),
    })
    out = rd.from_arrow(t).map_batches(
        MediaDecode, fn_constructor_kwargs={
            "media_col": "payload", "mime_col": "mime",
            "decoder": builtin_decoder, "resize": (8, 8)},
        batch_format="pyarrow", concurrency=1, batch_size=2,
    ).to_pandas()
    assert len(out) == len(imgs)
    assert all(len(px) == 8 * 8 * 3 for px in out["pixels"])
    assert "payload" not in out.columns


def test_image_dhash_invariances(ray_session):
    import numpy as np

    from netml_ray.multimodal import ImageDHash, encode_ppm

    rng = np.random.default_rng(71)
    # smooth gradient image so dHash is noise-stable
    # strong HORIZONTAL gradient (dHash compares adjacent columns),
    # so +/-4 pixel noise cannot flip the ~25-level column steps
    base = np.clip(
        np.add.outer(np.linspace(0, 55, 64), np.linspace(0, 200, 64))
        + rng.normal(0, 3, (64, 64)), 0, 255).astype(np.uint8)
    img = np.stack([base] * 3, axis=-1)
    noisy = np.clip(img.astype(np.int64)
                    + rng.integers(-4, 5, img.shape), 0, 255) \
        .astype(np.uint8)
    other = rng.integers(0, 256, img.shape, dtype=np.uint8)

    stage = ImageDHash()
    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3]),
        "image": pa.array([encode_ppm(img), encode_ppm(img),
                           encode_ppm(noisy), encode_ppm(other)],
                          type=pa.binary()),
    })
    out = stage(t).to_pandas().set_index("media_id")

    def ham(a, b):
        return bin(int(a) ^ int(b) & ((1 << 64) - 1)).count("1")

    h = out["dhash"].astype("uint64")
    assert h[0] == h[1]                       # identical -> equal
    assert ham(h[0], h[2]) <= 8               # mild noise -> near
    assert ham(h[0], h[3]) > 16               # unrelated -> far


def test_image_near_dup_pipeline(ray_session):
    """Planted near-duplicate images found through the generic banded
    hamming exchange — no pairwise image comparison anywhere."""
    import numpy as np
    import ray.data as rd

    from netml_ray.dedup import hamming_near_duplicates
    from netml_ray.multimodal import ImageDHash, encode_ppm, media_corpus

    rng = np.random.default_rng(73)
    t = media_corpus(40, seed=5, real=True)
    # plant: rows 100/101 share a smooth image up to mild noise
    base = np.clip(
        np.add.outer(np.linspace(0, 15, 32), np.linspace(10, 240, 32))
        + rng.normal(0, 2, (32, 32)), 0, 255).astype(np.uint8)
    img = np.stack([base] * 3, axis=-1)
    noisy = np.clip(img.astype(np.int64)
                    + rng.integers(-3, 4, img.shape), 0, 255) \
        .astype(np.uint8)
    extra = pa.table({
        "media_id": pa.array([100, 101], type=pa.int64()),
        "image": pa.array([encode_ppm(img), encode_ppm(noisy)],
                          type=pa.binary()),
        "image_mime": pa.array(["image/x-portable-pixmap"] * 2),
    })
    full = pa.concat_tables([t.select(extra.column_names), extra])

    sig = rd.from_arrow(full).repartition(4).map_batches(
        ImageDHash, batch_format="pyarrow", batch_size=16,
        concurrency=2)
    pairs = hamming_near_duplicates(
        sig, id_col="media_id", hash_col="dhash",
        max_hamming=8).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 101) in found


def test_registry_multimodal_queries(ray_session):
    """The rows-only registry entries: dHash finds exactly the 40
    planted re-encodes; spectral dominant_hz tracks the synth tone."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    q = m.queries()
    pairs = q["media_dhash_pairs"]("/root/testdata/sf0.001").to_pandas()
    assert len(pairs) == 40
    assert ((pairs["id_b"] - pairs["id_a"]) == 1000).all()
    assert (pairs["hamming"] == 0).all()

    spec = q["audio_spectral_features"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(spec) == 300
    assert (spec["sample_rate"].isin([8000.0, 16000.0])).all()
    assert (spec["dominant_hz"] >= 0).all()
    assert (spec["rolloff85_hz"] <= spec["sample_rate"] / 2).all()
