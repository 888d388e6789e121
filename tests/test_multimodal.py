"""Multimodal plumbing: thumbnails (real), audio features and video frame
sampling (real Spark plumbing, stub codecs), unknown formats raise the
clearly-marked NotImplementedError."""

from __future__ import annotations

import numpy as np
import pytest

from stac_to_geocore_spark.fixtures import images_df
from stac_to_geocore_spark.images.codecs import decode_image
from stac_to_geocore_spark.images.multimodal import (
    audio_features,
    block_mean_resize,
    decode_audio,
    sample_frames,
    thumbnails,
)


def test_thumbnails_roundtrip(spark):
    out = thumbnails(images_df(spark, 40, bytes_mode="full"), size=16).toPandas()
    assert len(out) == 40
    assert (out.thumb_w == 16).all() and (out.thumb_h == 16).all()
    th = decode_image(bytes(out.thumb.iloc[0]), "png")
    assert th.shape == (16, 16, 3)


def test_block_mean_resize_constant_image():
    px = np.full((50, 70, 3), 77, dtype=np.uint8)
    assert (block_mean_resize(px, 16, 16) == 77).all()


def test_audio_features_plumbing(spark):
    import pandas as pd

    pcm = (np.sin(np.linspace(0, 20, 4000)) * 20000).astype(np.int16)
    rows = [("a-0", pcm.tobytes(), "fakepcm"), ("a-1", np.zeros(100, np.int16).tobytes(), "fakepcm")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = {r.audio_id: r for r in audio_features(df).collect()}
    assert out["a-0"].n_samples == 4000 and out["a-0"].rms > 0.3
    assert out["a-1"].rms == 0.0


def test_audio_unknown_format_raises(spark):
    df = spark.createDataFrame([("a-0", b"xx", "mp3")], "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="codec libs.*absent|NotImplementedError"):
        audio_features(df).collect()


def test_video_frame_sampling(spark):
    from stac_to_geocore_spark.images.codecs import encode_image

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(6)]
    blob = b"".join(len(e).to_bytes(4, "big") + e for e in (encode_image(f, "png") for f in frames))
    df = spark.createDataFrame([("v-0", blob, "fakemjpg")], "video_id string, bytes binary, fmt string")
    out = sample_frames(df, every_n=2).toPandas().sort_values("frame_idx")
    assert len(out) == 3  # frames 0, 2, 4
    assert (out.h == 24).all() and (out.w == 32).all()


def test_audio_fakepcm_is_deterministic():
    data = np.arange(50, dtype=np.int16).tobytes()
    a, rate_a = decode_audio(data, "fakepcm")
    b, rate_b = decode_audio(data, "fakepcm")
    assert (a == b).all() and rate_a == rate_b == 16000


# --- real WAV decode (stdlib wave; round-4 upgrade) ---


def test_wav_decode_16bit_mono_roundtrip():
    from stac_to_geocore_spark.fixtures import _wav_bytes
    from stac_to_geocore_spark.images.multimodal import decode_audio

    x = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    pcm, rate = decode_audio(_wav_bytes(x, 8000, 2, 1), "wav")
    assert rate == 8000
    assert np.allclose(pcm, x.astype(np.float32) / 32768.0)


def test_wav_decode_stereo_averages_channels():
    from stac_to_geocore_spark.fixtures import _wav_bytes
    from stac_to_geocore_spark.images.multimodal import decode_audio

    x = np.array([1000, -1000, 500], dtype=np.int16)
    pcm, rate = decode_audio(_wav_bytes(x, 16000, 2, 2), "wav")
    assert rate == 16000 and len(pcm) == 3
    # fixture duplicates mono into both channels; the mean gives it back
    assert np.allclose(pcm, x.astype(np.float32) / 32768.0)


def test_wav_decode_8bit_unsigned():
    from stac_to_geocore_spark.fixtures import _wav_bytes
    from stac_to_geocore_spark.images.multimodal import decode_audio

    x = np.array([-32768, 0, 32512], dtype=np.int16)  # -> bytes 0, 128, 255
    pcm, _rate = decode_audio(_wav_bytes(x, 8000, 1, 1), "wav")
    assert np.allclose(pcm, [-1.0, 0.0, 127.0 / 128.0])


def test_audio_features_on_real_wav(spark):
    from stac_to_geocore_spark.fixtures import audio_df, gen_audio_pdf
    from stac_to_geocore_spark.images.multimodal import audio_features, decode_audio

    out = {r.audio_id: r for r in audio_features(audio_df(spark, 12, partitions=4)).collect()}
    assert len(out) == 12
    pdf = gen_audio_pdf(np.arange(12))
    for r in pdf.itertuples(index=False):
        pcm, rate = decode_audio(bytes(r.bytes), "wav")
        got = out[r.audio_id]
        assert got.sample_rate == rate and got.n_samples == len(pcm)
        assert got.duration_ms == len(pcm) * 1000 // rate
        # same float32 expression as audio_features -> bit-identical
        assert got.rms == round(float(np.sqrt(np.mean(pcm * pcm))), 6)
        assert got.peak == round(float(np.abs(pcm).max()), 6)
        # a sine tone crosses zero ~2*freq*duration times
        assert got.zero_crossings > 0


def test_audio_compressed_format_still_raises():
    from stac_to_geocore_spark.images.multimodal import decode_audio

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="codec libs.*absent"):
        decode_audio(b"\xff\xfb\x90", "mp3")


def test_registered_audio_decoder_runs_end_to_end(spark):
    """The pluggable-decoder contract: a third-party 'mp3' decoder drops
    into the dispatch via register_audio_decoder — NO module edits — and
    audio_features runs end-to-end through it on executors (the registry is
    snapshotted into the UDF closure, so a worker's fresh module import
    doesn't need the registration replayed)."""
    import pandas as pd

    from stac_to_geocore_spark.images.multimodal import (
        AUDIO_DECODERS,
        audio_features,
        register_audio_decoder,
    )

    def fake_mp3_decoder(data: bytes):
        # toy "compressed" layout: 4-byte rate then int16 little-endian PCM
        rate = int.from_bytes(data[:4], "big")
        return np.frombuffer(data[4:], dtype="<i2").astype(np.float32) / 32768.0, rate

    x = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype("<i2")
    blob = (22050).to_bytes(4, "big") + x.tobytes()
    register_audio_decoder("mp3", fake_mp3_decoder)
    try:
        df = spark.createDataFrame(
            pd.DataFrame({"audio_id": ["a0"], "bytes": [blob], "fmt": ["mp3"]}))
        row = audio_features(df).collect()[0]
        assert row.sample_rate == 22050 and row.n_samples == 4000
        assert row.duration_ms == 4000 * 1000 // 22050
        assert 0.4 < row.rms < 0.7 and row.zero_crossings > 10
    finally:
        AUDIO_DECODERS.pop("mp3", None)


def test_registered_video_demuxer_runs_end_to_end(spark):
    """Same contract for video: an 'mjpg' demuxer registered at the driver
    carries through sample_frames (stride applied by the dispatch)."""
    from stac_to_geocore_spark.images.codecs import encode_image
    from stac_to_geocore_spark.images.multimodal import (
        VIDEO_DEMUXERS,
        register_video_demuxer,
        sample_frames,
    )

    def fake_mjpg_demuxer(data: bytes):
        out, pos = [], 0
        while pos + 4 <= len(data):
            n = int.from_bytes(data[pos:pos + 4], "big")
            out.append(decode_image(data[pos + 4:pos + 4 + n], "png"))
            pos += 4 + n
        return out

    frames = [np.full((6, 8, 3), 40 * (i + 1), np.uint8) for i in range(5)]
    blob = b"".join(
        len(p).to_bytes(4, "big") + p
        for p in (encode_image(f, "png") for f in frames)
    )
    register_video_demuxer("mjpg", fake_mjpg_demuxer)
    try:
        df = spark.createDataFrame(
            [("v0", blob, "mjpg")], "video_id string, bytes binary, fmt string")
        rows = sample_frames(df, every_n=2).orderBy("frame_idx").collect()
        assert [r.frame_idx for r in rows] == [0, 1, 2]  # frames 0, 2, 4
        assert rows[0].h == 6 and rows[0].w == 8
        assert abs(rows[1].mean_lum - 120.0) < 0.01  # frame 2 is constant 120
    finally:
        VIDEO_DEMUXERS.pop("mjpg", None)


def test_register_rejects_builtin_format_names():
    """A registration shadowing a built-in would be silently dead (dispatch
    checks built-ins first) — both registries must fail loudly instead."""
    import pytest as _pytest

    from stac_to_geocore_spark.images.multimodal import (
        register_audio_decoder,
        register_video_demuxer,
    )

    for fmt in ("wav", "fakepcm"):
        with _pytest.raises(ValueError, match="built-in"):
            register_audio_decoder(fmt, lambda b: None)
    with _pytest.raises(ValueError, match="built-in"):
        register_video_demuxer("fakemjpg", lambda b: [])
