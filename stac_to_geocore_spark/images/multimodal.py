"""Multimodal column operators: resize/thumbnail (real), audio decode +
features (real for WAV/PCM via stdlib `wave`), video frame sampling
(plumbing real, codec stubbed).

Modalities ride as opaque binary columns + typed metadata. The Spark-side
contract — schema, Arrow batch shape, partitioning, UDF signatures — is real
and tested for every modality. Uncompressed audio (WAV 8/16/24/32-bit PCM,
any channel count) decodes for REAL via stdlib `wave`; only compressed
audio and video byte decoders are deterministic stubs (this container has
no ffmpeg/soundfile — a cluster image plugs real decoders into the same
dispatch, mirroring images/codecs._DECODERS).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from stac_to_geocore_spark.images.codecs import decode_image, encode_image


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean resize (pure numpy, any aspect ratio).

    One summed-area table + a vectorized 4-corner lookup per output pixel —
    no per-pixel Python loop. Integer pixel sums are exact in float64, so
    the means are bit-identical to a naive per-block mean."""
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h / out_h).astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).astype(int)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)  # blocks are >= 1px
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    sat = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    sat[1:, 1:] = px.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    sums = (
        sat[y1[:, None], x1[None, :]] - sat[y0[:, None], x1[None, :]]
        - sat[y1[:, None], x0[None, :]] + sat[y0[:, None], x0[None, :]]
    )
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)[..., None]
    return np.clip(np.rint(sums / areas), 0, 255).astype(np.uint8)


THUMB_SCHEMA = "image_id string, thumb binary, thumb_w int, thumb_h int"


def thumbnails(images: DataFrame, size: int = 16, fmt: str = "png") -> DataFrame:
    """Decode -> block-mean resize -> re-encode; the standard image
    feature-extraction plumbing shape (mapInPandas over fat binary rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                th = block_mean_resize(px, size, size)
                rows.append((r.image_id, encode_image(th, fmt), size, size))
            yield pd.DataFrame(rows, columns=["image_id", "thumb", "thumb_w", "thumb_h"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, THUMB_SCHEMA)


# --- audio: real WAV/PCM decode (stdlib), pluggable registry for the rest ---

# fmt -> fn(bytes) -> (mono float32 PCM in [-1, 1], sample_rate). A cluster
# image with real codec libs registers compressed formats here ONCE at
# driver startup (register_audio_decoder("mp3", ...)); no module edits.
# The DataFrame builders below snapshot this dict into the UDF closure at
# plan-build time, so registered decoders ride cloudpickle to every
# executor — a worker's fresh module import never needs to replay the
# registration (tests/test_multimodal.py proves the contract end-to-end
# with a fake compressed format).
AUDIO_DECODERS: dict = {}


def register_audio_decoder(fmt: str, fn) -> None:
    """Plug a decoder fn(bytes) -> (float32 mono PCM, sample_rate) for a
    format the built-ins don't cover (mp3/flac/ogg on a cluster image)."""
    if fmt in ("wav", "fakepcm"):
        # dispatch checks the built-ins FIRST, so such a registration
        # would be silently dead — fail loudly instead
        raise ValueError(f"{fmt!r} is a built-in format and cannot be overridden")
    AUDIO_DECODERS[fmt] = fn


def decode_audio(data: bytes, fmt: str, decoders: dict | None = None
                 ) -> tuple[np.ndarray, int]:
    """bytes -> (mono float32 PCM in [-1, 1], sample_rate).

    'wav' is a REAL decoder: stdlib `wave` parses the RIFF container
    (PCM 8/16/24/32-bit, any channel count; channels averaged to mono) — no
    external codec libs needed. 'fakepcm' stays as the raw-int16 test
    payload (nominal 16 kHz). Other formats dispatch through the decoder
    registry (`decoders` snapshot if given, else the module-level
    AUDIO_DECODERS); unregistered compressed formats raise — those codecs
    are absent in this container, and a cluster image plugs its own in via
    register_audio_decoder, mirroring images/codecs._DECODERS."""
    import io

    if fmt == "wav":
        import wave

        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
        if sampwidth == 1:  # WAV 8-bit is UNSIGNED
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif sampwidth == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif sampwidth == 3:  # 24-bit packed: widen via zero-padded low byte
            b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            b4 = np.zeros((len(b3), 4), dtype=np.uint8)
            b4[:, 1:] = b3
            x = b4.view("<i4").ravel().astype(np.float32) / 2147483648.0
        elif sampwidth == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported WAV sample width {sampwidth}")
        if n_ch > 1:
            x = x.reshape(-1, n_ch).mean(axis=1)
        return x, rate
    if fmt == "fakepcm":
        return np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0, 16000
    fn = (decoders if decoders is not None else AUDIO_DECODERS).get(fmt)
    if fn is not None:
        return fn(data)
    raise NotImplementedError(
        f"audio format {fmt!r}: compressed-audio codec libs (soundfile/ffmpeg) "
        "are absent in this container; register one via "
        "register_audio_decoder on a cluster image"
    )


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, duration_ms long, "
    "rms double, peak double, zero_crossings long"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, bytes, fmt) -> per-clip features: sample rate, length,
    duration, loudness (rms/peak) and zero-crossing count — the standard
    audio-curation signals (silence/clipping/noise screens). Runs on REAL
    WAV bytes via decode_audio; mapInPandas over fat binary rows, numpy
    per batch (no per-row Python in the math)."""

    # snapshot the registry NOW (driver, plan-build time): the dict rides
    # the UDF closure to executors, where a fresh module import would see
    # an empty module-level registry
    decoders = dict(AUDIO_DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                pcm, rate = decode_audio(bytes(r.bytes), r.fmt, decoders)
                n = len(pcm)
                rms = float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0
                peak = float(np.abs(pcm).max()) if n else 0.0
                # sign CHANGES between consecutive samples (exact zeros count
                # as positive — signbit(0.0) is False — so the rule is total)
                zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if n > 1 else 0
                rows.append((
                    r.audio_id, rate, n, n * 1000 // rate if rate else 0,
                    round(rms, 6), round(peak, 6), zc,
                ))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "sample_rate", "n_samples", "duration_ms",
                "rms", "peak", "zero_crossings",
            ])

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# fmt -> fn(bytes) -> list of decoded HxWx3 uint8 frames (ALL frames; the
# sampling stride is applied by the dispatch). Same snapshot-into-closure
# contract as AUDIO_DECODERS.
VIDEO_DEMUXERS: dict = {}


def register_video_demuxer(fmt: str, fn) -> None:
    """Plug a demuxer/decoder fn(bytes) -> [frame ndarray, ...] for a video
    format the built-in toy codec doesn't cover (a cluster image's ffmpeg)."""
    if fmt == "fakemjpg":
        # dispatch checks the built-in FIRST, so such a registration
        # would be silently dead — fail loudly instead
        raise ValueError(f"{fmt!r} is a built-in format and cannot be overridden")
    VIDEO_DEMUXERS[fmt] = fn


def _decode_video_frames_stub(data: bytes, fmt: str, every_n: int,
                              demuxers: dict | None = None) -> list[np.ndarray]:
    """Codec dispatch: 'fakemjpg' = concatenated PNG frames with a 4-byte
    big-endian length prefix each — real container logic, toy codec; other
    formats go through the VIDEO_DEMUXERS registry; unregistered formats
    raise (no codec libs in this container)."""
    if fmt != "fakemjpg":
        fn = (demuxers if demuxers is not None else VIDEO_DEMUXERS).get(fmt)
        if fn is not None:
            return [f for i, f in enumerate(fn(data)) if i % every_n == 0]
        raise NotImplementedError(
            f"video format {fmt!r}: real codec libs are absent in this "
            "container; register one via register_video_demuxer on a "
            "cluster image"
        )
    frames, pos, i = [], 0, 0
    while pos + 4 <= len(data):
        n = int.from_bytes(data[pos : pos + 4], "big")
        frame = data[pos + 4 : pos + 4 + n]
        if i % every_n == 0:
            frames.append(decode_image(frame, "png"))
        pos += 4 + n
        i += 1
    return frames


FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, h int, w int, mean_lum double"


def sample_frames(video: DataFrame, every_n: int = 2) -> DataFrame:
    """(video_id, bytes, fmt) -> one row per sampled frame. This is the
    frame-sampling plumbing for video training data: a mapInPandas that
    EXPLODES rows (one in, many out), the shape real video pipelines need."""

    demuxers = dict(VIDEO_DEMUXERS)  # snapshot into the closure (see audio)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                for idx, frame in enumerate(_decode_video_frames_stub(bytes(r.bytes), r.fmt, every_n, demuxers)):
                    lum = float((frame.astype(np.float64) @ np.array([0.114, 0.587, 0.299])).mean())
                    rows.append((r.video_id, idx, frame.shape[0], frame.shape[1], round(lum, 4)))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "h", "w", "mean_lum"])

    return video.select("video_id", "bytes", "fmt").mapInPandas(run, FRAME_SAMPLE_SCHEMA)
