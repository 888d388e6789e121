"""Multimodal (image) column operators: decode, feature-extract, verify.

Images ride as opaque binary columns with typed metadata (input_hint schema:
image_id, bytes, w, h, fmt, caption, phash). All pixel work happens inside
mapInPandas over Arrow batches — the batch shape, schema, and partitioning
are the real engine surface; the codecs themselves are the pure-numpy
minimal set (images/codecs.py) since this container has no PIL/opencv
(real formats plug into the same _DECODERS registry on a cluster).

`verify_images` implements the BASELINE.json per-row invariant: decoded
pixels allclose (exact for lossless, PSNR >= 40 dB for lossy) + caption
equality between two tables.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from stac_to_geocore_spark.images.codecs import LOSSLESS_FMTS, decode_image, phash64, psnr

DECODE_STATS_SCHEMA = (
    "image_id string, fmt string, h int, w int, mean_r double, mean_g double, "
    "mean_b double, phash_ok boolean"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image, emit per-channel means + phash re-verification.
    Arrow batch sizes stay small for fat binary rows (session.py caps
    maxRecordsPerBatch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                means = px.reshape(-1, 3).mean(axis=0)
                phash_ok = bool(r.phash is None or np.isnan(r.phash)) or (
                    int(r.phash) == phash64(px) if r.fmt in LOSSLESS_FMTS else True
                )
                rows.append(
                    (r.image_id, r.fmt, px.shape[0], px.shape[1],
                     round(float(means[2]), 4), round(float(means[1]), 4),
                     round(float(means[0]), 4), phash_ok)
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "h", "w", "mean_r", "mean_g", "mean_b", "phash_ok"]
            )

    return images.mapInPandas(run, DECODE_STATS_SCHEMA)


VERIFY_SCHEMA = "image_id string, pixels_ok boolean, psnr double, caption_ok boolean"


def verify_images(left: DataFrame, right: DataFrame, psnr_bar: float = 40.0) -> DataFrame:
    """Per-row invariant check between two image tables joined on image_id:
    lossless fmt -> exact pixel equality; lossy -> PSNR >= psnr_bar;
    captions must be equal (BASELINE.json input_hint)."""
    l = left.select("image_id", "bytes", "fmt", "caption")
    r = right.select(
        right["image_id"].alias("image_id"),
        right["bytes"].alias("bytes_r"),
        right["fmt"].alias("fmt_r"),
        right["caption"].alias("caption_r"),
    )
    joined = l.join(r, "image_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for row in b.itertuples(index=False):
                a = decode_image(bytes(row.bytes), row.fmt)
                bb = decode_image(bytes(row.bytes_r), row.fmt_r)
                if a.shape != bb.shape:
                    ok, p = False, 0.0
                elif row.fmt in LOSSLESS_FMTS and row.fmt_r in LOSSLESS_FMTS:
                    ok, p = bool((a == bb).all()), float("inf")
                else:
                    p = psnr(a, bb)
                    ok = p >= psnr_bar
                rows.append((row.image_id, ok, round(min(p, 999.0), 3), row.caption == row.caption_r))
            yield pd.DataFrame(rows, columns=["image_id", "pixels_ok", "psnr", "caption_ok"])

    return joined.mapInPandas(run, VERIFY_SCHEMA)
