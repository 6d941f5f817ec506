"""Multimodal binary columns: images / video / audio as opaque BINARY plus
typed metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas transforms.

The Spark-side plumbing (schemas, batch shapes, UDF signatures,
partitioning) is real and tested; the actual pixel/frame decoders are
STUBBED -- this environment ships no image/video codec libraries, so
unsupported codecs raise NotImplementedError and the test codec
('raw_gray8' / 'raw_frames_gray8') is a deterministic byte layout that
exercises the full path end-to-end. Audio (WAV) is fully real in
functions/audio.py.

Schemas:
  images(image_id string, bytes binary, width int, height int, codec string)
  videos(video_id string, bytes binary, width int, height int, n_frames int,
         fps double, codec string)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_SCHEMA = "image_id string, bytes binary, width int, height int, codec string"
VIDEO_SCHEMA = (
    "video_id string, bytes binary, width int, height int, n_frames int, "
    "fps double, codec string"
)

RAW_GRAY8 = "raw_gray8"          # width*height bytes, row-major, 8-bit gray
RAW_FRAMES_GRAY8 = "raw_frames_gray8"  # n_frames consecutive raw_gray8 planes


def decode_image(raw: bytes, width: int, height: int, codec: str) -> np.ndarray:
    if codec == RAW_GRAY8:
        arr = np.frombuffer(raw, dtype=np.uint8)
        if arr.size != width * height:
            raise ValueError(f"raw_gray8 size mismatch: {arr.size} != {width}x{height}")
        return arr.reshape(height, width)
    # STUB: jpeg/png/webp decoders plug in here (PIL/libvips on a real
    # cluster); this sandbox has no image codec libraries.
    raise NotImplementedError(f"image codec {codec!r}: only {RAW_GRAY8} here")


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize, numpy-only (deterministic)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def image_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """grid x grid mean-intensity patch features in [0,1]."""
    small = resize_nn(img.astype(np.float64) / 255.0, grid, grid)
    return small.reshape(-1)


def frame_sample_indexes(n_frames: int, k: int) -> np.ndarray:
    """k deterministic evenly-spaced frame indexes."""
    k = min(k, n_frames)
    return (np.arange(k) * n_frames // k).astype(np.int64)


def decode_video_frames(
    raw: bytes, width: int, height: int, n_frames: int, codec: str
) -> np.ndarray:
    if codec == RAW_FRAMES_GRAY8:
        arr = np.frombuffer(raw, dtype=np.uint8)
        if arr.size != width * height * n_frames:
            raise ValueError("raw_frames_gray8 size mismatch")
        return arr.reshape(n_frames, height, width)
    # STUB: ffmpeg-backed demux/decoding plugs in here on a real cluster.
    raise NotImplementedError(f"video codec {codec!r}: only {RAW_FRAMES_GRAY8} here")


def image_feature_frame(
    df: DataFrame, grid: int = 4, out_col: str = "features"
) -> DataFrame:
    """images -> (image_id, features array<double>) via mapInPandas (one
    Arrow batch per partition slice; pixels never leave the worker)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                image_features(
                    decode_image(r["bytes"], r["width"], r["height"], r["codec"]),
                    grid,
                ).tolist()
                for _, r in pdf.iterrows()
            ]
            yield pd.DataFrame({"image_id": pdf["image_id"], out_col: feats})

    return df.mapInPandas(gen, schema=f"image_id string, {out_col} array<double>")


def video_frame_features(
    df: DataFrame, k_frames: int = 4, grid: int = 4
) -> DataFrame:
    """videos -> one row per sampled frame with patch features:
    (video_id, frame_index, features). Frame sampling is deterministic."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, feats = [], [], []
            for _, r in pdf.iterrows():
                frames = decode_video_frames(
                    r["bytes"], r["width"], r["height"], r["n_frames"], r["codec"]
                )
                for i in frame_sample_indexes(r["n_frames"], k_frames):
                    ids.append(r["video_id"])
                    fidx.append(int(i))
                    feats.append(image_features(frames[i], grid).tolist())
            yield pd.DataFrame(
                {"video_id": ids, "frame_index": fidx, "features": feats}
            )

    return df.mapInPandas(
        gen, schema="video_id string, frame_index long, features array<double>"
    )
