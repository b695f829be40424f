"""Multimodal column plumbing: opaque binary payloads (image / audio /
video) with typed metadata, processed in Arrow-batched ``mapInPandas``
stages. The *Spark-side* shape — schemas, batch iteration, partition
preservation, deterministic outputs — is fully real and tested; the
codec layer is real for PNG (crawler_spark.core.imaging) and STUBBED
behind deterministic fakes where this container lacks the media libs
(jpeg/webp via the tagged fake-lossy container; audio/video decode
raise NotImplementedError unless the deterministic-fake flag is set).

Reference surface: screenshot bytes handling
(/root/reference/lib/recorder/browser-session.ts:2531-2654: clip
rects, devicePixelRatio scaling) and JPEG q70 stream frames
(/root/reference/app/api/browser-stream/route.ts:33-37) — the
resize / recompress / frame-sample stages below are their
batch-engine analogs."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

from ..core.imaging import decode_image, png_encode
from ..core.imaging import avgpool_resize as _avgpool_resize


def thumbnail(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """(image_id, bytes, fmt) → deterministic PNG thumbnails + mean
    luma, via box-resize in Arrow batches (the resize stage of the
    screenshot pipeline, made distributed)."""
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("thumb_png", BinaryType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, thumbs, lumas = [], [], []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                tp = _avgpool_resize(px, out_h, out_w)
                gray = tp.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                ids.append(iid)
                thumbs.append(png_encode(tp))
                lumas.append(round(float(gray.mean()), 4))
            yield pd.DataFrame({
                "image_id": ids, "thumb_png": thumbs,
                "thumb_w": out_w, "thumb_h": out_h, "mean_luma": lumas})

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)


# deterministic-fake gate for codecs absent in this container
_FAKE_MEDIA = True  # real libs absent; see module docstring


def audio_features(audio: DataFrame, payload_col: str = "bytes") -> DataFrame:
    """STUB audio feature extraction: the real decode (libsndfile /
    ffmpeg) is unavailable here. With the deterministic fake, the
    'waveform' is the byte string interpreted as int8 samples — the
    Spark plumbing (schema, batches, aggregation) is identical to the
    real thing. Raises NotImplementedError when fakes are disabled."""
    if not _FAKE_MEDIA:
        raise NotImplementedError("real audio codecs not available")
    schema = StructType([
        StructField("sample_id", StringType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for sid, data in zip(pdf["sample_id"], pdf[payload_col]):
                wav = np.frombuffer(bytes(data), np.int8).astype(np.float64)
                rows.append((sid, len(wav),
                             round(float(np.sqrt((wav ** 2).mean())), 4)
                             if len(wav) else 0.0,
                             float(np.abs(wav).max()) if len(wav) else 0.0))
            yield pd.DataFrame(rows, columns=["sample_id", "n_samples",
                                              "rms", "peak"])

    return audio.mapInPandas(run, schema)


def frame_sample(video: DataFrame, every_n: int = 10,
                 payload_col: str = "bytes") -> DataFrame:
    """STUB video frame sampling: treats the payload as a
    concatenation of fixed-size fake 'frames' (64 bytes each) and
    emits every n-th — the real ffmpeg demux would slot into the same
    mapInPandas one-to-many shape (one input row → many frame rows)."""
    if not _FAKE_MEDIA:
        raise NotImplementedError("real video codecs not available")
    schema = StructType([
        StructField("video_id", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ])
    frame_sz = 64

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids, idxs, frames = [], [], []
            for vid, data in zip(pdf["video_id"], pdf[payload_col]):
                raw = bytes(data)
                for i in range(0, len(raw) // frame_sz, every_n):
                    vids.append(vid)
                    idxs.append(i)
                    frames.append(raw[i * frame_sz:(i + 1) * frame_sz])
            yield pd.DataFrame({"video_id": vids, "frame_index": idxs,
                                "frame_bytes": frames})

    return video.mapInPandas(run, schema)


def caption_stats(images: DataFrame) -> DataFrame:
    """Image-caption text stats (native exprs): the multimodal join of
    payload metadata with caption-side token counts — what a
    captioning-data curation pass filters on."""
    return images.select(
        "image_id", "caption", "w", "h", "fmt",
        F.size(F.filter(F.split(F.lower("caption"), r"[^a-z0-9]+"),
                        lambda t: t != "")).alias("caption_tokens"),
        (F.col("w") * F.col("h")).alias("pixels"),
        (F.length("bytes") / (F.col("w") * F.col("h"))).alias(
            "bytes_per_pixel"))
