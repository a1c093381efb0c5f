"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
partition-friendly mapInPandas signatures, deterministic behavior. The
actual codec work is STUBBED (pillow/librosa/av are not in this container):
each stage tries the real library and otherwise falls back to a
clearly-marked deterministic fake derived from the payload bytes, keeping
the pipeline runnable end-to-end. Swapping the fake for the real decode is
a one-function change per stage.

Schema:
    media(media_id long, kind string, payload binary,
          meta struct<mime string, width int, height int,
                      sample_rate int, duration_ms int>)
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: payload
    = utf-8 bytes of the text; metadata derived from sizes. Lets every
    multimodal stage run on the driver-provided testdata without external
    files."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "utf-8")
    n = F.octet_length(payload)
    meta = F.struct(
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.pmod(n, F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(n * 7, F.lit(480)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(n * 31, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"),
        payload.alias("payload"), meta.alias("meta"),
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from payload bytes.
    Replace with PIL.Image.open(io.BytesIO(payload)) when pillow exists."""
    seed = zlib.crc32(payload or b"")
    rng = np.random.RandomState(seed % (2**32))
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("edge_density", T.DoubleType()),
    T.StructField("decoder", T.StringType()),
])


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract stage (Arrow-batched).

    Real plumbing: binary payload + struct meta in, flat features out; one
    decode per row inside the batch loop, numpy feature math vectorized per
    image. STUB: pixels come from the deterministic fake decoder unless PIL
    is importable."""

    def batches(pdf_iter):
        for pdf in pdf_iter:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "mean_luma", "edge_density", "decoder")}
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                if HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode path: PIL.Image.open(BytesIO(payload))"
                    )
                px = _fake_pixels(bytes(payload or b""), w, h)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(float(px.mean()) / 255.0)
                grad = np.abs(np.diff(px.astype(np.int16), axis=1)).mean()
                out["edge_density"].append(float(grad) / 255.0)
                out["decoder"].append("fake")
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_images(media: DataFrame, scale_percent: int = 50) -> DataFrame:
    """Graft of the reference's 50% downscale (tiff_processor.py:6-7, 84-99).

    STUB: payload passthrough-truncated deterministically; real impl resizes
    the decoded image and re-encodes."""
    w = (F.col("meta.width") * scale_percent / 100).cast("int")
    h = (F.col("meta.height") * scale_percent / 100).cast("int")
    new_len = F.greatest(
        (F.octet_length("payload") * scale_percent / 100).cast("int"), F.lit(1)
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id", w.alias("width"), h.alias("height"),
        F.expr("substring(payload, 1, greatest(cast(octet_length(payload) * "
               f"{scale_percent} / 100 as int), 1))").alias("payload"),
    )


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame_luma", T.DoubleType()),
])


def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode
    shape). STUB frame decode; real impl seeks with PyAV."""

    def batches(pdf_iter):
        for pdf in pdf_iter:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "frame_luma")}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = int(meta["duration_ms"])
                n_frames = max(1, int(duration / 1000 * fps))
                seed = zlib.crc32(bytes(payload or b""))
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(i * 1000 / fps))
                    out["frame_luma"].append(((seed >> (i % 24)) & 0xFF) / 255.0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.IntegerType()),
])


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction (RMS + zero crossings) over STUB samples
    derived deterministically from payload bytes; real impl uses librosa."""

    def batches(pdf_iter):
        for pdf in pdf_iter:
            out = {k: [] for k in ("media_id", "sample_rate", "rms", "zero_crossings")}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = np.frombuffer(bytes(payload or b"\x00"), dtype=np.uint8)
                samples = (raw.astype(np.float32) - 127.5) / 127.5
                out["media_id"].append(mid)
                out["sample_rate"].append(int(meta["sample_rate"]))
                out["rms"].append(float(np.sqrt((samples ** 2).mean())))
                out["zero_crossings"].append(
                    int((np.diff(np.signbit(samples)) != 0).sum())
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )
