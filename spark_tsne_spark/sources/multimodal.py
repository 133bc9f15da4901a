"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` passes. The decode kernels themselves are STUBBED
(image/audio codecs are not available in this environment): a
clearly-marked deterministic fake stands in so the Spark-side
contract — schema, batch shape, partitioning, UDF signature — is real
and tested, and a production deployment swaps ``_decode_stub`` for a
PIL/ffmpeg call without touching the plan.

Scale notes: binary payloads stay columnar through Arrow; per-batch
numpy work avoids per-row Python. Feature extraction is a narrow map
(no shuffle); downstream dedup/similarity reuse the embedding
operators unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the payload
    bytes (sha256-seeded). A real deployment replaces this with an
    actual image/audio decode + model forward pass; everything around
    it (Arrow batching, schema, partitioning) is production-shaped.
    """
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """binary payload → fixed-width feature vector, one narrow pass."""
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [list(_decode_stub(bytes(p), dim)) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample videos: one output row per kept frame.

    The frame-split kernel is stubbed (slices the payload into
    ``n_frames`` equal chunks); the explode-shaped output contract is
    the real part.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for _, row in pdf.iterrows():
                n = max(1, int(row["n_frames"] or 1))
                payload = bytes(row["payload"])
                step = max(1, len(payload) // n)
                for k in range(0, n, every_n):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(k)
                    out["frame"].append(payload[k * step : (k + 1) * step])
            yield pd.DataFrame(out)

    flat = media.select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return flat.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _decode_grid_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB image decode: interpret the raw payload as a row-major
    uint8 pixel grid, zero-padded / truncated to ``height x width``.
    A real deployment swaps this for PIL/libjpeg; the resample kernel
    and everything around it is production-shaped.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size))
    return buf[:need].reshape(height, width)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image to ``width x height`` (nearest-neighbor),
    one narrow Arrow-batched pass: decode (stubbed) -> vectorized
    numpy index resample -> re-encode as raw bytes, metadata updated
    in place. No shuffle; payloads stay columnar through Arrow.
    """
    from spark_tsne_spark.shipping import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spark_tsne_spark.runtime import tune_malloc

        tune_malloc()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "payload": [], "meta": []}
            for _, row in pdf.iterrows():
                src_w = max(1, int(row["width"] or 1))
                src_h = max(1, int(row["height"] or 1))
                grid = _decode_grid_stub(bytes(row["payload"]), src_w, src_h)
                ys = np.minimum(
                    (np.arange(height) * src_h) // height, src_h - 1
                )
                xs = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
                resized = grid[np.ix_(ys, xs)]
                out["media_id"].append(row["media_id"])
                out["payload"].append(resized.tobytes())
                out["meta"].append(
                    {
                        "mime": row["mime"],
                        "width": width,
                        "height": height,
                        "n_frames": row["n_frames"],
                    }
                )
            yield pd.DataFrame(out)

    flat = media.select(
        "media_id",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return flat.mapInPandas(run, RESIZED_SCHEMA)
