"""Multimodal (image/audio/video) column operators.

Payloads are opaque `binary` columns with typed metadata, processed
via Arrow-batched mapInPandas. The sandbox has no media libraries, so
the *codec* steps are either the deterministic numpy codec
(overmatch_spark.images: fmt raw/qlossy) or clearly-marked stubs
raising NotImplementedError — but the Spark-side plumbing (schemas,
batch iteration, payload-projection discipline) is real and tested.

Scale discipline (the part that matters at 10^12 rows): binary
payloads NEVER enter a shuffle — every operator here is a
scan-side map (mapInPandas, no wide dependency), and anything that
joins or aggregates first projects the payload out and re-attaches by
id (operators.conflate.attach_payload).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from overmatch_spark.images import decode, encode

FEATURE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_gray", DoubleType()),
        StructField("aspect", DoubleType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("bytes", BinaryType()),
    ]
)


def extract_features(images: DataFrame) -> DataFrame:
    """Decode + per-image features (channel means, gray std, aspect).
    One Arrow batch in, one out; zero per-row Python outside numpy."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                px = decode(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
                rows["image_id"].append(r.image_id)
                rows["mean_r"].append(float(px[:, :, 0].mean()))
                rows["mean_g"].append(float(px[:, :, 1].mean()))
                rows["mean_b"].append(float(px[:, :, 2].mean()))
                rows["std_gray"].append(float(px.mean(axis=2).std()))
                rows["aspect"].append(float(r.w) / float(r.h))
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, FEATURE_SCHEMA
    )


def resize_nearest(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy index sampling); output re-encoded
    with the same fmt. A real bilinear/Lanczos would replace the
    sampling line only."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                px = decode(r.bytes, r.w, r.h, r.fmt)
                yi = (np.arange(out_h) * r.h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * r.w // out_w).astype(np.int64)
                rs = px[yi][:, xi]
                out["image_id"].append(r.image_id)
                out["bytes"].append(encode(rs, r.fmt))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(r.fmt)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, RESIZE_SCHEMA
    )


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB: video frame sampling. The sandbox has no video codecs —
    decoding is NotImplemented; the operator shape (binary in, one row
    per sampled frame out via mapInPandas) is the real contract."""

    def gen(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "video decode requires a codec library not present in "
                "this sandbox; plug a decoder into sample_frames.gen"
            )

    return videos.select(
        videos["video_id"], videos["bytes"]
    ).mapInPandas(gen, FRAME_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """STUB: audio feature extraction (same contract as above)."""
    schema = StructType(
        [
            StructField("audio_id", StringType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def gen(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "audio decode requires a codec library not present in "
                "this sandbox"
            )

    return audio.select(audio["audio_id"], audio["bytes"]).mapInPandas(gen, schema)
