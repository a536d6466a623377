"""Multimodal columns (north-star M5): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The container ships no image/audio codecs, so the *decode* kernels are
split in two:
  * a deterministic FAKE decoder (default) — payload bytes are treated
    as the raw sample/pixel buffer, so the whole pipeline (schema,
    partitioning, UDF signatures, Arrow batch shapes, downstream
    feature math) is real and differential-testable;
  * the REAL codec seam — ``decode_media(..., codec="real")`` raises
    ``NotImplementedError`` at the exact point a PIL/ffmpeg call slots
    in. Nothing else changes when it does: same schema, same batching.

Payloads here are synthesized from ``events`` by exact integer
arithmetic (byte i of event e = (e·7 + i·13) mod 256), which is what
makes the fake-decode outputs oracle-checkable in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_BYTES = 64

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_intensity", DoubleType()),
        StructField("max_intensity", IntegerType()),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from ``events``: one
    8×8 single-channel 'image' per event, payload bytes
    (event_id·7 + i·13) mod 256.

    The payload is synthesized ENTIRELY plan-side (transform → hex →
    unhex inside whole-stage codegen) — no Python stage. That mirrors
    production, where media bytes arrive from storage, and keeps the
    decode kernels downstream as the pipeline's only Python seam."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import load_table

    # spread the single-file scan before the downstream Python stages
    # so the decode kernels run on every core, not one input split
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payload = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(PAYLOAD_BYTES - 1)),
                lambda i: F.lpad(
                    F.hex(F.pmod(F.col("event_id") * 7 + i * 13, F.lit(256))), 2, "0"
                ),
            ),
            "",
        )
    )
    return ev.select(
        F.col("event_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode + feature-extract: mean/max intensity per payload.

    ``codec="real"`` is the seam where an actual image library decodes
    ``payload`` before the feature math; it is intentionally
    unimplemented in this container.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image/audio codecs are not available in this container; "
            "plug PIL/ffmpeg into this mapInPandas kernel — schema and "
            "batching are unchanged"
        )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            mats = np.stack([np.frombuffer(p, dtype="uint8") for p in pdf["payload"]])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": mats.shape[1],
                    "mean_intensity": mats.mean(axis=1),
                    "max_intensity": mats.max(axis=1).astype("int32"),
                }
            )

    return media.mapInPandas(features, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 16) -> DataFrame:
    """Frame sampling: slice every ``every``-th byte ('frame') of the
    payload into its own row — the video-keyframe extraction shape."""
    idx = F.sequence(F.lit(0), F.lit(PAYLOAD_BYTES - 1), F.lit(every))
    frame = F.explode(idx).alias("frame_no")
    return media.select("media_id", frame).withColumn(
        "frame_no", F.col("frame_no").cast("int")
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("py", IntegerType()),
        StructField("px", IntegerType()),
        StructField("value", DoubleType()),
    ]
)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Mean-pool resize (width/factor × height/factor): the image
    downsample kernel of the multimodal pipeline, vectorized over the
    Arrow batch — payloads reshape to (n, H, W) once, pooling is one
    numpy reduction, output is long-form (media_id, py, px, value).
    A real resampler (PIL.Image.resize) slots into the same kernel with
    schema and batching unchanged."""

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            side = int(PAYLOAD_BYTES ** 0.5)
            out = side // factor
            mats = np.frombuffer(b"".join(pdf["payload"]), dtype="uint8").reshape(n, side, side)
            pooled = mats.reshape(n, out, factor, out, factor).mean(axis=(2, 4))
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), out * out),
                    "py": np.tile(np.repeat(np.arange(out, dtype="int32"), out), n),
                    "px": np.tile(np.arange(out, dtype="int32"), out * n),
                    "value": pooled.reshape(-1),
                }
            )

    return media.mapInPandas(pool, RESIZE_SCHEMA)


def decode_media_arrow(media: DataFrame) -> DataFrame:
    """Arrow-native decode (mapInArrow): the same fake-decode features
    as :func:`decode_media`, but the kernel receives raw
    ``pyarrow.RecordBatch`` objects — no pandas block assembly on
    either side, the lowest-overhead Python seam Spark offers. Worth
    it when the kernel is itself Arrow/numpy-native and the batch is
    wide or binary-heavy; the pandas variant stays the ergonomic
    default."""
    import pyarrow as pa

    def features(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("media_id").to_numpy(zero_copy_only=False)
            payloads = batch.column("payload")
            n = len(ids)
            if n == 0:
                continue
            mats = np.frombuffer(
                b"".join(memoryview(v) for v in payloads.to_pylist()), dtype="uint8"
            ).reshape(n, -1)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "n_bytes": pa.array([mats.shape[1]] * n, pa.int32()),
                    "mean_intensity": pa.array(mats.mean(axis=1), pa.float64()),
                    "max_intensity": pa.array(mats.max(axis=1).astype("int32"), pa.int32()),
                }
            )

    return media.mapInArrow(features, FEATURES_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("b0", LongType()),
        StructField("b1", LongType()),
        StructField("b2", LongType()),
        StructField("b3", LongType()),
    ]
)


def phash_media(media: DataFrame) -> DataFrame:
    """Perceptual (average-hash) fingerprint per image: bit i is set
    when pixel i exceeds the image's mean intensity; the 64 bits ship
    as four 16-bit band values (b0..b3) — exactly the banded layout an
    LSH near-dup join blocks on downstream.  Exact cross-engine: the
    mean is an integer sum / 64.0 (dyadic), the comparison is
    integer-vs-exact-dyadic, the band packing is integer.  A real
    image pHash (DCT low-frequency signs after decode) drops into this
    same kernel with schema and banding unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = (1 << np.arange(16, dtype="int64"))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mats = np.frombuffer(b"".join(pdf["payload"]), dtype="uint8").reshape(
                len(pdf), PAYLOAD_BYTES
            )
            mu = mats.sum(axis=1) / 64.0  # exact: int sum / 2^6
            bits = (mats > mu[:, None]).astype("int64")  # (n, 64)
            bands = bits.reshape(len(pdf), 4, 16) @ weights  # (n, 4)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "b0": bands[:, 0],
                    "b1": bands[:, 1],
                    "b2": bands[:, 2],
                    "b3": bands[:, 3],
                }
            )

    return media.mapInPandas(kernel, PHASH_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_frame_energy", LongType()),
        StructField("n_zero_crossings", IntegerType()),
    ]
)


def audio_features(media: DataFrame, frame: int = 8) -> DataFrame:
    """Audio-style feature extraction over the payload treated as a
    PCM sample buffer (the audio face of the fake codec): samples
    center at −128, per-frame energy Σs² (exact integer), peak frame
    energy, and the zero-crossing count — the cheap triage features an
    audio ingest pipeline computes before any expensive model. A real
    decoder (ffmpeg → PCM) slots in ahead of the same numpy math with
    schema and batching unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = (
                np.frombuffer(b"".join(pdf["payload"]), dtype="uint8")
                .reshape(len(pdf), PAYLOAD_BYTES)
                .astype("int64")
                - 128
            )
            e_frame = (s * s).reshape(len(pdf), -1, frame).sum(axis=2)  # (n, frames)
            zc = ((s[:, :-1] * s[:, 1:]) < 0).sum(axis=1).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "total_energy": e_frame.sum(axis=1),
                    "peak_frame_energy": e_frame.max(axis=1),
                    "n_zero_crossings": zc,
                }
            )

    return media.mapInPandas(kernel, AUDIO_SCHEMA)
