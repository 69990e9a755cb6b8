"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema, batching, partition sizing, UDF
signatures via ``mapInPandas`` — is real and tested; the actual codec
work is stubbed behind ``DecodeBackend`` because the media libraries
are not in this container (task brief: "STUB the decode step ...
make the Spark-side plumbing real").

Design for 100 TB of media: rows carry (asset_id, modality, media:
binary, meta struct). ``mapInPandas`` streams Arrow batches through
the Python worker; ``spark.sql.files.maxPartitionBytes`` and the
repartition-by-size helper keep per-task memory bounded even when a
single asset is 100 MB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id string, modality string, media binary, "
    "width int, height int, duration_ms long"
)

FEATURE_SCHEMA = "asset_id string, modality string, n_bytes long, feature array<float>"


class DecodeBackend:
    """Pluggable decoder. The real implementation would wrap PIL /
    torchaudio / pyav; this deterministic fake hashes bytes into a
    fixed-size feature so the distributed plumbing is testable."""

    def decode_features(self, media: bytes, modality: str, dim: int = 8) -> list[float]:
        if media is None:
            raise NotImplementedError("real codec not available in this environment")
        import hashlib

        h = hashlib.sha256(media).digest()
        return [h[i] / 255.0 for i in range(dim)]


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: binary payload from sha2 of the id."""
    df = spark.range(n).select(
        F.format_string("asset_%05d", F.col("id")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("media"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("id") * 100).alias("duration_ms"),
    )
    return df


def extract_features(df: DataFrame, dim: int = 8, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction — Arrow-batched, no per-row Python
    at the DataFrame layer; batches are re-chunked to bound memory."""
    backend = DecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                media = chunk["media"].to_numpy()
                modality = chunk["modality"].to_numpy()
                # single python pass over the Arrow batch (the hash call
                # itself is per-asset by nature; a real codec would be a
                # numpy/torch batch op here)
                feats = [
                    backend.decode_features(b, m, dim) for b, m in zip(media, modality)
                ]
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "modality": chunk["modality"],
                        "n_bytes": [len(b) if b is not None else 0 for b in media],
                        "feature": feats,
                    }
                )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id string, modality string, media binary, width int, height int"
)


def resize_images(
    df: DataFrame, target_w: int = 32, target_h: int = 32, batch_rows: int = 256
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas``: Arrow-batched binary
    in, binary out, metadata updated. The pixel work is the stubbed
    codec (deterministic fake: sha256-stream of the source bytes sized
    w*h, so downstream schema/partitioning/row-size behavior is real
    and testable); a production build drops PIL/torchvision into
    ``DecodeBackend`` without touching the Spark plumbing."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = target_w * target_h
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = []
                for b in chunk["media"].to_numpy():
                    if b is None:
                        out.append(None)
                        continue
                    buf = b""
                    seed = bytes(b)
                    while len(buf) < n_bytes:
                        seed = hashlib.sha256(seed).digest()
                        buf += seed
                    out.append(buf[:n_bytes])
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "modality": chunk["modality"],
                        "media": out,
                        "width": target_w,
                        "height": target_h,
                    }
                )

    return df.filter(F.col("modality") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per requested frame via
    sequence+explode (pure relational; the decode itself is stubbed)."""
    frames = F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long"), F.lit(0)))
    return (
        df.filter(F.col("modality") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
        .withColumn("frame_ms", F.col("frame_idx") * every_ms)
    )
