"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (this container has no image/audio libs): a
clearly-marked deterministic fake stands in for pillow/ffmpeg, so the
Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested while the codec is swappable. Swap `_decode_stub` for a
real decoder on a cluster with the libs installed.

Schema convention:
    media(doc_id string, kind string, payload binary,
          meta struct<mime:string, bytes:int>)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, kind string, width int, height int, "
    "n_frames int, feature array<float>"
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), kind round-robins image/audio/video."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB decoder — deterministic fake in place of pillow/ffmpeg.

    Real deployment: replace with e.g. PIL.Image.open(BytesIO(payload)).
    Raises NotImplementedError for unknown kinds, exactly as a real codec
    registry would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for kind={kind!r}")
    h = sum(payload[:64]) if payload else 0
    return {
        "width": 16 + h % 1024 if kind != "audio" else 0,
        "height": 16 + (h * 7) % 768 if kind != "audio" else 0,
        "n_frames": 1 if kind == "image" else 1 + h % 300,
    }


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas): the
    shape of a real multimodal featurizer — per-batch vectorized metadata,
    per-item codec calls, bounded batch memory via maxRecordsPerBatch."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer((p or b"\x00") * feat_dim, dtype=np.uint8)[
                    : feat_dim * 4
                ]
                v = arr.astype(np.float32)[:feat_dim]
                v = np.pad(v, (0, feat_dim - len(v)))
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, scale double"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, t_offset double, frame binary"


def resize_images(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-preserving resize plumbing over image-kind rows (one
    mapInPandas pass, filter pushed before the UDF so only images pay).
    The pixel work is the stubbed part — a real deployment swaps the body
    for PIL `Image.resize` — but the contract is real and tested: scale =
    min(max_w/w, max_h/h, 1), output dims rounded down, payload passed
    through as the (fake) resized blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            rows = []
            for (doc_id, payload), m in zip(
                zip(pdf["doc_id"], pdf["payload"]), dims
            ):
                w, h = m["width"], m["height"]
                scale = min(max_w / w, max_h / h, 1.0)
                rows.append(
                    (
                        doc_id,
                        payload,  # STUB: a real codec returns re-encoded bytes
                        int(w * scale),
                        int(h * scale),
                        round(scale, 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height", "scale"]
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run, RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing over video-kind rows: one input row
    explodes to ceil(n_frames / every_n) frame rows — the fan-out shape
    (and batch memory profile) of a real ffmpeg keyframe sampler. The
    frame bytes are a deterministic fake slice of the payload (STUB);
    t_offset assumes the stub's nominal 30 fps."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, kind in zip(
                pdf["doc_id"], pdf["payload"], pdf["kind"]
            ):
                n_frames = _decode_stub(payload, kind)["n_frames"]
                for i, f_idx in enumerate(range(0, n_frames, every_n)):
                    blob = payload or b"\x00"
                    start = (f_idx * 7) % max(1, len(blob))
                    rows.append(
                        (
                            doc_id,
                            f_idx,
                            round(f_idx / 30.0, 6),
                            blob[start : start + 16],  # STUB frame bytes
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "t_offset", "frame"]
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: synth media → decode/featurize → typed metadata.
    Fully oracle-checked: the decode STUB is deterministic arithmetic over
    payload bytes, so the DuckDB side reproduces every value — the codec
    body is the only swap point for a real deployment."""
    return extract_features(synth_media(spark, sf_dir)).select(
        "doc_id", "kind", "width", "height", "n_frames"
    )
