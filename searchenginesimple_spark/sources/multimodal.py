"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages.  The media codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are deterministic fakes behind one seam
(``_decode_image_batch``) clearly marked for replacement — the Spark-side
contract (schema, batching, partitioning, UDF signatures) is real and tested.

Schema convention:

    media(media_id:long, kind:string, meta:struct<width:int,height:int,
          sample_rate:int, n_frames:int>, payload:binary)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, feat array<float>"
)


def _decode_image_batch(payloads: pd.Series) -> np.ndarray:
    """STUB decode seam — replace with PIL/libjpeg on a real cluster.

    Deterministic fake: 8-float 'embedding' from byte statistics, so tests
    can assert exact values and the downstream plumbing (Arrow batching,
    schema, partition layout) is exercised for real.
    """
    out = np.zeros((len(payloads), 8), dtype=np.float32)
    for i, b in enumerate(payloads):
        a = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float32)
        if a.size == 0:
            continue
        out[i] = [
            a.mean(), a.std(), a.min(), a.max(),
            float(a.size % 251), a[:16].sum() % 997.0,
            float(a[0]), float(a[-1]),
        ]
    return out


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media → per-item features via mapInPandas (Arrow-batched).

    The iterator-of-batches form keeps peak memory at one Arrow batch of
    binary payloads per task — the shape that survives 100 TB of media where
    a collect-style UDF would not.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feat": list(feats),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index.

    Frame decode is stubbed (NotImplementedError seam below); the explode /
    repartition shape is the real operator.
    """
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
    return frames


def decode_frame(payload: bytes, frame_idx: int) -> np.ndarray:  # pragma: no cover
    """Real frame decode requires ffmpeg — not available in this container."""
    raise NotImplementedError("frame decode requires ffmpeg; stubbed in sandbox")


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                (64 + i % 32, 48, 16000 if kind == "audio" else None, 30 if kind == "video" else None),
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
