"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages.

The IMAGE decode is REAL: payloads are binary PPM (P6) images and
``parse_ppm_batch`` parses the header and pixel bytes for real (numpy over
the raw buffer — a malformed payload raises).  PPM is the one raster format
that needs no codec library, so the decode seam is genuinely exercised in
this container; swapping in PIL/libjpeg for JPEG/PNG on a real cluster
changes only the body of ``parse_ppm_batch``.  Audio/video frame decode
still needs ffmpeg and stays stubbed behind ``decode_frame``
(NotImplementedError) — the explode/partition plumbing around it is real.

Schema convention:

    media(media_id:long, kind:string, meta:struct<width:int,height:int,
          sample_rate:int, n_frames:int>, payload:binary)
"""

from __future__ import annotations

import re
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

# canonical single-whitespace PPM header: P6\n<w> <h>\n<maxval>\n<raw RGB>
_PPM_HEADER = re.compile(rb"^P6\n(\d+) (\d+)\n(\d+)\n")


def parse_ppm_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL binary decode of a batch of PPM (P6) images → per-image stats.

    Parses magic + dimensions + maxval from the byte header, then computes
    pixel statistics over the raw RGB buffer with numpy.  Integer outputs
    only (sum/min/max, not mean) so a SQL oracle reproduces them exactly —
    float means invite round-half banker's-vs-away mismatches.
    """
    n = len(payloads)
    width = np.zeros(n, dtype=np.int32)
    height = np.zeros(n, dtype=np.int32)
    maxval = np.zeros(n, dtype=np.int32)
    n_pix = np.zeros(n, dtype=np.int64)
    px_sum = np.zeros(n, dtype=np.int64)
    px_min = np.zeros(n, dtype=np.int32)
    px_max = np.zeros(n, dtype=np.int32)
    for i, raw in enumerate(payloads):
        b = bytes(raw)
        m = _PPM_HEADER.match(b)
        if not m:
            raise ValueError(f"not a canonical P6 PPM payload: {b[:20]!r}")
        w, h, mv = int(m.group(1)), int(m.group(2)), int(m.group(3))
        pixels = np.frombuffer(b, dtype=np.uint8, offset=m.end())
        if pixels.size != w * h * 3:
            raise ValueError(f"PPM pixel buffer {pixels.size} != {w}*{h}*3")
        width[i], height[i], maxval[i] = w, h, mv
        n_pix[i] = pixels.size
        px_sum[i] = int(pixels.sum(dtype=np.int64))
        px_min[i] = int(pixels.min())
        px_max[i] = int(pixels.max())
    return pd.DataFrame(
        {
            "width": width, "height": height, "maxval": maxval,
            "n_pix": n_pix, "px_sum": px_sum, "px_min": px_min, "px_max": px_max,
        }
    )


PPM_FEATURE_SCHEMA = (
    "media_id long, width int, height int, maxval int, n_pix long, "
    "px_sum long, px_min int, px_max int, sha256 string"
)


def ppm_features(media: DataFrame) -> DataFrame:
    """media(media_id, payload:binary PPM) → parsed per-image features via
    mapInPandas (Arrow-batched; peak memory = one batch of payloads per task,
    the shape that survives 100 TB of media)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = parse_ppm_batch(pdf["payload"])
            feats.insert(0, "media_id", pdf["media_id"].astype("int64").to_numpy())
            feats["sha256"] = [
                hashlib.sha256(bytes(b)).hexdigest() for b in pdf["payload"]
            ]
            yield feats

    return media.select("media_id", "payload").mapInPandas(kernel, PPM_FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic PPM media table derived from a docs table — the driver
    entry's input (DuckDB reconstructs the identical payload string from the
    same formulas; content is ASCII so chars == bytes).

    width = 4 + doc_id % 13, height = 4 + doc_id % 7; the pixel buffer is the
    content, '.'-padded/truncated to w·h·3 bytes.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.expr(
            """
            encode(
              'P6' || chr(10) ||
              cast(4 + doc_id % 13 AS STRING) || ' ' || cast(4 + doc_id % 7 AS STRING)
              || chr(10) || '255' || chr(10) ||
              substring(
                content || repeat('.', cast((4 + doc_id % 13) * (4 + doc_id % 7) * 3 AS INT)),
                1, cast((4 + doc_id % 13) * (4 + doc_id % 7) * 3 AS INT)
              ),
              'UTF-8')
            """
        ).alias("payload"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/benches: images are VALID PPMs
    (really decoded downstream); audio/video payloads are opaque bytes."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 4 + i % 13, 4 + i % 7
            px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
            payload = b"P6\n%d %d\n255\n" % (w, h) + px
            meta = (w, h, None, None)
        else:
            payload = rng.integers(
                0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8
            ).tobytes()
            meta = (
                None, None,
                16000 if kind == "audio" else None,
                30 if kind == "video" else None,
            )
        rows.append((i, kind, meta, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
