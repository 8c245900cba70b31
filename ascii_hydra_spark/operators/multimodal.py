"""Multimodal (binary) column plumbing (driver mandate, SURVEY.md §2.3).

Model: image/audio/video payloads are opaque `binary` columns travelling
next to typed metadata (modality, codec, width/height/duration, ...).
Spark-side everything is real — schemas, partition-friendly layout,
Arrow-batched mapInPandas pipelines, metadata extraction via built-ins.
Only the *codec* step (actual JPEG/PCM decode) is stubbed, because the
image/audio libraries are not in this container: `decode_media` raises
NotImplementedError for real codecs, and `fake_decode_features` provides a
deterministic stand-in (byte histogram) so the full pipeline shape is
testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video | text
        StructField("codec", StringType(), True),      # jpeg | png | pcm16 | h264 | utf8
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),  # sidecar metadata as JSON
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapt the documents fixture into a media table (utf8 'payloads').

    Real deployments read payloads from object storage; the binary column +
    metadata shape is identical.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("modality"),
        F.lit("utf8").alias("codec"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata over binary payloads with built-ins only: byte length + md5.

    This is the cheap scan-side pass that runs *before* any decode at 100 TB
    (size filtering, exact-dup removal by checksum).
    """
    return media.select(
        "media_id",
        "modality",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


_REAL_CODECS = {"jpeg", "png", "pcm16", "h264"}


def _check_codecs(codecs: pd.Series) -> None:
    real = codecs[codecs.isin(_REAL_CODECS)]
    if not real.empty:
        # STUB: real decoding needs PIL/ffmpeg etc., not in this container.
        raise NotImplementedError(
            f"codec {real.iloc[0]!r}: decode libraries not available; "
            "plug a decoder into decode_media(decoder=...)"
        )


def _decode_batch(batch: pd.DataFrame, n_features: int) -> pd.DataFrame:
    """Vectorized deterministic stand-in features: per-row normalized byte
    histograms, computed as ONE bincount over the whole Arrow batch
    (payloads concatenated; bucket = row_index * n_features + byte % n) —
    no per-row or per-byte Python in the hot path."""
    import numpy as np

    _check_codecs(batch["codec"])
    payloads = [bytes(p) if p is not None else b"" for p in batch["payload"]]
    n = len(payloads)
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
    if n and lens.sum():
        allbytes = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(
            row_idx * n_features + (allbytes % n_features).astype(np.int64),
            minlength=n * n_features,
        ).reshape(n, n_features)
    else:
        hist = np.zeros((n, n_features), dtype=np.int64)
    totals = np.maximum(lens, 1).astype(np.float64)
    feats = np.round(hist / totals[:, None], 6)
    return pd.DataFrame(
        {
            "media_id": batch["media_id"].to_numpy(),
            "n_bytes": lens,
            "features": list(feats),
        },
        columns=["media_id", "n_bytes", "features"],
    )


def decode_media(media: DataFrame, n_features: int = 16) -> DataFrame:
    """Arrow-batched decode/feature-extract pipeline over binary payloads.

    mapInPandas keeps payloads off the driver and processes executor-local
    Arrow batches — the correct shape for multi-GB media partitions. The
    per-batch function is swappable; the default extracts deterministic
    byte-histogram features (real codecs raise, see module docstring).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch, n_features)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image-resize pipeline shape: Arrow-batched mapInPandas, binary in /
    binary out, target dims carried as metadata.

    STUB decode: real codecs raise (no PIL in this container); the utf8
    stand-in 'resizes' by deterministic byte truncation/padding to
    width*height bytes, preserving the exact schema/batching a real resizer
    would use.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            _check_codecs(batch["codec"])
            # bytes slice/ljust are C-level; the column comprehension is the
            # only Python-level loop (one step per row, not per byte)
            resized = [
                bytes(p or b"")[:target].ljust(target, b"\0")
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"].to_numpy(),
                    "width": width,
                    "height": height,
                    "payload": resized,
                },
                columns=["media_id", "width", "height", "payload"],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    Generates (media_id, frame_idx) rows with sequence+explode so the
    expensive decode fans out across executors; the actual frame grab is the
    decode_media stub.
    """
    n_frames = F.coalesce(
        F.get_json_object("meta_json", "$.n_frames").cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.select("media_id", F.explode(idx).alias("frame_idx"))
