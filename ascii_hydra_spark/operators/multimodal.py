"""Multimodal (binary) column plumbing (driver mandate, SURVEY.md §2.3).

Model: image/audio/video payloads are opaque `binary` columns travelling
next to typed metadata (modality, codec, width/height/duration, ...).
Spark-side everything is real — schemas, partition-friendly layout,
Arrow-batched mapInPandas pipelines, metadata extraction via built-ins.

Codec status (round 4): uncompressed 24bpp BMP, 16-bit PCM WAV, AND
8-bit RGB PNG have REAL in-repo decoders (:func:`decode_bmp` /
:func:`decode_wav` / :func:`decode_png`, with matching encoders for
payload synthesis). PNG is a genuinely COMPRESSED codec — stdlib
``zlib`` inflates the IDAT stream and numpy reverses the per-scanline
filters (None/Sub/Up/Average/Paeth); the in-repo encoder rotates
through all five filter types so the round trip exercises every
reversal path. Only jpeg/h264 stay stubbed (entropy coding / video
codecs genuinely need external libraries not in this container):
`decode_media` raises NotImplementedError for those, and the
deterministic byte-histogram stand-in keeps the full pipeline shape
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


_REAL_CODECS = {"jpeg", "pcm16", "h264"}

# Codecs with a REAL in-repo decoder: bmp/wav are header + raw array;
# png is zlib-compressed scanlines (stdlib zlib + numpy filter reversal).
DECODABLE_CODECS = {"bmp", "wav", "png"}


def _check_codecs(codecs: pd.Series) -> None:
    real = codecs[codecs.isin(_REAL_CODECS)]
    if not real.empty:
        # STUB: real decoding needs PIL/ffmpeg etc., not in this container.
        raise NotImplementedError(
            f"codec {real.iloc[0]!r}: decode libraries not available; "
            "plug a decoder into decode_media(decoder=...)"
        )


# ------------------------------------------------------------------
# Pure-numpy codecs: uncompressed 24bpp BMP and 16-bit PCM WAV.
# Both are trivial header+array formats, so decode is real (bit-exact,
# no external deps) — the capability gate stays only on compressed
# codecs (jpeg/h264) where a real library is unavoidable.
# ------------------------------------------------------------------

def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array -> uncompressed 24bpp BI_RGB BMP bytes
    (bottom-up rows, BGR channel order, 4-byte row padding — the classic
    Windows V3 layout every viewer accepts)."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    if pad:
        rows = np.concatenate([rows, np.zeros((h, pad), np.uint8)], axis=1)
    return header + info + np.ascontiguousarray(rows).tobytes()


def decode_bmp(payload: bytes):
    """Uncompressed 24bpp BI_RGB BMP bytes -> (h, w, 3) uint8 RGB array.
    Rejects anything it cannot decode exactly (compression, other depths,
    top-down images) rather than guessing."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """1-D int16 array -> mono 16-bit PCM RIFF/WAVE bytes."""
    import struct

    import numpy as np

    s = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out


def decode_wav(payload: bytes):
    """Mono 16-bit PCM RIFF/WAVE bytes -> (sample_rate, int16 array).
    Walks the chunk list (so extra chunks like LIST are tolerated);
    rejects compressed/float/multi-channel variants."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, data


def _paeth(a, b, c):
    """Paeth predictor (PNG spec §9, filter type 4), vectorized over numpy
    int16 arrays: pick whichever of left/up/up-left is closest to
    p = left + up - upleft, with the spec's tie-break order (a, then b)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB array -> 8-bit truecolor PNG bytes.

    Real DEFLATE compression via stdlib zlib. The scanline filter rotates
    through all five spec filter types (row r uses filter r % 5), so a
    decoder must implement every reversal path to round-trip the output —
    that is deliberate: it makes the in-repo decode_png round-trip test an
    actual test of the filter logic, not just of zlib.
    """
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {arr.shape}")
    h, w = arr.shape[:2]
    rows = arr.reshape(h, w * 3).astype(np.int16)  # int16: filter math needs signed
    prev = np.zeros(w * 3, dtype=np.int16)
    out = bytearray()
    for r in range(h):
        cur = rows[r]
        left = np.concatenate([np.zeros(3, np.int16), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int16), prev[:-3]])
        ftype = r % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            filt = cur - _paeth(left, prev, upleft)
        out.append(ftype)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB, no interlace
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), level))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """8-bit truecolor (color type 2) non-interlaced PNG -> (h, w, 3) uint8
    RGB array. Stdlib zlib inflates the concatenated IDAT stream; numpy
    reverses the per-scanline filters. Chunk CRCs are verified. Rejects
    anything it cannot decode exactly (palette/gray/alpha, 16-bit,
    interlaced) rather than guessing.

    Filter reversal strategy: None and Up are fully vectorized; Sub is a
    per-channel-lane cumulative sum (recon[x] = raw[x] + recon[x-3] mod 256
    is exactly cumsum mod 256 per lane); Average and Paeth are inherently
    sequential in x (the 'left' operand is the already-reconstructed byte),
    so those rows walk pixels left-to-right operating on 3-byte lanes.
    """
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError(f"PNG data size {raw.size} != {h * (stride + 1)}")
    raw = raw.reshape(h, stride + 1)
    ftypes, data = raw[:, 0], raw[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        cur, ft = data[r], int(ftypes[r])
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: cumsum mod 256 per 3-byte channel lane
            rec = cur.reshape(w, 3).cumsum(axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            rec = (cur + prev) % 256
        elif ft == 3:  # Average: sequential (left is reconstructed)
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(3, dtype=np.int16)
            px = cur.reshape(w, 3)
            up = prev.reshape(w, 3)
            for x in range(w):
                left = (px[x] + ((left + up[x]) >> 1)) % 256
                rec[x * 3 : x * 3 + 3] = left
        elif ft == 4:  # Paeth: sequential
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(3, dtype=np.int16)
            upleft = np.zeros(3, dtype=np.int16)
            px = cur.reshape(w, 3)
            up = prev.reshape(w, 3)
            for x in range(w):
                left = (px[x] + _paeth(left, up[x], upleft)) % 256
                upleft = up[x]
                rec[x * 3 : x * 3 + 3] = left
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        recon[r] = rec
        prev = rec
    return recon.astype(np.uint8).reshape(h, w, 3)


def _png_features(payload: bytes) -> list[float]:
    """REAL decode features for a PNG payload — same 9-element layout as
    :func:`_bmp_features` ([w, h, top-left RGB, bottom-right RGB, mean])
    so the same closed-form SQL oracle applies. The corners pin the filter
    reversals: a decoder that botched Sub/Up/Average/Paeth would corrupt
    later rows and miss the bottom-right pixel."""
    import numpy as np

    arr = decode_png(payload)
    h, w = arr.shape[:2]
    tl, br = arr[0, 0], arr[h - 1, w - 1]
    return [
        float(w),
        float(h),
        float(tl[0]),
        float(tl[1]),
        float(tl[2]),
        float(br[0]),
        float(br[1]),
        float(br[2]),
        round(float(np.mean(arr.astype(np.float64))), 6),
    ]


def _bmp_features(payload: bytes) -> list[float]:
    """REAL decode features for a BMP payload: [width, height, top-left
    R/G/B, bottom-right R/G/B, round(mean over all pixel bytes, 6)].
    The corner pixels pin the layout transforms (bottom-up flip + BGR
    swap) — a decoder that ignored row order would still get the mean
    right but fail the corners."""
    import numpy as np

    arr = decode_bmp(payload)
    h, w = arr.shape[:2]
    tl, br = arr[0, 0], arr[h - 1, w - 1]
    return [
        float(w),
        float(h),
        float(tl[0]),
        float(tl[1]),
        float(tl[2]),
        float(br[0]),
        float(br[1]),
        float(br[2]),
        round(float(np.mean(arr.astype(np.float64))), 6),
    ]


def _wav_features(payload: bytes) -> list[float]:
    """REAL decode features for a WAV payload: [sample_rate, n_samples,
    first, last, round(mean, 6)]."""
    import numpy as np

    rate, data = decode_wav(payload)
    n = int(data.size)
    return [
        float(rate),
        float(n),
        float(data[0]) if n else 0.0,
        float(data[-1]) if n else 0.0,
        round(float(np.mean(data.astype(np.float64))), 6) if n else 0.0,
    ]


def _decode_batch(batch: pd.DataFrame, n_features: int) -> pd.DataFrame:
    """Per-codec dispatch: bmp/wav rows get REAL pure-numpy decodes
    (:func:`_bmp_features` / :func:`_wav_features`); everything else gets
    the vectorized deterministic stand-in — per-row normalized byte
    histograms, computed as ONE bincount over the whole Arrow batch
    (payloads concatenated; bucket = row_index * n_features + byte % n) —
    no per-row or per-byte Python in the stand-in hot path. (The real
    decodes are per-payload by nature; each is a handful of numpy slices.)"""
    import numpy as np

    _check_codecs(batch["codec"])
    decodable = batch["codec"].isin(DECODABLE_CODECS)
    if decodable.any():
        real = batch[decodable]
        decoders = {"bmp": _bmp_features, "wav": _wav_features, "png": _png_features}
        feats = [
            decoders[c](bytes(p)) for c, p in zip(real["codec"], real["payload"])
        ]
        out_real = pd.DataFrame(
            {
                "media_id": real["media_id"].to_numpy(),
                "n_bytes": [len(bytes(p)) for p in real["payload"]],
                "features": feats,
            },
            columns=["media_id", "n_bytes", "features"],
        )
        rest = batch[~decodable]
        if rest.empty:
            return out_real
        return pd.concat(
            [out_real, _decode_batch(rest, n_features)], ignore_index=True
        )
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


def synthetic_media(
    docs: DataFrame,
    kind: str = "bmp",
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 4,
    n_samples: int = 64,
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic media payloads derived from ids, ENCODED with the real
    codecs: pixel byte i of doc d is (d*7 + i) % 256 (row-major top-down
    RGB); WAV sample i is ((d*13 + i*31) % 65536) - 32768. Because the
    content is a closed-form function of the id, the decoded features are
    oracle-checkable in plain SQL — the encode->decode round trip through
    the actual BMP/WAV/PNG byte layout is what the check exercises. For
    kind="png" the same pixel rule goes through DEFLATE + all five
    scanline filters, so the identical oracle also proves the compressed
    round trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            ids = batch[id_col].to_numpy()
            payloads = []
            for d in ids:
                if kind in ("bmp", "png"):
                    px = (int(d) * 7 + np.arange(width * height * 3)) % 256
                    arr = px.astype(np.uint8).reshape(height, width, 3)
                    payloads.append(
                        encode_bmp(arr) if kind == "bmp" else encode_png(arr)
                    )
                else:
                    s = (int(d) * 13 + np.arange(n_samples) * 31) % 65536 - 32768
                    payloads.append(encode_wav(s.astype("<i2"), sample_rate))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "audio" if kind == "wav" else "image",
                    "codec": kind,
                    "payload": payloads,
                    "meta_json": None,
                },
                columns=["media_id", "modality", "codec", "payload", "meta_json"],
            )

    return docs.select(id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


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
