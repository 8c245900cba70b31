"""Pure-numpy media codecs (BMP 24bpp / PCM16 WAV): bit-exact round
trips, layout correctness (bottom-up + BGR + stride padding), and honest
rejection of variants the decoders cannot handle. The Spark-side decode
pipeline is oracle-checked via the multimodal_bmp_decode /
multimodal_wav_decode registry entries; these pin the codec layer.
"""

from __future__ import annotations

import numpy as np
import pytest

from ascii_hydra_spark.operators import multimodal as M


@pytest.mark.parametrize("shape", [(4, 8), (3, 5), (1, 1), (16, 16)])
def test_bmp_round_trip_bit_exact(shape):
    h, w = shape
    arr = np.random.RandomState(h * 100 + w).randint(0, 256, (h, w, 3)).astype(np.uint8)
    back = M.decode_bmp(M.encode_bmp(arr))
    assert np.array_equal(back, arr)


def test_bmp_layout_is_real_bottom_up_bgr():
    """The encoded bytes must be the actual Windows V3 layout: a viewer
    reading row 0 from the END of the pixel data, channels as BGR."""
    arr = np.zeros((2, 1, 3), np.uint8)
    arr[0, 0] = [255, 0, 0]  # top pixel pure RED
    arr[1, 0] = [0, 0, 255]  # bottom pixel pure BLUE
    payload = M.encode_bmp(arr)
    # pixel data starts at offset 54; FIRST stored row is the BOTTOM row,
    # stored BGR -> blue pixel stores as (255, 0, 0)
    assert payload[54:57] == bytes([255, 0, 0])
    # stride pads 3 -> 4; second stored row is the top (red) pixel
    assert payload[58:61] == bytes([0, 0, 255])


def test_bmp_rejects_unsupported_variants():
    arr = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(M.encode_bmp(arr))
    with pytest.raises(ValueError, match="not a BMP"):
        M.decode_bmp(b"JUNK" + bytes(good)[4:])
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8  # 8bpp
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_bmp(bytes(bad_bpp))
    compressed = bytearray(good)
    compressed[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_bmp(bytes(compressed))


def test_wav_round_trip_and_chunk_walk():
    s = (np.arange(500) * 977 % 65536 - 32768).astype("<i2")
    rate, back = M.decode_wav(M.encode_wav(s, 44100))
    assert rate == 44100 and np.array_equal(back, s)
    # decoder walks chunks: a LIST chunk before data must be skipped
    import struct

    payload = M.encode_wav(s[:4], 8000)
    fmt_chunk = payload[12:36]  # 'fmt ' + size + 16-byte body
    data_chunk = payload[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = fmt_chunk + extra + data_chunk
    rigged = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate2, back2 = M.decode_wav(rigged)
    assert rate2 == 8000 and np.array_equal(back2, s[:4])


def test_wav_rejects_unsupported_variants():
    s = np.zeros(8, "<i2")
    good = M.encode_wav(s, 8000)
    with pytest.raises(ValueError, match="not a WAV"):
        M.decode_wav(b"OGGS" + good[4:])
    stereo = bytearray(good)
    stereo[22] = 2  # channels
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_wav(bytes(stereo))


@pytest.mark.parametrize("shape", [(4, 8), (1, 1), (7, 3), (16, 16), (5, 1)])
def test_png_round_trip_bit_exact(shape):
    """Heights >= 5 force every filter type (encoder uses r % 5) through
    the decoder's reversal paths — None, Sub, Up, Average, Paeth."""
    h, w = shape
    arr = np.random.RandomState(h * 31 + w).randint(0, 256, (h, w, 3)).astype(np.uint8)
    payload = M.encode_png(arr)
    back = M.decode_png(payload)
    assert np.array_equal(back, arr)


def test_png_is_genuinely_compressed_deflate():
    """A constant image must compress far below raw size, and the payload
    must carry the PNG signature + zlib-inflatable IDAT (i.e., this is a
    real compressed codec, not a renamed raw dump)."""
    arr = np.full((64, 64, 3), 7, np.uint8)
    payload = M.encode_png(arr)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(payload) < 64 * 64 * 3 // 10
    assert np.array_equal(M.decode_png(payload), arr)


def test_png_all_filter_types_present_and_reversed():
    """With h=10 the encoder emits filter types 0-4 twice; verify by
    inflating the IDAT ourselves and reading each scanline's filter byte."""
    import struct
    import zlib

    arr = np.random.RandomState(42).randint(0, 256, (10, 6, 3)).astype(np.uint8)
    payload = M.encode_png(arr)
    pos, idat = 8, bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        if payload[pos + 4 : pos + 8] == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + size]
        pos += 12 + size
    raw = zlib.decompress(bytes(idat))
    stride = 6 * 3 + 1
    ftypes = [raw[r * stride] for r in range(10)]
    assert ftypes == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert np.array_equal(M.decode_png(payload), arr)


def test_png_rejects_unsupported_variants_and_corruption():
    arr = np.zeros((3, 3, 3), np.uint8)
    good = M.encode_png(arr)
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"JUNK" + good[4:])
    # flip a byte inside IHDR body -> CRC check must catch it
    corrupted = bytearray(good)
    corrupted[18] ^= 0xFF  # width byte
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(corrupted))
    # grayscale color type (rebuild IHDR with correct CRC): honest reject
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    gray = good[:8] + chunk + good[8 + len(chunk):]
    with pytest.raises(ValueError, match="unsupported"):
        M.decode_png(gray)


@pytest.mark.parametrize("shape", [(4, 8), (1, 1), (32, 64), (64, 4096)])
def test_gif_round_trip_bit_exact(shape):
    """Random noise round-trips bit-exact; the (64, 4096) case pushes the
    LZW dictionary through multiple 4095-entry resets."""
    h, w = shape
    arr = np.random.RandomState(h + w).randint(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(M.decode_gif(M.encode_gif(arr)), arr)


def test_gif_is_genuinely_compressed_lzw():
    const = np.full((128, 128), 7, np.uint8)
    p = M.encode_gif(const)
    assert p[:6] == b"GIF89a" and p[-1] == 0x3B
    assert len(p) < const.size // 8  # dictionary coding actually compresses
    assert np.array_equal(M.decode_gif(p), const)


def test_gif_rejects_unsupported_variants():
    arr = np.zeros((4, 4), np.uint8)
    good = bytearray(M.encode_gif(arr))
    with pytest.raises(ValueError, match="not a GIF"):
        M.decode_gif(b"PNG8" + bytes(good)[4:])
    interlaced = bytearray(good)
    interlaced[13 + 768 + 9] |= 0x40  # image-descriptor interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        M.decode_gif(bytes(interlaced))
    colored = bytearray(good)
    colored[13 + 3 * 10 + 1] ^= 0xFF  # break palette grayness at entry 10
    with pytest.raises(ValueError, match="grayscale"):
        M.decode_gif(bytes(colored))


@pytest.mark.parametrize("shape", [(8, 8), (17, 13), (1, 1), (9, 40)])
def test_jpeg_round_trip_accuracy(shape):
    """Random noise is the DCT worst case; even there quality-90 must hold
    ~35 dB PSNR and exact dimensions. Smooth content must round-trip far
    tighter AND compress (it is a real lossy compressed codec)."""
    h, w = shape
    arr = np.random.RandomState(h * 13 + w).randint(0, 256, (h, w, 3)).astype(np.uint8)
    back = M.decode_jpeg(M.encode_jpeg(arr, quality=90))
    assert back.shape == arr.shape
    mse = np.mean((back.astype(float) - arr.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 30.0


def test_jpeg_smooth_content_compresses_and_is_tight():
    g = np.tile(np.arange(64, dtype=np.uint8), (32, 1))
    arr = np.stack([g, g // 2, np.minimum(g * 2, 255)], axis=-1).astype(np.uint8)
    payload = M.encode_jpeg(arr, quality=95)
    assert len(payload) < arr.size // 4  # genuinely compressed
    back = M.decode_jpeg(payload)
    mse = np.mean((back.astype(float) - arr.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) > 50.0


def test_jpeg_deterministic_and_marker_structure():
    arr = np.random.RandomState(0).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p1, p2 = M.encode_jpeg(arr), M.encode_jpeg(arr)
    assert p1 == p2
    assert p1[:2] == b"\xff\xd8" and p1[-2:] == b"\xff\xd9"
    # carries its tables: 2 DQT + 4 DHT segments present
    assert p1.count(b"\xff\xdb") >= 2 and p1.count(b"\xff\xc4") >= 4


def test_jpeg_rejects_unsupported_variants():
    arr = np.zeros((8, 8, 3), np.uint8)
    good = M.encode_jpeg(arr)
    with pytest.raises(ValueError, match="not a JPEG"):
        M.decode_jpeg(b"RIFF" + good[4:])
    # rewrite SOF0 -> SOF2 (progressive): honest reject
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        M.decode_jpeg(prog)
    # truncated entropy stream
    with pytest.raises(ValueError):
        M.decode_jpeg(good[: len(good) // 2])


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must honor the DQT carried in the file, not assume the
    encoder's: re-encode with a different quality (different tables) and
    confirm both decode consistently with their own tables (coarse tables
    -> larger error, but both within their expected regime)."""
    arr = np.random.RandomState(3).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    hi = M.decode_jpeg(M.encode_jpeg(arr, quality=95))
    lo = M.decode_jpeg(M.encode_jpeg(arr, quality=30))
    err_hi = np.mean((hi.astype(float) - arr.astype(float)) ** 2)
    err_lo = np.mean((lo.astype(float) - arr.astype(float)) ** 2)
    assert err_hi < err_lo  # quality knob flows through DQT to the decoder


def test_decode_media_dispatches_real_and_stub(spark):
    """One DataFrame mixing a real-decodable bmp row and a utf8 stub row:
    the bmp row gets true decoded features, the utf8 row the histogram."""
    arr = ((np.arange(96) * 3) % 256).astype(np.uint8).reshape(4, 8, 3)
    rows = [
        (1, "image", "bmp", bytearray(M.encode_bmp(arr)), None),
        (2, "text", "utf8", bytearray(b"hello"), None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in M.decode_media(media).collect()}
    assert out[1].features[0] == 8.0 and out[1].features[1] == 4.0
    assert out[1].n_bytes == 150
    assert len(out[2].features) == 16  # histogram stand-in
    # jpeg still gates honestly
    bad = spark.createDataFrame(
        [(3, "image", "jpeg", bytearray(b"\xff\xd8"), None)], M.MEDIA_SCHEMA
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)):
        M.decode_media(bad).collect()
