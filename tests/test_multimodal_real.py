"""Real-decode multimodal kernels: stdlib BMP/WAV codecs and the
``decode="real"`` mapInPandas stages (featurize + resize) end-to-end
through Spark. Pillow coverage is import-gated (absent here)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sftp_data_ingestion_spark.ext import multimodal as mm


def _checker_rgb(w, h):
    """Deterministic checkerboard RGB bytes, top-down row-major."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if (x + y) % 2 == 0 else 0
            out += bytes((v, v // 2, 255 - v))
    return bytes(out)


def test_bmp_roundtrip():
    rgb = _checker_rgb(5, 3)  # odd width exercises row padding
    payload = mm.encode_bmp24(5, 3, rgb)
    w, h, back = mm.decode_bmp24(payload)
    assert (w, h) == (5, 3)
    assert back == rgb


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_bmp24(b"not a bitmap")


def test_wav_roundtrip_mono():
    samples = [0, 1000, -1000, 32767, -32768, 12345]
    payload = mm.encode_wav_pcm16(8000, samples)
    fr, back = mm.decode_wav(payload)
    assert fr == 8000
    assert back == samples


def test_nearest_resize_exact():
    # 2x2 -> 1x1 nearest picks the top-left source pixel
    rgb = bytes((10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    assert mm._nearest_resize(rgb, 2, 2, 1, 1) == bytes((10, 20, 30))
    # identity resize is a no-op
    assert mm._nearest_resize(rgb, 2, 2, 2, 2) == rgb


def test_real_features_image_histogram():
    # all-black 2x2 image: every luma lands in bin 0, mass 1.0
    payload = mm.encode_bmp24(2, 2, bytes(12))
    feats = mm._real_features(payload, "bmp", 4)
    assert feats == [1.0, 0.0, 0.0, 0.0]


def test_real_features_wav_rms():
    # constant amplitude -> every window RMS = 16384/32768 = 0.5
    payload = mm.encode_wav_pcm16(8000, [16384] * 64)
    feats = mm._real_features(payload, "wav", 4)
    assert feats == pytest.approx([0.5] * 4)


def test_real_features_unsupported_format():
    with pytest.raises(NotImplementedError, match="codec"):
        mm._real_features(b"xxxx", "mp4", 4)


def _media_df(spark):
    rows = [
        (1, mm.encode_bmp24(4, 4, _checker_rgb(4, 4)), "bmp", "image"),
        (2, mm.encode_wav_pcm16(8000, list(range(-100, 100))), "wav", "audio"),
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("mt", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema).select(
        "media_id",
        "payload",
        F.struct(
            F.col("mt").alias("media_type"),
            F.col("fmt").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def test_extract_features_real_through_spark(spark):
    out = mm.extract_features(_media_df(spark), dim=4, decode="real").collect()
    by_id = {r["media_id"]: r["features"] for r in out}
    assert len(by_id) == 2
    assert pytest.approx(sum(by_id[1]), abs=1e-6) == 1.0  # histogram mass
    assert all(0.0 <= v <= 1.0 for v in by_id[2])  # RMS normalized


def test_resize_real_through_spark(spark):
    src = _media_df(spark).where(F.col("media_id") == 1)
    out = mm.resize_media(src, width=2, height=2, decode="real").collect()
    assert len(out) == 1
    w, h, rgb = mm.decode_bmp24(bytes(out[0]["payload"]))
    assert (w, h) == (2, 2)
    # nearest-neighbor of the 4x4 checkerboard at stride 2 keeps the
    # (0,0) and (0,2) source pixels on the first row — both "white"
    src_rgb = _checker_rgb(4, 4)
    assert rgb[0:3] == src_rgb[0:3]


def test_sample_frames_real_gated_for_non_y4m(spark):
    """decode='real' now parses YUV4MPEG2 streams (tests/test_y4m.py);
    non-Y4M payloads still hit the honest libav gate — inside the
    kernel, so the error surfaces on execution."""
    with pytest.raises(Exception, match="YUV4MPEG2|libav"):
        mm.sample_frames(_media_df(spark), decode="real").collect()


@pytest.mark.skipif(mm._pil_image() is None, reason="Pillow not installed")
def test_pil_path_decodes_png():  # pragma: no cover — env-dependent
    import io

    img = mm._pil_image().new("RGB", (3, 2), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, rgb = mm._real_decode_image(buf.getvalue())
    assert (w, h, rgb[:3]) == (3, 2, bytes((255, 0, 0)))


# ---------------------------------------------------------------------------
# stdlib PNG codec
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filter_types():
    import random

    rnd = random.Random(7)
    for ft in range(5):
        for w, h in [(1, 1), (16, 16), (7, 3), (31, 2)]:
            rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
            png = mm.encode_png(w, h, rgb, filter_type=ft)
            assert mm.decode_png(png) == (w, h, rgb), (ft, w, h)
            # and through the production dispatch path
            assert mm._real_decode_image(png) == (w, h, rgb)


def test_png_decode_rgba_drops_alpha():
    import random
    import struct
    import zlib

    rnd = random.Random(9)
    w, h = 4, 2
    rgba = bytes(rnd.randrange(256) for _ in range(w * h * 4))
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += rgba[y * w * 4 : (y + 1) * w * 4]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )
    exp = b"".join(rgba[i : i + 3] for i in range(0, len(rgba), 4))
    assert mm.decode_png(png) == (w, h, exp)


def _hand_png(w, h, depth, color_type, rows):
    """Assemble a PNG from pre-filtered scanline byte rows."""
    import struct
    import zlib

    raw = bytearray()
    for row in rows:
        raw += row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    return (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )


def test_png_unsupported_forms_raise_clearly():
    import struct
    import zlib

    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"JUNKJUNKJUNK")
    # palette color (3) -> NotImplementedError naming Pillow
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_png(png)
    # interlaced -> same
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_png(png)


def test_png_decode_16bit_rgb_keeps_high_byte():
    """16-bit RGB: each big-endian sample 0xNNnn decodes to its high
    byte (the exact 65535->255 rescale). Paeth-filtered row included
    so the doubled bpp feeds the filter offsets correctly."""
    import random

    rnd = random.Random(21)
    w, h = 5, 3
    hi = [
        [rnd.randrange(256) for _ in range(w * 3)] for _ in range(h)
    ]
    rows = []
    for y in range(h):
        # value = hi*257 -> big-endian bytes (hi, hi); unfiltered rows
        # (the Sub/Up/gray cases below cover filtered 16-bit strides)
        samples = b"".join(
            bytes((v, v)) for v in hi[y]
        )
        rows.append(bytes([0]) + samples)
    png = _hand_png(w, h, 16, 2, rows)
    got = mm.decode_png(png)
    exp = bytes(v for y in range(h) for v in hi[y])
    assert got == (w, h, exp)


def test_png_decode_16bit_filters_use_two_byte_bpp():
    """A 16-bit Sub-filtered row reconstructs against the sample TWO
    bytes back per channel — a decoder reusing the 8-bit bpp would
    mix high/low bytes and corrupt every pixel after the first."""
    w, h = 3, 1
    # pixel 0: (1000, 2000, 3000); pixels 1,2 add (257, 257, 257) each
    base = [1000, 2000, 3000]
    row = bytearray([1])  # Sub filter
    for x in range(w):
        for c in range(3):
            v = base[c] + x * 257
            if x == 0:
                row += bytes(((v >> 8) & 0xFF, v & 0xFF))
            else:
                row += bytes((1, 1))  # delta 0x0101 = 257
    png = _hand_png(w, h, 16, 2, [bytes(row)])
    got_w, got_h, rgb = mm.decode_png(png)
    exp = bytes(
        (base[c] + x * 257) >> 8 for x in range(w) for c in range(3)
    )
    assert (got_w, got_h, rgb) == (w, h, exp)


def test_png_decode_grayscale_replicates():
    """8-bit grayscale (color 0) and 16-bit gray+alpha (color 4):
    gray replicates to RGB, alpha drops."""
    # 8-bit gray, 4x2, Up filter on row 1
    g = [[10, 20, 30, 40], [11, 22, 33, 44]]
    rows = [
        bytes([0]) + bytes(g[0]),
        bytes([2]) + bytes((g[1][i] - g[0][i]) % 256 for i in range(4)),
    ]
    png = _hand_png(4, 2, 8, 0, rows)
    exp = bytes(v for r in g for v in r for _ in range(3))
    assert mm.decode_png(png) == (4, 2, exp)

    # 16-bit gray+alpha, 2x1: gray 0x1234 -> 0x12, alpha ignored
    row = bytes([0]) + bytes((0x12, 0x34, 0xFF, 0xFF, 0xAB, 0xCD, 0x00, 0x01))
    png = _hand_png(2, 1, 16, 4, [row])
    assert mm.decode_png(png) == (2, 1, bytes((0x12,) * 3 + (0xAB,) * 3))


def test_text_png_histogram_mass_sums_to_one(spark):
    df = spark.createDataFrame(
        [(0, "hello png world"), (3, "x")], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in mm.text_png_histogram(df).collect()}
    assert set(rows) == {0, 3}
    for r in rows.values():
        assert (r["width"], r["height"]) == (16, 16)
        assert abs(sum(r["luma_hist"]) - 1.0) < 1e-12


def test_png_unfilter_property_all_filters_16bit():
    """Property-style sweep: for random 16-bit RGB images and EVERY
    filter type, a hand-built pre-filtered PNG decodes to exactly the
    high bytes — the filters must run at the 2-byte-per-sample stride
    (a decoder reusing the 8-bit bpp corrupts everything after the
    first pixel). The reference filtering is an independent pure-
    python model of the PNG spec, not the decoder's own code."""
    import random

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    rnd = random.Random(99)
    w, h, bpp = 6, 4, 6  # 16-bit RGB: 6 bytes per pixel
    for ft in range(5):
        # raw big-endian rows: value v -> bytes (v, v) per channel
        raw_rows = [
            [rnd.randrange(256) for _ in range(w * 3)] for _ in range(h)
        ]
        raw = [
            b"".join(bytes((v, v)) for v in row) for row in raw_rows
        ]
        filt = []
        prev = bytes(w * bpp)
        for row in raw:
            out = bytearray([ft])
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    out.append(row[i])
                elif ft == 1:
                    out.append((row[i] - a) % 256)
                elif ft == 2:
                    out.append((row[i] - b) % 256)
                elif ft == 3:
                    out.append((row[i] - (a + b) // 2) % 256)
                else:
                    out.append((row[i] - paeth(a, b, c)) % 256)
            filt.append(bytes(out))
            prev = row
        png = _hand_png(w, h, 16, 2, filt)
        exp = bytes(v for row in raw_rows for v in row)
        assert mm.decode_png(png) == (w, h, exp), f"filter {ft}"
