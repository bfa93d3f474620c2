"""Y4M container (`ext/y4m.py`): exact round-trip, header parsing,
format errors."""

import pytest

from sftp_data_ingestion_spark.ext.y4m import decode_y4m, encode_y4m


def test_roundtrip_exact():
    frames = [bytes(range(64)) , bytes(reversed(range(64)))]
    enc = encode_y4m(8, 8, frames, fps=25)
    w, h, fps, dec = decode_y4m(enc)
    assert (w, h, fps) == (8, 8, 25)
    assert dec == frames  # lossless, byte-exact


def test_header_and_errors():
    enc = encode_y4m(4, 2, [bytes(8)])
    assert enc.startswith(b"YUV4MPEG2 W4 H2 F1:1 Ip A1:1 Cmono\n")
    with pytest.raises(ValueError, match="frame size"):
        encode_y4m(4, 2, [bytes(7)])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF....\n")
    with pytest.raises(ValueError, match="only Cmono"):
        decode_y4m(b"YUV4MPEG2 W4 H2 F1:1 Ip A1:1 C420\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H2 F1:1 Ip A1:1 Cmono\nFRAME\n" + bytes(3))


def test_sample_frames_real_decodes_y4m(spark):
    """`sample_frames(decode="real")` must genuinely parse Y4M
    payloads (frame stride = every_n * fps) and keep the honest
    libav gate for compressed containers."""
    import pytest
    from pyspark.sql import Row

    from sftp_data_ingestion_spark.ext.multimodal import sample_frames

    frames = [bytes([i] * 4) for i in range(6)]
    enc = encode_y4m(2, 2, frames, fps=2)
    df = spark.createDataFrame(
        [
            Row(
                media_id=1,
                payload=bytearray(enc),
                meta=Row(media_type="video", duration_ms=3000),
            )
        ]
    )
    got = sample_frames(df, every_n=1, decode="real").collect()
    # fps=2, every_n=1 -> stride 2: frames 0, 2, 4
    assert [(r["media_id"], r["frame_idx"]) for r in got] == [
        (1, 0), (1, 2), (1, 4),
    ]
    assert bytes(got[1]["frame_payload"]) == frames[2]

    bad = spark.createDataFrame(
        [
            Row(
                media_id=2,
                payload=bytearray(b"\x00\x00\x00 ftypmp42 not raw"),
                meta=Row(media_type="video", duration_ms=1000),
            )
        ]
    )
    with pytest.raises(Exception, match="libav|YUV4MPEG2"):
        sample_frames(bad, every_n=1, decode="real").collect()
