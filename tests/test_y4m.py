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
