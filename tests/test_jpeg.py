"""Baseline JPEG codec (`ext/jpeg.py`): round-trip quality, dims,
determinism, byte stuffing — all against numpy ground truth."""

import numpy as np

from sftp_data_ingestion_spark.ext.jpeg import decode_gray, encode_gray


def _smooth(n=64):
    x = np.linspace(0, 4 * np.pi, n)
    return ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100 + 128).astype(
        np.uint8
    )


def test_roundtrip_quality_monotonic():
    img = _smooth()
    raw = img.tobytes()
    errs = {}
    for q in (95, 75, 50):
        enc = encode_gray(64, 64, raw, quality=q)
        w, h, dec = decode_gray(enc)
        assert (w, h) == (64, 64)
        errs[q] = (
            np.abs(
                img.astype(int)
                - np.frombuffer(dec, dtype=np.uint8).reshape(64, 64).astype(int)
            ).mean()
        )
    assert errs[95] <= errs[75] <= errs[50]
    assert errs[95] < 1.0  # near-lossless at q95 on smooth content


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(21, 35), dtype=np.uint8)
    enc = encode_gray(35, 21, img.tobytes(), quality=90)
    w, h, dec = decode_gray(enc)
    assert (w, h) == (35, 21) and len(dec) == 35 * 21


def test_deterministic_and_stuffed():
    img = _smooth(48)
    raw = img.tobytes()
    e1 = encode_gray(48, 48, raw, 75)
    assert e1 == encode_gray(48, 48, raw, 75)
    # high-frequency content forces a stuffed 0xFF00 in the entropy
    # stream at least once across these seeds (fixed, so stable)
    rng = np.random.default_rng(7)
    stuffed = False
    for _ in range(8):
        noise = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        enc = encode_gray(16, 16, noise.tobytes(), 90)
        body = enc[enc.find(b"\xff\xda") :]
        if b"\xff\x00" in body:
            stuffed = True
        # and every stuffed stream still decodes exactly to dims
        w, h, dec = decode_gray(enc)
        assert (w, h) == (16, 16) and len(dec) == 256
    assert stuffed


def test_error_bounded_on_text_bytes():
    text = ("key agg row scan slow fast table value part hash " * 60).encode()
    pix = text[: 48 * 48]
    enc = encode_gray(48, 48, pix, 75)
    w, h, dec = decode_gray(enc)
    err = np.abs(
        np.frombuffer(pix, dtype=np.uint8).astype(int)
        - np.frombuffer(dec, dtype=np.uint8).astype(int)
    )
    assert err.mean() <= 12 and err.max() <= 64
    assert len(enc) < len(pix)  # actually compresses


def test_malformed_dri_and_progressive_rejected():
    """Foreign features outside the documented contract fail loudly
    (never decode to garbage): a DRI declaring an interval with NO
    matching RSTn markers in the scan, and a progressive SOF2 frame
    header."""
    import pytest
    import struct

    enc = encode_gray(16, 16, bytes(range(256)), 75)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # a DRI (interval = 1) spliced into a stream that has no RSTn
    # markers: the decoder expects one at the boundary and fails loud
    dri = enc[:2] + seg(0xDD, struct.pack(">H", 1)) + enc[2:]
    with pytest.raises(ValueError, match="expected RSTn"):
        decode_gray(dri)

    # zero restart interval is explicitly allowed (DRI present, off)
    dri0 = enc[:2] + seg(0xDD, struct.pack(">H", 0)) + enc[2:]
    w, h, _ = decode_gray(dri0)
    assert (w, h) == (16, 16)

    # rewrite SOF0 -> SOF2 (progressive)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF2"):
        decode_gray(prog)


def test_restart_interval_roundtrip_bit_exact():
    """RSTn round-trip: for every interval, the decoded pixels are
    BIT-IDENTICAL to the non-restart encoding's decode (restart
    markers change framing, never coefficients), the stream contains
    the expected count of correctly-sequenced markers, and the DC
    predictor reset is really exercised (distinct DC per block)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 3x5 MCUs
    raw = img.tobytes()
    baseline = decode_gray(encode_gray(40, 24, raw, 80))[2]
    n_mcus = 15
    for interval in (1, 2, 4, 7, 15, 100):
        enc = encode_gray(40, 24, raw, 80, restart_interval=interval)
        w, h, dec = decode_gray(enc)
        assert (w, h) == (40, 24)
        assert dec == baseline, f"interval={interval}"
        scan = enc[enc.find(b"\xff\xda") :]
        n_expected = (n_mcus - 1) // interval
        found = [
            scan[i + 1] - 0xD0
            for i in range(len(scan) - 1)
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7
        ]
        assert len(found) == n_expected, f"interval={interval}"
        assert found == [i % 8 for i in range(n_expected)]


def test_restart_marker_out_of_sequence_rejected():
    """A corrupted restart sequence (RST number swapped) must fail
    loudly — sequence verification is what lets a resyncing decoder
    detect dropped scan chunks."""
    import pytest

    img = bytes(range(256)) * 4  # 32x32 -> 16 MCUs
    enc = encode_gray(32, 32, img, 75, restart_interval=2)
    scan_at = enc.find(b"\xff\xda")
    # find the first RST0 in the scan and bump it to RST5
    for i in range(scan_at, len(enc) - 1):
        if enc[i] == 0xFF and enc[i + 1] == 0xD0:
            corrupted = enc[: i + 1] + bytes([0xD5]) + enc[i + 2 :]
            break
    with pytest.raises(ValueError, match="out of sequence"):
        decode_gray(corrupted)


def test_truncated_segments_raise_valueerror():
    """Malformed input follows the decode_gray ValueError contract —
    never struct.error / IndexError (r6 ADVICE: truncated DRI)."""
    import pytest
    import struct

    enc = encode_gray(16, 16, bytes(range(256)), 75)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # DRI whose body is shorter than the 2 bytes the field needs
    for body in (b"", b"\x00"):
        bad = enc[:2] + seg(0xDD, body) + enc[2:]
        with pytest.raises(ValueError, match="truncated DRI"):
            decode_gray(bad)

    # truncated SOF0: declared length cuts the 6-byte frame header
    sof_at = enc.find(b"\xff\xc0")
    bad = enc[:sof_at] + seg(0xC0, enc[sof_at + 4 : sof_at + 7]) + enc[
        sof_at + 2 + struct.unpack(">H", enc[sof_at + 2 : sof_at + 4])[0] :
    ]
    with pytest.raises(ValueError, match="truncated SOF0"):
        decode_gray(bad)

    # truncated DQT: table cut mid-way
    bad = enc[:2] + seg(0xDB, b"\x00" + bytes(10)) + enc[2:]
    with pytest.raises(ValueError, match="truncated DQT"):
        decode_gray(bad)


# ---------------------------------------------------------------------------
# 4:2:0 color path (r8)
# ---------------------------------------------------------------------------


def _gradient_rgb(w, h):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xs * 5) % 256, (ys * 7) % 256, ((xs + ys) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_color_roundtrip_bounded_and_deterministic():
    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    rgb = _gradient_rgb(50, 34)  # non-multiple-of-16 dims on purpose
    enc = encode_color(50, 34, rgb.tobytes(), quality=85)
    assert enc == encode_color(50, 34, rgb.tobytes(), quality=85)
    assert len(enc) < 50 * 34 * 3
    w, h, dec = decode_color(enc)
    assert (w, h) == (50, 34)
    got = np.frombuffer(dec, np.uint8).reshape(34, 50, 3).astype(np.int32)
    err = np.abs(got - rgb.astype(np.int32))
    assert err.mean() < 8 and err.max() < 48


def test_color_solid_is_near_exact():
    """A solid color has zero AC energy in every component, so the
    only loss is the quantized DC: the round-trip must be exact."""
    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    solid = np.full((16, 16, 3), [200, 64, 32], np.uint8)
    _, _, dec = decode_color(encode_color(16, 16, solid.tobytes(), 90))
    got = np.frombuffer(dec, np.uint8).reshape(16, 16, 3).astype(np.int32)
    assert np.abs(got - solid.astype(np.int32)).max() <= 1


def test_color_chroma_actually_subsampled():
    """The stream must declare 4:2:0 (0x22 luma sampling in SOF0) and
    carry 6 blocks per MCU — a same-size grayscale stream of the same
    content is smaller, a 4:4:4 stream would be larger."""
    from sftp_data_ingestion_spark.ext.jpeg import encode_color

    rgb = _gradient_rgb(32, 32)
    enc = encode_color(32, 32, rgb.tobytes(), quality=75)
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    ncomp = enc[sof + 9]
    assert ncomp == 3
    assert enc[sof + 11] == 0x22  # luma 2x2 sampling
    assert enc[sof + 14] == 0x11 and enc[sof + 17] == 0x11


def test_color_rejects_gray_and_vice_versa():
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_color,
        decode_gray,
        encode_color,
        encode_gray,
    )

    gray = encode_gray(16, 16, bytes(range(256)), 75)
    with pytest.raises(ValueError, match="3-component"):
        decode_color(gray)
    color = encode_color(16, 16, _gradient_rgb(16, 16).tobytes(), 75)
    with pytest.raises(ValueError, match="single-component"):
        decode_gray(color)


def test_color_buffer_size_validated():
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import encode_color

    with pytest.raises(ValueError, match="does not match"):
        encode_color(10, 10, bytes(10), 75)


def test_color_restart_interval_roundtrip_bit_exact():
    """Color RSTn round-trip: for each interval the decode is
    BIT-IDENTICAL to the non-restart encoding's decode (markers
    change framing, never coefficients), the scan carries the
    correctly-sequenced marker count, and all THREE DC predictors
    reset (an un-reset chroma predictor would shift whole MCUs)."""
    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    rgb = _gradient_rgb(72, 40)  # 5x3 = 15 MCUs of 16x16
    baseline = decode_color(encode_color(72, 40, rgb.tobytes(), 80))[2]
    n_mcus = 15
    for interval in (1, 2, 4, 7, 15, 100):
        enc = encode_color(72, 40, rgb.tobytes(), 80, restart_interval=interval)
        w, h, dec = decode_color(enc)
        assert (w, h) == (72, 40)
        assert dec == baseline, f"interval={interval}"
        scan = enc[enc.find(b"\xff\xda") :]
        n_expected = (n_mcus - 1) // interval
        found = [
            scan[i + 1] - 0xD0
            for i in range(len(scan) - 1)
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7
        ]
        assert len(found) == n_expected, f"interval={interval}"
        assert found == [i % 8 for i in range(n_expected)]


def test_color_dri_without_markers_rejected():
    """A DRI segment declaring an interval over a scan that carries
    no RST markers must fail loudly, not decode corrupt pixels — the
    regression the r8 decoder had (DRI fell through the generic
    segment skip and restarts were never consumed)."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    rgb = _gradient_rgb(48, 16)  # 3 MCUs, no restart markers
    enc = encode_color(48, 16, rgb.tobytes(), 80)
    dri = b"\xff\xdd\x00\x04\x00\x01"  # declare interval=1
    patched = enc[:2] + dri + enc[2:]
    with pytest.raises(ValueError, match="RST"):
        decode_color(patched)


def test_color_restart_marker_out_of_sequence_rejected():
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    rgb = _gradient_rgb(64, 32)  # 8 MCUs
    enc = encode_color(64, 32, rgb.tobytes(), 75, restart_interval=2)
    scan_at = enc.find(b"\xff\xda")
    for i in range(scan_at, len(enc) - 1):
        if enc[i] == 0xFF and enc[i + 1] == 0xD0:
            corrupted = enc[: i + 1] + bytes([0xD6]) + enc[i + 2 :]
            break
    with pytest.raises(ValueError, match="out of sequence"):
        decode_color(corrupted)


def test_color_foreign_component_ids_decode_by_sof_position():
    """Foreign encoders may number components 0/1/2 (the ids are
    arbitrary labels); the decoder must resolve by SOF position, not
    assume 1/2/3. Patch the ids consistently in SOF and SOS and the
    decode must be byte-identical."""
    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    rgb = _gradient_rgb(32, 32)
    enc = encode_color(32, 32, rgb.tobytes(), 85)
    want = decode_color(enc)
    b = bytearray(enc)
    sof = enc.find(b"\xff\xc0")
    sos = enc.find(b"\xff\xda")
    for ci in range(3):
        assert b[sof + 10 + 3 * ci] == ci + 1
        b[sof + 10 + 3 * ci] = ci        # 1/2/3 -> 0/1/2
        assert b[sos + 5 + 2 * ci] == ci + 1
        b[sos + 5 + 2 * ci] = ci
    assert decode_color(bytes(b)) == want


def test_color_sos_order_mismatch_rejected():
    """A scan listing components in a different order than the frame
    header is rejected with a clear message (interleaved baseline
    requires frame order), never decoded with swapped chroma."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    enc = encode_color(16, 16, _gradient_rgb(16, 16).tobytes(), 85)
    b = bytearray(enc)
    sos = enc.find(b"\xff\xda")
    # swap the Cb and Cr entries (id+table pairs) in the SOS header
    b[sos + 7 : sos + 9], b[sos + 9 : sos + 11] = (
        bytes(b[sos + 9 : sos + 11]),
        bytes(b[sos + 7 : sos + 9]),
    )
    with pytest.raises(ValueError, match="does not match SOF"):
        decode_color(bytes(b))


def test_sixteen_bit_quant_table_rejected():
    """A Pq=1 (16-bit) DQT is not baseline; parsing it as 8-bit would
    corrupt the table values AND the offset of any following table in
    the same segment — both decoders must reject it up front."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import decode_color, encode_color

    enc = encode_color(16, 16, _gradient_rgb(16, 16).tobytes(), 85)
    b = bytearray(enc)
    dqt = enc.find(b"\xff\xdb")
    assert b[dqt + 4] == 0x00
    b[dqt + 4] = 0x10  # Pq=1, Tq=0
    with pytest.raises(ValueError, match="Pq=0"):
        decode_color(bytes(b))

    g = bytearray(encode_gray(16, 16, bytes(range(256)), 85))
    gq = bytes(g).find(b"\xff\xdb")
    g[gq + 4] = 0x10
    with pytest.raises(ValueError, match="Pq=0"):
        decode_gray(bytes(g))


def test_progressive_bit_exact_across_band_splits():
    """Spectral selection re-frames the SAME quantized coefficients,
    so every band tiling must decode bit-identically to the baseline
    round-trip — including non-multiple-of-8 dims."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(37, 51), dtype=np.uint8)
    base = decode_gray(encode_gray(51, 37, img.tobytes(), 80))[2]
    for bands in (
        ((1, 63),),
        ((1, 5), (6, 63)),
        ((1, 1), (2, 9), (10, 35), (36, 63)),
    ):
        enc = encode_gray_progressive(51, 37, img.tobytes(), 80, bands)
        w, h, dec = decode_gray_progressive(enc)
        assert (w, h) == (51, 37)
        assert dec == base, bands
        assert enc[:2] == b"\xff\xd8" and b"\xff\xc2" in enc


def test_progressive_rejects_bad_bands_and_wrong_decoder():
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    img = bytes(range(256))
    with pytest.raises(ValueError, match="tile 1..63"):
        encode_gray_progressive(16, 16, img, 75, bands=((1, 5), (7, 63)))
    with pytest.raises(ValueError, match="end at coefficient 63"):
        encode_gray_progressive(16, 16, img, 75, bands=((1, 40),))
    # baseline stream -> progressive decoder rejects by SOF
    with pytest.raises(ValueError, match="SOF2 only"):
        decode_gray_progressive(encode_gray(16, 16, img, 75))
    # progressive stream -> baseline decoder rejects by SOF
    with pytest.raises(ValueError, match="SOF2"):
        decode_gray(encode_gray_progressive(16, 16, img, 75))


def test_progressive_general_eobn_run_decodes():
    """Our encoder only emits EOB0, but T.81 G.1.2.2 allows EOB runs
    spanning up to 2^14 blocks with a custom Huffman table. Craft a
    stream whose single AC scan covers four all-zero-AC blocks with
    ONE EOB2 symbol (run of 4) under a custom DHT — the general
    eobrun path a foreign progressive encoder exercises."""
    import struct

    from sftp_data_ingestion_spark.ext.jpeg import (
        _DC_BITS,
        _DC_VALS,
        _ZIGZAG,
        _quant_table,
        decode_gray_progressive,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    qt = _quant_table(75)
    zz_q = bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])
    # 32x8 flat-128 image = 4 blocks; every coefficient quantizes to 0
    sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    # custom AC table: symbol 0x20 (EOB2) with a 1-bit code '0'
    ac_bits = [1] + [0] * 15
    dht_ac = seg(0xC4, b"\x10" + bytes(ac_bits) + bytes([0x20]))
    # DC scan: 4 blocks x (category 0) — std DC code for 0 is '00'
    # (2 bits) -> 8 bits total = 0b00000000
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes([0x00])
    # AC scan: ONE EOB2 symbol = bit '0', 1-padded to 0b01111111
    sos_ac = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes([0x7F])
    stream = (
        b"\xff\xd8" + seg(0xDB, b"\x00" + zz_q) + sof + dht_dc + dht_ac
        + sos_dc + sos_ac + b"\xff\xd9"
    )
    w, h, pix = decode_gray_progressive(stream)
    assert (w, h) == (32, 8)
    assert pix == bytes([128]) * (32 * 8)


def test_progressive_truncated_dri_and_undefined_tables():
    """r9 ADVICE: malformed foreign streams must fail with ValueError
    on every path — a truncated DRI body (<2 bytes) and scans that
    reference Huffman tables no DHT defined previously leaked
    struct.error / KeyError."""
    import struct

    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        _DC_BITS,
        _DC_VALS,
        _ZIGZAG,
        _quant_table,
        decode_gray_progressive,
        encode_gray_progressive,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    # Truncated DRI: splice a 1-byte-body DRI right after SOI.
    enc = encode_gray_progressive(16, 16, bytes(range(256)), 75)
    bad = enc[:2] + seg(0xDD, b"\x00") + enc[2:]
    with pytest.raises(ValueError, match="truncated DRI"):
        decode_gray_progressive(bad)

    qt = _quant_table(75)
    zz_q = bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])
    sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes([0x00])
    # AC scan referencing table 1 that no DHT defined
    sos_ac = seg(0xDA, bytes([1, 1, 0x01, 1, 63, 0])) + bytes([0x7F])
    stream = (
        b"\xff\xd8" + seg(0xDB, b"\x00" + zz_q) + sof + dht_dc
        + sos_dc + sos_ac + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="undefined AC Huffman"):
        decode_gray_progressive(stream)

    # DC scan referencing table 1 that no DHT defined
    sos_dc_bad = seg(0xDA, bytes([1, 1, 0x10, 0, 0, 0])) + bytes([0x00])
    stream = (
        b"\xff\xd8" + seg(0xDB, b"\x00" + zz_q) + sof + dht_dc
        + sos_dc_bad + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="undefined DC Huffman"):
        decode_gray_progressive(stream)


def test_progressive_zrl_beyond_band_rejected():
    """r9 ADVICE: a ZRL that pushes k past the scan band must fail
    loudly like the coefficient path does, not silently desync."""
    import struct

    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        _DC_BITS,
        _DC_VALS,
        _ZIGZAG,
        _quant_table,
        decode_gray_progressive,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    qt = _quant_table(75)
    zz_q = bytes([int(qt[r, c]) for (r, c) in _ZIGZAG])
    sof = seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    # custom AC table: ZRL symbol 0xF0 with a 1-bit code '0'
    ac_bits = [1] + [0] * 15
    dht_ac = seg(0xC4, b"\x10" + bytes(ac_bits) + bytes([0xF0]))
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes([0x00])
    # narrow band Ss=1..Se=5: a ZRL jumps k from 1 to 17 > 6
    sos_ac = seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0])) + bytes([0x7F])
    stream = (
        b"\xff\xd8" + seg(0xDB, b"\x00" + zz_q) + sof + dht_dc + dht_ac
        + sos_dc + sos_ac + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="ZRL run extends beyond"):
        decode_gray_progressive(stream)


def test_progressive_restart_interval_roundtrip_bit_exact():
    """SOF2 + DRI (the last codec-matrix cell): restart markers in
    every scan are framing only — decode must be BIT-IDENTICAL to the
    no-restart progressive decode AND to the baseline round-trip, for
    intervals that do and don't divide the block count."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 15 blocks
    base = decode_gray(encode_gray(40, 24, img.tobytes(), 80))[2]
    bands = ((1, 9), (10, 63))
    plain = decode_gray_progressive(
        encode_gray_progressive(40, 24, img.tobytes(), 80, bands)
    )[2]
    assert plain == base
    for interval in (1, 2, 4, 5, 15):
        enc = encode_gray_progressive(
            40, 24, img.tobytes(), 80, bands, restart_interval=interval
        )
        assert b"\xff\xdd" in enc  # DRI present
        if interval < 15:  # interval == n_blocks puts no boundary inside
            assert any(bytes([0xFF, 0xD0 + n]) in enc for n in range(8))
        w, h, dec = decode_gray_progressive(enc)
        assert (w, h) == (40, 24)
        assert dec == base, interval


def test_progressive_successive_approximation_bit_exact():
    """SA round-trips must be BIT-EXACT vs the baseline decode for
    every (dc_levels, ac_levels, restart_interval) combination: the
    point transforms drop low bits that the refinement scans must
    restore exactly — any error in the G.1.2.3 correction-bit walk
    breaks equality. Also pins that default levels (0,0) emit streams
    byte-identical in framing (all Ah=Al=0)."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(48, 56), dtype=np.uint8)
    base = decode_gray(encode_gray(56, 48, img.tobytes(), 80))[2]
    for dc, ac in [(1, 0), (0, 1), (1, 1), (2, 2), (3, 1)]:
        for ri in (0, 3):
            enc = encode_gray_progressive(
                56, 48, img.tobytes(), 80, ((1, 5), (6, 63)),
                restart_interval=ri, dc_levels=dc, ac_levels=ac,
            )
            w, h, dec = decode_gray_progressive(enc)
            assert (w, h) == (56, 48)
            assert dec == base, (dc, ac, ri)
    # a smooth gradient exercises long zero runs + EOB tails in the
    # refinement scans (dense random data rarely produces ZRLs there)
    grad = np.tile(
        np.linspace(0, 255, 56, dtype=np.uint8), (48, 1)
    )
    gbase = decode_gray(encode_gray(56, 48, grad.tobytes(), 40))[2]
    enc = encode_gray_progressive(
        56, 48, grad.tobytes(), 40, ((1, 63),), dc_levels=2, ac_levels=2
    )
    assert decode_gray_progressive(enc)[2] == gbase


def test_progressive_sa_refinement_guards():
    """Malformed SA streams must fail loudly: Ah != Al+1, and a
    refinement symbol with magnitude > 1."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    enc = bytearray(
        encode_gray_progressive(
            16, 16, img.tobytes(), 75, ((1, 63),), dc_levels=1
        )
    )
    # locate the DC refinement SOS (Ss=Se=0, AhAl=0x10) and corrupt
    # Ah to 3 (Al stays 0 -> Ah != Al+1)
    i = enc.index(bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0, 0, 0x10]))
    enc[i + 9] = 0x30
    with pytest.raises(ValueError, match="Ah = Al \\+ 1"):
        decode_gray_progressive(bytes(enc))

    # an AC refinement whose Huffman symbol decodes with s=2: splice
    # an AC-first scan's entropy data under a refinement SOS header
    full = encode_gray_progressive(
        16, 16, img.tobytes(), 75, ((1, 63),), ac_levels=1
    )
    # scans: DC first, AC first (Ss=1 Se=63 AhAl=0x01), AC refine
    # (AhAl=0x10); swap the refine scan's data for the first scan's
    hdr_first = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 1, 63, 0x01])
    hdr_ref = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 1, 63, 0x10])
    a = full.index(hdr_first)
    b = full.index(hdr_ref)
    first_data = full[a + len(hdr_first) : b]
    spliced = full[: b + len(hdr_ref)] + first_data + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_gray_progressive(spliced)


def test_color_progressive_bit_exact_grid():
    """Color progressive (single-component scans over per-component
    ceil-8 grids) must decode BIT-EXACT vs the baseline 4:2:0
    round-trip across dimension remainders (the luma-grid subtlety:
    dims with remainder 1..8 mod 16 drop the baseline's pad blocks),
    SA levels, and restart intervals."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_color,
        decode_color_progressive,
        encode_color,
        encode_color_progressive,
    )

    rng = np.random.default_rng(51)
    for (w, h) in [(32, 32), (40, 24), (18, 14), (50, 34)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = decode_color(encode_color(w, h, img.tobytes(), 80))[2]
        for dc, ac, ri in [(0, 0, 0), (1, 1, 0), (2, 2, 0), (1, 1, 2)]:
            enc = encode_color_progressive(
                w, h, img.tobytes(), 80, ((1, 5), (6, 63)), ri, dc, ac
            )
            ww, hh, dec = decode_color_progressive(enc)
            assert (ww, hh) == (w, h)
            assert dec == base, (w, h, dc, ac, ri)


def test_color_progressive_rejections():
    """Interleaved progressive scans and cross-decoder misuse must
    fail loudly."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_color_progressive,
        encode_color,
        encode_color_progressive,
    )

    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    # baseline stream relabeled SOF0 -> SOF2: its Ns=3 interleaved
    # scan is not a valid progressive color scan here
    enc = bytearray(encode_color(16, 16, img.tobytes(), 75))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="single-component"):
        decode_color_progressive(bytes(enc))
    # a progressive color stream is SOF2: the baseline color decoder
    # must hand it off loudly
    from sftp_data_ingestion_spark.ext.jpeg import decode_color

    penc = encode_color_progressive(16, 16, img.tobytes(), 75)
    with pytest.raises(ValueError, match="SOF"):
        decode_color(penc)


def test_progressive_dri_between_scans_is_per_scan():
    """T.81 allows DRI to be (re)defined BETWEEN scans, taking effect
    for FOLLOWING scans only. Splice a conforming stream whose DC
    scan has no restarts (interval 0 at its SOS) and whose AC scan
    carries DRI=2 restarts: the decoder must use the interval in
    effect AT EACH SCAN's SOS — a decoder that applies the post-parse
    global retroactively would demand RST markers inside the DC scan
    and reject/misdecode valid input."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)  # 15 blocks
    bands = ((1, 63),)  # exactly two scans: DC + one AC
    plain = encode_gray_progressive(40, 24, img.tobytes(), 80, bands)
    rst = encode_gray_progressive(
        40, 24, img.tobytes(), 80, bands, restart_interval=2
    )
    # entropy data is byte-stuffed (FF -> FF00) so a literal FFDA can
    # only be a real SOS marker; both encodes share identical
    # quantized coefficients (same quality/bands), so scans splice
    # coherently
    def sos_positions(buf):
        out, i = [], 0
        while True:
            i = buf.find(b"\xff\xda", i)
            if i < 0:
                return out
            out.append(i)
            i += 2

    p_plain = sos_positions(plain)
    p_rst = sos_positions(rst)
    assert len(p_plain) == len(p_rst) == 2
    dri = b"\xff\xdd\x00\x04\x00\x02"  # DRI, interval 2
    spliced = plain[: p_plain[1]] + dri + rst[p_rst[1] :]
    base = decode_gray(encode_gray(40, 24, img.tobytes(), 80))[2]
    w, h, dec = decode_gray_progressive(spliced)
    assert (w, h) == (40, 24)
    assert dec == base


def test_progressive_restart_marker_out_of_sequence_rejected():
    """A swapped RST number in a progressive scan must fail loudly,
    same contract as the baseline decoder."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_gray_progressive,
        encode_gray_progressive,
    )

    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    enc = bytearray(
        encode_gray_progressive(
            32, 32, img.tobytes(), 75, ((1, 63),), restart_interval=2
        )
    )
    # find the first RST0 and bump it to RST1
    i = enc.index(bytes([0xFF, 0xD0]))
    enc[i + 1] = 0xD1
    with pytest.raises(ValueError, match="out of sequence"):
        decode_gray_progressive(bytes(enc))


def test_color_progressive_interleaved_dc_bit_exact():
    """The Ns=3 MCU-ordered DC framing real progressive files use:
    interleaved DC first + refinement scans (per-component
    predictors, restarts in MCUs, pad-block discard on the luma
    MCU-16 grid) must decode BIT-EXACT vs the baseline — including
    dimension remainders where the interleaved luma grid carries pad
    blocks the non-interleaved AC grid lacks."""
    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_color,
        decode_color_progressive,
        encode_color,
        encode_color_progressive,
    )

    rng = np.random.default_rng(53)
    for (w, h) in [(32, 32), (18, 14), (50, 34)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = decode_color(encode_color(w, h, img.tobytes(), 80))[2]
        for dc, ac, ri in [(0, 0, 0), (1, 1, 0), (2, 1, 2)]:
            enc = encode_color_progressive(
                w, h, img.tobytes(), 80, ((1, 5), (6, 63)), ri, dc, ac,
                interleaved_dc=True,
            )
            assert decode_color_progressive(enc)[2] == base, (w, h, dc, ac, ri)


def test_color_progressive_interleaved_ac_rejected():
    """An Ns=3 scan with a nonzero spectral band is illegal
    (T.81 G.1.1.1: interleaved progressive scans are DC-only)."""
    import pytest

    from sftp_data_ingestion_spark.ext.jpeg import (
        decode_color_progressive,
        encode_color_progressive,
    )

    rng = np.random.default_rng(54)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    enc = bytearray(
        encode_color_progressive(
            16, 16, img.tobytes(), 75, interleaved_dc=True
        )
    )
    # the interleaved DC SOS: Ns=3 header is FFDA 000C 03 ...; set
    # its Ss byte (offset 7 within the component list + 3) to 1
    i = enc.index(bytes([0xFF, 0xDA, 0x00, 0x0C, 0x03]))
    enc[i + 11] = 1  # Ss
    with pytest.raises(ValueError, match="DC only|single-component"):
        decode_color_progressive(bytes(enc))
