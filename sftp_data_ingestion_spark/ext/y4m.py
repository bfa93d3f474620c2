"""YUV4MPEG2 (Y4M) video container — the real uncompressed format
ffmpeg pipes rawvideo through — implemented stdlib-only, making the
VIDEO arm of the multimodal family a real codec path (mono/grayscale
planes), not just a libav gate: BMP/PNG lossless images, WAV PCM
audio, JPEG lossy, and now Y4M video.

Format (public spec): one ASCII header line
``YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 Cmono\n`` followed by
``FRAME\n`` + plane bytes per frame (Cmono = Y plane only, w*h
bytes). Lossless, so — unlike JPEG — frame sampling through the real
decoder is gradeable EXACTLY: the oracle replays the byte arithmetic
on the source text, same pattern as m_png_decode_histogram.
"""

from __future__ import annotations


def encode_y4m(
    width: int, height: int, frames: list[bytes], fps: int = 1
) -> bytes:
    """Encode grayscale frames (each ``width*height`` Y bytes) as a
    Cmono Y4M stream."""
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size does not match dimensions")
    head = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 Cmono\n"
    out = bytearray(head.encode("ascii"))
    for f in frames:
        out += b"FRAME\n"
        out += f
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a Cmono Y4M stream -> (width, height, fps_num, frames)."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii")
    parts = head.split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = fps = None
    fmt = "420"  # spec default when C is absent
    for p in parts[1:]:
        if p.startswith("W"):
            width = int(p[1:])
        elif p.startswith("H"):
            height = int(p[1:])
        elif p.startswith("F"):
            fps = int(p[1:].split(":")[0])
        elif p.startswith("C"):
            fmt = p[1:]
    if width is None or height is None:
        raise ValueError("missing dimensions in Y4M header")
    if fmt != "mono":
        raise ValueError(f"only Cmono supported (stream is C{fmt})")
    frame_len = width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("FRAME marker expected")
        pos = fnl + 1
        frames.append(payload[pos : pos + frame_len])
        if len(frames[-1]) != frame_len:
            raise ValueError("truncated frame")
        pos += frame_len
    return width, height, fps or 0, frames


def text_y4m_frame_sample(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    side: int = 16,
    n_frames: int = 3,
    every_n: int = 2,
):
    """Arrow-batched real-codec frame sampling: each document's text
    bytes tile ``n_frames`` grayscale frames (frame f pixel i = text
    byte (f*side*side + i) mod len), encoded as a Cmono Y4M stream
    and decoded back by the PRODUCTION parser in the same task; every
    ``every_n``-th frame is sampled and its luma sum emitted. The
    container is lossless, so the oracle replays the exact byte
    arithmetic on the text (ASCII fixture: byte == char) — the video
    analogue of the PNG round-trip query."""

    n_px = side * side

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or " ").encode("utf-8")
                frames = []
                for f in range(n_frames):
                    frames.append(
                        bytes(
                            b[(f * n_px + i) % len(b)] for i in range(n_px)
                        )
                    )
                enc = encode_y4m(side, side, frames, fps=1)
                w, h, _fps, dec = decode_y4m(enc)
                for k in range(0, len(dec), every_n):
                    out.append(
                        (did, k, w * h, sum(dec[k]))
                    )
            yield pd.DataFrame(
                out,
                columns=[id_col, "frame_idx", "n_px", "luma_sum"],
            )

    schema = f"{id_col} long, frame_idx int, n_px long, luma_sum long"
    return df.select(id_col, text_col).mapInPandas(kernel, schema)
