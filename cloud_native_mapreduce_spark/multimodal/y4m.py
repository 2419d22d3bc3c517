"""Pure-stdlib YUV4MPEG2 (.y4m) codec for the video modality.

Completes the real-container trio beside PNG (`binary.py`), JPEG
(`jpeg.py`) and WAV (`wav.py`): Y4M is the standard UNCOMPRESSED video
interchange format (ffmpeg/mplayer `-f yuv4mpegpipe`) — a text stream
header, then one `FRAME\\n` marker + raw planes per frame. That makes
it the honest stdlib-parseable baseline for video exactly as PCM-WAV
is for audio: real framing, real multi-frame payloads, zero codec
library. Compressed video (H.264, VP9, …) stays gated behind
NotImplementedError at the dispatch layer; corrupt framing raises
ValueError.

Scope: `Cmono` (luma-only) and `C420`-family (4:2:0) colorspaces; for
4:2:0 the decoder returns the luma plane and skips chroma (the stats
surface downstream is luma-based). Other colorspaces raise
NotImplementedError.

The reference engine has no video surface (SURVEY.md §2) — north-star
scope for a multimodal training-data pipeline.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"

#: (width, height, fps_num, fps_den, luma_frames)
Y4mData = tuple[int, int, int, int, list[bytes]]


def encode_y4m(frames: list[bytes], width: int, height: int,
               fps: tuple[int, int] = (25, 1),
               colorspace: str = "mono") -> bytes:
    """Canonical Y4M stream. `frames` are luma planes (width*height
    bytes each); for C420 the two quarter-size chroma planes are
    emitted as neutral 128s."""
    if colorspace not in ("mono", "420jpeg"):
        raise ValueError(f"unsupported encode colorspace {colorspace}")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("luma plane size must be width*height")
    head = (f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
            f"Ip A1:1 C{colorspace}\n").encode("ascii")
    chroma = b""
    if colorspace == "420jpeg":
        chroma = b"\x80" * ((width // 2) * (height // 2) * 2)
    return head + b"".join(b"FRAME\n" + f + chroma for f in frames)


def decode_y4m(payload: bytes) -> Y4mData:
    """Parse the stream header + every FRAME; return luma planes."""
    if not payload.startswith(MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"  # the Y4M default when C is absent
    for tag in payload[len(MAGIC) + 1:nl].decode("ascii").split():
        key, val = tag[0], tag[1:]
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif key == "C":
            colorspace = val
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if colorspace == "mono":
        frame_len = width * height
    elif colorspace.startswith("420"):
        frame_len = width * height + (width // 2) * (height // 2) * 2
    else:
        raise NotImplementedError(
            f"Y4M colorspace C{colorspace} needs a pixel-format library; "
            "mono and 420 are decoded here")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(payload):
        marker_end = payload.find(b"\n", pos)
        if not payload.startswith(b"FRAME", pos) or marker_end < 0:
            raise ValueError("corrupt FRAME marker")
        body = payload[marker_end + 1:marker_end + 1 + frame_len]
        if len(body) < frame_len:
            raise ValueError("truncated Y4M frame")
        frames.append(body[:width * height])  # luma plane only
        pos = marker_end + 1 + frame_len
    return width, height, fps_num, fps_den, frames
