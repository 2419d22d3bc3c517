"""Pure-stdlib WAV (RIFF/PCM) codec for the audio modality.

Same role as the PNG/JPEG codecs beside it (`binary.py`, `jpeg.py`):
a REAL container parse behind the multimodal pipeline, so the Spark
plumbing (binary column → Arrow batch → decode → stats) runs against
genuine bytes rather than a faked metadata row. Scope is the honest
baseline: canonical RIFF framing, PCM16 (format code 1) at any
channel count/sample rate, plus the two G.711 companded codings —
µ-law (format 7) and A-law (format 6) — decoded with the public ITU
segment/mantissa integer formulas (the same expansion CPython's old
audioop shipped), exact to the LSB and therefore fully
DuckDB-oracle-checkable. Genuinely compressed codings (ADPCM, MP3,
float32) raise NotImplementedError — a deployment binds a real audio
library for those; corrupt framing raises ValueError.

Reference parity note: the reference engine has no audio surface at
all (SURVEY.md §2) — this is north-star scope for a multimodal
training-data pipeline.
"""

from __future__ import annotations

import struct

#: (sample_rate, channels, n_frames, samples) — samples interleaved.
WavData = tuple[int, int, int, list[int]]


def encode_wav(samples: list[int], sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE with one PCM16 data chunk.

    `samples` are interleaved int16 values (len must divide channels).
    """
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must divide channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mulaw_to_linear(b: int) -> int:
    """G.711 µ-law byte → linear int16 (ITU expansion, exact): the
    stored byte is the one's complement of sign|segment|mantissa;
    linear = ±(((mant<<3)+132)<<seg) − 132. Pure integers — the
    registry oracle replays this expression verbatim in SQL."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if u & 0x80 else t - 0x84


def alaw_to_linear(b: int) -> int:
    """G.711 A-law byte → linear int16 (ITU expansion, exact): byte is
    XOR 0x55; seg 0 → (mant<<4)+8, else ((mant<<4)+0x108)<<(seg−1);
    sign bit SET means positive in A-law. Pure integers, SQL-mirrored
    in the registry oracle."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def encode_wav_g711(codes: list[int], sample_rate: int = 8000,
                    channels: int = 1, law: str = "mulaw") -> bytes:
    """RIFF/WAVE with format code 7 (µ-law) or 6 (A-law), 8 bits per
    sample, carrying `codes` verbatim as the companded data bytes.
    Test/oracle corpora generate the CODE bytes deterministically and
    let `decode_wav` expand them — encoding (compression) never needs
    an oracle that way."""
    if channels < 1 or len(codes) % channels:
        raise ValueError("sample count must divide channel count")
    if any(not 0 <= c <= 255 for c in codes):
        raise ValueError("G.711 codes are single bytes")
    fmt_code = {"mulaw": 7, "alaw": 6}[law]
    data = bytes(codes)
    byte_rate = sample_rate * channels
    fmt = struct.pack("<HHIIHH", fmt_code, channels, sample_rate,
                      byte_rate, channels, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> WavData:
    """Parse RIFF framing; return (sample_rate, channels, n_frames,
    interleaved int16 samples). PCM16 only — the honest gate.

    Framing is validated strictly, not permissively: the declared RIFF
    length must match the payload (one optional final pad byte), every
    chunk must fit inside it, duplicate fmt/data chunks are rejected
    (a second data chunk silently replacing the first is corrupt
    framing, not a feature), and leftover bytes too short to be a
    chunk header raise instead of being dropped."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    end = 8 + riff_len
    if riff_len < 4 or end > len(payload):
        raise ValueError("RIFF length field exceeds payload")
    if len(payload) - end > 1:  # odd-length RIFF may carry one pad byte
        raise ValueError("trailing bytes after RIFF structure")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > end:
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("duplicate fmt chunk")
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk")
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if pos < end:
        raise ValueError("trailing bytes are not a RIFF chunk")
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format not in (1, 6, 7):
        raise NotImplementedError(
            f"WAV format code {audio_format} needs an audio codec "
            "library; PCM (1), A-law (6) and mu-law (7) are decoded "
            "here")
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    if audio_format in (6, 7):
        if bits != 8:
            raise ValueError("G.711 coding requires 8 bits per sample")
        expand = mulaw_to_linear if audio_format == 7 else alaw_to_linear
        samples = [expand(b) for b in data]
        if len(samples) % channels:
            raise ValueError("PCM data not frame-aligned")
        return sample_rate, channels, len(samples) // channels, samples
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM unsupported (16 only)")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[:n * 2]))
    if n % channels:
        raise ValueError("PCM data not frame-aligned")
    return sample_rate, channels, n // channels, samples
