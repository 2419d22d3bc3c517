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
DuckDB-oracle-checkable — plus mono IMA/DVI ADPCM (format 0x11),
a genuinely COMPRESSED coding decoded with the public IMA step-table
state machine (and a real encoder for roundtrip tests); its oracle
replays the state machine with a recursive CTE — and IEEE float32 PCM (format
3), converted to int16 with an explicit engine-statable half-up rule.
Remaining codings (stereo ADPCM interleave, MP3) raise
NotImplementedError — a deployment binds a real audio library;
corrupt framing raises ValueError.

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
    interleaved int16 samples). PCM16, float32 PCM, G.711
    µ-law/A-law, and mono IMA ADPCM are decoded; other codings keep
    the honest gate.

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
    fmt_body = b""
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
            fmt_body = body
        elif cid == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk")
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if pos < end:
        raise ValueError("trailing bytes are not a RIFF chunk")
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format not in (1, 3, 6, 7, 0x11):
        raise NotImplementedError(
            f"WAV format code {audio_format} needs an audio codec "
            "library; PCM (1), float PCM (3), A-law (6), mu-law (7) "
            "and IMA ADPCM (17) are decoded here")
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    if audio_format == 3:
        # IEEE float32 PCM (format 3): decode to int16 with the
        # explicit half-up rule floor(f·32767 + 0.5) and clamp — an
        # integer-statable convention both engines replay exactly (a
        # bare round() would hit Python's banker's ties)
        if bits != 32:
            raise NotImplementedError(
                f"{bits}-bit float PCM unsupported (32 only)")
        n = len(data) // 4
        if n % channels:
            raise ValueError("PCM data not frame-aligned")
        import math
        floats = struct.unpack(f"<{n}f", data[:n * 4])
        samples = [max(-32768, min(32767,
                                   math.floor(f * 32767.0 + 0.5)))
                   for f in floats]
        return sample_rate, channels, n // channels, samples
    if audio_format == 0x11:
        if channels != 1:
            raise NotImplementedError(
                "stereo IMA ADPCM channel interleaving unsupported "
                "(mono only)")
        if bits != 4:
            raise ValueError("IMA ADPCM requires 4 bits per sample")
        if block_align < 5 or len(data) % block_align:
            raise ValueError("IMA ADPCM data not block-aligned")
        spb = 1 + (block_align - 4) * 2
        if len(fmt_body) >= 20:
            (declared_spb,) = struct.unpack_from("<H", fmt_body, 18)
            if declared_spb != spb:
                raise ValueError("IMA samples/block does not match "
                                 "block align")
        samples = []
        for off in range(0, len(data), block_align):
            pred, idx, _rsvd = struct.unpack_from("<hBB", data, off)
            if idx > 88:
                raise ValueError("IMA step index out of range")
            samples.extend(ima_decode_block(
                pred, idx, data[off + 4:off + block_align]))
        return sample_rate, 1, len(samples), samples
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


#: IMA/DVI ADPCM tables (public IMA spec) — 89-entry step-size table
#: and the 3-bit index-adjust table.
IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, n: int) -> tuple[int, int]:
    """ONE IMA state-machine step shared by encoder and decoder —
    lockstep by construction, not by duplicated arithmetic: apply
    nibble `n` to (predictor, step index) and return the new state."""
    step = IMA_STEPS[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX[n & 7]))
    return pred, idx


def ima_decode_block(pred: int, idx: int, data: bytes) -> list[int]:
    """IMA ADPCM block decode (mono): header predictor/index + nibble
    stream (low nibble first) → linear int16 samples, header sample
    included. Pure integers, the exact IMA expansion — the registry
    oracle replays this state machine with a recursive CTE."""
    out = [pred]
    for b in data:
        for n in (b & 0x0F, b >> 4):
            pred, idx = _ima_step(pred, idx, n)
            out.append(pred)
    return out


def ima_encode(samples: list[int], pred: int | None = None,
               idx: int = 0) -> tuple[int, int, bytes]:
    """IMA ADPCM mono encoder (the standard quantize-and-track loop):
    returns (header predictor, header index, nibble bytes). The first
    sample becomes the block header; len(samples) must be odd so the
    nibble stream pairs up. Used by the roundtrip quality test; the
    oracle corpus carries deterministic RAW nibbles instead so only the
    decoder needs an SQL replay."""
    if len(samples) % 2 == 0:
        raise ValueError("IMA block needs an odd sample count "
                         "(header + 2 per byte)")
    pred = samples[0] if pred is None else pred
    hdr_pred, hdr_idx = pred, idx
    nibs = []
    for s in samples[1:]:
        step = IMA_STEPS[idx]
        delta = s - pred
        n = 0
        if delta < 0:
            n = 8
            delta = -delta
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        # the decoder's own transition keeps encode/decode in lockstep
        pred, idx = _ima_step(pred, idx, n)
        nibs.append(n)
    data = bytes(nibs[i] | (nibs[i + 1] << 4)
                 for i in range(0, len(nibs), 2))
    return hdr_pred, hdr_idx, data


def encode_wav_ima(pred: int, idx: int, data: bytes,
                   sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE container for ONE mono IMA ADPCM block (format 0x11,
    4 bits/sample): 4-byte block header (predictor int16, step index,
    reserved) + nibble data. samples/block rides in the fmt extension
    as the spec requires."""
    if not -32768 <= pred <= 32767 or not 0 <= idx <= 88:
        raise ValueError("invalid IMA block header state")
    block = struct.pack("<hBB", pred, idx, 0) + data
    spb = 1 + len(data) * 2
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate,
                      sample_rate * len(block) // spb or 1,
                      len(block), 4, 2, spb)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(block)) + block)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float32(values: list[float], sample_rate: int = 8000,
                       channels: int = 1) -> bytes:
    """RIFF/WAVE with IEEE float32 PCM (format 3). `values` are raw
    float samples in [-1, 1]; the oracle corpora use exactly-
    representable fractions (k/64) so the float32 payload and its
    int16 conversion are engine-exact."""
    if channels < 1 or len(values) % channels:
        raise ValueError("sample count must divide channel count")
    data = struct.pack(f"<{len(values)}f", *values)
    byte_rate = sample_rate * channels * 4
    fmt = struct.pack("<HHIIHH", 3, channels, sample_rate, byte_rate,
                      channels * 4, 32)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body
