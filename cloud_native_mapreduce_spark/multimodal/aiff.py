"""Pure-stdlib AIFF (IFF / big-endian PCM16) codec — the audio
container Apple shipped in 1988 and DAWs still emit, and the
eleventh from-scratch format in the multimodal family (beside
`wav.py`'s RIFF, which is little-endian with a plain u32 sample
rate). AIFF's two genuinely distinct parsing problems, both solved
exactly here:

  * the COMM chunk stores the sample rate as an IEEE 754 80-bit
    EXTENDED float (1 sign + 15 exponent + 64 explicit-one mantissa
    bits — x87's temporary-real, Apple Numerics' choice). Integer
    rates decode EXACTLY by pure bit arithmetic (mantissa shifted by
    exp − 16383 − 63); non-integer rates raise the honest
    NotImplementedError gate rather than a lossy float round-trip.
  * IFF chunk framing: big-endian sizes, ODD-sized chunks padded to
    even WITHOUT the pad counted in the size field, and SSND's
    leading offset/blockSize u32 pair before the sample data.

Scope is the honest baseline (the `wav.py` posture): canonical FORM/
AIFF with one COMM + one SSND, PCM16 big-endian at any channel
count/rate. AIFC (compressed variants: 'fl32', 'ima4', µ/A-law under
the AIFC extension) raises NotImplementedError naming the coding;
corrupt framing raises ValueError.

Reference parity note: the reference engine has no audio surface at
all (SURVEY.md §2) — north-star scope for a multimodal pipeline.
"""

from __future__ import annotations

import struct

#: (sample_rate, channels, n_frames, samples) — samples interleaved.
AiffData = tuple[int, int, int, list[int]]


def encode_extended80(value: int) -> bytes:
    """Positive integer → 10-byte IEEE 754 extended float, exact.

    Normalized form: exponent 16383 + ⌊log₂ v⌋, 64-bit mantissa with
    the integer bit EXPLICIT (bit 63 set) — the layout CoreAudio and
    every AIFF writer emits for sample rates."""
    if value <= 0:
        raise ValueError("sample rate must be positive")
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def decode_extended80(b: bytes) -> int:
    """10-byte extended float → exact positive integer sample rate.

    Pure bit arithmetic: v = mant · 2^(exp − 16383 − 63). A fractional
    rate (low mantissa bits lost by the shift) is NotImplementedError —
    the decoder refuses to round rather than lie by up to half a Hz."""
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000:
        raise ValueError("negative sample rate")
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        raise ValueError("zero sample rate")
    if exp == 0x7FFF:
        raise ValueError("inf/nan sample rate")
    shift = exp - 16383 - 63
    if shift >= 0:
        return mant << shift
    if mant & ((1 << -shift) - 1):
        raise NotImplementedError(
            "non-integer AIFF sample rate (fractional extended float)")
    return mant >> -shift


def encode_aiff(samples: list[int], sample_rate: int = 11025,
                channels: int = 1) -> bytes:
    """Canonical FORM/AIFF with one COMM and one SSND chunk.

    `samples` are interleaved int16 values (len must divide channels);
    data is big-endian PCM16, SSND offset/blockSize zero."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must divide channel count")
    n_frames = len(samples) // channels
    comm = (struct.pack(">hLh", channels, n_frames, 16)
            + encode_extended80(sample_rate))
    data = struct.pack(f">{len(samples)}h", *samples)
    ssnd = struct.pack(">LL", 0, 0) + data

    def chunk(tag: bytes, body: bytes) -> bytes:
        # IFF: size excludes the pad byte; odd bodies pad to even
        return (tag + struct.pack(">L", len(body)) + body
                + (b"\x00" if len(body) % 2 else b""))

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> AiffData:
    """FORM/AIFF → (sample_rate, channels, n_frames, samples).

    Walks the IFF chunk list (big-endian sizes, even-padding rule),
    requires COMM before interpreting SSND, 16-bit PCM only (other
    depths and the AIFC form type raise NotImplementedError naming
    the variant); short/corrupt framing raises ValueError."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not an IFF FORM")
    form_size = struct.unpack(">L", payload[4:8])[0]
    if form_size + 8 > len(payload):
        raise ValueError("truncated FORM")
    form_type = payload[8:12]
    if form_type == b"AIFC":
        raise NotImplementedError("AIFC compressed form")
    if form_type != b"AIFF":
        raise ValueError(f"not an AIFF form: {form_type!r}")
    pos, end = 12, 8 + form_size
    comm = None
    sound = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack(">L", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"COMM":
            if size < 18:
                raise ValueError("short COMM chunk")
            channels, n_frames, bits = struct.unpack(">hLh", body[:8])
            if channels < 1:
                raise ValueError("bad channel count")
            if bits != 16:
                raise NotImplementedError(
                    f"{bits}-bit AIFF samples (PCM16 only)")
            rate = decode_extended80(body[8:18])
            comm = (rate, channels, n_frames)
        elif tag == b"SSND":
            if size < 8:
                raise ValueError("short SSND chunk")
            offset, _block = struct.unpack(">LL", body[:8])
            if 8 + offset > size:
                raise ValueError("SSND offset past chunk end")
            sound = body[8 + offset:]
        pos += 8 + size + (size % 2)  # pad byte not counted in size
    if comm is None:
        raise ValueError("missing COMM chunk")
    if sound is None:
        raise ValueError("missing SSND chunk")
    rate, channels, n_frames = comm
    need = n_frames * channels * 2
    if len(sound) < need:
        raise ValueError("SSND shorter than COMM frame count")
    samples = list(struct.unpack(f">{n_frames * channels}h",
                                 sound[:need]))
    return rate, channels, n_frames, samples
