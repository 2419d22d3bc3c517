"""WAV codec correctness: RIFF round-trip, framing errors, honest gates
for codings that genuinely need an audio library."""

from __future__ import annotations

import struct

import pytest

from cloud_native_mapreduce_spark.multimodal.wav import (decode_wav,
                                                         encode_wav)


def test_roundtrip_mono_and_stereo():
    mono = [((i * 7) % 2001) - 1000 for i in range(320)]
    rate, ch, nf, got = decode_wav(encode_wav(mono, 8000, 1))
    assert (rate, ch, nf) == (8000, 1, 320)
    assert got == mono
    inter = [s for s in mono for _ in range(2)]
    rate, ch, nf, got = decode_wav(encode_wav(inter, 44100, 2))
    assert (rate, ch, nf) == (44100, 2, 320)
    assert got == inter


def test_extreme_samples_survive():
    edge = [32767, -32768, 0, -1, 1]
    assert decode_wav(encode_wav(edge, 16000, 1))[3] == edge


def test_framing_errors_raise_value_error():
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")  # wrong form type
    with pytest.raises(ValueError):
        decode_wav(encode_wav([1, 2, 3], 8000, 1)[:20])  # truncated
    with pytest.raises(ValueError):
        encode_wav([1, 2, 3], 8000, 2)  # frame-misaligned input


def test_non_pcm_stays_honestly_gated():
    payload = bytearray(encode_wav([1, 2, 3, 4], 8000, 1))
    # format code lives right after 'fmt '+len; rewrite PCM(1) to
    # MS ADPCM (2) — a coding that genuinely stays gated
    i = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, i, 2)
    with pytest.raises(NotImplementedError, match="format code 2"):
        decode_wav(bytes(payload))
    # float PCM is decoded now, but only at 32 bits — declaring float
    # with the original 16-bit field is malformed-precision, not PCM16
    struct.pack_into("<H", payload, i, 3)
    with pytest.raises(NotImplementedError, match="32 only"):
        decode_wav(bytes(payload))


def test_wav_pipeline_end_to_end(spark, sf_dir):
    """payload really crosses Spark as binary; stats rows 1:1 with docs;
    the stereo branch decodes with per-frame stats equal to its mono
    twin waveform."""
    from cloud_native_mapreduce_spark.multimodal import binary
    from cloud_native_mapreduce_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    with_wav = binary.wav_payloads(docs)
    assert dict(with_wav.dtypes)["payload"] == "binary"
    stats = binary.audio_decode_stats(with_wav)
    assert stats.count() == docs.count()
    row = stats.where(stats.doc_id == 0).collect()[0]
    assert row["channels"] == 2  # doc 0 is the stereo branch
    assert row["n_frames"] == 800
    assert row["duration_ms"] == 100
    # doc 0: k=1 -> samples are (i % 2001) - 1000 for i < 800
    assert row["peak"] == 1000
    assert row["total_abs"] == sum(abs((i % 2001) - 1000)
                                   for i in range(800))


def test_corrupt_riff_framing_rejected():
    """Strict framing (round-8 advice): declared RIFF length must match,
    duplicate chunks are corrupt, and sub-header trailing bytes raise
    instead of being silently dropped."""
    good = encode_wav([1, 2, 3, 4], 8000, 1)
    # RIFF length field larger than the payload
    bad = bytearray(good)
    struct.pack_into("<I", bad, 4, len(good))  # claims 8 extra bytes
    with pytest.raises(ValueError, match="RIFF length"):
        decode_wav(bytes(bad))
    # more than a pad byte after the declared RIFF extent
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_wav(good + b"xx")
    # a second data chunk may not silently replace the first
    extra = b"data" + struct.pack("<I", 4) + struct.pack("<2h", 9, 9)
    dup = bytearray(good + extra)
    struct.pack_into("<I", dup, 4, len(good) - 8 + len(extra))
    with pytest.raises(ValueError, match="duplicate data"):
        decode_wav(bytes(dup))
    # leftover bytes inside the extent too short to be a chunk header
    tail = bytearray(good + b"abc")
    struct.pack_into("<I", tail, 4, len(good) - 8 + 3)
    with pytest.raises(ValueError, match="not a RIFF chunk"):
        decode_wav(bytes(tail))


def test_duration_uses_decoded_sample_rate(spark):
    """duration_ms must divide by each payload's own sample_rate
    (round-8 advice: a hardcoded 8 kHz divisor mis-times any other
    rate encode_wav happily produces)."""
    import pandas as pd

    from cloud_native_mapreduce_spark.multimodal import binary
    payloads = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "payload": [encode_wav([0] * 1600, 16000, 1),
                    encode_wav([0] * 800, 8000, 1),
                    encode_wav([0] * 1000, 16000, 1)],
    })
    df = spark.createDataFrame(payloads)
    rows = {r["doc_id"]: r
            for r in binary.audio_decode_stats(df).collect()}
    assert rows[0]["sample_rate"] == 16000
    assert rows[0]["duration_ms"] == 100   # 1600 frames @ 16 kHz
    assert rows[1]["duration_ms"] == 100   # 800 frames @ 8 kHz
    # fractional ms floors (62.5 -> 62) — the explicit-floor contract
    # both engines share; a bare BIGINT cast rounds in DuckDB
    assert rows[2]["duration_ms"] == 62


def test_g711_expansion_reference_values():
    """ITU G.711 expansion spot values matching the published
    audioop/ITU tables: mu-law 0xFF and 0x7F are the two zero codes,
    0x00/0x80 are the extremes at -/+32124; A-law 0x55 -> -8,
    0xD5 -> +8 (sign bit SET is positive in A-law), 0x2A/0xAA are the
    extremes at -/+32256."""
    from cloud_native_mapreduce_spark.multimodal.wav import (alaw_to_linear,
                                                             mulaw_to_linear)
    assert mulaw_to_linear(0xFF) == 0
    assert mulaw_to_linear(0x7F) == 0
    assert mulaw_to_linear(0x00) == -32124
    assert mulaw_to_linear(0x80) == 32124
    assert alaw_to_linear(0x55) == -8
    assert alaw_to_linear(0xD5) == 8
    assert alaw_to_linear(0x2A) == -32256
    assert alaw_to_linear(0xAA) == 32256


def test_g711_wav_roundtrip_and_gate():
    """format-7/6 payloads decode to the formula expansion of their
    code bytes; float PCM stays honestly gated."""
    from cloud_native_mapreduce_spark.multimodal.wav import (alaw_to_linear,
                                                             encode_wav_g711,
                                                             mulaw_to_linear)
    codes = [(i * 7) % 256 for i in range(64)]
    rate, ch, nf, got = decode_wav(encode_wav_g711(codes, 8000, 1, "mulaw"))
    assert (rate, ch, nf) == (8000, 1, 64)
    assert got == [mulaw_to_linear(c) for c in codes]
    rate, ch, nf, got = decode_wav(encode_wav_g711(codes, 8000, 1, "alaw"))
    assert got == [alaw_to_linear(c) for c in codes]


def test_ima_adpcm_roundtrip_quality_and_framing():
    """The real IMA compressor/expander pair: decode(encode(x)) tracks
    the waveform (4-bit quantization ⇒ error bounded by the step size
    at each sample; on this smooth signal max |err| stays well under
    the largest step the walk reaches), the first sample is exact
    (block header), and corrupt block framing raises."""
    from cloud_native_mapreduce_spark.multimodal.wav import (
        decode_wav, encode_wav_ima, ima_decode_block, ima_encode)
    import math
    x = [int(8000 * math.sin(i / 9)) for i in range(321)]  # odd count
    pred, idx, data = ima_encode(x)
    got = ima_decode_block(pred, idx, data)
    assert got[0] == x[0]
    assert len(got) == len(x)
    err = max(abs(a - b) for a, b in zip(got, x))
    # startup transient while the step size ramps from 7: measured 3782
    assert err < 4096, err
    # steady state (second half) tracks tightly: measured 130
    tail_err = max(abs(a - b) for a, b in zip(got[160:], x[160:]))
    assert tail_err < 512, tail_err
    # container path decodes identically
    rate, ch, nf, via_wav = decode_wav(encode_wav_ima(pred, idx, data))
    assert (rate, ch, nf) == (8000, 1, len(x))
    assert via_wav == got
    # framing: bad step index and misaligned data raise
    with pytest.raises(ValueError, match="header state"):
        encode_wav_ima(0, 89, data)
    bad = bytearray(encode_wav_ima(pred, idx, data))
    i = bad.index(b"data") + 8 + 2  # step-index byte of the block header
    bad[i] = 120
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))


def test_g711_sign_flip_symmetry_all_codes():
    """Exhaustive over all 256 codes, both laws: flipping the stored
    sign bit exactly negates the expansion (G.711 codes are
    sign-magnitude), and every expansion fits int16."""
    from cloud_native_mapreduce_spark.multimodal.wav import (alaw_to_linear,
                                                             mulaw_to_linear)
    for b in range(256):
        for fn in (mulaw_to_linear, alaw_to_linear):
            v, w = fn(b), fn(b ^ 0x80)
            assert w == -v
            assert -32768 <= v <= 32767
