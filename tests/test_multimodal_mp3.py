"""MPEG-1 Layer III frame-header walker (`multimodal/mp3.py`):
spec-table arithmetic, round-trips, corrupt-framing errors, and the
Spark plumbing end-to-end. Registry entry + DuckDB oracle are staged
for the round-11 driver window (the round-10 window is full at 50)."""

from __future__ import annotations

import pytest

from cloud_native_mapreduce_spark.multimodal.mp3 import (
    decode_audio, encode_mp3, frame_length, parse_mp3)


def test_frame_length_spec_examples():
    # 128 kbps @ 44100 Hz: floor(144*128000/44100) = 417 (+1 padded)
    assert frame_length(9, 0, 0) == 417
    assert frame_length(9, 0, 1) == 418
    # 320 kbps @ 32000 Hz: 144*320000/32000 = 1440 exactly
    assert frame_length(14, 2, 0) == 1440


def test_parse_roundtrip_cbr_mono():
    payload = encode_mp3([(9, 0, 0), (9, 0, 1), (9, 0, 0)], fill=7)
    n, nb, sr, ch, kbps, vbr, dur = parse_mp3(payload)
    assert (n, sr, ch, kbps, vbr) == (3, 44100, 1, 128, False)
    assert nb == len(payload) == 417 + 418 + 417
    assert dur == 3 * 1152 * 1000 // 44100  # 78 ms


def test_parse_vbr_and_id3_skip():
    payload = encode_mp3([(1, 1, 0), (14, 1, 0)], id3_size=33,
                         channels=2)
    n, nb, sr, ch, kbps, vbr, dur = parse_mp3(payload)
    assert (n, sr, ch, vbr) == (2, 48000, 2, True)
    assert kbps == (32 + 320) // 2
    assert nb == len(payload)


def test_corrupt_framing_raises():
    good = encode_mp3([(9, 0, 0)])
    with pytest.raises(ValueError, match="lost sync"):
        parse_mp3(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated frame"):
        parse_mp3(good[:-1])
    with pytest.raises(ValueError, match="no MPEG frames"):
        parse_mp3(b"")
    # trailing garbage after the last full frame must not be skipped
    with pytest.raises(ValueError):
        parse_mp3(good + b"\x01\x02")


def test_decode_audio_is_honestly_gated():
    with pytest.raises(NotImplementedError):
        decode_audio(encode_mp3([(9, 0, 0)]))


def test_spark_pipeline_matches_local_parse(spark):
    from cloud_native_mapreduce_spark.multimodal import binary
    docs = spark.createDataFrame([(i,) for i in range(0, 120)],
                                 "doc_id long")
    got = {r.doc_id: (r.n_frames, r.n_bytes, r.sample_rate, r.channels,
                      r.avg_bitrate_kbps, r.is_vbr, r.duration_ms)
           for r in binary.mp3_frame_stats(
               binary.mp3_payloads(docs)).collect()}
    assert len(got) == 120
    for d in range(120):
        n = 2 + d % 6
        si = d % 3
        frames = [(1 + ((d + i) % 14 if d % 4 == 0 else d % 14),
                   si, i % 2) for i in range(n)]
        payload = encode_mp3(frames, fill=d % 256,
                             id3_size=(d % 64) if d % 10 == 0 else 0,
                             channels=2 if d % 7 == 0 else 1)
        assert got[d] == parse_mp3(payload), f"doc {d}"
