"""Baseline TIFF codec (`multimodal/tiff.py`): both byte orders,
strip organization, TIFF-variant LZW (MSB-first + early change),
profile gates, corrupt-structure errors. Registry entry staged for
round 11."""

from __future__ import annotations

import pytest

from cloud_native_mapreduce_spark.multimodal.tiff import (
    _lzw_decode_tiff, _lzw_encode_tiff, decode_tiff, encode_tiff)


def _raster(w, h, seed=7):
    return [(seed + 3 * x + 5 * y) % 256 for y in range(h)
            for x in range(w)]


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 5])
def test_roundtrip_both_orders_both_codings(big_endian, compression):
    w, h = 21, 13
    px = _raster(w, h)
    payload = encode_tiff(w, h, px, compression=compression,
                          big_endian=big_endian, rows_per_strip=4)
    assert decode_tiff(payload) == (w, h, compression, px)


def test_lzw_early_change_fires():
    # enough distinct material to push the code table past 510 so the
    # 9->10 bit early change happens in both encoder and decoder
    data = bytes((i * 37 + (i >> 3)) % 256 for i in range(4000))
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data
    assert len(enc) < len(data)  # actually compresses


def test_lzw_table_reset_roundtrip():
    # long low-entropy run forces the 4094-entry table reset path
    data = (b"abcdefgh" * 4000)
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data


def test_single_strip_default_and_inline_offsets():
    w, h = 8, 3
    px = _raster(w, h)
    payload = encode_tiff(w, h, px)  # one strip -> inline offset/count
    assert decode_tiff(payload) == (w, h, 1, px)


def test_profile_gates_and_corruption():
    with pytest.raises(NotImplementedError):
        encode_tiff(2, 1, [0, 0], compression=6)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x00\x2a")
    good = bytearray(encode_tiff(4, 2, _raster(4, 2)))
    good[2] = 43  # wrong magic
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(bytes(good))
    # truncated strip
    trunc = encode_tiff(16, 16, _raster(16, 16))[:40]
    with pytest.raises(ValueError):
        decode_tiff(trunc)


def test_spark_pipeline_matches_local_decode(spark):
    from cloud_native_mapreduce_spark.multimodal import binary
    docs = spark.createDataFrame([(i,) for i in range(60)],
                                 "doc_id long")
    got = {r.doc_id: (r.width, r.height, r.compression, r.luma_sum,
                      r.luma_min, r.luma_max)
           for r in binary.tiff_decode_stats(
               binary.tiff_payloads(docs)).collect()}
    assert len(got) == 60
    for d in range(60):
        w, h = 8 + d % 13, 6 + d % 9
        px = [(d + 3 * x + 5 * y) % 256
              for y in range(h) for x in range(w)]
        comp = 5 if d % 3 == 0 else 1
        assert got[d] == (w, h, comp, sum(px), min(px), max(px)), d
