"""BMP codec (`multimodal/bmp.py`): both codings, RLE8 escape
grammar, bottom-up row order, strict-rejection gates."""

from __future__ import annotations

import struct

import pytest

from cloud_native_mapreduce_spark.multimodal.bmp import (
    _encode_rle8_row,
    decode_bmp,
    encode_bmp,
)


def _raster(w, h, seed=7):
    return [((x // 3) + y + seed) % 16 for y in range(h)
            for x in range(w)]


@pytest.mark.parametrize("rle", [True, False])
def test_roundtrip_both_codings(rle):
    w, h = 21, 13
    px = _raster(w, h)
    payload = encode_bmp(w, h, px, n_colors=16, rle=rle)
    assert decode_bmp(payload) == (w, h, 1 if rle else 0, 16, px)


def test_roundtrip_odd_width_padding():
    # width 5: BI_RGB stride pads 3 bytes; RLE absolute runs of odd
    # length pad 1 — both paths must not leak padding into pixels.
    w, h = 5, 4
    px = [0, 3, 1, 4, 2, 2, 2, 2, 2, 2, 1, 0, 1, 0, 1,
          5, 6, 7, 8, 9]
    for rle in (True, False):
        assert decode_bmp(encode_bmp(w, h, px, rle=rle))[4] == px


def test_rle8_row_grammar_hand_built():
    # run of 4 -> encoded run; 3 distinct -> absolute mode (padded);
    # 2 distinct -> two count-1 runs.
    assert bytes(_encode_rle8_row(bytes([7, 7, 7, 7]))) == bytes(
        [4, 7])
    out = bytes(_encode_rle8_row(bytes([1, 2, 3])))
    assert out == bytes([0, 3, 1, 2, 3, 0])  # absolute + pad byte
    assert bytes(_encode_rle8_row(bytes([1, 2]))) == bytes(
        [1, 1, 1, 2])


def test_bottom_up_row_order_is_reversed_on_disk():
    # 1x2 image, top row 0 / bottom row 1: the file must store the
    # BOTTOM row first (positive-height convention).
    payload = encode_bmp(1, 2, [0, 1], n_colors=2, rle=False)
    offset = struct.unpack("<I", payload[10:14])[0]
    assert payload[offset] == 1 and payload[offset + 4] == 0
    assert decode_bmp(payload)[4] == [0, 1]


def test_strict_rejections():
    payload = encode_bmp(4, 2, [0, 1, 2, 3, 3, 2, 1, 0], 4, rle=True)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + payload[2:])
    bad = bytearray(payload)
    off = struct.unpack("<I", bytes(bad[10:14]))[0]
    bad[off:off + 2] = b"\x00\x02"
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))  # delta escape = undefined pixels
    with pytest.raises(ValueError):
        decode_bmp(payload[:30])  # truncated header/stream
    with pytest.raises(ValueError):
        encode_bmp(2, 2, [0, 1, 2, 99], n_colors=16)  # out of palette


def test_rle_truncated_stream_rejected():
    payload = encode_bmp(6, 3, _raster(6, 3), rle=True)
    with pytest.raises(ValueError):
        decode_bmp(payload[:-3])  # EOB cut off


def test_compression_actually_compresses_runs():
    # a run-heavy raster must be smaller RLE8 than raw.
    w, h = 64, 16
    px = [((x // 16) + y) % 4 for y in range(h) for x in range(w)]
    rle = encode_bmp(w, h, px, rle=True)
    raw = encode_bmp(w, h, px, rle=False)
    assert len(rle) < len(raw) / 3
