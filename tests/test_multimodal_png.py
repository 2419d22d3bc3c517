"""PNG codec correctness: the real decode path behind image_decode_stats.

The end-to-end pipeline (synthesize → binary column → decode → stats)
is value-checked against the arithmetic oracle in test_registry_oracle;
these pin the codec itself — every PNG filter type reverses exactly,
RGB as well as grey, and the honest NotImplementedError gate still
guards the formats a real codec library would own.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from cloud_native_mapreduce_spark.multimodal.binary import (PNG_SIG,
                                                            decode_image,
                                                            decode_png,
                                                            encode_png)


def _pixels(n: int, seed: int = 3) -> bytes:
    return bytes((seed * 31 + 7 * i) % 256 for i in range(n))


def test_roundtrip_exercises_all_five_filters():
    # 7 rows with cycling filters → types 0,1,2,3,4,0,1 all hit
    w, h = 5, 7
    px = _pixels(w * h)
    payload = encode_png(px, w, h, cycle_filters=True)
    assert payload[:8] == PNG_SIG
    got_w, got_h, channels, got = decode_png(payload)
    assert (got_w, got_h, channels) == (w, h, 1)
    assert got == px


def test_roundtrip_unfiltered_and_rgb():
    w, h = 4, 3
    grey = _pixels(w * h, seed=9)
    assert decode_png(encode_png(grey, w, h, cycle_filters=False))[3] == grey
    rgb = _pixels(w * h * 3, seed=11)
    got_w, got_h, channels, got = decode_png(
        encode_png(rgb, w, h, channels=3))
    assert (got_w, got_h, channels) == (w, h, 3)
    assert got == rgb


def test_decode_image_dims_and_unknown_format_gate():
    payload = encode_png(_pixels(6), 3, 2)
    assert decode_image(payload) == (3, 2)
    # JPEG magic now routes to the real baseline codec (multimodal/jpeg.py);
    # a JPEG-tagged payload with no scan is corrupt, not unsupported
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
    # formats with no codec at all stay honestly gated
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not supported")


def test_corrupt_png_raises_value_error():
    payload = bytearray(encode_png(_pixels(6), 3, 2))
    with pytest.raises(ValueError):
        decode_png(bytes(payload[:20]))  # truncated mid-chunk
    with pytest.raises(ValueError):
        decode_png(PNG_SIG)  # no chunks at all


def test_unsupported_depth_stays_honestly_gated():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(NotImplementedError):
        decode_png(PNG_SIG + chunk)


def test_png_pipeline_end_to_end(spark, sf_dir):
    """payload really crosses Spark as binary; stats rows 1:1 with docs."""
    from cloud_native_mapreduce_spark.multimodal import binary
    from cloud_native_mapreduce_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    with_png = binary.png_payloads(docs)
    assert dict(with_png.dtypes)["payload"] == "binary"
    stats = binary.image_decode_stats(with_png)
    assert stats.count() == docs.count()
    row = stats.where(stats.doc_id == 0).collect()[0]
    assert (row["width"], row["height"]) == (4, 3)


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 21), st.integers(1, 17), st.sampled_from([1, 3]),
       st.integers(0, 2**32 - 1))
def test_png_roundtrip_random_pixels_exact(w, h, ch, seed):
    """PNG is lossless: encode→decode must be BITWISE identity for any
    dims/channels/pixel content, including 1-pixel images and rows
    shorter than the filter's left-neighbor offset."""
    import numpy as np

    from cloud_native_mapreduce_spark.multimodal.binary import (decode_png,
                                                                encode_png)
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    W, H, C, got = decode_png(encode_png(px, w, h, ch))
    assert (W, H, C) == (w, h, ch)
    assert got == px
