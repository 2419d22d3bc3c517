"""Netpbm (PGM/PPM) codec + Spark plumbing tests — the ninth format:
text-header grammar (whitespace, comments), ASCII vs raw rasters,
16-bit big-endian samples, honest unsupported-magic gates."""

from __future__ import annotations

import pytest

from cloud_native_mapreduce_spark.multimodal.pnm import (
    decode_pnm,
    encode_pnm,
)


def test_roundtrip_all_magics():
    for magic, mv in (("P2", 255), ("P5", 255), ("P5", 1000),
                      ("P6", 255)):
        pp = 3 if magic == "P6" else 1
        w, h = 5, 3
        s = [(11 + 7 * i) % (mv + 1) for i in range(w * h * pp)]
        m2, w2, h2, mv2, s2 = decode_pnm(encode_pnm(magic, w, h, mv, s))
        assert (m2, w2, h2, mv2, s2) == (magic, w, h, mv, s)


def test_header_comments_anywhere():
    """Comments between any header tokens must be skipped — the
    grammar, not just the one comment the encoder plants."""
    body = bytes([1, 2, 3, 4, 5, 6])
    buf = b"P5 # c1\n#c2\n 3 # wide\n 2 \n# before maxval\n255 " + body
    magic, w, h, mv, s = decode_pnm(buf)
    assert (magic, w, h, mv, s) == ("P5", 3, 2, 255, [1, 2, 3, 4, 5, 6])


def test_p2_tolerates_arbitrary_whitespace():
    buf = b"P2\n2 2\n9\n1\t2  3\n4\n"
    assert decode_pnm(buf)[4] == [1, 2, 3, 4]


def test_sixteen_bit_samples_are_big_endian():
    buf = encode_pnm("P5", 2, 1, 1000, [258, 772])
    assert buf.endswith(bytes([1, 2, 3, 4]))  # 258=0x0102, 772=0x0304
    assert decode_pnm(buf)[4] == [258, 772]


def test_unsupported_magics_fail_loudly():
    for magic in (b"P1", b"P3", b"P4", b"P7"):
        with pytest.raises(NotImplementedError):
            decode_pnm(magic + b" 1 1 1 0")
    with pytest.raises(ValueError):
        decode_pnm(b"XX nonsense")


def test_truncation_and_overflow_rejected():
    good = encode_pnm("P5", 3, 2, 255, [0, 1, 2, 3, 4, 5])
    with pytest.raises(ValueError):
        decode_pnm(good[:-1])                 # truncated raster
    with pytest.raises(ValueError):
        decode_pnm(b"P5 2 2")                 # truncated header
    with pytest.raises(ValueError):
        decode_pnm(b"P2 1 1 5 9 ")            # sample > maxval


def test_spark_roundtrip_stats(spark):
    """The mapInPandas plumbing: synthesized payloads decode to the
    first-principles stats for a hand-checkable doc."""
    from cloud_native_mapreduce_spark.multimodal import binary
    docs = spark.createDataFrame([(0,), (1,), (2,), (5,)],
                                 "doc_id long")
    out = {r.doc_id: r for r in binary.pnm_decode_stats(
        binary.pnm_payloads(docs)).collect()}
    assert out[0].magic == "P2" and out[1].magic == "P5"
    assert out[2].magic == "P6" and out[5].magic == "P6"
    assert out[1].maxval == 1000        # d%3==1 and d%4==1
    d = 2                               # P6: w=9, h=6, 3 samples/px
    n = 9 * 6 * 3
    s = [(d + 7 * i) % 256 for i in range(n)]
    assert out[2].n_samples == n
    assert out[2].sum_px == sum(s)
    assert out[2].checksum == sum((i + 1) * v
                                  for i, v in enumerate(s)) % 1000000007
