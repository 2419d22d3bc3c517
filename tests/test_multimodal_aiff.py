"""AIFF codec tests: extended-80 exactness, IFF framing rules, and
the decode-stats pipeline contract (`multimodal/aiff.py`)."""

from __future__ import annotations

import struct

import pytest

from cloud_native_mapreduce_spark.multimodal.aiff import (
    decode_aiff, decode_extended80, encode_aiff, encode_extended80)


class TestExtended80:
    @pytest.mark.parametrize("rate", [1, 8000, 11025, 22050, 44100,
                                      48000, 96000, 192000])
    def test_roundtrip_exact(self, rate):
        assert decode_extended80(encode_extended80(rate)) == rate

    def test_known_44100_bit_pattern(self):
        """44100 = 0xAC44: exponent 16383+15, mantissa 0xAC44 << 48 —
        the canonical bytes every CoreAudio AIFF carries."""
        assert encode_extended80(44100) == bytes(
            [0x40, 0x0E, 0xAC, 0x44, 0, 0, 0, 0, 0, 0])

    def test_fractional_rate_refused(self):
        # 8000.5 Hz: mantissa LSB lost by the shift → honest gate
        b = bytearray(encode_extended80(16001))
        # exponent says 2^13 scale instead of 2^14: value 8000.5
        exp = struct.unpack(">H", b[:2])[0] - 1
        b[:2] = struct.pack(">H", exp)
        with pytest.raises(NotImplementedError):
            decode_extended80(bytes(b))

    def test_negative_and_zero_refused(self):
        with pytest.raises(ValueError):
            decode_extended80(b"\x80\x01" + b"\x00" * 8)
        with pytest.raises(ValueError):
            decode_extended80(b"\x00" * 10)


class TestAiffRoundtrip:
    def test_mono_roundtrip(self):
        samples = [0, 100, -100, 32767, -32768, 7]
        rate, ch, n, got = decode_aiff(encode_aiff(samples, 11025, 1))
        assert (rate, ch, n) == (11025, 1, 6)
        assert got == samples

    def test_stereo_interleave(self):
        samples = [1, -1, 2, -2, 3, -3]  # L,R per frame
        rate, ch, n, got = decode_aiff(encode_aiff(samples, 8000, 2))
        assert (ch, n) == (2, 3)
        assert got == samples
        assert got[::2] == [1, 2, 3]  # channel 0

    def test_odd_sized_chunk_padding(self):
        """An odd-length extra chunk before COMM must be skipped via
        the pad-byte rule, not desync the walk."""
        payload = encode_aiff([5, 6, 7], 8000, 1)
        extra = b"ANNO" + struct.pack(">L", 3) + b"abc" + b"\x00"
        patched = (payload[:12] + extra + payload[12:])
        body_len = struct.unpack(">L", patched[4:8])[0] + len(extra)
        patched = (patched[:4] + struct.pack(">L", body_len)
                   + patched[8:])
        rate, ch, n, got = decode_aiff(patched)
        assert got == [5, 6, 7]

    def test_ssnd_offset_respected(self):
        """A nonzero SSND offset shifts the sample data start."""
        base = encode_aiff([9, 10], 8000, 1)
        # rebuild with offset 4: four junk bytes before the samples
        comm = (struct.pack(">hLh", 1, 2, 16)
                + encode_extended80(8000))
        data = struct.pack(">2h", 9, 10)
        ssnd = struct.pack(">LL", 4, 0) + b"\xde\xad\xbe\xef" + data
        body = (b"AIFF"
                + b"COMM" + struct.pack(">L", len(comm)) + comm
                + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
        payload = b"FORM" + struct.pack(">L", len(body)) + body
        assert decode_aiff(payload)[3] == [9, 10]
        assert decode_aiff(base)[3] == [9, 10]

    def test_aifc_and_depth_gates(self):
        payload = bytearray(encode_aiff([1], 8000, 1))
        payload[8:12] = b"AIFC"
        with pytest.raises(NotImplementedError):
            decode_aiff(bytes(payload))
        payload = bytearray(encode_aiff([1], 8000, 1))
        # COMM bits field: offset 12 (FORM hdr) + 8 (chunk hdr) + 6
        payload[26:28] = struct.pack(">h", 8)
        with pytest.raises(NotImplementedError):
            decode_aiff(bytes(payload))

    def test_corrupt_framing_raises(self):
        good = encode_aiff([1, 2], 8000, 1)
        with pytest.raises(ValueError):
            decode_aiff(b"RIFF" + good[4:])       # wrong magic
        with pytest.raises(ValueError):
            decode_aiff(good[:-1])                # truncated FORM
        # COMM frame count beyond SSND data
        bad = bytearray(good)
        bad[22:26] = struct.pack(">L", 99)
        with pytest.raises(ValueError):
            decode_aiff(bytes(bad))


class TestAiffDecodeStats:
    def test_pipeline_matches_direct_decode(self, spark):
        """The Spark binary pipeline must reproduce the direct codec
        numbers for a known doc_id set, including a stereo doc."""
        from cloud_native_mapreduce_spark.multimodal import binary
        docs = spark.createDataFrame(
            [(0,), (1,), (41,)], "doc_id long")
        got = {r.doc_id: r for r in
               binary.aiff_decode_stats(
                   binary.aiff_payloads(docs)).collect()}
        for d in (0, 1, 41):
            k = 1 + d % 13
            n = 600 + (d % 24) * 10
            mono = [((i * k) % 1601) - 800 for i in range(n)]
            r = got[d]
            assert r.sample_rate == 11025
            assert r.channels == (2 if d % 40 == 0 else 1)
            assert r.n_frames == n
            assert r.total_abs == sum(abs(s) for s in mono)
            assert r.peak == max(abs(s) for s in mono)
            assert r.duration_ms == n * 1000 // 11025
