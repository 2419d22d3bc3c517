"""GIF codec invariants: exact LZW roundtrip (GIF is lossless, so the
bar is byte identity, not an error bound), interlace correctness, and
honest gates — the validator-style independent check the other codecs
carry (SURVEY.md §5)."""

from __future__ import annotations

import random

import pytest

from cloud_native_mapreduce_spark.multimodal.gif import (_lzw_decode,
                                                         _lzw_encode,
                                                         decode_gif,
                                                         encode_gif)


def test_lzw_roundtrip_fuzz():
    """Raw LZW across min-code sizes and lengths that cross every
    code-width boundary and force table-full CLEAR resets."""
    rng = random.Random(7)
    for trial in range(120):
        n = rng.randrange(0, 3000)
        mcs = rng.choice([2, 3, 4, 8])
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert _lzw_decode(_lzw_encode(data, mcs), mcs, n) == data, \
            (trial, n, mcs)


def test_gif_roundtrip_fuzz_both_interlace_modes():
    rng = random.Random(11)
    for trial in range(150):
        w, h = rng.randrange(1, 40), rng.randrange(1, 40)
        nc = rng.choice([2, 4, 8, 16, 64, 256])
        il = rng.random() < 0.5
        idx = bytes(rng.randrange(nc) for _ in range(w * h))
        got = decode_gif(encode_gif(idx, w, h, nc, interlace=il))
        assert got[:3] == (w, h, nc) and got[3] == idx, \
            (trial, w, h, nc, il)


def test_gif_interlace_actually_reorders():
    """The interlaced payload must differ from the sequential one for
    a multi-row image (else the de-interlace path is untested), yet
    decode to the same stream."""
    idx = bytes(range(16)) * 4  # 8x8, 16 colors
    seq = encode_gif(idx, 8, 8, 16, interlace=False)
    il = encode_gif(idx, 8, 8, 16, interlace=True)
    assert seq != il
    assert decode_gif(seq)[3] == decode_gif(il)[3] == idx


def test_gif_kwkwk_and_repetition():
    """The KwKwK dictionary case and long runs (table growth through
    several width bumps)."""
    for k in (1, 2, 3):
        idx = (bytes([1] * k) + bytes([2] * k)) * 500
        assert decode_gif(encode_gif(idx, len(idx), 1, 4))[3] == idx


def test_gif_extension_blocks_are_skipped():
    """A graphic-control extension (the GIF89a block real encoders
    emit) must be skipped, not parsed as an image."""
    idx = bytes((7 * i) % 8 for i in range(30))
    p = bytearray(encode_gif(idx, 6, 5, 8))
    # splice a GCE right before the image descriptor (0x2C)
    at = p.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    crafted = bytes(p[:at]) + gce + bytes(p[at:])
    assert decode_gif(crafted)[3] == idx


def test_gif_honest_gates():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG xxxxxxxxxxxx")
    idx = bytes(30)
    p = bytearray(encode_gif(idx, 6, 5, 4))
    # duplicate the image block => animated => honest gate
    at = p.index(0x2C, 13)
    body = bytes(p[at:-1])  # image block without trailer
    crafted = bytes(p[:-1]) + body + b"\x3B"
    with pytest.raises(NotImplementedError, match="animated"):
        decode_gif(crafted)
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(idx, 6, 5, 5)


def _strict_lzw_decode(payload: bytes, min_code_size: int) -> bytes:
    """Spec-strict external decoder: no expected-length early stop —
    reads codes (bump-before-read at next == 2^cs) until EOI, raising
    if any read crosses the payload end. Exists to pin the encoder's
    EOI width: a decoder like this bumps AFTER its trailing dictionary
    insert and so reads EOI at the bumped width."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = acc = nbits = 0

    def get(cs):
        nonlocal pos, acc, nbits
        while nbits < cs:
            if pos >= len(payload):
                raise ValueError("strict decoder ran off payload end")
            acc |= payload[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        return code

    out = bytearray()
    table: list[bytes] = []
    cs = min_code_size + 1
    nxt = eoi + 1
    prev = None
    bumped = False          # width bump on the immediately prior insert
    while True:
        code = get(cs)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            cs = min_code_size + 1
            nxt = eoi + 1
            prev = None
            bumped = False
            continue
        if code == eoi:
            # bumped==True here means EOI was read at a width the
            # decoder raised AFTER its trailing insert — the exact
            # interop edge the encoder must mirror
            return bytes(out), bumped
        entry = table[code] if code < nxt else prev + prev[:1]
        out += entry
        bumped = False
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1] if code < nxt else entry)
            nxt += 1
            if nxt == (1 << cs) and cs < 12:
                cs += 1
                bumped = True
        prev = entry


def test_lzw_eoi_written_at_bumped_width():
    """Interop pin for the encoder's EOI code width: when the
    decoder's trailing insert lands its next-index exactly on 2^cs,
    a spec-strict decoder bumps the width BEFORE reading EOI — the
    encoder must emit EOI at that bumped width or the strict decoder
    reads one extra bit (possibly off the end of the sub-block).
    Fuzz with a strict decoder that never early-stops, plus a
    deterministic search asserting the edge actually fires."""
    rng = random.Random(23)
    edge_hit = False
    for trial in range(400):
        mcs = rng.choice([2, 3, 4, 8])
        n = rng.randrange(1, 700)
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        enc = _lzw_encode(data, mcs)
        got, at_edge = _strict_lzw_decode(enc, mcs)
        edge_hit |= at_edge
        assert got == data, (trial, mcs, n)
        assert _lzw_decode(enc, mcs, n) == data, (trial, mcs, n)
    # deterministic sweep: varying-length low-redundancy streams grow
    # the table ~one entry per emitted code, so some length lands the
    # decoder's trailing insert exactly on a power of two
    for mcs in (2, 3):
        for n in range(1, 260):
            data = bytes((7 * i + 3) % (1 << mcs) for i in range(n))
            enc = _lzw_encode(data, mcs)
            got, at_edge = _strict_lzw_decode(enc, mcs)
            edge_hit |= at_edge
            assert got == data, (mcs, n)
    assert edge_hit, "sweep never exercised the bump-before-EOI edge"
