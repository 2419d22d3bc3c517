"""From-scratch GIF87a/89a codec (LZW) — the third real image format.

Public-spec implementation (W3C GIF89a specification + the de facto
LZW walkthrough in the public literature): logical screen descriptor,
global color table, optional interlacing (the four-pass row order of
Appendix E), extension-block skipping, and the GIF variant of LZW —
variable code width from min_code_size+1 up to 12 bits, LSB-first bit
packing, CLEAR/EOI control codes, dictionary reset on CLEAR, and the
one-entry encoder/decoder phase offset that makes the width-bump
rules asymmetric (encoder bumps at next == 2^cs + 1 after its insert,
decoder at next == 2^cs — the decoder trails the encoder's dictionary
by exactly one entry, so both sides cross the width boundary on the
same emitted code).

Unlike JPEG, GIF is LOSSLESS: decode must reproduce the index stream
byte-for-byte, so the registry query's oracle states exact pixel
statistics INCLUDING a position-weighted checksum — a de-interlace or
dictionary-rebuild bug cannot hide behind an order-insensitive sum.

Scale posture: one image is one row; encode/decode run inside
mapInPandas batches (linear, embarrassingly parallel, no shuffle).
Animation (multiple image blocks), local color tables, and
transparency disposal are honestly out of scope — the decoder raises
NotImplementedError on a second image descriptor rather than
silently returning the first frame as "the" image.
"""

from __future__ import annotations

import struct

_MAX_WIDTH = 12  # LZW code width ceiling per the GIF spec


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: CLEAR first, dictionary grows per emitted
    code, width bumps at next == 2^cs + 1 (see module docstring),
    CLEAR + reset if the table fills, EOI last. LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, cs: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, nxt, cs = fresh()
    put(clear, cs)
    buf = b""
    for b in data:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        put(table[buf], cs)
        if nxt < (1 << _MAX_WIDTH):
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << cs) + 1 and cs < _MAX_WIDTH:
                cs += 1
        else:
            # table full: CLEAR, reset, re-start from the new symbol
            put(clear, cs)
            table, nxt, cs = fresh()
        buf = bytes([b])
    if buf:
        put(table[buf], cs)
        # Mirror the decoder's trailing insert: on reading this final
        # data code a standard decoder appends one more table entry
        # (bringing its next-index up to our `nxt`) and bumps its code
        # width when that lands exactly on 2^cs — so EOI must be
        # written at the bumped width or a strict external decoder
        # reads one bit past it. (The first-code-after-CLEAR case
        # makes no decoder insert, but there nxt == eoi+1 == 2^m+2
        # which never equals a power of two for m >= 2, so the single
        # condition is safe.)
        if nxt == (1 << cs) and cs < _MAX_WIDTH:
            cs += 1
    put(eoi, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(payload: bytes, min_code_size: int,
                expect: int) -> bytes:
    """Inverse of `_lzw_encode`; stops at EOI or after `expect`
    output bytes. Width bumps at next == 2^cs (decoder side of the
    phase offset)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def get(cs: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < cs:
            if pos >= len(payload):
                raise ValueError("LZW stream truncated")
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
    prev: bytes | None = None
    while len(out) < expect:
        code = get(cs)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            cs = min_code_size + 1
            nxt = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("LZW data before first CLEAR")
        if code < nxt:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]     # the KwKwK case
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None and nxt < (1 << _MAX_WIDTH):
            if code < nxt:
                table.append(prev + entry[:1])
            else:
                table.append(entry)
            nxt += 1
            if nxt == (1 << cs) and cs < _MAX_WIDTH:
                cs += 1
        elif prev is None:
            pass
        prev = entry
    if len(out) != expect:
        raise ValueError(
            f"LZW decoded {len(out)} of {expect} expected bytes")
    return bytes(out)


#: Appendix-E interlace passes: (start row, row step).
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list:
    rows = []
    for start, step in _INTERLACE:
        rows.extend(range(start, height, step))
    return rows


def grey_palette(n_colors: int) -> bytes:
    """Deterministic grey global color table: color j =
    (j·255) DIV (n−1) in all three channels."""
    out = bytearray()
    for j in range(n_colors):
        v = j * 255 // (n_colors - 1) if n_colors > 1 else 0
        out += bytes((v, v, v))
    return bytes(out)


def encode_gif(indices: bytes, width: int, height: int,
               n_colors: int, palette: bytes | None = None,
               interlace: bool = False) -> bytes:
    """GIF89a with one image: `indices` is the row-major index stream
    (values < n_colors, which must be a power of two in 2..256)."""
    bits = max(1, (n_colors - 1).bit_length())
    if 1 << bits != n_colors or not 2 <= n_colors <= 256:
        raise ValueError("n_colors must be a power of two in 2..256")
    if len(indices) != width * height:
        raise ValueError("index stream does not match dimensions")
    if max(indices) >= n_colors:
        raise ValueError("index out of palette range")
    if palette is None:
        palette = grey_palette(n_colors)
    if len(palette) != 3 * n_colors:
        raise ValueError("palette size mismatch")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, color res = bits, size
    flags = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out += struct.pack("<HHBBB", width, height, flags, 0, 0)
    out += palette
    # image descriptor (no local color table)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    if interlace:
        rows = _interlace_order(height)
        stream = b"".join(indices[r * width:(r + 1) * width]
                          for r in rows)
    else:
        stream = indices
    min_code = max(2, bits)  # spec: LZW min code size >= 2
    out.append(min_code)
    lzw = _lzw_encode(stream, min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """(width, height, n_colors, indices, palette) from a GIF87a/89a
    payload with one image. Extensions are skipped; a second image
    descriptor (animation) raises NotImplementedError honestly."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = b""
    n_colors = 0
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        palette = payload[pos:pos + 3 * n_colors]
        pos += 3 * n_colors
    result = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        if result is not None:
            raise NotImplementedError(
                "animated GIF (multiple image blocks) needs a frame-"
                "compositing decoder")
        _, left, top, w, h, iflags = struct.unpack_from(
            "<BHHHHB", payload, pos)
        pos += 10
        if iflags & 0x80:
            raise NotImplementedError(
                "GIF local color tables not supported")
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise NotImplementedError(
                "partial-canvas GIF image blocks need compositing")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            n = payload[pos]
            lzw += payload[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        stream = _lzw_decode(bytes(lzw), min_code, w * h)
        if iflags & 0x40:  # de-interlace
            rows = _interlace_order(h)
            img = bytearray(w * h)
            for src_i, r in enumerate(rows):
                img[r * w:(r + 1) * w] = \
                    stream[src_i * w:(src_i + 1) * w]
            stream = bytes(img)
        result = (w, h, n_colors, stream, palette)
    if result is None:
        raise ValueError("GIF has no image block")
    return result
