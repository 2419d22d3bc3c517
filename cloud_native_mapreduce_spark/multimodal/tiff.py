"""Pure-stdlib baseline TIFF codec for the image modality.

Seventh real container/coding beside PNG, baseline+progressive JPEG,
GIF, WAV (4 codings), and Y4M — the scientific/scanning interchange
format a multimodal crawl actually contains. Scope is the honest
baseline profile per TIFF 6.0 (Adobe, 1992):

  * both byte orders (II little-endian / MM big-endian) — the format's
    defining quirk, exercised by the round-trip tests both ways;
  * classic IFD walk: 12-byte entries, inline-vs-offset values by
    type size, required baseline tags (width, length, bits/sample,
    compression, photometric, strip offsets/byte counts,
    rows-per-strip);
  * 8-bit grayscale, single sample per pixel, strip-organized;
  * Compression 1 (none) and Compression 5 — TIFF-variant LZW, which
    differs from the GIF LZW beside it (`gif.py`) in every detail
    that matters: MSB-first bit packing, fixed 8-bit symbol alphabet
    with ClearCode=256/EOI=257, and the spec's "early change" — the
    code width bumps one code EARLIER than the table size alone
    would demand (at 511/1023/2047, not 512/1024/2048);
  * anything outside the profile (tiles, predictors, multi-sample,
    other compressions) raises NotImplementedError — the `wav.py`
    posture: a deployment binds libtiff; corrupt structure raises
    ValueError.

Like the other codecs the pixel source for the registry-facing stats
is a deterministic integer raster, so a first-principles DuckDB
oracle can replay the full encode→binary→decode→stats loop when this
lands a registry entry (staged for round 11 — the round-10 driver
window is full).
"""

from __future__ import annotations

import struct

#: (width, height, compression, pixels-row-major)
TiffData = tuple[int, int, int, list[int]]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first packing, 256-symbol alphabet,
    ClearCode 256 / EOI 257, next code starts at 258, width starts at
    9 bits and bumps at 510/1022/2046 after the +1 early change (i.e.
    when the NEXT code to be assigned would not fit the CURRENT
    width, counting one early); table reset at 4094."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(256, width)  # leading ClearCode per spec
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        put(table[w], width)
        table[w + c] = nxt
        nxt += 1
        # early change: bump when the next assignable code reaches
        # 2^width - 1 (511 at 9 bits), one earlier than GIF
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = c
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(payload: bytes, expect: int) -> bytes:
    """Decode TIFF-variant LZW to exactly `expect` bytes."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    acc = 0
    nbits = 0
    width = 9
    pos = 0
    prev: bytes | None = None

    def take() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(payload):
                return None
            acc = (acc << 8) | payload[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    while len(out) < expect:
        code = take()
        if code is None:
            raise ValueError("LZW stream exhausted before strip end")
        if code == 257:  # EOI
            raise ValueError("early EOI in LZW strip")
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"bad first code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        # decoder mirrors the encoder's early change ONE STEP LATER:
        # the decoder appends entry N while processing the code the
        # encoder emitted AFTER assigning N, so its table runs one
        # entry behind — the width bump that the encoder takes after
        # assigning index 2^w - 2 (510 at 9 bits) must fire here when
        # the decoder's next free index reaches 2^w - 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def encode_tiff(width: int, height: int, pixels: list[int],
                compression: int = 1, big_endian: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """Encode an 8-bit grayscale strip-organized baseline TIFF."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if compression not in (1, 5):
        raise NotImplementedError(
            f"compression {compression} outside the baseline profile "
            "(1=none, 5=LZW)")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        rows = pixels[y0 * width:(y0 + min(rps, height - y0)) * width]
        raw = bytes(rows)
        strips.append(_lzw_encode_tiff(raw) if compression == 5 else raw)

    n_strips = len(strips)
    # layout: 8-byte header | strip data | [offset/count arrays] | IFD
    data_start = 8
    offsets = []
    p = data_start
    for s in strips:
        offsets.append(p)
        p += len(s)
    arr_start = p

    def arr_or_inline(vals, fmt_ch, type_size):
        nonlocal p
        if len(vals) * type_size <= 4:
            return None  # inline
        at = p
        p += len(vals) * type_size
        return at

    off_at = arr_or_inline(offsets, "I", 4)
    cnt_at = arr_or_inline([len(s) for s in strips], "I", 4)

    def entry(tag, typ, vals, at):
        if at is None:
            packed = b"".join(
                struct.pack(bo + ("H" if typ == 3 else "I"), v)
                for v in vals)
            packed = packed.ljust(4, b"\x00")
            return struct.pack(bo + "HHI", tag, typ, len(vals)) + packed
        return struct.pack(bo + "HHII", tag, typ, len(vals), at)

    entries = [
        entry(256, 4, [width], None),           # ImageWidth
        entry(257, 4, [height], None),          # ImageLength
        entry(258, 3, [8], None),               # BitsPerSample
        entry(259, 3, [compression], None),     # Compression
        entry(262, 3, [1], None),               # Photometric: BlackIsZero
        entry(273, 4, offsets, off_at),         # StripOffsets
        entry(277, 3, [1], None),               # SamplesPerPixel
        entry(278, 4, [rps], None),             # RowsPerStrip
        entry(279, 4, [len(s) for s in strips], cnt_at),  # ByteCounts
    ]
    ifd_at = p
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II",
                         42, ifd_at)
    body = bytearray(header)
    for s in strips:
        body += s
    if off_at is not None:
        for o in offsets:
            body += struct.pack(bo + "I", o)
    if cnt_at is not None:
        for s in strips:
            body += struct.pack(bo + "I", len(s))
    body += struct.pack(bo + "H", len(entries))
    for e in entries:
        body += e
    body += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(body)


def decode_tiff(payload: bytes) -> TiffData:
    """Decode a baseline-profile TIFF (either byte order) to
    (width, height, compression, row-major 8-bit pixels)."""
    try:
        return _decode_tiff(payload)
    except struct.error as exc:  # truncated structure, not a crash
        raise ValueError(f"truncated TIFF structure: {exc}") from exc


def _decode_tiff(payload: bytes) -> TiffData:
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_at = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_at)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_at + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, at)
        if typ not in _TYPE_SIZES:
            continue  # unknown types are skippable per spec
        size = _TYPE_SIZES[typ] * cnt
        vat = at + 8 if size <= 4 else \
            struct.unpack_from(bo + "I", payload, at + 8)[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(cnt) + fmt,
                                            payload, vat))
    for required in (256, 257, 273, 279):
        if required not in tags:
            raise ValueError(f"missing required baseline tag {required}")
    width, height = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    bits = tags.get(258, [1])[0]
    spp = tags.get(277, [1])[0]
    if bits != 8 or spp != 1:
        raise NotImplementedError(
            f"{bits}-bit x{spp}-sample outside the 8-bit grayscale "
            "baseline profile")
    if comp not in (1, 5):
        raise NotImplementedError(
            f"compression {comp} outside the baseline profile")
    rps = tags.get(278, [height])[0]
    pixels: list[int] = []
    for i, (off, cnt) in enumerate(zip(tags[273], tags[279])):
        n_rows = min(rps, height - i * rps)
        raw = payload[off:off + cnt]
        if len(raw) != cnt:
            raise ValueError("strip overruns file")
        if comp == 5:
            raw = _lzw_decode_tiff(raw, n_rows * width)
        if len(raw) != n_rows * width:
            raise ValueError("strip size mismatch")
        pixels += list(raw)
    if len(pixels) != width * height:
        raise ValueError("decoded pixel count mismatch")
    return width, height, comp, pixels
