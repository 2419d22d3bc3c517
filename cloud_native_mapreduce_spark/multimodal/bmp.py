"""From-scratch BMP (Windows V3) codec with real RLE8 compression —
the eighth real format in the multimodal family.

Public-spec implementation (the Windows BITMAPFILEHEADER /
BITMAPINFOHEADER layout and the documented BI_RLE8 coding):
8-bit-indexed pixels with a BGRX palette, positive-height bottom-up
row order, and both codings —

* BI_RGB: raw rows, each padded to a 4-byte boundary;
* BI_RLE8: run-length encoding with the full escape grammar —
  encoded runs (count 1..255, value), absolute mode (escape 00,
  n >= 3 literal bytes, padded to a 2-byte boundary), end-of-line
  (00 00) after every row and end-of-bitmap (00 01) last. The
  encoder is a deterministic greedy: maximal equal-byte runs become
  encoded runs; heterogeneous stretches of >= 3 go to absolute mode,
  shorter ones degrade to count-1/2 encoded runs. Delta escapes
  (00 02) are a legal input the DECODER rejects loudly — they encode
  skipped (undefined) pixels, which an indexed stats pass must not
  invent; no encoder we produce emits them.

Like GIF/TIFF, BMP is LOSSLESS: decode must reproduce the index
stream byte-for-byte, so the registry oracle states exact pixel
statistics INCLUDING a position-weighted checksum — a row-order
(bottom-up) or RLE-reassembly bug cannot hide behind an
order-insensitive sum.

Scale posture: one image is one row; encode/decode run inside
mapInPandas batches (linear, embarrassingly parallel, no shuffle).
Out of honest scope (loud NotImplementedError, never silent): 1/4/
16/24/32-bit depths, BI_RLE4, top-down (negative height) bitmaps,
and the delta escape.
"""

from __future__ import annotations

import struct


def _encode_rle8_row(row: bytes) -> bytearray:
    """Greedy RLE8 for one row: maximal encoded runs; literal
    stretches >= 3 in absolute mode (word-aligned), shorter ones as
    tiny encoded runs."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # length of the equal-byte run at i
        run = 1
        while i + run < n and run < 255 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes((run, row[i]))
            i += run
            continue
        # heterogeneous stretch: scan until a run of >= 3 starts
        j = i
        while j < n and (j - i) < 255:
            r2 = 1
            while j + r2 < n and r2 < 3 and row[j + r2] == row[j]:
                r2 += 1
            if r2 >= 3:
                break
            j += 1
        lit = row[i:j]
        if len(lit) >= 3:
            out += bytes((0, len(lit))) + lit
            if len(lit) % 2:
                out.append(0)  # absolute mode pads to a word boundary
        else:
            for b in lit:
                out += bytes((1, b))
        i = j
    return out


def encode_bmp(width: int, height: int, pixels: list[int],
               n_colors: int = 16, rle: bool = True) -> bytes:
    """Assemble an 8-bit indexed BMP from a TOP-DOWN raster (row-major
    `pixels`, len == width*height); the file stores rows bottom-up
    per the positive-height convention. Palette entry i is the
    grayscale (i*255//(n_colors-1)) BGRX quad — decode never reads
    colors, but real viewers render these files."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if any(p < 0 or p >= n_colors for p in pixels):
        raise ValueError("pixel index out of palette range")
    rows = [bytes(pixels[y * width:(y + 1) * width])
            for y in range(height)]
    if rle:
        data = bytearray()
        for row in reversed(rows):          # bottom-up
            data += _encode_rle8_row(row)
            data += b"\x00\x00"             # EOL
        data += b"\x00\x01"                 # EOB
        compression = 1
    else:
        pad = (-width) % 4
        data = bytearray()
        for row in reversed(rows):
            data += row + b"\x00" * pad
        compression = 0
    palette = bytearray()
    for i in range(n_colors):
        g = i * 255 // max(n_colors - 1, 1)
        palette += bytes((g, g, g, 0))
    offset = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8,
                       compression, len(data), 2835, 2835,
                       n_colors, 0)
    header = struct.pack("<2sIHHI", b"BM", offset + len(data),
                         0, 0, offset)
    return bytes(header + info + palette + data)


def decode_bmp(payload: bytes) -> tuple[int, int, int, int, list[int]]:
    """Parse headers + palette, expand BI_RGB or BI_RLE8, and return
    (width, height, compression, n_colors, top-down raster). Strict:
    bad magic, unsupported depth/compression, top-down files, delta
    escapes, row overruns, and truncation all raise ValueError /
    NotImplementedError — corrupt framing is an error, not a skip."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (_, _, _, offset) = struct.unpack("<IHHI", payload[2:14])
    (bisize, width, height, planes, bpp, compression, _, _, _,
     clr_used, _) = struct.unpack("<IiiHHIIiiII", payload[14:54])
    if bisize != 40:
        raise NotImplementedError(f"unsupported header size {bisize}")
    if height < 0:
        raise NotImplementedError("top-down BMP not supported")
    if bpp != 8:
        raise NotImplementedError(f"unsupported bit depth {bpp}")
    if compression not in (0, 1):
        raise NotImplementedError(f"unsupported compression "
                                  f"{compression}")
    n_colors = clr_used or 256
    rows: list[list[int]] = []
    if compression == 0:
        stride = width + ((-width) % 4)
        need = offset + stride * height
        if len(payload) < need:
            raise ValueError("truncated pixel data")
        for r in range(height):
            base = offset + r * stride
            rows.append(list(payload[base:base + width]))
    else:
        pos = offset
        row: list[int] = []
        rows_up: list[list[int]] = []
        while True:
            if pos + 2 > len(payload):
                raise ValueError("truncated RLE8 stream")
            c, v = payload[pos], payload[pos + 1]
            pos += 2
            if c > 0:                       # encoded run
                row += [v] * c
            elif v == 0:                    # EOL
                if len(row) != width:
                    raise ValueError(
                        f"RLE8 row length {len(row)} != width {width}")
                rows_up.append(row)
                row = []
            elif v == 1:                    # EOB
                break
            elif v == 2:
                raise NotImplementedError(
                    "RLE8 delta escape encodes undefined pixels")
            else:                           # absolute mode
                end = pos + v
                if end > len(payload):
                    raise ValueError("truncated absolute run")
                row += list(payload[pos:end])
                pos = end + (v % 2)         # word-aligned
            if len(row) > width:
                raise ValueError("RLE8 run overflows row")
        if len(rows_up) != height:
            raise ValueError(
                f"RLE8 decoded {len(rows_up)} rows, expected {height}")
        rows = rows_up
    rows.reverse()                          # bottom-up -> top-down
    px = [p for row in rows for p in row]
    if any(p >= n_colors for p in px):
        raise ValueError("pixel index outside palette")
    return width, height, compression, n_colors, px
