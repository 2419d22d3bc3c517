"""From-scratch Truevision TGA codec — the tenth real format in the
multimodal family, and the one that exercises a little-endian
fixed-struct header with an ID-field skip, CHANNEL REORDERING (pixels
are stored BGR), a VERTICAL ORIENTATION bit (bottom-up is the
default; descriptor bit 5 flips to top-down), and pixel-level RLE
packets.

Public-spec implementation (Truevision TGA File Format Specification
v2.0, 1991):

* 18-byte header: idLength, colorMapType, imageType, 5-byte color-map
  spec, x/y origin, width/height (uint16 LE), pixelDepth, descriptor.
* imageType 2 — uncompressed true-color, 24-bit BGR.
* imageType 3 — uncompressed grayscale, 8-bit.
* imageType 10 — RLE true-color: packets with the high bit selecting
  run (one pixel repeated count times) vs raw (count literal pixels),
  count = (byte & 0x7F) + 1; runs may cross scan lines.

Decode NORMALIZES to top-down row-major RGB channel order, so the
registry oracle's position-weighted checksum fails on any header
offset, BGR↔RGB, row-flip, or RLE bug — the netpbm/BMP/GIF exactness
contract. Out of honest scope (loud NotImplementedError, never
silent): color-mapped images (types 1/9), RLE grayscale (11), and
16/32-bit depths.

Scale posture: one image is one row; encode/decode run inside
mapInPandas batches — linear in bytes, embarrassingly parallel, no
shuffle.
"""

from __future__ import annotations

import struct

#: Descriptor bit 5: origin at the TOP-left (rows stored top-down).
_TOP_DOWN = 0x20


def encode_tga(image_type: int, width: int, height: int,
               samples: list[int], top_down: bool,
               id_field: bytes = b"fx01") -> bytes:
    """Serialize `samples` (TOP-DOWN row-major; RGB triplets for the
    color types, single channel for grayscale) as `image_type`,
    storing rows bottom-up unless `top_down` (exercising the
    descriptor-bit flip) and channels as BGR."""
    if image_type in (2, 10):
        depth, per_px = 24, 3
    elif image_type == 3:
        depth, per_px = 8, 1
    else:
        raise NotImplementedError(
            f"TGA imageType {image_type} not supported")
    if len(samples) != width * height * per_px:
        raise ValueError("sample count does not match geometry")
    if any(not 0 <= v < 256 for v in samples):
        raise ValueError("sample out of byte range")
    desc = _TOP_DOWN if top_down else 0
    head = struct.pack("<BBBHHBHHHHBB",
                       len(id_field), 0, image_type,
                       0, 0, 0,        # color-map spec (none)
                       0, 0,           # x/y origin
                       width, height, depth, desc)
    rows = [samples[r * width * per_px:(r + 1) * width * per_px]
            for r in range(height)]
    if not top_down:
        rows = rows[::-1]
    pixels: list[bytes] = []
    for row in rows:
        for c in range(0, len(row), per_px):
            px = row[c:c + per_px]
            pixels.append(bytes(px[::-1]))  # RGB → BGR (no-op gray)
    if image_type in (2, 3):
        return head + id_field + b"".join(pixels)
    # type 10: maximal-run RLE packets (may cross scan lines)
    out: list[bytes] = []
    i = 0
    while i < len(pixels):
        j = i + 1
        while j < len(pixels) and j - i < 128 and pixels[j] == pixels[i]:
            j += 1
        if j - i >= 2:
            out.append(bytes([0x80 | (j - i - 1)]) + pixels[i])
            i = j
            continue
        j = i + 1
        while (j < len(pixels) and j - i < 128
               and (j + 1 >= len(pixels) or pixels[j] != pixels[j + 1])):
            j += 1
        out.append(bytes([j - i - 1]) + b"".join(pixels[i:j]))
        i = j
    return head + id_field + b"".join(out)


def decode_tga(buf: bytes) -> tuple[int, int, int, int, list[int]]:
    """(image_type, width, height, depth, samples) with samples
    normalized to TOP-DOWN row-major RGB channel order. Rejects
    unsupported layouts loudly."""
    if len(buf) < 18:
        raise ValueError("truncated TGA header")
    (id_len, cmap_type, image_type, _cm_first, _cm_len, _cm_depth,
     _xo, _yo, width, height, depth, desc) = struct.unpack(
        "<BBBHHBHHHHBB", buf[:18])
    if cmap_type != 0 or image_type in (1, 9):
        raise NotImplementedError(
            "color-mapped TGA not supported (honest gate)")
    if image_type == 11:
        raise NotImplementedError(
            "RLE grayscale TGA not supported (honest gate)")
    if image_type not in (2, 3, 10):
        raise ValueError(f"not a supported TGA imageType: {image_type}")
    per_px = 3 if image_type in (2, 10) else 1
    if depth != per_px * 8:
        raise NotImplementedError(
            f"TGA depth {depth} for imageType {image_type} "
            "not supported (honest gate)")
    off = 18 + id_len
    n_px = width * height
    pixels: list[bytes] = []
    if image_type in (2, 3):
        need = n_px * per_px
        body = buf[off:off + need]
        if len(body) < need:
            raise ValueError("truncated TGA raster")
        pixels = [body[k:k + per_px]
                  for k in range(0, need, per_px)]
    else:
        i = off
        while len(pixels) < n_px:
            if i >= len(buf):
                raise ValueError("truncated TGA RLE stream")
            ctl = buf[i]
            count = (ctl & 0x7F) + 1
            i += 1
            if ctl & 0x80:
                px = buf[i:i + per_px]
                if len(px) < per_px:
                    raise ValueError("truncated TGA run packet")
                pixels.extend([px] * count)
                i += per_px
            else:
                need = count * per_px
                raw = buf[i:i + need]
                if len(raw) < need:
                    raise ValueError("truncated TGA raw packet")
                pixels.extend(raw[k:k + per_px]
                              for k in range(0, need, per_px))
                i += need
        if len(pixels) != n_px:
            raise ValueError("TGA RLE overruns the raster")
    rows = [pixels[r * width:(r + 1) * width] for r in range(height)]
    if not desc & _TOP_DOWN:
        rows = rows[::-1]
    samples = [v for row in rows for px in row for v in px[::-1]]
    return image_type, width, height, depth, samples
