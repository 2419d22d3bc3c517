"""From-scratch Netpbm (PGM/PPM) codec — the ninth real format in
the multimodal family, and the one that exercises a TEXT-header
binary container: tokenized headers with arbitrary whitespace AND
`#` comments, then either an ASCII raster (decimal tokens) or a raw
raster whose sample width depends on maxval.

Public-spec implementation (the netpbm format family, pgm(5)/ppm(5)):

* P2 — plain (ASCII) grayscale: header and samples are whitespace-
  separated decimal tokens; comments legal anywhere in the header
  and between samples.
* P5 — raw grayscale: after the header's single whitespace byte,
  width·height samples; 1 byte each for maxval < 256, 2 bytes
  BIG-endian for 256 <= maxval < 65536 (the spec's "plain PGM uses
  the most significant byte first").
* P6 — raw RGB: as P5 with 3 samples per pixel.

Netpbm is LOSSLESS and trivially seekable-free, so decode must
reproduce the sample stream exactly; the registry oracle states
exact per-image statistics including a position-weighted checksum
(the BMP/GIF contract) replayed from the deterministic synthetic
raster.

Scale posture: one image is one row; encode/decode run inside
mapInPandas batches — linear in bytes, embarrassingly parallel, no
shuffle. Out of honest scope (loud NotImplementedError, never
silent): P1/P3/P4 (bitmap/plain-RGB/raw-bitmap), PAM (P7), and
maxval > 65535 (illegal per spec).
"""

from __future__ import annotations


def encode_pnm(magic: str, width: int, height: int, maxval: int,
               samples: list[int]) -> bytes:
    """Serialize samples (row-major; 3 per pixel for P6) as `magic`.
    A comment line is planted after the magic so decoders must
    honour the spec's comment grammar."""
    per_px = 3 if magic == "P6" else 1
    if len(samples) != width * height * per_px:
        raise ValueError("sample count does not match geometry")
    if not 0 < maxval < 65536:
        raise ValueError("maxval out of the netpbm range")
    head = (f"{magic}\n# synthetic fixture\n"
            f"{width} {height}\n{maxval}\n").encode("ascii")
    if magic == "P2":
        body_txt = []
        for r in range(height):
            row = samples[r * width:(r + 1) * width]
            body_txt.append(" ".join(str(v) for v in row))
        return head + ("\n".join(body_txt) + "\n").encode("ascii")
    if magic in ("P5", "P6"):
        if maxval < 256:
            body = bytes(samples)
        else:
            body = b"".join(v.to_bytes(2, "big") for v in samples)
        return head + body
    raise NotImplementedError(f"netpbm magic {magic!r} not supported")


def _header_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read `n` whitespace-separated decimal header tokens starting
    AFTER the magic, honouring `#` comments; returns (tokens, offset
    one whitespace byte past the last token) — the spec's 'single
    whitespace character' before raw raster data."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    while len(toks) < n:
        if i >= len(buf):
            raise ValueError("truncated netpbm header")
        c = buf[i:i + 1]
        if c == b"#":
            while i < len(buf) and buf[i:i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        if c.isspace():
            i += 1
            continue
        j = i
        while j < len(buf) and buf[j:j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"bad netpbm header byte {c!r}")
        toks.append(int(buf[i:j]))
        i = j
    if i >= len(buf) or not buf[i:i + 1].isspace():
        raise ValueError("missing whitespace after netpbm header")
    return toks, i + 1


def decode_pnm(buf: bytes) -> tuple[str, int, int, int, list[int]]:
    """(magic, width, height, maxval, samples) — samples row-major,
    3 per pixel for P6. Rejects unsupported magics loudly."""
    magic = buf[:2].decode("ascii", errors="replace")
    if magic in ("P1", "P3", "P4", "P7"):
        raise NotImplementedError(
            f"netpbm magic {magic} not supported (honest gate)")
    if magic not in ("P2", "P5", "P6"):
        raise ValueError(f"not a netpbm payload: {magic!r}")
    (width, height, maxval), off = _header_tokens(buf, 3)
    if not 0 < maxval < 65536:
        raise ValueError("maxval out of the netpbm range")
    per_px = 3 if magic == "P6" else 1
    n = width * height * per_px
    if magic == "P2":
        toks: list[int] = []
        i = off
        while len(toks) < n:
            if i >= len(buf):
                raise ValueError("truncated P2 raster")
            c = buf[i:i + 1]
            if c == b"#":
                while i < len(buf) and buf[i:i + 1] not in (b"\n", b"\r"):
                    i += 1
                continue
            if c.isspace():
                i += 1
                continue
            j = i
            while j < len(buf) and buf[j:j + 1].isdigit():
                j += 1
            toks.append(int(buf[i:j]))
            i = j
        samples = toks
    else:
        w = 1 if maxval < 256 else 2
        need = n * w
        raster = buf[off:off + need]
        if len(raster) < need:
            raise ValueError("truncated raw raster")
        if w == 1:
            samples = list(raster)
        else:
            samples = [int.from_bytes(raster[k:k + 2], "big")
                       for k in range(0, need, 2)]
    if any(v > maxval for v in samples):
        raise ValueError("sample exceeds maxval")
    return magic, width, height, maxval, samples
