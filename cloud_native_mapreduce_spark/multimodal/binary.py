"""Multimodal column plumbing: opaque binary payloads + typed metadata.

PNG decode is REAL (pure stdlib: zlib inflate + full scanline unfilter,
`_png_codec`) and value-checked end-to-end by the `image_decode_stats`
oracle; other codecs (JPEG, audio, video) need libraries this container
lacks and stay honestly gated behind NotImplementedError. The Spark-side
machinery a 100 TB multimodal pipeline needs is real and tested either way:
  * binary columns with deterministic metadata (byte length, content hash,
    base64 transport encoding) — all JVM-side;
  * Arrow-batched `mapInPandas` feature extraction with an explicit output
    schema and bounded batch size;
  * a deterministic fake "decoder" so non-PNG plumbing is verifiable
    end-to-end without codec libraries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id bigint, n_bytes bigint, sha256 string, "
                  "fake_width bigint, fake_height bigint")


def _doc_ids(docs: DataFrame) -> DataFrame:
    """doc_id column spread across the cluster (`fan_out`): payload
    synthesis and the decode stage it feeds are per-row-expensive
    Python codec work, and the single-row-group documents scan would
    otherwise pin the WHOLE codec pipeline to one task (guide §2.5 —
    repartition an unsplittable input right after the read; a no-op
    once the scan parallelizes on its own)."""
    from cloud_native_mapreduce_spark.sources.tables import fan_out
    return fan_out(docs.select("doc_id"), "doc_id")


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of text stand in
    for image/audio payloads) plus transport metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        _b64(payload).alias("payload_b64"),
    )


def _b64(col):
    """base64 without MIME line-wrapping — Spark's base64 inserts CRLF
    every 76 chars (RFC 2045); strip to get the canonical RFC 4648 form
    other engines (and DuckDB's base64) produce."""
    return F.regexp_replace(F.base64(col), "[\\r\\n]", "")


def binary_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Metadata-only view (no payload in the output → shuffle-free, scan
    stays pruned to the text column)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        _b64(payload).alias("payload_b64"),
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_codec():
    """Pure-stdlib PNG codec factory → (encode, decode).

    Lives in a factory ON PURPOSE: the returned functions are nested
    (non-importable), so cloudpickle ships them BY VALUE into executor
    Python workers — a module-level function pickles by reference and
    would require this package on the executor's sys.path (see the
    closure note on `fake_decode_features`).

    Scope: 8-bit greyscale (color type 0) and RGB (color type 2),
    non-interlaced — the full filter set (None/Sub/Up/Average/Paeth) is
    implemented on both sides, so decode genuinely reverses real PNG
    scanline prediction, not a fixture-shaped subset. Palette/16-bit/
    interlaced files still raise NotImplementedError: an honest gate,
    matching this container's no-codec-library constraint."""
    import struct
    import zlib

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    def encode(pixels: bytes, width: int, height: int,
               channels: int = 1, cycle_filters: bool = True) -> bytes:
        if len(pixels) != width * height * channels:
            raise ValueError("pixel buffer does not match dimensions")
        color_type = {1: 0, 3: 2}[channels]
        bpp = channels
        stride = width * channels
        raw = bytearray()
        prev = bytes(stride)
        for y in range(height):
            row = pixels[y * stride:(y + 1) * stride]
            ftype = (y % 5) if cycle_filters else 0
            raw.append(ftype)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 0:
                    v = row[x]
                elif ftype == 1:
                    v = row[x] - a
                elif ftype == 2:
                    v = row[x] - b
                elif ftype == 3:
                    v = row[x] - ((a + b) >> 1)
                else:
                    v = row[x] - paeth(a, b, c)
                raw.append(v & 0xFF)
            prev = row
        ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type,
                           0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    def decode(payload: bytes) -> tuple[int, int, int, bytes]:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG payload")
        pos, width, height, channels = 8, None, None, None
        idat = bytearray()
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4:pos + 8]
            body = payload[pos + 8:pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated PNG chunk")
            if tag == b"IHDR":
                width, height, depth, color_type, comp, filt, interlace = \
                    struct.unpack(">IIBBBBB", body)
                if depth != 8 or color_type not in (0, 2) or interlace:
                    raise NotImplementedError(
                        "only 8-bit grey/RGB non-interlaced PNG supported "
                        "without a codec library")
                channels = 1 if color_type == 0 else 3
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if width is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        raw = zlib.decompress(bytes(idat))
        bpp = channels
        stride = width * channels
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG scanline data does not match dimensions")
        out = bytearray()
        prev = bytes(stride)
        for y in range(height):
            ftype = raw[y * (stride + 1)]
            line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 2:
                    line[x] = (line[x] + b) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    line[x] = (line[x] + paeth(a, b, c)) & 0xFF
                elif ftype != 0:
                    raise ValueError(f"unknown PNG filter {ftype}")
            out.extend(line)
            prev = bytes(line)
        return width, height, channels, bytes(out)

    return encode, decode


encode_png, decode_png = _png_codec()


def decode_image(payload: bytes) -> tuple[int, int]:
    """(width, height) of an image payload. REAL for 8-bit grey/RGB PNG
    (stdlib zlib inflate + full scanline unfilter — see `_png_codec`)
    and for BASELINE sequential JPEG (pure-Python Huffman + IDCT —
    `multimodal/jpeg.py`; progressive/arithmetic still raise their own
    honest NotImplementedError inside the codec). Other formats need a
    codec library this container lacks and keep the honest gate (the
    deterministic fake below covers their plumbing tests)."""
    if payload[:8] == PNG_SIG:
        w, h, _, _ = decode_png(payload)
        return w, h
    if payload[:2] == b"\xFF\xD8":
        from cloud_native_mapreduce_spark.multimodal.jpeg import decode_jpeg
        w, h, _, _ = decode_jpeg(payload)
        return w, h
    raise NotImplementedError(
        "non-PNG/JPEG image decode requires a codec library; use "
        "fake_decode_features for plumbing tests")


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: derive a fake (width, height)
    from payload bytes. Same signature/shape a real decoder would have."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def fake_decode_features(with_payload: DataFrame,
                         batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real pattern for decode/resize/frame-sample at scale:
    per-partition streaming iterator, bounded pandas batches, explicit
    output schema, payload dropped from the output.

    NOTE: `extract` must be fully self-contained (no references to this
    module) — executor Python workers deserialize the closure by value and
    cannot import this package when the driver runs from an arbitrary cwd.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def fake_decode(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            return (n % 640) + 1, (n % 480) + 1

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                payloads = chunk["payload"]
                dims = [fake_decode(p) for p in payloads]
                yield _pd.DataFrame({
                    "doc_id": chunk["doc_id"].values,
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest()
                               for p in payloads],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                })

    from cloud_native_mapreduce_spark.sources.tables import fan_out
    return fan_out(with_payload.select("doc_id", "payload"), "doc_id") \
        .mapInPandas(extract, schema=FEATURE_SCHEMA)


def png_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL greyscale PNG payload (binary column), synthesized
    deterministically per doc: width = doc_id%5+4, height = doc_id%7+3,
    pixel[i] = (doc_id·31 + 7i) mod 256, encoded with the filter types
    CYCLING per scanline so downstream decode exercises all five PNG
    predictors. The arithmetic pixel formula is what makes a full
    value-level DuckDB oracle possible for a binary-codec pipeline.

    Scale posture: synthesis is a narrow mapInPandas (no shuffle); the
    payload column is a genuine opaque binary that crosses Spark, so
    the decode stage downstream reads exactly what a parquet-resident
    image column would look like."""
    enc = encode_png  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 5 + 4, d % 7 + 3
                px = bytes((d * 31 + 7 * i) % 256 for i in range(w * h))
                payloads.append(enc(px, w, h))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def image_decode_stats(with_png: DataFrame) -> DataFrame:
    """REAL image decode over a binary PNG column: stdlib inflate +
    unfilter per payload (see `_png_codec`), pixel stats out — the
    metadata-narrow output contract (never re-emit pixels through the
    shuffle). One Arrow batch in, one stats row per image out."""
    dec = decode_png  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "sum_px": [], "min_px": [], "max_px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, px = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
            yield _pd.DataFrame(rows)

    stats = with_png.mapInPandas(
        emit, schema="doc_id bigint, width bigint, height bigint, "
                     "sum_px bigint, min_px bigint, max_px bigint")
    # mean + rounding stay in Spark: F.round is HALF_UP like the oracle
    return stats.select(
        "doc_id", "width", "height",
        F.round(F.col("sum_px").cast("double")
                / (F.col("width") * F.col("height")), 4).alias("mean_px"),
        "min_px", "max_px")


def jpeg_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL baseline JPEG payload (binary column), synthesized
    deterministically per doc with the stdlib codec
    (`multimodal/jpeg.py`): smooth sinusoid patterns whose phase/dims
    derive from doc_id, cycling grey / RGB-4:4:4 / RGB-4:2:0 so the
    decode stage downstream exercises single-component scans,
    multi-component MCUs, and chroma upsampling. Same scale posture as
    `png_payloads`: narrow mapInPandas synthesis, opaque binary across
    Spark."""
    from cloud_native_mapreduce_spark.multimodal.jpeg import encode_jpeg
    return _jpeg_payloads_with(docs, encode_jpeg)


def _jpeg_payloads_with(docs: DataFrame, encoder) -> DataFrame:
    """Shared JPEG-corpus factory: one synthesis loop (per-doc pattern,
    quality 85, schema) parameterized only by the encoder function, so
    the baseline and progressive corpora can never drift apart."""
    enc = encoder  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, ch, sub, px = _jpeg_pattern(_np, d)
                payloads.append(enc(px.tobytes(), w, h, ch,
                                    quality=85, subsampling=sub))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def _jpeg_pattern_factory():
    """Deterministic per-doc test image generator: (w, h, channels,
    subsampling, uint8 array) as a pure function of doc_id — shared by
    the synthesis and verification stages (and stated by the SQL oracle
    for the metadata part). Nested so cloudpickle ships it BY VALUE
    (see the closure note on `fake_decode_features`)."""
    def pattern(np_mod, d: int):
        w = (d % 6) * 2 + 16
        h = (d % 4) * 2 + 12
        mode = d % 3               # 0: grey, 1: RGB 4:4:4, 2: RGB 4:2:0
        xx, yy = np_mod.meshgrid(np_mod.arange(w), np_mod.arange(h))
        base = 128.0 + 80.0 * np_mod.sin(xx / 7.0 + d % 10) \
            * np_mod.cos(yy / 5.0)
        if mode == 0:
            return w, h, 1, "444", base.astype(np_mod.uint8)
        rgb = np_mod.stack(
            [base, np_mod.flipud(base), np_mod.fliplr(base)],
            axis=-1).astype(np_mod.uint8)
        return w, h, 3, ("444" if mode == 1 else "420"), rgb
    return pattern


_jpeg_pattern = _jpeg_pattern_factory()


def jpeg_decode_stats(with_jpeg: DataFrame,
                      mean_err_bound: float = 8.0) -> DataFrame:
    """REAL JPEG decode over a binary column: per payload, full baseline
    entropy-decode + IDCT + color convert, then compare against the
    regenerated source pattern. Output is metadata-narrow (doc_id, dims,
    channels, recon_ok) — `recon_ok` is TRUE only when the decoded
    pixels sit within `mean_err_bound` mean-abs error of the original,
    so a Huffman/IDCT/upsample bug flips the value-level oracle, not
    just a pytest."""
    from cloud_native_mapreduce_spark.multimodal.jpeg import decode_jpeg
    dec = decode_jpeg
    pattern = _jpeg_pattern

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "channels": [], "recon_ok": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                w, h, c, px = dec(bytes(payload))
                ew, eh, ec, _, src = pattern(_np, d)
                got = _np.frombuffer(px, dtype=_np.uint8).astype(float)
                ok = (w, h, c) == (ew, eh, ec) and float(
                    _np.abs(got - src.astype(float).ravel()).mean()
                ) <= mean_err_bound
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["recon_ok"].append(bool(ok))
            yield _pd.DataFrame(rows)

    return with_jpeg.mapInPandas(
        emit, schema="doc_id bigint, width bigint, height bigint, "
                     "channels bigint, recon_ok boolean")


FRAME_CHARS = 64   # one "frame" = 64 characters of payload text
FRAME_STEP = 4     # sample every 4th frame

FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_sha string"


def frame_sample(docs: DataFrame, text_col: str = "text",
                 frame_chars: int = FRAME_CHARS,
                 step: int = FRAME_STEP) -> DataFrame:
    """Frame sampling: one input row → N sampled-frame rows through
    mapInPandas — the row-expansion shape of real video pipelines (a
    decoder yields frames; the engine fans them out). Frames here are
    deterministic 64-char windows of the payload text (the container has
    no video codec), hashed for content addressing; a real decoder swaps
    into `emit` without touching the Spark plumbing.

    Scale posture: expansion happens streaming inside the Python worker
    (never a driver-side explode of decoded frames); output carries only
    frame digests, not frame payloads — ship references, not pixels,
    through the shuffle.
    """

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n_frames = len(t) // frame_chars
                for i in range(0, n_frames, step):
                    frame = t[i * frame_chars:(i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(frame.encode("utf-8")).hexdigest())
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                 "frame_sha": shas})

    from cloud_native_mapreduce_spark.sources.tables import fan_out
    return fan_out(docs.select("doc_id", text_col), "doc_id").mapInPandas(
        emit, schema=FRAME_SCHEMA)


def resize_stub(with_payload: DataFrame, width: int = 256,
                height: int = 256) -> DataFrame:
    """Resize plumbing with the decode step stubbed: output schema,
    partitioning, and Arrow batching are real; the pixel transform
    raises until a codec exists (decode_image's NotImplementedError
    contract). The deterministic fake keeps the pipeline testable."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": width,
                "height": height,
                # fake "resized" content address: hash of payload + dims
                "resized_sha": [
                    hashlib.sha256(
                        p + f"{width}x{height}".encode()).hexdigest()
                    for p in pdf["payload"]],
            })

    return with_payload.select("doc_id", "payload").mapInPandas(
        emit, schema="doc_id bigint, width int, height int, "
                     "resized_sha string")


def audio_chunks(docs: DataFrame, chunk_bytes: int = 1024,
                 text_col: str = "text") -> DataFrame:
    """Audio-modality segmentation plumbing: split each opaque payload
    into fixed-size chunks with typed offsets — the shape of windowed
    audio feature extraction (the real decoder is env-gated, see
    `decode_image`; byte windows stand in for sample windows).

    Implemented with mapInPandas: one Arrow batch in, a chunk-table out;
    the emitted rows carry offsets + sizes, never the payload bytes, so
    the output is metadata-narrow no matter how large the media column
    is. Each input partition chunks independently — no shuffle."""
    import math

    from pyspark.sql import functions as _F  # noqa: N812

    src = with_binary_payload(docs, text_col).select("doc_id", "payload")

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, sizes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                # empty payload → zero chunks (matches the oracle's
                # generate_series(0, ceil(len/1024)-1), which emits no
                # rows at len=0 — a zero-length chunk is not a window)
                for i in range(math.ceil(n / chunk_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(i * chunk_bytes)
                    sizes.append(min(chunk_bytes, n - i * chunk_bytes))
            yield pd.DataFrame({"doc_id": ids, "chunk_idx": idxs,
                                "start_byte": starts, "n_bytes": sizes})

    return src.mapInPandas(
        emit, "doc_id long, chunk_idx long, start_byte long, n_bytes long")


def wav_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL RIFF/PCM16 WAV payload (binary column), synthesized
    deterministically per doc with the stdlib codec (`multimodal/wav.py`):
    a mono 8 kHz integer sawtooth — sample(i) = ((i·k) mod 2001) − 1000
    with k = 1 + doc_id mod 17, n_frames = 800 + (doc_id mod 32)·8. The
    all-integer waveform is what makes a full value-level DuckDB oracle
    possible for an audio pipeline: the oracle recomputes the samples
    from first principles with generate_series, no float DSP anywhere.
    Docs with doc_id ≡ 0 (mod 50) are encoded STEREO (the same waveform
    duplicated per channel) so downstream decode exercises interleaving.
    Same scale posture as `png_payloads`: narrow mapInPandas synthesis.
    """
    from cloud_native_mapreduce_spark.multimodal.wav import encode_wav
    enc = encode_wav  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 1 + d % 17
                n = 800 + (d % 32) * 8
                mono = [((i * k) % 2001) - 1000 for i in range(n)]
                if d % 50 == 0:
                    inter = [s for s in mono for _ in range(2)]
                    payloads.append(enc(inter, 8000, channels=2))
                else:
                    payloads.append(enc(mono, 8000, channels=1))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def audio_decode_stats(with_wav: DataFrame) -> DataFrame:
    """REAL audio decode over a binary WAV column: RIFF parse + PCM16
    unpack per payload (`multimodal/wav.py`), integer amplitude stats
    out — metadata-narrow, exactly the `image_decode_stats` contract
    for the audio modality. total_abs/peak are exact integers (summed
    over channel 0 only, so mono and stereo stats agree with the
    per-frame oracle); duration_ms divides by the DECODED per-payload
    sample_rate — any rate `encode_wav` supports gets a correct
    duration, not just the registry corpus's 8 kHz."""
    from cloud_native_mapreduce_spark.multimodal.wav import decode_wav
    dec = decode_wav  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "sample_rate": [], "channels": [],
                    "n_frames": [], "total_abs": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, n_frames, samples = dec(bytes(payload))
                ch0 = samples[::ch]
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n_frames)
                rows["total_abs"].append(sum(abs(s) for s in ch0))
                rows["peak"].append(max(abs(s) for s in ch0))
            yield _pd.DataFrame(rows)

    stats = with_wav.mapInPandas(
        emit, schema="doc_id bigint, sample_rate bigint, channels bigint, "
                     "n_frames bigint, total_abs bigint, peak bigint")
    return stats.select(
        "doc_id", "sample_rate", "channels", "n_frames",
        F.floor(F.col("n_frames") * 1000 / F.col("sample_rate"))
        .cast("bigint")
        .alias("duration_ms"), "total_abs", "peak")


def y4m_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL YUV4MPEG2 video payload (binary column),
    synthesized deterministically per doc with the stdlib codec
    (`multimodal/y4m.py`): width = 8 + (doc_id%4)·2, height = 6 +
    (doc_id%3)·2, n_frames = 4 + doc_id%6, luma(f, i) =
    (doc_id·13 + f·31 + i·7) mod 256. Docs with doc_id ≡ 0 (mod 40)
    encode C420 (neutral chroma planes) so decode exercises the
    subsampled-frame layout; the rest are Cmono. The all-integer luma
    formula is what makes a full value-level DuckDB oracle possible for
    a VIDEO pipeline. Narrow mapInPandas synthesis, no shuffle."""
    from cloud_native_mapreduce_spark.multimodal.y4m import encode_y4m
    enc = encode_y4m  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + (d % 4) * 2, 6 + (d % 3) * 2
                nf = 4 + d % 6
                frames = [bytes((d * 13 + f * 31 + i * 7) % 256
                                for i in range(w * h))
                          for f in range(nf)]
                cs = "420jpeg" if d % 40 == 0 else "mono"
                payloads.append(enc(frames, w, h, colorspace=cs))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def video_frame_stats(with_y4m: DataFrame,
                      frame_stride: int = 2) -> DataFrame:
    """REAL video decode + frame sampling over a binary Y4M column:
    parse the stream framing (`multimodal/y4m.py`), keep every
    `frame_stride`-th frame — the standard training-data frame-sample
    step — and emit exact integer luma stats per sampled frame.
    Metadata-narrow output (stats, never pixels), one Arrow batch in,
    a frame-table out, no shuffle."""
    from cloud_native_mapreduce_spark.multimodal.y4m import decode_y4m
    dec = decode_y4m  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "width": [],
                    "height": [], "n_frames": [], "luma_sum": [],
                    "luma_min": [], "luma_max": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, _, frames = dec(bytes(payload))
                for idx in range(0, len(frames), frame_stride):
                    luma = frames[idx]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(len(frames))
                    rows["luma_sum"].append(sum(luma))
                    rows["luma_min"].append(min(luma))
                    rows["luma_max"].append(max(luma))
            yield _pd.DataFrame(rows)

    return with_y4m.mapInPandas(
        emit, schema="doc_id bigint, frame_idx bigint, width bigint, "
                     "height bigint, n_frames bigint, luma_sum bigint, "
                     "luma_min bigint, luma_max bigint")


def g711_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL G.711 companded WAV payload (binary column):
    format code 7 (µ-law, even docs) or 6 (A-law, odd docs), mono
    8 kHz, with the companded CODE bytes generated deterministically —
    code(i) = (i·k + doc_id) mod 256, k = 1 + doc_id mod 13,
    n = 400 + (doc_id mod 25)·8 frames. Generating codes (not linear
    samples) means only the EXPANSION needs an oracle: the registry
    replays the ITU segment/mantissa integer formulas in SQL and the
    decode path (`wav.mulaw_to_linear`/`alaw_to_linear`) is checked to
    the LSB. Same narrow mapInPandas shape as `wav_payloads`."""
    from cloud_native_mapreduce_spark.multimodal.wav import encode_wav_g711
    enc = encode_wav_g711  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 1 + d % 13
                n = 400 + (d % 25) * 8
                codes = [(i * k + d) % 256 for i in range(n)]
                law = "mulaw" if d % 2 == 0 else "alaw"
                payloads.append(enc(codes, 8000, channels=1, law=law))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def adpcm_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL mono IMA ADPCM WAV payload (format 0x11, one
    block): header predictor ((doc_id·37 mod 4001) − 2000), step index
    doc_id mod 89, and m = 60 + (doc_id mod 16)·2 deterministic nibble
    bytes ((i·k + doc_id) mod 256, k = 1 + doc_id mod 13). Carrying
    raw nibbles (not an encoded waveform) means only the DECODER state
    machine needs an oracle — the registry replays it with a recursive
    CTE; the real compressor is exercised by the pytest roundtrip."""
    from cloud_native_mapreduce_spark.multimodal.wav import encode_wav_ima
    enc = encode_wav_ima  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 1 + d % 13
                m = 60 + (d % 16) * 2
                data = bytes((i * k + d) % 256 for i in range(m))
                payloads.append(enc(((d * 37) % 4001) - 2000,
                                    d % 89, data, 8000))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def float_wav_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL IEEE float32 PCM WAV payload (format 3), mono
    8 kHz: sample(i) = m/64 with m = ((i·k + doc_id) mod 129) − 64,
    k = 1 + doc_id mod 13, n = 320 + (doc_id mod 40)·8 frames. Every
    m/64 is exactly representable in float32 and m·32767/64 exactly in
    float64, so the decode-side int16 conversion floor(f·32767 + 0.5)
    is integer-exact in BOTH engines and the oracle replays it in SQL
    with no float tolerance anywhere."""
    from cloud_native_mapreduce_spark.multimodal.wav import encode_wav_float32
    enc = encode_wav_float32  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 1 + d % 13
                n = 320 + (d % 40) * 8
                vals = [(((i * k + d) % 129) - 64) / 64.0
                        for i in range(n)]
                payloads.append(enc(vals, 8000, channels=1))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def jpeg_progressive_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL progressive (SOF2) JPEG payload: the SAME per-doc
    patterns, quality, and synthesis loop as `jpeg_payloads` (one
    shared factory — only the encoder differs), encoded with the
    progressive scan script. Because baseline and progressive share
    the DCT/quantization front half, both payloads decode to
    byte-identical pixels — so the SAME dims+recon_ok oracle applies,
    and the progressive entropy decoder gets its own end-to-end value
    check."""
    from cloud_native_mapreduce_spark.multimodal.jpeg import \
        encode_jpeg_progressive
    return _jpeg_payloads_with(docs, encode_jpeg_progressive)


def gif_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL GIF89a payload (binary column), synthesized
    deterministically per doc: width = doc_id%7+6, height = doc_id%5+5,
    palette size cycling 4/8/16, index[i] = (doc_id·37 + 11i) mod
    n_colors, and every ODD doc interlaced (Appendix-E four-pass row
    order) so the decode stage downstream must genuinely de-interlace.
    GIF is LOSSLESS, so unlike JPEG the downstream oracle states exact
    pixel statistics — including a position-weighted checksum no
    order-insensitive stat could pin."""
    from cloud_native_mapreduce_spark.multimodal.gif import encode_gif
    enc = encode_gif  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 7 + 6, d % 5 + 5
                nc = (4, 8, 16)[d % 3]
                idx = bytes((d * 37 + 11 * i) % nc
                            for i in range(w * h))
                payloads.append(enc(idx, w, h, nc,
                                    interlace=bool(d % 2)))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def gif_decode_stats(with_gif: DataFrame) -> DataFrame:
    """REAL GIF decode over a binary column: LZW decompress +
    de-interlace per payload (`multimodal/gif.py`), exact index-stream
    stats out — sum/min/max plus checksum = Σ (i+1)·px[i] mod 1e9+7
    over the ROW-MAJOR stream, the position-sensitive statistic that
    catches a de-interlace or dictionary-rebuild bug the
    order-insensitive sums cannot. Metadata-narrow output; pixels
    never cross the shuffle."""
    from cloud_native_mapreduce_spark.multimodal.gif import decode_gif
    dec = decode_gif  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "n_colors": [], "sum_px": [], "min_px": [],
                    "max_px": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, nc, px, _pal = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_colors"].append(nc)
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["checksum"].append(
                    sum((i + 1) * v for i, v in enumerate(px))
                    % 1000000007)
            yield _pd.DataFrame(rows)

    return with_gif.mapInPandas(
        emit, schema="doc_id bigint, width bigint, height bigint, "
                     "n_colors bigint, sum_px bigint, min_px bigint, "
                     "max_px bigint, checksum bigint")


def mp3_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL MPEG-1 Layer III byte stream (binary column),
    synthesized deterministically per doc (`multimodal/mp3.py`):
    n_frames = 2 + doc_id mod 6, sample-rate index doc_id mod 3,
    padding alternates per frame, and docs with doc_id ≡ 0 (mod 4)
    are VBR — frame i uses bitrate index 1 + (doc_id + i) mod 14,
    others CBR at index 1 + doc_id mod 14. Every 10th doc carries a
    leading ID3v2 tag of (doc_id mod 64) bytes so the parser's
    syncsafe skip is exercised. All-integer synthesis — the stats
    oracle recomputes every field from these formulas."""
    from cloud_native_mapreduce_spark.multimodal.mp3 import encode_mp3
    enc = encode_mp3  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 2 + d % 6
                si = d % 3
                frames = []
                for i in range(n):
                    bi = 1 + ((d + i) % 14 if d % 4 == 0 else d % 14)
                    frames.append((bi, si, i % 2))
                payloads.append(enc(
                    frames, fill=d % 256,
                    id3_size=(d % 64) if d % 10 == 0 else 0,
                    channels=2 if d % 7 == 0 else 1))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def mp3_frame_stats(with_mp3: DataFrame) -> DataFrame:
    """REAL MPEG frame-header walk over a binary MP3 column
    (`multimodal/mp3.py`): sync-validated frame stepping, ID3v2 skip,
    exact integer stream stats — the ffprobe-style inventory pass a
    100 TB audio curation pipeline runs before any costly decode.
    Metadata-narrow mapInPandas, linear in bytes."""
    from cloud_native_mapreduce_spark.multimodal.mp3 import parse_mp3
    dec = parse_mp3  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "n_bytes": [],
                    "sample_rate": [], "channels": [],
                    "avg_bitrate_kbps": [], "is_vbr": [],
                    "duration_ms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                (n_frames, n_bytes, sr, ch, kbps, vbr,
                 dur) = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["n_frames"].append(n_frames)
                rows["n_bytes"].append(n_bytes)
                rows["sample_rate"].append(sr)
                rows["channels"].append(ch)
                rows["avg_bitrate_kbps"].append(kbps)
                rows["is_vbr"].append(vbr)
                rows["duration_ms"].append(dur)
            yield _pd.DataFrame(rows)

    return with_mp3.mapInPandas(
        emit, schema="doc_id bigint, n_frames bigint, n_bytes bigint, "
                     "sample_rate bigint, channels bigint, "
                     "avg_bitrate_kbps bigint, is_vbr boolean, "
                     "duration_ms bigint")


def tiff_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL baseline TIFF payload (binary column), synthesized
    deterministically per doc (`multimodal/tiff.py`): width = 8 +
    doc_id mod 13, height = 6 + doc_id mod 9, integer raster
    px(x, y) = (doc_id + 3x + 5y) mod 256, LZW-compressed
    (compression 5) for doc_id ≡ 0 (mod 3) else uncompressed,
    big-endian every 7th doc, rows_per_strip 4 — multi-strip,
    both byte orders, and both codings all exercised. All-integer, so
    the stats oracle can replay the raster from first principles."""
    from cloud_native_mapreduce_spark.multimodal.tiff import encode_tiff
    enc = encode_tiff  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 13, 6 + d % 9
                px = [(d + 3 * x + 5 * y) % 256
                      for y in range(h) for x in range(w)]
                payloads.append(enc(
                    w, h, px,
                    compression=5 if d % 3 == 0 else 1,
                    big_endian=(d % 7 == 0),
                    rows_per_strip=4))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def tiff_decode_stats(with_tiff: DataFrame) -> DataFrame:
    """REAL TIFF decode over a binary column (`multimodal/tiff.py`):
    IFD walk + strip reassembly + TIFF-LZW expansion, exact integer
    luma stats out — the `image_decode_stats` contract for the TIFF
    modality. Metadata-narrow mapInPandas, linear in bytes."""
    from cloud_native_mapreduce_spark.multimodal.tiff import decode_tiff
    dec = decode_tiff  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "compression": [], "luma_sum": [], "luma_min": [],
                    "luma_max": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, comp, px = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["compression"].append(comp)
                rows["luma_sum"].append(sum(px))
                rows["luma_min"].append(min(px))
                rows["luma_max"].append(max(px))
            yield _pd.DataFrame(rows)

    return with_tiff.mapInPandas(
        emit, schema="doc_id bigint, width bigint, height bigint, "
                     "compression bigint, luma_sum bigint, "
                     "luma_min bigint, luma_max bigint")


def bmp_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL 8-bit BMP payload (binary column), synthesized
    deterministically per doc (`multimodal/bmp.py`): width = 9 +
    doc_id mod 12, height = 5 + doc_id mod 8, 16-gray palette,
    top-down raster px(x, y) = ((x div 3) + y + doc_id) mod 16 (the
    div-3 bands give RLE8 real runs to compress), BI_RLE8 for even
    doc_ids / BI_RGB (4-byte row padding) for odd — both codings and
    the bottom-up row convention exercised. All-integer, so the
    stats oracle replays the raster from first principles."""
    from cloud_native_mapreduce_spark.multimodal.bmp import encode_bmp
    enc = encode_bmp  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 12, 5 + d % 8
                px = [((x // 3) + y + d) % 16
                      for y in range(h) for x in range(w)]
                payloads.append(enc(w, h, px, n_colors=16,
                                    rle=(d % 2 == 0)))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def bmp_decode_stats(with_bmp: DataFrame) -> DataFrame:
    """REAL BMP decode over a binary column (`multimodal/bmp.py`):
    header/palette parse + BI_RLE8 expansion (full escape grammar)
    or padded-row unpack, bottom-up reassembly, exact integer index
    stats INCLUDING a position-weighted checksum — BMP is lossless,
    the `gif_decode_stats` contract. Metadata-narrow mapInPandas,
    linear in bytes."""
    from cloud_native_mapreduce_spark.multimodal.bmp import decode_bmp
    dec = decode_bmp  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "compression": [], "n_colors": [], "sum_px": [],
                    "min_px": [], "max_px": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, comp, nc, px = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["compression"].append(comp)
                rows["n_colors"].append(nc)
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["checksum"].append(
                    sum((i + 1) * v for i, v in enumerate(px))
                    % 1000000007)
            yield _pd.DataFrame(rows)

    return with_bmp.mapInPandas(
        emit, schema="doc_id bigint, width bigint, height bigint, "
                     "compression bigint, n_colors bigint, "
                     "sum_px bigint, min_px bigint, max_px bigint, "
                     "checksum bigint")


def pnm_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL netpbm payload (binary column), synthesized
    deterministically per doc (`multimodal/pnm.py`): magic cycles
    P2 (plain ASCII) / P5 (raw gray) / P6 (raw RGB) by doc_id mod 3;
    width = 7 + d mod 9, height = 4 + d mod 6; maxval 255 except
    P5 docs with d mod 4 == 1, which use 1000 to exercise the
    2-byte big-endian sample path; sample(i) = (d + 7i) mod
    (maxval+1). A `#` comment is planted in every header. All-
    integer, so the stats oracle replays the raster from first
    principles."""
    from cloud_native_mapreduce_spark.multimodal.pnm import encode_pnm
    enc = encode_pnm  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                magic = ("P2", "P5", "P6")[d % 3]
                w, h = 7 + d % 9, 4 + d % 6
                maxval = 1000 if (magic == "P5" and d % 4 == 1) else 255
                per_px = 3 if magic == "P6" else 1
                n = w * h * per_px
                samples = [(d + 7 * i) % (maxval + 1) for i in range(n)]
                payloads.append(enc(magic, w, h, maxval, samples))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def pnm_decode_stats(with_pnm: DataFrame) -> DataFrame:
    """REAL netpbm decode over a binary column (`multimodal/pnm.py`):
    comment-aware tokenized header parse, then ASCII-token or raw
    (1/2-byte big-endian) raster read; exact integer sample stats
    INCLUDING a position-weighted checksum — netpbm is lossless, the
    gif/bmp contract. Metadata-narrow mapInPandas, linear in
    bytes."""
    from cloud_native_mapreduce_spark.multimodal.pnm import decode_pnm
    dec = decode_pnm  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "magic": [], "width": [],
                    "height": [], "maxval": [], "n_samples": [],
                    "sum_px": [], "min_px": [], "max_px": [],
                    "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                magic, w, h, mv, px = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["magic"].append(magic)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(mv)
                rows["n_samples"].append(len(px))
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["checksum"].append(
                    sum((i + 1) * v for i, v in enumerate(px))
                    % 1000000007)
            yield _pd.DataFrame(rows)

    return with_pnm.mapInPandas(
        emit, schema="doc_id bigint, magic string, width bigint, "
                     "height bigint, maxval bigint, n_samples bigint, "
                     "sum_px bigint, min_px bigint, max_px bigint, "
                     "checksum bigint")


def tga_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL Truevision TGA payload (binary column),
    synthesized deterministically per doc (`multimodal/tga.py`):
    imageType cycles 2 (uncompressed BGR) / 10 (RLE BGR) / 3
    (uncompressed gray) by doc_id mod 3; width = 5 + d mod 8,
    height = 3 + d mod 5; rows stored BOTTOM-UP when d is even
    (exercising the descriptor-bit flip) and a 4-byte ID field is
    always planted (exercising the header skip). Channel samples in
    normalized top-down RGB order: RLE docs use the run-raw
    alternation law v(i) = (d + 9·(i DIV 12) + 13·[(i DIV 3) mod
    4 = 3]) mod 256 — pixels come in 3-long runs separated by one
    unique pixel, so the stream provably contains BOTH packet kinds
    (pinned in tests) — and (d + 5·i) mod 256 otherwise.
    All-integer, so the stats oracle replays the raster from first
    principles."""
    from cloud_native_mapreduce_spark.multimodal.tga import encode_tga
    enc = encode_tga  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                itype = (2, 10, 3)[d % 3]
                w, h = 5 + d % 8, 3 + d % 5
                per_px = 3 if itype in (2, 10) else 1
                n = w * h * per_px
                if itype == 10:
                    samples = [
                        (d + 9 * (i // 12)
                         + (13 if (i // 3) % 4 == 3 else 0)) % 256
                        for i in range(n)]
                else:
                    samples = [(d + 5 * i) % 256 for i in range(n)]
                payloads.append(
                    enc(itype, w, h, samples, top_down=bool(d % 2)))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def tga_decode_stats(with_tga: DataFrame) -> DataFrame:
    """REAL TGA decode over a binary column (`multimodal/tga.py`):
    LE fixed-struct header, ID-field skip, BGR→RGB reorder,
    bottom-up→top-down row flip, raw or RLE pixel stream; exact
    integer channel stats INCLUDING a position-weighted checksum
    over the NORMALIZED sample order — any orientation, reorder, or
    RLE bug breaks it. Metadata-narrow mapInPandas, linear in
    bytes."""
    from cloud_native_mapreduce_spark.multimodal.tga import decode_tga
    dec = decode_tga  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "image_type": [], "width": [],
                    "height": [], "depth": [], "n_samples": [],
                    "sum_px": [], "min_px": [], "max_px": [],
                    "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                itype, w, h, depth, px = dec(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["image_type"].append(itype)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["depth"].append(depth)
                rows["n_samples"].append(len(px))
                rows["sum_px"].append(sum(px))
                rows["min_px"].append(min(px))
                rows["max_px"].append(max(px))
                rows["checksum"].append(
                    sum((i + 1) * v for i, v in enumerate(px))
                    % 1000000007)
            yield _pd.DataFrame(rows)

    return with_tga.mapInPandas(
        emit, schema="doc_id bigint, image_type bigint, width bigint, "
                     "height bigint, depth bigint, n_samples bigint, "
                     "sum_px bigint, min_px bigint, max_px bigint, "
                     "checksum bigint")


def aiff_payloads(docs: DataFrame) -> DataFrame:
    """doc_id → REAL FORM/AIFF payload (binary column), synthesized
    deterministically per doc with the stdlib codec
    (`multimodal/aiff.py`): an 11 025 Hz integer sawtooth —
    sample(i) = ((i·k) mod 1601) − 800 with k = 1 + doc_id mod 13,
    n_frames = 600 + (doc_id mod 24)·10. Docs with doc_id ≡ 0
    (mod 40) are encoded STEREO (same waveform per channel) so decode
    exercises big-endian interleaving. The all-integer waveform makes
    the full value-level DuckDB oracle possible (the `wav_payloads`
    posture); 11 025 exercises the extended-80 rate field with a
    non-power-of-two. Narrow mapInPandas synthesis, no shuffle."""
    from cloud_native_mapreduce_spark.multimodal.aiff import encode_aiff
    enc = encode_aiff  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 1 + d % 13
                n = 600 + (d % 24) * 10
                mono = [((i * k) % 1601) - 800 for i in range(n)]
                if d % 40 == 0:
                    inter = [s for s in mono for _ in range(2)]
                    payloads.append(enc(inter, 11025, channels=2))
                else:
                    payloads.append(enc(mono, 11025, channels=1))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                 "payload": payloads})

    return _doc_ids(docs).mapInPandas(
        emit, schema="doc_id bigint, payload binary")


def aiff_decode_stats(with_aiff: DataFrame) -> DataFrame:
    """REAL AIFF decode over a binary column: IFF chunk walk +
    extended-80 rate decode + big-endian PCM16 unpack
    (`multimodal/aiff.py`), exact integer amplitude stats out —
    the `audio_decode_stats` contract for the AIFF container
    (channel-0 stats so mono/stereo agree with the per-frame
    oracle; duration from the DECODED rate)."""
    from cloud_native_mapreduce_spark.multimodal.aiff import decode_aiff
    dec = decode_aiff  # nested fn → cloudpickle ships it by value

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "sample_rate": [], "channels": [],
                    "n_frames": [], "total_abs": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, n_frames, samples = dec(bytes(payload))
                ch0 = samples[::ch]
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(n_frames)
                rows["total_abs"].append(sum(abs(s) for s in ch0))
                rows["peak"].append(max(abs(s) for s in ch0))
            yield _pd.DataFrame(rows)

    stats = with_aiff.mapInPandas(
        emit, schema="doc_id bigint, sample_rate bigint, "
                     "channels bigint, n_frames bigint, "
                     "total_abs bigint, peak bigint")
    return stats.select(
        "doc_id", "sample_rate", "channels", "n_frames",
        F.floor(F.col("n_frames") * 1000 / F.col("sample_rate"))
        .cast("bigint")
        .alias("duration_ms"), "total_abs", "peak")
