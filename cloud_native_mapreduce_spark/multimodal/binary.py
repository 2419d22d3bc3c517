"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so DECODE IS STUBBED — but the
Spark-side machinery a 100 TB multimodal pipeline needs is real and tested:
  * binary columns with deterministic metadata (byte length, content hash,
    base64 transport encoding) — all JVM-side;
  * Arrow-batched `mapInPandas` feature extraction with an explicit output
    schema and bounded batch size (the pattern for real decoders);
  * a deterministic fake "decoder" so the distributed plumbing is
    verifiable end-to-end without codec libraries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id bigint, n_bytes bigint, sha256 string, "
                  "fake_width bigint, fake_height bigint")


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


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: real implementation needs an image codec (PIL/opencv), which
    is not in this container. The deterministic fake below keeps the
    distributed plumbing testable."""
    raise NotImplementedError(
        "image decode requires a codec library; use fake_decode_features "
        "for plumbing tests")


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

    return with_payload.select("doc_id", "payload") \
                       .mapInPandas(extract, schema=FEATURE_SCHEMA)


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

    return docs.select("doc_id", text_col).mapInPandas(
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

    return (src.mapInPandas(
        emit, "doc_id long, chunk_idx long, start_byte long, n_bytes long")
        .orderBy("doc_id", "chunk_idx"))
