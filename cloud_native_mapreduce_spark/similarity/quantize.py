"""Embedding quantization: int8 symmetric per-vector quantization.

North-star scope (no reference analogue — the reference has no vector
surface at all): storing 100 TB of float32 embeddings at int8 cuts the
footprint 4× and is the standard serving trick (FAISS `SQ8`, the
quantization step of every production ANN index). The quantization
itself is a narrow per-row transform — no shuffle, no Python: one JVM
higher-order-function pass per vector, so it runs at scan speed and
composes with any downstream ANN operator.

Engine-portability contract (the reason for the exact formulas):
  * floats are widened to DOUBLE before ANY arithmetic — a float32
    value widens exactly, so both engines compute on identical bits;
  * the int8 code is `floor(x/scale + 0.5)` — written out instead of
    `round()` because round()'s half-case differs between engines
    (banker's vs away-from-zero) while floor(+0.5) is identical;
  * the max element quantizes to exactly ±127 by construction
    (x == max|x| → x/scale == 127.0 exactly — a double divided by
    itself-over-127), so the guard rail is structural, not rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: int8 symmetric range: codes in [-127, 127] (the -128 slot unused so
#: the codebook is symmetric — the same convention FAISS SQ8 uses).
INT8_MAX = 127.0


def quantize_int8(embeddings: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-vector int8 symmetric quantization summary:
    (id, scale, q_sum, n_zero, q_max).

    scale = max|x| / 127; code_i = floor(x_i/scale + 0.5). All-zero
    vectors get scale 0 and all-zero codes (guarded CASE — no NaN from
    0/0). Returns code AGGREGATES rather than the code array so the
    result is value-checkable: q_sum pins every element's signed value,
    n_zero pins the dead-zone population, q_max pins the range contract
    (always 127 for non-degenerate vectors).
    """
    emb_d = F.expr(
        f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_xs")
    staged = embeddings.select(F.col(id_col), emb_d).select(
        id_col, "_xs",
        (F.array_max(F.expr("transform(_xs, x -> abs(x))"))
         / F.lit(INT8_MAX)).alias("_scale"))
    q = ("CASE WHEN _scale = 0.0 THEN 0 "
         "ELSE CAST(floor({x}/_scale + 0.5) AS BIGINT) END")
    return staged.select(
        id_col,
        (F.round("_scale", 6) + F.lit(0.0)).alias("scale"),
        F.expr("aggregate(_xs, CAST(0 AS BIGINT), "
               f"(a, x) -> a + {q.format(x='x')})").alias("q_sum"),
        F.expr("aggregate(_xs, CAST(0 AS BIGINT), (a, x) -> a + "
               f"CASE WHEN {q.format(x='x')} = 0 THEN 1 ELSE 0 END)")
         .alias("n_zero"),
        F.expr("aggregate(_xs, CAST(0 AS BIGINT), (a, x) -> "
               f"greatest(a, abs({q.format(x='x')})))").alias("q_max"))
