"""Bloom-filter membership prefilter (broadcast bitset probe).

Incremental dedup against a historical store (operators/incremental.py)
pays a shuffle-join against history for every batch.  At 10^12 turns the
overwhelmingly common case is "this digest was never seen" — exactly
what a Bloom filter answers with a bounded bitset and zero shuffle.
This module builds the filter as a distributed aggregation and probes it
map-only:

* **build**: digest rows explode into ``n_hashes`` bit positions
  (md5-nibble arithmetic — SQL-reproducible, see below), which reduce to
  ``m_bits / 32`` packed words via per-bucket ``bit_or`` with map-side
  partial aggregation.  The finished bitset is O(m_bits) — *independent
  of data size* — and is collected to the driver exactly like Spark's
  own runtime-filter bloom join collects its aggregated sketch.
* **probe**: the bitset ships as a broadcast literal array; each probe
  row checks its ``n_hashes`` bits with ``element_at`` + ``&`` inside
  whole-stage codegen.  Scan → project, no shuffle, no Python.

A negative answer is definitive (no false negatives), so the store join
only runs for the ``maybe_seen`` minority; false-positive rate is the
standard ``(1 - e^{-kn/m})^k``.

Words are 32-bit (stored in BIGINT) rather than 64-bit on purpose: the
max shift is 31, so masks stay positive and every construct —
``instr``/``substr``/``md5``/``%``/``//``/``<<``/``&``/``bit_or`` —
evaluates identically in Spark SQL and DuckDB (DuckDB raises on the
``1 << 63`` signed overflow a 64-bit word layout would need).  That
makes the whole operator value-checkable by the driver oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bit_position_exprs", "bloom_build", "bloom_probe"]

_WORD = 32  # bits per packed word; max shift 31 keeps masks positive


def _nibble(j: int, col: str) -> str:
    """0-based hex digit ``j`` of the md5 column as an int (0..15) —
    shared verbatim with the DuckDB oracle (same trick as
    operators/dedup.simhash_block_expr)."""
    return f"(instr('0123456789abcdef', substr({col}, {j + 1}, 1)) - 1)"


def bit_position_exprs(n_hashes: int, m_bits: int, col: str = "h") -> list[str]:
    """SQL expressions for the ``n_hashes`` bloom bit positions of an
    md5-hex column: hash ``j`` reads hex digits ``5j..5j+4`` as a 20-bit
    integer mod ``m_bits``.  Pure arithmetic over ``instr``/``substr``,
    identical in Spark SQL and DuckDB."""
    if not 1 <= n_hashes <= 6:
        raise ValueError("n_hashes must be in 1..6 (md5 has 32 hex digits)")
    if not 64 <= m_bits <= (1 << 20):
        raise ValueError("m_bits must be in [64, 2^20] (5 nibbles = 20 bits)")
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of {_WORD}")
    out = []
    for j in range(n_hashes):
        digits = " + ".join(
            f"({_nibble(5 * j + i, col)} * {16 ** (4 - i)})" for i in range(5)
        )
        out.append(f"(({digits}) % {m_bits})")
    return out


def bit_position_expr_at(col: str, j: str, m_bits: int) -> str:
    """Like :func:`bit_position_exprs` but with the hash index ``j`` as a
    SQL expression (for oracle queries that UNNEST over hash indexes)."""
    digits = " + ".join(
        f"((instr('0123456789abcdef', substr({col}, 5*({j}) + {i + 1}, 1)) - 1)"
        f" * {16 ** (4 - i)})"
        for i in range(5)
    )
    return f"(({digits}) % {m_bits})"


def bloom_build(
    df: DataFrame,
    key_col: str = "text",
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> list[int]:
    """Aggregate ``df[key_col]`` into a dense bloom bitset.

    Returns ``m_bits / 32`` packed words as a Python list — a bounded
    O(m_bits) driver transfer (16 KiB at the 2^17 default) regardless of
    input size; the heavy lifting is a single partial→final ``bit_or``
    aggregation over 8-byte position longs.
    """
    exprs = bit_position_exprs(n_hashes, m_bits, col="h")
    pos = (
        df.select(F.md5(F.col(key_col)).alias("h"))
        .select(F.explode(F.array(*[F.expr(e).cast("long") for e in exprs])).alias("p"))
    )
    rows = (
        pos.select(
            F.expr(f"CAST(p div {_WORD} AS INT)").alias("bucket"),
            F.expr(f"CAST(1 AS BIGINT) << CAST(p % {_WORD} AS INT)").alias("mask"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // _WORD)
    for r in rows:
        dense[r["bucket"]] = r["bits"]
    return dense


def bloom_probe(
    df: DataFrame,
    bits: list[int],
    key_col: str = "text",
    n_hashes: int = 3,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: True iff every bloom bit for ``key_col`` is
    set in ``bits`` (from :func:`bloom_build`).  Map-only: the bitset is
    a broadcast literal array and each check is ``element_at`` + ``&``
    inside codegen.  ``False`` is definitive (no false negatives)."""
    m_bits = len(bits) * _WORD
    arr = F.lit(bits).cast("array<bigint>")
    checks: list[Column] = []
    for e in bit_position_exprs(n_hashes, m_bits, col=f"md5({key_col})"):
        word = F.element_at(arr, F.expr(f"CAST(({e}) div {_WORD} AS INT)") + 1)
        mask = F.expr(f"CAST(1 AS BIGINT) << CAST(({e}) % {_WORD} AS INT)")
        checks.append(word.bitwiseAND(mask) != 0)
    return df.withColumn(out_col, reduce(lambda a, b: a & b, checks))
