"""Text normalization for corpus cleaning: NFC + control strip +
whitespace collapse.

Standard pre-tokenization hygiene for a training pipeline (C4/Gopher
lineage): Unicode NFC so visually-identical strings hash identically
(composed é vs e+COMBINING ACUTE are different bytes → different dedup
digests, different n-grams), control characters stripped, runs of
whitespace collapsed, edges trimmed.

Split by engine capability:

- control strip + whitespace collapse are JVM ``regexp_replace`` chains
  (whole-stage codegen, no Python);
- NFC has no Spark SQL builtin → Arrow-batched pandas UDF over
  ``str.normalize`` (vectorized in pandas). DuckDB has
  ``nfc_normalize`` natively, which is what makes the full chain
  value-checkable by the driver oracle — a rare case of an
  oracle-checked pandas UDF.

Ordering note: NFC runs FIRST so the regex passes see composed
characters; the control/whitespace classes are ASCII-only and NFC never
maps anything into ASCII control space, so the chain is stable (a
second application is a no-op — idempotence is property-tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ASCII control chars except \t \n \r (which are whitespace, handled next)
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# any whitespace run -> single space (explicit class: identical semantics
# in Java regex and RE2, unlike \s whose Unicode coverage differs)
_WS_CLASS = r"[\t\n\r\x0B\x0C ]+"


def _nfc_batch(texts: pd.Series) -> pd.Series:
    # pandas .str.normalize is vectorized unicodedata.normalize
    return texts.astype("string").str.normalize("NFC").astype(object)


nfc_udf = F.pandas_udf(_nfc_batch, returnType=T.StringType())


def normalize_text_col(text: Column) -> Column:
    """NFC → strip controls → collapse whitespace → trim, null-safe."""
    c = nfc_udf(text)
    c = F.regexp_replace(c, _CONTROL_CLASS, "")
    c = F.regexp_replace(c, _WS_CLASS, " ")
    return F.trim(c)


def with_normalized_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Map-only normalization column; one ArrowEvalPython node (NFC) and
    a codegen'd regex chain — no shuffle, scale-free."""
    return df.withColumn(out_col, normalize_text_col(F.col(text_col)))


def normalize_oracle_expr(text_sql: str) -> str:
    """The DuckDB-side twin of :func:`normalize_text_col` (RE2 classes
    chosen to match Java regex semantics exactly)."""
    c = f"nfc_normalize({text_sql})"
    c = f"regexp_replace({c}, '{_CONTROL_CLASS}', '', 'g')"
    c = f"regexp_replace({c}, '{_WS_CLASS}', ' ', 'g')"
    return f"trim({c})"
