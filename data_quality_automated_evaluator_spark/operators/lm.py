"""Corpus-trained char-bigram language model: distributed training +
broadcast scoring.

The embedded scorer (functions/perplexity.py) trains its LM at import
time on a fixed corpus — right for a portable keep/drop rule, wrong
when the pipeline should score text against *its own* domain (the
CCNet recipe: train the LM on the target corpus, tier everything else
by perplexity under it). This module trains the same 49-class bigram
model FROM a DataFrame:

- **training** is one map-side pass: ``mapInPandas`` turns each Arrow
  batch into its 49×49 bigram-count matrix with the same vectorized
  buffer trick the scorer uses (prefix → NUL-strip → utf-8 bytes →
  byte-class → pair counts, separator bigrams masked so texts never
  leak into each other), emitting ≤2401 sparse (prev, cur, c) rows per
  batch; a groupBy sums them and the driver collects at most 49×49
  rows no matter the corpus size. At 100 TB this is a pure map +
  2401-key aggregate — no shuffle of text, no driver bottleneck.
- **scoring** broadcasts the ~19 KB log-prob matrix inside a pandas-UDF
  closure and reuses the scorer core
  (functions/perplexity.score_logprob_batch), so batch-boundary
  invariance and the PPL_MAX sentinel are inherited, not re-implemented.

Smoothing parity with the embedded LM and the SQL oracle: add-one —
``ln((1 + c[i,j]) / (V + rowtotal[i]))``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.perplexity import (
    PREFIX_CHARS,
    V,
    _BYTE_CLASS,
    score_logprob_batch,
)

_COUNT_SCHEMA = "prev int, cur int, c long"


def _bigram_counts(texts: pd.Series, prefix: int | None) -> np.ndarray:
    """49×49 within-text bigram counts for one batch (vectorized)."""
    s = texts.fillna("").astype(str)
    if prefix is not None:
        s = s.str.slice(0, prefix)
    s = s.str.replace("\x00", "", regex=False)
    joined = "\x00".join(s.tolist())
    buf = np.frombuffer(joined.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    counts = np.zeros((V, V), dtype=np.int64)
    if len(buf) < 2:
        return counts
    codes = _BYTE_CLASS[buf]
    # drop the two bigrams touching each separator byte (class of NUL is
    # OOV, but the pair crosses a text boundary and must not count)
    valid = (buf[:-1] != 0) & (buf[1:] != 0)
    np.add.at(counts, (codes[:-1][valid], codes[1:][valid]), 1)
    return counts


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    prefix: int | None = PREFIX_CHARS,
) -> np.ndarray:
    """Train the 49-class bigram LM over ``df[text_col]``; returns the
    V×V log-prob matrix (add-one smoothed). Driver traffic is bounded by
    the 2401-cell count table, never the corpus."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = _bigram_counts(pdf[text_col], prefix)
            prev, cur = np.nonzero(m)
            yield pd.DataFrame(
                {"prev": prev.astype("int32"), "cur": cur.astype("int32"),
                 "c": m[prev, cur]}
            )

    rows = (
        df.select(text_col)
        .mapInPandas(emit, schema=_COUNT_SCHEMA)
        .groupBy("prev", "cur")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    counts = np.zeros((V, V), dtype=np.float64)
    for r in rows:
        counts[r["prev"], r["cur"]] = r["c"]
    return np.log((1.0 + counts) / (V + counts.sum(axis=1, keepdims=True)))


def ppl_under_lm(logp: np.ndarray, col: Column) -> Column:
    """Column: perplexity of ``col`` under a trained log-prob matrix.
    The matrix rides the UDF closure (~19 KB — broadcast-sized)."""
    mat = np.asarray(logp, dtype=np.float64)

    @F.pandas_udf(T.DoubleType())
    def score(texts: pd.Series) -> pd.Series:
        return score_logprob_batch(texts, mat)

    return score(col)


def corpus_lm_scores(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Self-scored corpus LM (two passes over the same frame): train the
    bigram LM on ``df``, then score every row under it. Returns the id
    columns plus ``ppl`` rounded to 6 — per-row independent floats, no
    cross-row float reduction, so the result is value-hash comparable."""
    logp = train_bigram_lm(df, text_col)
    return df.select(
        *id_cols, F.round(ppl_under_lm(logp, F.col(text_col)), 6).alias("ppl")
    )


def corpus_lm_oracle_sql(base_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`corpus_lm_scores` over ``base_sql`` (a
    SELECT producing (id, text)): trains the LM from the same rows
    entirely in SQL (per-row lag windows so bigrams never cross texts),
    then scores each row — the corpus-trained analogue of
    pipeline/oracle_sql.keep_flags_oracle_sql's embedded-corpus chain."""
    from ..functions.perplexity import PPL_MAX, _ALPHABET

    oov = V - 1
    alpha_sql = _ALPHABET.replace("'", "''")
    return f"""
WITH base AS ({base_sql}),
txt AS (
  SELECT {id_col} AS id,
         replace(substr(coalesce(text, ''), 1, {PREFIX_CHARS}), chr(0), '') AS s
  FROM base
),
tcls AS (
  SELECT id, i, j,
         CASE WHEN k > 1 THEN {oov}
              WHEN p = 0 THEN {oov}
              ELSE p - 1 END AS cls
  FROM (
    SELECT id, i, j, k, strpos('{alpha_sql}',
             chr(CASE WHEN cp BETWEEN 65 AND 90 THEN cp + 32 ELSE cp END)) AS p
    FROM (
      SELECT id, i, octet_length(encode(ch)) AS k, unicode(ch) AS cp,
             UNNEST(range(octet_length(encode(ch)))) AS j
      FROM (
        SELECT id, i, substr(s, i, 1) AS ch
        FROM txt, UNNEST(range(1, length(s) + 1)) AS t(i)
      )
    )
  )
),
tbig AS (
  SELECT id, lag(cls) OVER (PARTITION BY id ORDER BY i, j) AS prev, cls AS cur
  FROM tcls
),
obs AS (
  SELECT prev, cur, count(*) AS c FROM tbig
  WHERE prev IS NOT NULL GROUP BY 1, 2
),
rowtot AS (SELECT prev, sum(c) AS rc FROM obs GROUP BY 1),
lm AS (
  SELECT g1.i AS prev, g2.i AS cur,
         ln((1.0 + coalesce(o.c, 0)) / ({V} + coalesce(rt.rc, 0))) AS logp
  FROM (SELECT UNNEST(range({V})) AS i) g1
  CROSS JOIN (SELECT UNNEST(range({V})) AS i) g2
  LEFT JOIN obs o ON o.prev = g1.i AND o.cur = g2.i
  LEFT JOIN rowtot rt ON rt.prev = g1.i
),
score AS (
  SELECT b.id, avg(lm.logp) AS m
  FROM tbig b JOIN lm ON lm.prev = b.prev AND lm.cur = b.cur
  WHERE b.prev IS NOT NULL GROUP BY b.id
)
SELECT x.id AS {id_col},
       round(least(coalesce(exp(-s.m), {PPL_MAX}), {PPL_MAX}), 6) AS ppl
FROM txt x LEFT JOIN score s ON s.id = x.id
ORDER BY 1
"""


def train_grouped_lms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    prefix: int | None = PREFIX_CHARS,
) -> dict[str, np.ndarray]:
    """One LM per group (the CCNet recipe trains per-LANGUAGE LMs) in a
    single counting pass: the map side emits (group, prev, cur, c) and
    one groupBy sums — driver traffic is #groups × ≤2401 rows."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for g, sub in pdf.groupby(group_col, dropna=False):
                m = _bigram_counts(sub[text_col], prefix)
                prev, cur = np.nonzero(m)
                frames.append(
                    pd.DataFrame(
                        {"g": str(g), "prev": prev.astype("int32"),
                         "cur": cur.astype("int32"), "c": m[prev, cur]}
                    )
                )
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(
                    {"g": pd.Series(dtype="str"),
                     "prev": pd.Series(dtype="int32"),
                     "cur": pd.Series(dtype="int32"),
                     "c": pd.Series(dtype="int64")}
                )
            )

    rows = (
        df.select(group_col, text_col)
        .mapInPandas(emit, schema="g string, " + _COUNT_SCHEMA)
        .groupBy("g", "prev", "cur")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    counts: dict[str, np.ndarray] = {}
    for r in rows:
        counts.setdefault(r["g"], np.zeros((V, V), dtype=np.float64))[
            r["prev"], r["cur"]
        ] = r["c"]
    return {
        g: np.log((1.0 + m) / (V + m.sum(axis=1, keepdims=True)))
        for g, m in counts.items()
    }


def grouped_lm_scores(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Score each row under ITS OWN group's corpus-trained LM. Groups
    absent from training (possible only when scoring a different frame)
    fall back to the uniform add-one prior ln(1/V)."""
    lms = train_grouped_lms(df, group_col, text_col)
    uniform = np.full((V, V), -np.log(float(V)))

    @F.pandas_udf(T.DoubleType())
    def score(groups: pd.Series, texts: pd.Series) -> pd.Series:
        out = pd.Series(np.empty(len(texts)), index=texts.index, dtype="float64")
        for g, sub in texts.groupby(groups.fillna("None").astype(str)):
            out.loc[sub.index] = score_logprob_batch(
                sub, lms.get(g, uniform)
            )
        return out

    return df.select(
        *id_cols,
        F.col(group_col),
        F.round(score(F.col(group_col), F.col(text_col)), 6).alias("ppl"),
    )


def grouped_lm_oracle_sql(
    base_sql: str, group_col: str, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`grouped_lm_scores`: per-group LM trained in
    SQL (obs keyed by group), scored with a (group, prev, cur) join."""
    from ..functions.perplexity import PPL_MAX, _ALPHABET

    oov = V - 1
    alpha_sql = _ALPHABET.replace("'", "''")
    return f"""
WITH base AS ({base_sql}),
txt AS (
  SELECT {id_col} AS id, {group_col} AS g,
         replace(substr(coalesce(text, ''), 1, {PREFIX_CHARS}), chr(0), '') AS s
  FROM base
),
tcls AS (
  SELECT id, g, i, j,
         CASE WHEN k > 1 THEN {oov}
              WHEN p = 0 THEN {oov}
              ELSE p - 1 END AS cls
  FROM (
    SELECT id, g, i, j, k, strpos('{alpha_sql}',
             chr(CASE WHEN cp BETWEEN 65 AND 90 THEN cp + 32 ELSE cp END)) AS p
    FROM (
      SELECT id, g, i, octet_length(encode(ch)) AS k, unicode(ch) AS cp,
             UNNEST(range(octet_length(encode(ch)))) AS j
      FROM (
        SELECT id, g, i, substr(s, i, 1) AS ch
        FROM txt, UNNEST(range(1, length(s) + 1)) AS t(i)
      )
    )
  )
),
tbig AS (
  SELECT id, g, lag(cls) OVER (PARTITION BY id ORDER BY i, j) AS prev,
         cls AS cur
  FROM tcls
),
obs AS (
  SELECT g, prev, cur, count(*) AS c FROM tbig
  WHERE prev IS NOT NULL GROUP BY 1, 2, 3
),
rowtot AS (SELECT g, prev, sum(c) AS rc FROM obs GROUP BY 1, 2),
grps AS (SELECT DISTINCT g FROM txt),
lm AS (
  SELECT grps.g, g1.i AS prev, g2.i AS cur,
         ln((1.0 + coalesce(o.c, 0)) / ({V} + coalesce(rt.rc, 0))) AS logp
  FROM grps
  CROSS JOIN (SELECT UNNEST(range({V})) AS i) g1
  CROSS JOIN (SELECT UNNEST(range({V})) AS i) g2
  LEFT JOIN obs o ON o.g = grps.g AND o.prev = g1.i AND o.cur = g2.i
  LEFT JOIN rowtot rt ON rt.g = grps.g AND rt.prev = g1.i
),
score AS (
  SELECT b.id, avg(lm.logp) AS m
  FROM tbig b
  JOIN lm ON lm.g = b.g AND lm.prev = b.prev AND lm.cur = b.cur
  WHERE b.prev IS NOT NULL GROUP BY b.id
)
SELECT x.id AS {id_col}, x.g AS {group_col},
       round(least(coalesce(exp(-s.m), {PPL_MAX}), {PPL_MAX}), 6) AS ppl
FROM txt x LEFT JOIN score s ON s.id = x.id
ORDER BY 1
"""
