"""DuckDB SQL oracle for the FULL quality-filter keep conjunction.

The flagship pipeline was the one substantive driver query without a
value-checked oracle: langid and the heuristic rules were SQL-oracled
individually, but the char-bigram perplexity term made the end-to-end
keep/drop decision "rows-only". This module closes that gap by
expressing the ENTIRE pipeline — including the bigram language model —
in one DuckDB SQL statement:

- the LM is TRAINED in SQL from the same embedded corpus the Python
  model trains on (:data:`..functions.perplexity._CORPUS`): byte-class
  the corpus, count bigrams, add-one smoothing, ``ln`` — identical
  arithmetic, so there is no weights table to keep in sync;
- byte-class parity with the numpy byte-domain scorer is exact: each
  character expands to ``octet_length(encode(ch))`` entries (a
  multi-byte UTF-8 char contributes that many OOV classes, exactly like
  the ``np.frombuffer`` byte view), upper-case ASCII folds via
  codepoint arithmetic, and the alphabet lookup is ``strpos`` on the
  same 48-char alphabet string;
- scoring is explode-chars → ordered window ``lag`` for bigrams → join
  the 49×49 LM → ``avg`` log-prob → ``exp(-m)`` clamped to the same
  sentinel. Measured max relative ppl difference vs the numpy scorer on
  the full fixture: 3e-14 — far inside the keep-threshold margin;
- all other features reuse the already-oracled SQL specs (textstats
  regexes, the langid model spec, window-function conversation
  features) with thresholds interpolated from the SAME
  :class:`..pipeline.rules.Thresholds` object the Spark side uses.

Cited reference behavior: the reference evaluates quality rules and
reports pass rates over a single table (reference handle_data.py /
evaluate.py); the keep-conjunction semantics here are this repo's
BASELINE quality_filter tier contract.
"""

from __future__ import annotations

from ..functions.perplexity import PPL_MAX, PREFIX_CHARS, _ALPHABET, _CORPUS
from .rules import Thresholds

_V = len(_ALPHABET) + 1  # 49 classes: alphabet + OOV
_OOV = _V - 1

# byte-class sequence of column ``s`` in source ``__SRC__`` (id, i, j, cls):
# one row per UTF-8 BYTE, ordered by (char position, byte index)
_CLS_TEMPLATE = """
  SELECT id, i, j,
         CASE WHEN k > 1 THEN {oov}
              WHEN p = 0 THEN {oov}
              ELSE p - 1 END AS cls
  FROM (
    SELECT id, i, j, k, strpos('{alpha}',
             chr(CASE WHEN cp BETWEEN 65 AND 90 THEN cp + 32 ELSE cp END)) AS p
    FROM (
      SELECT id, i, octet_length(encode(ch)) AS k, unicode(ch) AS cp,
             UNNEST(range(octet_length(encode(ch)))) AS j
      FROM (
        SELECT id, i, substr(s, i, 1) AS ch
        FROM __SRC__, UNNEST(range(1, length(s) + 1)) AS t(i)
      )
    )
  )
"""

# langid model spec (functions/langid.py) re-expressed as DuckDB/RE2
# score expressions over the lowered 400-char prefix — the ONE table
# behind every langid oracle (this pipeline oracle, langid_documents,
# lang_confusion_documents), so they cannot drift apart. Order = argmax
# tie order = functions/langid.py LANGS. ``__S__`` is the prefix column.
LANGID_SQL_SCORES: list[tuple[str, str]] = [
    ("en",
     r"len(regexp_extract_all(__S__, '\bthe\b|\band\b|\bof\b|\bis\b|\bto\b|\bwith\b|\bfor\b'))*3.0"
     r" + len(regexp_extract_all(__S__, 'th|ing|ion'))*1.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.05"),
    ("fr",
     r"len(regexp_extract_all(__S__, '[éèêàâçùûîôœ]'))*2.0"
     r" + len(regexp_extract_all(__S__, '\ble\b|\bla\b|\bles\b|\bet\b|\bde\b|\bdes\b|\bavec\b|\bchaque\b'))*3.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.02"),
    ("de",
     r"len(regexp_extract_all(__S__, '[äöüß]'))*2.0"
     r" + len(regexp_extract_all(__S__, '\bder\b|\bdie\b|\bdas\b|\bund\b|\bmit\b|\bjeden\b|\büber\b'))*3.0"
     r" + len(regexp_extract_all(__S__, 'sch|ung'))*1.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.02"),
    ("ru", r"len(regexp_extract_all(__S__, '[Ѐ-ӿ]'))*2.0"),
    ("zh", r"len(regexp_extract_all(__S__, '[一-鿿]'))*2.0"),
    ("es",
     r"len(regexp_extract_all(__S__, '[ñ¿¡]'))*2.0"
     r" + len(regexp_extract_all(__S__, '\bel\b|\blos\b|\blas\b|\buna\b|\bpor\b|\bcon\b|\bcomo\b|\bpero\b'))*3.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.02"),
    ("pt",
     r"len(regexp_extract_all(__S__, '[ãõ]'))*2.0"
     r" + len(regexp_extract_all(__S__, '\bnão\b|\buma\b|\bdos\b|\bdas\b|\bmas\b|\bsão\b|\btambém\b|\bem\b'))*3.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.02"),
    ("it",
     r"len(regexp_extract_all(__S__, '[ìò]'))*2.0"
     r" + len(regexp_extract_all(__S__, '\bil\b|\bdella\b|\bnella\b|\bche\b|\bper\b|\bsono\b|\bnon\b|\bgli\b'))*3.0"
     r" + len(regexp_extract_all(__S__, '[a-z]'))*0.02"),
    ("ja", r"len(regexp_extract_all(__S__, '[ぁ-ヿ]'))*2.0"),
]


def langid_scored_select(col: str = "s") -> str:
    """SELECT-list of per-language score expressions over prefix ``col``."""
    return ",\n        ".join(
        f"{expr.replace('__S__', col)} AS {lang}"
        for lang, expr in LANGID_SQL_SCORES
    )


def langid_label_case() -> str:
    """The model's argmax as a SQL CASE chain: first language in LANGS
    order whose score >= every later language's score; 'und' below the
    MIN_SCORE floor."""
    langs = [lang for lang, _ in LANGID_SQL_SCORES]
    clauses = [f"WHEN greatest({', '.join(langs)}) < 0.5 THEN 'und'"]
    for i, lang in enumerate(langs[:-1]):
        cond = " AND ".join(f"{lang} >= {r}" for r in langs[i + 1:])
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    clauses.append(f"ELSE '{langs[-1]}'")
    return "CASE\n        " + "\n        ".join(clauses) + " END"


LANGID_SCORE_SQL = f"""
    SELECT __KEYS__, {langid_label_case()} AS lang
    FROM (
      SELECT __KEYS__,
        {langid_scored_select('sl')}
      FROM __SCORE_SRC__
    )
"""


def ppl_chain_ctes() -> str:
    """CTE fragment that scores per-(conv_id, turn_idx) char-bigram
    perplexity in pure SQL — the LM trained in-query from the embedded
    corpus, byte-class parity with the numpy scorer (module docstring).

    Requires a prior CTE ``t(conv_id, turn_idx, …, text)``; emits CTEs
    ``txt`` … ``ppl`` where ``ppl`` is (conv_id, turn_idx, ppl). Shared
    verbatim by the keep-flags oracle and the perplexity-tier oracle so
    the two SQL scorers cannot drift apart.
    """
    alpha_sql = _ALPHABET.replace("'", "''")
    corpus_sql = _CORPUS.replace("'", "''")
    cls = _CLS_TEMPLATE.format(oov=_OOV, alpha=alpha_sql)
    return rf"""txt AS (
  SELECT conv_id || '|' || turn_idx AS id, conv_id, turn_idx,
         replace(substr(coalesce(text, ''), 1, {PREFIX_CHARS}), chr(0), '') AS s
  FROM t
),
corpus AS (SELECT '0' AS id, '{corpus_sql}' AS s),
ccls AS ({cls.replace('__SRC__', 'corpus')}),
cbig AS (SELECT lag(cls) OVER (ORDER BY i, j) AS prev, cls AS cur FROM ccls),
obs AS (SELECT prev, cur, count(*) AS c FROM cbig WHERE prev IS NOT NULL GROUP BY 1, 2),
rowtot AS (SELECT prev, sum(c) AS rc FROM obs GROUP BY 1),
lm AS (
  SELECT g1.i AS prev, g2.i AS cur,
         ln((1.0 + coalesce(o.c, 0)) / ({_V} + coalesce(rt.rc, 0))) AS logp
  FROM (SELECT UNNEST(range({_V})) AS i) g1
  CROSS JOIN (SELECT UNNEST(range({_V})) AS i) g2
  LEFT JOIN obs o ON o.prev = g1.i AND o.cur = g2.i
  LEFT JOIN rowtot rt ON rt.prev = g1.i
),
tcls AS ({cls.replace('__SRC__', 'txt')}),
tbig AS (
  SELECT id, lag(cls) OVER (PARTITION BY id ORDER BY i, j) AS prev, cls AS cur
  FROM tcls
),
score AS (
  SELECT b.id, avg(lm.logp) AS m
  FROM tbig b JOIN lm ON lm.prev = b.prev AND lm.cur = b.cur
  WHERE b.prev IS NOT NULL GROUP BY b.id
),
ppl AS (
  SELECT x.conv_id, x.turn_idx,
         least(coalesce(exp(-s.m), {PPL_MAX}), {PPL_MAX}) AS ppl
  FROM txt x LEFT JOIN score s ON s.id = x.id
)"""


def keep_flags_oracle_sql(
    parquet_path: str, t: Thresholds | None = None, by_lang: bool = False
) -> str:
    """Full keep/drop oracle SQL over a transcripts parquet file.

    Output schema (sorted by conv_id, turn_idx): conv_id, turn_idx,
    keep, and the nine rule flags — matching
    ``quality_keep_flags_transcripts`` column-for-column.
    With ``by_lang=True`` the same rule derivation is instead aggregated
    to per-predicted-language keep rates (lang, n_turns, n_keep,
    keep_rate) — the fairness/mix view of the pipeline's labels.
    """
    t = t or Thresholds()
    assert t.allowed_langs == ("en",), "SQL oracle encodes the default langs"
    langid = (
        LANGID_SCORE_SQL
        .replace("__KEYS__", "conv_id, turn_idx")
        .replace("__SCORE_SRC__", "feat")
    )
    return rf"""
WITH t AS (
  SELECT conv_id, turn_idx, role, tool, text FROM read_parquet('{parquet_path}')
),
feat AS (
  SELECT conv_id, turn_idx, role, tool,
         length(coalesce(text,'')) AS n_chars,
         len(regexp_extract_all(coalesce(text,''), '\S+')) AS n_tokens,
         len(regexp_extract_all(coalesce(text,''), '[!-/:-@\[-`{{-~]')) AS n_symbols,
         len(list_distinct(string_split_regex(trim(lower(coalesce(text,''))), '\s+'))) AS n_distinct,
         lower(substr(coalesce(text, ''), 1, 400)) AS sl
  FROM t
),
lang AS (
{langid}
),
{ppl_chain_ctes()},
conv AS (
  SELECT f.conv_id, f.turn_idx, f.role, f.tool,
         f.n_chars, f.n_tokens, f.n_symbols, f.n_distinct,
         l.lang, p.ppl,
         lag(f.role) OVER (PARTITION BY f.conv_id ORDER BY f.turn_idx) AS prev_role,
         count(*) OVER (PARTITION BY f.conv_id) AS conv_n_turns,
         max(CASE WHEN f.turn_idx = 0 THEN f.role END)
           OVER (PARTITION BY f.conv_id) AS conv_first_role
  FROM feat f
  JOIN lang l ON l.conv_id = f.conv_id AND l.turn_idx = f.turn_idx
  JOIN ppl p ON p.conv_id = f.conv_id AND p.turn_idx = f.turn_idx
),
viol AS (
  SELECT *,
         max(CASE WHEN prev_role IN ('user','assistant') AND role = prev_role
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id) AS conv_role_violation
  FROM conv
),
flags AS (
  SELECT conv_id, turn_idx, lang,
    (n_chars >= 1 AND n_chars <= {t.max_chars}) AS r_len,
    (CASE WHEN n_chars > 0 THEN CAST(n_symbols AS DOUBLE)/n_chars ELSE 0 END
       <= {t.max_symbol_ratio}) AS r_symbol,
    (n_tokens < {t.repetition_min_tokens} OR
     CAST(CASE WHEN n_tokens > 0 THEN n_distinct ELSE 0 END AS DOUBLE)
       / n_tokens >= {t.min_distinct_ratio}) AS r_repetition,
    (lang = 'en') AS r_lang,
    (ppl <= {t.max_ppl}) AS r_ppl,
    (role IN ('user','assistant','tool','system')
       AND ((tool IS NOT NULL) = (role = 'tool'))) AS r_role,
    (conv_first_role = 'user') AS c_first_role,
    (conv_role_violation = 0) AS c_alternation,
    (conv_n_turns >= {t.min_turns} AND conv_n_turns <= {t.max_turns}) AS c_n_turns
  FROM viol
)
{_keep_final_select(by_lang)}
"""


def _keep_final_select(by_lang: bool) -> str:
    conj = (
        "(r_len AND r_symbol AND r_repetition AND r_lang AND r_ppl AND r_role"
        " AND c_first_role AND c_alternation AND c_n_turns)"
    )
    if by_lang:
        return f"""SELECT lang,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN {conj} THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(CAST(sum(CASE WHEN {conj} THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(count(*) AS BIGINT), 6) AS keep_rate
FROM flags GROUP BY lang ORDER BY lang"""
    return f"""SELECT conv_id, turn_idx,
       {conj} AS keep,
       r_len, r_symbol, r_repetition, r_lang, r_ppl, r_role,
       c_first_role, c_alternation, c_n_turns
FROM flags ORDER BY conv_id, turn_idx"""
