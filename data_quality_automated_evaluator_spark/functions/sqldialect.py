"""SQL-dialect compatibility shim.

The reference's config surface accepts Polars SQL (which tolerates two
Postgres-isms its shipped example configs use):

1. ``expr::type`` cast suffixes — e.g. ``(anomaly = 'high_risk')::int``
   (reference: config.json:9), ``timestamp::date`` (README.md:368).
2. ``DATE(col, '%Y-%m-%d %H:%M:%S')`` strptime-style parsing
   (reference: config.json:8, README.md:462).
3. ``CAST(intcol AS DATE)`` meaning epoch-days → date
   (reference: examples/cifer-fraud-detection-dataset.json:14) — Spark
   disallows int→date casts by default.

This module rewrites those constructs into Spark SQL so user configs
written for the reference run unchanged. Everything else passes through
to Catalyst verbatim (full Spark SQL is accepted natively).
"""

from __future__ import annotations

import re

# strptime directive → JDK DateTimeFormatter pattern
_STRPTIME_TO_JDK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%b": "MMM",
    "%B": "MMMM",
    "%a": "EEE",
    "%A": "EEEE",
    "%j": "DDD",
    "%z": "xx",
    "%Z": "zzz",
    "%%": "%",
}

_PCT = re.compile(r"%.")


def strptime_to_jdk(fmt: str) -> str:
    """Translate a strptime format string to a JDK datetime pattern.

    Literal text between directives is single-quoted when it contains
    letters (JDK treats bare letters as pattern chars).
    """
    out: list[str] = []
    pos = 0
    for m in _PCT.finditer(fmt):
        literal = fmt[pos : m.start()]
        if literal:
            out.append(_quote_literal(literal))
        d = m.group(0)
        if d not in _STRPTIME_TO_JDK:
            raise ValueError(f"unsupported strptime directive {d!r} in {fmt!r}")
        out.append(_STRPTIME_TO_JDK[d])
        pos = m.end()
    tail = fmt[pos:]
    if tail:
        out.append(_quote_literal(tail))
    return "".join(out)


def _quote_literal(text: str) -> str:
    if re.search(r"[A-Za-z']", text):
        return "'" + text.replace("'", "''") + "'"
    return text


# ``::type`` suffix casts. The cast target is a word; the operand is either a
# parenthesized expression, a quoted literal, or an identifier/number chain.
_TYPE_MAP = {
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "float": "float",
    "real": "float",
    "double": "double",
    "text": "string",
    "varchar": "string",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "boolean": "boolean",
    "bool": "boolean",
    "decimal": "decimal(38,9)",
    "numeric": "decimal(38,9)",
}

_CAST_SUFFIX = re.compile(r"::\s*([A-Za-z]+)")


def _find_operand_start(s: str, end: int) -> int:
    """Find the start index of the operand ending at ``end`` (exclusive)."""
    i = end - 1
    while i >= 0 and s[i].isspace():
        i -= 1
    if i < 0:
        raise ValueError(f"dangling :: in {s!r}")
    if s[i] == ")":
        depth = 0
        while i >= 0:
            if s[i] == ")":
                depth += 1
            elif s[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        start = i
        # include a preceding function name: f(...)::int
        j = i - 1
        while j >= 0 and (s[j].isalnum() or s[j] in "_."):
            j -= 1
        return j + 1 if j + 1 < i else start
    if s[i] in "'\"":
        quote = s[i]
        i -= 1
        while i >= 0 and s[i] != quote:
            i -= 1
        return i
    # identifier / number / qualified name / backticked name
    while i >= 0 and (s[i].isalnum() or s[i] in "_.$`"):
        i -= 1
    return i + 1


def rewrite_pg_casts(expr: str) -> str:
    """Rewrite every ``operand::type`` into ``CAST(operand AS type)``."""
    while True:
        m = _CAST_SUFFIX.search(expr)
        if m is None:
            return expr
        type_name = m.group(1).lower()
        spark_type = _TYPE_MAP.get(type_name)
        if spark_type is None:
            raise ValueError(f"unsupported ::{type_name} cast in {expr!r}")
        start = _find_operand_start(expr, m.start())
        operand = expr[start : m.start()].strip()
        expr = f"{expr[:start]}CAST({operand} AS {spark_type}){expr[m.end():]}"


# DATE(col, '%fmt') → to_date(col, 'jdkfmt'); DATETIME variant → to_timestamp
_DATE_FN = re.compile(
    r"\b(DATE|DATETIME)\s*\(\s*([^,()]+?)\s*,\s*'([^']*)'\s*\)", re.IGNORECASE
)


def rewrite_date_fn(expr: str) -> str:
    def _sub(m: re.Match[str]) -> str:
        fn = "to_date" if m.group(1).upper() == "DATE" else "to_timestamp"
        jdk = strptime_to_jdk(m.group(3))
        return f"{fn}({m.group(2)}, '{jdk}')"

    return _DATE_FN.sub(_sub, expr)


def to_spark_sql(expr: str) -> str:
    """Rewrite a reference-dialect SQL expression into Spark SQL.

    Applied to both filter statements (whole ``SELECT … FROM self``
    statements) and transformation expressions. Idempotent on
    already-Spark SQL that avoids the shimmed constructs.
    """
    return rewrite_pg_casts(rewrite_date_fn(expr))
