"""Compiled-regex PII + toxicity scrub (byte-deterministic).

One pass of sequential, precompiled, fully-specified regex
replacements, applied batch-wise with pandas' C-level
``str.replace(regex=True)``. The identical function body runs inside
the Spark pandas UDF and inside the single-node oracle, which is what
makes the byte-exact-scrubbed-text requirement structural rather than
aspirational.

Determinism rules:
- patterns are module-level constants compiled once, no locale-dependent
  classes (explicit ASCII ranges only);
- replacements are fixed tokens;
- application order is the list order (card before phone so 16-digit
  runs aren't partially eaten by the phone pattern);
- input is expected NFC-normalized; :func:`scrub_batch` does NOT
  re-normalize (normalization would change bytes of non-PII text).
"""

from __future__ import annotations

import re

import pandas as pd

# Placeholder toxicity lexicon — stands in for a real list; the machinery
# (word-boundary alternation, case-insensitive) is what scales.
TOXIC_LEXICON = ["frakk", "blarghole", "sludgebrain", "gritwit"]

SCRUB_RULES: list[tuple[str, str]] = [
    # 16-digit card numbers (optionally 4x4 grouped)
    (r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    # emails
    (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    # international-ish phone numbers: +1-555-0123, +44 20 7946 0958, 555-0123
    (r"(?<!\w)\+?\d{1,3}[ -]\d{2,4}(?:[ -]\d{2,4}){1,3}(?!\w)", "<PHONE>"),
    # IPv4
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # toxicity lexicon, whole words, case-insensitive
    (r"(?i)\b(?:" + "|".join(map(re.escape, TOXIC_LEXICON)) + r")\b", "<TOX>"),
]

_COMPILED = [(re.compile(p), r) for p, r in SCRUB_RULES]


def scrub_batch(texts: pd.Series) -> pd.Series:
    """Scrub a batch of strings; null-safe (nulls pass through as nulls)."""
    mask = texts.notna()
    out = texts.astype("object").copy()
    s = texts[mask].astype(str)
    for pat, repl in _COMPILED:
        s = s.str.replace(pat, repl, regex=True)
    out[mask] = s
    return out


def scrub_text(text: str | None) -> str | None:
    """Single-string variant (oracle/tests convenience)."""
    if text is None:
        return None
    for pat, repl in _COMPILED:
        text = pat.sub(repl, text)
    return text
