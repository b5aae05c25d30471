"""Vectorized character-n-gram language identification.

A fastText-flavored linear model: per-language scores are weighted
counts of discriminative character n-grams / character classes,
computed batch-wise with pandas' C-level ``str.count`` — no per-row
Python. The same :func:`langid_frame` core runs inside the Spark pandas
UDF (Arrow batches) and inside the single-node oracle, so the two
agree exactly.

Model weights are embedded constants (public-knowledge character
statistics), deterministic by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

LANGS = ["en", "fr", "de", "ru", "zh"]

# (language, regex pattern, weight); counts are per-character-ngram hits.
_FEATURES: list[tuple[str, str, float]] = [
    # English function words / ngrams
    ("en", r"\bthe\b|\band\b|\bof\b|\bis\b|\bto\b|\bwith\b|\bfor\b", 3.0),
    ("en", r"th|ing|ion", 1.0),
    # French: accents + function words
    ("fr", r"[éèêàâçùûîôœ]", 2.0),
    ("fr", r"\ble\b|\bla\b|\bles\b|\bet\b|\bde\b|\bdes\b|\bavec\b|\bchaque\b", 3.0),
    # German: umlauts/ß + function words
    ("de", r"[äöüß]", 2.0),
    ("de", r"\bder\b|\bdie\b|\bdas\b|\bund\b|\bmit\b|\bjeden\b|\büber\b", 3.0),
    ("de", r"sch|ung", 1.0),
    # Russian: Cyrillic block
    ("ru", r"[Ѐ-ӿ]", 2.0),
    # Chinese: CJK unified ideographs
    ("zh", r"[一-鿿]", 2.0),
]

# Latin letters weakly indicate the Latin-script languages (ties broken by
# the stronger features above); keeps plain ASCII junk from scoring zero
# everywhere and lets the confidence threshold kick in.
_LATIN_BONUS = {"en": 0.05, "fr": 0.02, "de": 0.02}

UNKNOWN = "und"
MIN_SCORE = 0.5  # absolute score floor; below it the label is 'und'

# Language ID needs only a prefix (fastText-style models routinely cap input);
# keeps 8KB junk blobs from dominating batch cost. Part of the model spec —
# the oracle runs this same function, so parity is structural.
PREFIX_CHARS = 400


def langid_frame(texts: pd.Series) -> pd.DataFrame:
    """Per-language scores + argmax label for a batch of strings.

    Returns a DataFrame with one ``score_<lang>`` column per language
    plus ``lang`` (argmax label, ``und`` when max score < MIN_SCORE).
    """
    s = texts.fillna("").astype(str).str.slice(0, PREFIX_CHARS).str.lower()
    scores = pd.DataFrame(0.0, index=s.index, columns=LANGS)
    for lang, pat, w in _FEATURES:
        scores[lang] += s.str.count(pat) * w
    latin = s.str.count(r"[a-z]")
    for lang, w in _LATIN_BONUS.items():
        scores[lang] += latin * w

    arr = scores.to_numpy()
    best = arr.argmax(axis=1)
    best_score = arr.max(axis=1)
    labels = np.array(LANGS, dtype=object)[best]
    labels[best_score < MIN_SCORE] = UNKNOWN
    out = scores.add_prefix("score_")
    out["lang"] = labels
    return out


def langid_label(texts: pd.Series) -> pd.Series:
    """Just the label column (the pandas-UDF hot path)."""
    return langid_frame(texts)["lang"].astype(str)
