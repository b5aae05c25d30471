"""Published web-scale document filters (Gopher + C4 style) as pure
Catalyst expressions — zero shuffle, zero Python.

The rule families re-implemented here are public knowledge:

- **Gopher repetition filters** (Rae et al. 2021, "Scaling Language
  Models: ... Gopher", Appendix A): fraction of lines that are
  duplicates, fraction of characters in duplicate lines, fraction of
  characters in the most frequent word n-gram (n = 2..4), fraction of
  characters in duplicated word n-grams (n = 5). Our duplicated-n-gram
  fraction counts every occurrence of a gram that appears ≥ 2 times
  (``count × gram_chars / doc_chars``) WITHOUT de-overlapping character
  coverage — the common open-source simplification; the exact
  definition is stated here so the DuckDB oracle can match it bit for
  bit.
- **Gopher quality filters**: word count bounds, mean word length
  bounds, bullet-start / ellipsis-end line fractions, fraction of
  words with an alphabetic character, stop-word presence,
  symbol-to-word ratio (``#`` and ``...``).
- **C4 filters** (Raffel et al. 2019): terminal-punctuation line
  fraction, minimum sentence count, "lorem ipsum" marker, curly-brace
  (code) marker.

Scale shape: every metric is computed per document from a split-word /
split-line ARRAY via higher-order functions (``transform``, ``filter``,
``aggregate``) inside one projection — a map-only plan with no Exchange
and no Python worker, which is exactly what a 100 TB document filter
must be. The duplicate/top-gram statistics use a single ``aggregate``
pass over the SORTED gram array (run-length walk) instead of an
explode + groupBy, so no per-gram shuffle ever happens.

Cited reference behavior: the reference evaluates per-column quality
rules over a single table (reference evaluate.py); these named filter
families extend that contract to the web-scale document corpus the
graft brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "GOPHER_STOP_WORDS",
    "augmented_lines",
    "gopher_repetition_columns",
    "gopher_quality_columns",
    "c4_columns",
]

# Gopher's stop-word presence check uses this public 8-word list
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text: Column) -> Column:
    """Whitespace words with empties removed (empty doc → empty array)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def augmented_lines(text: Column, doc_id: Column) -> Column:
    """Deterministically rebuild a multi-line document from a one-line
    text (the synthetic ``documents`` table has no newlines, so
    line-level filters would be degenerate without this).

    Construction — keyed off ``doc_id`` so the DuckDB oracle can build
    the identical document:

    - base lines: words grouped ``5 + doc_id % 4`` per line;
    - ``doc_id % 3 == 0``  → first base line appended again (duplicate);
    - ``doc_id % 5 == 0``  → a ``- `` bullet line;
    - ``doc_id % 7 == 0``  → a line ending in ``...``;
    - ``doc_id % 11 == 0`` → a ``lorem ipsum`` line;
    - ``doc_id % 13 == 0`` → a curly-brace code line;
    - ``doc_id % 2 == 0``  → three proper sentences on one line.
    """
    words = _words(text)
    per = (F.lit(5) + (doc_id % 4)).cast("int")
    n_base = F.ceil(F.size(words) / per).cast("int")
    base = F.transform(
        F.sequence(F.lit(0), F.greatest(n_base, F.lit(1)) - 1),
        lambda i: F.array_join(F.slice(words, i * per + 1, per), " "),
    )
    base = F.filter(base, lambda ln: ln != "")

    def _maybe(cond: Column, line: Column) -> Column:
        return F.when(cond, F.array(line)).otherwise(
            F.array().cast("array<string>")
        )

    first_word = F.coalesce(F.element_at(words, 1), F.lit("item"))
    extras = F.concat(
        _maybe(doc_id % 3 == 0, F.coalesce(F.element_at(base, 1), F.lit(""))),
        _maybe(doc_id % 5 == 0, F.concat(F.lit("- "), first_word)),
        _maybe(doc_id % 7 == 0, F.concat(first_word, F.lit("..."))),
        _maybe(doc_id % 11 == 0, F.lit("lorem ipsum dolor sit amet.")),
        _maybe(doc_id % 13 == 0, F.lit("function() { return 0; }")),
        _maybe(
            doc_id % 2 == 0,
            F.lit("This augmented sentence ends properly. "
                  "It has punctuation. Indeed it does."),
        ),
    )
    return F.concat(base, extras)


def _run_stats(arr: Column) -> Column:
    """One ``aggregate`` pass over the SORTED array computing duplicate
    and mode statistics from run lengths — the shuffle-free equivalent
    of explode → groupBy → count per document.

    Returns ``struct(dup_elems, dup_chars, best_cnt, best_val)``:
    - ``dup_elems``: number of elements belonging to a value occurring ≥ 2
    - ``dup_chars``: sum of ``length(value)`` over those elements
    - ``best_cnt`` / ``best_val``: the mode and its count (ties broken
      toward the lexicographically smallest value, so the result is
      deterministic)
    """
    acc_t = (
        "struct<prev:string,run:bigint,dup_elems:bigint,dup_chars:bigint,"
        "best_cnt:bigint,best_val:string>"
    )
    init = F.expr(
        "named_struct('prev', cast(null as string), 'run', 0L, "
        "'dup_elems', 0L, 'dup_chars', 0L, 'best_cnt', 0L, "
        "'best_val', cast(null as string))"
    ).cast(acc_t)

    def close_run(acc):
        # fold the just-finished run (acc.prev × acc.run) into the stats
        run_dups = F.when(acc.run >= 2, acc.run).otherwise(F.lit(0))
        # guard the chars term the same way: 0 * length(NULL prev) is
        # NULL in SQL and would poison the whole fold
        run_dup_chars = F.when(
            acc.run >= 2, acc.run * F.length(acc.prev)
        ).otherwise(F.lit(0))
        better = (acc.run > acc.best_cnt) | (
            (acc.run == acc.best_cnt) & (acc.prev < acc.best_val)
        )
        return (
            acc.dup_elems + run_dups,
            acc.dup_chars + run_dup_chars,
            F.when(better, acc.run).otherwise(acc.best_cnt),
            F.when(better, acc.prev).otherwise(acc.best_val),
        )

    def merge(acc, x):
        same = acc.prev.isNotNull() & (x == acc.prev)
        de, dc, bc, bv = close_run(acc)
        return F.when(
            same,
            F.struct(
                acc.prev.alias("prev"),
                (acc.run + 1).alias("run"),
                acc.dup_elems.alias("dup_elems"),
                acc.dup_chars.alias("dup_chars"),
                acc.best_cnt.alias("best_cnt"),
                acc.best_val.alias("best_val"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("bigint").alias("run"),
                de.alias("dup_elems"),
                dc.alias("dup_chars"),
                bc.alias("best_cnt"),
                bv.alias("best_val"),
            )
        )

    def finish(acc):
        de, dc, bc, bv = close_run(acc)
        return F.struct(
            de.alias("dup_elems"),
            dc.alias("dup_chars"),
            bc.alias("best_cnt"),
            bv.alias("best_val"),
        )

    return F.aggregate(F.sort_array(arr), init, merge, finish)


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams joined with single spaces (empty when < n words)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition_columns(
    lines: Column, words: Column, doc_chars: Column
) -> dict[str, Column]:
    """Gopher repetition metrics from pre-split line/word arrays.

    ``doc_chars`` is the character count the fractions normalize by
    (length of the reconstructed document). All fractions are rounded
    to 6 places to pin float parity with the SQL oracle.
    """
    safe_chars = F.nullif(doc_chars, F.lit(0))
    line_stats = _run_stats(lines)
    out: dict[str, Column] = {
        "n_lines": F.size(lines).cast("bigint"),
        "dup_line_frac": F.round(
            line_stats.dup_elems / F.nullif(F.size(lines), F.lit(0)), 6
        ),
        "dup_line_char_frac": F.round(line_stats.dup_chars / safe_chars, 6),
    }
    for n in (2, 3, 4):
        g = _run_stats(_ngrams(words, n))
        out[f"top_{n}gram_char_frac"] = F.round(
            F.coalesce(g.best_cnt * F.length(g.best_val), F.lit(0))
            / safe_chars,
            6,
        )
    g5 = _run_stats(_ngrams(words, 5))
    out["dup_5gram_char_frac"] = F.round(g5.dup_chars / safe_chars, 6)
    return out


def gopher_quality_columns(lines: Column, words: Column) -> dict[str, Column]:
    """Gopher quality-signal metrics and the published-threshold flags."""
    n_words = F.size(words).cast("bigint")
    safe_words = F.nullif(n_words, F.lit(0))
    n_lines = F.nullif(F.size(lines), F.lit(0))
    mean_wl = F.round(
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
        )
        / safe_words,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / safe_words, 6
    )
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*GOPHER_STOP_WORDS))
    ).cast("bigint")
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("- ")
                | ln.startswith("* ")
                | ln.startswith("•"),
            )
        )
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(
                lines, lambda ln: ln.endswith("...") | ln.endswith("…")
            )
        )
        / n_lines,
        6,
    )
    joined = F.array_join(lines, "\n")
    symbol_ratio = F.round(
        (
            F.length(joined)
            - F.length(F.replace(joined, F.lit("#"), F.lit("")))
            + (
                F.length(joined)
                - F.length(F.replace(joined, F.lit("..."), F.lit("")))
            )
            / 3
        )
        / safe_words,
        6,
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "alpha_word_frac": alpha_frac,
        "stop_word_hits": stop_hits,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "symbol_word_ratio": symbol_ratio,
        "g_words": (n_words >= 50) & (n_words <= 100000),
        "g_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "g_alpha": alpha_frac >= 0.8,
        "g_stops": stop_hits >= 2,
        "g_bullets": bullet_frac <= 0.9,
        "g_ellipsis": ellipsis_frac <= 0.3,
        "g_symbols": symbol_ratio <= 0.1,
    }


def c4_columns(lines: Column) -> dict[str, Column]:
    """C4-style document signals and the keep flag."""
    joined = F.array_join(lines, "\n")
    n_lines = F.nullif(F.size(lines), F.lit(0))
    term_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: ln.endswith(".")
                | ln.endswith("!")
                | ln.endswith("?")
                | ln.endswith("\""),
            )
        )
        / n_lines,
        6,
    )
    # sentences ≈ terminal-punctuation marks in the document
    n_sentences = (
        F.length(joined)
        - F.length(
            F.translate(joined, ".!?", "")
        )
    ).cast("bigint")
    has_lorem = F.lower(joined).contains("lorem ipsum")
    has_brace = joined.contains("{")
    return {
        "term_punct_line_frac": term_frac,
        "n_sentences": n_sentences,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "c4_keep": (~has_lorem) & (~has_brace) & (n_sentences >= 3),
    }


def gopher_repetition_stats_arrow():
    """Arrow-batched twin of the repetition statistics consumed by
    ``gopher_repetition_columns`` — EXACT integer parity, ~6x faster.

    The Catalyst run-length folds (`_run_stats` over `_ngrams`) evaluate
    interpreted (higher-order functions are CodegenFallback), paying
    per-element lambda dispatch for every gram of every document.  All
    the statistics are pure INTEGER counts, so a Counter-based batch
    computation is parity-safe by construction: same n-gram strings
    (``' '.join(words[i:i+n])`` == ``array_join(slice(words,i,n),' ')``),
    same ≥2-occurrence duplicate sums, same ties-to-lexicographically-
    smallest mode (Python str and UTF8String compare identically for
    the codepoint-ordered byte encodings), same Python/Spark codepoint
    ``len``.  The float fractions stay in Catalyst, dividing these
    integers exactly like the fold-based projection, so the oracle
    arithmetic is untouched.  Pinned fold-vs-arrow by
    tests/test_webfilter_arrow.py.

    Returns a pandas UDF ``(lines, words) -> struct`` of six bigints:
    line dup elems/chars, top-{2,3,4}-gram chars, dup-5-gram chars.
    """
    import pandas as pd

    from collections import Counter

    def _dup(cnt: Counter) -> tuple[int, int]:
        de = sum(c for c in cnt.values() if c >= 2)
        dc = sum(c * len(k) for k, c in cnt.items() if c >= 2)
        return de, dc

    def _top_chars(cnt: Counter) -> int:
        if not cnt:
            return 0
        best_cnt = max(cnt.values())
        best_val = min(k for k, c in cnt.items() if c == best_cnt)
        return best_cnt * len(best_val)

    def _grams(words, n) -> Counter:
        return Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )

    def _stats(lines, words):
        rows = []
        for ls, ws in zip(lines, words):
            ls = list(ls) if ls is not None else []
            ws = list(ws) if ws is not None else []
            l_de, l_dc = _dup(Counter(ls))
            rows.append(
                {
                    "l_dup_elems": l_de,
                    "l_dup_chars": l_dc,
                    "top2_chars": _top_chars(_grams(ws, 2)),
                    "top3_chars": _top_chars(_grams(ws, 3)),
                    "top4_chars": _top_chars(_grams(ws, 4)),
                    "dup5_chars": _dup(_grams(ws, 5))[1],
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                "l_dup_elems", "l_dup_chars", "top2_chars",
                "top3_chars", "top4_chars", "dup5_chars",
            ],
            dtype="int64",
        )

    return F.pandas_udf(
        _stats,
        returnType=(
            "struct<l_dup_elems:bigint,l_dup_chars:bigint,"
            "top2_chars:bigint,top3_chars:bigint,top4_chars:bigint,"
            "dup5_chars:bigint>"
        ),
    )
