"""scrubbed_text_transcripts: the Python scrub chain and the DuckDB RE2
regexp_replace chain must agree byte-for-byte on the shared subset
(ASCII, phone-free) — including adversarial boundary probes."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from data_quality_automated_evaluator_spark.functions.scrub import (
    SCRUB_RULES,
    scrub_batch,
)

_ASCII = re.compile(r"[^\x00-\x7F]")
_PHONEISH = re.compile(r"\+?\d{1,3}[ -]\d{2,4}(?:[ -]\d{2,4}){1,3}")

PROBES = [
    # grouped cards ("4111 1111 ...") are phone-shaped, hence outside the
    # oracle subset by design — byte coverage for them stays in the goldens
    "pay 4111111111111111 now",               # bare 16 digits
    "x4111111111111111 embedded no boundary", # \b must block
    "mail a.b+c_d%e@sub.domain.io please",
    "double bob@x.io and eve@y.org same row",
    "ip 10.0.0.1 and 255.255.255.255 and 999.999.999.999",
    "you frakk and FRAKK and Frakk!",
    "frakkish is not a lexicon word",
    "adjacent <CARD>bob@x.io<CARD> after replace",
    "card then email 4111111111111111 bob@x.io",
    "ip.in.sentence.10.0.0.1.trailing.dots",
    "empty", "", " ", "no hits here at all",
    "digits 1234 5678 too short for card",
    "16 digits split 41111111 11111111 by wide gap",
]


def _sql_chain() -> str:
    expr = "t"
    for i, (pat, repl) in enumerate(SCRUB_RULES):
        if i == 2:  # phone: excluded by the subset predicate
            continue
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def test_probes_stay_in_subset():
    # every probe must exercise the oracle path, not fall out of it
    for p in PROBES:
        assert not _ASCII.search(p), p
        assert not _PHONEISH.search(p), p


def test_python_chain_equals_duckdb_chain_on_probes():
    con = duckdb.connect()
    con.execute("SET threads=1")
    py = scrub_batch(pd.Series(PROBES))
    for probe, expect in zip(PROBES, py):
        got = con.execute(
            f"SELECT {_sql_chain()} FROM (SELECT ? AS t)", [probe]
        ).fetchone()[0]
        assert got == expect, f"{probe!r}: SQL {got!r} != PY {expect!r}"


def test_fixture_subset_matches_end_to_end():
    from data_quality_automated_evaluator_spark.entry_queries import (
        FIXTURE_TRANSCRIPTS,
        _scrub_oracle,
    )
    from data_quality_automated_evaluator_spark.testdata import (
        write_transcripts_parquet,
    )

    write_transcripts_parquet(FIXTURE_TRANSCRIPTS, n_convs=400, seed=42)
    con = duckdb.connect()
    con.execute("SET threads=1")
    ora = con.execute(_scrub_oracle(FIXTURE_TRANSCRIPTS)).df()
    raw = con.execute(
        f"""SELECT text FROM read_parquet('{FIXTURE_TRANSCRIPTS}')
        WHERE text IS NOT NULL
          AND NOT regexp_matches(text, '[^\\x00-\\x7F]')
          AND NOT regexp_matches(
            text, '\\+?\\d{{1,3}}[ -]\\d{{2,4}}([ -]\\d{{2,4}}){{1,3}}')
        ORDER BY conv_id, turn_idx"""
    ).df()
    assert len(raw) == len(ora) > 1000
    py = scrub_batch(raw.text)
    assert (py.values == ora.text_scrubbed.values).all()
    # the subset must actually contain scrub hits, or the check is hollow
    assert ora.text_scrubbed.str.contains("<TOX>|<EMAIL>|<CARD>|<IP>").sum() > 100
