"""pipeline/audits: perplexity tiers, toxicity rates, role-consistency.

Small hand-built transcript frames with every edge case pinned, checked
against independently computed expectations (and, for the ppl tiers,
against the numpy scorer directly).
"""

from __future__ import annotations

import datetime as dt

import pytest

from data_quality_automated_evaluator_spark.functions.perplexity import (
    perplexity_batch,
)
from data_quality_automated_evaluator_spark.pipeline.audits import (
    HEAD_MAX_PPL,
    MIDDLE_MAX_PPL,
    ppl_tier_stats,
    role_consistency_audit,
    toxicity_stats,
)

D1 = dt.datetime(2024, 3, 1, 10, 0, 0)
D2 = dt.datetime(2024, 3, 2, 9, 30, 0)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


# ---------------------------------------------------------------------------
# ppl tiers
# ---------------------------------------------------------------------------


def test_ppl_tiers_match_numpy_scorer(spark):
    texts = [
        "the cat sat on the mat and the dog sat with the cat",  # English-y
        "what is the best way to sort a list in python",
        "zzzz qqqq xxxx zzzz qqqq xxxx zzzz qqqq",  # junk → high ppl
        "",  # empty → PPL_MAX sentinel → tail
    ]
    rows = [
        (f"c{i}", 0, "user", t, None, D1 if i < 2 else D2)
        for i, t in enumerate(texts)
    ]
    out = {
        (r["day"], r["tier"]): (r["n_turns"], r["sum_chars"])
        for r in ppl_tier_stats(_df(spark, rows)).collect()
    }

    import pandas as pd

    ppl = perplexity_batch(pd.Series(texts))
    tiers = [
        "head" if p <= HEAD_MAX_PPL else
        "middle" if p <= MIDDLE_MAX_PPL else "tail"
        for p in ppl
    ]
    expected: dict[tuple, list] = {}
    for i, (t, tier) in enumerate(zip(texts, tiers)):
        day = (D1 if i < 2 else D2).replace(hour=0, minute=0)
        key = (day, tier)
        cur = expected.setdefault(key, [0, 0])
        cur[0] += 1
        cur[1] += len(t)
    assert out == {k: tuple(v) for k, v in expected.items()}


# ---------------------------------------------------------------------------
# toxicity
# ---------------------------------------------------------------------------


def test_toxicity_stats_counts_and_share(spark):
    rows = [
        ("c0", 0, "user", "you absolute FRAKK", None, D1),  # case-insensitive
        ("c0", 1, "assistant", "frakking great", None, D1),  # \b: no hit
        ("c0", 2, "user", "clean text here", None, D1),
        ("c0", 3, "user", None, None, D1),  # null-safe
        ("c1", 0, "user", "sludgebrain!", None, D2),  # punct boundary hits
    ]
    out = {
        (r["day"].date().isoformat(), r["role"]): (
            r["n_turns"],
            r["n_toxic"],
            r["tox_share"],
        )
        for r in toxicity_stats(_df(spark, rows)).collect()
    }
    assert out == {
        ("2024-03-01", "user"): (3, 1, round(1 / 3, 6)),
        ("2024-03-01", "assistant"): (1, 0, 0.0),
        ("2024-03-02", "user"): (1, 1, 1.0),
    }


# ---------------------------------------------------------------------------
# role consistency
# ---------------------------------------------------------------------------


@pytest.fixture()
def role_frame(spark):
    rows = [
        # clean conversation
        ("ok", 0, "user", "hi", None, D1),
        ("ok", 1, "assistant", "hello", None, D1),
        # bad first role + adjacent assistant repeat
        ("bad1", 0, "assistant", "unprompted", None, D1),
        ("bad1", 1, "assistant", "again", None, D1),
        # tool orphan (tool right after user) + mismatch (tool col on user)
        ("bad2", 0, "user", "run it", "calc", D2),
        ("bad2", 1, "tool", "42", "calc", D2),
        # tool chain after assistant is NOT an orphan
        ("ok2", 0, "user", "go", None, D2),
        ("ok2", 1, "assistant", "calling", None, D2),
        ("ok2", 2, "tool", "out", "calc", D2),
        ("ok2", 3, "tool", "more", "calc", D2),
    ]
    return _df(spark, rows)


def test_role_consistency_audit(spark, role_frame):
    out = {
        r["day"].date().isoformat(): (
            r["n_convs"],
            r["n_bad_first"],
            r["n_adjacent_repeat"],
            r["n_tool_orphan"],
            r["n_tool_mismatch"],
        )
        for r in role_consistency_audit(role_frame).collect()
    }
    # bad1: bad first + adjacent repeat; bad2: orphan + mismatch (user turn
    # carries a tool value); ok/ok2: all clean incl. the tool→tool chain.
    assert out == {
        "2024-03-01": (2, 1, 1, 0, 0),
        "2024-03-02": (2, 0, 0, 1, 1),
    }


def test_role_audit_shuffle_carries_no_text(spark, role_frame):
    # formatted explain lists one "(id) Exchange" header plus an
    # "Input [n]: [...]" detail block per node — the Input is exactly
    # the shuffled payload
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        role_consistency_audit(role_frame).explain("formatted")
    plan = buf.getvalue()
    blocks = plan.split("\n\n")
    exchange_blocks = [b for b in blocks if b.startswith("(") and "Exchange" in b.splitlines()[0]]
    assert exchange_blocks, plan
    for b in exchange_blocks:
        assert "text#" not in b, b
