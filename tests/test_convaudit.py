"""pipeline/convaudit: role transitions, outcomes, templates, tool chains.

Small hand-built transcript frames with every edge case pinned against
hand-computed expectations: the <start> bigram, abandoned/tool-tail
closings, digit/whitespace normalization in the template key, and
broken vs unbroken tool islands.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from data_quality_automated_evaluator_spark.pipeline.convaudit import (
    conversation_outcome_stats,
    role_transition_stats,
    templated_response_stats,
    tool_chain_stats,
)

D1 = dt.datetime(2024, 3, 1, 10, 0, 0)
D2 = dt.datetime(2024, 3, 2, 9, 30, 0)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_role_transitions_start_and_shares(spark):
    rows = [
        ("a", 0, "user", "hi", None, D1),
        ("a", 1, "assistant", "yo", None, D1),
        ("b", 0, "user", "q", None, D1),
    ]
    out = {
        (r["prev_role"], r["role"]): (r["n"], r["day_share"])
        for r in role_transition_stats(_df(spark, rows)).collect()
    }
    # two conversation starts land on <start>→user, one user→assistant
    assert out[("<start>", "user")] == (2, round(2 / 3, 6))
    assert out[("user", "assistant")] == (1, round(1 / 3, 6))
    assert len(out) == 2


def test_conversation_outcomes_by_closing_role(spark):
    rows = [
        # ends on assistant (closed)
        ("a", 0, "user", "q", None, D1),
        ("a", 1, "assistant", "ans", None, D1),
        # ends on user (abandoned) — and on day 2
        ("b", 0, "user", "q", None, D2),
        # ends on tool (dangling)
        ("c", 0, "user", "q", None, D1),
        ("c", 1, "tool", "r", "tool_1", D1),
    ]
    by_day = {
        r["day"].day: r
        for r in conversation_outcome_stats(_df(spark, rows)).collect()
    }
    d1 = by_day[1]
    assert (d1["n_convs"], d1["n_abandoned"], d1["n_tool_tail"]) == (2, 0, 1)
    assert d1["assistant_close_share"] == 0.5
    assert d1["mean_turns"] == 2.0
    d2 = by_day[2]
    assert (d2["n_convs"], d2["n_abandoned"]) == (1, 1)


def test_templated_responses_normalization_and_threshold(spark):
    # same template up to case/digits/whitespace, across 3 conversations
    rows = [
        ("a", 1, "assistant", "Order 123 confirmed.", None, D1),
        ("a", 3, "assistant", "order 9 confirmed.", None, D1),  # reuse in a
        ("b", 1, "assistant", "ORDER   77\tconfirmed.", None, D1),
        ("c", 1, "assistant", " order 0 confirmed. ", None, D1),
        # distinct template, only 2 convs — below min_convs
        ("a", 5, "assistant", "goodbye", None, D1),
        ("b", 5, "assistant", "goodbye", None, D1),
        # non-assistant turns never count
        ("d", 0, "user", "order 1 confirmed.", None, D1),
    ]
    got = templated_response_stats(_df(spark, rows)).collect()
    assert len(got) == 1
    row = got[0]
    expected = hashlib.md5(b"order 0 confirmed."[:48]).hexdigest()
    assert row["template_hash"] == expected
    assert (row["n_uses"], row["n_convs"]) == (4, 3)


def test_tool_chains_islands(spark):
    rows = [
        # conv a: tool turns at 1,2,3 (chain of 3) then 5 (chain of 1)
        ("a", 0, "user", "q", None, D1),
        ("a", 1, "tool", "r", "t", D1),
        ("a", 2, "tool", "r", "t", D1),
        ("a", 3, "tool", "r", "t", D1),
        ("a", 4, "assistant", "ans", None, D1),
        ("a", 5, "tool", "r", "t", D1),
        # conv b: a single 2-chain on day 2
        ("b", 0, "tool", "r", "t", D2),
        ("b", 1, "tool", "r", "t", D2),
    ]
    by_day = {
        r["day"].day: r for r in tool_chain_stats(_df(spark, rows)).collect()
    }
    d1 = by_day[1]
    assert (d1["n_chains"], d1["max_chain_len"]) == (2, 3)
    assert d1["mean_chain_len"] == 2.0
    assert d1["share_ge3"] == 0.5
    d2 = by_day[2]
    assert (d2["n_chains"], d2["max_chain_len"], d2["share_ge3"]) == (1, 2, 0.0)


def test_context_overflow_cumsum_and_budget(spark):
    # conv a: 3 turns × ~4 tokens; budget 10 → overflows on turn 2
    rows = [
        ("a", 0, "user", "one two three four", None, D1),
        ("a", 1, "assistant", "five six seven eight", None, D1),
        ("a", 2, "user", "nine ten eleven twelve", None, D1),
        # conv b: stays under budget
        ("b", 0, "user", "short", None, D1),
        # conv c: null text handled as zero tokens
        ("c", 0, "user", None, None, D2),
    ]
    from data_quality_automated_evaluator_spark.pipeline.convaudit import (
        context_overflow_stats,
    )

    by_day = {
        r["day"].day: r
        for r in context_overflow_stats(
            _df(spark, rows), token_budget=10
        ).collect()
    }
    d1 = by_day[1]
    assert (d1["n_convs"], d1["n_overflow"]) == (2, 1)
    assert d1["overflow_share"] == 0.5
    assert d1["mean_overflow_turn"] == 2.0
    d2 = by_day[2]
    assert (d2["n_convs"], d2["n_overflow"], d2["mean_total_tok"]) == (
        1,
        0,
        0.0,
    )


def test_script_mix_dominant_and_mixed(spark):
    from data_quality_automated_evaluator_spark.functions.scriptmix import (
        script_mix_stats,
    )

    rows = [
        # pure latin
        ("en", "hello world plain text"),
        # han-dominant with a real latin admixture (>=5 chars each → mixed)
        ("zh", "这是一个很长的测试文档内容样本 hello"),
        # empty text → dominant 'none'
        ("en", ""),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r["lang"], r["dominant_script"]): r
        for r in script_mix_stats(df).collect()
    }
    assert got[("en", "latin")]["n_docs"] == 1
    assert got[("en", "latin")]["mixed_share"] == 0.0
    assert got[("en", "none")]["n_docs"] == 1
    zh = got[("zh", "han")]
    assert zh["mixed_share"] == 1.0
    assert zh["han_share"] > zh["latin_share"] > 0


def test_turn_integrity_gaps_dups_inversions(spark):
    from data_quality_automated_evaluator_spark.pipeline.convaudit import (
        turn_integrity_stats,
    )

    rows = [
        # clean conversation
        ("ok", 0, "user", "q", None, D1),
        ("ok", 1, "assistant", "a", None, D1 + dt.timedelta(seconds=5)),
        # gap: indices 0, 2
        ("gap", 0, "user", "q", None, D1),
        ("gap", 2, "assistant", "a", None, D1 + dt.timedelta(seconds=5)),
        # duplicate index 1 (and the dup must not flag a gap)
        ("dup", 0, "user", "q", None, D1),
        ("dup", 1, "assistant", "a", None, D1 + dt.timedelta(seconds=5)),
        ("dup", 1, "assistant", "a2", None, D1 + dt.timedelta(seconds=6)),
        # timestamp inversion: turn 1 earlier than turn 0
        ("inv", 0, "user", "q", None, D1),
        ("inv", 1, "assistant", "a", None, D1 - dt.timedelta(seconds=30)),
    ]
    out = turn_integrity_stats(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_convs"] == 4
    assert r["n_gap_convs"] == 1
    assert r["n_dup_idx_convs"] == 1
    assert (r["n_inversion_convs"], r["n_inversions"]) == (1, 1)
