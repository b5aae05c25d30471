"""SFT prep operators: per-turn loss spans + atomic conversation packing."""
from __future__ import annotations

import re

import pandas as pd

from data_quality_automated_evaluator_spark.operators.sft import (
    pack_conversations,
    turn_loss_spans,
)


def _toks(s: str) -> int:
    return len([t for t in re.split(r"\s+", s) if t != ""])


def _mk_turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_loss_spans_match_pandas(spark):
    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi how can I help"),
        ("c1", 2, "user", "  spaced   out  "),
        ("c1", 3, "assistant", ""),
        ("c2", 0, "system", "be nice"),
        ("c2", 1, "user", "one"),
        ("c2", 2, "assistant", "two words"),
        ("c2", 3, "tool", "tool output here"),
    ]
    got = (
        turn_loss_spans(_mk_turns(spark, rows))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    # independent sequential recompute
    exp = []
    cur: dict[str, int] = {}
    for conv, idx, role, text in rows:
        n = _toks(text)
        start = cur.get(conv, 0)
        end = start + n + 2
        cur[conv] = end
        exp.append((conv, idx, role, n, start, end, int(role == "assistant")))
    for (conv, idx, role, n, start, end, in_loss), r in zip(
        exp, got.itertuples(index=False)
    ):
        assert (r.conv_id, r.turn_idx, r.role) == (conv, idx, role)
        assert r.n_text_tokens == n
        assert (r.tok_start, r.tok_end) == (start, end)
        assert r.in_loss == in_loss
        assert r.loss_tokens == (n if in_loss else 0)


def test_loss_spans_empty_text_still_costs_overhead(spark):
    got = (
        turn_loss_spans(_mk_turns(spark, [("c", 0, "user", ""), ("c", 1, "assistant", "x")]))
        .orderBy("turn_idx")
        .toPandas()
    )
    assert got.loc[0, "n_text_tokens"] == 0
    assert got.loc[0, "tok_end"] == 2  # overhead only
    assert got.loc[1, "tok_start"] == 2


def _greedy_ref(sizes, capacity):
    out, pack, fill = [], 0, 0
    for n in sizes:
        if fill > 0 and fill + n > capacity:
            pack, fill = pack + 1, 0
        out.append((pack, fill))
        fill += n
    return out


def test_pack_matches_sequential_greedy_per_bucket(spark):
    rows = []
    for c in range(60):
        # conv c has (c % 7) + 1 turns of (c % 5) + 1 tokens each
        for t in range((c % 7) + 1):
            rows.append((f"conv{c:03d}", t, "user", "tok " * ((c % 5) + 1)))
    got = (
        pack_conversations(
            _mk_turns(spark, rows), capacity=40, n_buckets=4
        )
        .orderBy("conv_id")
        .toPandas()
    )
    assert len(got) == 60
    # replay the greedy per bucket from the operator's own bucket/size
    # columns (bucket hash correctness is oracle-checked; here we pin
    # that the distributed pack assignment IS the sequential greedy)
    for _, grp in got.groupby("bucket"):
        grp = grp.sort_values("conv_id")
        ref = _greedy_ref([int(n) for n in grp.n_conv_tokens], 40)
        assert list(zip(grp.pack_id, grp.pack_offset)) == ref
    # conv sizes themselves: turns * (tokens + overhead)
    for r in got.itertuples(index=False):
        c = int(r.conv_id[4:])
        assert r.n_conv_tokens == ((c % 7) + 1) * ((c % 5) + 1 + 2)


def test_pack_atomic_and_oversize(spark):
    rows = [
        ("a", 0, "user", "w " * 30),   # 32 rendered tokens
        ("b", 0, "user", "w " * 100),  # 102 — oversize vs capacity 40
        ("c", 0, "user", "w " * 10),   # 12
    ]
    got = (
        pack_conversations(_mk_turns(spark, rows), capacity=40, n_buckets=1)
        .orderBy("conv_id")
        .toPandas()
    )
    # order a, b, c in one bucket: a starts pack 0; b overflows -> pack 1
    # alone (oversize allowed, never split); c forced to pack 2
    assert list(got.pack_id) == [0, 1, 2]
    assert list(got.pack_offset) == [0, 0, 0]


def test_pack_deterministic_under_input_order(spark):
    rows = [
        (f"conv{c}", t, "user", "x " * (c + 1))
        for c in range(20)
        for t in range(2)
    ]
    a = (
        pack_conversations(_mk_turns(spark, rows), capacity=30, n_buckets=4)
        .orderBy("conv_id")
        .toPandas()
    )
    b = (
        pack_conversations(
            _mk_turns(spark, list(reversed(rows))), capacity=30, n_buckets=4
        )
        .orderBy("conv_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_truncate_keeps_trailing_turns_within_budget(spark):
    from data_quality_automated_evaluator_spark.operators.sft import (
        truncate_to_context,
    )

    rows = [
        ("c", 0, "user", "w " * 50),       # 52 rendered
        ("c", 1, "assistant", "w " * 30),  # 32
        ("c", 2, "user", "w " * 10),       # 12
        ("c", 3, "assistant", "w " * 5),   # 7
    ]
    got = (
        truncate_to_context(_mk_turns(spark, rows), capacity=60)
        .orderBy("turn_idx")
        .toPandas()
    )
    # suffix sums: t3=7, t2=19, t1=51, t0=103 -> keep t1..t3 (51 <= 60)
    assert list(got.turn_idx) == [1, 2, 3]
    assert list(got.tok_start) == [0, 32, 44]
    assert list(got.tok_end) == [32, 44, 51]


def test_truncate_always_keeps_last_turn_even_oversize(spark):
    from data_quality_automated_evaluator_spark.operators.sft import (
        truncate_to_context,
    )

    rows = [
        ("c", 0, "user", "w " * 5),
        ("c", 1, "assistant", "w " * 200),  # 202 rendered > 50
    ]
    got = (
        truncate_to_context(_mk_turns(spark, rows), capacity=50)
        .orderBy("turn_idx")
        .toPandas()
    )
    assert list(got.turn_idx) == [1]
    assert list(got.tok_start) == [0]
    assert list(got.tok_end) == [202]


def test_truncate_noop_when_conversation_fits(spark):
    from data_quality_automated_evaluator_spark.operators.sft import (
        truncate_to_context,
        turn_loss_spans,
    )

    rows = [
        ("c", 0, "user", "a b c"),
        ("c", 1, "assistant", "d e"),
    ]
    trunc = (
        truncate_to_context(_mk_turns(spark, rows), capacity=1000)
        .orderBy("turn_idx")
        .toPandas()
    )
    spans = (
        turn_loss_spans(_mk_turns(spark, rows))
        .orderBy("turn_idx")
        .toPandas()
    )
    assert list(trunc.tok_start) == list(spans.tok_start)
    assert list(trunc.tok_end) == list(spans.tok_end)


def test_sft_plan_shapes(spark):
    """Plan gates: loss spans ride ONE conv_id Exchange; the packing
    manifest aggregates the conversation-level frame without re-reading
    or re-shuffling the turn table."""
    from data_quality_automated_evaluator_spark.operators.sft import (
        turn_loss_spans,
    )

    rows = [(f"c{i}", t, "user", "a b") for i in range(8) for t in range(3)]
    plan = (
        turn_loss_spans(_mk_turns(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Exchange: the conv_id hash partitioning for the window
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(conv_id" in plan, plan
