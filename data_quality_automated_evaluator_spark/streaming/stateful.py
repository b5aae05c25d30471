"""Custom stateful streaming operator: incremental conversation assembly.

``streaming/quality_stream.py`` covers the stateless per-turn rules and
watermarked windowed aggregates. What those cannot express is an *exact*
per-conversation computation that needs every turn seen so far in
``turn_idx`` order — role-alternation violations, first role, turn-index
contiguity — across micro-batch boundaries and out-of-order arrival.

That is the textbook use of ``applyInPandasWithState`` (the Spark
primitive for arbitrary stateful streaming logic; the reference engine
has no streaming path at all — SURVEY.md §2.12 — so this is a graft
addition, not a port): one shuffle by ``conv_id``, per-key state kept by
the streaming engine between micro-batches, and Arrow-batched pandas on
the Python side (no per-row Python in the hot loop).

State design (scale notes for the 10^12-turn table):

- State per conversation is O(n_turns) but holds only ``(turn_idx,
  role_code)`` pairs — NOT the text. A 10^4-turn conversation costs
  ~80 KB of state; text never enters the state store.
- Output mode is ``update``: every micro-batch emits a fresh snapshot
  row per conversation touched in that batch, so downstream gets
  monotonically-improving conversation flags with bounded latency.
- With ``GroupStateTimeout.ProcessingTimeTimeout`` the state for idle
  conversations is dropped after ``idle_timeout_ms`` (a conversation is
  bounded in wall-clock time at ingest); pass ``NoTimeout`` in tests
  for determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# state: compact parallel arrays of what we have seen per conversation.
STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType())),
        StructField("roles", ArrayType(StringType())),
        StructField("min_ts_us", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("n_role_violations", IntegerType()),
        StructField("first_role", StringType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("is_contiguous", IntegerType()),
        StructField("duration_sec", LongType()),
        StructField("final", IntegerType()),
    ]
)

_SPEAKER_ROLES = ("user", "assistant")


def _snapshot(conv_id: str, turn_idxs: list, roles: list,
              min_ts_us: int, max_ts_us: int, final: bool) -> pd.DataFrame:
    order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
    s_roles = [roles[i] for i in order]
    s_idxs = [turn_idxs[i] for i in order]
    violations = sum(
        1
        for a, b in zip(s_roles, s_roles[1:])
        if a == b and a in _SPEAKER_ROLES
    )
    contiguous = int(s_idxs == list(range(s_idxs[0], s_idxs[0] + len(s_idxs))))
    return pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": len(s_idxs),
                "n_role_violations": violations,
                "first_role": s_roles[0] if s_roles else None,
                "max_turn_idx": s_idxs[-1] if s_idxs else -1,
                "is_contiguous": contiguous,
                "duration_sec": (max_ts_us - min_ts_us) // 1_000_000,
                "final": int(final),
            }
        ]
    )


def _assemble(key: tuple, pdf_iter: Iterator[pd.DataFrame],
              state: GroupState,
              idle_timeout_ms: int | None) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        turn_idxs, roles, min_ts_us, max_ts_us = state.get
        state.remove()
        yield _snapshot(conv_id, list(turn_idxs), list(roles),
                        min_ts_us, max_ts_us, final=True)
        return

    if state.exists:
        turn_idxs, roles, min_ts_us, max_ts_us = state.get
        turn_idxs, roles = list(turn_idxs), list(roles)
    else:
        turn_idxs, roles, min_ts_us, max_ts_us = [], [], None, None

    for pdf in pdf_iter:
        if len(pdf) == 0:
            # the runtime may hand over empty Arrow batches; min()/max()
            # below would produce NaN and crash the int() conversion
            continue
        turn_idxs.extend(int(x) for x in pdf["turn_idx"])
        roles.extend(str(x) for x in pdf["role"])
        ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000
        lo, hi = int(ts_us.min()), int(ts_us.max())
        min_ts_us = lo if min_ts_us is None else min(min_ts_us, lo)
        max_ts_us = hi if max_ts_us is None else max(max_ts_us, hi)

    state.update((turn_idxs, roles, min_ts_us, max_ts_us))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    yield _snapshot(conv_id, turn_idxs, roles, min_ts_us, max_ts_us, final=False)


def streaming_reassembly(
    stream_df: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Exact cross-batch conversation assembly on a stream.

    Plan: Exchange(hash conv_id) → FlatMapGroupsInPandasWithState.
    Input columns are pruned to ``(conv_id, turn_idx, role, ts)`` before
    the shuffle — text never crosses it.

    ``idle_timeout_ms=None`` → NoTimeout (deterministic finite-source
    tests); a positive value → ProcessingTimeTimeout: idle conversations
    emit one last ``final=1`` snapshot and release their state.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        yield from _assemble(key, pdf_iter, state, idle_timeout_ms)

    return (
        stream_df.select("conv_id", "turn_idx", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
