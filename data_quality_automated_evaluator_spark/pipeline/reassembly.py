"""Whole-conversation reassembly via grouped-map pandas (applyInPandas).

The window route (pipeline/features.py) covers rules expressible as
window functions. Some conversation-level computations need the whole
ordered conversation in memory — full-dialogue rendering, cross-turn
span analysis, conversation-level fingerprints. ``applyInPandas`` is
the idiomatic Spark primitive: one shuffle by conv_id, each group
delivered as an ordered pandas frame.

Scale notes: group size is bounded (a conversation is ≤ ~10⁴ turns),
so per-group memory is trivial; hot conversations are single groups —
AQE cannot split a group, which is WHY aggregation-style conv stats use
the salted two-phase path instead. Use this operator only for
computations that genuinely need the whole ordered conversation.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.hashing import jaccard_shingles

REASSEMBLY_SCHEMA = (
    "conv_id string, n_turns int, n_role_violations int, "
    "dialogue_sha256 string, max_adjacent_jaccard double, "
    "first_role string, duration_sec double"
)


def _process_conversation(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    roles = pdf["role"].tolist()
    texts = pdf["text"].fillna("").tolist()
    violations = sum(
        1
        for a, b in zip(roles, roles[1:])
        if a == b and a in ("user", "assistant")
    )
    # canonical rendering → conversation fingerprint
    rendered = "\n".join(f"{r}: {t}" for r, t in zip(roles, texts))
    sha = hashlib.sha256(rendered.encode("utf-8", "surrogatepass")).hexdigest()
    # adjacent-turn near-duplication (copy-paste loops inside a dialogue)
    max_jac = 0.0
    for a, b in zip(texts, texts[1:]):
        if a and b:
            max_jac = max(max_jac, jaccard_shingles(a, b))
    ts = pd.to_datetime(pdf["ts"])
    duration = float((ts.max() - ts.min()).total_seconds())
    return pd.DataFrame(
        [
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "n_turns": len(pdf),
                "n_role_violations": violations,
                "dialogue_sha256": sha,
                "max_adjacent_jaccard": max_jac,
                "first_role": roles[0] if roles else None,
                "duration_sec": duration,
            }
        ]
    )


def reassemble_conversations(df: DataFrame) -> DataFrame:
    """One row per conversation with whole-dialogue features.

    Plan: Exchange(hash conv_id) → FlatMapGroupsInPandas. Input columns
    are pruned to what the group processor reads.
    """
    return (
        df.select("conv_id", "turn_idx", "role", "text", "ts")
        .groupBy("conv_id")
        .applyInPandas(_process_conversation, schema=REASSEMBLY_SCHEMA)
    )
