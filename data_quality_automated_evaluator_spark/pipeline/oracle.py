"""Single-node pandas oracle: the reference implementation of the
quality filter the Spark pipeline must match (keep/drop F1 ≥ 0.99,
byte-exact scrubbed text under stable (conv_id, turn_idx) ordering).

Shares the scoring cores (langid / perplexity / scrub / thresholds)
with the Spark path — this file only re-implements the *dataflow*
(grouping, adjacency, conjunction) in pandas, so a divergence can only
come from the dataflow, which is exactly what the golden tests pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.langid import langid_label
from ..functions.perplexity import perplexity_batch
from ..functions.scrub import scrub_batch
from ..functions.textstats import pandas_text_features
from .rules import RULE_NAMES, VALID_ROLES, Thresholds


def oracle_quality(pdf: pd.DataFrame, t: Thresholds = Thresholds()) -> pd.DataFrame:
    """Run the full quality filter single-node; returns the per-turn frame
    sorted by (conv_id, turn_idx) with rule flags, keep, text_scrubbed."""
    out = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).copy()

    feats = pandas_text_features(out["text"])
    for c in feats.columns:
        out[c] = feats[c]
    out["lang"] = langid_label(out["text"])
    out["ppl"] = perplexity_batch(out["text"])

    # conversation features (rows are sorted by conv_id, turn_idx)
    g = out.groupby("conv_id", sort=False)
    out["prev_role"] = g["role"].shift(1)
    adj = (
        out["prev_role"].isin(["user", "assistant"])
        & (out["role"] == out["prev_role"])
    ).astype(int)
    out["conv_n_turns"] = g["conv_id"].transform("size").astype("int32")
    first_role = out.loc[out["turn_idx"] == 0, ["conv_id", "role"]].set_index("conv_id")["role"]
    out["conv_first_role"] = out["conv_id"].map(first_role)
    out["conv_role_violation"] = adj.groupby(out["conv_id"], sort=False).transform("max") == 1

    tool_notnull = out["tool"].notna()
    out["r_len"] = (out["n_chars"] >= 1) & (out["n_chars"] <= t.max_chars)
    out["r_symbol"] = out["symbol_ratio"] <= t.max_symbol_ratio
    out["r_repetition"] = (out["n_tokens"] < t.repetition_min_tokens) | (
        out["distinct_token_ratio"] >= t.min_distinct_ratio
    )
    out["r_lang"] = out["lang"].isin(list(t.allowed_langs))
    out["r_ppl"] = out["ppl"] <= t.max_ppl
    out["r_role"] = out["role"].isin(VALID_ROLES) & (
        tool_notnull == (out["role"] == "tool")
    )
    out["c_first_role"] = out["conv_first_role"] == "user"
    out["c_alternation"] = ~out["conv_role_violation"]
    out["c_n_turns"] = (out["conv_n_turns"] >= t.min_turns) & (
        out["conv_n_turns"] <= t.max_turns
    )

    keep = np.ones(len(out), dtype=bool)
    for r in RULE_NAMES:
        keep &= out[r].to_numpy(dtype=bool)
    out["keep"] = keep
    out["text_scrubbed"] = scrub_batch(out["text"])
    return out


def f1_score(y_true: pd.Series, y_pred: pd.Series) -> float:
    """F1 of the keep label (positive class = keep)."""
    yt = y_true.to_numpy(dtype=bool)
    yp = y_pred.to_numpy(dtype=bool)
    tp = int((yt & yp).sum())
    fp = int((~yt & yp).sum())
    fn = int((yt & ~yp).sum())
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)
