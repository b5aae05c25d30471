"""Deterministic synthetic transcripts table (FIXTURES.md §1).

Shape per BASELINE input_hint: ``(conv_id: string, turn_idx: int,
role: string, text: string, tool: string, ts: timestamp)``.

Seed=42 everywhere; same bytes on every run. Conversation sizes are
Zipf-ish with a deliberate hot tail (~0.1% conversations at ~100× the
median size) to exercise salted-repartition skew handling. Text mixes
clean English, non-English (French/German/Russian/Chinese), junk
(repetition, symbol floods, empties, oversize blobs), and synthetic
PII / toxicity-lexicon tokens, with multi-byte NFC-normalized unicode
to pin byte-exact scrubbing.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool", "system"]

_EN_SUBJ = ["the model", "our pipeline", "a customer", "the report", "this dataset",
            "the cluster", "an engineer", "the scheduler", "our team", "the service"]
_EN_VERB = ["processes", "evaluates", "aggregates", "filters", "summarizes",
            "monitors", "transforms", "validates", "partitions", "streams"]
_EN_OBJ = ["daily transactions", "quality metrics", "the event log", "user sessions",
           "conversation turns", "parquet files", "the time series", "outlier counts",
           "feature columns", "checkpoint state"]
_EN_TAIL = ["without any delay", "across all partitions", "with great care é",
            "before the deadline", "in a single pass", "under heavy load",
            "for every interval", "with full lineage 漢字", "despite the skew",
            "as expected 🎉"]

_FR = ["le modèle évalue les données chaque jour avec soin",
       "notre équipe traite les transactions et les métriques à Paris",
       "la qualité des conversations est vérifiée par le système français",
       "ce rapport résume les résultats de la journée précédente"]
_DE = ["das Modell verarbeitet die Daten jeden Tag mit großer Sorgfalt",
       "unser Team überprüft die Qualität der Gespräche im System",
       "die Pipeline aggregiert Metriken über alle Partitionen hinweg",
       "der Bericht fasst die Ergebnisse des Tages zusammen"]
_RU = ["модель обрабатывает данные каждый день очень тщательно",
       "наша команда проверяет качество разговоров в системе",
       "отчёт суммирует результаты за предыдущий день",
       "конвейер агрегирует метрики по всем разделам"]
_ZH = ["模型每天仔细处理数据并汇总指标",
       "我们的团队检查系统中对话的质量",
       "报告总结了前一天的所有结果",
       "管道在所有分区上聚合质量指标"]

# deliberately mild placeholder lexicon — stands in for a real toxicity list
TOXIC_TOKENS = ["frakk", "blarghole", "sludgebrain", "gritwit"]

_PII_EMAIL = "contact user{k}@example.com for details"
_PII_PHONE = "call +1-555-01{k2:02d} now"
_PII_CARD = "card 4{k12:015d} was charged"
_PII_IP = "host 10.{a}.{b}.{c} responded"


def _mk_text(rng: np.random.Generator, kind: str, i: int) -> str:
    if kind == "en":
        s = (f"{_EN_SUBJ[rng.integers(10)]} {_EN_VERB[rng.integers(10)]} "
             f"{_EN_OBJ[rng.integers(10)]} {_EN_TAIL[rng.integers(10)]}")
        reps = int(rng.integers(1, 4))
        return ". ".join([s] * 1) if reps == 1 else s + ". " + (
            f"{_EN_SUBJ[rng.integers(10)]} {_EN_VERB[rng.integers(10)]} "
            f"{_EN_OBJ[rng.integers(10)]} {_EN_TAIL[rng.integers(10)]}")
    if kind == "fr":
        return _FR[rng.integers(len(_FR))]
    if kind == "de":
        return _DE[rng.integers(len(_DE))]
    if kind == "ru":
        return _RU[rng.integers(len(_RU))]
    if kind == "zh":
        return _ZH[rng.integers(len(_ZH))]
    if kind == "junk_repeat":
        tok = ["spam", "na", "ha", "xo"][rng.integers(4)]
        return (tok + " ") * int(rng.integers(30, 120))
    if kind == "junk_symbols":
        return "".join(rng.choice(list("!@#$%^&*()[]{}<>~|\\/+=_-"), size=int(rng.integers(40, 200))))
    if kind == "junk_empty":
        return ["", " ", "   ", "\t"][rng.integers(4)]
    if kind == "junk_blob":
        return "x" * int(rng.integers(8200, 12000))
    if kind == "pii":
        which = rng.integers(4)
        if which == 0:
            return _PII_EMAIL.format(k=int(rng.integers(1000)))
        if which == 1:
            return _PII_PHONE.format(k2=int(rng.integers(100)))
        if which == 2:
            return _PII_CARD.format(k12=int(rng.integers(10**12)))
        return _PII_IP.format(a=int(rng.integers(256)), b=int(rng.integers(256)), c=int(rng.integers(256)))
    if kind == "toxic":
        base = (f"{_EN_SUBJ[rng.integers(10)]} {_EN_VERB[rng.integers(10)]} "
                f"{_EN_OBJ[rng.integers(10)]}")
        return f"{base} you {TOXIC_TOKENS[rng.integers(len(TOXIC_TOKENS))]}"
    raise ValueError(kind)


_KINDS = np.array(["en", "fr", "de", "ru", "zh", "junk_repeat", "junk_symbols",
                   "junk_empty", "junk_blob", "pii", "toxic"])
_KIND_P = np.array([0.84, 0.015, 0.015, 0.015, 0.015, 0.012, 0.008,
                    0.005, 0.005, 0.02, 0.05])


def generate_transcripts(n_convs: int = 3000, seed: int = 42) -> pd.DataFrame:
    """Generate the deterministic transcripts frame (global row order shuffled
    so tests prove stable (conv_id, turn_idx) reassembly)."""
    rng = np.random.default_rng(seed)
    # Zipf-ish conversation sizes in [2, 200]
    sizes = np.clip((rng.zipf(1.3, n_convs) % 40) + 2, 2, 200)
    # hot conversations: ~0.1% at ~100x median
    median = int(np.median(sizes))
    hot = rng.random(n_convs) < 0.001
    sizes[hot] = median * 100

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    for ci in range(n_convs):
        n = int(sizes[ci])
        cid = f"c{ci:08d}"
        start = base_ts + np.timedelta64(int(rng.integers(0, 90 * 86400)), "s")
        # ~1% conversations violate role alternation on purpose
        violate = rng.random() < 0.01
        t = start
        for ti in range(n):
            role = ROLES[ti % 2] if not violate else ROLES[int(rng.integers(2))]
            # sprinkle tool/system turns
            r = rng.random()
            if not violate:
                if r < 0.05:
                    role = "tool"
                elif r < 0.07:
                    role = "system"
            kind = str(rng.choice(_KINDS, p=_KIND_P))
            text = unicodedata.normalize("NFC", _mk_text(rng, kind, ti))
            tool = f"tool_{int(rng.integers(7))}" if role == "tool" else None
            t = t + np.timedelta64(int(rng.integers(1, 300)), "s")
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(t)

    # plain object dtype for strings (pandas "string" extension dtype breaks
    # Spark's non-Arrow createDataFrame schema inference)
    pdf = pd.DataFrame(
        {
            "conv_id": pd.Series(conv_ids, dtype=object),
            "turn_idx": pd.array(turn_idxs, dtype="int32"),
            "role": pd.Series(roles, dtype=object),
            "text": pd.Series(texts, dtype=object),
            "tool": pd.Series(tools, dtype=object),
            "ts": pd.to_datetime(tss),
        }
    )
    # shuffle global order deterministically
    perm = np.random.default_rng(seed + 1).permutation(len(pdf))
    return pdf.iloc[perm].reset_index(drop=True)


def write_transcripts_parquet(path: str, n_convs: int = 3000, seed: int = 42) -> str:
    """Materialize the transcripts table as parquet; returns the path.
    Idempotent: skips generation when the file already exists."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pdf = generate_transcripts(n_convs=n_convs, seed=seed)
    # microsecond timestamps — Spark's parquet reader rejects NANOS;
    # small row groups so Spark can split the file across many tasks
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True, row_group_size=20000)
    return path
