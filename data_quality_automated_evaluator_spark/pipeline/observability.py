"""Single-pass pipeline telemetry via Spark observable metrics.

At production scale the quality pipeline's one action is the sink write;
counting kept/dropped turns with a second ``count()`` would re-run the
whole job (scan + Arrow UDFs + the conversation shuffle). Spark's
``DataFrame.observe`` evaluates aggregate expressions *inside* that one
action — the metrics ride the existing tasks and cost nothing extra —
which is the only telemetry shape that survives a 100 TB input.

The reference logs row counts around each stage
(dspetukhov/data-quality-automated-evaluator ``utils.py`` timing decorator,
``handle_data.py`` per-stage shapes); this module is the Spark-native
equivalent: per-rule failure counts, keep counts, and scrubbed-byte
totals observed during the caller's own action.

Batch callers get a :class:`pyspark.sql.Observation` (blocking ``.get``
after the action); streaming callers get named metrics surfaced in every
``StreamingQueryProgress.observedMetrics`` entry, one row per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from .rules import RULE_NAMES

#: metric name the streaming variant registers under (the key inside
#: ``StreamingQueryProgress.observedMetrics``).
STREAMING_METRIC_NAME = "quality_pipeline"


def quality_metric_exprs(df: DataFrame) -> list[Column]:
    """Aggregate expressions for pipeline telemetry, built from the
    columns ``df`` actually carries so the same helper serves the batch
    pipeline (``keep`` + all rule flags) and the stateless streaming
    variant (``keep_turn``, per-turn rules only).

    Distinct aggregates are disallowed inside observed metrics, so the
    conversation count uses HLL ``approx_count_distinct`` — the same
    trade the evaluator core's approx path makes (functions/aggregates).
    """
    cols = set(df.columns)
    keep_col = "keep" if "keep" in cols else "keep_turn"
    exprs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col(keep_col).cast("long")).alias("n_kept"),
    ]
    if "text_scrubbed" in cols:
        exprs.append(
            F.sum(F.length("text_scrubbed").cast("long")).alias("scrubbed_chars")
        )
    if "conv_id" in cols:
        exprs.append(F.approx_count_distinct("conv_id").alias("n_convs_approx"))
    for r in RULE_NAMES:
        if r in cols:
            exprs.append(F.sum((~F.col(r)).cast("long")).alias(f"fail_{r}"))
    return exprs


def attach_quality_observation(
    result: DataFrame, name: str = "quality_pipeline"
) -> tuple[DataFrame, Observation]:
    """Attach an :class:`Observation` to a *batch* pipeline result.

    Returns ``(observed_df, observation)``; run exactly one action on
    ``observed_df`` (typically the sink write), then ``observation.get``
    yields ``{n_turns, n_kept, scrubbed_chars, n_convs_approx,
    fail_<rule>...}`` with zero additional passes over the data.
    """
    obs = Observation(name)
    return result.observe(obs, *quality_metric_exprs(result)), obs


def attach_streaming_quality_observation(
    result: DataFrame, name: str = STREAMING_METRIC_NAME
) -> DataFrame:
    """Streaming variant: register the same metrics under ``name``.

    ``Observation`` objects are batch-only; streaming uses the
    string-name form, and each micro-batch reports one metrics row in
    ``StreamingQueryProgress.observedMetrics[name]`` (sum counters
    across progress events for job totals — see
    :func:`sum_observed_progress`).
    """
    return result.observe(name, *quality_metric_exprs(result))


def sum_observed_progress(
    progress_events: list, name: str = STREAMING_METRIC_NAME
) -> dict[str, int]:
    """Fold ``StreamingQuery.recentProgress`` into job totals.

    Every metric this module emits is a sum-like counter, so totals are
    the per-batch sums added up (``n_convs_approx`` becomes an upper
    bound across batches rather than a true distinct — documented HLL
    trade).
    """
    totals: dict[str, int] = {}
    for p in progress_events:
        # PySpark 4 hands back StreamingQueryProgress objects; older
        # callers (and json-parsed progress) hand back plain dicts.
        if hasattr(p, "observedMetrics"):
            om = p.observedMetrics or {}
        else:
            om = p.get("observedMetrics") or {}
        row = om.get(name)
        if row is None:
            continue
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        for k, v in d.items():
            totals[k] = totals.get(k, 0) + int(v)
    return totals
