"""Bloom-filter membership prefilter (operators/bloom.py): no false
negatives, false positives under saturation, parameter validation, and
the map-only probe plan (no Exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.bloom import (
    bit_position_exprs,
    bloom_build,
    bloom_probe,
)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "text string")


def test_no_false_negatives_and_some_discrimination(spark):
    hist = [f"member-{i}" for i in range(200)]
    others = [f"outsider-{i}" for i in range(200)]
    bits = bloom_build(_df(spark, hist), m_bits=1 << 14, n_hashes=3)
    probed = {
        r["text"]: r["maybe_seen"]
        for r in bloom_probe(_df(spark, hist + others), bits).collect()
    }
    # every inserted key must answer True
    assert all(probed[k] for k in hist)
    # at 600/16384 bits loaded the outsiders should mostly answer False
    fp = sum(probed[k] for k in others)
    assert fp < len(others) / 4


def test_saturated_filter_goes_all_true(spark):
    # m_bits=64 with 200 keys saturates every word -> everything matches,
    # which is the documented degradation mode (never a false negative).
    keys = [f"k{i}" for i in range(200)]
    bits = bloom_build(_df(spark, keys), m_bits=64, n_hashes=3)
    out = bloom_probe(_df(spark, ["definitely-not-present"]), bits).collect()
    assert out[0]["maybe_seen"] is True


def test_probe_is_map_only(spark):
    import contextlib
    import io

    bits = bloom_build(_df(spark, ["a", "b"]), m_bits=1 << 10, n_hashes=2)
    probed = bloom_probe(_df(spark, ["a", "c"]), bits, n_hashes=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    assert "Exchange" not in buf.getvalue(), buf.getvalue()


def test_param_validation(spark):
    with pytest.raises(ValueError):
        bit_position_exprs(7, 1 << 10)
    with pytest.raises(ValueError):
        bit_position_exprs(3, 1 << 21)
    with pytest.raises(ValueError):
        bit_position_exprs(3, 100)  # not a multiple of 32
