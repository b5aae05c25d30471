"""Token-window chunking (operators/chunking.py) and TF-IDF keyword
extraction (functions/textstats.tfidf_top_terms): windowing math,
overlap semantics, empty-doc behavior, deterministic ranking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.functions.textstats import tfidf_top_terms
from data_quality_automated_evaluator_spark.operators.chunking import chunk_documents


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = (
        chunk_documents(df, chunk_tokens=4, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    # stride 2 over 10 tokens -> starts 0,2,4,6,8 -> 5 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t2 t3 t4 t5"  # 2-token overlap
    assert out[4]["chunk_text"] == "t8 t9"        # short tail window
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 4, 2]


def test_chunk_edge_cases(spark):
    rows = [
        (1, ""),               # zero tokens -> no chunks
        (2, "   "),            # whitespace only -> no chunks
        (3, "only"),           # single token -> one 1-token chunk
        (4, "a  b\t c\nd"),    # messy whitespace -> clean token stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=3, overlap=0).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "only"
    assert [r["chunk_text"] for r in sorted(by_doc[4], key=lambda r: r["chunk_idx"])] == [
        "a b c", "d"
    ]

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=-1)


def test_chunk_coverage_no_token_lost(spark):
    """Every input token appears in at least one chunk, and consecutive
    chunks share exactly `overlap` tokens (except the tail)."""
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    chunks = [
        r["chunk_text"].split()
        for r in chunk_documents(df, chunk_tokens=8, overlap=3)
        .orderBy("chunk_idx").collect()
    ]
    seen = [t for c in chunks for t in c]
    assert set(seen) == {f"w{i}" for i in range(23)}
    for a, b in zip(chunks, chunks[1:]):
        assert a[-3:] == b[:3]  # the 3-token overlap is literal


def test_tfidf_ranking(spark):
    rows = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared"),
        (3, "cherry cherry cherry shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2 and shared df=3
    assert by_doc[1][0]["term"] == "apple" and by_doc[1][0]["rank"] == 1
    # doc 3: cherry tf=3 dominates
    assert by_doc[3][0]["term"] == "cherry"
    # scores match the smoothed formula exactly
    exp = 2 * (math.log((3 + 1) / (1 + 1)) + 1)
    assert abs(by_doc[1][0]["score"] - round(exp, 6)) < 1e-9
    # k bound respected, ranks contiguous from 1
    for recs in by_doc.values():
        assert [r["rank"] for r in sorted(recs, key=lambda r: r["rank"])] == list(
            range(1, len(recs) + 1)
        )
        assert len(recs) <= 2


def test_tfidf_tie_order_deterministic(spark):
    """Equal scores break by term ascending — engine-stable ranks."""
    df = spark.createDataFrame(
        [(1, "zebra alpha"), (2, "unrelated thing")], "doc_id long, text string"
    )
    out = {r["rank"]: r["term"] for r in tfidf_top_terms(df, k=2).filter(F.col("doc_id") == 1).collect()}
    assert out == {1: "alpha", 2: "zebra"}


def test_pack_chunks_prefix_sum_exact(spark):
    """pack_id/pack_offset reconstruct the exact global token stream
    position regardless of input partitioning — the distributed prefix
    sum (per-partition windows + broadcast offsets) must equal the
    single-window semantic spec."""
    from data_quality_automated_evaluator_spark.operators.chunking import pack_chunks

    rows = [(d, i, 10 + (d * 7 + i) % 23) for d in range(40) for i in range(d % 4 + 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_chunk_tokens int"
    )
    for parts in (1, 7):  # partitioning must not change the answer
        out = (
            pack_chunks(df.repartition(parts), capacity=64)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
        before = 0
        for r in out:
            assert r["pack_id"] == before // 64
            assert r["pack_offset"] == before % 64
            assert 0 <= r["pack_offset"] < 64
            before += r["n_chunk_tokens"]
        assert before == sum(t for _, _, t in rows)

    with pytest.raises(ValueError, match="capacity"):
        pack_chunks(df, capacity=0)


def test_pack_chunks_empty(spark):
    from data_quality_automated_evaluator_spark.operators.chunking import pack_chunks

    empty = spark.createDataFrame(
        [], "doc_id long, chunk_idx int, n_chunk_tokens int"
    )
    assert pack_chunks(empty, capacity=16).count() == 0
