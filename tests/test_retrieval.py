"""BM25 retrieval, unigram-KL content drift, tokenizer fertility and
edit-distance fuzzy dedup — known-value checks against pure-Python
recomputation plus the scale-plan gates (broadcast postings filter,
bounded-vocab TakeOrdered)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.retrieval import (
    bm25_topk,
    corpus_tokens,
)
from data_quality_automated_evaluator_spark.operators.distdrift import unigram_kl


DOCS = [
    (0, "spark window agg spark spark"),
    (1, "window agg window"),
    (2, "customer order value order"),
    (3, "spark"),
    (4, "value value value value value value"),
    (5, "unrelated words entirely here"),
]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Literal BM25 reference: per-term micro-nat quantization, BIGINT sum."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    scores = {}
    for qid, terms in queries.items():
        for d, ts in toks.items():
            s = 0
            for term in sorted(set(terms)):
                tf = ts.count(term)
                if tf == 0:
                    continue
                df = sum(1 for other in toks.values() if term in other)
                idf_micro = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
                contrib = idf_micro * (tf * 2.2) / (
                    tf + k1 * (0.25 + 0.75 * dl[d] / avgdl)
                )
                s += round(contrib)
            if s:
                scores[(qid, d)] = s
    return scores


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(
        [(1, "spark"), (1, "agg"), (2, "value")], "query_id int, term string"
    )
    out = bm25_topk(docs, qt, topk=10).collect()
    expected = _py_bm25(
        DOCS, {1: ["spark", "agg"], 2: ["value"]}
    )
    got = {(r.query_id, r.doc_id): r.score_micro for r in out}
    assert got == expected
    # rank order: score desc, doc_id asc, dense 1..k per query
    for qid in (1, 2):
        rows = sorted(
            (r for r in out if r.query_id == qid), key=lambda r: r.rank
        )
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.score_micro, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_bm25_rewards_tf_and_penalizes_length(spark):
    """doc0 (tf=3, short) must outrank doc3 (tf=1) and the long doc4
    must score below a short doc with the same tf for its term."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame([(1, "spark")], "query_id int, term string")
    rows = {r.doc_id: r for r in bm25_topk(docs, qt, topk=10).collect()}
    assert set(rows) == {0, 3}  # only docs containing 'spark'
    assert rows[0].score_micro > rows[3].score_micro
    assert rows[0].rank == 1


def test_bm25_zero_df_term_is_inert(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    base = spark.createDataFrame([(1, "spark")], "query_id int, term string")
    plus = spark.createDataFrame(
        [(1, "spark"), (1, "zzzzabsent")], "query_id int, term string"
    )
    a = {(r.query_id, r.doc_id): r.score_micro
         for r in bm25_topk(docs, base).collect()}
    b = {(r.query_id, r.doc_id): r.score_micro
         for r in bm25_topk(docs, plus).collect()}
    assert a == b


def test_bm25_postings_filter_is_broadcast(spark):
    """The corpus-sized token stream must meet the query-term list via a
    broadcast join — a sort-merge there would shuffle the whole corpus."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame([(1, "spark")], "query_id int, term string")
    plan = bm25_topk(docs, qt)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_corpus_tokens_tokenization(spark):
    docs = spark.createDataFrame(
        [(7, "A-b c7  d!!e")], "doc_id long, text string"
    )
    toks = [r.term for r in corpus_tokens(docs).collect()]
    assert toks == ["a", "b", "c7", "d", "e"]


def _py_kl(rows, vocab_size=2000):
    """Literal reference of unigram_kl: Laplace α=1 over top-k vocab."""
    from collections import Counter

    toks = [
        (s, w)
        for s, t in rows
        for w in re.findall(r"[a-z0-9]+", t.lower())
    ]
    cw = Counter(w for _, w in toks)
    vocab = sorted(cw, key=lambda w: (-cw[w], w))[:vocab_size]
    vset = set(vocab)
    v = len(vocab)
    n_corpus = sum(cw[w] for w in vocab)
    out = {}
    for s in {s for s, _ in rows}:
        csw = Counter(w for src, w in toks if src == s and w in vset)
        n_s = sum(csw.values())
        kl = 0
        for w in vocab:
            p = (csw[w] + 1.0) / (n_s + v)
            q = (cw[w] + 1.0) / (n_corpus + v)
            kl += round(p * math.log(p / q) * 1e9)
        out[s] = (n_s, kl)
    return out


def test_unigram_kl_matches_python_reference(spark):
    rows = [
        ("a", "x x x y"),
        ("a", "x z"),
        ("b", "y y y y z"),
        ("c", "w w w w w w"),
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.slice: (r.n_tokens, r.kl_nano)
        for r in unigram_kl(docs, "source", "text").collect()
    }
    assert got == _py_kl(rows)


def test_unigram_kl_identical_slices_near_zero(spark):
    """A slice distributed exactly like the corpus has (near-)minimal KL;
    a disjoint-vocabulary slice has much larger KL."""
    rows = [("a", "x y z")] * 5 + [("b", "x y z")] * 5 + [("c", "q q q q")]
    docs = spark.createDataFrame(rows, "source string, text string")
    kl = {r.slice: r.kl_nano for r in unigram_kl(docs, "source", "text").collect()}
    assert kl["a"] == kl["b"]  # identical content → identical divergence
    assert kl["c"] > 10 * max(kl["a"], 1)


def test_unigram_kl_vocab_cap(spark):
    """vocab_size caps the domain: with cap=1 only the single most
    frequent term participates."""
    rows = [("a", "x x x y"), ("b", "y x")]
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.slice: (r.n_tokens, r.kl_nano)
        for r in unigram_kl(docs, "source", "text", vocab_size=1).collect()
    }
    assert got == _py_kl(rows, vocab_size=1)
    # n_tokens counts only in-vocab occurrences
    assert got["a"][0] == 3 and got["b"][0] == 1


def test_editdist_query_filters_relative_threshold(spark, tmp_path):
    """End-to-end through the registered query on a planted corpus: a
    mutated twin passes the 0.3 relative gate, an unrelated doc does not
    surface, and dist is the true edit distance."""
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (0, base),
        (1, base[:-10] + " tail edit"),          # small absolute distance
        (2, "completely different content " * 8),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    out = QUERIES["editdist_near_dup_documents"](spark, str(tmp_path)).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]

    # classic DP reference, small inputs
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    assert r.dist == lev(rows[0][1], rows[1][1])
    assert 10 * r.dist <= 3 * r.maxlen
    assert all(2 not in (ia, ib) for ia, ib in pairs)


def test_fertility_ratios(spark, tmp_path):
    """Registered fertility query: exact integer sums and ratio checks on
    a two-language planted corpus."""
    import pandas as pd

    rows = [
        (0, "hello world", "en", "s", 11),
        (1, "it's a test", "en", "s", 11),
        (2, "ab cd ef", "xx", "s", 8),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    out = {
        r.lang: r
        for r in QUERIES["tokenizer_fertility_documents"](
            spark, str(tmp_path)
        ).collect()
    }
    # en: "hello world" → [hello][ world] + ws runs: GPT-2 regex counts
    # 'hello', ' world' = 2 bpe (space-prefixed) and 1 inner \s+ run? —
    # pin by recomputation with the regex module-free count:
    xx = out["xx"]
    assert xx.ws_tokens == 3 and xx.n_bytes == 8
    assert xx.fertility == pytest.approx(xx.bpe_tokens / xx.ws_tokens)
    en = out["en"]
    # "hello world" → 2 ws tokens; "it's a test" → 3 ws tokens
    assert en.n_docs == 2 and en.ws_tokens == 5
    # GPT-2 regex: hello|) world / it|'s|) a|) test → 6 bpe tokens
    assert en.bpe_tokens == 6
    assert en.bytes_per_token == pytest.approx(en.n_bytes / en.bpe_tokens)


def _py_rrf(rankings, topk=10, k=60):
    from collections import defaultdict

    acc = defaultdict(int)
    n = defaultdict(int)
    for ranking in rankings:
        for (qid, d), rank in ranking.items():
            acc[(qid, d)] += round(1e9 / (rank + k))
            n[(qid, d)] += 1
    out = {}
    for qid in {q for q, _ in acc}:
        rows = sorted(
            ((d, s) for (q, d), s in acc.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:topk]
        for rank, (d, s) in enumerate(rows, 1):
            out[(qid, d)] = (s, n[(qid, d)], rank)
    return out


def test_rrf_fusion_matches_python_reference(spark):
    from data_quality_automated_evaluator_spark.operators.retrieval import (
        coverage_topk,
        rrf_fuse,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(
        [(1, "spark"), (1, "agg"), (2, "value"), (2, "order")],
        "query_id int, term string",
    )
    bm25 = bm25_topk(docs, qt, topk=5)
    cov = coverage_topk(docs, qt, topk=5)
    fused = rrf_fuse([bm25, cov], topk=10).collect()

    r_bm25 = {(r.query_id, r.doc_id): r.rank for r in bm25.collect()}
    r_cov = {(r.query_id, r.doc_id): r.rank for r in cov.collect()}
    expected = _py_rrf([r_bm25, r_cov])
    got = {
        (r.query_id, r.doc_id): (r.rrf_nano, r.n_rankers, r.rank)
        for r in fused
    }
    assert got == expected
    # a doc found by both rankers outranks one found by a single ranker
    # at similar positions
    both = [r for r in fused if r.n_rankers == 2]
    assert both, "fixture must produce docs ranked by both rankers"


def test_coverage_ranker_prefers_more_terms_then_shorter(spark):
    from data_quality_automated_evaluator_spark.operators.retrieval import (
        coverage_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark agg extra words making it longer"),
            (1, "spark agg"),
            (2, "spark only here"),
        ],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame(
        [(1, "spark"), (1, "agg")], "query_id int, term string"
    )
    rows = sorted(coverage_topk(docs, qt).collect(), key=lambda r: r.rank)
    # both cover 2 terms; doc1 is shorter → first; doc2 covers 1 → last
    assert [r.doc_id for r in rows] == [1, 0, 2]
    assert [r.n_cov for r in rows] == [2, 2, 1]


def test_parrot_rate_detects_planted_echo(spark, tmp_path, monkeypatch):
    """Planted conversation: an assistant turn that repeats the user's
    sentence verbatim is flagged; an unrelated answer is not; <3-token
    turns are excluded (the sequence(1,0) gate)."""
    import datetime as dt

    import pandas as pd

    import data_quality_automated_evaluator_spark.entry_queries as eq

    ts = dt.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        ("c1", 0, "user", "please summarize the quarterly revenue report", None, ts),
        ("c1", 1, "assistant", "please summarize the quarterly revenue report", None, ts),
        ("c2", 0, "user", "please summarize the quarterly revenue report", None, ts),
        ("c2", 1, "assistant", "here is a completely original haiku instead", None, ts),
        ("c3", 0, "user", "hi", None, ts),           # <3 tokens: excluded
        ("c3", 1, "assistant", "ok", None, ts),      # <3 tokens: excluded
    ]
    path = str(tmp_path / "transcripts.parquet")
    pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)
    monkeypatch.setattr(eq, "FIXTURE_TRANSCRIPTS", path)
    monkeypatch.setattr(
        "data_quality_automated_evaluator_spark.testdata.write_transcripts_parquet",
        lambda *a, **k: None,
    )
    out = eq.QUERIES["parrot_rate_transcripts"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.day == "2024-05-01"
    assert r.n_considered == 2  # c3 excluded entirely
    assert r.n_parrot == 1      # c1 echo flagged, c2 original not
    assert r.parrot_rate == 0.5


def test_corpus_datacard_known_values(spark, tmp_path):
    import pandas as pd

    rows = [
        (0, "a b c", "en", "s1", 5),
        (1, "a b c", "en", "s1", 5),   # exact dup of doc 0
        (2, "d e", "fr", "s2", 3),
        (3, "x", "en", "s2", 1),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    r = QUERIES["corpus_datacard_documents"](spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 4 and r.n_sources == 2 and r.n_langs == 2
    assert r.total_chars == 5 + 5 + 3 + 1
    assert r.total_ws_tokens == 3 + 3 + 2 + 1
    assert r.n_distinct_texts == 3
    assert r.exact_dup_rate == 0.25
    assert r.mean_doc_chars == 3.5


def test_feature_corr_matches_numpy(spark, tmp_path):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    texts = [
        " ".join(["w" * rng.integers(1, 9) for _ in range(rng.integers(2, 40))])
        for _ in range(200)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": texts,
            "lang": "en",
            "source": ["sA" if i % 2 else "sB" for i in range(200)],
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    got = {
        r.source: r.corr_chars_tokens
        for r in QUERIES["feature_corr_documents"](spark, str(tmp_path)).collect()
    }
    for src in ("sA", "sB"):
        sub = pdf[pdf.source == src]
        x = sub.text.str.len().to_numpy(dtype=float)
        y = sub.text.str.split().str.len().to_numpy(dtype=float)
        expected = np.corrcoef(x, y)[0, 1]
        assert got[src] == pytest.approx(expected, abs=2e-6)


def test_dup_growth_first_day_not_counted(spark, tmp_path, monkeypatch):
    """A text repeated within its first day is NOT 'seen before'; the
    same text on a later day is."""
    import datetime as dt

    import pandas as pd

    import data_quality_automated_evaluator_spark.entry_queries as eq

    d1 = dt.datetime(2024, 5, 1, 9, 0, 0)
    d2 = dt.datetime(2024, 5, 2, 9, 0, 0)
    rows = [
        ("c1", 0, "user", "hello template", None, d1),
        ("c1", 1, "user", "hello template", None, d1),  # same-day repeat
        ("c2", 0, "user", "hello template", None, d2),  # next-day repeat
        ("c2", 1, "user", "fresh text", None, d2),
    ]
    path = str(tmp_path / "transcripts.parquet")
    pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)
    monkeypatch.setattr(eq, "FIXTURE_TRANSCRIPTS", path)
    monkeypatch.setattr(
        "data_quality_automated_evaluator_spark.testdata.write_transcripts_parquet",
        lambda *a, **k: None,
    )
    out = {r.day: r for r in eq.QUERIES["dup_growth_transcripts"](
        spark, str(tmp_path)).collect()}
    assert out["2024-05-01"].n_turns == 2
    assert out["2024-05-01"].n_seen_before == 0
    assert out["2024-05-02"].n_turns == 2
    assert out["2024-05-02"].n_seen_before == 1
    assert out["2024-05-02"].repeat_rate == 0.5


def test_pq_recall_bounds_and_determinism(spark):
    """pq_recall_embeddings: one row, recall == n_overlap/k, bounded in
    [0,1], and deterministic across runs (PQ training, encoding and both
    rankings are all seed-free deterministic pipelines)."""
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    a = QUERIES["pq_recall_embeddings"](spark, "/root/testdata/sf0.001").collect()
    b = QUERIES["pq_recall_embeddings"](spark, "/root/testdata/sf0.001").collect()
    assert len(a) == 1 and a == b
    r = a[0]
    assert r.k == 10 and 0 <= r.n_overlap <= 10
    assert r.recall_at_k == pytest.approx(r.n_overlap / 10)


def test_dup_cluster_sizes_accounting(spark):
    """Cluster-size histogram must account for every document exactly
    once: sum(n_docs) == corpus size, and the mutated-twin planting
    guarantees clusters of size >= 2 exist."""
    from data_quality_automated_evaluator_spark.entry_queries import QUERIES

    rows = QUERIES["dup_cluster_sizes_documents"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.n_docs for r in rows)
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM (SELECT doc_id FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE doc_id < 500 "
        "UNION ALL SELECT doc_id + 100000 FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE doc_id < 50)"
    ).fetchone()[0]
    assert total == n
    assert any(r.cluster_size >= 2 and r.n_clusters > 0 for r in rows)
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_conv_depth_histogram_accounts_all_convs(spark, tmp_path, monkeypatch):
    import datetime as dt

    import pandas as pd

    import data_quality_automated_evaluator_spark.entry_queries as eq

    ts = dt.datetime(2024, 1, 1)
    rows = (
        [("c1", i, "user", "t", None, ts) for i in range(3)]
        + [("c2", i, "user", "t", None, ts) for i in range(3)]
        + [("c3", 0, "user", "t", None, ts)]
    )
    path = str(tmp_path / "transcripts.parquet")
    pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)
    monkeypatch.setattr(eq, "FIXTURE_TRANSCRIPTS", path)
    monkeypatch.setattr(
        "data_quality_automated_evaluator_spark.testdata.write_transcripts_parquet",
        lambda *a, **k: None,
    )
    out = {r.n_turns: r.n_convs for r in eq.QUERIES[
        "conv_depth_histogram_transcripts"](spark, str(tmp_path)).collect()}
    assert out == {1: 1, 3: 2}


def test_keep_rate_by_lang_consistent_with_flags(spark):
    """The per-lang keep rates must re-aggregate exactly from the
    flagship per-turn labels joined with the pipeline's lang column."""
    from data_quality_automated_evaluator_spark.entry_queries import (
        FIXTURE_TRANSCRIPTS,
        QUERIES,
    )
    from data_quality_automated_evaluator_spark.pipeline.quality import (
        run_quality_pipeline,
    )
    from data_quality_automated_evaluator_spark.testdata import (
        write_transcripts_parquet,
    )

    write_transcripts_parquet(FIXTURE_TRANSCRIPTS, n_convs=400, seed=42)
    res = run_quality_pipeline(
        spark.read.parquet(FIXTURE_TRANSCRIPTS)
    ).select("lang", "keep").toPandas()
    got = {
        r.lang: (r.n_turns, r.n_keep, r.keep_rate)
        for r in QUERIES["keep_rate_by_lang_transcripts"](spark, "unused").collect()
    }
    for lang, grp in res.groupby("lang"):
        n, k = len(grp), int(grp.keep.sum())
        assert got[lang] == (n, k, round(k / n, 6))
    assert sum(v[0] for v in got.values()) == len(res)


def test_sft_mask_stats_known_values(spark, tmp_path, monkeypatch):
    import datetime as dt

    import pandas as pd

    import data_quality_automated_evaluator_spark.entry_queries as eq

    ts = dt.datetime(2024, 7, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "one two three", None, ts),        # 3 tokens
        ("c1", 1, "assistant", "four five", None, ts),       # 2 loss tokens
        ("c1", 2, "user", "", None, ts),                     # 0 tokens
    ]
    path = str(tmp_path / "transcripts.parquet")
    pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(path)
    monkeypatch.setattr(eq, "FIXTURE_TRANSCRIPTS", path)
    monkeypatch.setattr(
        "data_quality_automated_evaluator_spark.testdata.write_transcripts_parquet",
        lambda *a, **k: None,
    )
    r = eq.QUERIES["sft_mask_stats_transcripts"](spark, str(tmp_path)).collect()[0]
    # train = (3+2) + (2+2) + (0+2) = 11; loss = 2
    assert r.n_turns == 3 and r.train_tokens == 11 and r.loss_tokens == 2
    assert r.loss_share == round(2 / 11, 6)
