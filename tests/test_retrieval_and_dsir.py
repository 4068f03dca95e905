"""Semantics of the retrieval/selection operators added in round 5:
BM25 top-k, exact-substring duplicate spans, DSIR importance weights.

Driver-oracle hash parity is covered by scripts/check_oracle.py; these
tests pin the *behavioral* contracts on crafted corpora.
"""

import math

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators import bm25_topk, dsir_weights, substring_dup_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_ranks_matching_doc_first(spark):
    corpus = _docs(
        spark,
        [
            (1, "spark shuffles data between executors"),
            (2, "the cat sat on the mat"),
            (3, "spark spark spark executors and shuffles"),
            (4, "gardening tips for tomatoes"),
        ],
    )
    queries = spark.createDataFrame(
        [(100, "spark executors")], "query_id bigint, text string"
    )
    rows = bm25_topk(corpus, queries, k=4).collect()
    assert [r.query_id for r in rows] == [100] * len(rows)
    assert rows[0].rank == 1
    # docs 1 and 3 contain both query terms; 2 and 4 contain neither
    # (no-match docs are absent entirely, not scored 0)
    got = {r.doc_id for r in rows}
    assert got == {1, 3}
    # saturation: doc 3's tripled tf must not triple its score vs doc 1
    by_id = {r.doc_id: r.score for r in rows}
    assert by_id[3] < 3 * by_id[1]


def test_bm25_idf_downweights_common_terms(spark):
    # 'common' appears in every doc, 'rare' in one: for a query with
    # both terms, the rare-term doc must outrank a common-only doc
    corpus = _docs(
        spark,
        [(i, "common filler words here") for i in range(1, 9)]
        + [(9, "common rare")],
    )
    queries = spark.createDataFrame(
        [(1, "common rare")], "query_id bigint, text string"
    )
    top = bm25_topk(corpus, queries, k=1).collect()
    assert top[0].doc_id == 9


def test_bm25_topk_limit_and_tiebreak(spark):
    corpus = _docs(spark, [(i, "same text") for i in range(10)])
    queries = spark.createDataFrame([(7, "same")], "query_id bigint, text string")
    rows = bm25_topk(corpus, queries, k=3).collect()
    assert len(rows) == 3
    # identical scores → ascending doc_id tiebreak
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert [r.rank for r in rows] == [1, 2, 3]


def test_bm25_rejects_bad_k(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="k must be >= 1"):
        bm25_topk(df, df.select(F.col("doc_id").alias("query_id"), "text"), k=0)


# ---------------------------------------------------------------------------
# substring duplicate spans
# ---------------------------------------------------------------------------

def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_substring_spans_cross_doc_boilerplate(spark):
    shared = _words("b", 4)  # 4-token boilerplate shared by docs 1 and 2
    df = _docs(
        spark,
        [
            (1, shared + " " + _words("u", 4)),
            (2, shared + " " + _words("v", 4)),
            (3, _words("w", 8)),
        ],
    )
    out = {r.doc_id: r for r in substring_dup_spans(df, window=4).collect()}
    # 8 tokens, w=4 → 5 windows each; only the fully-shared window
    # (positions covering exactly the boilerplate) duplicates
    assert out[1].n_windows == 5 and out[2].n_windows == 5
    assert out[1].n_dup_windows == 1 and out[2].n_dup_windows == 1
    assert out[1].dup_window_frac == pytest.approx(0.2)
    assert out[3].n_dup_windows == 0


def test_substring_spans_in_doc_repetition_counts(spark):
    # the same 4-gram twice inside ONE doc is a duplicated span too
    df = _docs(spark, [(1, _words("a", 4) + " " + _words("a", 4))])
    r = substring_dup_spans(df, window=4).collect()[0]
    assert r.n_windows == 5
    # windows at positions 1 and 5 are both 'a0 a1 a2 a3'
    assert r.n_dup_windows == 2


def test_substring_spans_short_doc_null_frac(spark):
    df = _docs(spark, [(1, "only three tokens"), (2, _words("x", 6))])
    out = {r.doc_id: r for r in substring_dup_spans(df, window=4).collect()}
    assert out[1].n_windows == 0 and out[1].dup_window_frac is None
    assert out[2].n_windows == 3 and out[2].dup_window_frac == 0.0


def test_substring_spans_rejects_bad_window(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="window must be >= 2"):
        substring_dup_spans(df, window=1)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def test_dsir_targetlike_docs_score_higher(spark):
    target = _docs(spark, [(i, "alpha beta gamma delta") for i in range(100, 110)])
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # exactly target-like
            (2, "zeta eta theta iota"),  # disjoint from target
        ],
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, n_buckets=256).collect()}
    assert out[1].dsir_logw > 0 > out[2].dsir_logw
    assert out[1].n_feats == 3 and out[2].n_feats == 3  # 4 tokens → 3 bigrams


def test_dsir_weight_value_closed_form(spark):
    # single shared bigram: weight = ln((t+1)/(T+B)) - ln((r+1)/(R+B))
    target = _docs(spark, [(10, "a b"), (11, "a b")])
    raw = _docs(spark, [(1, "a b")])
    b = 64
    w = dsir_weights(raw, target, n_buckets=b).collect()[0]
    expect = math.log((2 + 1) / (2 + b)) - math.log((1 + 1) / (1 + b))
    assert w.dsir_logw == pytest.approx(expect, abs=2e-6)


def test_dsir_rejects_bad_buckets(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="n_buckets must be >= 2"):
        dsir_weights(df, df, n_buckets=1)


def test_bm25_null_id_rows_excluded(spark):
    corpus = _docs(spark, [(None, "same text"), (1, "same text"), (2, "same text")])
    queries = spark.createDataFrame([(7, "same")], "query_id bigint, text string")
    rows = bm25_topk(corpus, queries, k=3).collect()
    # the NULL-id row must not appear — and must not steal rank 1 on the tie
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].rank == 1


def test_dsir_empty_target_raises_at_runtime(spark):
    raw = _docs(spark, [(1, "a b c")])
    empty_target = _docs(spark, [(9, "x y")]).where("doc_id < 0")
    df = dsir_weights(raw, empty_target, n_buckets=64)  # lazy: no job yet
    with pytest.raises(Exception, match="produced no features"):
        df.collect()


# ---------------------------------------------------------------------------
# Gumbel-top-k importance resampling
# ---------------------------------------------------------------------------

def test_gumbel_resample_deterministic_and_seeded(spark):
    from rheoceros_spark.operators import gumbel_topk_resample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("double").alias("w")
    )
    a = [r.doc_id for r in gumbel_topk_resample(df, "w", k=50, seed=0).collect()]
    b = [r.doc_id for r in gumbel_topk_resample(df, "w", k=50, seed=0).collect()]
    assert a == b  # pure function of (ids, weights, seed)
    c = {r.doc_id for r in gumbel_topk_resample(df, "w", k=50, seed=1).collect()}
    assert set(a) != c  # new seed, new epoch


def test_gumbel_resample_prefers_heavy_weights(spark):
    from rheoceros_spark.operators import gumbel_topk_resample

    # weight 20 vs 0: e^20 dominance → the heavy half should be picked
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, F.lit(20.0)).otherwise(F.lit(0.0)).alias("w"),
    )
    top = {r.doc_id for r in gumbel_topk_resample(df, "w", k=80, seed=0).collect()}
    assert all(d < 100 for d in top)


def test_gumbel_resample_drops_null_rows_and_validates_k(spark):
    from rheoceros_spark.operators import gumbel_topk_resample

    df = spark.createDataFrame(
        [(1, 1.0), (None, 99.0), (2, None)], "doc_id bigint, w double"
    )
    rows = gumbel_topk_resample(df, "w", k=10).collect()
    assert [r.doc_id for r in rows] == [1]
    with pytest.raises(ValueError, match="k must be >= 1"):
        gumbel_topk_resample(df, "w", k=0)


class TestRetrievalMetrics:
    """nDCG/MRR/precision/recall battery: hand-computed values against
    the Python-literal DCG weight table, non-nullable first_rel_rank,
    zero-relevance edge cases."""

    def _run(self, spark, results, qrels, k=3):
        from rheoceros_spark.operators.similarity import retrieval_metrics

        r = spark.createDataFrame(results, "query_id long, doc_id long, rank int")
        q = spark.createDataFrame(qrels, "query_id long, doc_id long")
        out = retrieval_metrics(r, q, k=k)
        return {row.query_id: row for row in out.collect()}

    def test_hand_computed_single_query(self, spark):
        from rheoceros_spark.operators.similarity import _dcg_weights_q

        w = _dcg_weights_q(3)
        # q1 top-3 = docs 10, 11, 12; relevant = {11, 99} (99 not retrieved)
        m = self._run(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, 11), (1, 99)],
        )
        r = m[1]
        assert (r.n_rel, r.hits_at_k, r.first_rel_rank) == (2, 1, 2)
        assert r.precision_at_k == 0.333333  # floor(1e6/3)/1e6
        assert r.recall_at_k == 0.5
        assert r.mrr == 0.5
        expected_ndcg = (w[1] * 1_000_000 // (w[0] + w[1])) / 1e6
        assert r.ndcg == expected_ndcg

    def test_perfect_ranking_scores_one(self, spark):
        m = self._run(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, 10), (1, 11), (1, 12)],
        )
        r = m[1]
        assert r.ndcg == 1.0 and r.mrr == 1.0 and r.recall_at_k == 1.0

    def test_no_relevant_in_topk_and_no_relevant_at_all(self, spark):
        m = self._run(
            spark,
            [(1, 10, 1), (2, 20, 1)],
            [(1, 99)],  # q1 has an unretrieved rel; q2 absent from qrels
        )
        r1, r2 = m[1], m[2]
        assert (r1.first_rel_rank, r1.mrr, r1.hits_at_k) == (0, 0.0, 0)
        assert r1.ndcg == 0.0 and r1.recall_at_k == 0.0
        assert (r2.n_rel, r2.first_rel_rank, r2.mrr) == (0, 0, 0.0)
        assert r2.ndcg is None and r2.recall_at_k is None

    def test_duplicate_qrel_rows_count_once(self, spark):
        m = self._run(
            spark,
            [(1, 10, 1)],
            [(1, 10), (1, 10), (1, 10)],
        )
        assert (m[1].n_rel, m[1].hits_at_k) == (1, 1)

    def test_ideal_dcg_caps_at_k(self, spark):
        # 5 relevant docs but k=3: IDCG uses only the top-3 weights
        from rheoceros_spark.operators.similarity import _dcg_weights_q

        w = _dcg_weights_q(3)
        m = self._run(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, d) for d in (10, 11, 12, 98, 99)],
        )
        assert m[1].ndcg == 1.0  # dcg == idcg == w1+w2+w3 despite n_rel=5
        assert m[1].recall_at_k == (3 * 1_000_000 // 5) / 1e6

    def test_rejects_bad_k(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.similarity import retrieval_metrics

        r = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
        with _pt.raises(ValueError, match="k must be"):
            retrieval_metrics(r, r.select("query_id", "doc_id"), k=0)

    def test_zero_result_queries_reported_via_universe(self, spark):
        # review-caught: a query with NO result rows vanished from the
        # frame, overstating averages by excluding complete misses
        from rheoceros_spark.operators.similarity import retrieval_metrics

        r = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
        q = spark.createDataFrame([(1, 10), (2, 42)], "query_id long, doc_id long")
        uni = spark.createDataFrame([(1,), (2,), (3,)], "query_id long")
        m = {
            row.query_id: row
            for row in retrieval_metrics(r, q, k=3, queries=uni).collect()
        }
        assert set(m) == {1, 2, 3}
        # q2 has a relevant doc but zero results: explicit zero row
        r2 = m[2]
        assert (r2.n_rel, r2.hits_at_k, r2.mrr, r2.ndcg, r2.recall_at_k) == (
            1, 0, 0.0, 0.0, 0.0,
        )
        # q3 has nothing to find: NULL recall/ndcg, zero hits
        assert m[3].n_rel == 0 and m[3].ndcg is None

    def test_out_of_range_ranks_filtered_not_crashing(self, spark):
        from rheoceros_spark.operators.similarity import retrieval_metrics

        # rank 0 (0-based misuse) and rank > k rows are dropped, not
        # crashed on the 1-based DCG table lookup
        r = spark.createDataFrame(
            [(1, 9, 0), (1, 10, 1), (1, 11, 99)],
            "query_id long, doc_id long, rank int",
        )
        q = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
        row = retrieval_metrics(r, q, k=3).collect()[0]
        assert (row.hits_at_k, row.first_rel_rank) == (1, 1)
