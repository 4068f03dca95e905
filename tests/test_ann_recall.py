"""Retrieval-quality floor for the approximate-ANN family.

The CORRECTNESS oracles certify the ANN operators' *determinism*; this
suite pins their *retrieval quality*: recall@10 vs the brute-force twin
on a clustered synthetic corpus (the geometry real embedding spaces
have) must stay >= 0.9 at the documented default settings.  The full
(n_probe, rerank) evidence sweep — including the adversarial
near-orthogonal sf corpus where cell pruning necessarily loses
near-ties — lives in scripts/ann_recall.py and BASELINE.md §4.

Reference anchor: the reference's slot surface runs arbitrary
retrieval code (api_ext.py:107-190); recall floors are this engine's
quality contract for the ANN operators it ships natively.
"""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.similarity import (
    cosine_topk,
    ivf_probe,
    ivf_write,
    ivfpq_probe,
    ivfpq_write,
    recall_at_k,
)

K = 10
N, DIM, N_CLUSTERS = 600, 32, 4


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic clustered unit-ish vectors (same generator as
    scripts/ann_recall.py, scaled down): cluster c concentrates on a
    contiguous coordinate block, each member perturbed by a small
    id-dependent offset so in-cluster neighbours differ."""
    width = DIM // N_CLUSTERS
    rows = []
    for i in range(N):
        c = i % N_CLUSTERS
        vec = [0.0] * DIM
        for j in range(c * width, (c + 1) * width):
            vec[j] = 1.0
        for j in range(DIM):
            vec[j] += 0.05 * (((i * 31 + j * 7) % 11) - 5)
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


QIDS = [0, 97, 194, 291, 388, 485, 582]


def _mean_recall(probe_fn, clustered):
    recs = []
    for qid in QIDS:
        qv = [
            float(x)
            for x in clustered.where(F.col("vec_id") == qid).first().embedding
        ]
        exact = cosine_topk(clustered, query_id=qid, k=K)
        recs.append(recall_at_k(probe_fn(qv, qid), exact))
    return sum(recs) / len(recs)


def test_ivf_default_settings_recall_floor(spark, clustered, tmp_path):
    """ivf_probe at its documented default (n_probe=4 of 8 cells) must
    recover >= 0.9 of the exact top-10 on clustered geometry."""
    path = str(tmp_path / "ivf")
    ivf_write(clustered, path, n_centroids=8)
    rec = _mean_recall(
        lambda qv, qid: ivf_probe(spark, path, qv, k=K, n_probe=4, exclude_id=qid),
        clustered,
    )
    assert rec >= 0.9, f"ivf recall@10={rec:.3f} below floor at defaults"


def test_ivfpq_default_settings_recall_floor(spark, clustered, tmp_path):
    """ivfpq_probe at its documented defaults (n_probe=2, rerank=50)
    must recover >= 0.9 of the exact top-10 on clustered geometry."""
    path = str(tmp_path / "ivfpq")
    ivfpq_write(clustered, path, n_cells=8, iters=2, n_codes=16, m=4)
    rec = _mean_recall(
        lambda qv, qid: ivfpq_probe(
            spark, path, qv, k=K, n_probe=2, rerank=50, exclude_id=qid
        ),
        clustered,
    )
    assert rec >= 0.9, f"ivfpq recall@10={rec:.3f} below floor at defaults"


def test_recall_at_k_helper_contract(spark, clustered):
    """recall_at_k: 1.0 on identical frames, proportional on partial
    overlap, loud on an empty exact set."""
    exact = cosine_topk(clustered, query_id=0, k=K)
    assert recall_at_k(exact, exact) == 1.0
    half = exact.orderBy("rank").limit(K // 2)
    assert recall_at_k(half, exact) == 0.5
    empty = exact.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        recall_at_k(exact, empty)


# ---------------------------------------------------------------------------
# hybrid retrieval: cosine_topk_multi + rrf_fuse
# ---------------------------------------------------------------------------

class TestHybridRetrieval:
    def test_multi_matches_single_query_topk(self, spark, clustered):
        """The batch scorer must agree with cosine_topk per query."""
        from rheoceros_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_multi,
        )
        from pyspark.sql import functions as F

        qids = [0, 97, 194]
        multi = cosine_topk_multi(
            clustered,
            clustered.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            k=5,
        ).collect()
        for qid in qids:
            single = {
                (r.vec_id, r.rank)
                for r in cosine_topk(clustered, query_id=qid, k=5).collect()
            }
            got = {(r.vec_id, r.rank) for r in multi if r.query_id == qid}
            assert got == single, qid

    def test_rrf_agreement_beats_single_list(self, spark):
        """A doc ranked mid-list in BOTH lists outscores a doc that
        tops one list but misses the other (rank 1 one-list: 1/61 =
        163934; rank 3+3 both-lists: 2/63 = 317460)."""
        from rheoceros_spark.operators.similarity import rrf_fuse

        l1 = spark.createDataFrame(
            [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, doc_id long, rank int"
        )
        l2 = spark.createDataFrame(
            [(1, 40, 1), (1, 50, 2), (1, 30, 3)], "query_id long, doc_id long, rank int"
        )
        out = {r.doc_id: r for r in rrf_fuse([l1, l2], k=10).collect()}
        assert out[30].rank == 1 and out[30].n_lists == 2
        assert out[10].n_lists == 1
        assert out[30].rrf_score > out[10].rrf_score

    def test_rrf_tie_breaks_on_id(self, spark):
        from rheoceros_spark.operators.similarity import rrf_fuse

        l1 = spark.createDataFrame(
            [(1, 20, 1), (1, 10, 2)], "query_id long, doc_id long, rank int"
        )
        l2 = spark.createDataFrame(
            [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rank int"
        )
        rows = sorted(rrf_fuse([l1, l2], k=2).collect(), key=lambda r: r.rank)
        # identical fused scores -> ascending id wins
        assert [r.doc_id for r in rows] == [10, 20]

    def test_rrf_validates_inputs(self, spark):
        import pytest as _pt

        from rheoceros_spark.operators.similarity import rrf_fuse

        with _pt.raises(ValueError, match="at least one"):
            rrf_fuse([], k=5)
        l1 = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
        with _pt.raises(ValueError, match="k and k_rrf"):
            rrf_fuse([l1], k=0)

    def test_multi_excludes_self_and_validates_k(self, spark, clustered):
        import pytest as _pt

        from pyspark.sql import functions as F

        from rheoceros_spark.operators.similarity import cosine_topk_multi

        q = clustered.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = cosine_topk_multi(clustered, q, k=5).collect()
        assert all(r.vec_id != 0 for r in got)
        kept = cosine_topk_multi(clustered, q, k=5, exclude_self=False).collect()
        assert any(r.vec_id == 0 and r.rank == 1 for r in kept)
        with _pt.raises(ValueError, match="k must be"):
            cosine_topk_multi(clustered, q, k=0)


# ---------------------------------------------------------------------------
# int8 scan-compression: quantize_embeddings + ann_int8_topk
# ---------------------------------------------------------------------------

class TestInt8Quantization:
    def test_codes_in_range_and_scale_dequantizes(self, spark, clustered):
        from rheoceros_spark.operators.similarity import quantize_embeddings

        qz = quantize_embeddings(clustered).collect()
        orig = {r.vec_id: r.embedding for r in clustered.collect()}
        for r in qz[:50]:
            assert all(-127 <= c <= 127 for c in r.qvec)
            # dequantized values within half a quantization step
            v = orig[r.vec_id]
            for c, x in zip(r.qvec, v):
                assert abs(c * r.qscale - x) <= r.qscale / 2 + 1e-9

    def test_zero_vector_quantizes_to_zero_codes(self, spark):
        from rheoceros_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
        r = quantize_embeddings(df).first()
        assert r.qvec == [0, 0, 0] and r.qscale == 0.0

    def test_exhaustive_candidates_match_brute_force(self, spark, clustered):
        """With the candidate pool set to the whole corpus, the exact
        rerank must reproduce brute-force cosine_topk identically."""
        from rheoceros_spark.operators.similarity import ann_int8_topk

        brute = [
            (r.vec_id, r.rank) for r in cosine_topk(clustered, 0, k=K).collect()
        ]
        int8 = [
            (r.vec_id, r.rank)
            for r in ann_int8_topk(clustered, 0, k=K, candidates=N).collect()
        ]
        assert int8 == brute

    def test_default_candidates_recall_floor(self, spark, clustered):
        """4k-candidate int8 preselection must keep recall@10 >= 0.9 vs
        brute force on the clustered corpus."""
        from rheoceros_spark.operators.similarity import ann_int8_topk

        recs = []
        for qid in QIDS:
            exact = cosine_topk(clustered, qid, k=K)
            approx = ann_int8_topk(clustered, qid, k=K)
            recs.append(recall_at_k(exact, approx))
        mean = sum(recs) / len(recs)
        assert mean >= 0.9, f"int8 mean recall@{K} {mean:.3f} < 0.9"

    def test_validates_k_and_candidates(self, spark, clustered):
        from rheoceros_spark.operators.similarity import ann_int8_topk

        with pytest.raises(ValueError, match="k must be"):
            ann_int8_topk(clustered, 0, k=0)
        with pytest.raises(ValueError, match="candidates"):
            ann_int8_topk(clustered, 0, k=10, candidates=5)
        with pytest.raises(ValueError, match="query id matched no row"):
            ann_int8_topk(clustered, -1, k=5).collect()


# ---------------------------------------------------------------------------
# MMR diversification
# ---------------------------------------------------------------------------

class TestMMRRerank:
    def _cands(self, spark):
        """One query, four candidates: two near-identical high-relevance
        docs (10, 11), one diverse mid-relevance doc (20), one weak
        doc (30).  qrel is the quantized relevance."""
        rows = [
            (1, 10, 9_500_000, [1.0, 0.0, 0.0]),
            (1, 11, 9_400_000, [0.999, 0.01, 0.0]),
            (1, 20, 7_000_000, [0.0, 1.0, 0.0]),
            (1, 30, 3_000_000, [0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, qrel bigint, embedding array<float>"
        )

    def test_step1_is_argmax_relevance(self, spark):
        from rheoceros_spark.operators.similarity import mmr_rerank

        out = {r.step: r.doc_id for r in mmr_rerank(self._cands(spark), k=3).collect()}
        assert out[1] == 10

    def test_diversity_defers_near_duplicate(self, spark):
        """With lambda=0.7 the near-duplicate of pick 1 (doc 11, cosine
        ~1.0 to doc 10) must lose step 2 to the orthogonal doc 20
        despite higher relevance: 0.7*0.94 - 0.3*1.0 < 0.7*0.70 - 0."""
        from rheoceros_spark.operators.similarity import mmr_rerank

        out = {r.step: r.doc_id for r in mmr_rerank(self._cands(spark), k=3).collect()}
        assert out[2] == 20
        # doc 11 re-enters at step 3: 0.7*0.94 - 0.3*1.0 = 0.358 still
        # beats doc 30's 0.7*0.30 = 0.21 — MMR defers, not bans
        assert out[3] == 11

    def test_lambda_1000_reduces_to_pure_relevance(self, spark):
        from rheoceros_spark.operators.similarity import mmr_rerank

        out = {
            r.step: r.doc_id
            for r in mmr_rerank(self._cands(spark), k=4, lam_q=1000).collect()
        }
        assert [out[s] for s in (1, 2, 3, 4)] == [10, 11, 20, 30]

    def test_scores_monotone_nonincreasing_is_not_required_but_steps_unique(
        self, spark
    ):
        from rheoceros_spark.operators.similarity import mmr_rerank

        rows = mmr_rerank(self._cands(spark), k=4).collect()
        assert sorted(r.step for r in rows) == [1, 2, 3, 4]
        assert len({r.doc_id for r in rows}) == 4  # no doc picked twice

    def test_validates_inputs(self, spark):
        from rheoceros_spark.operators.similarity import mmr_rerank

        with pytest.raises(ValueError, match="k must be"):
            mmr_rerank(self._cands(spark), k=0)
        with pytest.raises(ValueError, match="lam_q"):
            mmr_rerank(self._cands(spark), k=2, lam_q=1001)


# ---------------------------------------------------------------------------
# hash_embed — feature-hashing text embedder
# ---------------------------------------------------------------------------

class TestHashEmbed:
    def test_deterministic_and_bag_sensitive(self, spark):
        from rheoceros_spark.operators.text_analysis import hash_embed

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.embedding for r in hash_embed(docs, dim=16).collect()}
        assert out[1] == out[2]          # same bag -> same vector
        assert out[1] != out[3]
        # unit norm after normalize=True
        assert abs(sum(x * x for x in out[1]) - 1.0) < 1e-9

    def test_token_multiplicity_counts(self, spark):
        from rheoceros_spark.operators.text_analysis import hash_embed

        docs = spark.createDataFrame(
            [(1, "word"), (2, "word word")], "doc_id long, text string"
        )
        out = {
            r.doc_id: r.embedding
            for r in hash_embed(docs, dim=8, normalize=False).collect()
        }
        assert [2 * x for x in out[1]] == out[2]  # tf scaling, exact ints

    def test_empty_and_null_text_edges(self, spark):
        from rheoceros_spark.operators.text_analysis import hash_embed

        docs = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        out = {r.doc_id: r.embedding for r in hash_embed(docs, dim=4).collect()}
        assert out[1] == [0.0, 0.0, 0.0, 0.0]  # zero vector, not NaN
        assert out[2] is None

    def test_composes_with_similarity_family(self, spark):
        """The derived vectors must run through quantize + int8 topk
        unchanged — the self-contained text->ANN path."""
        from rheoceros_spark.operators.similarity import ann_int8_topk
        from rheoceros_spark.operators.text_analysis import hash_embed

        docs = spark.createDataFrame(
            [(i, f"tok{i % 5} tok{i % 3} tok{i % 7} filler common words")
             for i in range(40)],
            "doc_id long, text string",
        )
        emb = hash_embed(docs, dim=24, normalize=False).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        got = ann_int8_topk(emb, query_id=0, k=5, candidates=40).collect()
        assert len(got) == 5 and got[0].rank == 1

    def test_validates_dim(self, spark):
        from rheoceros_spark.operators.text_analysis import hash_embed

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="dim"):
            hash_embed(docs, dim=0)
        with pytest.raises(ValueError, match="dim"):
            hash_embed(docs, dim=61)
