"""NULL-input and parameter-validation robustness (round-5 operator
review): NULL text/keys/values must not collapse, bias, or crash the
operators, and degenerate parameters must fail loudly rather than
silently going quadratic."""

import pytest
from pyspark.sql import functions as F


def _docs_with_nulls(spark):
    return spark.createDataFrame(
        [
            (1, "same text here"),
            (2, "same text here"),
            (3, None),
            (4, None),
            (5, None),
            (6, "unique snowflake content"),
        ],
        "doc_id bigint, text string",
    )


class TestNullText:
    def test_dedup_exact_keeps_all_null_text_rows(self, spark):
        from rheoceros_spark.operators.dedup import dedup_exact

        out = sorted(r.doc_id for r in dedup_exact(_docs_with_nulls(spark)).collect())
        # dup pair 1/2 collapses to 1; NULL-text rows 3/4/5 all survive
        assert out == [1, 3, 4, 5, 6]

    def test_signature_compat_shapes_keep_null_rows(self, spark):
        from rheoceros_spark.operators.dedup import minhash_signature, simhash

        df = _docs_with_nulls(spark)
        assert minhash_signature(df).count() == df.count()
        assert simhash(df).count() == df.count()

    def test_token_count_empty_text_is_zero(self, spark):
        from rheoceros_spark.operators.text_analysis import token_count

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "two tokens")], "doc_id bigint, text string"
        )
        got = {r.doc_id: r.n_tokens for r in token_count(df).collect()}
        assert got == {1: 0, 2: 0, 3: 2}


class TestNullKeysAndValues:
    def test_hash_sample_drops_null_keys_instead_of_cohort_bias(self, spark):
        from rheoceros_spark.operators.curation import hash_sample

        df = spark.createDataFrame(
            [(i,) for i in range(1000)] + [(None,)] * 200, "doc_id bigint"
        )
        kept = hash_sample(df, 0.5, key_col="doc_id").collect()
        # NULL keys hash to NULL → never sampled (not all-or-nothing)
        assert all(r.doc_id is not None for r in kept)
        assert 350 < len(kept) < 650

    def test_kmv_ignores_nulls_bit_exactly(self, spark):
        from rheoceros_spark.operators.sketches import kmv_distinct

        clean = spark.createDataFrame([(i % 97,) for i in range(500)], "v bigint")
        dirty = clean.unionByName(
            spark.createDataFrame([(None,)] * 50, "v bigint")
        )
        a = kmv_distinct(clean, "v").collect()[0]
        b = kmv_distinct(dirty, "v").collect()[0]
        assert (a.distinct_estimate, a.kth_hash) == (b.distinct_estimate, b.kth_hash)

    def test_histogram_quantiles_exclude_nulls(self, spark):
        from rheoceros_spark.operators.sketches import histogram_quantiles

        clean = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
        dirty = clean.unionByName(spark.createDataFrame([(None,)] * 100, "v double"))
        qa = {r.q: r.value for r in histogram_quantiles(clean, "v", (0.5,)).collect()}
        qb = {r.q: r.value for r in histogram_quantiles(dirty, "v", (0.5,)).collect()}
        assert qa == qb  # the NULL half must not drag the median down


class TestLoudParameterErrors:
    def test_bad_band_counts_raise(self, spark):
        from rheoceros_spark.operators.dedup import minhash_lsh_pairs

        df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="multiple of"):
            minhash_lsh_pairs(df, num_hashes=16, bands=20)
        with pytest.raises(ValueError, match="multiple of"):
            minhash_lsh_pairs(df, num_hashes=16, bands=3)

    def test_embedding_blocked_dim_mismatch_raises(self, spark):
        from rheoceros_spark.operators.dedup import embedding_dup_pairs_blocked

        emb = spark.createDataFrame(
            [(1, [1.0] * 128), (2, [0.5] * 128)], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ValueError, match="one bucket"):
            embedding_dup_pairs_blocked(emb, dim=64)

    def test_salted_join_rejects_outer(self, spark):
        from rheoceros_spark.operators.scale import salted_join

        big = spark.range(10).withColumnRenamed("id", "k")
        small = spark.range(3).withColumnRenamed("id", "k")
        with pytest.raises(ValueError, match="duplicate unmatched"):
            salted_join(big, small, "k", how="full")
        # allowed types still work
        assert salted_join(big, small, "k", how="left").count() == 10


class TestRound6NullRobustness:
    """Round-6 operators under NULL ids/sources/text and degenerate
    inputs — no crash, no silent cohort bias."""

    def test_domain_cap_null_source_forms_its_own_group(self, spark):
        from rheoceros_spark.operators import domain_cap

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (4, None), (5, None)],
            "doc_id bigint, source string",
        )
        out = domain_cap(df, cap=2).collect()
        # window partitioning groups NULLs together; the cap applies to
        # them like any domain rather than dropping or crashing
        null_kept = [r.doc_id for r in out if r.source is None]
        assert len(null_kept) == 2
        assert len([r for r in out if r.source == "a"]) == 2

    def test_group_split_null_group_gets_one_split(self, spark):
        from rheoceros_spark.operators import group_split

        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "s")], "doc_id bigint, source string"
        )
        out = group_split(df).collect()
        null_splits = {r.split for r in out if r.source is None}
        # h64(NULL) is NULL → bucket NULL → all CASE tests false → the
        # remainder split; the whole NULL cohort stays together (no
        # straddle), which is the leakage-safety contract
        assert len(null_splits) == 1

    def test_boilerplate_null_text_rows_survive_with_zero_grams(self, spark):
        from rheoceros_spark.operators import boilerplate_ngrams

        df = spark.createDataFrame(
            [(1, None, "s"), (2, "a b c d", "s"), (3, "a b c d", "s"), (4, "a b c d", "s")],
            "doc_id bigint, text string, source string",
        )
        out = {r.doc_id: r for r in boilerplate_ngrams(df, n=3, min_docs=3).collect()}
        assert out[1].n_grams == 0 and out[1].boiler_frac is None
        assert out[2].n_boiler > 0  # the template trio still detected

    def test_chunk_documents_null_text_yields_one_empty_chunk(self, spark):
        from rheoceros_spark.operators import chunk_documents

        df = spark.createDataFrame(
            [(1, None), (2, "a b c")], "doc_id bigint, text string"
        )
        out = {r.doc_id: r for r in chunk_documents(df, 4, 1).collect()}
        # NULL text → tokens NULL → explode drops the row (no crash);
        # doc 2 chunks normally
        assert 1 not in out and out[2].chunk_text == "a b c"

    def test_source_kl_null_source_rows_excluded(self, spark):
        from rheoceros_spark.operators import source_kl_drift

        df = spark.createDataFrame(
            [(1, "x y", None), (2, "x y", "s"), (3, "x y", "s")],
            "doc_id bigint, text string, source string",
        )
        out = source_kl_drift(df).collect()
        assert [r.source for r in out] == ["s"]
        assert all(abs(r.kl) < 1e-9 for r in out)

    def test_negative_samples_empty_query_side_is_empty(self, spark):
        from rheoceros_spark.operators import negative_samples

        corpus = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id bigint, source string"
        )
        qry = corpus.where(F.lit(False)).select(
            F.col("doc_id").alias("query_id"), "source"
        )
        assert negative_samples(corpus, qry, k=2).count() == 0

    def test_budget_mix_zero_token_docs_do_not_stall_quota(self, spark):
        from rheoceros_spark.operators import budget_mix_select

        df = spark.createDataFrame(
            [(i, "s", 0) for i in range(5)] + [(10, "s", 100)],
            "doc_id bigint, source string, n_tokens int",
        )
        rows = budget_mix_select(df, token_budget=50).collect()
        # zero-token docs never fill the quota on their own: selection
        # walks hash order and must reach (and include) the one
        # token-bearing doc; everything ranked after the quota-crossing
        # doc is excluded
        assert any(r.doc_id == 10 for r in rows)
        crossing_rank = next(r.sel_rank for r in rows if r.doc_id == 10)
        assert all(r.sel_rank <= crossing_rank for r in rows)
        assert {r.doc_id for r in rows} == {
            r.doc_id for r in rows if r.sel_rank <= crossing_rank
        }

    def test_kmeans_all_zero_vectors_do_not_crash(self, spark):
        from rheoceros_spark.operators import kmeans_refine

        df = spark.createDataFrame(
            [(i, [0.0, 0.0]) for i in range(4)],
            "vec_id bigint, embedding array<float>",
        )
        out = kmeans_refine(df, k=2, iters=1).collect()
        # cosine of zero vectors is NULL → max_by picks deterministically;
        # every row still gets an assignment
        assert len(out) == 4
