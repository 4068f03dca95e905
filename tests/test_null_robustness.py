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
