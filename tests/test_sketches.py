"""Mergeable HLL sketch cube: distinct-count rollups answered from
persisted kilobyte sketches instead of corpus rescans (Datasketches
HLL, JVM-native `hll_sketch_agg`/`hll_union_agg` in Spark 4)."""

from pyspark.sql import functions as F

from rheoceros_spark.operators.sketches import hll_cube_sketches, hll_rollup_estimate


def _docs(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), (F.col("id") % 700).cast("string")).alias("user"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("fr").alias("lang"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("source"),
    )


class TestHllCube:
    def test_rollup_estimate_close_to_exact(self, spark):
        df = _docs(spark)
        fine = hll_cube_sketches(df, ["lang", "source"], "user")
        per_lang = {
            r["lang"]: r["approx_distinct"]
            for r in hll_rollup_estimate(fine, ["lang"]).collect()
        }
        exact = {
            r["lang"]: r["n"]
            for r in df.groupBy("lang").agg(F.count_distinct("user").alias("n")).collect()
        }
        assert set(per_lang) == set(exact)
        for lang, est in per_lang.items():
            assert abs(est - exact[lang]) / exact[lang] < 0.05, (lang, est, exact[lang])

    def test_union_of_parts_matches_direct_sketch(self, spark):
        """Merging fine-grain sketches answers the same question as a
        direct whole-corpus sketch.  Not register-identical: a directly
        built sketch uses the HIP estimator, which a union downgrades
        to the standard estimator — so compare within HLL error bounds
        (and against the exact count: 700 distinct users)."""
        df = _docs(spark)
        fine = hll_cube_sketches(df, ["lang", "source"], "user")
        [merged] = hll_rollup_estimate(fine).collect()
        [direct] = (
            df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))).alias("d"))
            .collect()
        )
        assert abs(merged["approx_distinct"] - direct["d"]) / direct["d"] < 0.03
        assert abs(merged["approx_distinct"] - 700) / 700 < 0.03

    def test_rollup_reads_only_sketch_table(self, spark, tmp_path):
        df = _docs(spark)
        path = str(tmp_path / "sketches")
        hll_cube_sketches(df, ["lang", "source"], "user").write.parquet(path)
        rolled = hll_rollup_estimate(spark.read.parquet(path), ["lang"])
        assert rolled.count() == 3
        assert all("sketches" in f for f in rolled.inputFiles())
