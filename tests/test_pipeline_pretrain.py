"""Invariants of the composed pretraining pipeline
(pipeline_pretrain_corpus — staged; DuckDB parity is covered by
tests/test_staged.py at both sf0.001 and sf0.01)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from rheoceros_spark.operators.curation import filter_funnel, funnel_survivors


@pytest.fixture(scope="module")
def manifest(spark, sf_dir):
    df = entry.queries()["pipeline_pretrain_corpus"](spark, sf_dir)
    df = df.localCheckpoint()
    return df


def test_funnel_survivors_agree_with_funnel_counts(spark, sf_dir):
    """The survivor frame and the stage-4 count come from one gate
    definition — they can never disagree."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n4 = (
        filter_funnel(docs)
        .where(F.col("stage_name") == "dedup")
        .first()
        .n_docs
    )
    assert funnel_survivors(docs).count() == n4


def test_manifest_nonempty_and_keys_unique(manifest):
    assert manifest.count() > 0
    assert (
        manifest.groupBy("doc_id", "chunk_id").count().where("count > 1").count()
        == 0
    )


def test_bins_overflow_by_at_most_one_chunk(manifest):
    """Greedy streaming fill (bin = the one the chunk's FIRST token
    lands in): a bin's total stays under budget + its largest chunk,
    and every non-final bin holds at least budget - (max_chunk - 1)
    tokens — its first chunk can start at most max_chunk - 1 tokens
    past the bin boundary, its last must reach the next boundary."""
    per_bin = manifest.groupBy("shard", "bin_id").agg(
        F.sum("n_chunk_tokens").alias("tok"), F.max("n_chunk_tokens").alias("mx")
    )
    assert per_bin.where(F.col("tok") >= 256 + F.col("mx")).count() == 0
    last = manifest.groupBy("shard").agg(F.max("bin_id").alias("last_bin"))
    under = (
        per_bin.join(last, "shard")
        .where((F.col("bin_id") < F.col("last_bin")) & (F.col("tok") < 256 - 31))
    )
    assert under.count() == 0


def test_chunks_cover_each_picked_doc_exactly(manifest):
    """Within a doc, chunk ids are dense from 0 and every chunk but the
    last carries exactly 32 BPE tokens — i.e. chunking partitioned the
    doc's token stream with no gap or overlap."""
    per_doc = manifest.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        F.sum(F.when(F.col("n_chunk_tokens") == 32, 1).otherwise(0)).alias("full"),
    )
    assert per_doc.where(F.col("max_id") != F.col("n_chunks") - 1).count() == 0
    assert per_doc.where(F.col("full") < F.col("n_chunks") - 1).count() == 0


def test_no_benchmark_docs_in_manifest(manifest):
    """The doc_id % 97 == 0 benchmark slice must never reach the
    training manifest (it is the decontamination target)."""
    assert manifest.where(F.col("doc_id") % 97 == 0).count() == 0


def test_plan_has_no_cartesian_product(manifest, spark, sf_dir):
    plan = (
        entry.queries()["pipeline_pretrain_corpus"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
