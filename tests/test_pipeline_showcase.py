"""Showcase: an LLM training-data pipeline as an Application graph.

documents → exact+near dedup → quality gate → per-day corpus stats,
with every stage a node whose compute composes the engine's operators.
Verifies the whole engine story in one flow: partitioned marshal,
multi-stage dataflow, operator composition inside compute slots,
event-driven cascade, and data correctness at the end.
"""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    ParquetDataset,
    Spark,
    SparkSQL,
)
from rheoceros_spark.operators import (
    dedup_exact,
    minhash_lsh_dedup,
    quality_score,
    token_count,
)
from rheoceros_spark.sources.datasets import IntegrityProtocol

DAYS = ["2024-01-01", "2024-01-02"]


@pytest.fixture(scope="module")
def docs_by_day(spark, sf_dir, tmp_path_factory):
    """Documents split into two synthetic 'ingest days' by id parity."""
    root = str(tmp_path_factory.mktemp("docs_by_day"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i, day in enumerate(DAYS):
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


def test_llm_corpus_pipeline(spark, docs_by_day, tmp_path):
    app = Application("corpus", str(tmp_path / "store"), spark)
    day = Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
    raw = app.marshal_external_data(
        ParquetDataset(docs_by_day + "/{}", day, integrity=IntegrityProtocol.SUCCESS_FILE),
        id="raw_docs",
    )

    def clean(inputs, ctx):
        df = inputs["raw_docs"]
        df = dedup_exact(df)                      # exact content dedup
        df = minhash_lsh_dedup(df, threshold=0.8) # near-dup pass
        df = quality_score(df)
        return df.where(F.col("quality") >= 0.3).select(
            "doc_id", "text", "lang", "quality"
        )

    clean_docs = app.create_data(
        id="clean_docs", inputs=[raw], compute_targets=Spark(clean)
    )

    def stats(inputs, ctx):
        df = token_count(inputs["clean_docs"])
        return df.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )

    corpus_stats = app.create_data(
        id="corpus_stats", inputs=[clean_docs], compute_targets=Spark(stats)
    )

    # batch path with recursive backfill: one call runs the whole chain
    app.execute(corpus_stats["2024-01-01"], recursive=True)
    row = app.load_data(corpus_stats["2024-01-01"]).collect()[0]
    assert row.n_docs > 0 and row.total_tokens > 0

    # the cleaned set must be duplicate-free and quality-gated
    cleaned = app.load_data(clean_docs["2024-01-01"])
    n = cleaned.count()
    assert cleaned.select(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))).distinct().count() == n
    assert cleaned.where(F.col("quality") < 0.3).count() == 0

    # event-driven path: day-2 arrival cascades through both stages
    outs = app.process(raw["2024-01-02"])
    assert any(p.endswith("/clean_docs/2024-01-02") for p in outs)
    assert any(p.endswith("/corpus_stats/2024-01-02") for p in outs)
