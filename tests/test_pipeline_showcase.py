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


def test_corpus_shaping_pipeline(spark, docs_by_day, tmp_path):
    """Round-6 corpus-shaping flow as an Application graph:
    domain-capped ingest → leakage-safe split assignment → per-split
    packing manifest, with the keep-list dedup feeding the cap stage —
    the serving-side mirror of the cleaning pipeline above."""
    from rheoceros_spark.operators import (
        dedup_keep_list,
        domain_cap,
        group_split,
        minhash_lsh_pairs,
        shuffle_shards,
        token_count,
    )

    app = Application("shaping", str(tmp_path / "store"), spark)
    day = Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
    raw = app.marshal_external_data(
        ParquetDataset(docs_by_day + "/{}", day, integrity=IntegrityProtocol.SUCCESS_FILE),
        id="raw_docs",
    )

    def shape(inputs, ctx):
        df = inputs["raw_docs"]
        keep = dedup_keep_list(df, minhash_lsh_pairs(df, threshold=0.8))
        df = df.join(keep.where(~F.col("is_dup")).select("doc_id"), "doc_id")
        df = domain_cap(df, source_col="source", cap=50)
        return group_split(df, group_col="source").select(
            "doc_id", "text", "source", "split", "src_rank"
        )

    shaped = app.create_data(id="shaped", inputs=[raw], compute_targets=Spark(shape))

    def manifest(inputs, ctx):
        df = shuffle_shards(token_count(inputs["shaped"]), n_shards=4)
        return df.groupBy("split", "shard").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )

    shards = app.create_data(id="shard_manifest", inputs=[shaped], compute_targets=Spark(manifest))

    app.execute(shards["2024-01-01"], recursive=True)
    out = app.load_data(shards["2024-01-01"])
    rows = out.collect()
    assert rows and all(r.n_docs > 0 and r.n_tokens > 0 for r in rows)
    assert {r.shard for r in rows} <= {0, 1, 2, 3}
    assert {r.split for r in rows} <= {"train", "val", "test"}

    shaped_df = app.load_data(shaped["2024-01-01"])
    # leakage-safety holds end-to-end: one split per source
    per_src = shaped_df.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_src.where(F.col("k") > 1).count() == 0
    # cap honored
    assert shaped_df.groupBy("source").count().where(F.col("count") > 50).count() == 0

    # event-driven cascade for day 2
    outs = app.process(raw["2024-01-02"])
    assert any(p.endswith("/shaped/2024-01-02") for p in outs)
    assert any(p.endswith("/shard_manifest/2024-01-02") for p in outs)
