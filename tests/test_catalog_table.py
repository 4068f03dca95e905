"""Catalog-table source (S3 in SURVEY §2.1): ``spark.table`` + partition
predicate, with Catalyst doing metastore partition pruning natively."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import Application, Dimension, DimensionType
from rheoceros_spark.sources.datasets import GlueTable


@pytest.fixture(scope="module")
def catalog_events(spark, sf_dir, tmp_path_factory):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    loc = str(tmp_path_factory.mktemp("cat_events"))
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    ).withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    (
        ev.write.mode("overwrite")
        .partitionBy("day")
        .option("path", loc)
        .saveAsTable("cat_events")
    )
    yield "cat_events"
    spark.sql("DROP TABLE IF EXISTS cat_events")


def test_catalog_partition_predicate_and_pruning(spark, catalog_events, tmp_path):
    app = Application("cat_app", str(tmp_path / "store"), spark)
    sig = app.marshal_external_data(
        GlueTable(
            "default",
            catalog_events,
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
        ),
        id="ev_cat",
    )
    df = app.load_data(sig["2024-01-02"])
    exp = spark.table(catalog_events).where(F.col("day") == "2024-01-02").count()
    assert df.count() == exp > 0
    # Catalyst prunes catalog partitions: only matching files are read
    files = df.inputFiles()
    assert files and all("day=2024-01-02" in f for f in files)


def test_catalog_multi_day_disjunction(spark, catalog_events, tmp_path):
    app = Application("cat_app2", str(tmp_path / "store"), spark)
    sig = app.marshal_external_data(
        GlueTable(
            "default",
            catalog_events,
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
        ),
        id="ev_cat",
    )
    two = app.load_data(sig["2024-01-01":"2024-01-02"])
    exp = (
        spark.table(catalog_events)
        .where(F.col("day").isin("2024-01-01", "2024-01-02"))
        .count()
    )
    assert two.count() == exp > 0
