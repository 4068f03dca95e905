"""Two-level positional partitions: region/day branch fan-out,
cartesian path materialization (F5), pruning, and ranged union."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import Application, Dimension, DimensionType, ParquetDataset, SparkSQL
from rheoceros_spark.sources.datasets import IntegrityProtocol

REGIONS = ["NA", "EU"]
DAYS = ["2024-01-01", "2024-01-02"]


@pytest.fixture(scope="module")
def events_region_day(spark, sf_dir, tmp_path_factory):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path_factory.mktemp("ev_rd"))
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for i, region in enumerate(REGIONS):
        for day in DAYS:
            (
                ev.where((F.col("user_id") % 2 == i) & (F.to_date("ts") == day))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{root}/{region}/{day}")
            )
    return root


@pytest.fixture()
def app_rd(spark, events_region_day, tmp_path):
    app = Application("rd_app", str(tmp_path / "store"), spark)
    app.marshal_external_data(
        ParquetDataset(
            events_region_day + "/{}/{}",
            Dimension("region"),
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            integrity=IntegrityProtocol.SUCCESS_FILE,
        ),
        id="events",
    )
    return app


def test_cartesian_path_materialization(app_rd, events_region_day):
    ev = app_rd["events"]
    paths = app_rd.materialize(ev["NA"]["2024-01-01":"2024-01-02"])
    assert paths == [
        f"{events_region_day}/NA/2024-01-01",
        f"{events_region_day}/NA/2024-01-02",
    ]


def test_pruned_load_single_region(app_rd, spark, events_region_day):
    df = app_rd.load_data(app_rd["events"]["EU"]["2024-01-02"])
    files = df.inputFiles()
    assert files and all("/EU/2024-01-02/" in f for f in files)


def test_two_dim_node_execute(app_rd, spark, events_region_day):
    ev = app_rd["events"]
    daily = app_rd.create_data(
        id="regional_daily",
        inputs=[ev],
        compute_targets=SparkSQL(
            "SELECT event_type, count(*) AS n, '{region}' AS region FROM events GROUP BY event_type"
        ),
    )
    path = app_rd.execute(daily["NA"]["2024-01-01"])
    assert path.endswith("/regional_daily/NA/2024-01-01")
    rows = app_rd.load_data(daily["NA"]["2024-01-01"]).collect()
    assert rows and all(r.region == "NA" for r in rows)
    exp = spark.read.parquet(f"{events_region_day}/NA/2024-01-01").count()
    assert sum(r.n for r in rows) == exp


def test_ranged_union_within_region(app_rd, spark, events_region_day):
    ev = app_rd["events"]
    agg = app_rd.create_data(
        id="na_2day",
        inputs=[ev["NA"][:-2]],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    app_rd.execute(agg["NA"]["2024-01-02"])
    got = app_rd.load_data(agg["NA"]["2024-01-02"]).collect()[0].n
    exp = sum(
        spark.read.parquet(f"{events_region_day}/NA/{d}").count() for d in DAYS
    )
    assert got == exp
