"""Non-day granularity partitions end-to-end: hourly and monthly
dimension arithmetic through ranged reads and the Application path."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    ParquetDataset,
    SparkSQL,
)
from rheoceros_spark.dimensions import DateVariant, RelativeVariant
from rheoceros_spark.sources.datasets import IntegrityProtocol


def test_hour_granularity_range_expansion():
    dim = Dimension("hour", DimensionType.DATETIME, {"format": "%Y-%m-%d-%H", "granularity": "HOUR"})
    rel = RelativeVariant(-3, 0, dim)
    datum = DateVariant("2024-01-01-05", dim)
    vals = [v.formatted() for v in rel.expand(datum)]
    assert vals == ["2024-01-01-05", "2024-01-01-04", "2024-01-01-03"]


def test_month_granularity_steps_calendar_aware():
    dim = Dimension("month", DimensionType.DATETIME, {"format": "%Y-%m", "granularity": "MONTH"})
    rel = RelativeVariant(-3, 0, dim)
    datum = DateVariant("2024-01", dim)
    vals = [v.formatted() for v in rel.expand(datum)]
    assert vals == ["2024-01", "2023-12", "2023-11"]  # crosses the year boundary


def test_week_shift_moves_anchor_before_expansion():
    dim = Dimension("week", DimensionType.DATETIME, {"format": "%Y-%m-%d", "granularity": "WEEK"})
    rel = RelativeVariant(-2, -1, dim)  # shift one week back, then 2 values
    datum = DateVariant("2024-01-15", dim)
    vals = [v.formatted() for v in rel.expand(datum)]
    assert vals == ["2024-01-08", "2024-01-01"]


def test_hourly_partitions_end_to_end(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "ev_hourly")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    hours = ["2024-01-01-00", "2024-01-01-01", "2024-01-01-02"]
    for h in hours:
        ev.where(F.date_format("ts", "yyyy-MM-dd-HH") == h).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{h}")

    app = Application("hourly_app", str(tmp_path / "store"), spark)
    events = app.marshal_external_data(
        ParquetDataset(
            root + "/{}",
            Dimension("hour", DimensionType.DATETIME, {"format": "%Y-%m-%d-%H", "granularity": "HOUR"}),
            integrity=IntegrityProtocol.SUCCESS_FILE,
        ),
        id="events",
    )
    # 3-hour ranged union at HOUR granularity
    agg = app.create_data(
        id="agg_3h",
        inputs=[events[:-3]],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    app.execute(agg["2024-01-01-02"])
    got = app.load_data(agg["2024-01-01-02"]).collect()[0].n
    exp = sum(spark.read.parquet(f"{root}/{h}").count() for h in hours)
    assert got == exp
    # output partition path rendered at hour granularity
    path, meta = app.poll(agg["2024-01-01-02"])
    assert path.endswith("/agg_3h/2024-01-01-02") and meta["record_count"] == 1
