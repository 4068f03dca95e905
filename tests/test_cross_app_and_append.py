"""Cross-application import (S20/J10) and APPEND dataset semantics."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import Application, Dimension, DimensionType, ParquetDataset, SparkSQL
from rheoceros_spark.sources.datasets import IntegrityProtocol


@pytest.fixture()
def events_by_day(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "events_by_day")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in ["2024-01-01", "2024-01-02"]:
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


def test_cross_app_import(spark, events_by_day, tmp_path):
    up = Application("producer", str(tmp_path / "up_store"), spark)
    events = up.marshal_external_data(
        ParquetDataset(events_by_day + "/{}", day_dim(), integrity=IntegrityProtocol.SUCCESS_FILE),
        id="events",
    )
    daily = up.create_data(
        id="daily",
        inputs=[events],
        compute_targets=SparkSQL("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"),
    )
    up.execute(daily["2024-01-01"])

    down = Application("consumer", str(tmp_path / "down_store"), spark)
    imported = down.import_upstream(up, "daily")
    total = down.create_data(
        id="grand_total",
        inputs=[imported],
        compute_targets=SparkSQL("SELECT sum(n) AS total FROM daily"),
    )
    # batch path reads the upstream app's storage directly
    down.execute(total["2024-01-01"])
    got = down.load_data(total["2024-01-01"]).collect()[0].total
    exp = up.load_data(daily["2024-01-01"]).agg(F.sum("n")).collect()[0][0]
    assert got == exp

    # event-driven path: upstream completion signal routes into this app
    up.execute(daily["2024-01-02"])
    outs = down.process(up["daily"]["2024-01-02"])
    assert len(outs) == 1 and outs[0].endswith("/grand_total/2024-01-02")


def test_append_dataset_accumulates(spark, events_by_day, tmp_path):
    app = Application("append_app", str(tmp_path / "store"), spark)
    events = app.marshal_external_data(
        ParquetDataset(events_by_day + "/{}", day_dim(), integrity=IntegrityProtocol.SUCCESS_FILE),
        id="events",
    )
    log = app.create_data(
        id="audit_log",
        inputs=[events],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
        dataset_type="APPEND",
    )
    app.execute(log["2024-01-01"])
    assert app.load_data(log["2024-01-01"]).count() == 1
    app.execute(log["2024-01-01"])  # re-execution appends, not replaces
    assert app.load_data(log["2024-01-01"]).count() == 2

    # REPLACE (default) stays idempotent
    rep = app.create_data(
        id="daily_replace",
        inputs=[events],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    app.execute(rep["2024-01-01"])
    app.execute(rep["2024-01-01"])
    assert app.load_data(rep["2024-01-01"]).count() == 1


def test_poll_on_upstream_data(spark, events_by_day, tmp_path):
    """Ported: reference execution_control
    test_application_poll_on_upstream_data (:575-640) — a downstream
    app polls an imported upstream signal: (None, None) before the
    upstream partition materializes, the physical path after."""
    up = Application("producer2", str(tmp_path / "up2"), spark)
    events = up.marshal_external_data(
        ParquetDataset(events_by_day + "/{}", day_dim(), integrity=IntegrityProtocol.SUCCESS_FILE),
        id="events",
    )
    daily = up.create_data(
        id="daily",
        inputs=[events],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )

    down = Application("consumer2", str(tmp_path / "down2"), spark)
    imported = down.import_upstream(up, "daily")

    # upstream hasn't produced the partition yet
    assert down.poll(imported["2024-01-01"], wait=False) == (None, None)
    assert not down.has_active_record(imported["2024-01-01"])

    up.execute(daily["2024-01-01"])
    path, _ = down.poll(imported["2024-01-01"])
    assert path is not None and path.endswith("daily/2024-01-01")
    # and the data reads through the downstream scope
    assert down.load_data(imported["2024-01-01"]).collect()[0].n > 0
