"""Completed-path caching across pending nodes (reference
``transfer_ranges`` / ``common_completed_paths``,
routing_runtime_constructs.py:316-341, 370-395): re-offered events must
not re-probe partitions already verified complete, and range checks
fail fast at the first missing partition."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    ParquetDataset,
    SparkSQL,
)

DAYS = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


@pytest.fixture()
def events_days(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "ev")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in DAYS:
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


@pytest.fixture()
def probe_counter(monkeypatch):
    """Count (and pass through) routing-layer partition probes."""
    import rheoceros_spark.streaming.routing as routing_mod
    from rheoceros_spark.sources.io import partition_ready as real

    calls = []

    def counting(spark, desc, path):
        calls.append(path)
        return real(spark, desc, path)

    monkeypatch.setattr(routing_mod, "partition_ready", counting)
    return calls


def test_completed_paths_probe_once_across_events(spark, tmp_path, events_days, probe_counter):
    app = Application("range_cache_app", str(tmp_path / "store"), spark)
    events = app.marshal_external_data(ParquetDataset(events_days + "/{}", day_dim()), id="events")
    node = app.create_data(
        id="agg",
        inputs=[events[:-3].range_check(True)],
        compute_targets=[SparkSQL("SELECT count(*) AS n FROM events")],
    )
    app.activate()

    app.process(events["2024-01-03"])
    first_cycle = len(probe_counter)
    # 3-wide range from the tip: the tip itself is proven by ITS OWN
    # EVENT (ingestion = completion notification, reference
    # advanced_input_modes), so only the 2 older partitions are probed
    assert first_cycle == 2

    app.process(events["2024-01-04"])
    # new trigger group's range overlaps the event-proven tip and 2
    # completed paths → nothing left to probe at all
    assert len(probe_counter) - first_cycle == 0
    assert len(set(probe_counter)) == len(probe_counter), "a path was probed twice"


def test_range_check_fails_fast_on_first_missing(spark, tmp_path, events_days, probe_counter):
    app = Application("fail_fast_app", str(tmp_path / "store"), spark)
    events = app.marshal_external_data(ParquetDataset(events_days + "/{}", day_dim()), id="events")
    app.create_data(
        id="agg",
        # range reaches 3 days before the first existing partition
        inputs=[events[:-6].range_check(True)],
        compute_targets=[SparkSQL("SELECT count(*) AS n FROM events")],
    )
    app.activate()

    outputs = app.process(events["2024-01-03"])
    assert outputs == []  # 2023-12-29..31 missing → not triggered
    # probes stop at the FIRST missing partition instead of walking the
    # whole 6-day range: tip proven by its own event, then 01-02 and
    # 01-01 complete, 2023-12-31 miss → stop
    assert len(probe_counter) == 3
