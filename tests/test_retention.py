"""RouteRetention: execution skip for out-of-retention partitions and
the GC sweep over materialized outputs (reference ``RouteRetention``
``routing_runtime_constructs.py:784-803``; enforcement
``constructs.py:3476`` (skip) and ``:3710-3775`` (sweep + deletion))."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    ParquetDataset,
    RouteRetention,
    SparkSQL,
)


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


@pytest.fixture()
def events_day(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "events_by_day")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in ("2024-01-01", "2024-01-02", "2024-01-03"):
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


CUTOFF = datetime(2024, 1, 2)


@pytest.fixture()
def app(spark, tmp_path, events_day):
    a = Application("retention_app", str(tmp_path / "store"), spark)
    events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
    skipped = []
    a.create_data(
        id="daily",
        inputs=[events],
        compute_targets=SparkSQL(
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
        # keep only partitions at/after the cutoff; condition sees RAW
        # (typed datetime) values, not formatted strings
        output_retention=RouteRetention(condition=lambda dims: dims["day"] >= CUTOFF),
        on_exec_skipped=lambda node, vals: skipped.append(dict(vals)),
    )
    a._test_skipped = skipped  # test-side capture
    return a


class TestRetentionSkip:
    def test_out_of_retention_execution_is_skipped(self, app):
        app.activate()
        path = app.execute(app["daily"]["2024-01-01"])
        # skipped before compute: no output materialized, hook fired
        assert not os.path.exists(path)
        assert app._test_skipped and app._test_skipped[0]["day"]
        with pytest.raises(FileNotFoundError):
            app.load_data(app["daily"]["2024-01-01"])  # nothing was written

    def test_async_skip_completes_record(self, app):
        """wait=False on an out-of-retention target: the pre-registered
        record must transition out of PROCESSING or poll() spins
        forever and the sweep treats the partition as in-flight."""
        app.activate()
        app.execute(app["daily"]["2024-01-01"], wait=False)
        path, err = app.poll(app["daily"]["2024-01-01"], wait=True)  # must terminate
        assert err is None
        recs = app.compute_records("daily")
        assert recs and all(r.state.value != "PROCESSING" for r in recs)
        assert any("retention" in (r.detail or "") for r in recs)

    def test_skip_fires_before_input_materialization(self, spark, tmp_path, events_day):
        """The gate must run before inputs load: an out-of-retention
        target whose input partition does not even exist (the normal
        case for expired data) is skipped, not crashed."""
        a = Application("gate_order", str(tmp_path / "store3"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
        a.create_data(
            id="daily",
            inputs=[events],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
            output_retention=RouteRetention(condition=lambda dims: dims["day"] >= CUTOFF),
        )
        a.activate()
        # 2020-05-05: no input partition exists — must still skip cleanly
        path = a.execute(a["daily"]["2020-05-05"])
        assert not os.path.exists(path)

    def test_in_retention_execution_runs(self, app):
        app.activate()
        path = app.execute(app["daily"]["2024-01-02"])
        assert os.path.exists(path)
        assert app.load_data(app["daily"]["2024-01-02"]).count() > 0


class TestRetentionSweep:
    def test_sweep_deletes_only_expired_partitions(self, app):
        app.activate()
        # materialize both sides of the cutoff: widen retention, run,
        # then sweep with the real condition
        node = app._nodes["daily"]
        node.output_retention = None
        p1 = app.execute(app["daily"]["2024-01-01"])
        p2 = app.execute(app["daily"]["2024-01-02"])
        assert os.path.exists(p1) and os.path.exists(p2)
        from rheoceros_spark.application import RouteRetention as RR

        node.output_retention = RR(condition=lambda dims: dims["day"] >= CUTOFF)
        # a stray non-partition directory at partition depth must be
        # ignored by the sweep, not crash dimension extraction
        os.makedirs(os.path.dirname(p1) + "/backup-not-a-date", exist_ok=True)
        deleted = app.apply_retention()
        assert deleted == {"daily": [p1]}
        assert os.path.isdir(os.path.dirname(p1) + "/backup-not-a-date")
        assert not os.path.exists(p1)
        assert os.path.exists(p2)
        # idempotent: second sweep is a no-op
        assert app.apply_retention() == {}

    def test_refresh_period_rate_limits_and_hooks_fire(self, app):
        app.activate()
        node = app._nodes["daily"]
        node.output_retention = None
        p1 = app.execute(app["daily"]["2024-01-01"])
        from rheoceros_spark.application import RouteRetention as RR

        ripped, refreshed = [], []
        node.output_retention = RR(
            condition=lambda dims: dims["day"] >= CUTOFF,
            refresh_period_in_secs=3600.0,
            rip_hook=lambda path, vals: ripped.append((path, vals["day"])),
            refresh_hook=lambda node_id: refreshed.append(node_id),
        )
        assert app.apply_retention() == {"daily": [p1]}
        assert refreshed == ["daily"]
        assert ripped and ripped[0][0] == p1
        # rate-limited: second sweep inside the period does not re-scan
        assert app.apply_retention() == {}
        assert refreshed == ["daily"]
        # force overrides the period (idempotent: nothing left to delete)
        assert app.apply_retention(force=True) == {}
        assert refreshed == ["daily", "daily"]

    def test_sweep_without_retention_is_noop(self, spark, tmp_path, events_day):
        a = Application("no_ret", str(tmp_path / "store2"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
        a.create_data(
            id="daily",
            inputs=[events],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
        )
        a.activate()
        p = a.execute(a["daily"]["2024-01-02"])
        assert a.apply_retention() == {}
        assert os.path.exists(p)
