"""Diagnostics (metrics/alarms), timer signals, projection fan-out.

Mirrors the reference's alarming/metrics + projection application tests
(reference test_aws_application_alarming_and_metrics.py,
test_aws_application_input_projection.py) but asserts on data, not just
orchestration state.
"""

from datetime import datetime

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
from rheoceros_spark.diagnostics import (
    AlarmRule,
    alarm_state,
    metric_math,
    metric_period_stats,
)
from rheoceros_spark.signals import EQUALS
from rheoceros_spark.sources.datasets import IntegrityProtocol


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def metric_df(spark):
    rows = [
        ("m", ts("2024-01-01 00:00:00"), 5.0),
        ("m", ts("2024-01-01 00:30:00"), 15.0),
        ("m", ts("2024-01-01 01:00:00"), 20.0),
        ("m", ts("2024-01-01 02:00:00"), 1.0),
        ("m", ts("2024-01-01 03:00:00"), 30.0),
        ("m", ts("2024-01-01 04:00:00"), 40.0),
    ]
    return spark.createDataFrame(rows, "name string, ts timestamp, value double")


class TestMetrics:
    def test_period_stats(self, metric_df):
        out = metric_period_stats(
            metric_df, period="1 hour", dims=["name"], percentiles=[0.5]
        )
        rows = {r.period_start: r for r in out.collect()}
        h0 = rows[ts("2024-01-01 00:00:00")]
        assert h0.SampleCount == 2 and h0.Sum == 20.0
        assert h0.Minimum == 5.0 and h0.Maximum == 15.0 and h0.Average == 10.0
        assert h0.p0_5 == 10.0

    def test_metric_math(self, metric_df, spark):
        hourly = metric_period_stats(metric_df, period="1 hour", stats=["Sum"])
        m1 = hourly.select("period_start", F.col("Sum").alias("value"))
        m2 = spark.createDataFrame(
            [(ts("2024-01-01 00:00:00"), 2.0), (ts("2024-01-01 01:00:00"), 4.0)],
            "period_start timestamp, value double",
        )
        out = metric_math({"m1": m1, "m2": m2}, "m1 / m2", alias="ratio")
        got = {r.period_start: r.ratio for r in out.collect()}
        assert got[ts("2024-01-01 00:00:00")] == 10.0
        assert got[ts("2024-01-01 01:00:00")] == 5.0
        assert got[ts("2024-01-01 02:00:00")] is None  # missing m2 period

    def test_alarm_m_of_n(self, metric_df):
        hourly = metric_period_stats(metric_df, period="1 hour", dims=["name"], stats=["Average"])
        st = alarm_state(
            hourly,
            metric_col="Average",
            threshold=10.0,
            evaluation_periods=2,
            datapoints_to_alarm=2,
            dims=["name"],
        )
        got = {r.period_start.hour: r.state for r in st.collect()}
        # avgs by hour: 10, 20, 1, 30, 40 → breaches: 0,1,0,1,1
        assert got == {0: "INSUFFICIENT_DATA", 1: "OK", 2: "OK", 3: "OK", 4: "ALARM"}

    def test_alarm_rule_composite(self, spark):
        a = spark.createDataFrame(
            [(1, "ALARM"), (2, "OK"), (3, "ALARM")], "period_start int, state string"
        )
        b = spark.createDataFrame(
            [(1, "ALARM"), (3, "OK")], "period_start int, state string"
        )
        rule = (AlarmRule.of("a") & ~AlarmRule.of("b")) | AlarmRule.of("b")
        out = {r.period_start: r.state for r in rule.evaluate({"a": a, "b": b}).collect()}
        # p1: (T & ~T)|T = ALARM; p2: (F&..)|missing=OK; p3: (T & ~F)|F = ALARM
        assert out == {1: "ALARM", 2: "OK", 3: "ALARM"}


class TestTimerAndProjection:
    @pytest.fixture()
    def app(self, spark, tmp_path):
        return Application("diag_app", str(tmp_path / "store"), spark)

    @pytest.fixture()
    def events_by_day(self, spark, sf_dir, tmp_path):
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

    def test_timer_triggers_ref_input(self, app, events_by_day, spark):
        """Timer event drives the trigger; the dataset rides along as a
        reference whose partition is derived from the timer date (S9+J4)."""
        timer = app.add_timer("daily_timer", granularity="day", date_format="%Y-%m-%d")
        events = app.marshal_external_data(
            ParquetDataset(
                events_by_day + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
                integrity=IntegrityProtocol.SUCCESS_FILE,
            ),
            id="events",
        )
        node = app.create_data(
            id="timed_stats",
            inputs={"t": timer, "events": events.ref},
            input_dim_links=[(("events", "day"), EQUALS, ("t", "time"))],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        outputs = app.process(timer["2024-01-02"])
        assert len(outputs) == 1
        n_total = app.load_data(node["2024-01-02"]).agg(F.sum("n")).collect()[0][0]
        exp = (
            spark.read.parquet(events_by_day + "/2024-01-02").count()
        )
        assert n_total == exp

    def test_projection_execute_and_fanout(self, app, events_by_day, spark):
        events = app.marshal_external_data(
            ParquetDataset(
                events_by_day + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
                integrity=IntegrityProtocol.SUCCESS_FILE,
            ),
            id="events",
        )
        daily = app.create_data(
            id="daily",
            inputs=[events],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        proj = app.project("daily_by_tier", daily, "tier", ["gold", "silver"])

        # execute one projected partition directly (backfills `daily`)
        path = app.execute(proj["2024-01-01"]["gold"], recursive=True)
        assert path.endswith("/2024-01-01/gold")

        # event-driven: one upstream event fans out to both tiers
        outputs = app.process(events["2024-01-02"])
        tiers = {p.rsplit("/", 1)[-1] for p in outputs if "daily_by_tier" in p}
        assert tiers == {"gold", "silver"}
        got = app.load_data(proj["2024-01-02"]["silver"]).count()
        assert got == app.load_data(daily["2024-01-02"]).count()


def test_alarm_m_of_n_range_window_ignores_sparse_gaps(spark):
    """Sparse metrics (rows only on activity): three breach rows days
    apart are NOT 3-of-3 consecutive breaches.  The row-window default
    would fire; the period_seconds range window must not."""
    from datetime import datetime

    from rheoceros_spark.diagnostics import alarm_state

    rows = [
        (datetime(2024, 1, 1, 0), 99.0),
        (datetime(2024, 1, 3, 5), 99.0),
        (datetime(2024, 1, 7, 9), 99.0),
    ]
    df = spark.createDataFrame(rows, "period_start timestamp, value double")
    row_based = alarm_state(df, "value", 50.0, evaluation_periods=3).orderBy("period_start").collect()
    assert row_based[-1]["state"] == "ALARM"  # the documented row-window trap
    ranged = alarm_state(
        df, "value", 50.0, evaluation_periods=3, period_seconds=3600
    ).orderBy("period_start").collect()
    assert all(r["state"] != "ALARM" for r in ranged)
    assert ranged[0]["state"] == "INSUFFICIENT_DATA"  # no history yet
    assert ranged[-1]["state"] == "OK"  # plenty of history, 1 breach in last 3h

    # dense hourly breaches still fire under the range window
    dense = spark.createDataFrame(
        [(datetime(2024, 1, 1, h), 99.0) for h in range(4)],
        "period_start timestamp, value double",
    )
    fired = alarm_state(
        dense, "value", 50.0, evaluation_periods=3, period_seconds=3600
    ).orderBy("period_start").collect()
    assert fired[-1]["state"] == "ALARM"
