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


class TestAlarmIngestion:
    """Ported: reference test_aws_application_alarming_and_metrics.py
    :500-663 (test_application_alarming_and_metrics_alarm_ingestion) —
    alarms declared over internal metrics become signals that trigger
    reactor nodes on state TRANSITIONS; a composite alarm composes
    member states through an AlarmRule tree."""

    @pytest.fixture()
    def alarm_app(self, spark, tmp_path):
        from rheoceros_spark import (
            AlarmRule,
            Application,
            InlinedCompute,
            MetricPeriod,
            MetricStatistic,
            SparkSQL,
        )

        app = Application("alarm_ingest", str(tmp_path / "store"), spark)
        metric = app.create_metric(id="my_app_error_metric_def")
        alarm = app.create_alarm(
            id="generic_error_alarm",
            target_metric_or_expression="errors > 0 OR failures > 0",
            metrics={
                "errors": metric["MY_CUSTOM_ERROR"][MetricStatistic.SUM][
                    MetricPeriod.MINUTES(5)
                ],
                "failures": metric["MY_CUSTOM_FAILURE"][MetricStatistic.SUM][
                    MetricPeriod.MINUTES(5)
                ],
            },
            number_of_evaluation_periods=1,
            number_of_datapoint_periods=1,
            comparison_operator="GreaterThanOrEqualToThreshold",
            threshold=1,
        )
        fired = {"failure": 0, "health": 0, "composite": 0}

        def _count(key):
            def cb(input_map, output, params):
                fired[key] += 1
            return cb

        app.create_data(
            id="system_failure_reactor",
            inputs=[alarm["ALARM"]],
            compute_targets=[InlinedCompute(_count("failure")), SparkSQL("SELECT 1 AS one")],
        )
        app.create_data(
            id="system_health_reactor",
            inputs=[alarm["OK"]],
            compute_targets=[InlinedCompute(_count("health")), SparkSQL("SELECT 1 AS one")],
        )
        composite = app.create_composite_alarm(
            id="composite_alarm", alarm_rule=AlarmRule.of("generic_error_alarm")
        )
        app.create_data(
            id="composite_reactor",
            inputs=[composite["ALARM"]],
            compute_targets=[InlinedCompute(_count("composite")), SparkSQL("SELECT 1 AS one")],
        )
        app.activate()
        return app, metric, fired

    def test_transitions_trigger_matching_reactors(self, alarm_app):
        app, metric, fired = alarm_app
        # healthy baseline: zero-valued datapoints → OK transition
        app.emit_metric(metric, "MY_CUSTOM_ERROR", 0.0, ts="2024-01-01T10:00:00")
        app.emit_metric(metric, "MY_CUSTOM_FAILURE", 0.0, ts="2024-01-01T10:00:30")
        states = app.evaluate_alarms()
        assert states["generic_error_alarm"] == "OK"
        assert states["composite_alarm"] == "OK"
        assert fired == {"failure": 0, "health": 1, "composite": 0}

        # errors arrive → ALARM; failure + composite reactors fire
        app.emit_metric(metric, "MY_CUSTOM_ERROR", 3.0, ts="2024-01-01T10:06:00")
        states = app.evaluate_alarms()
        assert states["generic_error_alarm"] == "ALARM"
        assert states["composite_alarm"] == "ALARM"
        assert fired == {"failure": 1, "health": 1, "composite": 1}

        # steady ALARM: no NEW transition → no re-fire
        app.emit_metric(metric, "MY_CUSTOM_ERROR", 5.0, ts="2024-01-01T10:07:00")
        states = app.evaluate_alarms()
        assert states["generic_error_alarm"] == "ALARM"
        assert fired == {"failure": 1, "health": 1, "composite": 1}

        # recovery → OK transition fires the health reactor again
        app.emit_metric(metric, "MY_CUSTOM_ERROR", 0.0, ts="2024-01-01T10:12:00")
        app.emit_metric(metric, "MY_CUSTOM_FAILURE", 0.0, ts="2024-01-01T10:12:30")
        states = app.evaluate_alarms()
        assert states["generic_error_alarm"] == "OK"
        assert fired == {"failure": 1, "health": 2, "composite": 1}

    def test_no_data_is_insufficient_and_fires_nothing(self, alarm_app):
        app, metric, fired = alarm_app
        states = app.evaluate_alarms()
        assert states["generic_error_alarm"] == "INSUFFICIENT_DATA"
        assert fired == {"failure": 0, "health": 0, "composite": 0}

    def test_unknown_member_and_incomplete_selector_rejected(self, spark, tmp_path):
        from rheoceros_spark import AlarmRule, Application, MetricStatistic

        app = Application("alarm_val", str(tmp_path / "store2"), spark)
        m = app.create_metric(id="m")
        with pytest.raises(ValueError, match="unknown member"):
            app.create_composite_alarm("c", AlarmRule.of("nope"))
        with pytest.raises(ValueError, match="needs .statistic..period."):
            app.create_alarm(
                id="a", target_metric_or_expression=m["X"][MetricStatistic.SUM]
            )


class TestOrchestrationRouteMetricsAlarmable:
    """Ported (semantics): reference alarming suite :757-830 — the
    routing table's own per-route counters are observable by alarms
    like any metric, closing the orchestration-health loop."""

    @pytest.fixture()
    def events_by_day(self, spark, sf_dir, tmp_path):
        from rheoceros_spark.sources.io import normalize_ns_timestamps

        root = str(tmp_path / "ev_orch")
        ev = normalize_ns_timestamps(
            spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
        )
        ev.where(F.to_date("ts") == "2024-01-01").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/2024-01-01")
        return root

    def test_route_failure_counter_trips_alarm_reactor(self, spark, tmp_path, events_by_day):
        from rheoceros_spark import (
            Application,
            InlinedCompute,
            MetricPeriod,
            MetricStatistic,
            ParquetDataset,
            SparkSQL,
        )

        app = Application("orch_metrics", str(tmp_path / "store"), spark)
        from rheoceros_spark import Dimension, DimensionType

        events = app.marshal_external_data(
            ParquetDataset(
                events_by_day + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            ),
            id="events",
        )

        def boom(input_map, output, params):
            raise RuntimeError("synthetic compute failure")

        app.create_data(
            id="flaky_node",
            inputs=[events],
            compute_targets=[InlinedCompute(boom), SparkSQL("SELECT 1 AS one")],
        )
        orch = app.create_metric(id="routing_table")
        alarm = app.create_alarm(
            id="route_failure_alarm",
            target_metric_or_expression=orch["flaky_node.failures"][
                MetricStatistic.SUM
            ][MetricPeriod.MINUTES(5)],
            threshold=1,
            comparison_operator=">=",
        )
        fired = []
        app.create_data(
            id="oncall_reactor",
            inputs=[alarm["ALARM"]],
            compute_targets=[
                InlinedCompute(lambda i, o, p: fired.append(1)),
                SparkSQL("SELECT 1 AS one"),
            ],
        )
        app.activate()

        with pytest.raises(RuntimeError, match="synthetic"):
            app.process(events["2024-01-01"])
        app.emit_route_metrics(ts="2024-01-01T00:01:00")
        states = app.evaluate_alarms()
        assert states["route_failure_alarm"] == "ALARM"
        assert fired == [1]
