"""Async-compute lifecycle: retry contract + kill + compute records
(VERDICT r1 'What's missing' #1).

Mirrors the reference's chaos-test semantics: a slot that fails
transiently then succeeds must be retried by the orchestrator
(reference utils/test/inlined_compute.py:22-58 RandomFailureCompute /
InlinedComputeRetryVerifier; retry loop constructs.py:4400;
Application.kill application.py:2342)."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    ComputeKilledError,
    ComputeRecordState,
    ComputeRetryableInternalError,
    Dimension,
    DimensionType,
    InlinedCompute,
    ParquetDataset,
    Spark,
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
    ev.where(F.to_date("ts") == "2024-01-01").coalesce(1).write.mode("overwrite").parquet(
        f"{root}/2024-01-01"
    )
    return root


def build_app(spark, tmp_path, events_day, slots, **app_kwargs):
    app = Application("lifecycle_app", str(tmp_path / "store"), spark, **app_kwargs)
    events = app.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
    node = app.create_data(id="out", inputs=[events], compute_targets=slots)
    app.activate()
    return app, node


class FlakyCompute:
    """Deterministic RandomFailureCompute analog: fail the first
    ``n_failures`` calls, then succeed."""

    def __init__(self, n_failures, exc_type):
        self.n_failures = n_failures
        self.exc_type = exc_type
        self.calls = 0

    def __call__(self, input_map, output, params):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise self.exc_type(f"synthetic failure #{self.calls}")


SQL = SparkSQL("SELECT event_type, count(*) AS n FROM events GROUP BY event_type")


class TestRetryContract:
    def test_transient_error_is_retried(self, spark, tmp_path, events_day):
        flaky = FlakyCompute(2, ComputeRetryableInternalError)
        app, node = build_app(spark, tmp_path, events_day, [InlinedCompute(flaky), SQL])
        path = app.execute(node["2024-01-01"])
        assert path
        assert flaky.calls == 3  # 2 failures + 1 success
        rec = app.compute_records("out")[-1]
        assert rec.state == ComputeRecordState.COMPLETED
        assert rec.attempts == 2

    def test_transient_retry_limit_bounds_the_loop(self, spark, tmp_path, events_day):
        flaky = FlakyCompute(99, ComputeRetryableInternalError)
        app, node = build_app(
            spark, tmp_path, events_day, [InlinedCompute(flaky), SQL], transient_retry_limit=1
        )
        with pytest.raises(ComputeRetryableInternalError):
            app.execute(node["2024-01-01"])
        assert flaky.calls == 2  # initial + 1 bounded retry
        assert app.compute_records("out")[-1].state == ComputeRecordState.FAILED

    def test_generic_error_not_retried_by_default(self, spark, tmp_path, events_day):
        flaky = FlakyCompute(1, RuntimeError)
        app, node = build_app(spark, tmp_path, events_day, [InlinedCompute(flaky), SQL])
        with pytest.raises(RuntimeError):
            app.execute(node["2024-01-01"])
        assert flaky.calls == 1
        assert app.compute_records("out")[-1].state == ComputeRecordState.FAILED

    def test_retry_count_forces_retries_on_any_failure(self, spark, tmp_path, events_day):
        # reference application.py:467: user retry_count forces
        # orchestration retries even for non-transient failures
        flaky = FlakyCompute(2, RuntimeError)
        app, node = build_app(
            spark, tmp_path, events_day, [InlinedCompute(flaky, retry_count=2), SQL]
        )
        assert app.execute(node["2024-01-01"])
        assert flaky.calls == 3

    def test_failure_hook_fires_once_after_retries_exhausted(self, spark, tmp_path, events_day):
        failures = []
        flaky = FlakyCompute(99, RuntimeError)
        app, node = build_app(
            spark,
            tmp_path,
            events_day,
            [InlinedCompute(flaky, retry_count=1), SQL],
        )
        node_obj = app._nodes["out"]
        node_obj.hooks["on_failure"] = lambda n, v, e: failures.append(type(e).__name__)
        with pytest.raises(RuntimeError):
            app.execute(node["2024-01-01"])
        assert failures == ["RuntimeError"]
        assert flaky.calls == 2


class TestRetryHook:
    """Ported scenario: reference
    test_aws_application_execution_hooks.py:440-546
    (test_application_retry_hook) — ``on_compute_retry`` fires per
    granted retry; a retry_count=0 slot goes straight to on_failure
    without ever firing it; transient failures retry (and fire the
    hook) without consuming the slot's failure-retry budget."""

    def _wire(self, app, retries, failures):
        node_obj = app._nodes["out"]
        node_obj.hooks["on_compute_retry"] = (
            lambda n, v, slot, attempt, e: retries.append((attempt, type(e).__name__))
        )
        node_obj.hooks["on_failure"] = lambda n, v, e: failures.append(type(e).__name__)

    def test_retry_hook_fires_per_granted_retry_then_failure(
        self, spark, tmp_path, events_day
    ):
        retries, failures = [], []
        flaky = FlakyCompute(99, RuntimeError)
        app, node = build_app(
            spark, tmp_path, events_day, [InlinedCompute(flaky, retry_count=1), SQL]
        )
        self._wire(app, retries, failures)
        with pytest.raises(RuntimeError):
            app.execute(node["2024-01-01"])
        # one granted retry → one hook firing, then terminal failure
        assert retries == [(1, "RuntimeError")]
        assert failures == ["RuntimeError"]
        assert flaky.calls == 2

    def test_zero_retry_slot_never_fires_retry_hook(self, spark, tmp_path, events_day):
        retries, failures = [], []
        flaky = FlakyCompute(99, RuntimeError)
        app, node = build_app(
            spark, tmp_path, events_day, [InlinedCompute(flaky, retry_count=0), SQL]
        )
        self._wire(app, retries, failures)
        with pytest.raises(RuntimeError):
            app.execute(node["2024-01-01"])
        assert retries == []
        assert failures == ["RuntimeError"]
        assert flaky.calls == 1

    def test_transient_retries_fire_hook_without_consuming_budget(
        self, spark, tmp_path, events_day
    ):
        # 2 transient failures then success on a retry_count=0 slot:
        # the transient allowance (not the slot budget) grants them,
        # and each granted retry still reports through the hook
        retries, failures = [], []
        flaky = FlakyCompute(2, ComputeRetryableInternalError)
        app, node = build_app(
            spark,
            tmp_path,
            events_day,
            [InlinedCompute(flaky, retry_count=0), SQL],
            transient_retry_limit=3,
        )
        self._wire(app, retries, failures)
        assert app.execute(node["2024-01-01"])
        assert [a for a, _ in retries] == [1, 2]
        assert failures == []
        assert flaky.calls == 3


class TestKill:
    def test_kill_interrupts_running_spark_job(self, spark, tmp_path, events_day):
        @F.udf("long")
        def slow(x):
            time.sleep(0.25)
            return x

        def slow_slot(inputs, ctx):
            df = ctx.spark.range(120).repartition(8)
            return df.select(slow(F.col("id")).alias("id"))

        app, node = build_app(spark, tmp_path, events_day, [Spark(slow_slot)])
        errs = []

        def run():
            try:
                app.execute(node["2024-01-01"])
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t = threading.Thread(target=run)
        t.start()
        # wait for the execution to register + start its Spark job
        deadline = time.time() + 20
        while time.time() < deadline and not app.has_active_record(node["2024-01-01"]):
            time.sleep(0.05)
        time.sleep(1.0)
        assert app.kill(node["2024-01-01"]) is True
        t.join(timeout=60)
        assert not t.is_alive()
        assert errs and isinstance(errs[0], ComputeKilledError)
        rec = app.compute_records("out")[-1]
        assert rec.state == ComputeRecordState.KILLED
        assert not app.has_active_record(node["2024-01-01"])

    def test_kill_without_active_execution_returns_false(self, spark, tmp_path, events_day):
        app, node = build_app(spark, tmp_path, events_day, [SQL])
        assert app.kill(node["2024-01-01"]) is False
        # a normal run afterwards is unaffected by the earlier kill call
        assert app.execute(node["2024-01-01"])
        assert app.compute_records("out")[-1].state == ComputeRecordState.COMPLETED


class TestResourceConfRestore:
    def test_slot_conf_does_not_leak(self, spark, tmp_path, events_day):
        before = spark.conf.get("spark.sql.shuffle.partitions")
        app, node = build_app(
            spark,
            tmp_path,
            events_day,
            [SparkSQL(SQL.code, NumberOfWorkers=50)],
        )
        app.execute(node["2024-01-01"])
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestAsyncExecute:
    """execute(wait=False) + poll — the reference's execute/poll split
    (application.py:2051-2267): async run, active record visible at
    once, poll awaits completion and reports failure as (None, None)."""

    def test_async_execute_then_poll(self, spark, tmp_path, events_day):
        app, node = build_app(spark, tmp_path, events_day, [SQL])
        expected = app.execute(node["2024-01-01"], wait=False)
        assert expected  # materialized path returned immediately
        # record registered synchronously, before the thread ran anything
        assert app.compute_records("out")[-1].state in (
            ComputeRecordState.PROCESSING,
            ComputeRecordState.COMPLETED,
        )
        path, meta = app.poll(node["2024-01-01"])  # waits for completion
        assert path == expected
        assert meta and meta["record_count"] > 0
        assert app.compute_records("out")[-1].state == ComputeRecordState.COMPLETED
        assert not app.has_active_record(node["2024-01-01"])

    def test_async_failure_reported_by_poll(self, spark, tmp_path, events_day):
        flaky = FlakyCompute(99, RuntimeError)
        app, node = build_app(spark, tmp_path, events_day, [InlinedCompute(flaky), SQL])
        app.execute(node["2024-01-01"], wait=False)
        path, meta = app.poll(node["2024-01-01"])
        assert (path, meta) == (None, None)
        assert app.compute_records("out")[-1].state == ComputeRecordState.FAILED

    def test_async_execution_killable(self, spark, tmp_path, events_day):
        @F.udf("long")
        def slow(x):
            time.sleep(0.25)
            return x

        def slow_slot(inputs, ctx):
            return ctx.spark.range(120).repartition(8).select(slow(F.col("id")).alias("id"))

        app, node = build_app(spark, tmp_path, events_day, [Spark(slow_slot)])
        app.execute(node["2024-01-01"], wait=False)
        assert app.has_active_record(node["2024-01-01"])  # no race: record pre-registered
        time.sleep(1.0)
        assert app.kill(node["2024-01-01"]) is True
        path, meta = app.poll(node["2024-01-01"])
        assert (path, meta) == (None, None)
        assert app.compute_records("out")[-1].state == ComputeRecordState.KILLED


class TestKillValidations:
    """Ported: reference execution_control
    test_application_kill_validations (:1465-1505) — kill takes only
    materialized internal views; idle kills are harmless no-ops."""

    def test_kill_rejects_raw_ids_and_external_signals(self, spark, tmp_path, events_day):
        app, node = build_app(
            spark, tmp_path, events_day, [SQL]
        )
        with pytest.raises(ValueError, match="materialized node view"):
            app.kill("out")  # raw id, not a view
        with pytest.raises(KeyError, match="not an internal data node"):
            app.kill(app["events"]["2024-01-01"])  # external signal
        # idle node: NOOP, returns False, no side effects
        assert app.kill(node["2024-01-01"]) is False
        # and the node still executes normally afterwards
        assert app.execute(node["2024-01-01"])
