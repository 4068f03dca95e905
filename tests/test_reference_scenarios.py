"""Scenario parity with the reference's application test corpus
(SURVEY §5): range shift, dependency-tree re-execution, pending-node
TTL, FULL_RANGE processing.  Each test names the reference scenario it
mirrors and asserts on data, not just orchestration state."""

import time

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    ParquetDataset,
    SparkSQL,
)
from rheoceros_spark.sources.datasets import IntegrityProtocol

DAYS = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


@pytest.fixture(scope="module")
def events_by_day(spark, sf_dir, tmp_path_factory):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path_factory.mktemp("ev_scen"))
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in DAYS:
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


def make_app(spark, tmp_path, events_by_day, name):
    app = Application(name, str(tmp_path / "store"), spark)
    app.marshal_external_data(
        ParquetDataset(
            events_by_day + "/{}",
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            integrity=IntegrityProtocol.SUCCESS_FILE,
        ),
        id="events",
    )
    return app


def test_range_shift_consumes_shifted_window(spark, tmp_path, events_by_day):
    """[:-2:-1]: shift moves the anchor one day back *before* the
    2-value expansion (reference advanced_input_modes range-shift
    scenarios; trap list SURVEY §7.3)."""
    app = make_app(spark, tmp_path, events_by_day, "shift_app")
    node = app.create_data(
        id="shifted",
        inputs=[app["events"][:-2:-1]],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    app.execute(node["2024-01-03"])
    got = app.load_data(node["2024-01-03"]).collect()[0].n
    # anchor 01-03 shifted -1 → 01-02, expanded 2 values → {01-02, 01-01}
    exp = sum(spark.read.parquet(f"{events_by_day}/{d}").count() for d in ["2024-01-01", "2024-01-02"])
    assert got == exp


def test_update_dependency_tree_reexecutes_descendants(spark, tmp_path, events_by_day):
    """execute(update_dependency_tree=True) re-runs consumers of the
    target (reference test_aws_application_execution_dependency_tree)."""
    app = make_app(spark, tmp_path, events_by_day, "deptree_app")
    daily = app.create_data(
        id="daily",
        inputs=[app["events"]],
        compute_targets=SparkSQL("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"),
    )
    runs = []
    app.create_data(
        id="downstream",
        inputs=[daily],
        compute_targets=SparkSQL("SELECT sum(n) AS total FROM daily"),
        on_failure=lambda *a: None,
    )
    app.execute(daily["2024-01-01"])
    # downstream not built yet by a plain parent execute
    assert app.poll(app["downstream"]["2024-01-01"]) == (None, None)
    app.execute(daily["2024-01-01"], update_dependency_tree=True)
    path, meta = app.poll(app["downstream"]["2024-01-01"])
    assert path is not None and meta["record_count"] == 1
    total = app.load_data(app["downstream"]["2024-01-01"]).collect()[0].total
    assert total == spark.read.parquet(f"{events_by_day}/2024-01-01").count()


def test_pending_node_ttl_expiration_hook(spark, tmp_path, events_by_day):
    """Pending trigger groups expire after the TTL and fire the
    expiration hook (reference Route.check_expired_nodes,
    routing_runtime_constructs.py:1446-1459)."""
    app = make_app(spark, tmp_path, events_by_day, "ttl_app")
    orders_dir = tmp_path / "other"
    (orders_dir / "2024-01-01").mkdir(parents=True)
    (orders_dir / "2024-01-01" / "_SUCCESS").touch()
    expired = []
    app.marshal_external_data(
        ParquetDataset(
            str(orders_dir) + "/{}",
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            integrity=IntegrityProtocol.SUCCESS_FILE,
        ),
        id="other",
    )
    app.create_data(
        id="joined",
        inputs=[app["events"], app["other"]],
        compute_targets=SparkSQL("SELECT 1 AS one"),
        pending_node_ttl_in_secs=0.2,
        on_pending_node_expiration=lambda n: expired.append(n),
    )
    routing = app.activate()
    # one input arrives; the trigger group waits for `other`
    app.process(app["events"]["2024-01-01"])
    assert sum(len(r.pending_nodes) for r in routing.routes.values()) == 1
    time.sleep(0.3)
    assert routing.check_expired() == 1
    assert len(expired) == 1 and "events" in expired[0].ready
    assert sum(len(r.pending_nodes) for r in routing.routes.values()) == 0


def test_full_range_processing_mode(spark, tmp_path, events_by_day):
    """FULL_RANGE explodes a ranged signal into one cycle per
    partition (reference application.py:1913-1946)."""
    app = make_app(spark, tmp_path, events_by_day, "fullrange_app")
    app.create_data(
        id="daily",
        inputs=[app["events"]],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    ranged = app["events"]["2024-01-01":"2024-01-03"]
    outs = app.process(ranged, processing_mode="FULL_RANGE")
    assert sorted(p.rsplit("/", 1)[-1] for p in outs) == ["2024-01-01", "2024-01-02", "2024-01-03"]
