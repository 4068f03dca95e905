"""Application state machine + dev-context mutation APIs:
pause/resume, terminate/delete, update_data/patch_data, validate,
execute_batch, get_active_routes (reference application.py:295-400,
1544-1744, 2888-2980, 3665-3809)."""

import os

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionType,
    InlinedCompute,
    ParquetDataset,
    SparkSQL,
)
from rheoceros_spark.application import ApplicationState


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


@pytest.fixture()
def events_day(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "events_by_day")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in ("2024-01-01", "2024-01-02"):
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


@pytest.fixture()
def app(spark, tmp_path, events_day):
    a = Application("state_app", str(tmp_path / "store"), spark)
    events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
    a.create_data(
        id="daily",
        inputs=[events],
        compute_targets=SparkSQL("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"),
    )
    return a


class TestPauseResume:
    def test_paused_drops_events(self, app):
        app.activate()
        assert app.state == ApplicationState.ACTIVE
        app.pause()
        assert app.state == ApplicationState.PAUSED
        assert app.process(app["events"]["2024-01-01"]) == []
        assert app.receive_raw("whatever/2024-01-01/_SUCCESS") == []
        app.resume()
        assert app.state == ApplicationState.ACTIVE
        assert len(app.process(app["events"]["2024-01-01"])) == 1

    def test_pause_requires_active(self, app):
        app.pause()  # INACTIVE: warning, no state change
        assert app.state == ApplicationState.INACTIVE
        app.resume()  # not paused: warning, no state change
        assert app.state == ApplicationState.INACTIVE


class TestTerminateDelete:
    def test_terminate_keeps_data_and_is_reactivatable(self, app):
        out = app.process(app["events"]["2024-01-01"])
        assert out
        app.terminate()
        assert app.state == ApplicationState.INACTIVE
        assert app._routing is None and not app._records
        assert os.path.exists(out[0])  # data survives termination
        # same dev context re-activates and keeps working
        assert len(app.process(app["events"]["2024-01-02"])) == 1

    def test_terminate_idempotent(self, app):
        app.terminate()
        app.terminate()
        assert app.state == ApplicationState.INACTIVE

    def test_delete_requires_inactive_and_blocks_use(self, app):
        app.process(app["events"]["2024-01-01"])
        with pytest.raises(RuntimeError, match="INACTIVE"):
            app.delete()
        app.terminate()
        app.delete()
        assert app.state == ApplicationState.DELETED
        assert not os.path.exists(app.storage_root)
        with pytest.raises(RuntimeError, match="deleted"):
            app.process(app["events"]["2024-01-02"])
        with pytest.raises(RuntimeError, match="deleted"):
            app.create_data(id="x", inputs=[app["events"]], compute_targets=SparkSQL("SELECT 1"))


class TestUpdatePatch:
    def test_update_data_replaces_compute(self, app):
        app.update_data(
            "daily",
            inputs=[app["events"]],
            compute_targets=SparkSQL("SELECT count(*) AS total FROM events"),
        )
        out = app.process(app["events"]["2024-01-01"])
        df = app.load_data(app["daily"]["2024-01-01"])
        assert df.columns == ["total"]
        assert out

    def test_update_unknown_node_raises(self, app):
        with pytest.raises(ValueError, match="use create_data"):
            app.update_data("nope", inputs=[app["events"]], compute_targets=SparkSQL("SELECT 1"))

    def test_patch_data_keeps_unspecified_args(self, app):
        # patch only the compute; inputs/links are retained
        app.patch_data(
            "daily",
            compute_targets=SparkSQL("SELECT max(value) AS mx FROM events"),
        )
        app.process(app["events"]["2024-01-01"])
        assert app.load_data(app["daily"]["2024-01-01"]).columns == ["mx"]

    def test_patch_unknown_kwarg_raises(self, app):
        with pytest.raises(TypeError, match="unknown create_data"):
            app.patch_data("daily", bogus_arg=1)


class TestValidate:
    def test_clean_graph_validates(self, app):
        assert app.validate() == []

    def test_unlinked_output_dimension_reported(self, spark, tmp_path, events_day):
        a = Application("bad_app", str(tmp_path / "store2"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
        a.create_data(
            id="bad",
            inputs=[events],
            compute_targets=SparkSQL("SELECT 1 AS one FROM events"),
            output_dimension_spec={"region": {"type": "STRING"}},  # never linked
        )
        issues = a.validate()
        assert any("region" in i and "no link" in i for i in issues)


class TestExecuteBatch:
    def test_batch_executes_all(self, app):
        paths = app.execute_batch(
            [app["daily"]["2024-01-01"], app["daily"]["2024-01-02"]]
        )
        assert len(paths) == 2
        for p in paths:
            assert os.path.exists(p)

    def test_batch_surfaces_failures(self, spark, tmp_path, events_day):
        a = Application("batch_fail", str(tmp_path / "store3"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")

        def boom(ctx):
            raise RuntimeError("slot exploded")

        a.create_data(id="bad", inputs=[events], compute_targets=InlinedCompute(boom))
        with pytest.raises(RuntimeError, match="execute_batch failures"):
            a.execute_batch([a["bad"]["2024-01-01"]])


class TestActiveRoutes:
    def test_route_introspection(self, app):
        assert app.get_active_routes() == []  # not activated yet
        app.activate()
        routes = app.get_active_routes()
        assert [r["node_id"] for r in routes] == ["daily"]
        assert routes[0]["pending_nodes"] == 0 and routes[0]["active_records"] == 0


class TestGround:
    def test_ground_executes_dangling_node(self, spark, tmp_path):
        a = Application("ground_app", str(tmp_path / "gstore"), spark)
        a.create_data(
            id="standalone",
            inputs=[],
            compute_targets=SparkSQL("SELECT 1 AS one"),
            output_dimension_spec={"day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
        )
        assert a.validate() == []  # no-input node needs no output links
        out = a.ground(a["standalone"]["2024-01-01"])
        assert len(out) == 1
        path, _ = a.poll(a["standalone"]["2024-01-01"], wait=True)
        assert path is not None and os.path.exists(path)

    def test_ground_noop_on_dependent_node(self, app):
        # 'daily' has an input dependency → ground is a NOOP per the
        # reference contract
        assert app.ground(app["daily"]["2024-01-01"]) == []


class TestRouteMetrics:
    def test_counters_track_events_and_completions(self, app):
        app.activate()
        assert app.get_route_metrics("daily") == {
            "daily": {"events": 0, "triggers": 0, "completions": 0, "failures": 0}
        }
        app.process(app["events"]["2024-01-01"])
        m = app.get_route_metrics()["daily"]
        assert m["events"] == 1 and m["triggers"] == 1
        assert m["completions"] == 1 and m["failures"] == 0

    def test_failure_counted(self, spark, tmp_path, events_day):
        a = Application("metrics_fail", str(tmp_path / "mstore"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")

        def boom(ctx):
            raise RuntimeError("nope")

        a.create_data(id="bad", inputs=[events], compute_targets=InlinedCompute(boom))
        with pytest.raises(Exception):
            a.process(a["events"]["2024-01-01"])
        m = a.get_route_metrics("bad")["bad"]
        assert m["failures"] == 1 and m["completions"] == 0


class TestDevStatePersistence:
    def test_save_load_roundtrip(self, spark, tmp_path, events_day):
        store = str(tmp_path / "pstore")
        a = Application("persist_app", store, spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
        a.create_data(
            id="daily",
            inputs=[events],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
        )
        a.save_dev_state()

        b = Application.attach("persist_app", store, spark)
        assert b.list_data() and "daily" in b.list_data()
        out = b.process(b["events"]["2024-01-01"])
        assert len(out) == 1
        assert b.load_data(b["daily"]["2024-01-01"]).collect()[0]["n"] > 0

    def test_attach_without_state_is_empty(self, spark, tmp_path):
        b = Application.attach("fresh_app", str(tmp_path / "empty"), spark)
        assert b.load_dev_state() is False
        assert b._nodes == {}

    def test_lambda_slot_raises_on_save(self, spark, tmp_path, events_day):
        a = Application("lambda_app", str(tmp_path / "lstore"), spark)
        events = a.marshal_external_data(ParquetDataset(events_day + "/{}", day_dim()), id="events")
        a.create_data(
            id="n", inputs=[events], compute_targets=InlinedCompute(lambda ctx: None)
        )
        with pytest.raises(Exception):
            a.save_dev_state()


class TestReferentialIntegrity:
    """Ported: reference test_aws_application_create_and_query.py:693-734
    (test_application_update_data_referential_integrity_error) — a
    spec-changing node update with live dependents is refused by
    default; forcing it leaves a topology activate() rejects until
    every dependent is re-patched with the fresh reference."""

    def _build(self, spark, tmp_path):
        a = Application("ref_integrity", str(tmp_path / "ristore"), spark)
        root = a.create_data(
            id="root",
            inputs=[],
            compute_targets=SparkSQL("SELECT 1 AS one"),
            output_dimension_spec={"dim": {"type": "STRING"}},
        )
        a.create_data(
            id="child1",
            inputs={"root_alias1": root, "root_alias2": root.as_reference()},
            compute_targets=SparkSQL("SELECT 1 AS one"),
        )
        a.create_data(id="child2", inputs=[root], compute_targets=SparkSQL("SELECT 1 AS one"))
        return a

    def test_spec_change_with_dependents_refused_by_default(self, spark, tmp_path):
        a = self._build(spark, tmp_path)
        with pytest.raises(ValueError, match="child1.*child2|consume it"):
            a.patch_data("root", output_dimension_spec={"dim_new": {"type": "STRING"}})
        # refusal must leave the previous definition intact
        assert a["root"].dimension_names() == ["dim"]
        a.activate()  # still a consistent topology

    def test_forced_change_blocks_activate_until_repatch(self, spark, tmp_path):
        a = self._build(spark, tmp_path)
        root2 = a.patch_data(
            "root",
            output_dimension_spec={"dim_new": {"type": "STRING"}},
            enforce_referential_integrity=False,
        )
        assert root2.dimension_names() == ["dim_new"]
        # children still hold the old 'dim' reference → inconsistent
        with pytest.raises(TypeError, match="stale input references"):
            a.activate()
        a.patch_data(
            "child1",
            inputs={"root_alias1": root2, "root_alias2": root2.as_reference()},
        )
        with pytest.raises(TypeError, match="child2"):
            a.activate()  # child2 still stale
        a.patch_data("child2", inputs=[root2])
        a.activate()  # topology consistent again

    def test_same_spec_update_needs_no_force(self, spark, tmp_path):
        a = self._build(spark, tmp_path)
        # definition churn that keeps the signalling properties is fine
        a.patch_data("root", compute_targets=SparkSQL("SELECT 2 AS two"))
        a.activate()


def test_param_change_also_trips_referential_integrity(spark, tmp_path):
    """A DATETIME format change re-renders every partition path, so it
    must count as a signalling-property change (review fix: the
    signature now includes dimension params, not just name/type)."""
    a = Application("ref_params", str(tmp_path / "rpstore"), spark)
    root = a.create_data(
        id="root",
        inputs=[],
        compute_targets=SparkSQL("SELECT 1 AS one"),
        output_dimension_spec={"day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
    )
    a.create_data(id="child", inputs=[root], compute_targets=SparkSQL("SELECT 1 AS one"))
    with pytest.raises(ValueError, match="changes the output dimension spec"):
        a.patch_data(
            "root",
            output_dimension_spec={"day": {"type": "DATETIME", "format": "%Y%m%d"}},
        )
