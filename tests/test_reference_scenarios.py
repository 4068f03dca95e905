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


class TestBidirectionalOutputLinks:
    """Reference test_aws_application_output_parametrization.py:46-110
    (``test_application_output_bidirectional_nontrivial_linking``): a
    timer-driven node whose output ``cutoff_date`` is a NON-invertible
    lambda of the timer dim (−7 days), plus the explicit reverse link
    (+7 days) that makes execute-by-output possible."""

    def _build(self, spark, tmp_path):
        from datetime import timedelta

        from rheoceros_spark.compute import Spark

        app = Application("adv-output-link", storage_root=str(tmp_path / "store"), spark=spark)
        timer = app.add_timer("adex_timer", granularity="day", date_format="%Y-%m-%d")

        def compute(inputs, ctx):
            return spark.range(1).select(F.lit(1).alias("ok"))

        node = app.create_data(
            id="kickoff",
            inputs=[timer],
            output_dimension_spec={
                "region_id": {
                    "type": "LONG",
                    "marketplace_id": {
                        "type": "LONG",
                        "cutoff_date": {"type": "DATETIME", "format": "%Y-%m-%d"},
                    },
                }
            },
            output_dim_links=[
                ("region_id", 1),
                ("marketplace_id", 1),
                ("cutoff_date", "adex_timer", "time", lambda d: d - timedelta(days=7)),
                # reverse: timer time ← cutoff_date + 7 (execute-by-output)
                (("adex_timer", "time"), "cutoff_date", lambda d: d + timedelta(days=7)),
            ],
            compute_targets=[Spark(compute)],
        )
        return app, timer, node

    def _timer_value(self, app, node_id):
        recs = [r for r in app.compute_records(node_id) if r.materialized_inputs]
        assert recs, "no compute record captured materialized inputs"
        sig = recs[-1].materialized_inputs[0]
        assert sig.alias == "adex_timer"
        return str(sig.filter.tip()[0])[:10]

    def test_execute_by_output_back_derives_shifted_timer(self, spark, tmp_path):
        app, timer, node = self._build(spark, tmp_path)
        app.activate()
        app.execute(node[1][1]["2021-06-20"])
        # +7 auto-shift: output 2021-06-20 ← timer 2021-06-27
        assert self._timer_value(app, "kickoff") == "2021-06-27"

    def test_timer_event_materializes_minus_shifted_output(self, spark, tmp_path):
        app, timer, node = self._build(spark, tmp_path)
        app.activate()
        app.process(timer["2021-06-28"])
        # −7 auto-shift: timer 2021-06-28 → output partition 2021-06-21
        out = app.load_data(node[1][1]["2021-06-21"])
        assert out.count() == 1

    def test_validate_accepts_reverse_links(self, spark, tmp_path):
        app, timer, node = self._build(spark, tmp_path)
        assert app.validate() == []


class TestAdvancedDimensionLinking:
    """Reference test_aws_application_advanced_dimension_linking.py —
    N→1 input mapping (day+hour → hourly timestamp on a ref input) and
    the create-time "output linking pitfalls" validation."""

    def _datasets(self, spark, tmp_path):
        root1 = str(tmp_path / "d1")
        root2 = str(tmp_path / "d2")
        df = spark.range(3).select(F.col("id").alias("v"))
        df.write.mode("overwrite").parquet(f"{root1}/20211122/13")
        df.write.mode("overwrite").parquet(f"{root2}/2021-11-22 13:00:00")
        ds1 = ParquetDataset(
            root1 + "/{}/{}",
            Dimension("day", DimensionType.DATETIME, {"format": "%Y%m%d"}),
            Dimension("hour", DimensionType.LONG),
        )
        ds2 = ParquetDataset(
            root2 + "/{}",
            Dimension(
                "timestamp",
                DimensionType.DATETIME,
                {"format": "%Y-%m-%d %H:%M:%S", "granularity": "hour"},
            ),
        )
        return ds1, ds2

    def test_n_to_1_input_mapping_on_ref_input(self, spark, tmp_path):
        from datetime import timedelta

        from rheoceros_spark.compute import Spark

        ds1, ds2 = self._datasets(spark, tmp_path)
        app = Application("n-to-1", storage_root=str(tmp_path / "store"), spark=spark)
        e1 = app.marshal_external_data(ds1, id="external_data1")
        e2 = app.marshal_external_data(ds2, id="external_data2")

        def compute(inputs, ctx):
            # both inputs resolved: join-free smoke (ref input loads too)
            return inputs["external_data1"].limit(1)

        node = app.create_data(
            id="mapping_1",
            inputs=[e1, e2.ref],
            input_dim_links=[
                (
                    ("external_data2", "timestamp"),
                    lambda day, hour: day + timedelta(hours=int(hour)),
                    [("external_data1", "day"), ("external_data1", "hour")],
                )
            ],
            compute_targets=[Spark(compute)],
        )
        app.activate()
        # event on e1 (day=20211122, hour=13) must infer e2's hourly
        # partition '2021-11-22 13:00:00' for the ref input
        app.process(e1["20211122"][13])
        recs = [r for r in app.compute_records("mapping_1") if r.materialized_inputs]
        assert recs, "trigger did not execute"
        by_alias = {m.alias: m for m in recs[-1].materialized_inputs}
        ts = by_alias["external_data2"].filter.tip()[0]
        assert str(ts).startswith("2021-11-22 13")

    def test_output_linking_pitfalls_fail_at_create_time(self, spark, tmp_path):
        from rheoceros_spark.compute import Spark

        ds1, ds2 = self._datasets(spark, tmp_path)
        app = Application("out-links-err", storage_root=str(tmp_path / "store"), spark=spark)
        e1 = app.marshal_external_data(ds1, id="external_data1")

        def compute(inputs, ctx):
            return inputs["external_data1"].limit(1)

        # 1 - LHS must be an existing output dimension
        with pytest.raises(ValueError, match="not an output dimension"):
            app.create_data(
                id="case_1",
                inputs=[e1],
                output_dim_links=[("IS_NOT_AN_OUTPUT_DIMENSION", "external_data1", "day")],
                compute_targets=[Spark(compute)],
            )
        # 2 - rhs must name a declared input alias
        with pytest.raises(ValueError, match="unknown input alias"):
            app.create_data(
                id="case_2",
                inputs=[e1],
                output_dim_links=[("day", "no_such_input", "day")],
                compute_targets=[Spark(compute)],
            )
        # 3 - rhs dimension must exist on that input
        with pytest.raises(ValueError, match="has no dimension"):
            app.create_data(
                id="case_3",
                inputs=[e1],
                output_dim_links=[("day", "external_data1", "nope")],
                compute_targets=[Spark(compute)],
            )
        # failed creates must not leave half-registered nodes behind
        assert app.create_data(
            id="ok", inputs=[e1], compute_targets=[Spark(compute)]
        ) is not None


class TestDependentOnlyInputValidation:
    """Reference test_aws_application_advanced_input_modes.py:854 —
    nearest/ref inputs are dependent and never seed executions; a node
    with only dependent inputs is flagged by validate() (the engine
    keeps create_data permissive because such nodes remain runnable via
    execute()/ground(), unlike the reference's hard reject)."""

    def _app(self, spark, tmp_path):
        from rheoceros_spark.compute import Spark

        root = str(tmp_path / "d")
        spark.range(2).write.mode("overwrite").parquet(f"{root}/2024-01-01")
        ds = ParquetDataset(
            root + "/{}", Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
        )
        app = Application("dep-val", storage_root=str(tmp_path / "store"), spark=spark)
        e = app.marshal_external_data(ds, id="ev")
        fn = Spark(lambda inputs, ctx: inputs["ev"].limit(1))
        return app, e, fn

    def test_ref_only_and_nearest_only_flagged(self, spark, tmp_path):
        app, e, fn = self._app(spark, tmp_path)
        app.create_data(id="ref_only", inputs=[e.ref], compute_targets=[fn])
        app.create_data(id="nearest_only", inputs=[e[:-7].nearest()], compute_targets=[fn])
        issues = app.validate()
        assert any("ref_only" in i and "dependent" in i for i in issues)
        assert any("nearest_only" in i and "dependent" in i for i in issues)

    def test_mixed_with_independent_not_flagged(self, spark, tmp_path):
        app, e, fn = self._app(spark, tmp_path)
        app.create_data(id="mixed", inputs=[e, e[:-7].nearest().with_alias("near")],
                        compute_targets=[fn])
        assert app.validate() == []


class TestFailedDefinitionsLeaveNoTrace:
    """Companions to the create-time link validation: a rejected
    definition must leave NO state behind (create), and a rejected
    redefinition must RESTORE the previous working one (update/patch)."""

    def _app(self, spark, tmp_path):
        from rheoceros_spark.compute import Spark

        root = str(tmp_path / "d")
        spark.range(2).write.mode("overwrite").parquet(f"{root}/2024-01-01")
        ds = ParquetDataset(
            root + "/{}", Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
        )
        app = Application("no-trace", storage_root=str(tmp_path / "store"), spark=spark)
        e = app.marshal_external_data(ds, id="ev")
        fn = Spark(lambda inputs, ctx: inputs["ev"].limit(1))
        return app, e, fn

    def test_failed_create_leaves_no_node_args(self, spark, tmp_path):
        app, e, fn = self._app(spark, tmp_path)
        with pytest.raises(ValueError, match="not an output dimension"):
            app.create_data(id="bad", inputs=[e],
                            output_dim_links=[("typo", "ev", "day")],
                            compute_targets=[fn])
        # patch_data's existence gate must NOT see the failed definition
        with pytest.raises(ValueError, match="does not exist"):
            app.patch_data("bad", compute_targets=[fn])
        # and the id is reusable with a good definition
        assert app.create_data(id="bad", inputs=[e], compute_targets=[fn]) is not None

    def test_failed_patch_restores_previous_definition(self, spark, tmp_path):
        app, e, fn = self._app(spark, tmp_path)
        node = app.create_data(id="n", inputs=[e], compute_targets=[fn])
        with pytest.raises(ValueError, match="not an output dimension"):
            app.patch_data("n", output_dim_links=[("typo", "ev", "day")])
        # the original definition survives and still executes
        app.activate()
        app.execute(node["2024-01-01"])
        assert app.load_data(node["2024-01-01"]).count() == 1


class TestShiftedCrossTypeInputLinking:
    """Condensed from reference
    test_aws_application_external_data_linking.py:327-400: both link
    directions declared explicitly with non-invertible lambdas (±1 day)
    plus a cross-TYPE mapping lambda (long region id → string region
    code) on a ref input."""

    def test_event_derives_shifted_and_mapped_ref_partition(self, spark, tmp_path):
        from datetime import timedelta

        from rheoceros_spark.compute import Spark

        r1 = str(tmp_path / "driver_ds")
        r2 = str(tmp_path / "ref_ds")
        spark.range(2).write.mode("overwrite").parquet(f"{r1}/1/2024-01-02")
        spark.range(3).write.mode("overwrite").parquet(f"{r2}/NA/2024-01-01")
        driver_ds = ParquetDataset(
            r1 + "/{}/{}",
            Dimension("region_id", DimensionType.LONG),
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
        )
        ref_ds = ParquetDataset(
            r2 + "/{}/{}",
            Dimension("region", DimensionType.STRING),
            Dimension("dataset_date", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
        )
        app = Application("shift-map", storage_root=str(tmp_path / "store"), spark=spark)
        drv = app.marshal_external_data(driver_ds, id="drv")
        ref = app.marshal_external_data(ref_ds, id="refd")

        def compute(inputs, ctx):
            # the ref partition resolved by the links must actually load
            return inputs["refd"].agg(F.count(F.lit(1)).alias("n"))

        node = app.create_data(
            id="shifted",
            inputs=[drv, ref.ref],
            input_dim_links=[
                # both directions declared explicitly — neither lambda is
                # mechanically invertible
                (("refd", "dataset_date"), lambda d: d - timedelta(days=1), ("drv", "day")),
                (("drv", "day"), lambda d: d + timedelta(days=1), ("refd", "dataset_date")),
                # cross-type: long region id → string region code
                (
                    ("refd", "region"),
                    lambda rid: {1: "NA", 2: "EU", 3: "FE"}[rid],
                    ("drv", "region_id"),
                ),
            ],
            compute_targets=[Spark(compute)],
        )
        app.activate()
        app.process(drv[1]["2024-01-02"])
        recs = [r for r in app.compute_records("shifted") if r.materialized_inputs]
        assert recs, "event did not trigger"
        by_alias = {m.alias: m for m in recs[-1].materialized_inputs}
        tip = by_alias["refd"].filter.tip()
        assert tip[0] == "NA" and str(tip[1])[:10] == "2024-01-01"
        # and the compute actually read the 3-row ref partition
        out = app.load_data(node[1]["2024-01-02"])
        assert out.collect()[0].n == 3


class TestExecutionChainPropagation:
    """Ported: reference test_aws_application_execution_chain.py:27-140
    (test_application_signal_propagation) — an external event cascades
    through a multi-level internal chain; a tail node with one failing
    slot among two is marked failed, its partition unreadable via poll,
    while the mid-chain output stays green."""

    def test_three_level_cascade_with_failing_tail_slot(
        self, spark, tmp_path, events_by_day
    ):
        from rheoceros_spark import ComputeRecordState, InlinedCompute

        app = make_app(spark, tmp_path, events_by_day, "chain_app")
        ev = app["events"]
        a = app.create_data(
            id="lvl_a",
            inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        b = app.create_data(
            id="lvl_b",
            inputs=[a],
            compute_targets=SparkSQL("SELECT sum(n) AS total FROM lvl_a"),
        )
        # tail: one failing inlined slot + one good SQL slot — the
        # reference marks the whole execution failed (int("str") twin)
        tail = app.create_data(
            id="lvl_tail",
            inputs=[b],
            compute_targets=[
                InlinedCompute(lambda input_map, output, params: int("str")),
                SparkSQL("SELECT total FROM lvl_b"),
            ],
        )
        app.activate()

        assert app.poll(tail["2024-01-02"], wait=False) == (None, None)

        # synchronous-engine divergence from the async reference: the
        # cascade failure surfaces from process() itself (poll-time in
        # the reference); join state is requeued so a re-send would
        # re-trigger (test_routing_fixes re-send scenario)
        with pytest.raises(ValueError, match="invalid literal"):
            app.process(ev["2024-01-02"])

        # mid-chain green: data readable, value correct
        path_b, _ = app.poll(b["2024-01-02"])
        assert path_b is not None and path_b.endswith("lvl_b/2024-01-02")
        [row] = app.load_data(b["2024-01-02"]).collect()
        ev_count = (
            spark.read.parquet(events_by_day + "/2024-01-02").count()
        )
        assert row.total == ev_count

        # tail marked failed; poll hides any partial output
        assert app.poll(tail["2024-01-02"], wait=False) == (None, None)
        tail_recs = app.compute_records("lvl_tail")
        assert tail_recs and tail_recs[-1].state == ComputeRecordState.FAILED
        # whole-chain history: one execution per level
        assert len(app.compute_records("lvl_a")) == 1
        assert len(app.compute_records("lvl_b")) == 1
        # nothing in flight; the failed tail trigger group is requeued
        # (re-send re-triggers), mid-chain groups fully consumed
        rows = {r["node_id"]: r for r in app.get_active_routes()}
        assert all(r["active_records"] == 0 for r in rows.values())
        assert rows["lvl_tail"]["pending_nodes"] == 1
        assert rows["lvl_a"]["pending_nodes"] == 0
        assert rows["lvl_b"]["pending_nodes"] == 0


class TestRangeCheckViaEventIngestion:
    """Ported: reference advanced_input_modes
    test_application_range_check_succeeds_via_event_ingestion (+ the
    reverse-order variant, :366-520) — a range-checked trigger group
    completes as later events prove the missing partitions, with the
    events themselves counting as completion notifications (no storage
    probe can see the partitions here: their _SUCCESS markers are
    deliberately stripped), and a second ranged layer fires off the
    cascaded internal outputs."""

    DAYS = ["2024-01-01", "2024-01-02", "2024-01-03"]

    @pytest.fixture()
    def unmarked_events(self, spark, sf_dir, tmp_path):
        import os

        from rheoceros_spark.sources.io import normalize_ns_timestamps

        root = str(tmp_path / "ev_unmarked")
        ev = normalize_ns_timestamps(
            spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
        )
        for day in self.DAYS:
            ev.where(F.to_date("ts") == day).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{root}/{day}")
            os.remove(f"{root}/{day}/_SUCCESS")  # probe must NOT succeed
        return root

    def test_reverse_order_events_complete_range_and_cascade(
        self, spark, tmp_path, unmarked_events
    ):
        app = Application("range_ingest", str(tmp_path / "store"), spark)
        events = app.marshal_external_data(
            ParquetDataset(
                unmarked_events + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
                integrity=IntegrityProtocol.SUCCESS_FILE,
            ),
            id="events",
        )
        a = app.create_data(
            id="lvl_a",
            inputs=[events[:-2].range_check(True)],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
        )
        b = app.create_data(
            id="lvl_b",
            inputs=[a[:-2].range_check(True)],
            compute_targets=SparkSQL("SELECT CAST(sum(n) AS BIGINT) AS total FROM lvl_a"),
        )
        app.activate()

        # tip first: range [01-01, 01-02] unproven → pending, no output
        app.process(events["2024-01-02"])
        assert app.poll(a["2024-01-02"], wait=False) == (None, None)

        # REVERSE order: the older partition's event completes the range
        # (the storage probe alone could never — no _SUCCESS anywhere)
        app.process(events["2024-01-01"])
        path_a, _ = app.poll(a["2024-01-02"])
        assert path_a and path_a.endswith("lvl_a/2024-01-02")

        # next tip completes instantly off the event-derived cache, and
        # the cascaded internal outputs complete the second layer's range
        app.process(events["2024-01-03"])
        path_a3, _ = app.poll(a["2024-01-03"])
        assert path_a3 is not None
        path_b, _ = app.poll(b["2024-01-03"])
        assert path_b and path_b.endswith("lvl_b/2024-01-03")
        [row] = app.load_data(b["2024-01-03"]).collect()
        n2 = spark.read.parquet(unmarked_events + "/2024-01-02").count()
        n3 = spark.read.parquet(unmarked_events + "/2024-01-03").count()
        assert row.total == (n2 + n3) + (n2 + spark.read.parquet(unmarked_events + "/2024-01-01").count())


class TestEnforceAliasForSameInput:
    """Ported: reference advanced_input_modes
    test_application_enforce_alias_for_same_input (:954-976) — the same
    signal twice in list form collides on alias and is refused; dict
    form with distinct aliases is the supported spelling."""

    def test_list_form_duplicate_rejected_dict_form_accepted(
        self, spark, tmp_path, events_by_day
    ):
        app = make_app(spark, tmp_path, events_by_day, "alias_app")
        ev = app["events"]
        with pytest.raises(ValueError, match="duplicate input alias"):
            app.create_data(
                id="dup",
                inputs=[ev["*"], ev[:-7]],
                compute_targets=SparkSQL("SELECT 1 AS one"),
            )
        node = app.create_data(
            id="dup",
            inputs={"event_day": ev["*"], "last_week": ev[:-7]},
            compute_targets=SparkSQL(
                "SELECT count(*) AS n FROM event_day UNION ALL "
                "SELECT count(*) AS n FROM last_week"
            ),
        )
        assert node is not None


class TestExecuteWithMaterialInputs:
    """Ported: reference execution_control
    test_application_execute_with_material_inputs (+ validations,
    :684-903) — the user supplies explicit input views; they are
    validated against the link matrix (an input tuple that could never
    trigger the target partition is refused) and used verbatim for the
    load, with unsupplied inputs back-derived."""

    def _app(self, spark, tmp_path, events_by_day):
        app = make_app(spark, tmp_path, events_by_day, "matinputs_app")
        ev = app["events"]
        node = app.create_data(
            id="daily",
            inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        return app, node

    def test_explicit_material_input_used_verbatim(self, spark, tmp_path, events_by_day):
        app, node = self._app(spark, tmp_path, events_by_day)
        ev = app["events"]
        path = app.execute(node["2024-01-02"], material_inputs=[ev["2024-01-02"]])
        assert path.endswith("daily/2024-01-02")
        got = {(r.event_type, r.n) for r in app.load_data(node["2024-01-02"]).collect()}
        exp = {
            (r.event_type, r.n)
            for r in spark.read.parquet(events_by_day + "/2024-01-02")
            .groupBy("event_type").count().withColumnRenamed("count", "n").collect()
        }
        assert got == exp

    def test_infeasible_material_input_refused(self, spark, tmp_path, events_by_day):
        app, node = self._app(spark, tmp_path, events_by_day)
        ev = app["events"]
        # day 01-03's event can never trigger the 01-02 output partition
        with pytest.raises(ValueError, match="could never trigger"):
            app.execute(node["2024-01-02"], material_inputs=[ev["2024-01-03"]])

    def test_unknown_and_non_material_inputs_refused(self, spark, tmp_path, events_by_day):
        app, node = self._app(spark, tmp_path, events_by_day)
        ev = app["events"]
        stranger = app.marshal_external_data(
            ParquetDataset(
                events_by_day + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            ),
            id="stranger",
        )
        with pytest.raises(ValueError, match="does not match exactly one"):
            app.execute(node["2024-01-02"], material_inputs=[stranger["2024-01-02"]])
        with pytest.raises(ValueError, match="not material"):
            app.execute(node["2024-01-02"], material_inputs=[ev["*"]])


class TestRecursiveRangedBackfill:
    """Ported: reference test_aws_application_execution_recursive.py:160-233
    (…_ranged / …_ranged_no_wait) — recursive execution over a child
    whose input is a trailing RANGE of the parent must backfill ONLY the
    missing historical partitions: the already-materialized TIP sees no
    redundant execution, the gap partitions each get exactly one, and no
    active records are left over."""

    def test_ready_tip_not_reexecuted_gaps_backfilled(
        self, spark, tmp_path, events_by_day
    ):
        from rheoceros_spark import ComputeRecordState, SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "recur_ranged_app")
        ev = app["events"]
        daily = app.create_data(
            id="daily",
            inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        # make the TIP ready up front (reference: app.execute(a[today]))
        app.execute(daily["2024-01-03"])
        assert len(app.compute_records("daily")) == 1

        agg = app.create_data(
            id="agg3",
            inputs=[daily[:-3]],
            compute_targets=SparkSQL(
                "SELECT event_type, sum(n) AS n FROM daily GROUP BY event_type"
            ),
        )
        app.execute(agg["2024-01-03"], recursive=True)

        # reference API names resolve the same history
        assert app.get_inactive_compute_records("daily") == app.compute_records("daily")
        assert app.get_active_compute_records() == []
        recs = app.compute_records("daily")
        by_day = {}
        for r in recs:
            by_day.setdefault(str(r.out_values["day"])[:10], []).append(r)
        # TIP executed exactly once (the manual run) — no redundant run
        assert len(by_day["2024-01-03"]) == 1, "redundant execution on ready TIP"
        # each gap partition backfilled exactly once
        assert len(by_day["2024-01-01"]) == 1 and len(by_day["2024-01-02"]) == 1
        assert all(
            r.state == ComputeRecordState.COMPLETED for rs in by_day.values() for r in rs
        )
        # nothing left in flight (reference: no left-over active records)
        assert not app.compute_records(state=ComputeRecordState.PROCESSING)
        assert app.poll(daily["2024-01-02"], wait=False)[0] is not None

    def test_second_recursive_run_is_all_skips(self, spark, tmp_path, events_by_day):
        from rheoceros_spark import SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "recur_ranged_app2")
        ev = app["events"]
        daily = app.create_data(
            id="daily",
            inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        agg = app.create_data(
            id="agg3",
            inputs=[daily[:-3]],
            compute_targets=SparkSQL(
                "SELECT event_type, sum(n) AS n FROM daily GROUP BY event_type"
            ),
        )
        app.execute(agg["2024-01-03"], recursive=True)
        n_before = len(app.compute_records("daily"))
        assert n_before == 3
        # everything materialized: a second recursive run must not
        # re-execute any ancestor partition
        app.execute(agg["2024-01-03"], recursive=True)
        assert len(app.compute_records("daily")) == n_before


class TestDependencyTreeDiamond:
    """Ported: reference test_aws_application_execution_dependency_tree.py:707+
    (diamond hierarchy) — executing the apex with
    ``update_dependency_tree=True`` must propagate level by level: the
    join node at the bottom of a diamond runs ONCE, after BOTH parents,
    and reads their fresh partitions.  (This caught two real bugs: the
    flat walk derived every descendant from the ROOT's alias — silently
    skipping any node that doesn't input the root directly — and the
    DFS order ran the join node before its second parent.)"""

    def test_diamond_propagates_once_after_both_parents(
        self, spark, tmp_path, events_by_day
    ):
        from rheoceros_spark import ComputeRecordState, SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "diamond_app")
        ev = app["events"]
        a = app.create_data(
            id="A", inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        b = app.create_data(
            id="B", inputs=[a],
            compute_targets=SparkSQL("SELECT event_type, n * 2 AS n2 FROM A"),
        )
        c = app.create_data(
            id="C", inputs=[a],
            compute_targets=SparkSQL("SELECT event_type, n * 3 AS n3 FROM A"),
        )
        d = app.create_data(
            id="D", inputs=[b, c],
            compute_targets=SparkSQL(
                "SELECT B.event_type, n2 + n3 AS t FROM B JOIN C USING (event_type)"
            ),
        )
        app.execute(a["2024-01-01"], update_dependency_tree=True)

        recs = app.compute_records()
        order = [r.node_id for r in recs]
        assert order.count("D") == 1, "diamond join node must run exactly once"
        assert order.index("D") > order.index("B") and order.index("D") > order.index("C")
        assert all(r.state == ComputeRecordState.COMPLETED for r in recs)
        # D read FRESH parents: n2 + n3 == 5 * n for every type
        base = {r.event_type: r.n for r in app.load_data(a["2024-01-01"]).collect()}
        got = {r.event_type: r.t for r in app.load_data(d["2024-01-01"]).collect()}
        assert got == {k: 5 * v for k, v in base.items()}

    def test_grandchild_chain_propagates(self, spark, tmp_path, events_by_day):
        from rheoceros_spark import SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "chain3_app")
        ev = app["events"]
        a = app.create_data(
            id="A", inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        b = app.create_data(
            id="B", inputs=[a],
            compute_targets=SparkSQL("SELECT event_type, n * 2 AS n2 FROM A"),
        )
        c = app.create_data(
            id="C", inputs=[b],
            compute_targets=SparkSQL("SELECT sum(n2) AS total FROM B"),
        )
        app.execute(a["2024-01-02"], update_dependency_tree=True)
        assert [r.node_id for r in app.compute_records()] == ["A", "B", "C"]
        assert app.load_data(c["2024-01-02"]).collect()[0].total > 0


class TestDependencyTreeRangedSameInput:
    """Ported: reference test_aws_application_execution_dependency_tree.py:589-700
    (ranged access, same input) — a child consuming the SAME parent
    under two aliases (today + a trailing range) must re-execute exactly
    ONCE per dtree propagation, for the tip-linked partition; renamed
    aliases must not hide the edge from the descendant walk."""

    def test_renamed_alias_and_range_no_redundant_runs(
        self, spark, tmp_path, events_by_day
    ):
        from rheoceros_spark import SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "dtree_ranged_app")
        ev = app["events"]
        b = app.create_data(
            id="B", inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        # backfill B so the trailing range resolves during propagation
        for day in ("2024-01-01", "2024-01-02"):
            app.execute(b[day])
        c = app.create_data(
            id="C",
            inputs={"b_today": b, "b_last2": b[:-2]},
            compute_targets=SparkSQL(
                "SELECT bt.event_type, bt.n AS today_n, sum(bl.n) AS range_n "
                "FROM b_today bt JOIN b_last2 bl USING (event_type) "
                "GROUP BY bt.event_type, bt.n"
            ),
        )
        # dtree propagation from B's tip: C must be discovered through
        # the renamed aliases and run exactly once, for 2024-01-02
        app.execute(b["2024-01-02"], update_dependency_tree=True)
        c_recs = app.compute_records("C")
        assert len(c_recs) == 1, f"expected exactly one C run, got {len(c_recs)}"
        assert str(c_recs[0].out_values["day"])[:10] == "2024-01-02"
        out = {r.event_type: (r.today_n, r.range_n)
               for r in app.load_data(c["2024-01-02"]).collect()}
        assert out and all(rn >= tn for tn, rn in out.values())


def test_dtree_renamed_alias_one_level_deep(spark, tmp_path, events_by_day):
    """Kahn decrement regression: a descendant consumed ONLY under a
    renamed alias one level below the propagation root must still reach
    in-degree 0 and execute (the in-degree was counted through the
    producer's resource_id but decremented through aliases only — the
    node deadlocked and was silently dropped)."""
    from rheoceros_spark import SparkSQL

    app = make_app(spark, tmp_path, events_by_day, "deep_alias_app")
    ev = app["events"]
    a = app.create_data(
        id="A", inputs=[ev],
        compute_targets=SparkSQL(
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
    )
    b = app.create_data(
        id="B", inputs=[a],
        compute_targets=SparkSQL("SELECT event_type, n * 2 AS n2 FROM A"),
    )
    c = app.create_data(
        id="C", inputs={"b_renamed": b},
        compute_targets=SparkSQL("SELECT sum(n2) AS total FROM b_renamed"),
    )
    app.execute(a["2024-01-01"], update_dependency_tree=True)
    assert [r.node_id for r in app.compute_records()] == ["A", "B", "C"]
    assert app.load_data(c["2024-01-01"]).collect()[0].total > 0


class TestDependencyTreeUpdatesPastExecutions:
    """Ported: reference test_aws_application_execution_dependency_tree.py:429-585
    (two childs, update past executions) — C consumes a trailing RANGE
    of B, and had successful past executions; re-executing one covered
    B partition with ``update_dependency_tree=True`` must refresh EVERY
    past C partition whose recorded inputs contained it — and nothing
    else."""

    def test_ranged_consumer_past_partitions_refresh(
        self, spark, tmp_path, events_by_day
    ):
        from rheoceros_spark import SparkSQL

        app = make_app(spark, tmp_path, events_by_day, "dtree_past_app")
        ev = app["events"]
        b = app.create_data(
            id="B", inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            ),
        )
        for day in DAYS[:3]:  # 3 days of B
            app.execute(b[day])
        c = app.create_data(
            id="C", inputs=[b[:-2]],  # trailing 2-day window
            compute_targets=SparkSQL(
                "SELECT event_type, sum(n) AS n2 FROM B GROUP BY event_type"
            ),
        )
        # two past C executions, both covering B["2024-01-02"]:
        # C[01-02] reads B[01-01..01-02]; C[01-03] reads B[01-02..01-03]
        app.execute(c["2024-01-02"])
        app.execute(c["2024-01-03"])
        n_c = len(app.compute_records("C"))
        assert n_c == 2

        # refresh the shared B partition
        app.execute(b["2024-01-02"], update_dependency_tree=True)

        c_recs = app.compute_records("C")
        days = sorted(str(r.out_values["day"])[:10] for r in c_recs)
        # both past partitions re-ran exactly once each (2 old + 2 new);
        # the forward tip link also maps C[01-02], deduped with the scan
        assert days == ["2024-01-02", "2024-01-02", "2024-01-03", "2024-01-03"], days
        assert len(app.compute_records("B")) == 3 + 1  # only B[01-02] re-ran

        # a B partition outside every recorded window refreshes nothing
        # beyond its own tip-linked C partition: B[01-01] is inside
        # C[01-02]'s recorded window, so C[01-02] refreshes again, but
        # C[01-03] (window 01-02..01-03) must NOT
        before = len([d for d in (str(r.out_values["day"])[:10] for r in app.compute_records("C")) if d == "2024-01-03"])
        app.execute(b["2024-01-01"], update_dependency_tree=True)
        after = len([d for d in (str(r.out_values["day"])[:10] for r in app.compute_records("C")) if d == "2024-01-03"])
        assert after == before, "C[2024-01-03] must not refresh for B[2024-01-01]"


def test_dtree_scan_end_bounds_past_refresh(spark, tmp_path, events_by_day):
    """Ported: the reference's ``dependency_tree_scan_end`` bounds the
    past-execution search interval — a scan end BEFORE the past
    executions completed excludes them (only the forward tip-linked
    partition refreshes)."""
    from datetime import datetime, timedelta

    from rheoceros_spark import SparkSQL

    app = make_app(spark, tmp_path, events_by_day, "dtree_scanend_app")
    ev = app["events"]
    b = app.create_data(
        id="B", inputs=[ev],
        compute_targets=SparkSQL(
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
    )
    for day in DAYS[:3]:
        app.execute(b[day])
    c = app.create_data(
        id="C", inputs=[b[:-2]],
        compute_targets=SparkSQL(
            "SELECT event_type, sum(n) AS n2 FROM B GROUP BY event_type"
        ),
    )
    app.execute(c["2024-01-02"])
    app.execute(c["2024-01-03"])

    # scan interval ends long before those C executions completed →
    # C[2024-01-03] (reachable only through the record scan) must NOT
    # refresh; C[2024-01-02] still does via the forward tip link
    app.execute(
        b["2024-01-02"],
        update_dependency_tree=True,
        # a plain day string is accepted like everywhere else in the API
        dependency_tree_scan_end="2024-01-01",
    )
    days = sorted(str(r.out_values["day"])[:10] for r in app.compute_records("C"))
    assert days == ["2024-01-02", "2024-01-02", "2024-01-03"], days
    # a garbage scan bound fails BEFORE anything runs
    import pytest as _pytest
    n_before = len(app.compute_records())
    with _pytest.raises(TypeError, match="dependency_tree_scan_end"):
        app.execute(b["2024-01-02"], update_dependency_tree=True,
                    dependency_tree_scan_end=object())
    assert len(app.compute_records()) == n_before

    # completed_at is stamped on terminal records (the scan key)
    assert all(
        r.completed_at is not None for r in app.compute_records()
    ), "terminal records must carry completed_at"
