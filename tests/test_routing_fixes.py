"""Regressions for the round-5 core-review fixes: multi-alias event
delivery (self-joins), trigger-state retention across compute failures,
retention-sweep cache invalidation, multi-rhs link compensation, catalog
partition probes, and scheme-consistent content IO."""

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


class TestSelfJoinAliases:
    def test_same_upstream_under_two_aliases_triggers(self, spark, tmp_path, events_day):
        """dict-inputs self-join: one upstream consumed twice under two
        aliases — ONE event must reach both aliases or the trigger
        group never completes."""
        a = Application("self_join", str(tmp_path / "store"), spark)
        events = a.marshal_external_data(
            ParquetDataset(events_day + "/{}", day_dim()), id="events"
        )
        a.create_data(
            id="joined",
            inputs={"today": events, "again": events},
            compute_targets=SparkSQL(
                "SELECT t.event_type, count(*) AS n FROM today t "
                "JOIN again g ON t.event_id = g.event_id GROUP BY t.event_type"
            ),
        )
        a.activate()
        outputs = a.process(a["events"]["2024-01-01"])
        assert outputs, "self-join route never triggered"
        assert a.load_data(a["joined"]["2024-01-01"]).count() > 0


class TestFailureKeepsTriggerState:
    def test_resent_event_retriggers_after_compute_failure(self, spark, tmp_path, events_day):
        """A compute failure must not destroy the consumed trigger
        group: re-sending the same event re-offers idempotently and
        re-executes (previously the ready node was dropped and the
        re-send seeded a new group that could never complete)."""
        calls = {"n": 0}

        def flaky(input_map, output, params):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("synthetic first failure")

        a = Application("retrigger", str(tmp_path / "store"), spark)
        events = a.marshal_external_data(
            ParquetDataset(events_day + "/{}", day_dim()), id="events"
        )
        a.create_data(
            id="out",
            inputs=[events],
            compute_targets=[
                InlinedCompute(flaky),
                SparkSQL("SELECT count(*) AS n FROM events"),
            ],
        )
        a.activate()
        with pytest.raises(RuntimeError, match="synthetic"):
            a.process(a["events"]["2024-01-01"])
        # trigger state survived the failure
        route = a._routing.routes["out"]
        assert route.pending_nodes, "failed trigger group was dropped"
        outputs = a.process(a["events"]["2024-01-01"])
        assert outputs and calls["n"] == 2
        m = a.get_route_metrics("out")["out"]
        assert m["failures"] == 1 and m["completions"] == 1


class TestRetentionInvalidatesRoutingCache:
    def test_swept_paths_leave_completed_cache(self, spark, tmp_path, events_day):
        from datetime import datetime

        from rheoceros_spark.application import RouteRetention

        a = Application("sweep_cache", str(tmp_path / "store"), spark)
        events = a.marshal_external_data(
            ParquetDataset(events_day + "/{}", day_dim()), id="events"
        )
        a.create_data(
            id="daily",
            inputs=[events],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
        )
        a.activate()
        p = a.execute(a["daily"]["2024-01-01"])
        a._routing.completed_paths.add(p)
        a._nodes["daily"].output_retention = RouteRetention(
            condition=lambda dims: dims["day"] >= datetime(2024, 1, 2)
        )
        assert a.apply_retention() == {"daily": [p]}
        assert p not in a._routing.completed_paths


class TestCompensateMultiRhs:
    def test_declared_multi_rhs_link_suppresses_auto_equality(self):
        from rheoceros_spark.signals import Signal, SignalDimensionLink, SignalLinkNode
        from rheoceros_spark.dimensions import DimensionSpec

        spec_a = DimensionSpec([Dimension("day", DimensionType.STRING)])
        spec_b = DimensionSpec(
            [Dimension("day", DimensionType.STRING), Dimension("hour", DimensionType.LONG)]
        )
        a = Signal("a", None, spec_a)
        b = Signal("b", None, spec_b)
        node = SignalLinkNode([a, b])
        node.add_link(
            SignalDimensionLink(
                ("a", "day"),
                lambda d, h: f"{d}T{h:02d}",
                [("b", "day"), ("b", "hour")],
            )
        )
        node.compensate_missing_links()
        autos = [
            l for l in node.links
            if l.lhs == ("a", "day") and list(l.rhs) == [("b", "day")]
        ]
        assert not autos, "contradictory auto a.day == b.day was added"


class TestCatalogPartitionProbe:
    def test_partition_ready_probes_catalog_not_filesystem(self, spark, tmp_path):
        from rheoceros_spark.sources.datasets import GlueTable
        from rheoceros_spark.sources.io import partition_ready

        (
            spark.createDataFrame([("NA", 1), ("NA", 2), ("EU", 1)], "region string, v int")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "probe_tbl"))
            .saveAsTable("probe_tbl")
        )
        try:
            desc = GlueTable("default", "probe_tbl", Dimension("region", DimensionType.STRING))
            assert partition_ready(spark, desc, "catalog://default/probe_tbl/NA")
            assert not partition_ready(spark, desc, "catalog://default/probe_tbl/XX")
        finally:
            spark.sql("DROP TABLE IF EXISTS probe_tbl")

    def test_nearest_catalog_picks_first_branch_with_data(self, spark, tmp_path):
        from rheoceros_spark.signals import Signal
        from rheoceros_spark.sources.datasets import GlueTable
        from rheoceros_spark.sources.io import load_signal
        from rheoceros_spark.dimensions import DimensionFilter

        (
            spark.createDataFrame([(20240101, 5)], "day bigint, v int")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "near_tbl"))
            .saveAsTable("near_tbl")
        )
        try:
            desc = GlueTable("default", "near_tbl", Dimension("day", DimensionType.LONG))
            sig = Signal("near", desc, desc.spec)
            # declared range: 20240103 (absent) then 20240101 (present)
            sig.filter = DimensionFilter.load_raw(desc.spec, [[20240103, 20240101]])
            sig.nearest_in_range = True
            rows = load_signal(spark, sig).collect()
            assert [(r.day, r.v) for r in rows] == [(20240101, 5)]
        finally:
            spark.sql("DROP TABLE IF EXISTS near_tbl")


class TestSchemeConsistentContentIO:
    def test_file_scheme_round_trip(self, spark, tmp_path):
        from rheoceros_spark.sources.io import load_content, save_content

        target = f"file:{tmp_path}/artifacts/model.bin"
        save_content(spark, {"weights": [1, 2, 3]}, target)
        # written where the scheme says, not into a literal ./file: dir
        assert os.path.exists(f"{tmp_path}/artifacts/model.bin")
        assert not os.path.exists("file:")
        assert load_content(spark, target) == {"weights": [1, 2, 3]}


class TestPartFileEventsDoNotProveCompletion:
    """Review fix: a part-file object-created event on a dataset with a
    declared completion protocol proves data is ARRIVING, not that the
    partition completed — only the marker event may seed the
    completed-range cache (half-written partitions must keep blocking
    range checks)."""

    def test_part_event_blocks_marker_event_completes(self, spark, tmp_path, events_day):
        import os
        import shutil

        from rheoceros_spark.sources.datasets import IntegrityProtocol

        # day 01 exists complete; day 02 is "mid-write": data file
        # present, _SUCCESS stripped
        root = str(tmp_path / "evp")
        shutil.copytree(events_day + "/2024-01-01", root + "/2024-01-01")
        shutil.copytree(events_day + "/2024-01-01", root + "/2024-01-02")
        os.remove(root + "/2024-01-02/_SUCCESS")

        a = Application("part_events", str(tmp_path / "store"), spark)
        events = a.marshal_external_data(
            ParquetDataset(
                root + "/{}",
                day_dim(),
                integrity=IntegrityProtocol.SUCCESS_FILE,
            ),
            id="events",
        )
        a.create_data(
            id="out",
            inputs=[events[:-2].range_check(True)],
            compute_targets=[SparkSQL("SELECT count(*) AS n FROM events")],
        )
        a.activate()

        # part-file upload event for the mid-write tip: trigger group
        # seeds, but the range must NOT verify (01-02 unproven)
        outputs = a.receive_raw(root + "/2024-01-02/part-00000.parquet")
        assert outputs == []
        assert a._routing.routes["out"].pending_nodes, "group should wait"

        # the marker event IS the completion notification → fires
        outputs = a.receive_raw(root + "/2024-01-02/_SUCCESS")
        assert any("out/2024-01-02" in p for p in outputs)
