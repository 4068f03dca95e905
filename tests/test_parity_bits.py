"""Small reference-parity pieces: filter union, PrestoSQL descriptor,
blocked executions."""

import pytest
from pyspark.sql import functions as F

from rheoceros_spark import (
    Application,
    Dimension,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
    ParquetDataset,
    PrestoSQL,
)
from rheoceros_spark.sources.datasets import IntegrityProtocol


def test_dimension_filter_merge_is_union():
    spec = DimensionSpec([Dimension("region"), Dimension("day")])
    a = DimensionFilter.load_raw(spec, {"NA": {"2024-01-01": {}}})
    b = DimensionFilter.load_raw(spec, {"EU": {"2024-01-01": {}}, "NA": {"2024-01-01": {}}})
    merged = a.merge(b)
    assert sorted(merged.values()) == [("EU", "2024-01-01"), ("NA", "2024-01-01")]
    # spec mismatch → None (chain parity)
    other = DimensionSpec([Dimension("x", DimensionType.LONG)])
    assert a.merge(DimensionFilter.all_pass(other)) is None


@pytest.fixture()
def events_by_day(spark, sf_dir, tmp_path):
    from rheoceros_spark.sources.io import normalize_ns_timestamps

    root = str(tmp_path / "ev")
    ev = normalize_ns_timestamps(
        spark.read.parquet(f"{sf_dir}/events.parquet"), f"{sf_dir}/events.parquet"
    )
    for day in ["2024-01-01", "2024-01-02"]:
        ev.where(F.to_date("ts") == day).coalesce(1).write.mode("overwrite").parquet(
            f"{root}/{day}"
        )
    return root


def _events_signal(app, root):
    return app.marshal_external_data(
        ParquetDataset(
            root + "/{}",
            Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            integrity=IntegrityProtocol.SUCCESS_FILE,
        ),
        id="events",
    )


def test_prestosql_descriptor_with_dim_parametrization(spark, events_by_day, tmp_path):
    app = Application("presto_app", str(tmp_path / "store"), spark)
    events = _events_signal(app, events_by_day)
    node = app.create_data(
        id="daily_presto",
        inputs=[events],
        compute_targets=PrestoSQL(
            "SELECT event_type, count(*) AS n, '{day}' AS day_str FROM events GROUP BY event_type"
        ),
    )
    app.execute(node["2024-01-01"])
    rows = app.load_data(node["2024-01-01"]).collect()
    assert rows and all(r.day_str == "2024-01-01" for r in rows)


def test_on_failure_hook_fires_and_no_partial_output(spark, events_by_day, tmp_path):
    from rheoceros_spark import SparkSQL

    app = Application("fail_app", str(tmp_path / "store"), spark)
    events = _events_signal(app, events_by_day)
    failures = []
    node = app.create_data(
        id="broken",
        inputs=[events],
        compute_targets=SparkSQL("SELECT no_such_column FROM events"),
        on_failure=lambda n, vals, e: failures.append((n.id, vals)),
    )
    with pytest.raises(Exception):
        app.execute(node["2024-01-01"])
    assert len(failures) == 1
    node_id, vals = failures[0]
    assert node_id == "broken" and str(vals["day"])[:10] == "2024-01-01"
    # no partial partition left behind
    assert app.poll(node["2024-01-01"]) == (None, None)


def test_stream_dedup_first_wins(spark, tmp_path):
    from rheoceros_spark.streaming import stream_dedup

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:05:00", "b"),   # duplicate key within watermark
        (2, "2024-01-01 00:01:00", "c"),
    ]
    df = spark.createDataFrame(rows, "k bigint, ts_s string, payload string").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "payload"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    sdf = spark.readStream.schema("k bigint, ts timestamp, payload string").parquet(str(src / "*"))
    out = []
    q = (
        stream_dedup(sdf, ["k"], watermark="10 minutes")
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.k for r in out) == [1, 2]


def test_query_and_search_apis(spark, events_by_day, tmp_path):
    from rheoceros_spark import SparkSQL

    app = Application("query_app", str(tmp_path / "store"), spark)
    events = _events_signal(app, events_by_day)
    daily = app.create_data(
        id="daily_stats", inputs=[events],
        compute_targets=SparkSQL("SELECT count(*) AS n FROM events"),
    )
    app.create_data(
        id="weekly_rollup", inputs=[daily],
        compute_targets=SparkSQL("SELECT sum(n) AS n FROM daily_stats"),
    )
    assert set(app.list_data()) == {"events", "daily_stats", "weekly_rollup"}
    assert app.search_data("STATS") == ["daily_stats"]
    # reference parity: search also matches the SOURCE spec (path
    # fragments find the node, application.py:1830-1843)
    assert "events" in app.search_data(events_by_day.rsplit("/", 1)[-1])
    assert app.get_data("daily_stats") is not None and app.get_data("nope") is None
    assert app.get_upstream("weekly_rollup") == ["daily_stats"]
    assert app.get_downstream("daily_stats") == ["weekly_rollup"]
    assert app.get_downstream("events") == ["daily_stats", "weekly_rollup"]


def test_blocked_event_defers_execution(spark, events_by_day, tmp_path):
    app = Application("blocked_app", str(tmp_path / "store"), spark)
    events = _events_signal(app, events_by_day)
    app.create_data(
        id="daily",
        inputs=[events],
        compute_targets=PrestoSQL("SELECT count(*) AS n FROM events"),
    )
    # blocked event: trigger condition satisfied but execution deferred
    outs = app.process(events["2024-01-01"], is_blocked=True)
    assert outs == []
    # re-process without the block → unblocks and runs
    outs = app.process(events["2024-01-01"])
    assert len(outs) == 1 and outs[0].endswith("/daily/2024-01-01")
