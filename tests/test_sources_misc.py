"""Remaining SURVEY §2.1 inventory lines: S7 (CSE scan confs), S8
(raw-content load), S10 (notification-topic source), S14 (pandas
sink), plus raw-path event ingestion (§2.9 event ingestion row)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rheoceros_spark import Application, Dimension, DimensionType, ParquetDataset, SparkSQL
from rheoceros_spark.sources.io import (
    load_content,
    load_signal,
    load_table,
    save_content,
    write_dataset,
    write_pandas,
)
from rheoceros_spark.signals import Signal


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


@pytest.fixture()
def events_partitioned(spark, sf_dir, tmp_path):
    root = str(tmp_path / "events")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i, day in enumerate(["2024-01-01", "2024-01-02"]):
        df.where((F.crc32(F.col("event_id").cast("string")) % 2) == i).write.mode(
            "overwrite"
        ).parquet(f"{root}/{day}")
    return root


class TestS7EncryptedScan:
    def test_encryption_key_sets_cse_confs(self, spark, sf_dir):
        desc = ParquetDataset(f"{sf_dir}/nation.parquet", encryption_key="arn:kms:key/test-1")
        sig = Signal("nation", desc, desc.spec)
        df = load_signal(spark, sig)
        assert df.count() > 0  # local read unaffected by the confs
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        assert conf.get("fs.s3.cse.enabled") == "true"
        assert conf.get("fs.s3.cse.kms.keyId") == "arn:kms:key/test-1"

    def test_s3_keys_scope_per_bucket_and_no_key_is_inert(self, spark, sf_dir):
        # Reads are LAZY: the FileSystem is built at action time, after
        # every input's confs were applied.  s3 datasets therefore get
        # per-bucket conf keys (inputs can't override each other), and a
        # key-less dataset sets/clears NOTHING — clearing globals here
        # would race an earlier encrypted input's deferred read.
        from rheoceros_spark.sources.io import apply_encryption_confs

        enc = ParquetDataset("s3a://bucket-a/data", encryption_key="arn:kms:key/test-2")
        apply_encryption_confs(spark, enc)
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        assert conf.get("fs.s3.bucket.bucket-a.cse.enabled") == "true"
        assert conf.get("fs.s3.bucket.bucket-a.cse.kms.keyId") == "arn:kms:key/test-2"

        plain = ParquetDataset(f"{sf_dir}/region.parquet")
        apply_encryption_confs(spark, plain)
        # other inputs' scoped confs survive a key-less dataset's load
        assert conf.get("fs.s3.bucket.bucket-a.cse.enabled") == "true"


class TestS8RawContent:
    def test_pickle_roundtrip(self, spark, tmp_path):
        model = {"weights": [0.1, 0.2, 0.3], "classes": ["a", "b"]}
        path = str(tmp_path / "artifacts" / "model.pkl")
        save_content(spark, model, path)
        assert load_content(spark, path) == model

    def test_raw_bytes(self, spark, tmp_path):
        path = str(tmp_path / "blob.bin")
        save_content(spark, b"\x00\x01raw", path)
        # no pickle magic → returned as bytes
        assert load_content(spark, path) == b"\x00\x01raw"

    def test_corrupt_pickle_raises(self, spark, tmp_path):
        # bytes carrying the pickle magic but truncated must RAISE, not
        # silently degrade to garbage bytes
        path = str(tmp_path / "corrupt.pkl")
        save_content(spark, b"\x80\x04garbage-not-a-pickle", path)
        with pytest.raises(Exception):
            load_content(spark, path)


class TestVanillaSessionSelfSufficiency:
    """VERDICT r1 #1: the driver harness builds a PLAIN SparkSession —
    the data plane must set its own read confs (nanosAsLong) instead of
    relying on the engine's session factory."""

    def test_load_table_events_with_conf_unset(self, spark, sf_dir):
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        try:
            df = load_table(spark, sf_dir, "events")
            assert df.count() > 0
            # load_signal restored the conf at read time
            assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
            # ns timestamp normalized to a real timestamp column
            assert "timestamp" in dict(df.dtypes).get("ts", "")
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


class TestSchemaInferenceMemo:
    def test_memo_hits_and_overwrite_invalidates(self, spark, tmp_path):
        # r14: load_signal memoizes the INFERRED schema per stat-keyed
        # path (ResolveDataSource was >half of all planning time); a
        # rewrite at the same path must re-key the memo, and the file
        # listing itself must stay fresh (append visibility)
        import time as _time

        from rheoceros_spark.sources.io import _INFERRED_SCHEMA_CACHE

        p = str(tmp_path / "memo_ds")
        spark.range(5).selectExpr("id AS a").write.mode("overwrite").parquet(p)

        def load_raw():
            desc = ParquetDataset(p)
            return load_signal(spark, Signal("t", desc, desc.spec))

        before = len(_INFERRED_SCHEMA_CACHE)
        first = load_raw()
        assert len(_INFERRED_SCHEMA_CACHE) == before + 1
        again = load_raw()
        assert len(_INFERRED_SCHEMA_CACHE) == before + 1  # memo hit
        assert first.schema == again.schema
        assert first.columns == ["a"]
        _time.sleep(0.02)
        spark.range(3).selectExpr("id AS b", "id * 2 AS c").write.mode(
            "overwrite"
        ).parquet(p)
        refreshed = load_raw()
        assert sorted(refreshed.columns) == ["b", "c"], (
            "overwrite at the same path must invalidate the schema memo"
        )
        # append visibility: new rows appear without any schema change
        n0 = refreshed.count()
        spark.range(4).selectExpr("id AS b", "id * 2 AS c").write.mode(
            "append"
        ).parquet(p)
        assert load_raw().count() == n0 + 4


class TestS14PandasSink:
    def test_single_file_parquet(self, spark, tmp_path):
        pdf = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
        out = str(tmp_path / "pandas_out")
        meta = write_pandas(spark, pdf, out)
        assert meta["record_count"] == 2
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) == 1  # single-file semantic
        back = spark.read.parquet(out)
        assert sorted(r["k"] for r in back.collect()) == ["x", "y"]

    def test_csv_format(self, spark, tmp_path):
        pdf = pd.DataFrame({"a": [1]})
        out = str(tmp_path / "pandas_csv")
        write_pandas(spark, pdf, out, data_format="csv", options={"header": "true"})
        assert spark.read.option("header", True).csv(out).count() == 1


class TestS10NotificationTopic:
    def test_topic_triggers_route(self, spark, tmp_path, events_partitioned):
        app = Application("topic_app", storage_root=str(tmp_path / "store"), spark=spark)
        events = app.marshal_external_data(
            ParquetDataset(events_partitioned + "/{}", day_dim()), id="events"
        )
        topic = app.add_notification_topic("upstream_done", day_dim())
        node = app.create_data(
            id="on_notify",
            inputs=[topic, events.ref],
            compute_targets=[SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            )],
        )
        app.activate()
        outs = app.process(topic["2024-01-02"])
        assert outs
        assert app.load_data(node["2024-01-02"]).count() > 0

    def test_topic_receive_raw(self, spark, tmp_path, events_partitioned):
        app = Application("topic_raw_app", storage_root=str(tmp_path / "store"), spark=spark)
        events = app.marshal_external_data(
            ParquetDataset(events_partitioned + "/{}", day_dim()), id="events"
        )
        topic = app.add_notification_topic("ping", day_dim())
        node = app.create_data(
            id="pinged",
            inputs=[topic, events.ref],
            compute_targets=[SparkSQL("SELECT count(*) AS n FROM events")],
        )
        app.activate()
        outs = app.receive_raw("topic://ping/2024-01-01")
        assert outs
        assert app.load_data(node["2024-01-01"]).collect()[0]["n"] > 0

    def test_unclaimed_topic_ignored(self, spark, tmp_path):
        app = Application("noop_app", storage_root=str(tmp_path / "store"), spark=spark)
        app.activate()
        assert app.receive_raw("topic://nobody/2024-01-01") == []


class TestReceiveRawPath:
    def test_object_created_event_routes(self, spark, tmp_path, events_partitioned):
        app = Application("raw_app", storage_root=str(tmp_path / "store"), spark=spark)
        events = app.marshal_external_data(
            ParquetDataset(events_partitioned + "/{}", day_dim()), id="events"
        )
        node = app.create_data(
            id="daily",
            inputs=[events],
            compute_targets=[SparkSQL(
                "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
            )],
        )
        app.activate()
        # _SUCCESS upload event → partition trigger (marker stripped)
        outs = app.receive_raw(events_partitioned + "/2024-01-02/_SUCCESS")
        assert outs
        assert app.load_data(node["2024-01-02"]).count() > 0

    def test_unmatched_path_returns_empty(self, spark, tmp_path):
        app = Application("raw_app2", storage_root=str(tmp_path / "store"), spark=spark)
        app.activate()
        assert app.receive_raw("/some/other/location/2024-01-01") == []
