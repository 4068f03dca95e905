"""Format surface (S1: csv/json alongside parquet) and declared-schema
handling ("StringType()" strings parsed without eval, reference
utils/spark.py:9-70)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rheoceros_spark import (
    Application,
    AvroDataset,
    CsvDataset,
    Dimension,
    DimensionType,
    JsonDataset,
    LibSVMDataset,
    OrcDataset,
    ParquetDataset,
)
from rheoceros_spark.sources.datasets import build_struct_type
from rheoceros_spark.signals import Signal
from rheoceros_spark.sources.io import load_signal, write_dataset


class TestSchemaDefs:
    def test_typename_style_and_ddl_style(self, spark):  # DDL parser needs a session
        st = build_struct_type(
            [
                ("name", "StringType()", True),
                ("n", "LongType()", False),
                ("score", "double", True),
                ("tags", "array<string>", True),
                ("kv", "map<string,int>", True),
                ("amount", "decimal(12,2)", True),
            ]
        )
        assert st["name"].dataType == T.StringType()
        assert st["n"].dataType == T.LongType() and st["n"].nullable is False
        assert st["score"].dataType == T.DoubleType()
        assert st["tags"].dataType == T.ArrayType(T.StringType())
        assert st["kv"].dataType == T.MapType(T.StringType(), T.IntegerType())
        assert st["amount"].dataType == T.DecimalType(12, 2)

    def test_nested_struct(self, spark):
        st = build_struct_type([("meta", "struct<w:int,h:int>", True)])
        assert st["meta"].dataType == T.StructType(
            [T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType())]
        )


@pytest.fixture()
def day_rows(spark):
    return spark.createDataFrame(
        [("click", 3, 1.5), ("view", 7, 2.25)], "event_type string, n int, v double"
    )


class TestCsvJson:
    def test_csv_roundtrip_with_inference(self, spark, day_rows, tmp_path):
        root = tmp_path / "csv"
        for day in ["2024-01-01"]:
            day_rows.coalesce(1).write.mode("overwrite").option("header", True).csv(
                str(root / day)
            )
        app = Application("csv_app", str(tmp_path / "store"), spark)
        sig = app.marshal_external_data(
            CsvDataset(
                str(root) + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            ),
            id="csv_ev",
        )
        df = app.load_data(sig["2024-01-01"])
        got = {(r.event_type, r.n, r.v) for r in df.collect()}
        assert got == {("click", 3, 1.5), ("view", 7, 2.25)}
        # inferSchema gave numeric types, not strings
        assert dict(df.dtypes)["n"] in ("int", "bigint")

    def test_csv_declared_schema_wins(self, spark, day_rows, tmp_path):
        root = tmp_path / "csv2"
        day_rows.coalesce(1).write.mode("overwrite").option("header", True).csv(
            str(root / "2024-01-01")
        )
        app = Application("csv_app2", str(tmp_path / "store"), spark)
        sig = app.marshal_external_data(
            CsvDataset(
                str(root) + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
                schema_def=[
                    ("event_type", "StringType()", True),
                    ("n", "LongType()", True),
                    ("v", "StringType()", True),  # deliberately read v as string
                ],
                header=True,
            ),
            id="csv_ev2",
        )
        df = app.load_data(sig["2024-01-01"])
        assert dict(df.dtypes) == {"event_type": "string", "n": "bigint", "v": "string"}

    def test_json_dataset(self, spark, day_rows, tmp_path):
        root = tmp_path / "json"
        day_rows.coalesce(1).write.mode("overwrite").json(str(root / "2024-01-01"))
        app = Application("json_app", str(tmp_path / "store"), spark)
        sig = app.marshal_external_data(
            JsonDataset(
                str(root) + "/{}",
                Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"}),
            ),
            id="json_ev",
        )
        df = app.load_data(sig["2024-01-01"])
        assert {(r.event_type, r.n) for r in df.collect()} == {("click", 3), ("view", 7)}

    def test_csv_output_format(self, spark, day_rows, tmp_path):
        """A node can write CSV via write_dataset's format plumbing."""
        from rheoceros_spark.sources.io import write_dataset

        out = str(tmp_path / "out_csv")
        write_dataset(day_rows, out, data_format="csv", options={"header": "true"})
        back = spark.read.option("header", True).option("inferSchema", True).csv(out)
        assert back.count() == 2 and set(back.columns) == {"event_type", "n", "v"}


class TestFormatMatrix:
    """Managed sink → scan round-trip per dataset format (reference
    DatasetSignalSourceFormat, signal_source.py:510-519)."""

    @pytest.mark.parametrize("cls", [ParquetDataset, OrcDataset, JsonDataset])
    def test_roundtrip(self, cls, spark, day_rows, tmp_path):
        path = str(tmp_path / cls.__name__)
        desc = cls(path)
        write_dataset(day_rows, path, data_format=desc.data_format)
        back = load_signal(spark, Signal("t", desc, desc.spec))
        assert {r.event_type for r in back.collect()} == {"click", "view"}

    def test_orc_predicate_pushdown(self, spark, day_rows, tmp_path):
        path = str(tmp_path / "orc_pushdown")
        write_dataset(day_rows, path, data_format="orc")
        desc = OrcDataset(path)
        df = load_signal(spark, Signal("t", desc, desc.spec)).where(F.col("n") > 5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "n" in plan.split("PushedFilters")[1][:80]

    def test_libsvm_read(self, spark, tmp_path):
        import os

        d = tmp_path / "svm" / "part.libsvm"
        os.makedirs(d.parent, exist_ok=True)
        d.write_text("0 1:1.5 3:2.0\n1 2:0.5\n")
        desc = LibSVMDataset(str(d.parent), num_features=4)
        df = load_signal(spark, Signal("svm", desc, desc.spec))
        rows = df.orderBy("label").collect()
        assert [r.label for r in rows] == [0.0, 1.0]
        assert rows[0].features.size == 4

    def test_avro_clear_error_without_module(self, spark, day_rows, tmp_path):
        desc = AvroDataset(str(tmp_path / "a"))
        if AvroDataset.runtime_available(spark):
            pytest.skip("spark-avro present; read path exercised natively")
        with pytest.raises(RuntimeError, match="spark-avro"):
            load_signal(spark, Signal("a", desc, desc.spec))
