"""Format surface (S1: csv/json alongside parquet) and declared-schema
handling ("StringType()" strings parsed without eval, reference
utils/spark.py:9-70)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rheoceros_spark import Application, CsvDataset, Dimension, DimensionType, JsonDataset
from rheoceros_spark.sources.datasets import build_struct_type


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
