"""Z-order layout: key correctness, and the actual pruning payoff —
per-file min/max ranges after zorder_write are tight on BOTH
dimensions, which is what file skipping prunes on at scale."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rheoceros_spark.operators.layout import zorder_key, zorder_key_sql, zorder_write


class TestZorderKey:
    def test_known_interleaving(self, spark):
        # x=0b11, y=0b01 → z bits (y1 x1 y0 x0) = 0b0111 = 7
        row = (
            spark.createDataFrame([(3, 1)], "x long, y long")
            .select(zorder_key(["x", "y"], bits=2).alias("z"))
            .first()
        )
        assert row["z"] == 7

    def test_zero_and_max(self, spark):
        rows = (
            spark.createDataFrame([(0, 0), (3, 3)], "x long, y long")
            .select(zorder_key(["x", "y"], bits=2).alias("z"))
            .collect()
        )
        assert sorted(r["z"] for r in rows) == [0, 15]

    def test_sql_twin_matches_spark(self, spark):
        df = spark.createDataFrame(
            [(i, (i * 7) % 32) for i in range(32)], "x long, y long"
        )
        got = df.select(
            "x", "y",
            zorder_key(["x", "y"], bits=5).alias("z_df"),
            F.expr(zorder_key_sql(["x", "y"], bits=5)).alias("z_sql"),
        ).collect()
        for r in got:
            assert r["z_df"] == r["z_sql"], (r["x"], r["y"])

    def test_too_many_bits_raises(self):
        with pytest.raises(ValueError, match="bigint"):
            zorder_key(["a", "b"], bits=32)


class TestZorderWrite:
    def test_perfile_minmax_tight_on_both_dims(self, spark, tmp_path):
        # 64x64 grid; z-ordered into 16 files → each file should cover
        # ~1/4 of each dimension's range, not the full range a
        # single-column sort leaves on the second column
        n = 64
        df = spark.range(n * n).select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
        path = str(tmp_path / "zordered")
        zorder_write(df, path, ["x", "y"], bits=6, n_files=16)

        spans_x, spans_y = [], []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            mins = {"x": n, "y": n}
            maxs = {"x": -1, "y": -1}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    mins[name] = min(mins[name], st.min)
                    maxs[name] = max(maxs[name], st.max)
            spans_x.append(maxs["x"] - mins["x"] + 1)
            spans_y.append(maxs["y"] - mins["y"] + 1)
        # 16 files over a 64x64 z-curve: each file covers a 16x64 or
        # 32x32-ish region; assert mean span well under the full range
        # on BOTH dims (a y-sorted layout would leave span_x == 64
        # everywhere)
        assert sum(spans_x) / len(spans_x) <= 48, spans_x
        assert sum(spans_y) / len(spans_y) <= 48, spans_y

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        df = spark.range(100).select(
            (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
        )
        path = str(tmp_path / "z2")
        zorder_write(df, path, ["x", "y"], bits=4, n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert set(back.columns) == {"x", "y"}
