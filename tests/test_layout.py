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

    @staticmethod
    def _files_needed(path: str, pred: dict) -> tuple[int, int]:
        """(files a min/max-skipping reader must open, total files).

        Evaluates the predicate against each file's aggregated column
        stats — exactly the file-level skip test object-store table
        formats (Delta/Iceberg) run at plan time, and what the parquet
        reader runs per row group; with one row group per small file
        the two coincide.
        """
        needed = total = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.read_metadata(os.path.join(path, f))
            mins: dict[str, int] = {}
            maxs: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    name = col.path_in_schema
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            if all(maxs[c] >= lo and mins[c] <= hi for c, (lo, hi) in pred.items()):
                needed += 1
        return needed, total

    def test_scan_skip_beats_linear_sort(self, spark, tmp_path):
        """The carried z-order proof: for a predicate on the NON-leading
        dimension, a linear (y, x) sort must read every file while the
        z-order layout reads only the files whose quadrant overlaps —
        the measured file-count win that justifies zorder_write at
        100 TB (a 2-dim predicate prunes on both axes)."""
        n = 64
        df = spark.range(n * n).select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
        pz = str(tmp_path / "bz")
        pl = str(tmp_path / "blin")
        zorder_write(df, pz, ["x", "y"], bits=6, n_files=16)
        # linear comparator: range-partitioned + sorted on (y, x) — the
        # best a single-column-ordered layout can do, same file count
        (
            df.repartitionByRange(16, "y", "x")
            .sortWithinPartitions("y", "x")
            .write.mode("overwrite")
            .parquet(pl)
        )

        # predicate on x only (the non-leading dim for the linear sort)
        x_pred = {"x": (8, 15)}
        need_z, tot_z = self._files_needed(pz, x_pred)
        need_l, tot_l = self._files_needed(pl, x_pred)
        assert tot_z == 16 and tot_l == 16
        assert need_l == tot_l, "linear y-sort cannot skip on x"
        assert need_z < need_l
        assert need_z <= tot_z // 2, (need_z, tot_z)

        # 2-dim box predicate: z-order prunes on both axes at once
        box = {"x": (8, 15), "y": (8, 15)}
        need_zb, _ = self._files_needed(pz, box)
        need_lb, _ = self._files_needed(pl, box)
        assert need_zb <= need_lb
        assert need_zb <= 2, need_zb

        # correctness: both layouts answer the box query identically
        q = "x BETWEEN 8 AND 15 AND y BETWEEN 8 AND 15"
        rows_z = sorted(
            (r["x"], r["y"]) for r in spark.read.parquet(pz).where(q).collect()
        )
        rows_l = sorted(
            (r["x"], r["y"]) for r in spark.read.parquet(pl).where(q).collect()
        )
        assert rows_z == rows_l and len(rows_z) == 64

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        df = spark.range(100).select(
            (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
        )
        path = str(tmp_path / "z2")
        zorder_write(df, path, ["x", "y"], bits=4, n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert set(back.columns) == {"x", "y"}
