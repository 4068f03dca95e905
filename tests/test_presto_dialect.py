"""PrestoSQL dialect guard: exact-equivalent renames run, known-divergent
functions are rejected loudly at construction (no silent wrong answers).

Reference surface: ``api_ext.py:230-233`` (PrestoSQL descriptor),
``aws_athena.py:541-663`` (Athena/Presto execution path).
"""

import pytest

from rheoceros_spark.compute import PrestoSQL, translate_presto_sql


class TestTranslate:
    def test_renames(self):
        assert (
            translate_presto_sql("SELECT approx_distinct(x) FROM t")
            == "SELECT approx_count_distinct(x) FROM t"
        )
        assert (
            translate_presto_sql("SELECT strpos(s, 'a') FROM t")
            == "SELECT instr(s, 'a') FROM t"
        )
        assert (
            translate_presto_sql("SELECT contains(arr, 1), week_of_year(d) FROM t")
            == "SELECT array_contains(arr, 1), weekofyear(d) FROM t"
        )

    def test_case_insensitive_and_spacing(self):
        assert (
            translate_presto_sql("SELECT Approx_Distinct  (x) FROM t")
            == "SELECT approx_count_distinct  (x) FROM t"
        )

    @pytest.mark.parametrize(
        "fn",
        ["try", "json_extract", "map_agg", "format_datetime", "from_unixtime",
         "to_unixtime", "date_diff", "day_of_week", "dow", "approx_set", "split",
         # near-miss renames whose Spark twins differ on NULL / non-scalar
         # inputs — rejected loudly rather than silently diverging
         "array_agg", "arbitrary", "json_extract_scalar"],
    )
    def test_rejects(self, fn):
        with pytest.raises(NotImplementedError, match=fn):
            translate_presto_sql(f"SELECT {fn}(x) FROM t")

    def test_presto_date_add_unit_form_rejected(self):
        with pytest.raises(NotImplementedError, match="date_add"):
            translate_presto_sql("SELECT date_add('day', 1, d) FROM t")

    def test_names_inside_string_literals_untouched(self):
        sql = "SELECT 'call try(x) or approx_distinct(y)' AS doc, count(*) FROM t"
        assert translate_presto_sql(sql) == sql
        # escaped quotes inside literals
        sql2 = "SELECT 'it''s try(a)' FROM t"
        assert translate_presto_sql(sql2) == sql2

    def test_ansi_subset_passthrough(self):
        sql = (
            "SELECT region, sum(rev) AS rev, row_number() OVER (ORDER BY sum(rev) DESC) AS rk "
            "FROM t GROUP BY region HAVING count(*) > 1"
        )
        assert translate_presto_sql(sql) == sql

    def test_identifier_without_call_not_flagged(self):
        # a column named day_of_week (no call parens) passes through
        sql = "SELECT day_of_week FROM t"
        assert translate_presto_sql(sql) == sql

    def test_names_inside_comments_untouched(self):
        sql = "SELECT x FROM t -- replaced try(x) with try_cast\n"
        assert translate_presto_sql(sql) == sql
        sql2 = "SELECT /* was histogram(v) */ count(*) FROM t"
        assert translate_presto_sql(sql2) == sql2
        # an apostrophe inside a comment must not desync literal tracking
        sql3 = "SELECT x FROM t -- don't touch\n WHERE approx_distinct(x) > 1"
        assert "approx_count_distinct" in translate_presto_sql(sql3)


class TestDescriptor:
    def test_reject_at_construction(self):
        with pytest.raises(NotImplementedError, match="day_of_week"):
            PrestoSQL("SELECT day_of_week(d) FROM input0")

    def test_translated_runs_end_to_end(self, spark):
        from rheoceros_spark.compute import ComputeContext

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (2, "a")], ["k", "v"]
        )
        slot = PrestoSQL(
            "SELECT k, approx_distinct(v) AS dv FROM input0 GROUP BY k"
        )
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        out = slot.run({"t": df}, ctx).orderBy("k").collect()
        assert [(r["k"], r["dv"]) for r in out] == [(1, 2), (2, 1)]


class TestAthenaSurfaceBroadening:
    """Round-6 broadening from the reference's real Athena surface
    (``aws_athena.py:541-663`` + the Athena/Presto docs it targets):
    unit-string date arithmetic, element_at OOB, array_join nulls,
    approx_percentile and friends."""

    @pytest.mark.parametrize(
        "unit", ["millisecond", "second", "minute", "hour", "day", "week"]
    )
    def test_date_diff_fixed_units_translate(self, unit):
        got = translate_presto_sql(f"SELECT date_diff('{unit}', a, b) FROM t")
        assert got == f"SELECT timestampdiff({unit.upper()}, a, b) FROM t"

    @pytest.mark.parametrize("unit", ["month", "quarter", "year"])
    def test_date_diff_calendar_units_reject(self, unit):
        with pytest.raises(NotImplementedError, match="date_diff"):
            translate_presto_sql(f"SELECT date_diff('{unit}', a, b) FROM t")

    @pytest.mark.parametrize("unit", ["millisecond", "second", "minute", "hour"])
    def test_date_add_subday_units_translate(self, unit):
        got = translate_presto_sql(f"SELECT date_add('{unit}', 5, ts) FROM t")
        assert got == f"SELECT timestampadd({unit.upper()}, 5, ts) FROM t"

    @pytest.mark.parametrize("unit", ["day", "week", "month", "year"])
    def test_date_add_date_grain_units_reject(self, unit):
        # day/week return DATE on Presto for DATE inputs (timestampadd
        # would silently retype); month+ saturate day-of-month
        with pytest.raises(NotImplementedError, match="date_add"):
            translate_presto_sql(f"SELECT date_add('{unit}', 1, d) FROM t")

    def test_non_literal_unit_rejects(self):
        with pytest.raises(NotImplementedError, match="non-literal unit"):
            translate_presto_sql("SELECT date_diff(u, a, b) FROM t")

    def test_unit_inside_string_or_comment_untouched(self):
        sql = "SELECT 'date_diff(''day'', a, b)' AS doc FROM t"
        assert translate_presto_sql(sql) == sql
        sql2 = "SELECT x FROM t -- date_add('day', 1, d)\n"
        assert translate_presto_sql(sql2) == sql2

    def test_date_diff_runs_end_to_end(self, spark):
        from rheoceros_spark.compute import ComputeContext

        df = spark.sql(
            "SELECT timestamp'2024-01-01 00:30:00' AS a, "
            "timestamp'2024-01-03 02:00:00' AS b, "
            "timestamp'2023-12-30 00:00:00' AS c"
        )
        slot = PrestoSQL(
            "SELECT date_diff('hour', a, b) AS h, date_diff('day', a, b) AS d, "
            "date_diff('day', a, c) AS neg FROM input0"
        )
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        row = slot.run({"t": df}, ctx).collect()[0]
        # full elapsed units, truncated toward zero, sign-preserving
        assert (row.h, row.d, row.neg) == (49, 2, -2)

    def test_date_add_runs_end_to_end(self, spark):
        from rheoceros_spark.compute import ComputeContext

        df = spark.sql("SELECT timestamp'2024-01-01 23:59:30' AS ts")
        slot = PrestoSQL("SELECT date_add('second', 45, ts) AS t2 FROM input0")
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        assert str(slot.run({"t": df}, ctx).collect()[0].t2) == "2024-01-02 00:00:15"

    def test_element_at_oob_is_null_end_to_end(self, spark):
        from rheoceros_spark.compute import ComputeContext

        df = spark.sql("SELECT array('a','b','c') AS arr, map('k','v') AS m")
        slot = PrestoSQL(
            "SELECT element_at(arr, 5) AS oob, element_at(arr, -1) AS last, "
            "element_at(arr, 2) AS mid, element_at(m, 'absent') AS nokey FROM input0"
        )
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        row = slot.run({"t": df}, ctx).collect()[0]
        # Presto semantics: NULL out of bounds / absent key, -1 = last
        assert (row.oob, row.last, row.mid, row.nokey) == (None, "c", "b", None)

    def test_array_join_null_handling_passthrough(self, spark):
        from rheoceros_spark.compute import ComputeContext

        sql = (
            "SELECT array_join(array('a', NULL, 'b'), ',') AS skipped, "
            "array_join(array('a', NULL, 'b'), ',', 'N') AS replaced FROM input0"
        )
        # same name, same semantics on both engines: nulls skipped
        # without a replacement (no doubled delimiter), substituted with one
        assert translate_presto_sql(sql) == sql
        slot = PrestoSQL(sql)
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        row = slot.run({"t": spark.range(1)}, ctx).collect()[0]
        assert (row.skipped, row.replaced) == ("a,b", "a,N,b")

    @pytest.mark.parametrize(
        "fn",
        ["approx_percentile", "approx_most_frequent", "split_part", "random",
         "json_parse", "json_format", "url_extract_host", "url_extract_parameter"],
    )
    def test_new_rejects(self, fn):
        with pytest.raises(NotImplementedError, match=fn):
            translate_presto_sql(f"SELECT {fn}(x) FROM t")

    def test_date_trunc_and_regexp_like_passthrough(self, spark):
        from rheoceros_spark.compute import ComputeContext

        # identical name+semantics in both dialects: must pass untouched
        sql = (
            "SELECT date_trunc('hour', ts) AS h, regexp_like(s, 'b.r') AS hit "
            "FROM input0"
        )
        assert translate_presto_sql(sql) == sql
        df = spark.sql("SELECT timestamp'2024-05-06 07:08:09' AS ts, 'bar' AS s")
        ctx = ComputeContext(spark=spark, dimensions={}, args={})
        row = PrestoSQL(sql).run({"t": df}, ctx).collect()[0]
        assert str(row.h) == "2024-05-06 07:00:00" and row.hit is True
