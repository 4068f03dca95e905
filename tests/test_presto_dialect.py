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
