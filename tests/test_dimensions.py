"""Dimension algebra unit tests — semantics mirrored from the
reference's test matrix (test_dimension_filter.py, SURVEY §5)."""

from datetime import datetime

import pytest

from rheoceros_spark.dimensions import (
    AnyVariant,
    DateVariant,
    Dimension,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
    LongVariant,
    RelativeVariant,
    StringVariant,
    create_variant,
)


def spec2():
    return DimensionSpec.load(
        {"region": {"type": "STRING"}, "day": {"type": "DATETIME", "format": "%Y-%m-%d"}}
    )


class TestVariants:
    def test_relative_parse(self):
        v = RelativeVariant.parse("_:-7")
        assert v.relative_index == -7 and v.shift == 0
        v = RelativeVariant.parse("_:-7:-2")
        assert v.relative_index == -7 and v.shift == -2
        assert RelativeVariant.parse("nope") is None

    def test_relative_includes_datum(self):
        # _:-N expands to N values *including* the datum
        # (reference dimension_constructs.py:1133-1142)
        dim = Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
        rel = RelativeVariant(-3, dim=dim)
        vals = [v.formatted() for v in rel.expand(DateVariant("2024-01-10", dim))]
        assert vals == ["2024-01-10", "2024-01-09", "2024-01-08"]

    def test_relative_shift_moves_anchor_before_expansion(self):
        # reference dimension_constructs.py:565-578
        dim = Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})
        rel = RelativeVariant(-2, shift=-3, dim=dim)
        vals = [v.formatted() for v in rel.expand(DateVariant("2024-01-10", dim))]
        assert vals == ["2024-01-07", "2024-01-06"]

    def test_long_zero_pad(self):
        dim = Dimension("h", DimensionType.LONG, {"digits": 3})
        assert LongVariant(7, dim).formatted() == "007"

    def test_string_insensitive(self):
        dim = Dimension("r", DimensionType.STRING, {"insensitive": True})
        assert StringVariant("NA", dim)._eq_value(StringVariant("na"))

    def test_string_format_callable(self):
        dim = Dimension("r", DimensionType.STRING, {"format": str.lower})
        assert StringVariant("NA", dim).value == "na"

    def test_date_granularity_month(self):
        dim = Dimension("m", DimensionType.DATETIME, {"granularity": "MONTH", "format": "%Y-%m"})
        rel = RelativeVariant(-2, dim=dim)
        vals = [v.formatted() for v in rel.expand(DateVariant("2024-03", dim))]
        assert vals == ["2024-03", "2024-02"]

    def test_date_fuzzy_parse(self):
        v = create_variant("2024/01/10", Dimension("d", DimensionType.DATETIME))
        assert isinstance(v, DateVariant) and v.value == datetime(2024, 1, 10)

    def test_type_inference(self):
        assert isinstance(create_variant("*"), AnyVariant)
        assert isinstance(create_variant("_:-7"), RelativeVariant)
        assert isinstance(create_variant(42), LongVariant)
        assert isinstance(create_variant("42"), LongVariant)
        assert isinstance(create_variant("2024-01-10"), DateVariant)
        assert isinstance(create_variant("NA"), StringVariant)
        assert isinstance(create_variant("20240110"), DateVariant)

    def test_date_min_guard(self):
        dim = Dimension("d", DimensionType.DATETIME, {"min": "2024-01-01"})
        with pytest.raises(ValueError):
            DateVariant("2023-12-31", dim)


class TestFilter:
    def test_load_nested_and_flat(self):
        s = spec2()
        f1 = DimensionFilter.load_raw(s, {"NA": {"2024-01-10": {}}})
        f2 = DimensionFilter.load_raw(s, ["NA", "2024-01-10"])
        assert f1.formatted_values() == f2.formatted_values() == [("NA", "2024-01-10")]

    def test_multi_branch(self):
        s = spec2()
        f = DimensionFilter.load_raw(s, {"NA": {"2024-01-10": {}}, "EU": {"2024-02-01": {}}})
        assert len(f) == 2

    def test_chain_refinement(self):
        s = spec2()
        decl = DimensionFilter.load_raw(s, {"NA": {"*": {}}, "EU": {"*": {}}})
        ev = DimensionFilter.load_raw(s, ["NA", "2024-01-10"])
        out = decl.chain(ev)
        assert out.formatted_values() == [("NA", "2024-01-10")]

    def test_chain_value_mismatch_empty_not_none(self):
        # value mismatch → EMPTY filter; spec mismatch → None
        # (reference dimension_constructs.py:2169-2173)
        s = spec2()
        decl = DimensionFilter.load_raw(s, {"NA": {"*": {}}})
        ev = DimensionFilter.load_raw(s, ["EU", "2024-01-10"])
        out = decl.chain(ev)
        assert out is not None and len(out) == 0

    def test_chain_spec_mismatch_none(self):
        s1 = spec2()
        s3 = DimensionSpec.load(
            {"a": {"type": "STRING"}, "b": {"type": "STRING"}, "c": {"type": "STRING"}}
        )
        f1 = DimensionFilter.all_pass(s1)
        f3 = DimensionFilter.all_pass(s3)
        assert f1.chain(f3) is None

    def test_apply_values_expands_range_tip_first(self):
        s = spec2()
        f = DimensionFilter.load_raw(s, {"NA": {"_:-3": {}}})
        m = f.apply_values(["NA", "2024-01-10"])
        assert m.formatted_values() == [
            ("NA", "2024-01-10"),
            ("NA", "2024-01-09"),
            ("NA", "2024-01-08"),
        ]
        assert m.is_material

    def test_wildcard_passthrough_material(self):
        s = spec2()
        f = DimensionFilter.load_raw(s, {"NA": {"*": {}}})
        m = f.apply_values(["*", "2024-01-10"])
        assert m.formatted_values() == [("NA", "2024-01-10")]

    def test_sql_predicate(self):
        s = spec2()
        f = DimensionFilter.load_raw(s, ["NA", "2024-01-10"])
        assert f.to_sql_predicate() == "region = 'NA' AND day = '2024-01-10'"
        assert DimensionFilter.all_pass(s).to_sql_predicate() == "TRUE"

    def test_long_range(self):
        s = DimensionSpec.load({"hour": {"type": "LONG"}})
        f = DimensionFilter.load_raw(s, ["_:-3"])
        m = f.apply_values([10])
        assert m.values() == [(10,), (9,), (8,)]
