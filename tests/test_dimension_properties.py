"""Property-based tests (hypothesis) for the dimension-filter algebra —
the engine's partition logic.  Algebraic laws the reference's semantics
imply (chain = intersection, merge = union, finalize idempotent, path
materialization round-trips through extraction)."""

from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from rheoceros_spark.dimensions import (
    Dimension,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
)
from rheoceros_spark.sources.datasets import ParquetDataset

REGIONS = ["NA", "EU", "JP", "IN", "BR"]


def day_dim():
    return Dimension("day", DimensionType.DATETIME, {"format": "%Y-%m-%d"})


def spec2():
    return DimensionSpec([Dimension("region", DimensionType.STRING), day_dim()])


days = st.integers(0, 60).map(lambda n: (date(2024, 1, 1) + timedelta(days=n)).isoformat())
regions = st.sampled_from(REGIONS)
branches = st.lists(st.tuples(regions, days), min_size=1, max_size=6)


def filt(brs):
    f = DimensionFilter.load_raw(spec2(), list(brs[0]))
    for b in brs[1:]:
        f = f.merge(DimensionFilter.load_raw(spec2(), list(b)))
    return f


@given(branches)
@settings(max_examples=60, deadline=None)
def test_chain_is_intersection_of_value_sets(brs):
    """A ⋂ B via chain == set-intersection of materialized values."""
    half = max(1, len(brs) // 2)
    a, b = filt(brs[:half]), filt(brs[half - 1:])  # overlap guaranteed
    chained = a.chain(b)
    assert chained is not None
    got = set(chained.finalize().values())
    expect = set(a.finalize().values()) & set(b.finalize().values())
    assert got == expect


@given(branches)
@settings(max_examples=60, deadline=None)
def test_merge_is_union_and_commutes(brs):
    half = max(1, len(brs) // 2)
    a, b = filt(brs[:half]), filt(brs[half:] or brs[:1])
    assert set(a.merge(b).finalize().values()) == set(a.finalize().values()) | set(
        b.finalize().values()
    )
    assert set(a.merge(b).finalize().values()) == set(b.merge(a).finalize().values())


@given(branches)
@settings(max_examples=60, deadline=None)
def test_finalize_idempotent_and_material(brs):
    f = filt(brs).finalize()
    assert f.is_material
    assert f.finalize().values() == f.values()


@given(branches)
@settings(max_examples=60, deadline=None)
def test_chain_with_all_pass_is_identity(brs):
    f = filt(brs)
    allp = DimensionFilter.all_pass(spec2())
    assert set(f.chain(allp).finalize().values()) == set(f.finalize().values())
    assert set(allp.chain(f).finalize().values()) == set(f.finalize().values())


@given(regions, days, st.sampled_from(["positional", "hive"]))
@settings(max_examples=60, deadline=None)
def test_paths_round_trip_through_extraction(region, day, layout):
    """F5/F6: materialize_paths → extract_dimensions is the identity on
    dimension values, for both path layouts."""
    fmt = "/data/t/{}/{}" if layout == "positional" else "/data/t/region={}/day={}"
    desc = ParquetDataset(fmt, Dimension("region", DimensionType.STRING), day_dim())
    f = DimensionFilter.load_raw(desc.spec, [region, day]).finalize()
    paths = desc.materialize_paths(f)
    assert len(paths) == 1
    got = desc.extract_dimensions(paths[0])
    assert got is not None
    assert str(got["region"]) == region
    assert f"{got['day']:%Y-%m-%d}" if not isinstance(got["day"], str) else got["day"]


@given(st.lists(st.tuples(regions, days), min_size=1, max_size=4, unique=True))
@settings(max_examples=60, deadline=None)
def test_sql_predicate_matches_value_set(brs):
    """to_sql_predicate enumerates exactly the finalized branches (as a
    disjunction a row-filter engine would apply)."""
    f = filt(list(brs)).finalize()
    pred = f.to_sql_predicate()
    assert pred not in ("FALSE",)
    for region, day in f.values():
        day_s = f"{day:%Y-%m-%d}" if not isinstance(day, str) else day
        assert region in pred and day_s in pred


@given(days, st.integers(2, 10))
@settings(max_examples=40, deadline=None)
def test_relative_range_width_and_tip(day, width):
    """[:-N] expands to exactly N consecutive days, TIP (anchor) first."""
    desc = ParquetDataset("/d/{}", day_dim())
    f = DimensionFilter.load_raw(desc.spec, [f"_:-{width}"])
    final = f.apply_values([day])
    vals = [v[0] for v in final.values()]
    assert len(vals) == width
    assert f"{vals[0]:%Y-%m-%d}" == day
    deltas = {(vals[i] - vals[i + 1]).days for i in range(len(vals) - 1)}
    assert deltas == {1}
