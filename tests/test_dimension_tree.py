"""Branched (tree) DimensionSpec parity tests.

Ports the branched/tree cases from the reference suite
(``test/intelliflow/core/signal_processing/dimension_constructs/
test_dimension_spec.py`` — ``dimension_spec_branch_lvl_2``,
``dimension_spec_tree_1`` — and ``test_dimension_filter.py:31-62``'s
spec-bound filter cases) onto the engine's DimensionSpec, which stores
the reference's nested tree and flattens to Spark partition-column
order (DFS).  No Spark session needed — the algebra is pure Python.
"""

import copy

import pytest

from rheoceros_spark.dimensions import (
    AnyVariant,
    Dimension,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
)

S = DimensionType.STRING
L = DimensionType.LONG
D = DimensionType.DATETIME


# fixtures mirroring reference test_dimension_spec.py:70-82
@pytest.fixture
def single_dim():
    return DimensionSpec([Dimension("dim_1_1", L)], [None])


@pytest.fixture
def branch_lvl_2():
    return DimensionSpec([Dimension("dim_1_1", L)], [DimensionSpec([Dimension("dim_1_2", S)], [None])])


@pytest.fixture
def tree_1(branch_lvl_2):
    return copy.deepcopy(branch_lvl_2).add_dimension(Dimension("dim_2_1", D), None)


class TestTreeSpecInit:
    def test_init_forms(self):
        DimensionSpec()
        DimensionSpec([Dimension("dim1", S)], [None])
        # two root dimensions, one nested dimension (the branched case)
        DimensionSpec(
            [Dimension("dim1", L), Dimension("dim2", S)],
            [DimensionSpec([Dimension("sub_param", L)], [None]), None],
        )

    @pytest.mark.parametrize(
        "dimensions, sub_dim_specs",
        [
            ([Dimension("dim1", D)], []),
            ([Dimension("dim1", D)], None),
            # list sizes won't match
            ([Dimension("dim1", D)], [None, None]),
            # duplicates (on the same branch)
            ([Dimension("dim1", D)], [DimensionSpec([Dimension("dim1", S)], [None])]),
            # duplicate nested on first branch then as second root
            (
                [Dimension("dim1", D), Dimension("dim1_1", L)],
                [DimensionSpec([Dimension("dim1_1", S)], [None]), None],
            ),
            # duplicate hidden in the SECOND entry's subtree
            (
                [Dimension("a", S), Dimension("b", S)],
                [
                    DimensionSpec([Dimension("x", L)], [None]),
                    DimensionSpec([Dimension("x", L)], [None]),
                ],
            ),
        ],
    )
    def test_init_failure(self, dimensions, sub_dim_specs):
        with pytest.raises(ValueError):
            DimensionSpec(dimensions, sub_dim_specs)

    def test_legacy_chain_equals_explicit_tree(self, branch_lvl_2):
        # engine's 1-arg chain form IS the reference's nested chain
        chain = DimensionSpec([Dimension("dim_1_1", L), Dimension("dim_1_2", S)])
        assert chain == branch_lvl_2
        assert chain.is_chain
        assert branch_lvl_2.is_chain

    def test_add_dimension(self, single_dim, branch_lvl_2):
        spec = DimensionSpec()
        spec.add_dimension(Dimension("dim_1_1", L), None)
        assert spec == single_dim
        with pytest.raises(ValueError):
            spec.add_dimension(Dimension("dim_1_1", L), None)

        spec = DimensionSpec()
        spec.add_dimension(Dimension("dim_1_1", L), DimensionSpec([Dimension("dim_1_2", S)], [None]))
        assert spec == branch_lvl_2

        with pytest.raises(ValueError):
            spec.add_dimension(None, DimensionSpec([Dimension("dim_1_2", S)], [None]))


class TestTreeSpecAccessors:
    def test_get_dimensions(self, branch_lvl_2, tree_1):
        assert not DimensionSpec().get_dimensions()
        entries = branch_lvl_2.get_dimensions()
        assert len(entries) == 1
        assert entries[0][0] == Dimension("dim_1_1", L)
        assert entries[0][1] == DimensionSpec([Dimension("dim_1_2", S)], [None])

        all_dims = [dim for dim, _ in tree_1.get_dimensions()]
        assert all_dims == [Dimension("dim_1_1", L), Dimension("dim_2_1", D)]

    def test_get_root_dimensions(self, branch_lvl_2, tree_1):
        assert not DimensionSpec().get_root_dimensions()
        assert list(tree_1.get_root_dimensions()) == [Dimension("dim_1_1", L), Dimension("dim_2_1", D)]
        assert list(branch_lvl_2.get_dimensions()[0][1].get_root_dimensions()) == [Dimension("dim_1_2", S)]

    def test_get_all_sub_dimensions(self, single_dim, branch_lvl_2, tree_1):
        assert not DimensionSpec().get_all_sub_dimensions()
        assert single_dim.get_all_sub_dimensions() == [None]
        assert branch_lvl_2.get_all_sub_dimensions() == [DimensionSpec([Dimension("dim_1_2", S)], [None])]
        assert tree_1.get_all_sub_dimensions() == [DimensionSpec([Dimension("dim_1_2", S)], [None]), None]

    def test_flattened_map_and_count(self, single_dim, branch_lvl_2, tree_1):
        assert not DimensionSpec().get_flattened_dimension_map()
        assert single_dim.get_flattened_dimension_map() == {"dim_1_1": Dimension("dim_1_1", L)}
        # DFS: each root followed by its subtree
        assert list(tree_1.get_flattened_dimension_map()) == ["dim_1_1", "dim_1_2", "dim_2_1"]
        assert DimensionSpec().get_total_dimension_count() == 0
        assert branch_lvl_2.get_total_dimension_count() == 2
        assert tree_1.get_total_dimension_count() == 3
        assert len(tree_1) == 3
        assert (
            DimensionSpec([Dimension("dim_1_1", L), Dimension("dim_1_2", L)], [None, None]).get_total_dimension_count()
            == 2
        )
        assert (
            DimensionSpec(
                [Dimension("dim_1_1", L), Dimension("dim_1_2", L)],
                [DimensionSpec([Dimension("dim_1_1_1", S), Dimension("dim_1_1_2", D)], [None, None]), None],
            ).get_total_dimension_count()
            == 4
        )

    def test_find_dimension_by_name(self, single_dim, tree_1):
        assert DimensionSpec().find_dimension_by_name("dim") is None
        assert single_dim.find_dimension_by_name("dim_1_1") == Dimension("dim_1_1", L)
        # nested + sibling-root lookups
        assert tree_1.find_dimension_by_name("dim_1_2") == Dimension("dim_1_2", S)
        assert tree_1.find_dimension_by_name("dim_2_1") == Dimension("dim_2_1", D)
        assert tree_1.find_dimension_by_name(None) is None

    def test_paths(self, tree_1):
        assert [[d.name for d in p] for p in tree_1.paths()] == [["dim_1_1", "dim_1_2"], ["dim_2_1"]]
        assert not tree_1.is_chain


class TestTreeSpecCompatibility:
    def test_empty(self):
        assert DimensionSpec().check_compatibility(None)
        assert DimensionSpec().check_compatibility([])
        assert DimensionSpec().check_compatibility(DimensionSpec())

    def test_single(self, single_dim):
        assert not single_dim.check_compatibility(None)
        assert not single_dim.check_compatibility([])
        assert not single_dim.check_compatibility(DimensionSpec())
        assert single_dim.check_compatibility(copy.deepcopy(single_dim))
        assert single_dim.check_compatibility(copy.deepcopy(single_dim), enable_breadth_check=False)
        # type check toggle: names never matter, types only when enabled
        other_type = DimensionSpec([Dimension("dim_1_1", S)], [None])
        assert single_dim.check_compatibility(other_type, enable_type_check=False)
        assert not single_dim.check_compatibility(other_type, enable_type_check=True)

    def test_list_compat(self, single_dim, branch_lvl_2, tree_1):
        assert single_dim.check_compatibility(["any value"])
        assert single_dim.check_compatibility(["any value"], enable_breadth_check=False)
        assert not single_dim.check_compatibility(["any 1", 2])
        assert branch_lvl_2.check_compatibility(["any 1", 2])
        assert not branch_lvl_2.check_compatibility(["any value"])
        # a branched tree never list-matches under breadth check
        assert not tree_1.check_compatibility([])
        assert not tree_1.check_compatibility(["dummy"])
        assert not tree_1.check_compatibility(["dummy 1", "dummy 2"])

    def test_shape_mismatches(self, single_dim, branch_lvl_2, tree_1):
        assert not single_dim.check_compatibility(branch_lvl_2)
        assert not branch_lvl_2.check_compatibility(single_dim)
        assert not single_dim.check_compatibility(branch_lvl_2, enable_type_check=False)
        assert not single_dim.check_compatibility(branch_lvl_2, enable_breadth_check=False)
        assert not single_dim.check_compatibility(tree_1)
        assert not single_dim.check_compatibility(tree_1, enable_breadth_check=False)

    def test_branched_same_structure_different_names(self, tree_1):
        # structure+type compatible, names differ — compatible (reference
        # _check_spec_compatibility ignores names)
        twin = DimensionSpec(
            [Dimension("a", L), Dimension("b", D)],
            [DimensionSpec([Dimension("c", S)], [None]), None],
        )
        assert tree_1.check_compatibility(twin)
        assert tree_1.compatible_with(twin)
        # same shape, branch types swapped — incompatible when typed
        swapped = DimensionSpec(
            [Dimension("a", D), Dimension("b", L)],
            [DimensionSpec([Dimension("c", S)], [None]), None],
        )
        assert not tree_1.check_compatibility(swapped)
        assert tree_1.check_compatibility(swapped, enable_type_check=False)


class TestCompensateAndSetSpec:
    def test_compensate_transfers_names(self, tree_1):
        # same structure, anonymous names — reference output-spec inference
        target = DimensionSpec(
            [Dimension("x", L), Dimension("y", D)],
            [DimensionSpec([Dimension("z", S)], [None]), None],
        )
        target.compensate(tree_1, overwrite=True)
        assert target.dimension_names() == ["dim_1_1", "dim_1_2", "dim_2_1"]

    def test_compensate_incompatible_raises(self, tree_1, single_dim):
        with pytest.raises(TypeError):
            single_dim.compensate(tree_1)

    def test_set_spec_retypes_variants(self):
        # reference test_dimension_filter.py:45-57: an untyped "*" /
        # relative filter adopts the spec's types via set_spec
        untyped = DimensionSpec([Dimension("dim", DimensionType.STRING)])
        f = DimensionFilter.load_raw(untyped, {"*": {}})
        dated = DimensionSpec([Dimension("day", D, {"format": "%Y-%m-%d"})])
        f.set_spec(dated)
        assert f.get_spec() is dated
        out = f.apply_values(["2024-01-10"])
        assert out.formatted_values() == [("2024-01-10",)]

    def test_set_spec_relative_keeps_range(self):
        untyped = DimensionSpec([Dimension("dim", DimensionType.STRING)])
        f = DimensionFilter.load_raw(untyped, {"_:-2": {}})
        f.set_spec(DimensionSpec([Dimension("day", D, {"format": "%Y-%m-%d"})]))
        out = f.apply_values(["2024-01-10"])
        assert out.formatted_values() == [("2024-01-10",), ("2024-01-09",)]

    def test_set_spec_breadth_mismatch_raises(self):
        f = DimensionFilter.load_raw(DimensionSpec([Dimension("a", S)]), ["v"])
        with pytest.raises(TypeError):
            f.set_spec(DimensionSpec([Dimension("a", S), Dimension("b", S)]))

    def test_set_spec_unparseable_value_raises(self):
        f = DimensionFilter.load_raw(DimensionSpec([Dimension("a", S)]), ["not a date"])
        with pytest.raises(TypeError):
            f.set_spec(DimensionSpec([Dimension("day", D)]))


class TestLoadFromPretty:
    def test_tree_round_trip(self):
        spec = DimensionSpec.load_from_pretty(
            {
                "region": {"type": "STRING", "day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
                "version": {"type": "LONG"},
            }
        )
        assert spec.get_total_dimension_count() == 3
        assert [d.name for d in spec.get_root_dimensions()] == ["region", "version"]
        assert spec.find_dimension_by_name("day").params["format"] == "%Y-%m-%d"
        assert not spec.is_chain
        # equal to the equivalent constructor form
        assert spec == DimensionSpec(
            [Dimension("region", S), Dimension("version", L)],
            [DimensionSpec([Dimension("day", D, {"format": "%Y-%m-%d"})], [None]), None],
        )

    def test_pretty_duplicate_raises(self):
        with pytest.raises(ValueError):
            DimensionSpec.load_from_pretty({"a": {"type": "STRING", "a": {"type": "LONG"}}})

    def test_empty(self):
        assert DimensionSpec.load_from_pretty(None) == DimensionSpec()
        assert DimensionSpec.load_from_pretty({}) == DimensionSpec()

    def test_pretty_round_trip(self, tree_1):
        # load_from_pretty(to_pretty(s)) == s, params included
        raw = {
            "region": {"type": "STRING", "insensitive": True,
                       "day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
            "version": {"type": "LONG", "digits": 4},
        }
        spec = DimensionSpec.load_from_pretty(raw)
        assert DimensionSpec.load_from_pretty(spec.to_pretty()) == spec
        assert spec.to_pretty() == raw
        assert DimensionSpec.load_from_pretty(tree_1.to_pretty()) == tree_1


class TestTreeProperties:
    """Property-based laws over randomly shaped spec trees."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
    types = st.sampled_from([S, L, D])

    @staticmethod
    def _tree(names: list, depth: int = 0):
        """Deterministic shape from a name pool: pairs of (root, maybe-sub)."""
        spec = DimensionSpec()
        i = 0
        while names:
            nm = names.pop()
            sub = None
            if names and depth < 2 and i % 2 == 0:
                sub = TestTreeProperties._tree([names.pop()], depth + 1)
            spec.add_dimension(Dimension(nm, [S, L, D][i % 3]), sub)
            i += 1
        return spec

    @given(st.lists(names, min_size=1, max_size=6, unique=True))
    @settings(max_examples=60, deadline=None)
    def test_flattened_count_and_find(self, pool):
        spec = self._tree(list(pool))
        flat = spec.get_flattened_dimension_map()
        assert len(flat) == spec.get_total_dimension_count() == len(pool)
        for nm in pool:
            assert spec.find_dimension_by_name(nm) is not None
        # paths cover every dimension exactly once
        seen = [d.name for p in spec.paths() for d in p]
        assert sorted(seen) == sorted(pool)

    @given(st.lists(names, min_size=1, max_size=6, unique=True))
    @settings(max_examples=60, deadline=None)
    def test_self_compatibility_and_equality(self, pool):
        spec = self._tree(list(pool))
        clone = copy.deepcopy(spec)
        assert spec == clone
        assert spec.check_compatibility(clone)
        # renaming a dim keeps compatibility (names ignored) but breaks ==
        clone2 = copy.deepcopy(spec)
        clone2.get_root_dimensions()[0].name = "zzz"
        assert spec.check_compatibility(clone2)
        assert spec != clone2

    @given(st.lists(names, min_size=2, max_size=6, unique=True))
    @settings(max_examples=60, deadline=None)
    def test_all_pass_chain_identity_on_trees(self, pool):
        spec = self._tree(list(pool))
        allp = DimensionFilter.all_pass(spec)
        out = allp.chain(allp)
        assert out is not None and len(out) == 1
        assert all(isinstance(v, AnyVariant) for v in out.branches[0])


class TestSignalOverTreeSpec:
    """Tree specs flow through the Signal layer (reference
    ``test_signal_link_node.py:503-512`` builds signals over a branched
    spec): flattened DFS order drives indexed filtering and links."""

    def test_signal_indexed_filtering_over_tree(self):
        from rheoceros_spark.signals import Signal

        tree = DimensionSpec.load_from_pretty(
            {
                "region": {"type": "STRING", "day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
                "version": {"type": "LONG"},
            }
        )
        sig = Signal("docs", None, tree)
        assert sig.dimension_names() == ["region", "day", "version"]
        refined = sig["NA"]["2024-01-10"][7]
        assert refined.filter.formatted_values() == [("NA", "2024-01-10", "7")]
        with pytest.raises(IndexError):
            refined[0]

    def test_signal_link_compat_rejects_alien_branch(self):
        from rheoceros_spark.signals import Signal

        chain = DimensionSpec([Dimension("region", S), Dimension("day", D)])
        tree = DimensionSpec(
            [Dimension("region", S), Dimension("alien", L)],
            [DimensionSpec([Dimension("day", D)], [None]), None],
        )
        a, b = Signal("a", None, chain), Signal("b", None, tree)
        # chaining filters across incompatible spec shapes yields None
        assert a.filter.chain(b.filter) is None


class TestDatasetPrettyDeclaration:
    """Reference front-end parity: datasets accept one pretty dict in
    place of Dimension objects (nested = chain; flat = insertion-order
    chain; a branched tree is rejected — one partition path hierarchy)."""

    def test_nested_pretty_chain(self):
        from rheoceros_spark.sources.datasets import ParquetDataset

        ds = ParquetDataset(
            "/data/docs/{}/{}",
            {"region": {"type": "STRING", "day": {"type": "DATETIME", "format": "%Y-%m-%d"}}},
        )
        assert ds.spec.dimension_names() == ["region", "day"]
        f = DimensionFilter.load_raw(ds.spec, ["NA", "2024-01-10"]).finalize()
        assert ds.materialize_paths(f) == ["/data/docs/NA/2024-01-10"]

    def test_flat_pretty_is_insertion_order_chain(self):
        from rheoceros_spark.sources.datasets import ParquetDataset

        ds = ParquetDataset(
            "/data/docs/{}/{}",
            {"region": {"type": "STRING"}, "day": {"type": "DATETIME"}},
        )
        assert ds.spec.dimension_names() == ["region", "day"]
        assert ds.spec.is_chain

    def test_branched_tree_rejected(self):
        from rheoceros_spark.sources.datasets import ParquetDataset

        with pytest.raises(ValueError, match="chain"):
            ParquetDataset(
                "/data/docs/{}/{}",
                {
                    "region": {"type": "STRING", "day": {"type": "DATETIME"}},
                    "version": {"type": "LONG"},
                },
            )


class TestFilterOverTreeSpec:
    """Filters instantiate every dimension of the tree — sibling roots
    are orthogonal partition coordinates (flattened DFS order)."""

    @pytest.fixture
    def tree(self):
        return DimensionSpec.load_from_pretty(
            {
                "region": {"type": "STRING", "day": {"type": "DATETIME", "format": "%Y-%m-%d"}},
                "version": {"type": "LONG"},
            }
        )

    def test_nested_dict_one_to_one(self, tree):
        f = DimensionFilter.load_raw(tree, {"NA": {"2024-01-10": {}}, 7: {}})
        assert f.formatted_values() == [("NA", "2024-01-10", "7")]
        assert f.to_sql_predicate() == "region = 'NA' AND day = '2024-01-10' AND version = 7"

    def test_nested_dict_trailing_wildcard(self, tree):
        f = DimensionFilter.load_raw(tree, {"NA": {"2024-01-10": {}}})
        [branch] = f.branches
        assert isinstance(branch[2], AnyVariant)
        assert f.to_sql_predicate() == "region = 'NA' AND day = '2024-01-10'"

    def test_nested_dict_ambiguous_raises(self, tree):
        with pytest.raises(TypeError):
            DimensionFilter.load_raw(tree, {"NA": {}, 7: {}, "EU": {}})

    def test_chain_fanout_still_works_inside_branch(self, tree):
        # the region->day sub-chain still fans out over sibling values
        f = DimensionFilter.load_raw(tree, {"NA": {"2024-01-10": {}, "2024-01-11": {}}, 7: {}})
        assert len(f) == 2

    def test_apply_values_over_flattened_order(self, tree):
        decl = DimensionFilter.all_pass(tree)
        out = decl.apply_values(["NA", "2024-01-10", 7])
        assert out.formatted_values() == [("NA", "2024-01-10", "7")]

    def test_chain_rejects_incompatible_tree(self, tree):
        flat3 = DimensionSpec(
            [Dimension("region", S), Dimension("day", D), Dimension("version", L)]
        )
        assert not tree.compatible_with(flat3)
        f_tree = DimensionFilter.all_pass(tree)
        f_chain = DimensionFilter.all_pass(flat3)
        assert f_tree.chain(f_chain) is None

    def test_values_of_reads_one_dimension(self, tree):
        f = DimensionFilter.load_raw(
            tree, {"NA": {"2024-01-10": {}, "2024-01-11": {}}, 7: {}}
        )
        assert f.values_of("region") == ["NA"]
        assert [d.day for d in f.values_of("day")] == [10, 11]
        assert f.values_of("version") == [7]
        with pytest.raises(KeyError):
            f.values_of("nope")

    def test_tree_filter_intersection(self, tree):
        decl = DimensionFilter.load_raw(tree, {"NA": {"*": {}}, "*": {}})
        ev = DimensionFilter.load_raw(tree, {"NA": {"2024-01-10": {}}, 7: {}})
        out = decl.chain(ev)
        assert out is not None
        assert out.formatted_values() == [("NA", "2024-01-10", "7")]
        # value mismatch on the region coordinate → empty (not None)
        ev2 = DimensionFilter.load_raw(tree, {"EU": {"2024-01-10": {}}, 7: {}})
        decl_na = DimensionFilter.load_raw(tree, {"NA": {"*": {}}, "*": {}})
        out2 = decl_na.chain(ev2)
        assert out2 is not None and len(out2) == 0
