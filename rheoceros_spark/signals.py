"""Signals and the link (partition-join) algebra.

A :class:`Signal` is a typed handle on a (possibly partitioned)
dataset + a :class:`~rheoceros_spark.dimensions.DimensionFilter` over
its partition domain (reference
``src/intelliflow/core/signal_processing/signal.py:204-231``).

A :class:`SignalLinkNode` declares how N input signals trigger
together: a matrix of :class:`SignalDimensionLink`s
(``lhs_dim ← func(rhs_dims...)``, reference ``signal.py:692-838``) —
effectively a **streaming equi-join on partition keys**.  Output
materialization maps the ready inputs' dimension values through the
output link matrix (reference
``routing_runtime_constructs.py:677-722``), and ``execute()``'s input
back-derivation inverts it (reference ``signal.py:1105``).

Spark mapping: the link matrix never touches rows — it selects which
**partitions** participate; rows are then processed by whatever
DataFrame plan the compute slot declares, so Catalyst still owns join
strategy, pushdown, and pruning.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Optional, Sequence, Union

from rheoceros_spark.dimensions import (
    AnyVariant,
    DimensionFilter,
    DimensionSpec,
    DimensionType,
    RelativeVariant,
    create_variant,
)

# identity mapper (reference DIMENSION_VARIANT_IDENTICAL_MAP_FUNC,
# dimension_constructs.py:666)
EQUALS: Callable[[Any], Any] = lambda x: x  # noqa: E731


class Signal:
    """Dataset handle + partition filter + input-mode flags.

    Input modes (reference ``signal.py:213-226``):

    * ``ref`` / :meth:`as_reference` — does not wait for an event; its
      partitions are derived from the other inputs (J4, the broadcast
      side of the partition join).
    * :meth:`nearest` / :meth:`latest` — within the declared range use
      the most recent **existing** partition (J5, as-of semantics).
    * :meth:`range_check` — trigger blocks until every partition in the
      range exists (completeness gate).
    """

    def __init__(
        self,
        alias: str,
        source: Any = None,  # DatasetDescriptor (sources.datasets) or None
        spec: Optional[DimensionSpec] = None,
        filter: Optional[DimensionFilter] = None,
        *,
        is_reference: bool = False,
        nearest_in_range: bool = False,
        range_check_required: bool = False,
        resource_id: Optional[str] = None,
    ):
        self.alias = alias
        # stable identity across per-node aliasing — events match routes by
        # resource, not by the node-local alias (reference maps incoming
        # paths to access specs, constructs.py:3293-3433)
        self.resource_id = resource_id or alias
        self.source = source
        self.spec = spec if spec is not None else DimensionSpec()
        self.filter = filter if filter is not None else DimensionFilter.all_pass(self.spec)
        self.is_reference = is_reference
        self.nearest_in_range = nearest_in_range
        self.range_check_required = range_check_required
        self._filter_cursor = 0  # next dimension the indexing API refines

    # -- input-mode fluent API (reference api filtered_views) -----------
    def as_reference(self) -> "Signal":
        s = self.clone()
        s.is_reference = True
        return s

    @property
    def ref(self) -> "Signal":
        return self.as_reference()

    def nearest(self) -> "Signal":
        s = self.clone()
        s.nearest_in_range = True
        return s

    def latest(self) -> "Signal":
        return self.nearest()

    def range_check(self, enabled: bool = True) -> "Signal":
        s = self.clone()
        s.range_check_required = enabled
        return s

    def with_alias(self, alias: str) -> "Signal":
        s = self.clone()
        s.alias = alias
        return s

    def clone(self) -> "Signal":
        s = copy.copy(self)
        s.filter = DimensionFilter(self.filter.spec, list(self.filter.branches))
        return s

    # -- indexed filtering API (F3, reference filtered_views.py:130-247) --
    def __getitem__(self, item: Any) -> "Signal":
        """``sig["NA"]``, ``sig["2020-05-06":"2020-05-30"]``, ``sig[:-7]``,
        ``sig[:-7:-2]`` (range with shift), ``sig["*"]`` — each call
        refines the *next* dimension in spec order."""
        if isinstance(item, tuple):
            raise TypeError("tuple indexing not supported; chain [] per dimension")  # parity: reference rejects tuples
        idx = self._filter_cursor
        dims = list(self.spec)
        if idx >= len(dims):
            raise IndexError(f"all {len(dims)} dimensions of '{self.alias}' already filtered")
        dim = dims[idx]
        if isinstance(item, slice):
            variants = self._slice_to_variants(item, dim)
        else:
            variants = [create_variant(item, dim)]
        refine = DimensionFilter(
            self.spec,
            [
                tuple(
                    variants_v if i == idx else AnyVariant(d)
                    for i, d in enumerate(dims)
                )
                for variants_v in variants
            ],
        )
        chained = self.filter.chain(refine)
        if chained is None:
            raise ValueError(f"filter value {item!r} incompatible with dimension {dim!r}")
        s = self.clone()
        s.filter = chained
        s._filter_cursor = idx + 1
        return s

    @staticmethod
    def _slice_to_variants(item: slice, dim) -> list:
        if item.start is None and isinstance(item.stop, int) and item.stop < 0:
            # [: -N [: shift]] → relative range (N values incl. datum)
            shift = item.step or 0
            return [RelativeVariant(item.stop, shift, dim)]
        if item.start is not None and item.stop is not None:
            # explicit closed range → concrete values start..stop
            lo = create_variant(item.start, dim)
            hi = create_variant(item.stop, dim)
            from rheoceros_spark.dimensions import _step_variant, _values_equal

            out = [lo]
            cur = lo
            for _ in range(10_000):
                if _values_equal(cur, hi):
                    break
                cur = _step_variant(cur, 1)
                out.append(cur)
            else:
                raise ValueError("explicit range too large")
            return out
        raise ValueError(f"unsupported slice {item!r}")

    # -- materialization ---------------------------------------------------
    @property
    def domain_is_material(self) -> bool:
        return self.filter.is_material

    def materialize(self, values: Sequence[Any]) -> "Signal":
        """Apply runtime event values; relative ranges fold to concrete
        partition values (TIP first)."""
        s = self.clone()
        s.filter = self.filter.apply_values(list(values))
        return s

    def dimension_names(self) -> list[str]:
        return self.spec.dimension_names()

    def __repr__(self) -> str:
        flags = "".join(
            f
            for f, on in (
                (" ref", self.is_reference),
                (" nearest", self.nearest_in_range),
                (" range_check", self.range_check_required),
            )
            if on
        )
        return f"Signal({self.alias!r}, {self.filter!r}{flags})"


class SignalDimensionLink:
    """``lhs_dim ← func(rhs_dims...)`` (reference signal.py:695-711).

    ``func`` is any Python callable over the RHS dimension **values**
    (N-ary supported); ``EQUALS`` is the identity.
    """

    def __init__(
        self,
        lhs: tuple[str, str],  # (signal alias, dim name)
        func: Callable[..., Any],
        rhs: Union[tuple[str, str], Sequence[tuple[str, str]]],
    ):
        self.lhs = lhs
        self.func = func or EQUALS
        self.rhs: list[tuple[str, str]] = [rhs] if isinstance(rhs, tuple) and isinstance(rhs[0], str) else list(rhs)

    def map(self, rhs_values: Sequence[Any]) -> Any:
        return self.func(*rhs_values)

    def __repr__(self) -> str:
        return f"Link({self.lhs} <- f{tuple(self.rhs)})"


class SignalLinkNode:
    """N input signals + link matrix (reference signal.py:692-838)."""

    def __init__(self, signals: Sequence[Signal]):
        aliases = [s.alias for s in signals]
        if len(set(aliases)) != len(aliases):
            raise ValueError(f"duplicate input aliases: {aliases}")
        self.signals = list(signals)
        self.links: list[SignalDimensionLink] = []

    @property
    def independent_signals(self) -> list[Signal]:
        """Inputs that must receive an event (non-reference)."""
        return [s for s in self.signals if not s.is_reference]

    def signal(self, alias: str) -> Signal:
        for s in self.signals:
            if s.alias == alias:
                return s
        raise KeyError(alias)

    def add_link(self, link: SignalDimensionLink) -> None:
        self.links.append(link)

    def compensate_missing_links(self) -> None:
        """Auto-equality links on shared dimension names (J2, reference
        signal.py:1341 / application.py:1393-1397).

        A dimension is *covered* for a signal pair when ANY declared
        link touches it on both sides — including multi-rhs computed
        links like ``(('a','day'), f, [('b','day'), ('b','hour')])``.
        The earlier exact single-rhs match would add a contradictory
        auto ``a.day == b.day`` next to such a link, and propagate's
        backward pass would then derive wrong partition values."""
        def covered(sa: str, sb: str, name: str) -> bool:
            for l in self.links:
                endpoints = [l.lhs] + list(l.rhs)
                if ((sa, name) in endpoints) and any(e[0] == sb for e in endpoints):
                    return True
                if ((sb, name) in endpoints) and any(e[0] == sa for e in endpoints):
                    return True
            return False

        for i, a in enumerate(self.signals):
            for b in self.signals[i + 1:]:
                for name in set(a.dimension_names()) & set(b.dimension_names()):
                    if not covered(a.alias, b.alias, name):
                        self.links.append(SignalDimensionLink((a.alias, name), EQUALS, (b.alias, name)))

    # -- value propagation -------------------------------------------------
    def propagate(self, seeds: dict[str, dict[str, Any]]) -> dict[str, dict[str, Any]]:
        """Given material dim values of one or more signals, derive every
        other signal's linked dim values by walking the link matrix both
        directions until fixpoint (tips-aligned join check uses the
        head value only — reference routing_runtime_constructs.py:490-498)."""
        known: dict[str, dict[str, Any]] = {a: dict(v) for a, v in seeds.items()}
        changed = True
        while changed:
            changed = False
            for link in self.links:
                l_alias, l_dim = link.lhs
                # forward: rhs known → lhs
                if all(r[0] in known and r[1] in known[r[0]] for r in link.rhs):
                    val = link.map([known[r[0]][r[1]] for r in link.rhs])
                    if known.setdefault(l_alias, {}).get(l_dim) != val:
                        if l_dim not in known[l_alias]:
                            known[l_alias][l_dim] = val
                            changed = True
                # backward (only invertible = identity 1:1 links)
                if (
                    link.func is EQUALS
                    and len(link.rhs) == 1
                    and l_alias in known
                    and l_dim in known[l_alias]
                ):
                    r_alias, r_dim = link.rhs[0]
                    if r_dim not in known.setdefault(r_alias, {}):
                        known[r_alias][r_dim] = known[l_alias][l_dim]
                        changed = True
        return known


def expand_literal_lists(out_values: dict[str, Any]) -> list[dict[str, Any]]:
    """Projection fan-out (reference application.py:4532-4660): a
    list/tuple literal in the output values expands to one output
    partition per value (cartesian across projected dimensions)."""
    combos: list[dict[str, Any]] = [{}]
    for k, v in out_values.items():
        vals = list(v) if isinstance(v, (list, tuple)) else [v]
        combos = [{**c, k: val} for c in combos for val in vals]
    return combos


class OutputDimensionLink:
    """Output dim ← func(input dims) or literal assignment
    (reference application.py:1426-1451).

    A link may also run the OTHER way — input dim ← func(output dim)
    (``reverse=True``, built via :meth:`to_input`): the reference's
    bidirectional non-trivial linking
    (``test_aws_application_output_parametrization.py:46-110`` declares
    ``(timer("time"), lambda d: d + 7days, "cutoff_date")`` next to the
    forward ``-7days`` lambda).  Forward lambdas are not invertible
    mechanically, so without the reverse link ``execute(node[out])``
    cannot back-derive the input partition.  Reverse links are used
    ONLY by input back-derivation; forward output materialization
    skips them (applying the inverse function forward would be wrong).
    """

    def __init__(self, output_dim: str, func: Optional[Callable[..., Any]] = None,
                 rhs: Optional[Sequence[tuple[str, str]]] = None, literal: Any = None,
                 reverse: bool = False):
        self.output_dim = output_dim
        self.func = func
        self.rhs = list(rhs or [])
        self.literal = literal
        self.reverse = reverse

    @classmethod
    def from_input(cls, output_dim: str, input_alias: str, input_dim: str,
                   func: Callable[..., Any] = EQUALS) -> "OutputDimensionLink":
        return cls(output_dim, func, [(input_alias, input_dim)])

    @classmethod
    def to_input(cls, input_alias: str, input_dim: str, output_dim: str,
                 func: Callable[..., Any] = EQUALS) -> "OutputDimensionLink":
        """input dim ← func(output dim) — see class docstring."""
        return cls(output_dim, func, [(input_alias, input_dim)], reverse=True)

    @classmethod
    def from_literal(cls, output_dim: str, value: Any) -> "OutputDimensionLink":
        return cls(output_dim, literal=value)
