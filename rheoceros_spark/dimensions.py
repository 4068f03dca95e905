"""Dimension (partition) algebra — pure Python, no Spark dependency.

Re-expresses the reference's dimension model (reference
``src/intelliflow/core/signal_processing/dimension_constructs.py``,
~2700 LoC) as a lean algebra over **partition columns**:

* :class:`Dimension` / :class:`DimensionSpec` — ordered, typed
  partition attributes (reference ``dimension_constructs.py:38-221``).
* :class:`DimensionVariant` subclasses — concrete or special values of
  a dimension: ``AnyVariant`` (``"*"``, reference ``:921-976``),
  ``RelativeVariant`` (``"_:-N[:shift]"``, reference ``:979-1201``),
  ``StringVariant`` (``:1204-1300``), ``DateVariant`` (``:1519-1838``),
  ``LongVariant`` (``:1853-1873``).
* :class:`DimensionFilter` — a set of partition-value branches with
  ``chain`` (intersection / refinement, reference ``:2096-2227``) and
  ``apply_values`` (finalize: fold relative ranges into concrete
  partition values, reference ``:2087-2088``).

Spark mapping: a finalized filter is exactly a **partition predicate**
— the engine turns it into a concrete path list (partition pruning
before the scan) or a ``Column`` conjunction.  Chaining two filters is
predicate conjunction; a wildcard contributes no predicate.

Semantics preserved from the reference (SURVEY.md §7.3 traps):

* ``_:-N`` includes the datum — N values total (reference
  ``dimension_constructs.py:1133-1142``).
* shift ``_:-N:S`` moves the anchor *before* expansion (``:565-578``).
* ``chain`` returns ``None`` on spec (breadth/type) mismatch but an
  **empty filter** on value mismatch (``:2169-2173``).
* date arithmetic respects granularity (``:1751-1793``); parsing is
  fuzzy via ``dateutil`` with strptime fallback (``:1522-1568``).
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta
from enum import Enum
from itertools import product
from typing import Any, Callable, Iterable, Optional, Sequence, Union

try:  # fuzzy date parsing parity (reference dimension_constructs.py:1522-1568)
    from dateutil import parser as _dateutil_parser
    from dateutil.relativedelta import relativedelta as _relativedelta
except ImportError:  # pragma: no cover - dateutil ships with pandas
    _dateutil_parser = None
    _relativedelta = None

ANY = "*"

# Cap on values a single relative range may expand to (reference
# MAX_RANGE_LIMIT, dimension_constructs.py:822).
MAX_RANGE_LIMIT = 9999


class DimensionType(str, Enum):
    """Reference supports exactly these three (dimension_defs.py:12-17)."""

    STRING = "STRING"
    LONG = "LONG"
    DATETIME = "DATETIME"


class DatetimeGranularity(str, Enum):
    """Reference dimension_defs.py:50-57."""

    MINUTE = "MINUTE"
    HOUR = "HOUR"
    DAY = "DAY"
    WEEK = "WEEK"
    MONTH = "MONTH"
    YEAR = "YEAR"


class Dimension:
    """A named, typed partition attribute (reference dimension_constructs.py:38-148).

    ``params`` carries the per-type options: ``format`` (strftime for
    DATETIME, callable for STRING), ``granularity``, ``digits``,
    ``insensitive``, ``min``.
    """

    def __init__(self, name: str, type: DimensionType = DimensionType.STRING, params: Optional[dict] = None):
        self.name = name
        self.type = DimensionType(type)
        self.params = dict(params or {})

    @property
    def granularity(self) -> DatetimeGranularity:
        return DatetimeGranularity(self.params.get("granularity", DatetimeGranularity.DAY))

    @property
    def format(self):
        return self.params.get("format")

    def __repr__(self) -> str:
        return f"Dimension({self.name!r}, {self.type.value})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Dimension) and self.name == other.name and self.type == other.type

    def __hash__(self) -> int:
        return hash((self.name, self.type))


_UNSET = object()  # distinguishes the legacy 1-arg chain form from an explicit None


class DimensionSpec:
    """Tree of Dimensions: each level holds one or more sibling
    dimensions, each with an optional sub-spec of its own (reference
    ``dimension_constructs.py:173-221``).

    Two construction forms:

    * **chain (legacy / Spark-native)** — ``DimensionSpec([d1, d2])``:
      an ordered list of partition columns, stored as a single
      root-to-leaf chain (``partitionBy(d1, d2)``).  This is the shape
      every dataset in the engine uses.
    * **tree (reference parity)** — ``DimensionSpec([d1, d2], [sub1,
      None])``: sibling root dimensions with *different* sub-dimension
      structures (reference tests ``test_dimension_spec.py``
      ``dimension_spec_tree_1``).  Mirrors the reference constructor
      exactly, including its validation: list-length mismatch and
      duplicate dimension names raise ``ValueError``.

    Spark mapping for trees: the DFS-flattened dimension order is the
    partition-column order (reference ``get_flattened_dimension_map``,
    ``dimension_constructs.py:255-272`` — "branches follow each other
    according to the order within this spec"); sibling roots are
    orthogonal partition coordinates, so a concrete instantiation
    carries a value for every dimension in the tree.
    """

    def __init__(
        self,
        dimensions: Optional[Sequence[Dimension]] = None,
        sub_dim_specs: Any = _UNSET,
    ):
        self._entries: list[tuple[Dimension, Optional["DimensionSpec"]]] = []
        if sub_dim_specs is _UNSET:
            # legacy chain form: ordered partition columns = one chain
            dims = list(dimensions or ())
            sub: Optional[DimensionSpec] = None
            for d in reversed(dims):
                node = DimensionSpec()
                node._entries = [(d, sub)]
                sub = node
            if sub is not None:
                self._entries = sub._entries
            return
        # reference tree form (dimension_constructs.py:210-230)
        if (dimensions and not sub_dim_specs) or (not dimensions and sub_dim_specs):
            raise ValueError(
                "DimensionSpec: the dimension list and sub-spec list must be "
                "given together and have equal length."
            )
        if dimensions and sub_dim_specs:
            if len(dimensions) != len(sub_dim_specs):
                raise ValueError(
                    "DimensionSpec: the dimension list and sub-spec list must be "
                    "given together and have equal length."
                )
            for dim, sub_spec in zip(dimensions, sub_dim_specs):
                self.add_dimension(dim, sub_spec)

    # -- loaders ---------------------------------------------------------
    @classmethod
    def load(cls, raw: dict[str, Any]) -> "DimensionSpec":
        """Legacy chain loader: ``{name: {type: ..., [params]}}``,
        insertion order = partition-column order (every key is a
        dimension; no nesting)."""
        dims = []
        for name, params in raw.items():
            params = dict(params or {})
            typ = DimensionType(params.pop("type", DimensionType.STRING))
            dims.append(Dimension(name, typ, params))
        return cls(dims)

    @classmethod
    def load_from_pretty(cls, raw: Optional[dict[str, Any]]) -> "DimensionSpec":
        """Reference pretty-format tree loader (``dimension_constructs.py
        :421-470``): dict-valued entries are sub-dimensions, everything
        else is a param of the enclosing dimension; ``type`` names the
        dimension type.

        >>> DimensionSpec.load_from_pretty(
        ...     {"region": {"type": "STRING", "day": {"type": "DATETIME"}},
        ...      "version": {"type": "LONG"}})
        """
        spec = cls()
        if not raw:
            return spec
        for name, value in raw.items():
            if not isinstance(value, dict):
                raise ValueError(f"dimension {name!r} must map to a dict, got {value!r}")
            params = {k: v for k, v in value.items() if not isinstance(v, dict) and k != "type"}
            typ = DimensionType(value.get("type", DimensionType.STRING))
            sub_raw = {k: v for k, v in value.items() if isinstance(v, dict)}
            sub = cls.load_from_pretty(sub_raw) if sub_raw else None
            spec.add_dimension(Dimension(name, typ, params), sub)
        return spec

    def to_pretty(self) -> dict[str, Any]:
        """Inverse of :meth:`load_from_pretty` (the reference declares
        ``pretty()`` but leaves it a stub, ``dimension_constructs.py:472``;
        the branch-list tree makes it a direct dump)."""
        out: dict[str, Any] = {}
        for dim, sub in self._entries:
            node: dict[str, Any] = {"type": dim.type.value}
            node.update(dim.params)
            if sub:
                node.update(sub.to_pretty())
            out[dim.name] = node
        return out

    # -- tree API (reference parity) -------------------------------------
    def add_dimension(
        self,
        dimension: Dimension,
        sub_dimensions: Optional["DimensionSpec"],
        check_duplicate_names: bool = True,
    ) -> "DimensionSpec":
        """Append a root dimension with its sub-spec (reference
        ``dimension_constructs.py:224-233``)."""
        if dimension is None:
            raise ValueError("Cannot add dimension of NoneType to spec!")
        if check_duplicate_names:
            if self.find_dimension_by_name(dimension.name) or (
                sub_dimensions and sub_dimensions.find_dimension_by_name(dimension.name)
            ):
                raise ValueError(f"Cannot add dimension! Duplicate dimension name {dimension.name!r}")
            if sub_dimensions:
                # the new entry's whole subtree must also be disjoint from
                # the existing tree, else the flattened map collapses keys
                # and branch widths disagree with the dimension count
                for nm in sub_dimensions.get_flattened_dimension_map():
                    if self.find_dimension_by_name(nm):
                        raise ValueError(f"Cannot add dimension! Duplicate dimension name {nm!r}")
        self._entries.append((dimension, sub_dimensions if sub_dimensions else None))
        return self

    def get_dimensions(self) -> list[tuple[Dimension, Optional["DimensionSpec"]]]:
        return list(self._entries)

    def get_root_dimensions(self) -> list[Dimension]:
        return [d for d, _ in self._entries]

    def get_all_sub_dimensions(self) -> list[Optional["DimensionSpec"]]:
        return [s for _, s in self._entries]

    def get_flattened_dimension_map(self) -> dict[str, Dimension]:
        """DFS order: each root followed by its whole subtree
        (reference ``dimension_constructs.py:255-272``)."""
        out: dict[str, Dimension] = {}
        for dim, sub in self._entries:
            out[dim.name] = dim
            if sub:
                out.update(sub.get_flattened_dimension_map())
        return out

    def get_total_dimension_count(self) -> int:
        return sum(1 + (sub.get_total_dimension_count() if sub else 0) for _, sub in self._entries)

    def find_dimension_by_name(self, name: Optional[str]) -> Optional[Dimension]:
        if name is None:
            return None
        for dim, sub in self._entries:
            if dim.name == name:
                return dim
            if sub:
                found = sub.find_dimension_by_name(name)
                if found:
                    return found
        return None

    def paths(self) -> list[list[Dimension]]:
        """All root-to-leaf dimension chains (one per leaf)."""
        out: list[list[Dimension]] = []
        for dim, sub in self._entries:
            if sub:
                out.extend([dim] + p for p in sub.paths())
            else:
                out.append([dim])
        return out

    @property
    def is_chain(self) -> bool:
        """True when every level has exactly one dimension — the shape
        a single ``partitionBy`` hierarchy maps to."""
        node: Optional[DimensionSpec] = self
        while node:
            if len(node._entries) != 1:
                return len(node._entries) == 0
            node = node._entries[0][1]
        return True

    # -- compatibility ----------------------------------------------------
    def check_compatibility(
        self,
        other: Union["DimensionSpec", Sequence[Any], None],
        enable_breadth_check: bool = True,
        enable_type_check: bool = True,
    ) -> bool:
        """Reference ``check_compatibility`` (``dimension_constructs.py
        :296-388``): structural (+ optional type) check against another
        spec, or breadth/depth check against a flat value list (list
        compat requires a pure chain; values are not type-checked)."""
        if isinstance(other, DimensionSpec) or other is None:
            return self._spec_compatible(self, other, enable_breadth_check, enable_type_check)
        return self._list_compatible(self, list(other), enable_breadth_check)

    @classmethod
    def _spec_compatible(
        cls,
        a: Optional["DimensionSpec"],
        b: Optional["DimensionSpec"],
        breadth: bool,
        typed: bool,
    ) -> bool:
        if not a and not b:
            return True
        if not a or not b:
            return False
        if breadth and len(a._entries) != len(b._entries):
            return False
        for (da, sa), (db, sb) in zip(a._entries, b._entries):
            if typed and da.type != db.type:
                return False
            if not cls._spec_compatible(sa, sb, breadth, typed):
                return False
            if not breadth:
                break
        return True

    @classmethod
    def _list_compatible(cls, spec: Optional["DimensionSpec"], values: list, breadth: bool) -> bool:
        if not values and not spec:
            return True
        if not values or not spec:
            return False
        if breadth and len(spec._entries) != 1:
            return False
        return cls._list_compatible(spec._entries[0][1], values[1:], breadth)

    def compatible_with(self, other: "DimensionSpec") -> bool:
        """Structural (breadth + type) compatibility (reference :296-388, 2229-2259)."""
        return self.check_compatibility(other)

    def compensate(self, other: "DimensionSpec", overwrite: bool = False) -> None:
        """Transfer names (and, with ``overwrite``, types/params) from a
        structurally identical spec onto this one (reference
        ``dimension_constructs.py:390-419`` — used for output-spec
        inference).  ``TypeError`` on structural mismatch."""
        if not self.check_compatibility(other, enable_type_check=False):
            raise TypeError("Cannot transfer names between incompatible DimensionSpecs!")
        for (dim, sub), (odim, osub) in zip(self._entries, other._entries):
            if overwrite or dim.name is None:
                dim.name = odim.name
            if overwrite or dim.type is None:
                dim.type = odim.type
            if overwrite and odim.params:
                dim.params = dict(odim.params)
            if sub and osub:
                sub.compensate(osub, overwrite)

    # -- flat (chain) conveniences ---------------------------------------
    @property
    def dimensions(self) -> list[Dimension]:
        """DFS-flattened dimension list = the partition-column order."""
        return list(self.get_flattened_dimension_map().values())

    def dimension_names(self) -> list[str]:
        return list(self.get_flattened_dimension_map().keys())

    def find(self, name: str) -> Optional[Dimension]:
        return self.find_dimension_by_name(name)

    def __len__(self) -> int:
        return self.get_total_dimension_count()

    def __iter__(self):
        return iter(self.dimensions)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, DimensionSpec):
            return NotImplemented
        return len(self._entries) == len(other._entries) and all(
            da == db and (sa == sb if (sa and sb) else not sa and not sb)
            for (da, sa), (db, sb) in zip(self._entries, other._entries)
        )

    def __repr__(self) -> str:
        inner = ", ".join(
            f"{d!r}" + (f" -> {s!r}" if s else "") for d, s in self._entries
        )
        return f"DimensionSpec({inner})"


# ---------------------------------------------------------------------------
# Variants
# ---------------------------------------------------------------------------

_RELATIVE_RE = re.compile(r"^_:(-?\d+)(?::(-?\d+))?$")


class DimensionVariant:
    """A value of a dimension — concrete, or special (reference :507-662)."""

    is_material = True  # AnyVariant / RelativeVariant override to False

    def __init__(self, value: Any, dim: Optional[Dimension] = None):
        self.value = value
        self.dim = dim or Dimension("dim", DimensionType.STRING)

    # -- intersection (the heart of filter chaining) --------------------
    def intersect(self, other: "DimensionVariant") -> Optional[list["DimensionVariant"]]:
        """Return the refined variant list for ``self ∩ other``; None if disjoint.

        Mirrors the reference's polymorphic both-direction ``apply``
        retry (``dimension_constructs.py:587-627``): callers try
        ``a.intersect(b)`` then ``b.intersect(a)``.
        """
        if isinstance(other, AnyVariant):
            return [self]
        if self._eq_value(other):
            return [self]
        return None

    def _eq_value(self, other: "DimensionVariant") -> bool:
        return _values_equal(self, other)

    # -- rendering -------------------------------------------------------
    def raw(self) -> Any:
        return self.value

    def formatted(self) -> str:
        return str(self.value)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.value!r})"


class AnyVariant(DimensionVariant):
    """Wildcard ``"*"`` — matches everything, contributes no predicate
    (reference dimension_constructs.py:921-976)."""

    is_material = False

    def __init__(self, dim: Optional[Dimension] = None):
        super().__init__(ANY, dim)

    def intersect(self, other: DimensionVariant) -> Optional[list[DimensionVariant]]:
        return [other]

    def formatted(self) -> str:
        return ANY


class RelativeVariant(DimensionVariant):
    """``_:-N[:shift]`` — a relative range of N values anchored at a
    runtime datum (reference dimension_constructs.py:979-1201).

    ``relative_index=-N`` expands to N values *including the datum*
    (``:1133-1142``); ``shift`` moves the anchor before expansion
    (``:565-578``).  Non-material until a datum is applied.
    """

    is_material = False

    def __init__(self, relative_index: int, shift: int = 0, dim: Optional[Dimension] = None):
        if abs(relative_index) > MAX_RANGE_LIMIT:
            raise ValueError(f"relative range exceeds MAX_RANGE_LIMIT={MAX_RANGE_LIMIT}")
        super().__init__(f"_:{relative_index}" + (f":{shift}" if shift else ""), dim)
        self.relative_index = relative_index
        self.shift = shift

    @classmethod
    def parse(cls, raw: str, dim: Optional[Dimension] = None) -> Optional["RelativeVariant"]:
        m = _RELATIVE_RE.match(raw)
        if not m:
            return None
        return cls(int(m.group(1)), int(m.group(2) or 0), dim)

    def intersect(self, other: DimensionVariant) -> Optional[list[DimensionVariant]]:
        if isinstance(other, AnyVariant):
            return [self]
        if isinstance(other, RelativeVariant):
            # range ∩ range → the narrower range (reference :1067-1108)
            idx = self.relative_index if abs(self.relative_index) <= abs(other.relative_index) else other.relative_index
            return [RelativeVariant(idx, self.shift or other.shift, self.dim)]
        # concrete datum applied to a declared relative → anchored range
        return [AnchoredRangeVariant(other, self.relative_index, self.shift, other.dim or self.dim)]

    def expand(self, datum: DimensionVariant) -> list[DimensionVariant]:
        return AnchoredRangeVariant(datum, self.relative_index, self.shift, datum.dim).expand()


class AnchoredRangeVariant(DimensionVariant):
    """A relative range whose anchor is known — expands to concrete
    values at finalize time, newest (TIP) first."""

    is_material = False

    def __init__(self, anchor: DimensionVariant, relative_index: int, shift: int = 0, dim: Optional[Dimension] = None):
        super().__init__(anchor.value, dim or anchor.dim)
        self.anchor = anchor
        self.relative_index = relative_index
        self.shift = shift

    def expand(self) -> list[DimensionVariant]:
        n = abs(self.relative_index) or 1
        step = -1 if self.relative_index <= 0 else 1
        anchor = self.anchor
        if self.shift:
            anchor = _step_variant(anchor, self.shift)
        out = [anchor]
        cur = anchor
        for _ in range(n - 1):
            cur = _step_variant(cur, step)
            out.append(cur)
        return out  # TIP first (reference orders ranges most-recent first)


class StringVariant(DimensionVariant):
    """STRING value; params ``format`` (callable) and ``insensitive``
    (reference dimension_constructs.py:1204-1300)."""

    def __init__(self, value: str, dim: Optional[Dimension] = None):
        dim = dim or Dimension("dim", DimensionType.STRING)
        fmt: Optional[Callable[[str], str]] = dim.params.get("format")
        value = str(value)
        if fmt:
            value = fmt(value)
        super().__init__(value, dim)

    @property
    def insensitive(self) -> bool:
        return bool(self.dim.params.get("insensitive"))

    def _eq_value(self, other: DimensionVariant) -> bool:
        a, b = str(self.value), str(other.value)
        if self.insensitive or bool(getattr(other, "insensitive", False)):
            return a.lower() == b.lower()
        return a == b


class LongVariant(DimensionVariant):
    """LONG value; param ``digits`` → zero-padded rendering
    (reference dimension_constructs.py:1853-1873)."""

    def __init__(self, value: Union[int, str], dim: Optional[Dimension] = None):
        super().__init__(int(value), dim or Dimension("dim", DimensionType.LONG))

    def formatted(self) -> str:
        digits = self.dim.params.get("digits")
        return str(self.value).zfill(int(digits)) if digits else str(self.value)


class DateVariant(DimensionVariant):
    """DATETIME value; params ``format`` (strftime), ``granularity``,
    ``min`` (reference dimension_constructs.py:1519-1838)."""

    def __init__(self, value: Union[str, datetime, date], dim: Optional[Dimension] = None):
        dim = dim or Dimension("dim", DimensionType.DATETIME)
        dt = _parse_datetime(value, dim.params.get("format"))
        if dt is None:
            raise ValueError(f"cannot parse datetime from {value!r}")
        super().__init__(dt, dim)
        min_guard = dim.params.get("min")
        if min_guard is not None:
            min_dt = _parse_datetime(min_guard, dim.params.get("format"))
            if min_dt is not None and dt < min_dt:
                raise ValueError(f"datetime {dt} below min guard {min_dt}")

    def _eq_value(self, other: DimensionVariant) -> bool:
        odt = other.value if isinstance(other.value, datetime) else _parse_datetime(other.value, self.dim.params.get("format"))
        if odt is None:
            return False
        g = self.dim.granularity
        return _truncate(self.value, g) == _truncate(odt, g)

    def formatted(self) -> str:
        fmt = self.dim.params.get("format") or _DEFAULT_DATE_FORMAT[self.dim.granularity]
        return self.value.strftime(fmt)


_DEFAULT_DATE_FORMAT = {
    DatetimeGranularity.MINUTE: "%Y-%m-%d %H:%M",
    DatetimeGranularity.HOUR: "%Y-%m-%d %H",
    DatetimeGranularity.DAY: "%Y-%m-%d",
    DatetimeGranularity.WEEK: "%Y-%m-%d",
    DatetimeGranularity.MONTH: "%Y-%m",
    DatetimeGranularity.YEAR: "%Y",
}


def _truncate(dt: datetime, g: DatetimeGranularity) -> datetime:
    if g == DatetimeGranularity.MINUTE:
        return dt.replace(second=0, microsecond=0)
    if g == DatetimeGranularity.HOUR:
        return dt.replace(minute=0, second=0, microsecond=0)
    if g == DatetimeGranularity.DAY:
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if g == DatetimeGranularity.WEEK:
        day = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return day - timedelta(days=day.weekday())
    if g == DatetimeGranularity.MONTH:
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)


def _parse_datetime(value: Any, fmt: Optional[str] = None) -> Optional[datetime]:
    """strptime-with-format first, then fuzzy dateutil fallback
    (order per reference resolver, dimension_constructs.py:1795-1838)."""
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    s = str(value)
    if fmt:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            pass
    if _dateutil_parser is not None:
        try:
            return _dateutil_parser.parse(s)
        except (ValueError, OverflowError):
            pass
    for f in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d", "%Y%m%d", "%Y-%m", "%Y"):
        try:
            return datetime.strptime(s, f)
        except ValueError:
            continue
    return None


def _step_variant(v: DimensionVariant, step: int) -> DimensionVariant:
    """One granularity step (+/-) — reference date arithmetic respects
    granularity via timedelta/relativedelta (dimension_constructs.py:1751-1793)."""
    if isinstance(v, DateVariant):
        g = v.dim.granularity
        dt = v.value
        if g == DatetimeGranularity.MINUTE:
            nd = dt + timedelta(minutes=step)
        elif g == DatetimeGranularity.HOUR:
            nd = dt + timedelta(hours=step)
        elif g == DatetimeGranularity.DAY:
            nd = dt + timedelta(days=step)
        elif g == DatetimeGranularity.WEEK:
            nd = dt + timedelta(weeks=step)
        elif g == DatetimeGranularity.MONTH:
            nd = dt + _relativedelta(months=step) if _relativedelta else _add_months(dt, step)
        else:
            nd = dt + _relativedelta(years=step) if _relativedelta else _add_months(dt, 12 * step)
        return DateVariant(nd, v.dim)
    if isinstance(v, LongVariant):
        return LongVariant(v.value + step, v.dim)
    raise TypeError(f"relative range not supported for {type(v).__name__} (STRING dims have no order)")


def _add_months(dt: datetime, months: int) -> datetime:  # pragma: no cover - relativedelta present
    m = dt.month - 1 + months
    y, m = dt.year + m // 12, m % 12 + 1
    import calendar

    return dt.replace(year=y, month=m, day=min(dt.day, calendar.monthrange(y, m)[1]))


def _values_equal(a: DimensionVariant, b: DimensionVariant) -> bool:
    if isinstance(a, DateVariant):
        return a._eq_value(b)
    if isinstance(b, DateVariant):
        return b._eq_value(a)
    if isinstance(a, LongVariant) or isinstance(b, LongVariant):
        try:
            return int(a.value) == int(b.value)
        except (TypeError, ValueError):
            return False
    if isinstance(a, StringVariant):
        return a._eq_value(b)
    if isinstance(b, StringVariant):
        return b._eq_value(a)
    return a.value == b.value


def create_variant(value: Any, dim: Optional[Dimension] = None) -> DimensionVariant:
    """Type-inferring factory (reference ``DimensionVariantFactory.create_variant``,
    dimension_constructs.py:807-918): explicit dim type wins, else
    resolvers score the raw value (special > long > datetime > string)."""
    if isinstance(value, DimensionVariant):
        return value
    if isinstance(value, str):
        if value == ANY:
            return AnyVariant(dim)
        rel = RelativeVariant.parse(value, dim)
        if rel is not None:
            return rel
    if dim is not None:
        if dim.type == DimensionType.LONG:
            return LongVariant(value, dim)
        if dim.type == DimensionType.DATETIME:
            return DateVariant(value, dim)
        return StringVariant(value, dim)
    # no declared dim → infer
    if isinstance(value, bool):
        return StringVariant(str(value))
    if isinstance(value, int):
        return LongVariant(value)
    if isinstance(value, (datetime, date)):
        return DateVariant(value)
    s = str(value)
    if re.fullmatch(r"-?\d+", s) and not re.fullmatch(r"\d{8}", s):
        return LongVariant(int(s))
    looks_dateish = re.fullmatch(r"\d{8}", s) or (re.search(r"\d", s) and len(s) >= 4 and any(c in s for c in "-/:T"))
    if looks_dateish:
        dt = _parse_datetime(s)
        if dt is not None:
            return DateVariant(dt)
    return StringVariant(s)


# ---------------------------------------------------------------------------
# Filter
# ---------------------------------------------------------------------------

Branch = tuple  # tuple[DimensionVariant, ...] aligned to spec order


class DimensionFilter:
    """A set of partition-value **branches** over a DimensionSpec.

    The reference stores this as a nested variant tree
    (``dimension_constructs.py:2002-2259``); a branch list is the
    flattened equivalent and maps directly to Spark partition
    predicates: each branch is a conjunction, the branch set a
    disjunction.
    """

    def __init__(self, spec: DimensionSpec, branches: Iterable[Branch] = ()):
        self.spec = spec
        self.branches: list[Branch] = [tuple(b) for b in branches]

    # -- construction ----------------------------------------------------
    @classmethod
    def all_pass(cls, spec: DimensionSpec) -> "DimensionFilter":
        return cls(spec, [tuple(AnyVariant(d) for d in spec)])

    @classmethod
    def load_raw(cls, spec: DimensionSpec, raw: Any) -> "DimensionFilter":
        """From nested dicts/lists mirroring the reference's raw filter
        shape: ``{"NA": {"2020-05-01": {}}, "EU": {...}}`` or a flat
        list of per-dimension values ``["NA", "2020-05-01"]``.

        Chain specs: sibling dict keys at a level are multiple values
        of that level's single dimension (branch fan-out).  Tree specs
        follow the reference's cast rule (``_load_raw_dict``,
        ``dimension_constructs.py:2524-2560``): with several sibling
        dimensions at a level, dict keys map 1:1 onto them in order
        (trailing dimensions default to wildcard); more keys than
        sibling dimensions is ambiguous → ``TypeError``.  Flat lists
        assign over the DFS-flattened dimension order.
        """
        if raw is None:
            return cls.all_pass(spec)
        if isinstance(raw, (list, tuple)) and not isinstance(raw, str):
            # flat per-dimension values, each possibly a list
            levels: list[list[DimensionVariant]] = []
            for dim, v in zip(spec, raw):
                vals = v if isinstance(v, (list, tuple)) and not isinstance(v, str) else [v]
                levels.append([create_variant(x, dim) for x in vals])
            for dim in list(spec)[len(levels):]:
                levels.append([AnyVariant(dim)])
            return cls(spec, [tuple(b) for b in product(*levels)])
        return cls(spec, _tree_branches(spec, raw))

    # -- spec (re)binding -------------------------------------------------
    def get_spec(self) -> DimensionSpec:
        """The spec this filter instantiates (reference ``get_spec``,
        ``dimension_constructs.py:2396-2404``; ours is carried, not
        reconstructed — filters are always spec-bound here)."""
        return self.spec

    def set_spec(self, spec: DimensionSpec) -> None:
        """Re-type every variant against ``spec`` (reference
        ``set_spec``, ``dimension_constructs.py:2298-2344``): wildcard /
        relative variants keep their special role and adopt the new
        dimension (so e.g. ``"*"`` over a DATETIME dim starts stepping
        with its granularity); concrete values are re-parsed under the
        new dimension type.  ``TypeError`` on breadth mismatch or an
        unparseable value."""
        flat = list(spec)
        retyped: list[Branch] = []
        for branch in self.branches:
            if len(branch) != len(flat):
                raise TypeError(
                    f"Filter is not compatible with the spec! branch width "
                    f"{len(branch)} != spec dimension count {len(flat)}"
                )
            nb: list[DimensionVariant] = []
            for v, dim in zip(branch, flat):
                if isinstance(v, AnyVariant):
                    nb.append(AnyVariant(dim))
                elif isinstance(v, RelativeVariant):
                    nb.append(RelativeVariant(v.relative_index, v.shift, dim))
                elif isinstance(v, AnchoredRangeVariant):
                    try:
                        anchor = create_variant(v.anchor.raw(), dim)
                    except (ValueError, TypeError) as ex:
                        raise TypeError(f"Filter is not compatible with the spec! Exception: {ex}")
                    nb.append(AnchoredRangeVariant(anchor, v.relative_index, v.shift, dim))
                else:
                    try:
                        nb.append(create_variant(v.raw(), dim))
                    except (ValueError, TypeError) as ex:
                        raise TypeError(f"Filter is not compatible with the spec! Exception: {ex}")
            retyped.append(tuple(nb))
        self.spec = spec
        self.branches = retyped

    # -- algebra ----------------------------------------------------------
    def chain(self, other: "DimensionFilter") -> Optional["DimensionFilter"]:
        """Intersection / refinement.  ``None`` on spec mismatch, empty
        filter on value mismatch (reference :2169-2173 — callers
        distinguish these)."""
        if not self.spec.compatible_with(other.spec):
            return None
        out: list[Branch] = []
        for a in self.branches:
            for b in other.branches:
                nb = _intersect_branches(a, b)
                if nb is not None:
                    out.extend(nb)
        return DimensionFilter(self.spec, _dedup_branches(out))

    def merge(self, other: "DimensionFilter") -> Optional["DimensionFilter"]:
        """Union (predicate OR): the branch sets combined.  The
        reference declares this but left it a stub
        (``dimension_constructs.py:2083-2085``); the branch-list
        representation makes it a dedup'd concatenation.  ``None`` on
        spec mismatch, mirroring :meth:`chain`."""
        if not self.spec.compatible_with(other.spec):
            return None
        return DimensionFilter(self.spec, _dedup_branches(list(self.branches) + list(other.branches)))

    def apply_values(self, values: Sequence[Any]) -> "DimensionFilter":
        """Finalize against runtime event values: chain with the
        material values, then expand relative variants into concrete
        ranges (reference ``apply``, :2087-2088; F2 in SURVEY §2.2)."""
        material = DimensionFilter.load_raw(self.spec, list(values))
        chained = self.chain(material)
        if chained is None:
            raise ValueError(f"values {values!r} incompatible with spec {self.spec!r}")
        return chained.finalize()

    def finalize(self) -> "DimensionFilter":
        """Expand anchored ranges → concrete branches, TIP first."""
        out: list[Branch] = []
        for branch in self.branches:
            levels: list[list[DimensionVariant]] = []
            for v in branch:
                if isinstance(v, AnchoredRangeVariant):
                    levels.append(v.expand())
                else:
                    levels.append([v])
            out.extend(tuple(b) for b in product(*levels))
        return DimensionFilter(self.spec, _dedup_branches(out))

    @property
    def is_material(self) -> bool:
        return all(v.is_material for b in self.branches for v in b)

    def values(self) -> list[tuple]:
        """Concrete value tuples, branch order preserved (TIP first for ranges)."""
        return [tuple(v.raw() for v in b) for b in self.branches]

    def formatted_values(self) -> list[tuple[str, ...]]:
        return [tuple(v.formatted() for v in b) for b in self.branches]

    def tip(self) -> Optional[tuple]:
        return self.values()[0] if self.branches else None

    def values_of(self, name: str) -> list:
        """Distinct raw values of the named dimension across branches,
        branch order preserved (reference ``DimensionVariantReader.
        read``, ``dimension_constructs.py`` — used by link functions to
        read one dimension's domain out of a filter)."""
        try:
            idx = self.spec.dimension_names().index(name)
        except ValueError:
            raise KeyError(f"dimension {name!r} not in spec {self.spec!r}")
        out, seen = [], set()
        for b in self.branches:
            v = b[idx].raw()
            k = str(v)
            if k not in seen:
                seen.add(k)
                out.append(v)
        return out

    # -- Spark / SQL compilation -----------------------------------------
    def to_sql_predicate(self, col_names: Optional[Sequence[str]] = None) -> str:
        """Render as an ANSI-SQL predicate over the partition columns —
        wildcard contributes no predicate (TRUE)."""
        cols = list(col_names or self.spec.dimension_names())
        disjuncts = []
        for b in self.branches:
            conjuncts = []
            for dim, col, v in zip(self.spec, cols, b):
                if not v.is_material:
                    continue
                if dim.type == DimensionType.LONG:
                    conjuncts.append(f"{col} = {int(v.value)}")
                else:
                    conjuncts.append(f"{col} = '{v.formatted()}'")
            disjuncts.append(" AND ".join(conjuncts) if conjuncts else "TRUE")
        if not disjuncts:
            return "FALSE"
        if "TRUE" in disjuncts:
            return "TRUE"
        uniq = sorted(set(disjuncts))
        if len(uniq) == 1:
            return uniq[0]
        return "(" + ") OR (".join(uniq) + ")"

    def __len__(self) -> int:
        return len(self.branches)

    def __repr__(self) -> str:
        return f"DimensionFilter({self.formatted_values()!r})"


def chain_spec_from_dict(raw: dict[str, Any]) -> DimensionSpec:
    """One dict → a CHAIN spec, accepting both declaration styles:
    nested pretty form (``{"region": {"type": "STRING", "day":
    {"type": "DATETIME"}}}`` — reference front-end) and flat
    insertion-order form (``{"region": {...}, "day": {...}}`` — this
    engine's legacy ``load``).  A genuinely branched tree raises —
    chain consumers (dataset path formats, output partitioning) have
    exactly one hierarchy."""
    spec = DimensionSpec.load_from_pretty(raw)
    if spec.is_chain:
        return spec
    if all(s is None for s in spec.get_all_sub_dimensions()):
        return DimensionSpec(spec.get_root_dimensions())
    raise ValueError(
        "partition dimensions must form a single chain (one partition "
        "path hierarchy); got a branched tree"
    )


def _tree_branches(node: Optional[DimensionSpec], raw: Any) -> list[Branch]:
    """Branch tuples (over ``node``'s DFS-flattened dimensions) from a
    nested raw dict — tree-aware walk (reference ``_load_raw_dict``
    cast semantics, ``dimension_constructs.py:2524-2560``)."""
    if node is None:
        return [()]
    entries = node.get_dimensions()
    if not entries:
        return [()]
    if not raw:  # terminal / empty → wildcard the whole subtree
        return [tuple(AnyVariant(d) for d in node)]
    items = list(raw.items())
    if len(entries) == 1:
        # single dimension at this level: every key is one of its values
        dim, sub = entries[0]
        out: list[Branch] = []
        for key, child in items:
            v = create_variant(key, dim)
            for rest in _tree_branches(sub, child):
                out.append((v,) + rest)
        return out
    # sibling dimensions: keys map 1:1 in order (reference raises on
    # more keys than sibling dims — the assignment would be ambiguous)
    if len(items) > len(entries):
        raise TypeError(
            f"cannot map {len(items)} sibling filter values onto "
            f"{len(entries)} sibling dimensions {[d.name for d, _ in entries]} "
            "(ambiguous — reference dimension_constructs.py:2534-2543)"
        )
    per_root: list[list[Branch]] = []
    for i, (dim, sub) in enumerate(entries):
        if i < len(items):
            key, child = items[i]
            v = create_variant(key, dim)
            per_root.append([(v,) + rest for rest in _tree_branches(sub, child)])
        else:
            subtree_dims = [dim] + (list(sub) if sub else [])
            per_root.append([tuple(AnyVariant(d) for d in subtree_dims)])
    # sibling roots are orthogonal coordinates → cartesian combination
    return [sum(combo, ()) for combo in product(*per_root)]


def _intersect_branches(a: Branch, b: Branch) -> Optional[list[Branch]]:
    """Positionwise variant intersection with both-direction retry
    (reference dimension_constructs.py:587-627)."""
    levels: list[list[DimensionVariant]] = []
    for va, vb in zip(a, b):
        r = va.intersect(vb)
        if r is None:
            r = vb.intersect(va)
        if r is None:
            return None  # value mismatch → this branch pair contributes nothing
        levels.append(r)
    return [tuple(x) for x in product(*levels)]


def _dedup_branches(branches: list[Branch]) -> list[Branch]:
    seen: set = set()
    out: list[Branch] = []
    for b in branches:
        key = tuple((type(v).__name__, str(v.value)) for v in b)
        if key not in seen:
            seen.add(key)
            out.append(b)
    return out
